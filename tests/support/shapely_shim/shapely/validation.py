"""shapely.validation shim: make_valid via the engine's repair kernel
(the same code the engine's decode path runs, geometry/repair.py)."""

from __future__ import annotations

from map2db_spark.geometry import repair as _repair

from .geometry import MultiPolygon


def make_valid(geom):
    repaired, reason = _repair.make_valid_polygons(geom.polys)
    if reason is not None:
        # unreparable: hand back an explicitly invalid geometry so the
        # reference takes its discard branch (map2db.py:1007-1011)
        return MultiPolygon([], _forced_invalid=True)
    return MultiPolygon([(rings[0], rings[1:]) for rings in repaired])
