"""shapely.ops shim: linemerge via the engine's merge kernel."""

from __future__ import annotations

from map2db_spark.geometry import linemerge as _lm

from .geometry import LineString, MultiLineString


def linemerge(geom):
    parts = geom.lines if isinstance(geom, MultiLineString) else [geom.coords]
    merged = _lm.linemerge([list(p) for p in parts])
    if len(merged) == 1:
        return LineString(merged[0])
    return MultiLineString(merged)
