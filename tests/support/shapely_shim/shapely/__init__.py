"""Minimal shapely-API shim backed by map2db_spark's own geometry
kernel (clip/union/normalize/linemerge/repair/wkb).

Purpose (SURVEY §5.2 golden parity): the reference map2db.py
hard-imports shapely, which this container does not have.  Exposing
the engine's pure-Python kernel behind the small slice of the shapely
2.x API the reference actually uses lets the UNMODIFIED reference run
on generated fixture maps and produce its own SQLite output — which
tests/test_reference_parity.py then diffs table-by-table against this
engine's output.  Every geometric decision the reference makes
(clip, covers, union, make_valid, linemerge, normalize) flows through
the same kernel the engine uses, so the diff isolates the
decode/consolidate/merge dataflow for comparison.

This is test support, not a shapely reimplementation: only the
methods the reference calls exist.
"""

__version__ = "2.0.0-m2dbspark-shim"

from . import geometry, ops, validation, wkb  # noqa: E402,F401
