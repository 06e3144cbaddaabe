"""Feature consolidation (A1-A3, reference map2db.py:747-812 +
1485-1510) as an order-insensitive keyed aggregate.

The reference streams tiles in reverse level order and upserts into
SQLite so that "the least simplified geometry wins" falls out of
ordering.  Here the same semantics are a single ``groupBy(ftype, fid)``
aggregate, which is what unlocks parallel execution:

- attributes + maxz come from the *highest* level sighting (argmax);
- geometry is the union of the fragments at that highest level;
- minz is the sighting minz at the *lowest* level;
- the reference's mid-stream ValueErrors become validation columns:
  ``violation`` is non-null where attribute equality across sightings
  (map2db.py:766-775, 786-791) or zoom-range continuity
  (map2db.py:792-802) fails, so bad input surfaces as data instead of
  killing the job.

One shuffle on (ftype, fid); the union kernel is commutative and
associative, so partial ordering of fragments is irrelevant
(normalize guarantees identical bytes for any combine order).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from map2db_spark.geometry import wkb as gwkb
from map2db_spark.geometry.union import union_lines, union_points, union_polygons
from map2db_spark.sources.header import MapHeader

CONSOLIDATED_SCHEMA = (
    "ftype STRING, fid LONG, level INT, minz INT, maxz INT, layer INT, "
    "tags ARRAY<STRING>, vtags MAP<STRING,STRING>, geom BINARY, violation STRING"
)


def _vt_key(vtags) -> str:
    if vtags is None:
        return "{}"
    return json.dumps(dict(sorted(vtags.items())), ensure_ascii=False)


def _union_geoms(ftype: str, wkbs) -> bytes:
    frags = [gwkb.decode(b)[1] for b in wkbs]
    if ftype == "point":
        return gwkb.encode_multipoint(union_points(frags))
    if ftype == "line":
        return gwkb.encode_multilinestring(union_lines(frags))
    return gwkb.encode_multipolygon(union_polygons(frags))


def make_consolidate_kernel(header: MapHeader):
    """Returns the applyInPandas kernel closure over the subfile
    directory (level -> (subfile_idx, minzoom, maxzoom))."""
    subfile_by_level = {
        sf.level: (i, sf.minzoom, sf.maxzoom) for i, sf in enumerate(header.subfiles)
    }

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ftype = pdf["ftype"].iloc[0]
        fid = pdf["fid"].iloc[0]
        violations: list[str] = []

        # argmax level: attribute/geometry source
        max_level = int(pdf["level"].max())
        top = pdf[pdf["level"] == max_level]

        # per-level attribute equality (reference map2db.py:766-775):
        # everything except geometry must match across tiles of a level;
        # across levels everything except geometry AND minz must match
        # (map2db.py:786-791; level/maxz differ per subfile by design).
        for level, grp in pdf.groupby("level"):
            keys = {
                (int(r.minz), int(r.layer), tuple(r.tags), _vt_key(r.vtags))
                for r in grp.itertuples(index=False)
            }
            if len(keys) > 1:
                violations.append(f"attr-mismatch@level={level}")
        cross = {
            (int(r.layer), tuple(r.tags), _vt_key(r.vtags))
            for r in pdf.itertuples(index=False)
        }
        if len(cross) > 1:
            violations.append("attr-mismatch-across-levels")

        # zoom continuity (map2db.py:792-802): the subfiles containing
        # this feature must be adjacent, and each higher subfile's minz
        # must be exactly lower.maxzoom + 1.
        levels = sorted({int(v) for v in pdf["level"]})
        idxs = [subfile_by_level[lv][0] for lv in levels]
        if idxs != list(range(idxs[0], idxs[0] + len(idxs))):
            violations.append("zoom-gap:nonadjacent-subfiles")
        minz_by_level = {
            int(lv): int(grp["minz"].min()) for lv, grp in pdf.groupby("level")
        }
        for lo, hi in zip(levels, levels[1:]):
            lo_maxzoom = subfile_by_level[lo][2]
            if minz_by_level[hi] != lo_maxzoom + 1:
                violations.append(
                    f"zoom-discontinuity:{minz_by_level[hi]}!={lo_maxzoom + 1}"
                )

        geom = _union_geoms(ftype, list(top["geom"]))
        first = top.iloc[0]
        return pd.DataFrame(
            [
                {
                    "ftype": ftype,
                    "fid": fid,
                    "level": max_level,
                    "minz": minz_by_level[levels[0]],
                    "maxz": int(first["maxz"]),
                    "layer": int(first["layer"]),
                    "tags": list(first["tags"]),
                    "vtags": dict(first["vtags"]) if first["vtags"] is not None else {},
                    "geom": geom,
                    "violation": "; ".join(violations) if violations else None,
                }
            ]
        )

    return kernel


def consolidate(features, header: MapHeader):
    """dbl-map consolidation: features DF -> one row per (ftype, fid).

    Returns the consolidated DataFrame with a ``violation`` column;
    callers filter ``violation IS NULL`` for good rows and surface the
    rest (the reference would have raised mid-run)."""
    return (
        features.where("fid IS NOT NULL")
        .groupBy("ftype", "fid")
        .applyInPandas(make_consolidate_kernel(header), schema=CONSOLIDATED_SCHEMA)
    )


def assign_ids(features, spark=None):
    """Non-dbl path (A5, map2db.py:842-843, 1454): deterministic
    sequential ids per feature table in reference traversal order
    (subfile level desc, then row-major tile sweep, then intra-tile
    sequence).

    The reference's ids can have gaps where a feature was clipped away
    *after* its counter ticked; this renumbering is compact — a
    documented, permissible divergence (SURVEY §7 hard part 4).

    Scale note: row_number over a per-ftype window is a single
    reducer per ftype; for planet-scale non-dbl maps switch to the
    two-pass partition-offset assigner (same ordering, no global
    sort): see operators/ids.py.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("ftype").orderBy(
        F.desc("level"), "tile_y", "tile_x", "seq"
    )
    return features.where("fid IS NULL").withColumn(
        "fid", (F.row_number().over(w) - 1).cast("long")
    )


def violation_stats(consolidated) -> "pd.DataFrame":
    """A6-style diagnostic counters from the consolidation output."""
    from pyspark.sql import functions as F

    return (
        consolidated.groupBy("ftype")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum(F.when(F.col("violation").isNotNull(), 1).otherwise(0)).alias(
                "n_violations"
            ),
        )
    )
