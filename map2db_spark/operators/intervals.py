"""Interval-overlap join via temporal binning.

An operator Spark lacks natively (engine-complete surface of SURVEY
§2.5; range-join optimization in Databricks / overlaps-join in
Trino).  The naive form — ``a JOIN b ON a.start <= b.end AND b.start
<= a.end`` — plans as a nested-loop join, quadratic per key.  The
binned form explodes each interval into the fixed-width time buckets
it touches; two intervals can only overlap if they share a bucket, so
an EQUI join on (key, bucket) followed by the exact predicate +
distinct finds exactly the inequality-join result with ordinary
hash-shuffle machinery.

Bucket width is the skew/cost dial: width ~ median interval length
keeps the explode factor ~2 while keeping per-bucket populations
small.  At 100 TB the bucket key shards hot time ranges across tasks
the way date-partitioned storage already shards the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    key: str,
    a_start: str = "a_start",
    a_end: str = "a_end",
    b_start: str = "b_start",
    b_end: str = "b_end",
    bucket_us: int = 1_800_000_000,
) -> DataFrame:
    """All (a, b) row pairs sharing ``key`` whose [start, end]
    intervals overlap (closed endpoints, like SQL OVERLAPS with <=).
    Both inputs keep their non-interval columns; output columns are
    a's columns then b's (minus the duplicated key)."""
    bucket = lambda lo, hi: F.explode(  # noqa: E731
        F.sequence(
            F.expr(f"unix_micros({lo}) div {bucket_us}"),
            F.expr(f"unix_micros({hi}) div {bucket_us}"),
        )
    ).alias("__bucket")
    a_cols = a.columns
    b_cols = [c for c in b.columns if c != key]
    ab = a.select(*a_cols, bucket(a_start, a_end))
    bb = b.select(key, *b_cols, bucket(b_start, b_end))
    return (
        ab.join(bb, [key, "__bucket"])
        .where(
            (F.col(a_start) <= F.col(b_end))
            & (F.col(b_start) <= F.col(a_end))
        )
        .select(*a_cols, *b_cols)
        .distinct()
    )
