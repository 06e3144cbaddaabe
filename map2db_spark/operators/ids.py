"""Scalable deterministic sequential id assignment.

``row_number() OVER (ORDER BY ...)`` funnels every row through one
reducer — fine at fixture scale, wrong at 100 TB.  This is the
classic two-pass alternative (zipWithIndex reformulated for the
DataFrame API):

1. range-repartition by the ordering key (range partitioner keeps
   global order across partitions), sort within partitions;
2. count rows per partition (light action), prefix-sum on the driver;
3. per-partition local index + broadcast offset = global id.

Total cost: one extra count pass; no single-reducer stage.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_sequential_ids(
    df: DataFrame,
    order_cols: list,
    id_col: str = "assigned_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 0-based id following the global order of order_cols.

    order_cols: list of Column or column-name strings (may include
    F.desc(...) expressions).
    """
    return ranked(df, order_cols, rank_col=id_col, num_partitions=num_partitions)[0]


def ranked(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "rank0",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Two-pass range-partitioned global rank: ``(df + 0-based rank
    following order_cols, total row count)``.

    The scale-safe replacement for ``row_number() OVER (ORDER BY ...)``
    with no PARTITION BY: a global window funnels every row through ONE
    task, while this ships only O(partitions) counts through the driver
    and keeps the data range-partitioned.  When order_cols is a total
    order (always pass a unique tiebreak), the rank equals
    ``row_number() - 1`` and is deterministic.  The total count comes
    free from the prefix-sum pass — ``with_ntile`` / ``with_percent_rank``
    turn it into the classic global analytics without a window.

    Cache contract: the range-partitioned input is persisted so the
    count pass and the id pass see identical (sampled) partition
    boundaries, and it MUST stay cached while the returned plan can
    still recompute — eager unpersist would re-sample the ranges and
    desync the broadcast offsets.  The pinned DataFrame rides on the
    result as ``_m2db_pinned``; callers that fully materialize the
    result (write / checkpoint / persist-and-count) may reclaim the
    memory via :func:`release_pinned`.  Left alone it is reclaimed by
    Spark's LRU block eviction, never incorrectness."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    id_col = rank_col

    pid_col = "__pid"
    # persist so the count pass and the id pass see identical partition
    # boundaries (range partitioning samples; don't recompute it twice)
    with_pid = parted.withColumn(pid_col, F.spark_partition_id()).persist()
    counts = dict(
        (r[pid_col], r["cnt"])
        for r in with_pid.groupBy(pid_col).agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(with_pid.schema.fields) + [StructField(id_col, LongType())]
    )

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{id_col: pd.Series([], dtype="int64")})
                continue
            pid = int(pdf[pid_col].iloc[0])
            base = offsets[pid] + local
            pdf = pdf.assign(**{id_col: range(base, base + len(pdf))})
            local += len(pdf)
            yield pdf

    out = with_pid.mapInPandas(add_ids, schema=out_schema).drop(pid_col)
    out._m2db_pinned = with_pid  # see "Cache contract" in the docstring
    return out, acc


def release_pinned(df: DataFrame) -> None:
    """Unpersist the partition-boundary cache pinned under a
    :func:`ranked` / :func:`with_prefix_sums` result.  Only call after
    the result has been fully materialized (written, checkpointed, or
    persisted and counted) — the plan re-samples its range boundaries
    on recompute and the broadcast offsets would no longer line up."""
    pinned = getattr(df, "_m2db_pinned", None)
    if pinned is not None:
        pinned.unpersist(blocking=False)


def _ntile_bounds(n: int, k: int) -> tuple[int, int, int]:
    """(q, r, cut): ntile(k) over n rows gives the first r buckets
    q+1 rows and the rest q; cut = r*(q+1) is the 0-based rank where
    the small buckets start."""
    q, r = divmod(n, k)
    return q, r, r * (q + 1)


def with_ntile(
    df: DataFrame,
    order_cols: list,
    k: int,
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(k) OVER (ORDER BY order_cols)`` without the
    single-partition window: two-pass global rank, then the bucket is
    pure integer arithmetic on (rank, total) — first n%k buckets get
    ceil(n/k) rows, the rest floor(n/k), exactly the SQL ntile
    contract (verified against the DuckDB oracle).  order_cols must be
    a total order for a deterministic assignment.  Output type is INT
    to stay drop-in for ``F.ntile``."""
    out, n = ranked(df, order_cols, rank_col="__rank0",
                    num_partitions=num_partitions)
    q, r, cut = _ntile_bounds(n, k)
    i = F.col("__rank0")
    small = F.expr(f"__rank0 DIV {q + 1} + 1")
    big = F.expr(f"{r} + 1 + (__rank0 - {cut}) DIV {max(q, 1)}")
    return out.withColumn(
        bucket_col, F.when(i < cut, small).otherwise(big).cast("int")
    ).drop("__rank0")


def with_percent_rank(
    df: DataFrame,
    order_cols: list,
    pr_col: str = "pr",
    num_partitions: int | None = None,
) -> DataFrame:
    """``percent_rank() OVER (ORDER BY order_cols)`` without the
    single-partition window, for a TOTAL order (unique tiebreak):
    rank0 / (n-1) as one IEEE double division — bit-identical to the
    window function on both engines."""
    out, n = ranked(df, order_cols, rank_col="__rank0",
                    num_partitions=num_partitions)
    pr = (
        (F.col("__rank0") / F.lit(n - 1)).cast("double")
        if n > 1
        else F.lit(0.0)
    )
    return out.withColumn(pr_col, pr).drop("__rank0")


def with_prefix_sums(
    df: DataFrame,
    order_cols: list,
    sum_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive running sums ``sum(c) OVER (ORDER BY order_cols)`` for
    each integer column in sum_cols, without the single-partition
    window — the same two-pass shape as ``ranked``:

    1. range-repartition by order_cols (global order across
       partitions), sort within partitions;
    2. per-partition column totals (light action), prefix-sum the
       offsets on the driver;
    3. per-partition local cumsum + broadcast offset = global running
       sum, emitted as ``cum_<col>``.

    Exact-integer contract: sum_cols must be integral (the running
    sums are carried as int64); NULLs count as 0.  order_cols should
    be a total order per distinct row for a deterministic result —
    for the ECDF use-case the input is already one row per distinct
    value, so the order key alone is unique.

    Cache contract: same as :func:`ranked` — the range-partitioned
    input stays persisted (pinned on the result as ``_m2db_pinned``)
    so recomputes keep the sampled boundaries; release with
    :func:`release_pinned` once the result is materialized.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    pid_col = "__pid"
    # persist so the totals pass and the cumsum pass see identical
    # partition boundaries (range partitioning samples)
    with_pid = parted.withColumn(pid_col, F.spark_partition_id()).persist()
    totals = with_pid.groupBy(pid_col).agg(
        *[F.sum(c).cast("long").alias(c) for c in sum_cols]
    ).collect()
    per_pid = {r[pid_col]: [int(r[c] or 0) for c in sum_cols] for r in totals}
    offsets: dict[int, tuple[int, ...]] = {}
    acc = [0] * len(sum_cols)
    for pid in sorted(per_pid):
        offsets[pid] = tuple(acc)
        acc = [a + t for a, t in zip(acc, per_pid[pid])]

    out_schema = StructType(
        list(with_pid.schema.fields)
        + [StructField(f"cum_{c}", LongType()) for c in sum_cols]
    )

    def add_cums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = [0] * len(sum_cols)
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(
                    **{f"cum_{c}": pd.Series([], dtype="int64") for c in sum_cols}
                )
                continue
            pid = int(pdf[pid_col].iloc[0])
            new_cols = {}
            for i, c in enumerate(sum_cols):
                vals = pdf[c].fillna(0).astype("int64")
                new_cols[f"cum_{c}"] = (
                    vals.cumsum() + (offsets[pid][i] + local[i])
                )
                local[i] += int(vals.sum())
            yield pdf.assign(**new_cols)

    out = with_pid.mapInPandas(add_cums, schema=out_schema).drop(pid_col)
    out._m2db_pinned = with_pid  # see "Cache contract" in the docstring
    return out
