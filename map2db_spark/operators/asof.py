"""As-of (point-in-time) join — an operator Spark lacks natively.

Composition strategy (SURVEY §2.5 'absent' list): the naive form is an
inequality join (left.ts >= right.ts) + argmax, which explodes to
O(L x R) per key.  The scalable form used here is the union-sort
trick:

1. tag right rows, union both sides on (key, ts);
2. one window sorted by (ts, side) per key carries the latest right
   row forward (last_value ignoring nulls);
3. keep left rows.

Cost: a single shuffle on the key — same as a regular equi-join — and
no inequality-join blowup.  Ties (left.ts == right.ts) match the
right row, like DuckDB/pandas ASOF backward semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    inner: bool = True,
) -> DataFrame:
    """For each left row: the right row with the greatest right_ts <=
    left_ts within the same `on` key.  right_value_cols are carried
    onto the output with their names prefixed 'asof_'.

    The right payload (ts + every value column) is packed into ONE
    struct carried by a single last(ignorenulls): with independent
    per-column carries, a NULL in one right value column would make
    that output column fall back to an OLDER right row while asof_ts
    came from the newer one — the struct makes the carried row atomic,
    nullable value columns included (same fix asof_join_nearest
    already applies)."""
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    payload_type = StructType(
        [StructField("ts", right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in right_value_cols]
    )
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        F.lit(None).cast(payload_type).alias("__r"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("ts"),
            *[F.col(c).alias(c) for c in right_value_cols],
        ).alias("__r"),
    ).select(*l.columns)  # align column order

    unioned = l.unionByName(r)
    # the trailing __r struct key (ts, then values, compared field by
    # field) makes the order total when multiple right rows share
    # (key, ts): the carried row is then deterministic (the one sorting
    # last) instead of partition-order dependent
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side", "__r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        F.last("__r", ignorenulls=True).over(w).alias("__carry"),
    ).where(F.col("__side") == 1).drop("__side")
    carried = carried.select(
        *lcols,
        *[
            F.col(f"__carry.{c}").alias(f"asof_{c}")
            for c in right_value_cols
        ],
        F.col("__carry.ts").alias("asof_ts"),
    )
    if inner:
        carried = carried.where(F.col("asof_ts").isNotNull())
    return carried


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    inner: bool = True,
) -> DataFrame:
    """For each left row: the right row with the smallest |right_ts -
    left_ts| within the same `on` key (nearest in EITHER direction —
    the sensor/telemetry alignment variant; backward-only is
    asof_join_backward).  Ties between an earlier and a later right
    row at equal distance resolve to the earlier one.

    Same union-sort cost model as the backward join — ONE shuffle on
    the key — but a single window pass computes BOTH carries: the
    latest prior right row (running last_value ignoring nulls) and
    the earliest following right row (first_value over the following
    frame).  The per-row pick is then a plain comparison, so the
    inequality-join blowup never appears.

    Rights sharing an identical (key, ts) should be deduplicated by
    the caller (the carried row among exact ts duplicates is
    deterministic but direction-asymmetric).

    The right payload (ts + every value column) is packed into ONE
    struct and carried with a single last/first per direction: with
    per-column carries, a NULL in one right value column would let
    the pick mix columns (and asof_ts) from DIFFERENT right rows —
    the struct makes the carried row atomic, nullable value columns
    included.
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    payload_type = StructType(
        [StructField("ts", right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in right_value_cols]
    )
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__r"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("ts"),
            *[F.col(c).alias(c) for c in right_value_cols],
        ).alias("__r"),
    ).select(*l.columns)

    unioned = l.unionByName(r)
    # struct ordering (ts first, then values) keeps the tiebreak among
    # identical-ts right rows deterministic, as before
    order = ["__ts", "__side", "__r"]
    w_prev = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    both = unioned.select(
        *lcols,
        "__ts",
        "__side",
        F.last("__r", ignorenulls=True).over(w_prev).alias("__p"),
        F.first("__r", ignorenulls=True).over(w_next).alias("__n"),
    ).where(F.col("__side") == 1)
    both = both.select(
        *lcols,
        "__ts",
        *[F.col(f"__p.{c}").alias(f"__p_{c}") for c in right_value_cols],
        F.col("__p.ts").alias("__p_ts"),
        *[F.col(f"__n.{c}").alias(f"__n_{c}") for c in right_value_cols],
        F.col("__n.ts").alias("__n_ts"),
    )
    # distance compare in exact integers (microseconds for timestamp
    # keys, raw values for numeric keys); prev wins ties
    from pyspark.sql.types import TimestampNTZType, TimestampType

    ts_type = left.schema[left_ts].dataType
    if isinstance(ts_type, (TimestampType, TimestampNTZType)):
        def _num(c: F.Column) -> F.Column:
            return F.unix_micros(c)
    else:
        def _num(c: F.Column) -> F.Column:
            return c.cast("long")

    use_prev = F.col("__n_ts").isNull() | (
        F.col("__p_ts").isNotNull()
        & (
            _num(F.col("__ts")) - _num(F.col("__p_ts"))
            <= _num(F.col("__n_ts")) - _num(F.col("__ts"))
        )
    )
    out = both.select(
        *lcols,
        *[
            F.when(use_prev, F.col(f"__p_{c}")).otherwise(F.col(f"__n_{c}"))
            .alias(f"asof_{c}")
            for c in right_value_cols
        ],
        F.when(use_prev, F.col("__p_ts")).otherwise(F.col("__n_ts")).alias("asof_ts"),
    )
    if inner:
        out = out.where(F.col("asof_ts").isNotNull())
    return out
