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
    onto the output with their names prefixed 'asof_'."""
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        F.col(right_ts).alias("__r_ts"),
    ).select(*l.columns)  # align column order

    unioned = l.unionByName(r)
    # the trailing __r_* keys make the order total when multiple right
    # rows share (key, ts): the carried row is then deterministic (the
    # one sorting last) instead of partition-order dependent
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side", *[f"__r_{c}" for c in right_value_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_value_cols
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias("asof_ts"),
    ).where(F.col("__side") == 1).drop("__side")
    if inner:
        carried = carried.where(F.col("asof_ts").isNotNull())
    return carried
