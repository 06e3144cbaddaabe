"""Time-series grid resampling by linear interpolation.

An operator Spark lacks natively (reference scope: the engine-complete
surface of SURVEY §2.5; TimescaleDB calls this gap-filled
``interpolate``).  The naive form probes each grid point against the
event stream with an inequality join — O(grid x events) per key.  The
scalable form here extends the as-of union-sort trick
(operators/asof.py) to BOTH directions:

1. union events (side=0) and grid points (side=1) on the key;
2. one ascending window carries the latest event at-or-before each
   row; one descending window carries the earliest event at-or-after;
3. grid rows with both neighbors interpolate linearly.

Both windows sort the SAME (key)-partitioned exchange, so the whole
operator costs one shuffle regardless of grid density.

Determinism: at equal timestamps the backward carry takes the maximum
value and the forward carry the minimum (side + value appear in the
sort keys), so results never depend on partition traversal order —
the property that makes distributed re-partitioning safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def linear_interp_grid(
    events: DataFrame,
    grid: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Sample ``events`` (key, ts, value) onto ``grid`` (key, ts):
    each grid point inside its key's observed range returns
    v0 + (v1-v0) * (tg-t0)/(t1-t0) from the surrounding events
    (exact value when an event sits on the grid point).  Grid points
    before the first or after the last event are dropped (inner
    semantics).  Output: key, grid_ts, interp_value (unrounded)."""
    ev = events.select(
        F.col(key), F.col(ts).alias("ts"), F.col(value).alias("value"),
        F.lit(0).alias("side"),
    )
    gr = grid.select(
        F.col(key), F.col(ts).alias("ts"),
        F.lit(None).cast(ev.schema["value"].dataType).alias("value"),
        F.lit(1).alias("side"),
    )
    unioned = ev.unionByName(gr)
    ev_ts = F.when(F.col("side") == 0, F.col("ts"))
    ev_val = F.when(F.col("side") == 0, F.col("value"))
    wb = (
        Window.partitionBy(key)
        .orderBy(F.asc("ts"), F.asc("side"), F.asc("value"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(F.desc("ts"), F.asc("side"), F.desc("value"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        key,
        "ts",
        "side",
        F.last(ev_ts, ignorenulls=True).over(wb).alias("t0"),
        F.last(ev_val, ignorenulls=True).over(wb).alias("v0"),
        F.last(ev_ts, ignorenulls=True).over(wf).alias("t1"),
        F.last(ev_val, ignorenulls=True).over(wf).alias("v1"),
    ).where(
        (F.col("side") == 1)
        & F.col("t0").isNotNull()
        & F.col("t1").isNotNull()
    )
    frac = (
        (F.unix_micros("ts") - F.unix_micros("t0")).cast("double")
        / (F.unix_micros("t1") - F.unix_micros("t0")).cast("double")
    )
    interp = F.when(F.col("t0") == F.col("t1"), F.col("v0")).otherwise(
        F.col("v0") + (F.col("v1") - F.col("v0")) * frac
    )
    return carried.select(
        key, F.col("ts").alias("grid_ts"), interp.alias("interp_value")
    )
