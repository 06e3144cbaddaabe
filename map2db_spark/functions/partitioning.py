"""Gated input scatter — ONE definition (r16, VERDICT r15 #7).

A small parquet/binary table arrives as 1-2 input splits (row-group
granularity beats maxPartitionBytes), which would run any
work-amplifying stage downstream of it — a per-char explode, a Python
decode kernel, a broadcast-probe scan — on a single task.  The fix is
the CLAUDE.md repartition-before-work-amplifying rule, GATED on the
scan's actual split count so a production input (thousands of splits)
never pays the extra full shuffle of its payload: the scatter only
fires when the scan has fewer splits than the requested parallelism.

The same logic previously lived in three places
(queries_round7._scatter_if_underspilt, operators/exact_substring,
v_hard_negative_mining); this is the shared form.  ``key_cols``
chooses the scatter shape:

- none -> round-robin ``repartition(par)``: even slices for a decode
  kernel; note every keyless repartition locally sorts its input
  first (spark.sql.execution.sortBeforeRepartition, guide §2.5) so
  retried tasks reproduce their row assignment;
- keys -> hash ``repartition(par, *key_cols)``: skips that local
  sort and keeps a deterministic row->partition mapping for stages
  that later re-key on the same columns.

The split-count probe (``df.rdd.getNumPartitions()``) converts the
plan once per invocation; callers sit at query-construction time
(never per-row/per-batch), where one conversion is noise.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def scatter_if_underspilt(
    df: DataFrame, par: int, *key_cols: str
) -> DataFrame:
    """Scatter ``df`` to ``par`` partitions ONLY when it arrives with
    fewer splits; a well-split frame passes through untouched (no
    Exchange added)."""
    if df.rdd.getNumPartitions() < par:
        if key_cols:
            return df.repartition(par, *[F.col(c) for c in key_cols])
        return df.repartition(par)
    return df
