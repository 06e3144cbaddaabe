#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the noop sink (real execution,
no driver collect bottleneck).  A warm-up action first: JVM + codegen
warm-up would otherwise be billed to the first query.

Run order is PINNED (VERDICT r7 #4): the legacy-10 rows execute first
in their r1-r6 historical order, and rows added later (the decode
corpus row, any future additions) run AFTER them — r7's bisection
showed a new first-place row measurably shifts later queries'
page-cache/JIT state, which would silently break the legacy-10
subtotal's sequence-comparability with six rounds of history.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


# The r1-r6 headline set in its historical run order; later bench rows
# append after these so the legacy subtotal stays sequence-comparable.
_LEGACY_ORDER = [
    "t_token_stats", "d_minhash_lsh", "v_ann_lsh_topk", "j_asof_join",
    "m2db_pipeline_throughput", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "a1_consolidate_argmax", "w_topn_per_group",
]


def _ordered_bench_queries():
    from map2db_spark.registry import bench_queries

    qs = bench_queries()
    ordered = {n: qs[n] for n in _LEGACY_ORDER if n in qs}
    ordered.update({n: f for n, f in qs.items() if n not in ordered})
    return ordered


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from map2db_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # ship the package to executor workers (kernel-bearing queries must
    # unpickle map2db_spark references regardless of the launch cwd)
    import __spark_entry__ as entry_mod

    entry_mod._nanos_as_long(spark)

    # Warm-up: one full untimed pass at the TARGET SF.  This charges
    # whole-stage-codegen JIT, parquet footer reads, and OS page-cache
    # population to the warm pass, so the timed pass measures steady-
    # state execution — the regime a long-lived cluster job runs in.
    # (An sf0.001 warm pass was not enough: JIT tiers and page cache are
    # data-size dependent, and r1's measured total ran ~1.5x the claim.)
    for name, fn in _ordered_bench_queries().items():
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # surfaces in the timed pass below with a real traceback
    # each invocation persists fresh intermediates (LSH neighborhoods
    # etc.); drop the warm pass's generation so timed passes measure
    # execution, not cache-memory pressure
    def settle() -> None:
        """Block-manager unpersist is asynchronous; without a settle
        barrier its cleanup lands inside the next timed query
        (observed as ~2x spikes on the LSH query)."""
        spark.catalog.clearCache()
        spark.range(1_000_000).count()
        time.sleep(0.3)

    settle()

    # Two timed passes, min per query: checkpoint-block cleanup from
    # the previous pass lands asynchronously on the next one (observed
    # as a one-off ~2x spike on the checkpoint-using LSH query), so a
    # single sample conflates cleanup with execution.  Min-of-two is
    # the steady-state number BASELINE.md claims.
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for _ in range(2):
        for name, fn in _ordered_bench_queries().items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            samples.setdefault(name, []).append(dt)
            timings[name] = min(timings.get(name, dt), dt)
        settle()

    # Variance pin (r3 verdict item 7): when a query's two samples
    # disagree by >15%, take a third and keep the min — otherwise
    # round-over-round comparisons ride that query's noise (the LSH
    # query is 40% of the total with ±1 s run-to-run swings).
    for name, ss in samples.items():
        lo, hi = min(ss), max(ss)
        if lo > 0 and (hi - lo) / lo > 0.15:
            fn = _ordered_bench_queries()[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings[name], dt)
            settle()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
