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
    # non-legacy rows append in registry order, EXCEPT the decode row,
    # which stays LAST regardless of its registry tier (VERDICT r7 #4:
    # it measurably shifts later queries' page-cache/JIT state; its
    # position must not drift as the registry window rotates)
    tail = "m_decode_corpus_bench"
    ordered.update(
        {n: f for n, f in qs.items() if n not in ordered and n != tail}
    )
    if tail in qs:
        ordered[tail] = qs[tail]
    return ordered


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # host 1-minute load BEFORE the session spins up: the end-of-run
    # reading includes the bench's OWN executors (a quiet host reads
    # ~8-12 there from self-load alone — r14 measured 11.09 at end vs
    # 1.35 immediately before), so only the start reading separates
    # external pressure from the bench itself
    try:
        load1_start = round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - platform without getloadavg
        load1_start = None

    from map2db_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # ship the package to executor workers (kernel-bearing queries must
    # unpickle map2db_spark references regardless of the launch cwd)
    import __spark_entry__ as entry_mod

    entry_mod._nanos_as_long(spark)

    def row_cleanup(
        sleep: float = 0.1, barrier: int = 100_000, gc: bool = False
    ) -> None:
        """Free the just-finished row's executor-side state so it can't
        tax the NEXT row's timed window (VERDICT r8 #1: d_minhash_lsh
        ran 5.9 s in-bench vs 1.0 s standalone on a drifted host — the
        bench sequence amplified host pressure ~5x through accumulated
        blocks and shuffle files).  Three leak channels, each with its
        own drain:
          1. SQL-cached plans (df.persist) -> catalog.clearCache();
          2. RDD-level persistent blocks — localCheckpoint lives HERE,
             invisible to the SQL cache manager (pipeline.py and the
             graph queries localCheckpoint per invocation) -> blocking
             unpersist of every entry in getPersistentRDDs;
          3. shuffle files, reaped by the ContextCleaner only when the
             driver GCs — which a 128 GiB heap left alone may not do
             for the whole bench -> an explicit System.gc(), but only
             at PASS boundaries (gc=True): a full GC before every row
             measurably taxed the next row's window (~5-8% on the A/B
             pairs in BASELINE.md), while shuffle-file growth within
             one 11-row pass is bounded.
        The barrier job + sleep then let the asynchronous block/file
        deletions land now, not inside the next timed query (observed
        as ~2x spikes on the LSH query when cleanup raced a pass)."""
        spark.catalog.clearCache()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(True)
        if gc:
            spark.sparkContext._jvm.System.gc()
        spark.range(barrier).count()
        time.sleep(sleep)

    # Warm-up: one full untimed pass at the TARGET SF.  This charges
    # whole-stage-codegen JIT, parquet footer reads, and OS page-cache
    # population to the warm pass, so the timed pass measures steady-
    # state execution — the regime a long-lived cluster job runs in.
    # (An sf0.001 warm pass was not enough: JIT tiers and page cache are
    # data-size dependent, and r1's measured total ran ~1.5x the claim.)
    # Per-row cleanup runs in the warm pass too so its rows execute in
    # the same state regime the timed rows will.
    for name, fn in _ordered_bench_queries().items():
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # surfaces in the timed pass below with a real traceback
        row_cleanup()

    row_cleanup(sleep=0.3, barrier=1_000_000, gc=True)

    # Two timed passes, min per query, cleanup after EVERY row (not
    # just every pass): leftover state from row k must not bill row
    # k+1.  Min-of-N is the steady-state number BASELINE.md claims;
    # every raw sample is recorded in the output ("samples") so
    # run-to-run spread is visible to the driver, not just the min
    # (VERDICT r8 #1).
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for _ in range(2):
        for name, fn in _ordered_bench_queries().items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            samples.setdefault(name, []).append(dt)
            timings[name] = min(timings.get(name, dt), dt)
            row_cleanup()
        row_cleanup(sleep=0.3, barrier=1_000_000, gc=True)

    # Variance pin (r3 verdict item 7): when a query's two samples
    # disagree by >15%, take a third and keep the min — otherwise
    # round-over-round comparisons ride that query's noise (the LSH
    # query is 40% of the total with ±1 s run-to-run swings).
    for name, ss in list(samples.items()):
        lo, hi = min(ss), max(ss)
        if lo > 0 and (hi - lo) / lo > 0.15:
            fn = _ordered_bench_queries()[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            samples[name].append(dt)
            timings[name] = min(timings[name], dt)
            row_cleanup(sleep=0.3, barrier=1_000_000, gc=True)

    total = round(sum(timings.values()), 3)
    # host 1-minute load at measurement end: the r13 drift analysis
    # showed the same tree reading 19.9 s at load ~10 vs 15.2 s at
    # load ~0 — recording it makes a contended reading self-describing
    # instead of needing a post-hoc bisect (BASELINE.md r13 A/B)
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - platform without getloadavg
        load1 = None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "samples": samples,
                "sf": sf,
                # observed core count (r16, VERDICT r15 #2): the
                # driver's low-core comparison run can verify from the
                # artifact itself that $SPARK_GRAFT_CPUS reached the
                # session — the ≈1 sf0.1 scaling ratios are
                # orchestration-floor, not serial execution (see the
                # CPU-bound 8-vs-32 proof in SCALE.md)
                "parallelism": spark.sparkContext.defaultParallelism,
                "host_load1": load1,
                "host_load1_start": load1_start,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
