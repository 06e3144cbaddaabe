#!/usr/bin/env python3
"""Arrow-batch statistics for the Python-boundary kernels
(VERDICT r15 #6: tools/plan_audit.py only flags the PRESENCE of
MapInPandas/ArrowEvalPython nodes; this audit measures what actually
crosses the boundary — batches and rows per kernel invocation — to
prove the batches are not degenerate, i.e. that vectorization has
work to amortize its per-batch overhead over).

Method: monkeypatch DataFrame.mapInPandas / GroupedData.applyInPandas
at query-CONSTRUCTION time to wrap every kernel's input iterator with
a counting shim that feeds two Spark accumulators (accumulators are
the executor->driver channel that works inside Python workers).  The
kernel sees the identical iterator contents; results are unchanged —
asserted per query by comparing row counts with an unpatched run is
unnecessary since the shim only observes.  Run the kernel-bearing
queries at the bench SF and report rows/batches.

A batch-mean below ~100 rows on a non-grouped kernel means the Arrow
transpose + worker dispatch dominates the kernel's own work (guide
§4.2) and the input should be re-batched (coalesce/repartition before
the kernel, or a larger maxRecordsPerBatch).

    python3 tools/arrow_batch_audit.py [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

DEFAULT_QUERIES = [
    # the three kernel families VERDICT names (decode, merge, k-means)
    # + the consolidate run-iterator kernel + tar-shard parse
    "m_decode_corpus_bench",
    "m2db_pipeline_throughput",
    "v_kmeans_clusters",
    "a1_consolidate_argmax",
    "f_tar_shard_ingest",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT_QUERIES
    )

    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.group import GroupedData

    from map2db_spark.registry import QUERIES, _ensure_loaded
    from map2db_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("arrow-batch-audit")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    entry_mod._nanos_as_long(spark)

    sc = spark.sparkContext
    counters: list[tuple[str, object, object]] = []

    def counting(fn, label, acc_b, acc_r):
        def wrapped(it, *rest):
            def metered():
                for pdf in it:
                    acc_b.add(1)
                    acc_r.add(len(pdf))
                    yield pdf

            return fn(metered(), *rest)

        return wrapped

    def counting_grouped(fn, label, acc_b, acc_r):
        # applyInPandas kernels receive ONE pdf per group (classic
        # form) — count each group slice as a batch.  Spark inspects
        # the function's ARITY (1 = data, 2 = key+data), so the shim
        # must preserve it.
        import inspect

        n_params = len(inspect.signature(fn).parameters)
        if n_params == 2:
            def wrapped(key, pdf):
                acc_b.add(1)
                acc_r.add(len(pdf))
                return fn(key, pdf)
        else:
            def wrapped(pdf):
                acc_b.add(1)
                acc_r.add(len(pdf))
                return fn(pdf)

        return wrapped

    orig_mip = DataFrame.mapInPandas
    orig_aip = GroupedData.applyInPandas

    def patched_mip(self, func, schema, barrier=False, profile=None):
        acc_b, acc_r = sc.accumulator(0), sc.accumulator(0)
        label = getattr(func, "__qualname__", repr(func))
        counters.append((f"mapInPandas:{label}", acc_b, acc_r))
        return orig_mip(
            self, counting(func, label, acc_b, acc_r), schema,
            barrier=barrier, profile=profile,
        )

    def patched_aip(self, func, schema):
        acc_b, acc_r = sc.accumulator(0), sc.accumulator(0)
        label = getattr(func, "__qualname__", repr(func))
        counters.append((f"applyInPandas:{label}", acc_b, acc_r))
        return orig_aip(self, counting_grouped(func, label, acc_b, acc_r), schema)

    DataFrame.mapInPandas = patched_mip
    GroupedData.applyInPandas = patched_aip
    try:
        report = {}
        for name in names:
            counters.clear()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            kernels = []
            for label, acc_b, acc_r in counters:
                b, r = acc_b.value, acc_r.value
                kernels.append(
                    {
                        "kernel": label,
                        "batches": b,
                        "rows": r,
                        "rows_per_batch": round(r / b, 1) if b else None,
                    }
                )
            report[name] = kernels
            spark.catalog.clearCache()
            for jrdd in sc._jsc.getPersistentRDDs().values():
                jrdd.unpersist(True)
    finally:
        DataFrame.mapInPandas = orig_mip
        GroupedData.applyInPandas = orig_aip

    print(json.dumps({"sf_dir": sf_dir, "kernels": report}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
