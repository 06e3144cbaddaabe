#!/usr/bin/env python3
"""Measure whole-stage-codegen (re)compilation inside the bench
sequence (VERDICT r15 #4: d_minhash_lsh runs ~1.3-1.6 s standalone
but 2.3-2.5 s in-bench; the r15 theory was that the interleaved rows
evict its codegen classes from the driver-JVM's generated-class cache
— `spark.sql.codegen.cache.maxEntries`, default 100 — so every timed
sample pays Janino recompilation.  This probe turns the theory into
numbers).

Method: run the bench's exact row sequence (same order, same noop
sink, same row_cleanup) and sample the JVM's cumulative Janino
compile-time accumulator (`CodeGenerator.compileTime`, public on the
Scala singleton — milliseconds of actual compilation, cache hits add
0) around EVERY row.  A row whose compile-time delta is ~0 on its
second timed pass hits the generated-class cache; a row that
re-compiles the same units every pass is being evicted between
samples.  Run twice:

    python3 tools/bench_codegen_probe.py            # default cache (100)
    python3 tools/bench_codegen_probe.py 10000      # enlarged cache

and compare the second-pass compile deltas + wall per row.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    max_entries = sys.argv[1] if len(sys.argv) > 1 else None

    import os

    # the generated-class cache is a JVM-lifetime lazy val sized from
    # SQLConf at its first use, so the override must reach the JVM's
    # SparkConf at launch — before any session-level conf can apply
    if max_entries is not None:
        os.environ["PYSPARK_SUBMIT_ARGS"] = (
            f"--conf spark.sql.codegen.cache.maxEntries={max_entries} "
            "pyspark-shell"
        )

    from map2db_spark.session import get_spark

    spark = get_spark("codegen-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("cache.maxEntries =",
          spark.conf.get("spark.sql.codegen.cache.maxEntries"),
          file=sys.stderr)

    import __spark_entry__ as entry_mod

    entry_mod._nanos_as_long(spark)

    from bench import _ordered_bench_queries

    gw = spark.sparkContext._gateway
    cg_cls = gw.jvm.java.lang.Class.forName(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator$"
    )
    cg = cg_cls.getDeclaredField("MODULE$").get(None)

    def compile_ms() -> int:
        return cg.compileTime()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def row_cleanup() -> None:
        spark.catalog.clearCache()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(True)
        spark.range(100_000).count()
        time.sleep(0.1)

    qs = _ordered_bench_queries()
    out: dict[str, list[dict]] = {n: [] for n in qs}
    for pass_no in range(3):  # pass 0 = warm
        for name, fn in qs.items():
            c0 = compile_ms()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            out[name].append(
                {"pass": pass_no, "sec": dt,
                 "compile_ms": compile_ms() - c0}
            )
            row_cleanup()

    print(json.dumps({
        "cache_max_entries": max_entries or "default(100)",
        "rows": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
