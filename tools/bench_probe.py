#!/usr/bin/env python3
"""Per-query optimization probe (guide §1): isolates each bench row
with the noop sink, times N runs standalone (no bench-sequence state),
and captures .explain("formatted") to plans/<tag>/<query>_<suffix>.txt.

Usage:
    python3 tools/bench_probe.py [--queries q1,q2] [--runs 3]
        [--plans-dir plans/r15] [--suffix before] [--sf-dir DIR]

Not part of the graded bench contract — bench.py stays the official
artifact; this is the guide §1.1 empirical loop tool.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from map2db_spark.registry import bench_queries
    from map2db_spark.session import get_spark

    spark = get_spark("bench_probe")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    entry_mod._nanos_as_long(spark)

    qs = bench_queries()
    wanted = [q for q in args.queries.split(",") if q] or list(qs)
    plans_dir = Path(args.plans_dir) if args.plans_dir else None
    if plans_dir:
        plans_dir.mkdir(parents=True, exist_ok=True)

    try:
        load0 = round(os.getloadavg()[0], 2)
    except OSError:
        load0 = None

    results: dict[str, list[float]] = {}
    for name in wanted:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        if plans_dir:
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, args.sf_dir).explain("formatted")
            (plans_dir / f"{name}_{args.suffix}.txt").write_text(buf.getvalue())
        if args.runs == 0:  # plans-only capture
            continue
        # warm once (JIT/page cache), then timed runs
        try:
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # surface, keep probing the rest
            results[name] = [float("nan")]
            print(f"ERROR {name}: {exc}", file=sys.stderr)
            continue
        runs = []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist(True)
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        results[name] = runs
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "sf_dir": args.sf_dir,
        "host_load1_start": load0,
        "runs": results,
        "min": {n: min(r) for n, r in results.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
