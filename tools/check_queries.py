#!/usr/bin/env python3
"""Dev loop: run named registered queries vs their DuckDB oracles at
sf0.01 and print MATCH/MISMATCH with a first-difference dump.

    python3 tools/check_queries.py w_mad_outliers x_hll_manual
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)
sys.path.insert(0, str(Path(_REPO) / "tests"))

from driver_sim import normalize  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    rc = 0
    for name in names:
        t0 = time.perf_counter()
        sdf = qs[name](spark, sf)
        s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
        rel = con.execute(oracles[name])
        d_cols = [c[0] for c in rel.description]
        d_rows = rel.fetchall()
        sc, sr = normalize(s_cols, s_rows)
        dc, dr = normalize(d_cols, d_rows)
        ok = sc == dc and sr == dr
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} "
              f"({len(sr)} spark rows, {len(dr)} duck rows) "
              f"[{time.perf_counter() - t0:.1f}s]")
        if not ok:
            rc = 1
            if sc != dc:
                print(f"  cols spark={sc}\n  cols duck ={dc}")
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b:
                    print(f"  row {i} spark={a}\n  row {i} duck ={b}")
                    break
            if len(sr) != len(dr):
                print(f"  row counts differ: {len(sr)} vs {len(dr)}")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
