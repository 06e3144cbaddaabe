"""Full driver simulation: run every registered query on a VANILLA
SparkSession (no engine confs) and value-compare against its DuckDB
oracle, exactly like the external correctness gate.  Run from any cwd:

    python3 /root/repo/tests/driver_sim.py [sf_dir] [name,name,...]

An optional comma-separated name list restricts the run (targeted
scale re-checks after changing a few queries).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def _canon_decimal(v: decimal.Decimal) -> str:
    """Exact canonical digit string: no exponent, no trailing
    fractional zeros.  Decimals must NOT round through float — DuckDB's
    pandas path corrupts DECIMAL(38,0) above 2^53 (round 5's three red
    rows), so the sim compares the exact value and is never more
    lenient than the gate."""
    s = format(v, "f")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return "0" if s in ("", "-0") else s


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return _canon_decimal(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict)):
        # the external driver's value-hash dies on container cells
        # (unhashable type) — fail here so the sim is never more
        # lenient than the gate it mirrors
        raise AssertionError(
            f"container-typed result cell {v!r}: serialize to string "
            "in the registered query"
        )
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    # 8g heap: one long-lived JVM runs 300+ queries back-to-back (the
    # external driver grades 50 per fresh session); without headroom a
    # heavy sf0.1 join can OOM on residual cached/broadcast blocks.
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver-sim")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    import __spark_entry__ as e

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    entry_rows = e.entry(spark).collect()
    print(f"entry: {len(entry_rows)} rows", flush=True)
    assert len(entry_rows) > 0

    qs, oracles = e.queries(), e.oracle_sql()
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    if only:
        unknown = only - set(qs)
        assert not unknown, f"unknown query names: {sorted(unknown)}"
    failed = []
    n_run = 0
    for name in sorted(qs):
        if only is not None and name not in only:
            continue
        n_run += 1
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf)
            s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
            if name in oracles:
                # the gate hashes TYPED cells: an uncast sum(BIGINT)
                # oracle (HUGEINT → float64) fails it even with equal
                # values, so the sim checks dtype families too
                from tests.dtype_guard import assert_oracle_dtype_parity

                assert_oracle_dtype_parity(
                    name, sdf.schema, con, oracles[name]
                )
                rel = con.execute(oracles[name])
                d_cols = [c[0] for c in rel.description]
                d_rows = rel.fetchall()
                sc, sr = normalize(s_cols, s_rows)
                dc, dr = normalize(d_cols, d_rows)
                ok = sc == dc and sr == dr
                status = "MATCH" if ok else "MISMATCH"
                if not ok:
                    failed.append(name)
            else:
                status = f"rows-only({len(s_rows)})"
        except Exception as ex:  # noqa: BLE001
            status = f"ERROR {type(ex).__name__}: {ex}"
            failed.append(name)
        finally:
            # queries are independent; persisted intermediates (LSH
            # neighborhoods, round-trip results, stream transports)
            # must not accumulate across 300+ queries in one JVM
            spark.catalog.clearCache()
        print(f"{name}: {status} [{time.perf_counter() - t0:.1f}s]", flush=True)

    spark.stop()
    print(f"\n{n_run} queries, {len(failed)} failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
