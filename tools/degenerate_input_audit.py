"""Degenerate-input audit: every registered query on EMPTY and
SINGLE-ROW tables, Spark vs oracle, classified.

The class this hunts (found by review in round 14, fixed for
t_textrank_keywords): an input a fixture never produces — an empty
table, a single row, an all-filtered-out subset — making ONE engine
raise where the other returns rows.  The sf0.001 thin-data sweep
cannot see it (its tables are never empty), and the static
divide-guard audit only sees SQL division sites (t_textrank's was a
DRIVER-SIDE Python division on a .count() result).  This audit is the
structural complement: it materializes the degenerate inputs and runs
both engines.

Usage (from anywhere; ~30 min over the full registry):

    python3 tools/degenerate_input_audit.py [empty|mono|linked] [name,...]

Classification per (query, fixture):

    agree          both engines succeed and value-match
    diverge        both succeed, rows/values differ  <- defect
    spark-error    Spark raises, oracle succeeds     <- defect class
    oracle-error   oracle raises, Spark succeeds     <- defect class
    both-error     both raise (loud failure on both engines — the
                   acceptable shape for inputs the operator cannot
                   define a result on)
    spark-ok / spark-error-noracle   rows-only queries

The audit REPORTS; fixing a flagged verified query is a deliberate
re-grade decision (registry window rules), not an automatic edit.
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

SRC_SF = "/root/testdata/sf0.001"


def build_fixture(kind: str) -> str:
    """Materialize the degenerate tables (schema-preserving parquet)
    and return the dir.

    - 'empty': LIMIT 0 of every table;
    - 'mono': LIMIT 1 of every table (FKs NOT consistent — joins go
      empty, exercising the empty-join-result path);
    - 'linked': ONE order with its actual lineitems, customer,
      suppliers, parts, nations, and regions (FK-consistent — joins
      produce 1-to-few rows, exercising singleton aggregates and
      windows).
    """
    import duckdb

    out = f"/tmp/degenerate_{kind}"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    if kind in ("empty", "mono"):
        limit = 0 if kind == "empty" else 1
        for t in TABLES:
            dst = os.path.join(out, f"{t}.parquet")
            if not os.path.exists(dst):
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{SRC_SF}/{t}.parquet')"
                    f" LIMIT {limit}) TO '{dst}' (FORMAT PARQUET)"
                )
        return out
    assert kind == "linked", kind
    for t in TABLES:
        con.execute(
            f"CREATE VIEW src_{t} AS SELECT * FROM"
            f" read_parquet('{SRC_SF}/{t}.parquet')"
        )
    picks = {
        "orders": "SELECT * FROM src_orders ORDER BY o_orderkey LIMIT 1",
        "lineitem": (
            "SELECT l.* FROM src_lineitem l WHERE l.l_orderkey ="
            " (SELECT min(o_orderkey) FROM src_orders)"
        ),
        "customer": (
            "SELECT c.* FROM src_customer c WHERE c.c_custkey IN"
            " (SELECT o_custkey FROM src_orders ORDER BY o_orderkey LIMIT 1)"
        ),
        "supplier": (
            "SELECT s.* FROM src_supplier s WHERE s.s_suppkey IN"
            " (SELECT l_suppkey FROM src_lineitem WHERE l_orderkey ="
            " (SELECT min(o_orderkey) FROM src_orders))"
        ),
        "part": (
            "SELECT p.* FROM src_part p WHERE p.p_partkey IN"
            " (SELECT l_partkey FROM src_lineitem WHERE l_orderkey ="
            " (SELECT min(o_orderkey) FROM src_orders))"
        ),
        "nation": (
            "SELECT n.* FROM src_nation n WHERE n.n_nationkey IN"
            " (SELECT c_nationkey FROM src_customer WHERE c_custkey IN"
            "  (SELECT o_custkey FROM src_orders ORDER BY o_orderkey LIMIT 1)"
            "  UNION SELECT s_nationkey FROM src_supplier WHERE s_suppkey IN"
            "  (SELECT l_suppkey FROM src_lineitem WHERE l_orderkey ="
            "   (SELECT min(o_orderkey) FROM src_orders)))"
        ),
        "region": (
            "SELECT r.* FROM src_region r WHERE r.r_regionkey IN"
            " (SELECT n_regionkey FROM src_nation)"
        ),
        "events": "SELECT * FROM src_events ORDER BY event_id LIMIT 1",
        "documents": "SELECT * FROM src_documents ORDER BY doc_id LIMIT 1",
        "embeddings": "SELECT * FROM src_embeddings LIMIT 1",
    }
    for t in TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            con.execute(f"COPY ({picks[t]}) TO '{dst}' (FORMAT PARQUET)")
    return out


def main() -> int:
    KINDS = ("empty", "mono", "linked")
    kinds = [sys.argv[1]] if len(sys.argv) > 1 and sys.argv[1] in KINDS \
        else list(KINDS)
    name_arg = sys.argv[2] if len(sys.argv) > 2 else (
        sys.argv[1] if len(sys.argv) > 1 and sys.argv[1] not in KINDS
        else None
    )
    only = set(name_arg.split(",")) if name_arg else None

    from pyspark.sql import SparkSession

    from tests.driver_sim import normalize

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("degenerate-audit")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    verdicts: Counter = Counter()
    flagged: dict[str, list[str]] = {}
    for kind in kinds:
        sf = build_fixture(kind)
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{sf}/{t}.parquet')"
            )
        for name in sorted(qs):
            if only is not None and name not in only:
                continue
            t0 = time.perf_counter()
            s_exc = o_exc = None
            s_cols = s_rows = d_cols = d_rows = None
            try:
                sdf = qs[name](spark, sf)
                s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
            except Exception as ex:  # noqa: BLE001
                s_exc = f"{type(ex).__name__}: {str(ex).splitlines()[0][:140]}"
            if name in oracles:
                try:
                    rel = con.execute(oracles[name])
                    d_cols = [c[0] for c in rel.description]
                    d_rows = rel.fetchall()
                except Exception as ex:  # noqa: BLE001
                    o_exc = f"{type(ex).__name__}: {str(ex).splitlines()[0][:140]}"
                if s_exc and o_exc:
                    verdict = "both-error"
                elif s_exc:
                    verdict = "spark-error"
                elif o_exc:
                    verdict = "oracle-error"
                else:
                    sc, sr = normalize(s_cols, s_rows)
                    dc, dr = normalize(d_cols, d_rows)
                    verdict = "agree" if (sc == dc and sr == dr) else "diverge"
            else:
                verdict = "spark-error-noracle" if s_exc else "spark-ok"
            spark.catalog.clearCache()
            verdicts[verdict] += 1
            tag = f"{kind}:{name}"
            if verdict in ("diverge", "spark-error", "oracle-error"):
                flagged.setdefault(verdict, []).append(
                    f"{tag}  [{s_exc or o_exc or 'value-diverge'}]"
                )
            print(
                f"{tag}: {verdict} [{time.perf_counter() - t0:.1f}s]",
                flush=True,
            )

    spark.stop()
    print("\n==== degenerate-input audit summary ====")
    for k, v in sorted(verdicts.items()):
        print(f"  {k}: {v}")
    for verdict, items in sorted(flagged.items()):
        print(f"\n{verdict} ({len(items)}):")
        for it in items:
            print(f"  {it}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
