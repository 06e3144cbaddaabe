"""Fast (no-Spark) oracle type sweep: DESCRIBE every registered
oracle in DuckDB and reject the types that corrupt through the
gate's pandas path — HUGEINT/UHUGEINT (→ float64, splits the typed
hash even with equal values: round 10's four red rows) and DECIMAL
wider than 18 digits (→ float64 above 2^53: round 5's three red
rows).  Runs in ~3 s, so it catches an uncast sum(BIGINT) the moment
a query module is written, without waiting for the Spark parity
sweep."""

from __future__ import annotations

import pytest

from map2db_spark.registry import QUERIES, _ensure_loaded
from tests.conftest import SF_CORRECT

_ensure_loaded()

ORACLES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def duck_views():
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF_CORRECT}/{t}.parquet')"
        )
    return con


def test_no_oracle_emits_gate_corrupting_types(duck_views):
    from tests.dtype_guard import duck_output_types

    bad = []
    for name in ORACLES:
        for col, typ in duck_output_types(
            duck_views, QUERIES[name].oracle
        ).items():
            t = typ.strip().upper()
            if t in ("HUGEINT", "UHUGEINT"):
                bad.append((name, col, t))
            elif t.startswith("DECIMAL("):
                prec = int(t.split("(")[1].split(",")[0])
                if prec > 18:
                    bad.append((name, col, t))
    assert not bad, (
        "oracle output columns that corrupt through the gate's pandas"
        f" path (CAST them): {bad}"
    )
