"""Standing degenerate-input gate for the CURRENT round's queries.

tools/degenerate_input_audit.py sweeps the whole registry (~30 min,
run per round, inventory in SCALE.md); this test runs the same check
over just the UNVERIFIED tier — this round's new registrations and
module-touched re-grades, exactly the rows the external driver is
about to grade — so no new operator can ship an error-vs-empty or
error-vs-singleton divergence (the t_textrank ZeroDivisionError
class, round 14).

Self-maintaining: the unverified tier is computed from the registry,
so next round's new queries are covered the moment they register.
"""

from __future__ import annotations

import duckdb
import pytest

from map2db_spark.registry import (
    _DRIVER_VERIFIED,
    QUERIES,
    _ensure_loaded,
)
from tools.degenerate_input_audit import TABLES, build_fixture

_ensure_loaded()
TIER0 = [n for n in QUERIES if n not in _DRIVER_VERIFIED]


@pytest.mark.parametrize("kind", ["empty", "mono", "linked"])
def test_unverified_queries_agree_on_degenerate_inputs(spark, kind):
    from tests.driver_sim import normalize

    sf = build_fixture(kind)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    bad: list[str] = []
    for name in TIER0:
        spec = QUERIES[name]
        s_exc = o_exc = None
        try:
            sdf = spec.fn(spark, sf)
            s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            s_exc = f"{type(ex).__name__}: {str(ex).splitlines()[0][:120]}"
        if spec.oracle is None:
            if s_exc:
                bad.append(f"{name}: spark-error (rows-only) [{s_exc}]")
            continue
        try:
            rel = con.execute(spec.oracle)
            d_cols = [c[0] for c in rel.description]
            d_rows = rel.fetchall()
        except Exception as ex:  # noqa: BLE001
            o_exc = f"{type(ex).__name__}: {str(ex).splitlines()[0][:120]}"
        if s_exc and o_exc:
            continue  # loud on BOTH engines: acceptable degenerate shape
        if s_exc or o_exc:
            bad.append(f"{name}: one-sided error [{s_exc or o_exc}]")
            continue
        sc, sr = normalize(s_cols, s_rows)
        dc, dr = normalize(d_cols, d_rows)
        if not (sc == dc and sr == dr):
            bad.append(f"{name}: value-diverge ({len(sr)} vs {len(dr)} rows)")
        spark.catalog.clearCache()
    assert not bad, (
        f"degenerate-{kind} divergence in this round's queries "
        f"(guard BOTH engines or make both fail loudly): {bad}"
    )
