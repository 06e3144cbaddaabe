"""Semantic pins for the round-14 operators — invariants the oracle
parity gate cannot express (it proves Spark == DuckDB, not that both
compute the RIGHT thing)."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from map2db_spark.registry import QUERIES, _ensure_loaded
from tests.conftest import SF_CORRECT

_ensure_loaded()

SF_THIN = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# t-digest
# ---------------------------------------------------------------------------


def _td_bucket(i: int, n: int) -> int:
    """Pure-python twin of the query's bucket map."""
    from map2db_spark.queries_round14 import _TD_B, _TD_2B2, _TD_B3, _TD_DELTA

    r = ((2 * i - 1) * (_TD_B // 2)) // n
    return (_TD_DELTA * (r * (2 * r * r - 3 * r * _TD_B + _TD_2B2))) // _TD_B3


def test_tdigest_scale_function_shape():
    """The bucket map must be monotone in rank, bounded by delta, and
    EDGE-DENSE: the first/last 2% of ranks get more distinct buckets
    than a same-width middle slice (the tail-resolution property that
    distinguishes a t-digest from an equi-depth histogram)."""
    from map2db_spark.queries_round14 import _TD_DELTA

    n = 100_000
    buckets = [_td_bucket(i, n) for i in range(1, n + 1)]
    assert all(b2 >= b1 for b1, b2 in zip(buckets, buckets[1:]))
    assert 0 <= buckets[0] and buckets[-1] < _TD_DELTA
    width = n // 10  # 10% slices: ~6.4 edge buckets vs ~1.6 middle
    lo_edge = len(set(buckets[:width]))
    hi_edge = len(set(buckets[-width:]))
    mid = len(set(buckets[n // 2 - width // 2 : n // 2 + width // 2]))
    assert lo_edge > mid and hi_edge > mid, (lo_edge, mid, hi_edge)


def test_tdigest_output_is_a_wellformed_digest(spark):
    rows = QUERIES["x_tdigest_quantiles"].fn(spark, SF_THIN).collect()
    from map2db_spark.queries_round14 import _TD_DELTA

    assert 1 <= len(rows) <= _TD_DELTA
    # centroid value ranges are disjoint and ordered; cumulative
    # weights reconstruct the total row count
    for a, b in zip(rows, rows[1:]):
        assert a["hi_cents"] <= b["lo_cents"]
        assert a["cum_n"] < b["cum_n"]
    for r in rows:
        assert r["lo_cents"] * 1_000_000 <= r["mean_micro"] <= r["hi_cents"] * 1_000_000
    assert rows[-1]["cum_n"] == sum(r["n_k"] for r in rows) == 1000


# ---------------------------------------------------------------------------
# HLL++ sparse mode
# ---------------------------------------------------------------------------


def test_hll_sparse_downgrade_matches_direct_dense():
    """The lossless-downgrade claim, proven against a DIRECT dense
    computation: for a stream of hashes, dense registers derived from
    the sparse (idx, rho) pairs equal dense registers computed from
    the raw 60-bit hashes at p = 9."""
    from map2db_spark.queries_round14 import (
        _HLLS_DENSE_RHO_MAX,
        _HLLS_M,
        _HLLS_MP,
        _HLLS_RHO_MAX,
    )

    hvs = [
        int(hashlib.md5(f"hs:{k}".encode()).hexdigest()[:15], 16)
        for k in range(5000)
    ]
    # direct dense: bucket = hv % 2^9, rho over the remaining bits
    direct: dict[int, int] = {}
    for hv in hvs:
        b, w = hv % _HLLS_M, hv // _HLLS_M
        rho = _HLLS_DENSE_RHO_MAX - w.bit_length()
        direct[b] = max(direct.get(b, 0), rho)
    # sparse pairs at p' = 18, then the query's downgrade rule
    pairs: dict[int, int] = {}
    for hv in hvs:
        idx, w = hv % _HLLS_MP, hv // _HLLS_MP
        rho = _HLLS_RHO_MAX - w.bit_length() if w > 0 else _HLLS_RHO_MAX
        pairs[idx] = max(pairs.get(idx, 0), rho)
    down: dict[int, int] = {}
    for idx, rho in pairs.items():
        b = idx % _HLLS_M
        if rho < _HLLS_RHO_MAX:
            rho_d = rho
        elif idx // _HLLS_M > 0:
            rho_d = _HLLS_DENSE_RHO_MAX - (idx // _HLLS_M).bit_length()
        else:
            rho_d = _HLLS_DENSE_RHO_MAX
        down[b] = max(down.get(b, 0), rho_d)
    assert down == direct


def test_hll_sparse_modes_split_by_cardinality(spark):
    from map2db_spark.queries_round14 import _HLLS_THRESHOLD

    seen_modes = set()
    # sf0.001 (~145 custkeys/status) runs sparse; sf0.01 (~1.4k) dense
    for sf_dir in (SF_THIN, SF_CORRECT):
        for r in QUERIES["x_hll_sparse"].fn(spark, sf_dir).collect():
            expect = "sparse" if r["n_sparse"] <= _HLLS_THRESHOLD else "dense"
            assert r["mode"] == expect
            # sparse pair count can only undercount distincts (collisions)
            assert r["n_sparse"] <= r["exact_distinct"]
            assert r["n_dense"] <= min(512, r["n_sparse"])
            seen_modes.add(r["mode"])
    assert seen_modes == {"sparse", "dense"}, (
        "the two fixture scales should exercise BOTH representations"
    )


# ---------------------------------------------------------------------------
# O'Brien-Fleming
# ---------------------------------------------------------------------------


def test_obf_boundary_decreases_and_looks_accumulate(spark):
    rows = QUERIES["x_obrien_fleming"].fn(spark, SF_CORRECT).collect()
    assert len(rows) == 5  # weekly looks over the one-month fixture
    for a, b in zip(rows, rows[1:]):
        assert a["bound_micro"] > b["bound_micro"]  # strict spending shape
        assert a["n_a"] <= b["n_a"] and a["n_b"] <= b["n_b"]  # cumulative
    # the final-look boundary is the base constant c
    from map2db_spark.queries_round14 import _OBF_C

    assert rows[-1]["bound_micro"] == round(_OBF_C * 1_000_000)
    # crossing verdicts agree with the released statistics
    for r in rows:
        if r["z_micro"] is not None:
            assert r["crossed"] == int(abs(r["z_micro"]) > r["bound_micro"])


# ---------------------------------------------------------------------------
# Good-Turing
# ---------------------------------------------------------------------------


def test_good_turing_internal_identities(spark):
    rows = QUERIES["t_good_turing"].fn(spark, SF_THIN).collect()
    n_tokens = rows[0]["n_tokens"]
    vocab = rows[0]["vocab"]
    assert sum(r["r"] * r["n_r"] for r in rows) == n_tokens
    assert sum(r["n_r"] for r in rows) == vocab
    for r in rows:
        if r["n_r_next"] == 0:
            assert r["r_star_micro"] is None and r["p_star_e12"] is None
        else:
            # Turing estimate: r* = (r+1) * N_{r+1} / N_r
            expect = round(1_000_000 * (r["r"] + 1) * r["n_r_next"] / r["n_r"])
            assert r["r_star_micro"] == expect
    # the synthetic corpus has no hapaxes (min frequency ~29) but DOES
    # have consecutive frequencies, so the Turing estimate is exercised
    assert any(r["n_r_next"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# Page-Hinkley
# ---------------------------------------------------------------------------


def test_page_hinkley_matches_sequential_reference(spark):
    """The windowed formulation equals the textbook SEQUENTIAL loop
    (running min reset form), series by series."""
    from map2db_spark.queries_round14 import (
        _PH_BURN,
        _PH_DELTA_CENTS,
        _PH_LAMBDA_CENTS,
    )
    from map2db_spark.tables import Tables

    # take cents from the SAME Spark expression the query uses
    # (F.round is HALF_UP; python round() is half-even — the test
    # pins the PH recursion, not the rounding mode)
    ev = (
        Tables(spark, SF_THIN)
        .events.select(
            "event_type", "ts", "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    series: dict[str, list[int]] = {}
    for row in sorted(ev, key=lambda r: (r["event_type"], r["ts"], r["event_id"])):
        series.setdefault(row["event_type"], []).append(row["cents"])
    got = {
        r["event_type"]: r
        for r in QUERIES["x_page_hinkley"].fn(spark, SF_THIN).collect()
    }
    for etype, xs in series.items():
        n0 = min(_PH_BURN, len(xs))
        s0 = sum(xs[:n0])
        # the query's running min is over MONITORED rows only (no
        # implicit m_0 = 0 seed): the first monitored row always has
        # PH = 0, matching the windowed prefix-min formulation
        m, m_min, ph_max, alarm = 0, None, None, None
        for t, x in enumerate(xs[_PH_BURN:], start=_PH_BURN + 1):
            m += n0 * x - s0 - n0 * _PH_DELTA_CENTS
            m_min = m if m_min is None else min(m_min, m)
            ph = m - m_min
            ph_max = ph if ph_max is None else max(ph_max, ph)
            if alarm is None and ph > n0 * _PH_LAMBDA_CENTS:
                alarm = t
        r = got[etype]
        assert r["n"] == len(xs) and r["n0"] == n0
        assert r["ph_max_scaled"] == ph_max
        assert r["alarm_rnk"] == alarm
        assert r["alarmed"] == int(alarm is not None)


# ---------------------------------------------------------------------------
# Label propagation
# ---------------------------------------------------------------------------


def test_label_propagation_refines_true_components(spark):
    """After any number of synchronous min-label rounds, a node's
    label is a node id from its OWN connected component (labels only
    travel along edges), so two nodes with the same label must share a
    component — checked against the package's converged
    connected-components operator on the same graph."""
    from map2db_spark.operators.components import connected_components
    from map2db_spark.tables import Tables

    li = (
        Tables(spark, SF_THIN)
        .lineitem.where(F.col("l_orderkey") < 3000)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    comp = {
        r["node"]: r["comp"]
        for r in connected_components(pairs, src="u", dst="v").collect()
    }
    rows = QUERIES["g_label_propagation"].fn(spark, SF_THIN).collect()
    assert rows, "fixture graph must be non-empty"
    # the top label row is each component's minimum node id (6 rounds
    # are enough for the min to reach every node the driver grades in
    # the head; at minimum the label must BE a member of the labelled
    # component)
    for r in rows:
        assert r["label"] in comp, r
        assert r["min_node"] >= r["label"] or comp[r["min_node"]] == comp[r["label"]]


# ---------------------------------------------------------------------------
# TextRank / TOST
# ---------------------------------------------------------------------------


def test_textrank_excludes_stopwords_and_ranks_densely(spark):
    from map2db_spark.queries_round3 import _RAKE_STOP

    rows = QUERIES["t_textrank_keywords"].fn(spark, SF_THIN).collect()
    assert 0 < len(rows) <= 15
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    ranks = [r["rank_e12"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r["word"] not in _RAKE_STOP and r["word"] for r in rows)


def test_tost_variance_guard_survives_huge_sufficient_stats(spark):
    """ADVICE r14: the zero-variance guard must not overflow when the
    sufficient statistics are large (the earlier integer ss*n = s*s
    form built BIGINT products ~n^2 and raised on BOTH engines about
    two orders of magnitude beyond sf0.1).  Evaluate the shared
    _TOST_SE2 expression on synthetic stats whose old-form product
    exceeds 2^63 on both engines: the constant-arms case must emit
    NULL, the varying case a finite equal value, and neither may
    raise."""
    import duckdb

    from map2db_spark.queries_round14 import _TOST_SE2

    # constant arms: n=1e14 of value 100 -> ss*n = 1e32 (old overflow)
    # varying arms:  n=1e9, half 100 / half 102 -> ss*n ~ 1.02e22
    stats = """
      SELECT CAST(100000000000000 AS BIGINT) AS n_a,
             CAST(10000000000000000 AS BIGINT) AS s_a,
             CAST(1000000000000000000 AS BIGINT) AS ss_a,
             CAST(100000000000000 AS BIGINT) AS n_b,
             CAST(10000000000000000 AS BIGINT) AS s_b,
             CAST(1000000000000000000 AS BIGINT) AS ss_b
      UNION ALL
      SELECT CAST(1000000000 AS BIGINT),
             CAST(101000000000 AS BIGINT),
             CAST(10202000000000 AS BIGINT),
             CAST(1000000000 AS BIGINT),
             CAST(101000000000 AS BIGINT),
             CAST(10202000000000 AS BIGINT)
    """
    sql = f"SELECT {_TOST_SE2} AS se2 FROM ({stats}) ORDER BY n_a"
    duck = [r[0] for r in duckdb.sql(sql).fetchall()]
    spk = [r["se2"] for r in spark.sql(sql).collect()]
    assert duck == spk, (duck, spk)
    assert spk[1] is None  # constant arms (larger n_a) -> NULL
    assert spk[0] is not None and spk[0] > 0  # varying arms -> finite


def test_tost_is_conservative_on_degenerate_arms(spark):
    rows = QUERIES["x_tost_equivalence"].fn(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        if r["t_lower_micro"] is None or r["t_upper_micro"] is None:
            assert r["equivalent"] is None  # no evidence != equivalence
        else:
            crit = round(1.644853627 * 1_000_000)
            assert r["equivalent"] == int(
                r["t_lower_micro"] > crit and r["t_upper_micro"] > crit
            )


def test_textrank_empty_graph_returns_oracle_shape(spark, tmp_path):
    """An all-stopword corpus has no adjacency graph: the oracle's CTE
    chain yields zero rows, and the Spark side must return the same
    empty shape rather than raise ZeroDivisionError on the driver-side
    vocabulary count (a Python division invisible to both divide
    gates)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["the and of to", "a an the", "word"]  # stopwords + singleton
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    df = QUERIES["t_textrank_keywords"].fn(spark, str(tmp_path))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["word", "rank_e12", "rnk"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    assert con.execute(QUERIES["t_textrank_keywords"].oracle).df().shape[0] == 0
