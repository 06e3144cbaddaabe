"""Semantic pins for the round-15 operators — invariants the oracle
parity gate cannot express (it proves Spark == DuckDB, not that both
compute the RIGHT thing)."""

from __future__ import annotations

import math

import duckdb
import pyspark.sql.functions as F

from map2db_spark.registry import QUERIES, _ensure_loaded
from tests.conftest import SF_CORRECT

_ensure_loaded()

SF_THIN = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# cross-engine libm parity (the determinism SGT/Hill rest on)
# ---------------------------------------------------------------------------


def test_ln_and_pow_micro_agree_across_engines(spark):
    """round(1e6 * ln(i)) and round(1e6 * pow((i+1)/i, b)) must agree
    between the JVM (Spark) and libm (DuckDB) for every plausible
    count input — the determinism claim t_simple_good_turing and
    t_hill_tail_index release floats under.  250k probes."""
    s = spark.range(1, 200001).select(
        F.round(F.log(F.col("id").cast("double")) * 1000000)
        .cast("long")
        .alias("v")
    ).collect()
    d = duckdb.sql(
        "SELECT CAST(round(ln(CAST(i AS DOUBLE)) * 1000000) AS BIGINT)"
        " FROM range(1, 200001) t(i)"
    ).fetchall()
    assert all(a["v"] == b[0] for a, b in zip(s, d))
    for b in (-1.37, -0.9876543, 0.7317316):
        s2 = spark.range(1, 25001).select(
            F.round(
                F.pow(
                    (F.col("id") + 1).cast("double") / F.col("id").cast("double"),
                    F.lit(b),
                )
                * 1000000
            )
            .cast("long")
            .alias("v")
        ).collect()
        d2 = duckdb.sql(
            f"SELECT CAST(round(pow((CAST(i AS DOUBLE) + 1) / CAST(i AS DOUBLE),"
            f" {b!r}) * 1000000) AS BIGINT) FROM range(1, 25001) t(i)"
        ).fetchall()
        assert all(a["v"] == x[0] for a, x in zip(s2, d2)), b


# ---------------------------------------------------------------------------
# Benjamini-Yekutieli
# ---------------------------------------------------------------------------


def test_by_rejects_no_more_than_bh(spark):
    """BY's harmonic-corrected threshold is strictly tighter than
    BH's, so on the SAME hypothesis set BY can never reject more.
    Rebuild BH on the BY-tagged p-values via the shared oracle shape
    so the comparison is apples-to-apples."""
    rows = {r["planted"]: r for r in QUERIES["x_benjamini_yekutieli"].fn(spark, SF_CORRECT).collect()}
    by_rejected = sum(r["n_rejected"] for r in rows.values())
    kstar = next(iter(rows.values()))["kstar"]
    # BH on the same p-values (c(m) term dropped)
    from map2db_spark.queries_round15 import _hex_bigint

    bh = duckdb.sql(f"""
        WITH hyp AS (
          SELECT p_partkey AS hid,
                 CASE WHEN p_partkey % 20 = 0
                      THEN {_hex_bigint("p_partkey", "by:")} % 1000 + 1
                      ELSE {_hex_bigint("p_partkey", "by:")} % 1000000 + 1
                 END AS p_micro
          FROM read_parquet('{SF_CORRECT}/part.parquet')
        ),
        ranked AS (
          SELECT p_micro, row_number() OVER (ORDER BY p_micro, hid) AS rnk
          FROM hyp
        ), m AS (SELECT count(*) AS m FROM ranked)
        SELECT coalesce(max(CASE WHEN p_micro * m.m * 20 <= rnk * 1000000
                             THEN rnk END), 0) AS k
        FROM ranked, m
    """).fetchone()[0]
    assert kstar <= bh, (kstar, bh)
    assert by_rejected == kstar  # step-up rejects exactly ranks 1..k*
    # the planted fixture must still be overwhelmingly recovered
    assert rows[1]["n_rejected"] > 0


# ---------------------------------------------------------------------------
# Kruskal-Wallis
# ---------------------------------------------------------------------------


def test_kruskal_wallis_matches_scipy_reference(spark):
    """H (tie-corrected) must agree with a from-scratch Python
    computation over the same data to within the documented rounding
    (per-group e9 rounding -> micro slack)."""
    rows = QUERIES["x_kruskal_wallis"].fn(spark, SF_THIN).collect()
    assert rows and all(r["h_micro"] == rows[0]["h_micro"] for r in rows)
    import duckdb as dk

    vals = dk.sql(
        f"SELECT event_type, CAST(round(value * 100) AS BIGINT)"
        f" FROM read_parquet('{SF_THIN}/events.parquet')"
    ).fetchall()
    from collections import Counter, defaultdict

    freq = Counter(v for _, v in vals)
    r2 = {}
    cum = 0
    for v in sorted(freq):
        r2[v] = 2 * cum + freq[v] + 1
        cum += freq[v]
    groups = defaultdict(list)
    for g, v in vals:
        groups[g].append(v)
    n = len(vals)
    h = 12.0 * sum(
        (sum(r2[v] for v in vs) / 2.0) ** 2 / len(vs) for vs in groups.values()
    ) / (n * (n + 1)) - 3 * (n + 1)
    tie = sum(c**3 - c for c in freq.values())
    h_tied = h / (1 - tie / (n**3 - n))
    assert abs(rows[0]["h_micro"] - h * 1e6) < 50, (rows[0]["h_micro"], h * 1e6)
    assert abs(rows[0]["h_tied_micro"] - h_tied * 1e6) < 50
    assert sum(r["n_grp"] for r in rows) == n
    # rank sums over all groups must total 2 * (1 + ... + N) = N(N+1)
    assert sum(r["r2_sum"] for r in rows) == n * (n + 1)


# ---------------------------------------------------------------------------
# Ljung-Box
# ---------------------------------------------------------------------------


def test_ljung_box_q_is_cumulative_and_positive(spark):
    rows = QUERIES["x_ljung_box"].fn(spark, SF_CORRECT).collect()
    assert 1 <= len(rows) <= 7
    qs = [r["q_cum_micro"] for r in rows if r["q_cum_micro"] is not None]
    assert qs == sorted(qs)  # Q(m) is a sum of non-negative terms
    assert all(q >= 0 for q in qs)
    for r in rows:
        if r["rho_micro"] is not None:
            assert -1_000_000 <= r["rho_micro"] <= 1_000_000


# ---------------------------------------------------------------------------
# Nelson-Aalen
# ---------------------------------------------------------------------------


def test_nelson_aalen_dominates_km_log_survival(spark):
    """H_NA(t) <= -ln(S_KM(t)) pointwise (1-x <= e^-x per factor), and
    the at-risk column must agree with x_survival_km's."""
    na = QUERIES["x_nelson_aalen"].fn(spark, SF_CORRECT).collect()
    km = {r["t_days"]: r for r in QUERIES["x_survival_km"].fn(spark, SF_CORRECT).collect()}
    assert na and len(na) == len(km)
    s = 1.0
    for r in sorted(na, key=lambda r: r["t_days"]):
        k = km[r["t_days"]]
        assert r["n_at_risk"] == k["n_at_risk"]
        assert r["n_events"] == k["n_events"]
        s *= 1 - k["n_events"] / k["n_at_risk"]
        if s > 0:
            assert r["h_cum_micro"] <= -math.log(s) * 1e6 + len(na) * 0.5 + 1
    cums = [r["h_cum_micro"] for r in sorted(na, key=lambda r: r["t_days"])]
    assert cums == sorted(cums)  # hazard accumulates


# ---------------------------------------------------------------------------
# Fleiss' kappa
# ---------------------------------------------------------------------------


def test_fleiss_kappa_near_zero_on_random_ratings(spark):
    """md5-derived ratings are independent of subject and rater, so
    kappa must sit in a tight band around 0 (and the marginals near
    uniform)."""
    r = QUERIES["x_fleiss_kappa"].fn(spark, SF_CORRECT).collect()[0]
    assert r["n_subj"] > 0
    # P_e ~ 1/K = 0.25 for K=4 uniform categories
    nr = r["n_subj"] * 5
    assert abs(r["sum_cj2"] / nr**2 - 0.25) < 0.01
    assert abs(r["kappa_micro"]) < 50_000  # |kappa| < 0.05


# ---------------------------------------------------------------------------
# Simple Good-Turing
# ---------------------------------------------------------------------------


def test_sgt_slope_matches_reference_and_covers_gt_holes(spark):
    """The log-log fof slope must reproduce a from-scratch OLS over
    the same (micro-rounded) points, and the smoothed r* must be
    defined at EVERY r — including the rows where the exact
    t_good_turing table is NULL (N_{r+1} = 0 holes).  NOTE the
    synthetic corpus has NO hapaxes (min token freq ~29) and a
    near-flat fof, so the slope is NOT in the Zipf b < -1 regime
    here — the pin checks the arithmetic, not the corpus shape."""
    sgt = QUERIES["t_simple_good_turing"].fn(spark, SF_CORRECT).collect()
    gt = {r["r"]: r for r in QUERIES["t_good_turing"].fn(spark, SF_CORRECT).collect()}
    assert sgt
    slope = sgt[0]["slope_micro"]
    assert slope is not None
    assert all(r["slope_micro"] == slope for r in sgt)
    pts = [
        (round(1e6 * math.log(r["r"])), round(1e6 * math.log(r["n_r"])))
        for r in sgt
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    b = (float(n) * sxy - float(sx) * sy) / (float(n) * sxx - float(sx) * sx)
    assert slope == round(1e6 * b)
    holes = [r for r in sgt if gt[r["r"]]["r_star_micro"] is None]
    assert holes, "fixture unexpectedly has no fof holes"
    for r in sgt:
        assert r["r_star_sgt_micro"] is not None and r["r_star_sgt_micro"] > 0
        assert r["r_star_sgt_micro"] == round(
            1e6 * (r["r"] + 1) * ((r["r"] + 1.0) / r["r"]) ** b
        )


# ---------------------------------------------------------------------------
# Bottom-k reservoir merge
# ---------------------------------------------------------------------------


def test_reservoir_merge_parity_holds_exactly(spark):
    """The merge-parity theorem: the 4-shard bottom-k merge must equal
    the global bottom-k rank for rank."""
    rows = QUERIES["x_reservoir_merge"].fn(spark, SF_CORRECT).collect()
    assert len(rows) == 64
    assert all(r["agree"] == 1 for r in rows)
    assert all(r["event_id"] == r["merged_event_id"] for r in rows)
    prios = [r["prio"] for r in sorted(rows, key=lambda r: r["rnk"])]
    assert prios == sorted(prios)
    assert len(set(r["event_id"] for r in rows)) == 64


# ---------------------------------------------------------------------------
# Hill tail index
# ---------------------------------------------------------------------------


def test_hill_alpha_positive_and_matches_reference(spark):
    r = QUERIES["t_hill_tail_index"].fn(spark, SF_CORRECT).collect()[0]
    # the synthetic corpus has a ~31-token vocabulary, so the top-51
    # truncates at the vocabulary: k_eff = min(50, |vocab| - 1)
    vocab = duckdb.sql(
        f"SELECT count(DISTINCT t) FROM (SELECT unnest("
        f"regexp_split_to_array(trim(text), '\\s+')) AS t"
        f" FROM read_parquet('{SF_CORRECT}/documents.parquet'))"
    ).fetchone()[0]
    assert r["k_eff"] == min(50, vocab - 1)
    assert r["f_ref"] >= 1
    assert r["hsum_micro"] > 0
    # alpha = k/H reproduced from the emitted pieces
    expect = round(1e6 * r["k_eff"] * 1e6 / r["hsum_micro"])
    assert r["alpha_micro"] == expect
    # positive tail exponent in a sane band
    assert 0 < r["alpha_micro"] < 100_000_000
