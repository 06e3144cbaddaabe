"""Targeted tests for the round-12 operators: isotonic calibration,
Shapley attribution, malformed-JSONL audit, MATTR diversity,
Cochran's Q.  Cross-engine value equality lives in
test_oracle_parity.py; these pin the ALGORITHMS against independent
references and the closed-form invariants the docstrings claim."""

from __future__ import annotations

import re

from map2db_spark.registry import QUERIES, _ensure_loaded
from tests.conftest import SF_CORRECT, SF_SMOKE

_ensure_loaded()


def _rows(spark, name, sf=SF_CORRECT):
    return QUERIES[name].fn(spark, sf).collect()


# ---------------------------------------------------------------------------
# Isotonic calibration: monotone fit, PAV minimax vs sequential PAV
# ---------------------------------------------------------------------------


def test_isotonic_fit_is_monotone_and_recovers_planted_slope(spark):
    rows = sorted(_rows(spark, "x_isotonic_calibration"), key=lambda r: r["bin"])
    fits = [r["iso_micro"] for r in rows]
    assert fits == sorted(fits), fits  # non-decreasing by construction
    assert all(0 <= f <= 1_000_000 for f in fits)
    # planted rate rises 20% -> 77%: the fit must rise materially
    assert fits[-1] - fits[0] > 300_000, (fits[0], fits[-1])
    # fit can't leave the observed-rate envelope
    lo = min(r["n_pos"] / r["n"] for r in rows) * 1e6
    hi = max(r["n_pos"] / r["n"] for r in rows) * 1e6
    assert lo - 1 <= fits[0] and fits[-1] <= hi + 1


def test_isotonic_matches_sequential_pav(spark):
    """The minimax identity must reproduce the SEQUENTIAL PAV pooling
    exactly (same blocks, same pooled means)."""
    rows = sorted(_rows(spark, "x_isotonic_calibration"), key=lambda r: r["bin"])
    pairs = [(r["n"], r["n_pos"]) for r in rows]
    # sequential PAV (textbook stack form) with block extents; pool
    # on strict violation mean(prev) > mean(last), compared via
    # exact integer cross-multiplication
    blocks = []  # [n, s, width]
    for n, s in pairs:
        blocks.append([n, s, 1])
        while (
            len(blocks) >= 2
            and blocks[-2][1] * blocks[-1][0] > blocks[-1][1] * blocks[-2][0]
        ):
            n2, s2, w2 = blocks.pop()
            blocks[-1][0] += n2
            blocks[-1][1] += s2
            blocks[-1][2] += w2
    ref = []
    for n, s, w in blocks:
        ref.extend([round(s / n * 1e6)] * w)
    got = [r["iso_micro"] for r in rows]
    assert len(got) == len(ref)
    assert all(abs(a - b) <= 1 for a, b in zip(got, ref)), (got, ref)


# ---------------------------------------------------------------------------
# Shapley attribution: efficiency identity + symmetry of the weights
# ---------------------------------------------------------------------------


def test_shapley_efficiency_identity(spark):
    import pyspark.sql.functions as F

    from map2db_spark.tables import Tables

    rows = _rows(spark, "x_shapley_attribution")
    assert sorted(r["channel"] for r in rows) == ["click", "signup", "view"]
    total = sum(r["phi_x6"] for r in rows)
    # v(C) - v(empty): converted users reachable by some channel vs none
    touched = (
        Tables(spark, SF_CORRECT)
        .events.groupBy("user_id")
        .agg(
            F.expr(
                "bit_or(CASE event_type WHEN 'click' THEN 1"
                " WHEN 'view' THEN 2 WHEN 'signup' THEN 4 ELSE 0 END)"
            ).alias("mask"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
        .where(F.col("conv") == 1)
    )
    v_full = touched.count()
    v_empty = touched.where(F.col("mask") == 0).count()
    assert total == 6 * (v_full - v_empty), (total, v_full, v_empty)


# ---------------------------------------------------------------------------
# Malformed-JSONL audit: the construction rule is what the reader sees
# ---------------------------------------------------------------------------


def test_malformed_jsonl_counts_match_construction(spark):
    import pyspark.sql.functions as F

    from map2db_spark.tables import Tables

    r = _rows(spark, "f_malformed_jsonl_audit")[0]
    d = (
        Tables(spark, SF_CORRECT)
        .documents.where(F.col("doc_id") < 192)
        .select("doc_id")
        .collect()
    )
    ids = [x["doc_id"] for x in d]
    expect_corrupt = sum(1 for i in ids if i % 17 == 0)
    assert r["n_corrupt"] == expect_corrupt
    assert r["n_good"] == len(ids) - expect_corrupt
    assert r["sum_good_ids"] == sum(i for i in ids if i % 17 != 0)


# ---------------------------------------------------------------------------
# MATTR: closed-form interval sum vs brute-force window distincts
# ---------------------------------------------------------------------------


def test_mattr_closed_form_equals_bruteforce(spark):
    import pyspark.sql.functions as F

    from map2db_spark.tables import Tables

    W = 25
    rows = {r["doc_id"]: r for r in _rows(spark, "t_mattr_diversity")}
    docs = (
        Tables(spark, SF_CORRECT)
        .documents.where(F.col("doc_id").isin(*list(rows)[:5]))
        .select("doc_id", "text")
        .collect()
    )
    assert docs
    for d in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", d["text"].lower()) if t]
        n = len(toks)
        assert n >= W
        brute = sum(
            len(set(toks[w : w + W])) for w in range(n - W + 1)
        )
        r = rows[d["doc_id"]]
        assert r["n_tokens"] == n
        assert r["n_windows"] == n - W + 1
        assert r["distinct_sum"] == brute, (d["doc_id"], r["distinct_sum"], brute)
        assert r["mattr_micro"] == round(brute / (W * (n - W + 1)) * 1e6)


def test_mattr_excludes_short_docs(spark):
    import pyspark.sql.functions as F

    from map2db_spark.tables import Tables

    out_ids = {r["doc_id"] for r in _rows(spark, "t_mattr_diversity", SF_SMOKE)}
    docs = Tables(spark, SF_SMOKE).documents.select("doc_id", "text").collect()
    for d in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", d["text"].lower()) if t]
        assert (d["doc_id"] in out_ids) == (len(toks) >= 25)


# ---------------------------------------------------------------------------
# Cochran's Q: planted ordering + internal identities + k=2 reduction
# ---------------------------------------------------------------------------


def test_cochran_q_recovers_planted_ordering(spark):
    r = _rows(spark, "x_cochran_q")[0]
    # planted accuracies 70 / 72 / 65
    assert r["g2"] > r["g1"] > r["g3"], (r["g1"], r["g2"], r["g3"])
    assert r["q_micro"] is not None and r["q_micro"] > 0
    # with 10k items and a 7-point spread, Q should be decisively
    # above the chi2(df=2) 1% critical value (~9.21)
    assert r["q_micro"] > 9_210_000, r["q_micro"]


def test_cochran_q_reduces_to_mcnemar_for_k2():
    """Closed-form check on a tiny table: for k = 2, Q equals
    McNemar's (b-c)^2/(b+c).  Pure-Python evaluation of the same
    integer formula the query emits."""
    # items: (a_ok, b_ok) counts — 5 both, 3 only-a, 2 only-b, 4 neither
    preds = [(1, 1)] * 5 + [(1, 0)] * 3 + [(0, 1)] * 2 + [(0, 0)] * 4
    k = 2
    g = [sum(p[j] for p in preds) for j in range(k)]
    sl = sum(sum(p) for p in preds)
    sl2 = sum(sum(p) ** 2 for p in preds)
    num = (k - 1) * (k * sum(x * x for x in g) - sum(g) ** 2)
    den = k * sl - sl2
    q = num / den
    b, c = 3, 2
    assert abs(q - (b - c) ** 2 / (b + c)) < 1e-12
