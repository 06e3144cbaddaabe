"""Standing gate for the r13 static divide-guard audit (VERDICT r12 #2).

Spark under ANSI mode raises DIVIDE_BY_ZERO where DuckDB yields NULL, so
any oracle division whose denominator can reach zero is a latent gate
divergence — the class that produced 5 real defects one at a time across
r11-r12 (x_ab_test_proportions, x_power_analysis, x_mcnemar_paired,
x_mann_whitney_u, x_krippendorff_alpha) and 17 more in the r13 sweep
(empty ground-truth sets, one-sided samples, singleton groups).

tools/divide_guard_audit.py extracts every /, //, % site from every
registered oracle and classifies its denominator; what the classifier
cannot prove is adjudicated by hand with a written reason.  This test
closes the loop in BOTH directions:

  * a NEW oracle with an unguarded, unadjudicated division site fails
    the suite (guard it on both engines, or adjudicate it with a
    reason);
  * a STALE adjudication (the site under it was edited away or now
    self-classifies) also fails, so the table cannot rot.
"""

from __future__ import annotations

from tools.divide_guard_audit import (
    ADJUDICATED_SAFE,
    ADJUDICATION_RULES,
    audit_sql,
    classify,
    coverage,
)


def test_every_unguarded_site_is_adjudicated():
    uncovered, _rules_hit, _keys_hit = coverage()
    assert not uncovered, [
        (s.query, s.op, s.denom, s.context) for s in uncovered
    ]


def test_no_stale_adjudications():
    _uncovered, rules_hit, keys_hit = coverage()
    stale_rules = {r[0] for r in ADJUDICATION_RULES} - rules_hit
    assert not stale_rules, sorted(stale_rules)
    stale_keys = set(ADJUDICATED_SAFE) - keys_hit
    assert not stale_keys, sorted(stale_keys)


# --- classifier unit pins (the rules the gate's precision rests on) ---


def test_literal_and_zero_literal():
    sites = audit_sql("q", "SELECT a / 2, b / 0.5 FROM t")
    assert [s.verdict for s in sites] == ["safe:literal", "safe:literal"]
    sites = audit_sql("q", "SELECT a / 0 FROM t")
    assert sites[0].verdict == "UNGUARDED"  # literal zero never adjudicates


def test_count_star_group_is_safe_but_framed_window_is_not():
    ok = audit_sql("q", "SELECT sum(x) / count(*) FROM t GROUP BY k")
    assert ok[0].verdict == "safe:count-star"
    framed = audit_sql(
        "q",
        "SELECT x / count(*) OVER (ORDER BY i ROWS BETWEEN 3 PRECEDING"
        " AND 1 PRECEDING) FROM t",
    )
    assert framed[0].verdict == "UNGUARDED"


def test_case_guard_and_nullif_are_recognised():
    sql = "SELECT CASE WHEN n = 0 THEN NULL ELSE s / n END FROM t"
    assert audit_sql("q", sql)[0].verdict == "safe:zero-compared"
    # the nullif wrapper is safe whichever rule claims it first
    assert audit_sql("q", "SELECT s / NULLIF(n, 0) FROM t")[0].verdict in (
        "safe:nullif",
        "safe:zero-compared",
    )


def test_where_bound_covers_literal_subtraction():
    sql = "SELECT s / (n - 7) FROM t WHERE n >= 8"
    assert audit_sql("q", sql)[0].verdict == "safe:bounded-difference"
    sql = "SELECT s / (n - 7) FROM t WHERE n >= 7"  # n=7 -> 0: NOT safe
    assert audit_sql("q", sql)[0].verdict == "UNGUARDED"


def test_equality_guarded_difference():
    sql = (
        "SELECT CASE WHEN a = b THEN NULL ELSE s / (a - b) END FROM t"
    )
    assert audit_sql("q", sql)[0].verdict == "safe:difference-guarded"


def test_count_alias_and_product():
    sql = (
        "WITH g AS (SELECT k, CAST(count(*) AS BIGINT) AS n_g FROM t"
        " GROUP BY k) SELECT s / (2 * g.n_g) FROM x JOIN g USING (k)"
    )
    assert audit_sql("q", sql)[-1].verdict == "safe:product"


def test_modulo_is_audited_like_division():
    sites = audit_sql("q", "SELECT a % n FROM t")
    assert sites and sites[0].op == "%"
    assert sites[0].verdict == "UNGUARDED"


def test_string_literals_do_not_hide_divisions():
    # the '/' inside the string is blanked; the real one is found
    sites = audit_sql("q", "SELECT 'a/b' AS s, x / y FROM t")
    assert len(sites) == 1 and sites[0].denom == "y"


def test_classify_sees_parenthesized_guard_form():
    sql = (
        "SELECT CASE WHEN (SELECT count(*) FROM e) = 0 THEN NULL"
        " ELSE h * 100 / (SELECT count(*) FROM e) END FROM t"
    )
    assert classify(sql, "(SELECT count(*) FROM e)") == "safe:zero-compared"


# --- extractor robustness: the standing gate must never crash the
# suite on a future oracle, however odd its SQL ---------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abc xyz019()/*%-+.,'=<>\n", max_size=300))
def test_audit_sql_never_raises_on_arbitrary_text(text):
    sites = audit_sql("fuzz", text)
    for s in sites:
        assert s.verdict.startswith(("safe:", "UNGUARDED"))


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet="ns_", min_size=1, max_size=8),
    st.integers(min_value=0, max_value=99),
)
def test_classify_never_raises(denom, k):
    classify(f"SELECT a / {denom} FROM t WHERE {denom} >= {k}", denom)


def test_division_inside_the_degenerate_branch_is_not_safe():
    # ADVICE r13: the zero-compared rule was flow-insensitive — a
    # degenerate-true comparison (d <= 0 / d = 0 / d < 1) with the
    # division INSIDE the zero branch classified safe.  Degenerate
    # forms now require the THEN branch to be a degenerate RESULT
    # (NULL or a bare literal).
    bad = "SELECT CASE WHEN d <= 0 THEN s / d ELSE 0 END AS r FROM t"
    assert audit_sql("q", bad)[0].verdict == "UNGUARDED"
    bad_eq = "SELECT CASE WHEN d = 0 THEN s / d ELSE NULL END AS r FROM t"
    assert audit_sql("q", bad_eq)[0].verdict == "UNGUARDED"
    # the genuine guard shapes still classify safe
    for good in (
        "SELECT CASE WHEN d = 0 THEN NULL ELSE s / d END AS r FROM t",
        "SELECT CASE WHEN d = 0 THEN 0 ELSE s / d END AS r FROM t",
        "SELECT CASE WHEN d = 0 OR n = 0 THEN NULL ELSE s / d END FROM t",
        "SELECT CASE WHEN d <> 0 THEN s / d END AS r FROM t",
        "SELECT s / d AS r FROM t WHERE d > 0",
    ):
        sites = audit_sql("q", good)
        assert all(s.verdict != "UNGUARDED" for s in sites), good


def test_then_degenerate_is_anchored_to_the_matched_branch():
    # ADVICE r14: a LATER branch's THEN NULL must not vouch for a
    # comparison whose OWN branch contains the division
    bad = (
        "SELECT CASE WHEN d = 0 THEN s / d "
        "WHEN e = 0 THEN NULL ELSE 0 END AS r FROM t"
    )
    assert audit_sql("q", bad)[0].verdict == "UNGUARDED"
    # an AND'd condition after the comparison conservatively fails
    # (d = 0 alone no longer implies the degenerate branch)
    bad_and = (
        "SELECT CASE WHEN d = 0 AND n > 5 THEN NULL "
        "ELSE s / d END AS r FROM t"
    )
    assert audit_sql("q", bad_and)[0].verdict == "UNGUARDED"
    # ...while arbitrarily LONG OR chains stay recognised (the fixed
    # 80/100-char windows truncated these — the r15 TOST guard shape)
    long_or = (
        "SELECT CASE WHEN d = 0 "
        "OR (CAST(n_a AS DOUBLE) * ss_a = CAST(s_a AS DOUBLE) * s_a "
        "AND CAST(n_b AS DOUBLE) * ss_b = CAST(s_b AS DOUBLE) * s_b "
        "AND CAST(n_c AS DOUBLE) * ss_c = CAST(s_c AS DOUBLE) * s_c) "
        "THEN NULL ELSE s / d END AS r FROM t"
    )
    assert audit_sql("q", long_or)[0].verdict != "UNGUARDED"
    # AND inside an OR'd PARENTHESIZED sibling is sound (OR binds
    # looser): d = 0 still implies the branch
    or_and = (
        "SELECT CASE WHEN d = 0 OR (x = 1 AND y = 2) THEN NULL "
        "ELSE s / d END AS r FROM t"
    )
    assert audit_sql("q", or_and)[0].verdict != "UNGUARDED"


def test_site_evidence_is_anchored_to_the_denominator():
    # ADVICE r14: an unrelated comparison elsewhere in the callable
    # must not vouch for a removed guard on THIS denominator
    from tools.divide_guard_audit import _nospace, _site_evidenced

    src_guarded = _nospace(
        'df.select(F.expr("CASE WHEN n_a <= 1 THEN NULL '
        'ELSE s / (n_a - 1) END"))'
    )
    assert _site_evidenced(src_guarded, "(n_a-1)")
    # n_a appears, but the only guard fragment sits on an unrelated
    # column far away -> anchored scan refuses the generic fallback
    src_drifted = _nospace(
        'df.where(F.col("other") > 0)'
        + ".x" * 40
        + '.select(F.expr("s / (n_a - 1)").alias("r"))'
    )
    assert not _site_evidenced(src_drifted, "(n_a-1)")
    # denominator identifiers absent entirely (Spark side renamed the
    # column): the anywhere-in-source fallback still applies
    src_renamed = _nospace('df.where(F.col("den") != 0).select("r")')
    assert _site_evidenced(src_renamed, "(n_a-1)")
    # no-space keyword fusion must not hide the guard occurrence
    src_fused = _nospace(
        'F.expr("casewhenn0=txorn0=tythennullelsec/sqrt((n0-tx)*(n0-ty))end")'
    )
    assert _site_evidenced(src_fused, "sqrt((n0-tx)*(n0-ty))")


def test_spark_side_carries_every_oracle_guard():
    # VERDICT r13 #7: the oracle audit proves one engine handles its
    # zero denominators; this is the other half — every query whose
    # oracle carries an author-written guard must show the matching
    # guard construct in its Spark callable's source (one level of
    # same-module helpers included), or carry a reviewed
    # SPARK_GUARD_ADJUDICATED entry.  Stale adjudications fail too.
    from tools.divide_guard_audit import spark_guard_parity

    guarded, misses, stale = spark_guard_parity()
    assert guarded, "scan found no guarded oracles — scan broken?"
    assert not misses, (
        "oracle-guarded queries whose Spark source shows no guard "
        f"construct (one-sided guard = error-vs-NULL red row): {misses}"
    )
    assert not stale, f"stale SPARK_GUARD_ADJUDICATED entries: {stale}"
