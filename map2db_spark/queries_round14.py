"""Round-14 query registrations — eight operators, throttled per the
rotation plan (VERDICT r13 #2/#3: ≤8 new so ~40 window slots keep
draining the r4-vintage stale greens):

- smoothing: GOOD-TURING frequency re-estimation (the LM-smoothing
  family next to t_kneser_ney_bigram) — frequency-of-frequencies and
  the (r+1)·N_{r+1}/N_r adjusted counts;
- monitoring: PAGE-HINKLEY sequential change detection (the batch
  twin of s_stream_drift_monitor; w_cusum_changepoint is the
  retrospective single-change estimator, this is the sequential
  alarm with a burn-in baseline) — integer-exact via multiply-through;
- A/B: TOST EQUIVALENCE (two one-sided Welch tests — "is the
  difference provably within ±Δ", the complement of x_welch_ttest's
  difference test);
- A/B: O'BRIEN-FLEMING group-sequential boundaries (interim looks
  with a spending-shaped z boundary c·sqrt(K/k) — completes the
  sequential-testing family next to SPRT);
- graph: min-LABEL PROPAGATION over the part co-purchase graph
  (k unrolled rounds, the push-style connected-components /
  community seeding primitive);
- sketch: HYPERLOGLOG++ SPARSE MODE (exact (idx,rho) pair list at
  p'=18 with the lossless downgrade to x_hll_manual's dense p=9
  registers — the representation switch that makes HLL++ cheap at
  low cardinalities);
- text: TEXTRANK keywords (integer-scaled PageRank over the word
  adjacency graph — the graph-ranking complement of t_rake_keywords'
  degree/frequency scoring);
- sketch: T-DIGEST quantiles (rank-clustered centroids under a
  rational scale function, mergeable distributed-quantile state).

No counterpart in the reference (map2db.py decodes map tiles); these
are the training-data-pipeline extension surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from map2db_spark.registry import query
from map2db_spark.tables import Tables

_TOKS_SQL = r"regexp_split_to_array(trim(text), '\s+')"


def _hex_bigint(expr: str, tag: str, nhex: int = 8) -> str:
    """DuckDB md5-derived pseudo-random BIGINT (the registry idiom)."""
    return (
        f"CAST(concat('0x', substr(md5('{tag}' || CAST({expr} AS VARCHAR)),"
        f" 1, {nhex})) AS BIGINT)"
    )


def _hexcol(col: str, tag: str, nhex: int = 8):
    """Spark twin of :func:`_hex_bigint`."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(tag), F.col(col).cast("string"))), 1, nhex
        ),
        16,
        10,
    ).cast("long")


# ---------------------------------------------------------------------------
# Good-Turing smoothing (frequency-of-frequencies re-estimation)
# ---------------------------------------------------------------------------

# shared verbatim by the DuckDB oracle and the Spark F.expr — one guard
# edit fixes both engines atomically (the _WELCH_T convention).  n_r is
# a GROUP BY count (>= 1); n_r_next can be 0 (no species seen r+1
# times: the Turing estimate is undefined there, both engines emit
# NULL); n_tokens = 0 cannot co-occur with an emitted row but the guard
# keeps the expression total.
_GT_RSTAR = """
    CASE WHEN n_r_next = 0 OR n_tokens = 0 THEN NULL
    ELSE CAST(round(1000000 * (r + 1) * CAST(n_r_next AS DOUBLE) / n_r)
         AS BIGINT) END"""
_GT_PSTAR = """
    CASE WHEN n_r_next = 0 OR n_tokens = 0 THEN NULL
    ELSE CAST(round(1000000000000 * (r + 1) * CAST(n_r_next AS DOUBLE)
              / n_r / n_tokens) AS BIGINT) END"""


@query(
    "t_good_turing",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOKS_SQL}) AS t FROM documents
    ),
    freq AS (
      SELECT t, CAST(count(*) AS BIGINT) AS r FROM tok GROUP BY t
    ),
    fof AS (
      SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM freq GROUP BY r
    ),
    tot AS (
      SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tokens,
             CAST(sum(n_r) AS BIGINT) AS vocab
      FROM fof
    ),
    j AS (
      SELECT f.r, f.n_r,
             CAST(coalesce(f2.n_r, 0) AS BIGINT) AS n_r_next,
             t.n_tokens, t.vocab
      FROM fof f
      LEFT JOIN fof f2 ON f2.r = f.r + 1
      CROSS JOIN tot t
    )
    SELECT r, n_r, n_r_next, n_tokens, vocab,
           {_GT_RSTAR} AS r_star_micro,
           {_GT_PSTAR} AS p_star_e12
    FROM j ORDER BY r
    """,
    tags=("text", "language-model", "statistics", "pipeline"),
)
def t_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOOD-TURING smoothing (Good 1953; Gale & Sampson 1995 simple
    form): re-estimate how much probability mass each observed
    frequency r deserves from the frequency-of-frequencies table
    N_r = |{species seen exactly r times}| — the adjusted count is
    r* = (r+1)*N_{r+1}/N_r and the smoothed probability
    p* = r*/N.  N_1/N (the r=1 row's mass) is the canonical estimate
    of UNSEEN-species probability — for a training corpus, the
    "how much vocabulary have we not crawled yet" number, and the
    count-mass donor t_kneser_ney_bigram's absolute discounting
    approximates.  Where N_{r+1} = 0 the Turing estimate is
    undefined and both engines emit NULL (the Gale-Sampson smoothed
    fit needs log regression; this is the exact unsmoothed table).

    Cross-engine exactness: r, N_r, N are integers; r*/p* are released
    micro/e12-scaled from ONE shared IEEE expression (two divisions).

    Scale shape: token explode -> (token) count -> (r) count is two
    map-side-combinable aggregates with geometrically shrinking
    output (corpus -> vocabulary -> distinct frequencies); the
    frequency-of-frequencies table is ~hundreds of rows at ANY corpus
    size, so the self-join and totals are driver-trivial.  At 100 TB
    the first aggregate is the only real shuffle.
    """
    docs = Tables(spark, sf_dir).documents
    par = spark.sparkContext.defaultParallelism
    freq = (
        docs.repartition(par)
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("r"))
    )
    # the frequency-of-frequencies table is ~hundreds of rows and
    # feeds three branches (totals, shifted join, output): materialize
    # it ONCE so the corpus aggregate never re-runs (isotonic
    # convention)
    fof = (
        freq.groupBy("r")
        .agg(F.count(F.lit(1)).cast("long").alias("n_r"))
        .localCheckpoint()
    )
    tot = fof.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n_tokens"),
        F.sum("n_r").cast("long").alias("vocab"),
    )
    nxt = fof.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next")
    )
    j = (
        fof.join(F.broadcast(nxt), "r", "left")
        .withColumn("n_r_next", F.coalesce("n_r_next", F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(tot))
    )
    return j.select(
        "r", "n_r", "n_r_next", "n_tokens", "vocab",
        F.expr(_GT_RSTAR).alias("r_star_micro"),
        F.expr(_GT_PSTAR).alias("p_star_e12"),
    ).orderBy("r")


# ---------------------------------------------------------------------------
# Page-Hinkley sequential change detection (integer-exact)
# ---------------------------------------------------------------------------

_PH_BURN = 50  # baseline window (rows) per series
_PH_DELTA_CENTS = 5  # drift allowance delta
_PH_LAMBDA_CENTS = 3000  # alarm threshold lambda


@query(
    "x_page_hinkley",
    oracle=f"""
    WITH s AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(row_number() OVER (
               PARTITION BY event_type ORDER BY ts, event_id
             ) AS BIGINT) AS rnk
      FROM events
    ),
    g AS (
      -- ONE conditional aggregate yields every per-series scalar:
      -- total n plus the burn-in (n0, s0)
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN rnk <= {_PH_BURN} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n0,
             CAST(sum(CASE WHEN rnk <= {_PH_BURN} THEN cents ELSE 0 END)
                  AS BIGINT) AS s0
      FROM s GROUP BY event_type
    ),
    mon AS (
      -- multiply the PH statistic through by n0 so every term is an
      -- exact BIGINT: term = n0*x - s0 - n0*delta  (x - mu0 - delta
      -- scaled by n0, mu0 = s0/n0 the burn-in mean)
      SELECT s.event_type, s.rnk,
             sum(b.n0 * s.cents - b.s0 - b.n0 * {_PH_DELTA_CENTS})
               OVER (PARTITION BY s.event_type ORDER BY s.rnk
                     ROWS UNBOUNDED PRECEDING) AS m_t,
             b.n0
      FROM s JOIN g b USING (event_type)
      WHERE s.rnk > {_PH_BURN}
    ),
    ph AS (
      SELECT event_type, rnk, n0,
             m_t - min(m_t) OVER (PARTITION BY event_type ORDER BY rnk
                                  ROWS UNBOUNDED PRECEDING) AS ph_t
      FROM mon
    ),
    roll AS (
      SELECT event_type,
             CAST(max(ph_t) AS BIGINT) AS ph_max_scaled,
             CAST(min(CASE WHEN ph_t > n0 * {_PH_LAMBDA_CENTS}
                           THEN rnk END) AS BIGINT) AS alarm_rnk
      FROM ph GROUP BY event_type
    )
    SELECT g.event_type, g.n, g.n0, r.ph_max_scaled, r.alarm_rnk,
           CAST(CASE WHEN r.alarm_rnk IS NULL THEN 0 ELSE 1 END AS BIGINT)
             AS alarmed
    FROM g
    LEFT JOIN roll r USING (event_type)
    ORDER BY g.event_type
    """,
    tags=("analytics", "streaming", "change-detection", "statistics"),
)
def x_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE-HINKLEY sequential change detection (Page 1954; Hinkley
    1971), per event-type series: after a {_PH_BURN}-row burn-in that
    fixes the baseline mean mu0, the monitored statistic is
    PH_t = m_t - min_(s<=t) m_s with m_t = sum_(s<=t)(x_s - mu0 - delta),
    alarming when PH_t exceeds lambda — the sequential alarm that
    complements w_cusum_changepoint (retrospective argmax of a single
    change) and s_stream_drift_monitor (windowed distribution drift).
    Everything is multiplied through by n0 (the burn-in count) so m_t
    is an exact BIGINT running sum — no float accumulation, so the
    engines agree although DuckDB evaluates window sums with a
    segment tree (different addition order; exact for integers,
    divergent for doubles).

    Scale shape: one partitioned window per series (ORDER BY within
    PARTITION BY event_type — never a global window); ONE conditional
    aggregate yields every per-series scalar (total n plus the
    burn-in n0/s0) and is broadcast back, so events is scanned
    exactly twice (scalars pass + monitoring pass); output is one row
    per series.  At 100 TB with many series this is the standard
    sessionized-scan shape: a single Exchange on the series key.
    """
    ev = Tables(spark, sf_dir).events
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.row_number().over(w).cast("long").alias("rnk"),
    )
    g = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("rnk") <= _PH_BURN, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("rnk") <= _PH_BURN, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s0"),
    )
    # series-count-sized scalar table, referenced by the monitoring
    # join AND the final rollup join: materialize once so events is
    # scanned exactly twice
    g = g.localCheckpoint()
    term = (
        F.col("n0") * F.col("cents")
        - F.col("s0")
        - F.col("n0") * F.lit(_PH_DELTA_CENTS)
    )
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mon = (
        s.where(F.col("rnk") > _PH_BURN)
        .join(F.broadcast(g.select("event_type", "n0", "s0")), "event_type")
        .select(
            "event_type", "rnk", "n0", F.sum(term).over(wrun).alias("m_t")
        )
    )
    ph = mon.select(
        "event_type", "rnk", "n0",
        (F.col("m_t") - F.min("m_t").over(wrun)).alias("ph_t"),
    )
    roll = ph.groupBy("event_type").agg(
        F.max("ph_t").cast("long").alias("ph_max_scaled"),
        F.min(
            F.when(
                F.col("ph_t") > F.col("n0") * F.lit(_PH_LAMBDA_CENTS),
                F.col("rnk"),
            )
        )
        .cast("long")
        .alias("alarm_rnk"),
    )
    return (
        g.join(F.broadcast(roll), "event_type", "left")
        .select(
            "event_type", "n", "n0", "ph_max_scaled", "alarm_rnk",
            F.when(F.col("alarm_rnk").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("alarmed"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# TOST equivalence testing (two one-sided Welch tests)
# ---------------------------------------------------------------------------

_TOST_MARGIN_CENTS = 2000  # equivalence margin: +-20.00 in value units
_TOST_ZCRIT = 1.644853627  # one-sided 5% normal critical value

# shared verbatim by oracle and Spark F.expr (the _WELCH_T convention).
# Guards: a singleton/empty arm zeroes the (n-1) denominators; both
# arms constant makes se2 = 0, stated in DOUBLES as n*ss = s*s (the
# shared _SPEARMAN_RHO convention) — each emits NULL instead of a
# Spark ANSI raise.  ADVICE r14: the earlier integer form ss*n = s*s
# built BIGINT products that grow ~n^2 with per-segment rows and
# overflow ~two orders of magnitude beyond sf0.1; both engines round
# BIGINT->DOUBLE to nearest, so equal exact products stay equal and
# the comparison is parity-safe at any n.
_TOST_SE2 = f"""
    CASE WHEN n_a <= 1 OR n_b <= 1
           OR (CAST(n_a AS DOUBLE) * ss_a = CAST(s_a AS DOUBLE) * s_a
               AND CAST(n_b AS DOUBLE) * ss_b = CAST(s_b AS DOUBLE) * s_b)
    THEN NULL
    ELSE (CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a)
           / (n_a - 1) / n_a
       + (CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * s_b / n_b)
           / (n_b - 1) / n_b END"""
_TOST_DIFF = "(CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)"
_TOST_TLOWER = f"""
    CASE WHEN se2 IS NULL OR se2 = 0 THEN NULL
    ELSE CAST(round(1000000 * (diff + {_TOST_MARGIN_CENTS}) / sqrt(se2))
         AS BIGINT) END"""
_TOST_TUPPER = f"""
    CASE WHEN se2 IS NULL OR se2 = 0 THEN NULL
    ELSE CAST(round(1000000 * ({_TOST_MARGIN_CENTS} - diff) / sqrt(se2))
         AS BIGINT) END"""
_TOST_VERDICT = f"""
    CASE WHEN t_lower_micro IS NULL OR t_upper_micro IS NULL THEN NULL
    WHEN t_lower_micro > {round(_TOST_ZCRIT * 1000000)}
     AND t_upper_micro > {round(_TOST_ZCRIT * 1000000)}
    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"""


@query(
    "x_tost_equivalence",
    oracle=f"""
    WITH p AS (
      SELECT event_type,
             CASE WHEN {_hex_bigint("user_id", "eq:", 6)} % 2 = 0
                  THEN 1 ELSE 0 END AS is_a,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    c AS (
      SELECT event_type,
             CAST(sum(is_a) AS BIGINT) AS n_a,
             CAST(sum(is_a * cents) AS BIGINT) AS s_a,
             CAST(sum(is_a * cents * cents) AS BIGINT) AS ss_a,
             CAST(sum(1 - is_a) AS BIGINT) AS n_b,
             CAST(sum((1 - is_a) * cents) AS BIGINT) AS s_b,
             CAST(sum((1 - is_a) * cents * cents) AS BIGINT) AS ss_b
      FROM p GROUP BY event_type
    ),
    d AS (
      SELECT event_type, n_a, n_b,
             CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                  ELSE {_TOST_DIFF} END AS diff,
             {_TOST_SE2} AS se2
      FROM c
    ),
    t AS (
      SELECT event_type, n_a, n_b,
             CAST(round(1000000 * diff) AS BIGINT) AS diff_micro,
             {_TOST_TLOWER} AS t_lower_micro,
             {_TOST_TUPPER} AS t_upper_micro
      FROM d
    )
    SELECT event_type, n_a, n_b, diff_micro, t_lower_micro, t_upper_micro,
           {_TOST_VERDICT} AS equivalent
    FROM t ORDER BY event_type
    """,
    tags=("analytics", "statistics", "ab-test"),
)
def x_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST EQUIVALENCE testing (Schuirmann 1987, two one-sided
    tests): where x_welch_ttest asks "is there a difference", TOST
    asks the release-gating question "is the difference provably
    within ±Δ" — both one-sided Welch statistics
    t_lower = (diff+Δ)/se and t_upper = (Δ-diff)/se must exceed the
    one-sided critical value; absence of evidence is NOT equivalence,
    so an underpowered arm yields 0, not 1.  Per event-type segment
    with md5-parity arms; the same six integer sufficient statistics
    as Welch, released micro-scaled from shared IEEE expressions.

    Scale shape: one map-side-combinable aggregate per segment — six
    integers per (segment, arm) cross the network regardless of event
    volume; every downstream expression is row-local on the
    segment-count-sized frame.
    """
    ev = Tables(spark, sf_dir).events
    is_a = (_hexcol("user_id", "eq:", 6) % 2 == 0).cast("int")
    p = ev.select(
        "event_type",
        is_a.alias("is_a"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    c = p.groupBy("event_type").agg(
        F.sum("is_a").cast("long").alias("n_a"),
        F.sum(F.col("is_a") * F.col("cents")).cast("long").alias("s_a"),
        F.sum(F.col("is_a") * F.col("cents") * F.col("cents"))
        .cast("long")
        .alias("ss_a"),
        F.sum(1 - F.col("is_a")).cast("long").alias("n_b"),
        F.sum((1 - F.col("is_a")) * F.col("cents")).cast("long").alias("s_b"),
        F.sum((1 - F.col("is_a")) * F.col("cents") * F.col("cents"))
        .cast("long")
        .alias("ss_b"),
    )
    d = c.select(
        "event_type", "n_a", "n_b",
        F.when(
            (F.col("n_a") == 0) | (F.col("n_b") == 0), F.lit(None)
        )
        .otherwise(F.expr(_TOST_DIFF))
        .alias("diff"),
        F.expr(_TOST_SE2).alias("se2"),
    )
    t = d.select(
        "event_type", "n_a", "n_b",
        F.round(F.col("diff") * 1000000).cast("long").alias("diff_micro"),
        F.expr(_TOST_TLOWER).alias("t_lower_micro"),
        F.expr(_TOST_TUPPER).alias("t_upper_micro"),
    )
    return t.select(
        "event_type", "n_a", "n_b", "diff_micro",
        "t_lower_micro", "t_upper_micro",
        F.expr(_TOST_VERDICT).alias("equivalent"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Min-label propagation over the part co-purchase graph
# ---------------------------------------------------------------------------

_LP_ROUNDS = 6
_LP_TOPK = 20


def _label_prop_oracle() -> str:
    lines = ["""
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey < 3000
    ),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
    ),
    edges AS (
      -- bidirectional, PLUS a self-loop per node: min over
      -- neighbours-including-self needs each round's labels only ONCE
      SELECT u AS src, v AS dst FROM pairs
      UNION ALL
      SELECT v AS src, u AS dst FROM pairs
      UNION ALL
      SELECT DISTINCT u AS src, u AS dst FROM pairs
      UNION ALL
      SELECT DISTINCT v AS src, v AS dst FROM pairs
    ),
    r0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)"""]
    prev = "r0"
    for i in range(1, _LP_ROUNDS + 1):
        lines.append(f""",
    r{i} AS (
      SELECT e.src AS node, min(n.label) AS label
      FROM edges e
      JOIN {prev} n ON n.node = e.dst
      GROUP BY e.src
    )""")
        prev = f"r{i}"
    lines.append(f"""
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node
    FROM {prev}
    GROUP BY label ORDER BY n_nodes DESC, label LIMIT {_LP_TOPK}""")
    return "".join(lines)


@query(
    "g_label_propagation",
    oracle=_label_prop_oracle(),
    tags=("graph", "iterative", "clustering"),
)
def g_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-LABEL PROPAGATION (6 synchronous rounds) over
    the part co-purchase graph (parts sharing an order, orderkeys
    < 3000): every node starts labelled with its own id and each
    round adopts the minimum label among itself and its neighbours —
    the push-style primitive under connected components (operators/
    components.py runs the hash-to-min variant to convergence; this
    is the FIXED-ROUND form whose intermediate state is the
    deterministic, oracle-checkable object) and the seeding step of
    community detection.  Integer labels, min/least only — both
    engines agree exactly, converged or not.

    Scale shape: the classic join-agg iteration — per round one
    shuffle of (edge src)-keyed labels and one node-keyed min
    aggregation, O(E) each; edges are computed once and
    localCheckpoint-ed (g_pagerank convention) so lineage stays flat
    across rounds.  Top-20 labels by component size.
    """
    li = (
        Tables(spark, sf_dir)
        .lineitem.where(F.col("l_orderkey") < 3000)
        .select("l_orderkey", "l_partkey")
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(
            pairs.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
        # a self-loop per node: each round's min over
        # neighbours-including-self then references the label frame
        # exactly ONCE, keeping lineage linear in round count
        .unionByName(
            pairs.select(F.col("u").alias("src"), F.col("u").alias("dst")).distinct()
        )
        .unionByName(
            pairs.select(F.col("v").alias("src"), F.col("v").alias("dst")).distinct()
        )
        .localCheckpoint()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LP_ROUNDS):
        labels = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .select(F.col("src").alias("node"), "label")
        )
    return (
        labels.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").cast("long").alias("min_node"),
            F.max("node").cast("long").alias("max_node"),
        )
        .select(F.col("label").cast("long").alias("label"), "n_nodes", "min_node", "max_node")
        .orderBy(F.desc("n_nodes"), "label")
        .limit(_LP_TOPK)
    )


# ---------------------------------------------------------------------------
# O'Brien-Fleming group-sequential boundaries
# ---------------------------------------------------------------------------

_OBF_C = 2.04  # boundary constant (~overall two-sided alpha 0.05, K=5)

# z from cumulative sufficient statistics — same guard discipline as
# _TOST_SE2 (the shared-expression convention): degenerate looks emit
# NULL on both engines instead of a Spark ANSI raise
_OBF_Z = """
    CASE WHEN se2 IS NULL OR se2 = 0 THEN NULL
    ELSE CAST(round(1000000 * diff / sqrt(se2)) AS BIGINT) END"""
_OBF_BOUND = f"""
    CAST(round(1000000 * {_OBF_C}
               * sqrt(CAST(kmax AS DOUBLE) / greatest(look, 1)))
         AS BIGINT)"""
_OBF_CROSSED = """
    CASE WHEN z_micro IS NULL THEN NULL
    WHEN abs(z_micro) > bound_micro THEN CAST(1 AS BIGINT)
    ELSE CAST(0 AS BIGINT) END"""


@query(
    "x_obrien_fleming",
    oracle=f"""
    WITH p AS (
      SELECT CAST(1 + (date_part('day', ts) - 1) // 7 AS BIGINT) AS look,
             CASE WHEN {_hex_bigint("user_id", "gs:", 6)} % 2 = 0
                  THEN 1 ELSE 0 END AS is_a,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    lk AS (
      SELECT look,
             CAST(sum(is_a) AS BIGINT) AS ln_a,
             CAST(sum(is_a * cents) AS BIGINT) AS ls_a,
             CAST(sum(is_a * cents * cents) AS BIGINT) AS lss_a,
             CAST(sum(1 - is_a) AS BIGINT) AS ln_b,
             CAST(sum((1 - is_a) * cents) AS BIGINT) AS ls_b,
             CAST(sum((1 - is_a) * cents * cents) AS BIGINT) AS lss_b
      FROM p GROUP BY look
    ),
    km AS (SELECT CAST(max(look) AS BIGINT) AS kmax FROM lk),
    cum AS (
      SELECT look,
             CAST(sum(ln_a) OVER w AS BIGINT) AS n_a,
             CAST(sum(ls_a) OVER w AS BIGINT) AS s_a,
             CAST(sum(lss_a) OVER w AS BIGINT) AS ss_a,
             CAST(sum(ln_b) OVER w AS BIGINT) AS n_b,
             CAST(sum(ls_b) OVER w AS BIGINT) AS s_b,
             CAST(sum(lss_b) OVER w AS BIGINT) AS ss_b
      FROM lk
      WINDOW w AS (ORDER BY look ROWS UNBOUNDED PRECEDING)
    ),
    d AS (
      SELECT look, n_a, n_b, kmax,
             CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                  ELSE {_TOST_DIFF} END AS diff,
             {_TOST_SE2} AS se2
      FROM cum CROSS JOIN km
    ),
    z AS (
      SELECT look, n_a, n_b,
             {_OBF_Z} AS z_micro,
             {_OBF_BOUND} AS bound_micro
      FROM d
    )
    SELECT look, n_a, n_b, z_micro, bound_micro,
           {_OBF_CROSSED} AS crossed
    FROM z ORDER BY look
    """,
    tags=("analytics", "statistics", "ab-test", "sequential"),
)
def x_obrien_fleming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O'BRIEN-FLEMING group-sequential boundaries (O'Brien & Fleming
    1979): the experiment is examined at K interim looks (here weekly
    looks over the event month, K = max look) and the cumulative
    Welch z at look k is compared against the spending-shaped
    boundary c*sqrt(K/k) — very strict early (|z| > ~4.5 at the first
    of five looks), relaxing to ~c at the final look, which is what
    lets an A/B test PEEK without inflating its false-positive rate.
    Completes the sequential-testing family next to the SPRT-style
    monitors and x_welch_ttest's fixed-horizon test.

    Cross-engine exactness: per-look sufficient statistics are exact
    integers; the cumulative sums are integer window sums (DuckDB's
    segment-tree order is immaterial for integers); z and the
    boundary are released micro-scaled from shared IEEE expressions
    (division, sqrt — both correctly rounded).  Degenerate looks
    (an arm still empty, zero pooled variance) emit NULL via the
    shared guard.

    Scale shape: one map-side-combinable aggregate to look
    granularity (K rows), then all windows/exprs run on the K-row
    frame — the unpartitioned window is over K = 5 rows, not data.
    At 100 TB only the first aggregate touches the fact table.
    """
    ev = Tables(spark, sf_dir).events.where(F.col("event_type") == "purchase")
    look = (1 + F.expr("(day(ts) - 1) div 7")).cast("long")
    is_a = (_hexcol("user_id", "gs:", 6) % 2 == 0).cast("int")
    p = ev.select(
        look.alias("look"),
        is_a.alias("is_a"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    lk = p.groupBy("look").agg(
        F.sum("is_a").cast("long").alias("ln_a"),
        F.sum(F.col("is_a") * F.col("cents")).cast("long").alias("ls_a"),
        F.sum(F.col("is_a") * F.col("cents") * F.col("cents"))
        .cast("long")
        .alias("lss_a"),
        F.sum(1 - F.col("is_a")).cast("long").alias("ln_b"),
        F.sum((1 - F.col("is_a")) * F.col("cents")).cast("long").alias("ls_b"),
        F.sum((1 - F.col("is_a")) * F.col("cents") * F.col("cents"))
        .cast("long")
        .alias("lss_b"),
    )
    # K look-level rows feed both the kmax scalar and the cumulative
    # frame: materialize once so events is scanned exactly once
    lk = lk.localCheckpoint()
    km = lk.agg(F.max("look").cast("long").alias("kmax"))
    w = Window.orderBy("look").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = lk.select(
        "look",
        F.sum("ln_a").over(w).cast("long").alias("n_a"),
        F.sum("ls_a").over(w).cast("long").alias("s_a"),
        F.sum("lss_a").over(w).cast("long").alias("ss_a"),
        F.sum("ln_b").over(w).cast("long").alias("n_b"),
        F.sum("ls_b").over(w).cast("long").alias("s_b"),
        F.sum("lss_b").over(w).cast("long").alias("ss_b"),
    )
    d = cum.crossJoin(F.broadcast(km)).select(
        "look", "n_a", "n_b", "kmax",
        F.when((F.col("n_a") == 0) | (F.col("n_b") == 0), F.lit(None))
        .otherwise(F.expr(_TOST_DIFF))
        .alias("diff"),
        F.expr(_TOST_SE2).alias("se2"),
    )
    z = d.select(
        "look", "n_a", "n_b",
        F.expr(_OBF_Z).alias("z_micro"),
        F.expr(_OBF_BOUND).alias("bound_micro"),
    )
    return z.select(
        "look", "n_a", "n_b", "z_micro", "bound_micro",
        F.expr(_OBF_CROSSED).alias("crossed"),
    ).orderBy("look")


# ---------------------------------------------------------------------------
# HyperLogLog++ sparse mode (exact pair list + lossless dense downgrade)
# ---------------------------------------------------------------------------

_HLLS_PP = 18  # sparse precision p' (2^18 index space)
_HLLS_MP = 1 << _HLLS_PP
_HLLS_P = 9  # dense precision (x_hll_manual's register count)
_HLLS_M = 1 << _HLLS_P
# 15 hex chars = 60 hash bits; p' to the sparse index, the rest to rho
_HLLS_RHO_MAX = 60 - _HLLS_PP + 1  # 43: rho of an all-zero remainder
_HLLS_DENSE_RHO_MAX = 60 - _HLLS_P + 1  # 52
_HLLS_THRESHOLD = 512  # switch to dense beyond this many sparse pairs


@query(
    "x_hll_sparse",
    oracle=f"""
    WITH h AS (
      SELECT o_orderstatus, o_custkey,
             {_hex_bigint("o_custkey", "hs:", 15)} AS hv
      FROM orders
    ),
    sp AS (
      SELECT o_orderstatus, hv % {_HLLS_MP} AS idx, hv // {_HLLS_MP} AS w
      FROM h
    ),
    pr AS (
      SELECT o_orderstatus, idx,
             CAST(max(CASE WHEN w > 0
                           THEN {_HLLS_RHO_MAX} - length(bin(w))
                           ELSE {_HLLS_RHO_MAX} END) AS BIGINT) AS rho
      FROM sp GROUP BY o_orderstatus, idx
    ),
    agg AS (
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_sparse,
             md5(string_agg(idx || ':' || rho, ',' ORDER BY idx))
               AS sparse_fp
      FROM pr GROUP BY o_orderstatus
    ),
    dn AS (
      SELECT o_orderstatus, idx % {_HLLS_M} AS bucket,
             CASE WHEN rho < {_HLLS_RHO_MAX} THEN rho
                  WHEN idx // {_HLLS_M} > 0
                  THEN {_HLLS_DENSE_RHO_MAX} - length(bin(idx // {_HLLS_M}))
                  ELSE {_HLLS_DENSE_RHO_MAX} END AS rho_d
      FROM pr
    ),
    regs AS (
      SELECT o_orderstatus, bucket, CAST(max(rho_d) AS BIGINT) AS m
      FROM dn GROUP BY o_orderstatus, bucket
    ),
    dfp AS (
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_dense,
             md5(string_agg(bucket || ':' || m, ',' ORDER BY bucket))
               AS dense_fp
      FROM regs GROUP BY o_orderstatus
    ),
    ex AS (
      SELECT o_orderstatus,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
      FROM orders GROUP BY o_orderstatus
    )
    SELECT a.o_orderstatus,
           CASE WHEN a.n_sparse <= {_HLLS_THRESHOLD}
                THEN 'sparse' ELSE 'dense' END AS mode,
           a.n_sparse, a.sparse_fp, d.n_dense, d.dense_fp,
           ex.exact_distinct
    FROM agg a
    JOIN dfp d USING (o_orderstatus)
    JOIN ex USING (o_orderstatus)
    ORDER BY a.o_orderstatus
    """,
    tags=("sketch", "approx", "analytics"),
)
def x_hll_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYPERLOGLOG++ SPARSE MODE (Heule, Nunkesser & Hall 2013, the
    Google HLL++ paper's representation switch): at low cardinality
    the sketch stores the EXACT (index, rho) pair list at a much
    higher precision p' = 18 — near-exact counts where the dense
    estimator is noisiest — and switches to x_hll_manual's dense
    p = 9 registers only once the pair list outgrows them.  The
    downgrade is LOSSLESS and verified here: the dense register for a
    sparse pair is rho itself when rho < 43 (remainder bits above p'
    were non-zero) and is recomputed from the index's upper p'-p bits
    when the remainder was all-zero — so a sketch can run sparse on
    every shard and still merge into dense registers bit-for-bit.
    Both representations ship as md5 fingerprints over the ordered
    pair/register lists (the x_hll_manual convention: the STATE is
    hash-checked, not just an estimate).

    Scale shape: per-(group, idx) max is map-side-combinable; sparse
    state is O(distinct) only while distinct <= threshold, dense
    state is 512 registers per group forever — the exact reason HLL++
    runs sparse first at 100 TB group-explosion cardinalities.
    """
    orders = Tables(spark, sf_dir).orders
    hv = _hexcol("o_custkey", "hs:", 15)
    sp = orders.select(
        "o_orderstatus", "o_custkey", hv.alias("hv")
    ).select(
        "o_orderstatus",
        (F.col("hv") % _HLLS_MP).alias("idx"),
        F.expr(f"hv div {_HLLS_MP}").alias("w"),
    )
    rho = F.when(
        F.col("w") > 0, F.lit(_HLLS_RHO_MAX) - F.length(F.bin(F.col("w")))
    ).otherwise(F.lit(_HLLS_RHO_MAX))
    # the sparse pair table feeds both the fingerprint rollup and
    # the dense downgrade: materialize once (O(distinct) rows)
    pr = (
        sp.groupBy("o_orderstatus", "idx")
        .agg(F.max(rho).cast("long").alias("rho"))
        .localCheckpoint()
    )

    def _fp(key: str, val: str):
        return F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(key, val))),
                    lambda s: F.concat(
                        s[key].cast("string"), F.lit(":"), s[val].cast("string")
                    ),
                ),
                ",",
            )
        )
    agg = pr.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_sparse"),
        _fp("idx", "rho").alias("sparse_fp"),
    )
    dn = pr.select(
        "o_orderstatus",
        (F.col("idx") % _HLLS_M).alias("bucket"),
        F.when(F.col("rho") < _HLLS_RHO_MAX, F.col("rho"))
        .when(
            F.expr(f"idx div {_HLLS_M}") > 0,
            F.lit(_HLLS_DENSE_RHO_MAX)
            - F.length(F.bin(F.expr(f"idx div {_HLLS_M}"))),
        )
        .otherwise(F.lit(_HLLS_DENSE_RHO_MAX))
        .alias("rho_d"),
    )
    regs = dn.groupBy("o_orderstatus", "bucket").agg(
        F.max("rho_d").cast("long").alias("m")
    )
    dfp = regs.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_dense"),
        _fp("bucket", "m").alias("dense_fp"),
    )
    ex = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_distinct")
    )
    return (
        agg.withColumn(
            "mode",
            F.when(F.col("n_sparse") <= _HLLS_THRESHOLD, F.lit("sparse"))
            .otherwise(F.lit("dense")),
        )
        .join(dfp, "o_orderstatus")
        .join(ex, "o_orderstatus")
        .select(
            "o_orderstatus", "mode", "n_sparse", "sparse_fp",
            "n_dense", "dense_fp", "exact_distinct",
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# TextRank keywords (integer-scaled PageRank over the word adjacency graph)
# ---------------------------------------------------------------------------

_TR_SCALE = 1_000_000_000_000  # 1e12 integer ranks (g_pagerank idiom)
_TR_ITERS = 3
_TR_TOPK = 15


def _textrank_oracle() -> str:
    from map2db_spark.queries_round3 import _RAKE_STOP_SQL

    lines = [f"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS arr
      FROM documents
    ),
    toks AS (
      SELECT doc_id, p, arr[CAST(p AS INT)] AS word
      FROM d, UNNEST(generate_series(1, len(arr))) AS u(p)
    ),
    kept AS (
      SELECT doc_id, p, word FROM toks
      WHERE word <> '' AND word NOT IN ({_RAKE_STOP_SQL})
    ),
    adj AS (
      SELECT a.word AS w1, b.word AS w2
      FROM kept a
      JOIN kept b ON a.doc_id = b.doc_id AND b.p = a.p + 1
      WHERE a.word <> b.word
    ),
    edges AS (
      SELECT w1 AS src, w2 AS dst FROM adj
      UNION ALL
      SELECT w2 AS src, w1 AS dst FROM adj
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY src),
    nn AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS n FROM edges),
    r0 AS (SELECT src AS node, CAST({_TR_SCALE} // n AS BIGINT) AS rank
           FROM deg, nn)"""]
    prev = "r0"
    for i in range(1, _TR_ITERS + 1):
        lines.append(f""",
    in{i} AS (
      SELECT e.dst AS node, CAST(sum(r.rank // d.outdeg) AS BIGINT) AS inflow
      FROM edges e
      JOIN {prev} r ON e.src = r.node
      JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT node,
             CAST((({_TR_SCALE} // n) * 15) // 100 + (85 * inflow) // 100
                  AS BIGINT) AS rank
      FROM in{i}, nn
    )""")
        prev = f"r{i}"
    lines.append(f"""
    SELECT word, rank_e12, rnk FROM (
      SELECT node AS word, rank AS rank_e12,
             CAST(row_number() OVER (ORDER BY rank DESC, node) AS INT) AS rnk
      FROM {prev}
    ) WHERE rnk <= {_TR_TOPK}""")
    return "".join(lines)


@query(
    "t_textrank_keywords",
    oracle=_textrank_oracle(),
    tags=("text", "keywords", "graph", "iterative"),
)
def t_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEXTRANK keyword extraction (Mihalcea & Tarau 2004): rank words
    by PageRank over the corpus word-adjacency graph — an edge per
    ordered pair of adjacent non-stopword tokens, symmetrized — and
    keep the top 15.  The graph-centrality complement of
    t_rake_keywords (which scores degree/frequency): RAKE rewards
    words that live in long phrases, TextRank rewards words that
    BRIDGE many contexts.  Shares RAKE's tokenizer ([^a-z]+ split)
    and stopword list so the two keyword sets are comparable.

    Cross-engine exactness is the g_pagerank idiom: 1e12-scaled
    BIGINT ranks, per-edge contribution rank div outdeg, damping
    (85*x) div 100 — bit-identical integers on both engines, 3 fixed
    iterations unrolled as oracle CTEs.

    Scale shape: adjacency is a doc-local self-join on consecutive
    positions (one Exchange on doc_id); the iteration is the classic
    join-agg loop over localCheckpoint-ed edges, O(E) per round with
    vocabulary-sized rank state; top-k is TakeOrdered, never a full
    sort.
    """
    from map2db_spark.queries_round3 import _RAKE_STOP

    docs = Tables(spark, sf_dir).documents
    par = spark.sparkContext.defaultParallelism
    d = docs.select(
        "doc_id", F.split(F.lower("text"), "[^a-z]+").alias("arr")
    ).repartition(par, "doc_id")
    toks = d.select("doc_id", F.posexplode("arr").alias("p", "word"))
    kept = toks.where(
        (F.col("word") != "") & ~F.col("word").isin(*_RAKE_STOP)
    )
    a = kept.alias("a")
    b = kept.alias("b")
    adj = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.p") == F.col("a.p") + 1),
        )
        .where(F.col("a.word") != F.col("b.word"))
        .select(F.col("a.word").alias("w1"), F.col("b.word").alias("w2"))
    )
    edges = (
        adj.select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
        .unionByName(adj.select(F.col("w2").alias("src"), F.col("w1").alias("dst")))
        .localCheckpoint()
    )
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
        .localCheckpoint()
    )
    n = deg.count()  # vocabulary size: O(1) driver-side scalar
    if n == 0:
        # an all-stopword / single-token corpus has no adjacency
        # graph: the oracle's CTE chain yields ZERO rows there, so the
        # Spark side must return the same empty shape instead of
        # letting the driver-side _TR_SCALE // n raise (the
        # error-vs-empty divergence class the divide gates hunt —
        # this division is Python, invisible to both)
        from pyspark.sql.types import (
            IntegerType, LongType, StringType, StructField, StructType,
        )

        return spark.createDataFrame(
            [],
            StructType([
                StructField("word", StringType()),
                StructField("rank_e12", LongType()),
                StructField("rnk", IntegerType()),
            ]),
        )
    base = F.lit(_TR_SCALE // n).cast("long")
    teleport = F.lit(((_TR_SCALE // n) * 15) // 100).cast("long")
    ranks = deg.select(F.col("src").alias("node"), base.alias("rank"))
    for _ in range(_TR_ITERS):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").cast("long").alias("contrib"),
            )
        )
        ranks = (
            contrib.groupBy("node")
            .agg(F.sum("contrib").cast("long").alias("inflow"))
            .select(
                "node",
                (teleport + F.expr("(85 * inflow) div 100").cast("long")).alias(
                    "rank"
                ),
            )
        )
    top = ranks.orderBy(F.desc("rank"), F.asc("node")).limit(_TR_TOPK)
    return top.select(
        F.col("node").alias("word"),
        F.col("rank").alias("rank_e12"),
        F.row_number()
        .over(Window.orderBy(F.desc(F.col("rank")), F.asc(F.col("node"))))
        .cast("int")
        .alias("rnk"),
    )


# ---------------------------------------------------------------------------
# t-digest quantiles (rank-clustered centroids, rational scale function)
# ---------------------------------------------------------------------------

_TD_DELTA = 32  # digest compression (max centroid count)
_TD_B = 1 << 17  # rank-grid resolution: q quantized to r/B
_TD_2B2 = 2 * _TD_B * _TD_B
_TD_B3 = _TD_B ** 3


@query(
    "x_tdigest_quantiles",
    oracle=f"""
    WITH base AS (
      SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
    rk AS (
      SELECT cents,
             CAST(row_number() OVER (ORDER BY cents, event_id) AS BIGINT)
               AS i
      FROM base
    ),
    sc AS (
      SELECT cents, ((2 * i - 1) * {_TD_B // 2}) // n AS r
      FROM rk CROSS JOIN nn
    ),
    bk AS (
      SELECT cents,
             ({_TD_DELTA} * (r * (2 * r * r - 3 * r * {_TD_B} + {_TD_2B2})))
               // {_TD_B3} AS bucket
      FROM sc
    ),
    cent AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS n_k,
             CAST(min(cents) AS BIGINT) AS lo_cents,
             CAST(max(cents) AS BIGINT) AS hi_cents,
             CAST(round(1000000 * CAST(sum(cents) AS DOUBLE) / count(*))
                  AS BIGINT) AS mean_micro
      FROM bk GROUP BY bucket
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, n_k, lo_cents, hi_cents,
           mean_micro,
           CAST(sum(n_k) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_n
    FROM cent ORDER BY bucket
    """,
    tags=("sketch", "quantiles", "analytics", "pipeline"),
)
def x_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-DIGEST quantile sketch (Dunning & Ertl 2019): cluster the
    sorted stream into centroids whose width follows a scale function
    that is FLAT in the middle and STEEP at the edges, so tail
    quantiles (p99, p999) keep near-exact resolution while the bulk
    compresses — the mergeable distributed-quantile workhorse next to
    the engine's equi-width x_quantile_sketch and Spark's opaque
    percentile_approx (x_approx_quantiles).  Centroid k covers the
    ranks where floor(delta*K(q)) = k; this build uses the RATIONAL
    scale function K(q) = 2q^3 - 3q^2 + 2q (K' = 2 at the edges vs
    1/2 at the median: 4x edge resolution, same shape family as the
    paper's asin) so bucket assignment is EXACT BIGINT arithmetic on
    a 2^17 rank grid — both engines agree bit-for-bit with no
    transcendental calls.  Output is the digest itself (per-centroid
    count/lo/hi/mean plus cumulative weight): quantile lookup is an
    interpolation over these 32 rows, and the lo/hi bands bound its
    error.

    Mergeability at scale: centroid assignment depends only on global
    rank through a monotone function, so digesting the union equals
    re-clustering the union of shard digests — the Spark build
    computes global ranks with the two-pass range-partitioned rank
    (operators/ids.ranked: O(partitions) counts through the driver,
    no single-task global window), then one (bucket) rollup.  The
    final cum_n window runs on <= 32 centroid rows, not data.
    """
    from map2db_spark.operators.ids import ranked

    ev = Tables(spark, sf_dir).events
    base = ev.select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    rk, n = ranked(base, [F.col("cents"), F.col("event_id")], rank_col="rank0")
    sc = rk.select(
        "cents",
        F.expr(f"((2 * (rank0 + 1) - 1) * {_TD_B // 2}) div {n}").alias("r"),
    )
    bk = sc.select(
        "cents",
        F.expr(
            f"({_TD_DELTA} * (r * (2 * r * r - 3 * r * {_TD_B} + {_TD_2B2})))"
            f" div {_TD_B3}"
        ).alias("bucket"),
    )
    cent = bk.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_k"),
        F.min("cents").cast("long").alias("lo_cents"),
        F.max("cents").cast("long").alias("hi_cents"),
        F.round(
            F.lit(1000000) * F.sum("cents").cast("double") / F.count(F.lit(1))
        )
        .cast("long")
        .alias("mean_micro"),
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cent.select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_k", "lo_cents", "hi_cents", "mean_micro",
            F.sum("n_k").over(w).cast("long").alias("cum_n"),
        )
        .orderBy("bucket")
    )
