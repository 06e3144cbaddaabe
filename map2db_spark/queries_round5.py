"""Round-5 additions, grouped by family:

- distribution statistics: KS / PSI drift, Spearman, Welch t, runs
  test, Mann-Kendall, xi correlation, Poisson bootstrap, entropy,
  weighted median, ACF, Durbin-Watson, seasonality strength, sMAPE,
  conformal intervals, max drawdown, power analysis, IPW, Gini split;
- graph: Adamic-Adar, deterministic random walks, HITS, clustering
  coefficient, degree assortativity;
- retrieval / dedup: MMR reranking, binary quantization, LSH recall
  eval, incremental dedup, CDC chunking, canonical selection,
  cluster-aware splitting;
- text/curation: DSIR weighting, BPE encode, collocations, Heaps'
  law, readability, token budgeting, curriculum ordering, target
  encoding;
- sources/surfaces: CSV/JSONL/text/codec round-trips, schema
  evolution, dynamic partition overwrite, GROUP BY ALL, LATERAL,
  typed from_json, Arrow Python UDF;
- multimodal metadata: JPEG/WebP/MP4 walkers + magic-byte dispatch
  (queries here; kernels in functions/).

Shared parity conventions (CLAUDE.md + memory/spark-duckdb-parity-
tricks.md): every cross-engine value is an exact integer, an md5
string, or the rounding of ONE shared IEEE expression (divisions and
sqrt are correctly-rounded per IEEE 754, so an identical expression
tree over identical integer inputs is bit-deterministic across
engines; ln appears at most once per emitted term, always applied to
an identical double quotient of exact integers).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from map2db_spark.queries_pipeline import _JACCARD_DF_CAP as _DF_CAP
from map2db_spark.registry import query
from map2db_spark.tables import Tables
from map2db_spark.tables import cleanup_roundtrip as _cleanup_roundtrip


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov distance (exact integer numerator)
# ---------------------------------------------------------------------------


@query(
    "x_ks_two_sample",
    oracle="""
    WITH c AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = 'view'  THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('click', 'view')
    ),
    d AS (
      SELECT cents, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
      FROM c GROUP BY cents
    ),
    t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
          FROM d),
    cum AS (
      SELECT sum(ca) OVER (ORDER BY cents) AS cum_a,
             sum(cb) OVER (ORDER BY cents) AS cum_b
      FROM d
    )
    SELECT t.na, t.nb,
           CAST(max(abs(cum_a * t.nb - cum_b * t.na)) AS BIGINT) AS d_num,
           CASE WHEN t.na = 0 OR t.nb = 0 THEN NULL
                ELSE CAST(max(abs(cum_a * t.nb - cum_b * t.na)) * 1000000
                          // (t.na * t.nb) AS BIGINT)
           END AS d_ppm
    FROM cum CROSS JOIN t
    GROUP BY t.na, t.nb
    """,
    tags=("analytics", "statistics", "drift"),
)
def x_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between the value
    distributions of two event types — the standard drift test between
    a reference and a candidate data slice.  D = sup |F_a - F_b| is
    carried as the integer numerator max|cum_a*nb - cum_b*na| (the
    ECDF step heights cross-multiplied), so the statistic is exact and
    engine-independent; d_ppm releases it as an integer-divided
    parts-per-million.  Ties are handled exactly: counts aggregate per
    distinct value BEFORE the cumulative, so both ECDFs step together
    at shared points.

    Scale shape: one map-side-combinable groupBy collapses the corpus
    to its distinct-value table; the cumulative then runs over
    distinct values only — AND via the two-pass range-partitioned
    prefix sum (operators/ids.py with_prefix_sums), never a
    single-partition window, so an unbounded value domain (exactly
    what a drift test gets pointed at) costs no one-task stage.
    """
    ev = Tables(spark, sf_dir).events.where(
        F.col("event_type").isin("click", "view")
    ).select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("b"),
    )
    d = ev.groupBy("cents").agg(
        F.sum("a").cast("long").alias("ca"), F.sum("b").cast("long").alias("cb")
    )
    t = d.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    from map2db_spark.operators.ids import with_prefix_sums

    cum = with_prefix_sums(d, ["cents"], ["ca", "cb"]).select(
        F.col("cum_ca").alias("cum_a"), F.col("cum_cb").alias("cum_b")
    )
    gap = F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na"))
    return (
        cum.crossJoin(F.broadcast(t))
        .groupBy("na", "nb")
        .agg(
            F.max(gap).cast("long").alias("d_num"),
            # r13 static divide audit: a one-sided sample (no clicks
            # or no views on thin data) -> NULL on BOTH engines
            F.expr(
                "CASE WHEN na = 0 OR nb = 0 THEN NULL"
                " ELSE CAST(max(abs(cum_a * nb - cum_b * na)) * 1000000"
                " DIV (na * nb) AS BIGINT) END"
            ).alias("d_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (doubled midranks, exact moments)
# ---------------------------------------------------------------------------


# degenerate-input audit (r14): a singleton or constant-rank group
# zeroes a variance factor — rho undefined, NULL on BOTH engines (the
# guard compares the same doubles the denominator computes, so it
# fires identically on both)
_SPEARMAN_RHO = """
    CASE WHEN n <= 1
           OR CAST(n AS DOUBLE) * sxx = CAST(sx AS DOUBLE) * sx
           OR CAST(n AS DOUBLE) * syy = CAST(sy AS DOUBLE) * sy
    THEN NULL
    ELSE CAST(round(1000000 *
        (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
           * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
    ) AS BIGINT) END"""


@query(
    "x_spearman_corr",
    oracle=f"""
    WITH c AS (
      SELECT l_returnflag AS rf,
             CAST(round(l_quantity * 100) AS BIGINT) AS qx,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS qy
      FROM lineitem
    ),
    r AS (
      SELECT rf,
             2 * rank() OVER (PARTITION BY rf ORDER BY qx)
               + count(*) OVER (PARTITION BY rf, qx) - 1 AS r2x,
             2 * rank() OVER (PARTITION BY rf ORDER BY qy)
               + count(*) OVER (PARTITION BY rf, qy) - 1 AS r2y
      FROM c
    ),
    m AS (
      SELECT rf, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r2x) AS BIGINT) AS sx,
             CAST(sum(r2y) AS BIGINT) AS sy,
             CAST(sum(r2x * r2y) AS BIGINT) AS sxy,
             CAST(sum(r2x * r2x) AS BIGINT) AS sxx,
             CAST(sum(r2y * r2y) AS BIGINT) AS syy
      FROM r GROUP BY rf
    )
    SELECT rf, n, {_SPEARMAN_RHO} AS rho_micro
    FROM m ORDER BY rf
    """,
    tags=("analytics", "statistics", "correlation"),
)
def x_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and price per return
    flag — the robust (monotone, outlier-insensitive) complement to
    the Pearson corr in x_corr_cov.  Tie handling is exact: the
    doubled midrank 2*rank + |ties| - 1 (= 2 * average rank) stays an
    integer, so all five moment sums are exact BIGINTs; rho is then
    released micro-scaled from ONE shared IEEE expression (products,
    differences, two sqrt, one division — all correctly rounded, so
    both engines agree bit-for-bit).

    Scale shape: two rank windows over one group-key Exchange (the
    same shape as x_auc_rank), then a map-side-combinable moment
    aggregation; nothing corpus-sized is joined or re-sorted.  Moment
    products stay within BIGINT through ~10^6 rows/group; beyond
    that, promote the moment sums to DECIMAL(38,0) as x_group_linreg
    does.
    """
    li = Tables(spark, sf_dir).lineitem.select(
        F.col("l_returnflag").alias("rf"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qx"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("qy"),
    )
    r2 = li.select(
        "rf",
        (
            2 * F.rank().over(Window.partitionBy("rf").orderBy("qx"))
            + F.count("*").over(Window.partitionBy("rf", "qx"))
            - 1
        ).alias("r2x"),
        (
            2 * F.rank().over(Window.partitionBy("rf").orderBy("qy"))
            + F.count("*").over(Window.partitionBy("rf", "qy"))
            - 1
        ).alias("r2y"),
    )
    m = r2.groupBy("rf").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r2x").cast("long").alias("sx"),
        F.sum("r2y").cast("long").alias("sy"),
        F.sum(F.col("r2x") * F.col("r2y")).cast("long").alias("sxy"),
        F.sum(F.col("r2x") * F.col("r2x")).cast("long").alias("sxx"),
        F.sum(F.col("r2y") * F.col("r2y")).cast("long").alias("syy"),
    )
    return m.select("rf", "n", F.expr(_SPEARMAN_RHO).alias("rho_micro")).orderBy("rf")


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test on a continuous metric
# ---------------------------------------------------------------------------


# shared verbatim by the DuckDB oracle and the Spark F.expr; the
# degenerate guard (r13 static divide audit) binds both engines at
# once: a singleton/empty arm zeroes the (n-1)n denominators, and
# ss*n = s*s is the EXACT integer statement of zero sample variance
# (both arms constant -> sqrt(0)); each emits t = NULL instead of a
# Spark ANSI raise where DuckDB yields NULL/inf
_WELCH_T = """
    CASE WHEN n_a <= 1 OR n_b <= 1
           OR (ss_a * n_a = s_a * s_a AND ss_b * n_b = s_b * s_b)
    THEN NULL
    ELSE CAST(round(1000000 * (
        (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
        / sqrt(
            (CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a)
              / (n_a - 1) / n_a
          + (CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * s_b / n_b)
              / (n_b - 1) / n_b
        )
    )) AS BIGINT) END"""


@query(
    "x_welch_ttest",
    oracle=f"""
    WITH p AS (
      SELECT CASE WHEN CAST(concat('0x',
                 substr(md5('tt:' || CAST(user_id AS VARCHAR)), 1, 6))
                 AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END AS is_a,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT CAST(sum(is_a) AS BIGINT) AS n_a,
             CAST(sum(is_a * cents) AS BIGINT) AS s_a,
             CAST(sum(is_a * cents * cents) AS BIGINT) AS ss_a,
             CAST(sum(1 - is_a) AS BIGINT) AS n_b,
             CAST(sum((1 - is_a) * cents) AS BIGINT) AS s_b,
             CAST(sum((1 - is_a) * cents * cents) AS BIGINT) AS ss_b
      FROM p
    )
    SELECT n_a, s_a, ss_a, n_b, s_b, ss_b, {_WELCH_T} AS t_micro
    FROM c
    """,
    tags=("analytics", "statistics", "ab-test"),
)
def x_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on purchase value between two
    md5-parity arms — the continuous-metric sibling of the
    two-proportion z-test (x_ab_test_proportions); Welch's form does
    not assume equal variances, the recommended default for A/B
    readouts.  The six sufficient statistics (n, sum, sum-of-squares
    per arm, in exact cents) are integer; t is released micro-scaled
    from ONE shared IEEE expression (divisions + one sqrt).

    Scale shape: a single map-side-combinable aggregate over the
    filtered fact — six integers cross the network regardless of
    event volume.  Sum-of-squares stays within BIGINT to ~10^6 rows
    at this value range; promote to DECIMAL(38,0) beyond.
    """
    ev = Tables(spark, sf_dir).events.where(F.col("event_type") == "purchase")
    is_a = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("tt:"), F.col("user_id").cast("string"))), 1, 6
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0
    ).cast("int")
    p = ev.select(
        is_a.alias("is_a"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    c = p.agg(
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
    return c.select(
        "n_a", "s_a", "ss_a", "n_b", "s_b", "ss_b", F.expr(_WELCH_T).alias("t_micro")
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap: resampling uncertainty without resampling passes
# ---------------------------------------------------------------------------

_BOOT_R = 32
# Poisson(1) inverse-CDF thresholds, scaled to the 48-bit md5 draw:
# T_k = floor(P(X <= k) * 2^48).  Generated once here and inlined into
# BOTH engines, so the per-(row, replicate) weight is a pure integer
# comparison — no float RNG anywhere.
_POIS_CUM = []
_acc = 0.0
_fact = 1.0
for _k in range(6):
    if _k > 0:
        _fact *= _k
    _acc += math.exp(-1.0) / _fact
    _POIS_CUM.append(_acc)
_POIS_T = [int(p * (1 << 48)) for p in _POIS_CUM]


@query(
    "x_poisson_bootstrap",
    oracle=f"""
    WITH w AS (
      SELECT g.r,
             CAST(round(e.value * 100) AS BIGINT) AS cents,
             {" + ".join(
                 "(CASE WHEN CAST(concat('0x', substr(md5("
                 "'boot:' || CAST(g.r AS VARCHAR) || ':' || "
                 "CAST(e.event_id AS VARCHAR)), 1, 12)) AS BIGINT) >= "
                 f"{t} THEN 1 ELSE 0 END)"
                 for t in _POIS_T
             )} AS wgt
      FROM events e CROSS JOIN generate_series(0, {_BOOT_R - 1}) g(r)
    )
    SELECT r,
           CAST(sum(wgt) AS BIGINT) AS wsum,
           CAST(sum(wgt * cents) AS BIGINT) AS wxsum,
           -- degenerate-input audit (r14): a tiny corpus can draw
           -- weight 0 for EVERY row of a replicate -> the replicate
           -- resample is empty, its mean undefined -> NULL on BOTH
           -- engines
           CASE WHEN sum(wgt) = 0 THEN NULL
                ELSE CAST(sum(wgt * cents) * 1000000 // sum(wgt)
                     AS BIGINT) END AS mean_micro
    FROM w GROUP BY r ORDER BY r
    """,
    tags=("analytics", "statistics", "bootstrap"),
)
def x_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the mean event value: each of the 32
    replicates reweights every row by an independent Poisson(1) draw —
    the classic trick that makes bootstrap resampling embarrassingly
    parallel (no sampling WITH replacement across partitions, which
    would need global coordination).  The draw is deterministic: a
    48-bit md5 integer compared against precomputed inverse-CDF
    thresholds (inlined as integer literals in both engines), so the
    replicate means are exact integers and reproduce bit-for-bit.
    The spread of the 32 replicate means IS the standard error /
    percentile CI of the corpus mean.

    Scale shape: the 32x row expansion feeds a map-side-combinable
    aggregate, so each task emits at most 32 partial rows — the
    shuffle carries O(partitions * R), never O(rows * R).  Weight
    capped at 6 (P(X>6) ~ 1e-4, absorbed into the w=6 bucket — the
    thresholds make this exact, not approximate).
    """
    ev = Tables(spark, sf_dir).events.select(
        F.col("event_id").cast("string").alias("eid"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    rep = ev.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))))
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("boot:"), F.col("r").cast("string"), F.lit(":"), F.col("eid")
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    wgt = sum(
        F.when(u >= F.lit(t), 1).otherwise(0) for t in _POIS_T
    )
    return (
        rep.select("r", "cents", wgt.alias("wgt"))
        .groupBy("r")
        .agg(
            F.sum("wgt").cast("long").alias("wsum"),
            F.sum(F.col("wgt") * F.col("cents")).cast("long").alias("wxsum"),
            F.expr(
                "CASE WHEN sum(wgt) = 0 THEN NULL"
                " ELSE CAST(sum(wgt * cents) * 1000000 DIV sum(wgt)"
                " AS BIGINT) END"
            ).alias("mean_micro"),
        )
        .orderBy("r")
    )


# ---------------------------------------------------------------------------
# Shannon entropy per segment (data-diversity profiling)
# ---------------------------------------------------------------------------


@query(
    "x_entropy_segments",
    oracle="""
    WITH c AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ),
    t AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_langs
      FROM c GROUP BY 1
    )
    SELECT c.source, t.n, t.n_langs,
           CAST(sum(CAST(round(
               1000000 * (CAST(c.c AS DOUBLE) / t.n)
                       * ln(CAST(t.n AS DOUBLE) / c.c)
           ) AS BIGINT)) AS BIGINT) AS h_micro
    FROM c JOIN t USING (source)
    GROUP BY c.source, t.n, t.n_langs
    ORDER BY c.source
    """,
    tags=("analytics", "profiling", "curation"),
)
def x_entropy_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the language mix per source — the diversity
    statistic a corpus-mixing pipeline monitors (a source whose
    entropy collapses has become monolingual or templated).  Each
    p*ln(1/p) term is micro-scaled and rounded INDIVIDUALLY (one ln
    per term, applied to an identical integer quotient in both
    engines), so the per-source sum is integer-exact and
    order-independent — safe to compute under any partitioning.

    Scale shape: one map-side-combinable count per (source, lang)
    cell, one broadcast of the O(sources)-row totals back onto the
    cells, one O(cells) final aggregate.  Corpus rows cross the
    network once, as counts.
    """
    docs = Tables(spark, sf_dir).documents
    c = docs.groupBy("source", "lang").agg(F.count("*").cast("long").alias("c"))
    t = c.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"), F.count("*").cast("long").alias("n_langs")
    )
    term = F.round(
        1000000
        * (F.col("c").cast("double") / F.col("n"))
        * F.log(F.col("n").cast("double") / F.col("c"))
    ).cast("long")
    return (
        c.join(F.broadcast(t), "source")
        .groupBy("source", "n", "n_langs")
        .agg(F.sum(term).cast("long").alias("h_micro"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction over the co-purchase graph
# ---------------------------------------------------------------------------

_AA_DEG_CAP = 64


@query(
    "g_adamic_adar",
    oracle=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    e AS (
      SELECT x.p AS u, y.p AS v
      FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    adj AS (
      SELECT u AS w, v AS x FROM e UNION ALL SELECT v AS w, u AS x FROM e
    ),
    deg AS (
      SELECT w, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY w
    ),
    wedge AS (
      SELECT a.x AS u, b.x AS v,
             CAST(round(1000000 / ln(CAST(d.d AS DOUBLE))) AS BIGINT) AS aa
      FROM adj a
      JOIN adj b ON a.w = b.w AND a.x < b.x
      JOIN deg d ON d.w = a.w
      WHERE d.d <= {_AA_DEG_CAP}
    ),
    score AS (
      SELECT u, v,
             CAST(count(*) AS BIGINT) AS common_neighbors,
             CAST(sum(aa) AS BIGINT) AS aa_micro
      FROM wedge
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = wedge.u AND e.v = wedge.v)
      GROUP BY u, v
    )
    SELECT u, v, common_neighbors, aa_micro
    FROM score
    ORDER BY aa_micro DESC, u, v LIMIT 20
    """,
    tags=("graph", "link-prediction", "analytics"),
)
def g_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the part co-purchase graph:
    for every non-adjacent pair (u, v), score = sum over common
    neighbors w of 1/ln(deg(w)) — rarer shared neighbors carry more
    signal than hubs.  The sixth graph pattern in the engine (after
    components, PageRank, triangles, k-core, BFS, label prop); link
    prediction is the recommender/graph-completion primitive.  Each
    1/ln(deg) term is micro-scaled and rounded individually (single
    ln on an identical integer input), so scores are exact integer
    sums — order-independent under any partitioning; top-20 with a
    total (score, u, v) tiebreak is deterministic.

    Scale shape: wedges are generated per CENTER node, so the hub
    rail is explicit — centers with deg > {_AA_DEG_CAP} are skipped
    (a 1M-degree hub would emit 10^12 wedges and carries ~no AA
    signal: 1/ln(10^6) per term).  The wedge join keys on the center,
    the score aggregation on the pair, the exclusion anti-join on the
    pair again (co-partitioned), then TakeOrderedAndProject.
    """
    li = (
        Tables(spark, sf_dir)
        .lineitem.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    e = (
        li.alias("x")
        .join(li.alias("y"), (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")))
        .groupBy(F.col("x.p").alias("u"), F.col("y.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
        .select("u", "v")
        .localCheckpoint()  # base of adjacency + exclusion branches
    )
    adj = e.select(F.col("u").alias("w"), F.col("v").alias("x")).unionAll(
        e.select(F.col("v").alias("w"), F.col("u").alias("x"))
    )
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("d"))
    aa = F.round(1000000 / F.log(F.col("d").cast("double"))).cast("long")
    degc = deg.where(F.col("d") <= _AA_DEG_CAP).select(
        F.col("w").alias("dw"), "d"
    )
    wedge = (
        adj.alias("a")
        .join(adj.alias("b"), (F.col("a.w") == F.col("b.w")) & (F.col("a.x") < F.col("b.x")))
        .join(degc.hint("broadcast"), F.col("a.w") == F.col("dw"))
        .select(F.col("a.x").alias("u"), F.col("b.x").alias("v"), aa.alias("aa"))
    )
    score = (
        wedge.join(e, ["u", "v"], "left_anti")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum("aa").cast("long").alias("aa_micro"),
        )
    )
    return score.orderBy(F.desc("aa_micro"), "u", "v").limit(20)


# ---------------------------------------------------------------------------
# Deterministic random walks (node2vec-style corpus generation)
# ---------------------------------------------------------------------------

_WALK_SEEDS = 20


def _walk_step_sql(step: int, prev: str) -> str:
    return f"""
      SELECT s.seed, arg_max(a.x, md5('rw:{step}:' ||
                 CAST(s.{prev} AS VARCHAR) || ':' ||
                 CAST(a.x AS VARCHAR))) AS n{step}
      FROM s{step - 1} s JOIN adj a ON a.w = s.{prev}
      GROUP BY s.seed
    """


@query(
    "g_random_walk",
    oracle=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    e AS (
      SELECT x.p AS u, y.p AS v
      FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    adj AS (
      SELECT u AS w, v AS x FROM e UNION ALL SELECT v AS w, u AS x FROM e
    ),
    s0 AS (
      SELECT w AS seed, w AS n0 FROM adj GROUP BY w
      ORDER BY w LIMIT {_WALK_SEEDS}
    ),
    s1 AS ({_walk_step_sql(1, "n0")}),
    s2 AS ({_walk_step_sql(2, "n1")}),
    s3 AS ({_walk_step_sql(3, "n2")})
    SELECT s0.seed, s1.n1, s2.n2, s3.n3
    FROM s0 JOIN s1 USING (seed) JOIN s2 USING (seed) JOIN s3 USING (seed)
    ORDER BY seed
    """,
    tags=("graph", "random-walk", "embeddings"),
)
def g_random_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random walks over the co-purchase graph — the
    corpus-generation step of DeepWalk/node2vec-style graph
    embeddings (walk sequences feed a skip-gram trainer).  The
    "random" neighbor choice is an argmax of md5('rw:' || step ||
    ':' || current || ':' || neighbor): uniform over neighbors,
    step-decorrelated, and bit-reproducible on any cluster layout —
    no RNG state to synchronize across executors.

    Scale shape: the walk frontier is one row per seed; each step is
    an equi-join of the frontier against the adjacency list keyed on
    the current node, then a per-seed argmax — O(steps) rounds of
    bounded joins, the BFS dataflow with an argmax instead of a
    union.  Hub nodes cost one task's scan of their neighbor block,
    not a cross product.  The argmax is a WindowGroupLimit top-1
    window (r16, guide §7.2): max_by(x, md5key)'s string-keyed buffer
    is immutable, so every step had planned Sort + SortAggregate over
    the frontier-x-neighbors table; the window form keeps a running
    top-1 per seed on the map side and shuffles one row per seed per
    task.  Value-identical: the md5 keys are distinct within a seed
    group (distinct neighbor x under a fixed cur), so the argmax is
    unique — the same uniqueness arg_max needs on the oracle side.
    """
    li = (
        Tables(spark, sf_dir)
        .lineitem.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    e = (
        li.alias("x")
        .join(li.alias("y"), (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")))
        .groupBy(F.col("x.p").alias("u"), F.col("y.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
        .select("u", "v")
    )
    adj = (
        e.select(F.col("u").alias("w"), F.col("v").alias("x"))
        .unionAll(e.select(F.col("v").alias("w"), F.col("u").alias("x")))
        .localCheckpoint()  # reused by every step join
    )
    state = (
        adj.select("w").distinct().orderBy("w").limit(_WALK_SEEDS)
        .select(F.col("w").alias("seed"), F.col("w").alias("cur"))
    )
    out_cols = []
    for step in (1, 2, 3):
        key = F.md5(
            F.concat(
                F.lit(f"rw:{step}:"),
                F.col("cur").cast("string"),
                F.lit(":"),
                F.col("x").cast("string"),
            )
        )
        joined = state.join(adj, state["cur"] == adj["w"]).select(
            "seed", *out_cols, "x", key.alias("__rwk")
        )
        wnd = Window.partitionBy("seed").orderBy(
            F.col("__rwk").desc_nulls_last()
        )
        state = (
            joined.withColumn("__rn", F.row_number().over(wnd))
            .where(F.col("__rn") == 1)
            .select(
                "seed",
                *out_cols,
                F.col("x").alias(f"n{step}"),
                F.col("x").alias("cur"),
            )
        )
        out_cols.append(f"n{step}")
    return state.select("seed", "n1", "n2", "n3").orderBy("seed")


# ---------------------------------------------------------------------------
# DSIR importance weighting (hashed-n-gram domain reweighting)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256


@query(
    "c_dsir_importance",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    ),
    big AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substr(md5(t[i] || ' ' || t[i + 1]), 1, 6))
                  AS BIGINT) % {_DSIR_BUCKETS} AS bucket
      FROM toks
      CROSS JOIN LATERAL
        (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
      WHERE len(t) >= 2
    ),
    bs AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS r_c,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS t_c
      FROM big GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(sum(r_c) AS BIGINT) AS r_n, CAST(sum(t_c) AS BIGINT) AS t_n
      FROM bs
    ),
    w AS (
      SELECT bucket,
             CAST(round(1000000 * ln(
                 CAST((t_c + 1) * (r_n + {_DSIR_BUCKETS}) AS DOUBLE)
                 / CAST((r_c + 1) * (t_n + {_DSIR_BUCKETS}) AS DOUBLE)
             )) AS BIGINT) AS w_micro
      FROM bs CROSS JOIN tot
    )
    SELECT big.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(w.w_micro) AS BIGINT) AS dsir_micro
    FROM big JOIN w USING (bucket)
    GROUP BY big.doc_id
    ORDER BY dsir_micro DESC, doc_id LIMIT 20
    """,
    tags=("curation", "sampling", "pipeline"),
)
def c_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (Data Selection via Importance
    Resampling): documents are scored by how much their hashed-bigram
    profile looks like a target domain (here lang='en') relative to
    the raw corpus — the published recipe for selecting pretraining
    data that matches a high-quality target without training a
    classifier.  Per-bucket weight = ln of the Laplace-smoothed
    target/raw frequency ratio, micro-rounded (single ln on an
    identical integer-product quotient); a document's score is the
    exact integer sum of its bigram-instance weights.

    Scale shape: bigram -> 256 hash buckets collapses the vocabulary
    before anything shuffles (map-side combine straight to 256 rows);
    the weight table is broadcast back onto the bigram stream, so the
    corpus is read twice and shuffled once (doc-keyed score sum).
    The top-20 release is TakeOrderedAndProject.
    """
    docs = Tables(spark, sf_dir).documents
    t = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.repartition(spark.sparkContext.defaultParallelism).select("doc_id", "lang", t.alias("t")).where(
        F.size("t") >= 2
    )
    big = base.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            )
        ).alias("bg"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5(F.col("bg")), 1, 6), 16, 10).cast("long")
            % _DSIR_BUCKETS
        ).alias("bucket"),
    )
    bs = big.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("r_c"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("t_c"),
    )
    tot = bs.agg(
        F.sum("r_c").cast("long").alias("r_n"), F.sum("t_c").cast("long").alias("t_n")
    )
    w = bs.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            1000000
            * F.log(
                ((F.col("t_c") + 1) * (F.col("r_n") + _DSIR_BUCKETS)).cast("double")
                / ((F.col("r_c") + 1) * (F.col("t_n") + _DSIR_BUCKETS)).cast("double")
            )
        )
        .cast("long")
        .alias("w_micro"),
    )
    return (
        big.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("w_micro").cast("long").alias("dsir_micro"),
        )
        .orderBy(F.desc("dsir_micro"), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Text source-format round-trips: CSV and JSON-lines
# ---------------------------------------------------------------------------


@query(
    "f_csv_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           min(md5(props)) AS min_props_md5
    FROM events GROUP BY event_type
    """,
    tags=("functions", "formats", "source"),
)
def f_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-format breadth: events round-trip through CSV — written and
    read by executor tasks through Spark's native CSV source with an
    explicit schema (never inferSchema: schema inference is a second
    full scan).  The props column carries embedded JSON (quotes,
    commas, braces), so the hash match proves the writer's
    quote/escape handling survives the round trip byte-exactly, not
    just for friendly values.  Scale shape: format transcode is a
    map-only parallel pass; the fixed-width aggregates are one
    map-side-combinable no-sort shuffle, and the md5 extremum rides a
    WindowGroupLimit top-1 window over a persisted narrow projection
    (r16, guide §7.2 via functions/extrema.py — min(string) in the
    groupBy had an immutable buffer, dragging every aggregate through
    a per-task Sort + SortAggregate of the full read-back; the narrow
    (event_type, md5) persist also keeps the CSV parse single-pass
    under the split aggregate's two consumers).  CSV files split by
    line, so parallelism survives large files (unlike multiline JSON).
    """
    import tempfile

    from map2db_spark.functions.extrema import attach_group_extremum

    ev = Tables(spark, sf_dir).events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "props",
    )
    tmp = tempfile.mkdtemp(prefix="m2db_csv_")
    ev.write.mode("overwrite").option("header", True).csv(tmp)
    back = (
        spark.read.schema("event_type STRING, cents BIGINT, props STRING")
        .option("header", True)
        .csv(tmp)
    )
    narrow = back.select(
        "event_type", "cents", F.md5(F.col("props")).alias("__h")
    ).persist()
    aggs = narrow.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    return _cleanup_roundtrip(
        attach_group_extremum(
            aggs, narrow, ["event_type"], F.col("__h"), "min_props_md5"
        ),
        tmp,
    )


@query(
    "f_jsonl_roundtrip",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           min(md5(text)) AS min_text_md5
    FROM documents GROUP BY lang
    """,
    tags=("functions", "formats", "source"),
)
def f_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-format breadth: documents round-trip through JSON Lines —
    the lingua franca of LLM corpus interchange (one JSON object per
    line, splittable by newline, so a 100 GB shard still reads in
    parallel).  Written and read by executor tasks with an explicit
    schema; md5 over the round-tripped text proves the JSON string
    escaping is byte-exact.  Multiline JSON would serialize the read
    to one task per file — JSONL is the scale-safe shape.

    r16 (guide §7.2, functions/extrema.py): the md5 extremum is a
    WindowGroupLimit top-1 window over a persisted narrow
    (lang, n_chars, md5) projection — min(string) in the groupBy had
    an immutable buffer, dragging count/sum through a per-task
    Sort + SortAggregate of the full read-back; the persist keeps the
    JSON parse single-pass under the split aggregate's two consumers.
    """
    import tempfile

    from map2db_spark.functions.extrema import attach_group_extremum

    docs = Tables(spark, sf_dir).documents.select("doc_id", "lang", "text")
    tmp = tempfile.mkdtemp(prefix="m2db_jsonl_")
    docs.write.mode("overwrite").json(tmp)
    back = spark.read.schema("doc_id BIGINT, lang STRING, text STRING").json(tmp)
    narrow = back.select(
        "lang",
        F.length("text").alias("__nc"),
        F.md5(F.col("text")).alias("__h"),
    ).persist()
    aggs = narrow.groupBy("lang").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("__nc").cast("long").alias("total_chars"),
    )
    return _cleanup_roundtrip(
        attach_group_extremum(
            aggs, narrow, ["lang"], F.col("__h"), "min_text_md5"
        ),
        tmp,
    )


# ---------------------------------------------------------------------------
# JPEG frame-geometry decode (real marker walk, stdlib only)
# ---------------------------------------------------------------------------


@query(
    "m_jpeg_dims",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(16 + (doc_id % 7) * 3 AS INTEGER) AS width,
           CAST(9 + (doc_id % 5) * 4 AS INTEGER) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INTEGER)
             AS ncomp,
           CAST(8 AS INTEGER) AS precision,
           CAST(6 AS INTEGER) AS n_segments,
           CAST(189 + 5 * (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END)
                AS INTEGER) AS n_bytes
    FROM documents WHERE doc_id < 40
    """,
    tags=("multimodal", "image", "metadata"),
)
def m_jpeg_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG metadata decode: structurally-valid JPEG streams
    (full SOI/APP0/COM/DQT/SOF0/DHT/SOS marker layout, fabricated
    in-kernel with closed-form geometry) are walked per ITU-T T.81
    §B.2 by functions/jpeg.py to recover width/height/components/
    precision — the dimension-filter pass a multimodal pipeline runs
    over EVERY image before deciding what to pixel-decode.  The
    oracle recomputes geometry and byte length from the closed form,
    so the marker walker (segment lengths, fill bytes, SOF layout)
    is value-verified end to end; pixel entropy decode stays an
    honest NotImplementedError slot (needs a Huffman+DCT codec).

    Scale shape: payload bytes stream through ONE mapInPandas pass
    (never collected); the walker touches only marker segments
    (~200 bytes) regardless of payload size, so the metadata pass
    over a 100 TB image corpus is I/O-bound on the binary column,
    not CPU-bound.
    """
    from map2db_spark.functions.multimodal import (
        documents_as_jpeg_media,
        extract_jpeg_dims,
    )

    docs = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 40)
    return extract_jpeg_dims(documents_as_jpeg_media(docs))


# ---------------------------------------------------------------------------
# BPE tokenizer ENCODE: apply trained merges to the corpus
# ---------------------------------------------------------------------------

_BPE_APPLY_ROUNDS = 3


def _bpe_apply_oracle() -> str:
    parts = [
        r"""s0 AS (
      SELECT doc_id, array_to_string(list_transform(
                 regexp_split_to_array(trim(text), '\s+'),
                 x -> chr(1) || x), ' ') AS s
      FROM documents
    )"""
    ]
    for k in range(1, _BPE_APPLY_ROUNDS + 1):
        parts.append(f"""c{k} AS (
      SELECT t[i] || ' ' || t[i + 1] AS pair, count(*) AS n
      FROM (SELECT string_split(s, ' ') AS t FROM s{k - 1}) z
      CROSS JOIN LATERAL (
        SELECT unnest(generate_series(1, len(t) - 1)) AS i
      ) g
      GROUP BY 1
    ),
    t{k} AS (SELECT pair FROM c{k} ORDER BY n DESC, pair ASC LIMIT 1),
    s{k} AS (
      SELECT doc_id, replace(s, (SELECT pair FROM t{k}),
                     replace((SELECT pair FROM t{k}), ' ', chr(2))) AS s
      FROM s{k - 1}
    )""")
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT doc_id,
           CAST(len(string_split(s, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(string_split(s, ' '),
                                t -> strpos(t, chr(2)) > 0)) AS BIGINT)
             AS n_merged
    FROM s{_BPE_APPLY_ROUNDS} WHERE doc_id < 100
    """
    )


@query(
    "t_bpe_encode_apply",
    oracle=_bpe_apply_oracle(),
    tags=("text", "tokenizer", "pipeline"),
)
def t_bpe_encode_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer ENCODE — the other half of t_bpe_train_rounds:
    the three corpus-trained merges are applied to every document and
    the per-document token counts emitted (n_tokens after merging,
    n_merged = tokens that absorbed a merge).  This is the pass that
    actually tokenizes a pretraining corpus once a vocabulary exists;
    its output feeds sequence packing (c_sequence_packing) and token
    accounting.  Merge application is the sentinel-replace trick
    (greedy left-to-right non-overlapping, identical in both
    engines), so the token counts are exact integers.

    Scale shape: training reruns the t_bpe_train_rounds dataflow
    (pair count shuffles collapse Zipf-hard under map-side combine;
    each winner is a 1-row broadcast); the encode itself is a
    MAP-ONLY pass over the corpus — documents never shuffle, and the
    per-doc stats are computed in the same projection.
    """
    docs = Tables(spark, sf_dir).documents
    cur = docs.select(
        "doc_id",
        F.expr(
            r"array_join(transform(split(trim(text), '\\s+'),"
            r" x -> concat(char(1), x)), ' ')"
        ).alias("s"),
    )
    for _ in range(_BPE_APPLY_ROUNDS):
        pairs = cur.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(split(s, ' ')) - 1),"
                    " i -> concat(element_at(split(s, ' '), i), ' ',"
                    " element_at(split(s, ' '), i + 1)))"
                )
            ).alias("pair")
        )
        top1 = (
            pairs.groupBy("pair")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .select("pair")
        )
        cur = cur.crossJoin(F.broadcast(top1)).select(
            "doc_id",
            F.expr("replace(s, pair, replace(pair, ' ', char(2)))").alias("s"),
        )
    return cur.where(F.col("doc_id") < 100).select(
        "doc_id",
        F.expr("CAST(size(split(s, ' ')) AS BIGINT)").alias("n_tokens"),
        F.expr(
            "CAST(size(filter(split(s, ' '),"
            " t -> instr(t, char(2)) > 0)) AS BIGINT)"
        ).alias("n_merged"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation function of the daily revenue series
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7


@query(
    "x_acf_lags",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT g.lag,
             a.cents AS x, b.cents AS y
      FROM daily a
      CROSS JOIN generate_series(1, {_ACF_MAX_LAG}) g(lag)
      JOIN daily b ON b.d = a.d + CAST(g.lag AS INTEGER)
    ),
    m AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n, {_SPEARMAN_RHO} AS r_micro
    FROM m ORDER BY lag
    """,
    tags=("analytics", "timeseries", "statistics"),
)
def x_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily revenue series at lags
    1..{_ACF_MAX_LAG} — the first diagnostic of any time series (a
    spike at lag 7 = weekly seasonality; slow decay = trend; both
    decide the detrend/difference step before modeling).  Each lag's
    Pearson r over the (x_t, x_t+k) pairs is computed from exact
    BIGINT moments and released micro-scaled through the same shared
    IEEE expression as x_spearman_corr.

    Scale shape: the corpus collapses to the O(days) daily table in
    one map-side-combinable aggregate; everything after — the 7-way
    lag expansion, the shifted self-join, the moment sums — runs on
    series-scale data (broadcast joins, no corpus re-shuffle).
    """
    ev = Tables(spark, sf_dir).events
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"))
        .localCheckpoint()  # O(days) table, base of both join sides
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("lag"))
    a = daily.alias("a").crossJoin(F.broadcast(lags))
    pairs = a.join(
        F.broadcast(daily.alias("b")),
        F.col("b.d") == F.date_add(F.col("a.d"), F.col("lag")),
    ).select("lag", F.col("a.cents").alias("x"), F.col("b.cents").alias("y"))
    m = pairs.groupBy("lag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return m.select(
        F.col("lag").cast("long").alias("lag"), "n", F.expr(_SPEARMAN_RHO).alias("r_micro")
    ).orderBy("lag")


# ---------------------------------------------------------------------------
# GROUP BY ALL (modern SQL-surface ergonomics, Spark 4 + DuckDB)
# ---------------------------------------------------------------------------


@query(
    "sql_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem
    GROUP BY ALL
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("sql", "surface"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — the modern SQL ergonomic (DuckDB-originated,
    adopted by Spark 4): every non-aggregate select item becomes a
    grouping key, eliminating the classic copy-paste drift between
    SELECT list and GROUP BY clause.  Same physical plan as the
    explicit form (partial agg -> one Exchange); this query pins the
    SURFACE, proving both engines resolve ALL to the identical key
    set."""
    li = Tables(spark, sf_dir).lineitem
    li.createOrReplaceTempView("lineitem_gba")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM lineitem_gba
        GROUP BY ALL
        ORDER BY l_returnflag, l_linestatus
        """
    )


# ---------------------------------------------------------------------------
# Canonical-document selection per duplicate cluster
# ---------------------------------------------------------------------------


@query(
    "d_cluster_canonical",
    oracle=f"""
    WITH RECURSIVE
    sh AS (
      SELECT doc_id AS sid, unnest(list_distinct(list_transform(
               generate_series(1, len(regexp_split_to_array(trim(text), '\\s+')) - 2),
               i -> array_to_string(list_slice(
                      regexp_split_to_array(trim(text), '\\s+'), i, i + 2), ' '))))
             AS shingle
      FROM documents WHERE doc_id < 200
    ),
    shc AS (
      SELECT sh.* FROM sh JOIN (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING count(DISTINCT sid) <= {_DF_CAP}
      ) rare USING (shingle)
    ),
    sizes AS (SELECT sid, count(DISTINCT shingle) AS n FROM shc GROUP BY sid),
    inter AS (
      SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS shared
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.sid < b.sid
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b
      FROM inter JOIN sizes na ON na.sid = id_a
                 JOIN sizes nb ON nb.sid = id_b
      WHERE round(shared / (na.n + nb.n - shared), 6) >= 0.02
    ),
    sym AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
    reach(node, lbl) AS (
      SELECT DISTINCT a AS node, a AS lbl FROM sym
      UNION
      SELECT s.b AS node, r.lbl FROM reach r JOIN sym s ON s.a = r.node
    ),
    comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS size,
           CAST(arg_max(comp.node, d.n_chars * 1000000 - comp.node) AS BIGINT)
             AS keeper_id,
           CAST(max(d.n_chars * 1000000 - comp.node) // 1000000 AS BIGINT)
             AS keeper_chars,
           CAST(count(*) - 1 AS BIGINT) AS n_removed
    FROM comp JOIN documents d ON d.doc_id = comp.node
    GROUP BY cluster_id ORDER BY cluster_id
    """,
    tags=("dedup", "curation", "pipeline"),
)
def d_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection — the decision step AFTER
    duplicate clustering: each near-dup cluster keeps exactly one
    exemplar (longest document, smaller doc_id on ties) and marks the
    rest removable.  The argmax is tie-proof by integer encoding
    (n_chars * 1e6 - doc_id packs the preference into one orderable
    key), so keep/drop decisions are bit-deterministic — the property
    that makes a 100 TB dedup re-run reproduce the same corpus.

    Scale shape: rides the d_dup_clusters dataflow (df-capped shingle
    self-join edges + large-star/small-star components), then ONE
    cluster-keyed aggregate over the component assignment joined with
    the doc-metadata columns it needs (n_chars only — column pruning
    keeps the join narrow).
    """
    from map2db_spark.functions import dedup as D
    from map2db_spark.operators.components import connected_components

    docs = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 200)
    edges = D.jaccard_pairs(
        D.shingle_table(docs), threshold=0.02, df_cap=_DF_CAP
    ).select("id_a", "id_b")
    comps = connected_components(edges, src="id_a", dst="id_b")
    key = F.col("n_chars") * 1000000 - F.col("node")
    return (
        comps.join(docs.select(F.col("doc_id").alias("node"), "n_chars"), "node")
        .groupBy(F.col("comp").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("size"),
            F.max_by("node", key).cast("long").alias("keeper_id"),
            F.expr(
                "CAST(max(n_chars * 1000000 - node) DIV 1000000 AS BIGINT)"
            ).alias("keeper_chars"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_removed"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Nearest-in-time join (bidirectional as-of)
# ---------------------------------------------------------------------------


@query(
    "j_asof_nearest",
    oracle="""
    WITH err AS (
      SELECT user_id, ts, CAST(max(event_id) AS BIGINT) AS e_id
      FROM events WHERE event_type = 'error' AND user_id < 50
      GROUP BY 1, 2
    ),
    p AS (
      SELECT user_id, ts, event_id AS p_id
      FROM events WHERE event_type = 'purchase' AND user_id < 50
    )
    SELECT p.p_id, sel.e_id, sel.gap_us
    FROM p CROSS JOIN LATERAL (
      SELECT e.e_id,
             CAST(abs(epoch_us(e.ts) - epoch_us(p.ts)) AS BIGINT) AS gap_us
      FROM err e WHERE e.user_id = p.user_id
      ORDER BY abs(epoch_us(e.ts) - epoch_us(p.ts)), e.ts LIMIT 1
    ) sel
    ORDER BY p.p_id
    """,
    tags=("join", "asof", "timeseries"),
)
def j_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time join: each purchase aligns to the user's
    closest error event in EITHER direction — the telemetry/sensor
    alignment variant of as-of (backward-only j_asof_join answers
    "state at the time"; nearest answers "what happened around
    then").  Spark lacks the operator; operators/asof.py composes it
    as ONE union-sort window pass that carries both the latest prior
    and earliest following right row, then picks by exact integer
    microsecond distance (prev wins ties) — never the O(L x R)
    inequality join the naive form implies (the oracle IS that naive
    lateral form, feasible only at oracle scale).

    Scale shape: one shuffle on the join key, identical to a regular
    equi-join; rights are deduplicated per (key, ts) first so the
    carried row is direction-symmetric.
    """
    from map2db_spark.operators.asof import asof_join_nearest

    ev = Tables(spark, sf_dir).events.where(F.col("user_id") < 50)
    err = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").cast("long").alias("e_id"))
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_id")
    )
    near = asof_join_nearest(
        p, err, on="user_id", left_ts="ts", right_ts="ts", right_value_cols=["e_id"]
    )
    return near.select(
        "p_id",
        F.col("asof_e_id").alias("e_id"),
        F.abs(F.unix_micros(F.col("asof_ts")) - F.unix_micros(F.col("ts")))
        .cast("long")
        .alias("gap_us"),
    ).orderBy("p_id")


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) sub-document dedup
# ---------------------------------------------------------------------------

_CDC_W = 4       # rolling window, words
_CDC_MASK = 16   # boundary when window hash % 16 == 0 -> ~16-word chunks

# Window hash over the last 4 words: polynomial with base 31 over
# v(tok) = first 16 bits of md5(tok), precomputed ONCE per token into
# the vs array.  md5 mixing matters: a surface feature like
# len*256+ascii(first char) collapses mod 16 to the first character
# alone (256 = 0 mod 16), and a single-prefix vocabulary then makes
# EVERY position a boundary — caught by the resync property test.
# The weighted sum stays < 2^63*? (65535 * 30784 < 2^31), so no
# intermediate mod is needed and both engines compute the identical
# integer.
_CDC_V_SPARK = "element_at(vs, {j})"
_CDC_V_DUCK = "vs[{j}]"
_CDC_VS_SPARK = (
    "transform(t, x -> CAST(conv(substring(md5(x), 1, 4), 16, 10) AS BIGINT))"
)
_CDC_VS_DUCK = (
    "list_transform(t, x -> CAST(concat('0x', substr(md5(x), 1, 4)) AS BIGINT))"
)


def _cdc_hash(v: str) -> str:
    return (
        f"({v.format(j='i - 3')} * 29791 + {v.format(j='i - 2')} * 961 + "
        f"{v.format(j='i - 1')} * 31 + {v.format(j='i')})"
    )


def cdc_chunk_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> exploded (doc_id, chunk_md5) rows under
    content-defined boundaries — per-row HOFs only, no UDF, no
    shuffle.  Shared by d_cdc_chunks and the boundary-resync property
    test."""
    t = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select("doc_id", t.alias("t")).where(F.size("t") >= _CDC_W)
    bounds = base.select(
        "doc_id",
        "t",
        F.expr(_CDC_VS_SPARK).alias("vs"),
    ).select(
        "doc_id",
        "t",
        F.expr(
            f"filter(sequence({_CDC_W}, size(t)),"
            f" i -> {_cdc_hash(_CDC_V_SPARK)} % {_CDC_MASK} = 0)"
        ).alias("b"),
    )
    closed = bounds.select(
        "doc_id",
        "t",
        F.expr(
            "CASE WHEN size(b) > 0 AND element_at(b, -1) = size(t) THEN b"
            " ELSE concat(b, array(size(t))) END"
        ).alias("b2"),
    )
    return closed.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(b2)),"
                " j -> md5(array_join(slice(t,"
                " (CASE WHEN j = 1 THEN 0 ELSE element_at(b2, j - 1) END) + 1,"
                " b2[j - 1] - (CASE WHEN j = 1 THEN 0"
                "              ELSE element_at(b2, j - 1) END)), ' ')))"
            )
        ).alias("chunk_md5"),
    )


@query(
    "d_cdc_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    ),
    vtab AS (
      SELECT doc_id, t, {_CDC_VS_DUCK} AS vs
      FROM toks WHERE len(t) >= {_CDC_W}
    ),
    bounds AS (
      SELECT doc_id, t,
             list_filter(generate_series({_CDC_W}, len(t)),
                         i -> {_cdc_hash(_CDC_V_DUCK)} % {_CDC_MASK} = 0) AS b
      FROM vtab
    ),
    closed AS (
      SELECT doc_id, t,
             CASE WHEN len(b) > 0 AND b[-1] = len(t) THEN b
                  ELSE list_concat(b, [len(t)]) END AS b2
      FROM bounds
    ),
    chunks AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(b2)),
                 j -> md5(array_to_string(list_slice(t,
                        (CASE WHEN j = 1 THEN 0 ELSE b2[j - 1] END) + 1,
                        b2[j]), ' ')))) AS chunk_md5
      FROM closed
    )
    SELECT chunk_md5,
           CAST(count(*) AS BIGINT) AS n_occ,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM chunks
    GROUP BY chunk_md5 HAVING count(*) >= 2
    ORDER BY n_occ DESC, chunk_md5 LIMIT 20
    """,
    tags=("dedup", "chunking", "pipeline"),
)
def d_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (the rsync/LBFS boundary trick):
    chunk boundaries fall where a rolling window hash hits a mask, so
    they are determined by CONTENT, not position — insert one word at
    the top of a document and every downstream chunk of a fixed-span
    scheme (d_span_dedup) shifts and stops matching, while CDC
    boundaries re-synchronize within one window.  This is the
    storage-dedup primitive applied to corpus text: duplicated chunks
    across documents surface shared boilerplate/quotations at
    sub-document granularity, robust to prefix edits.

    The window hash is a base-31 polynomial over (len*256 + first
    char) of the last {_CDC_W} words — exact integers below 2^63 in
    both engines; chunks are md5'd in place by a JVM/vectorized
    higher-order transform (no UDF).

    Scale shape: boundary detection and chunk hashing are MAP-ONLY
    (per-row HOFs); the only shuffle is the chunk-keyed count with
    map-side combine — the d_span_dedup cost model with
    shift-robust boundaries.
    """
    docs = Tables(spark, sf_dir).documents
    chunks = cdc_chunk_frame(docs.repartition(spark.sparkContext.defaultParallelism))
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .where(F.col("n_occ") >= 2)
        .orderBy(F.desc("n_occ"), "chunk_md5")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities on the customer-part bipartite graph
# ---------------------------------------------------------------------------

_HITS_SCALE = 1_000_000


@query(
    "g_hits_authorities",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    h1 AS (
      SELECT c, CAST(count(*) * {_HITS_SCALE} AS BIGINT) AS hub FROM e GROUP BY c
    ),
    h1n AS (
      SELECT c, CAST(hub * {_HITS_SCALE} // (SELECT max(hub) FROM h1) AS BIGINT)
               AS hub
      FROM h1
    ),
    a1 AS (
      SELECT p, CAST(sum(h.hub) AS BIGINT) AS auth
      FROM e JOIN h1n h USING (c) GROUP BY p
    ),
    a1n AS (
      SELECT p, CAST(auth * {_HITS_SCALE} // (SELECT max(auth) FROM a1) AS BIGINT)
               AS auth
      FROM a1
    ),
    h2 AS (
      SELECT c, CAST(sum(a.auth) AS BIGINT) AS hub
      FROM e JOIN a1n a USING (p) GROUP BY c
    ),
    h2n AS (
      SELECT c, CAST(hub * {_HITS_SCALE} // (SELECT max(hub) FROM h2) AS BIGINT)
               AS hub
      FROM h2
    ),
    a2 AS (
      SELECT p, CAST(sum(h.hub) AS BIGINT) AS auth,
             CAST(count(*) AS BIGINT) AS n_buyers
      FROM e JOIN h2n h USING (c) GROUP BY p
    )
    SELECT p, auth, n_buyers
    FROM a2 ORDER BY auth DESC, p LIMIT 20
    """,
    tags=("graph", "ranking", "analytics"),
)
def g_hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (hubs & authorities) on the customer-part bipartite graph,
    two full mutual-reinforcement rounds: a part is authoritative when
    bought by strong hub customers; a customer is a strong hub when
    buying authoritative parts.  The eighth graph pattern in the
    engine — the ranking dual of PageRank for bipartite interaction
    data (recommender candidate generation).  All arithmetic is exact
    integers: scores carry a 1e6 fixed-point scale and each round
    renormalizes by truncating division by the max (the v_pca_power
    renormalize trick), so both engines agree bit-for-bit — no L2
    norm, no float accumulation.

    Scale shape per round: one edge-keyed join against the O(nodes)
    score table + one map-side-combinable aggregate; the max is an
    O(1) broadcast scalar.  Edges are checkpointed once and reused by
    all four half-rounds — the corpus-sized table never recomputes.
    """
    t = Tables(spark, sf_dir)
    e = (
        t.orders.select(F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("c"))
        .join(
            t.lineitem.select(
                F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
            ),
            "ok",
        )
        .select("c", "p")
        .distinct()
        .localCheckpoint()  # reused by all four half-rounds
    )

    def renorm(df: DataFrame, key: str, col: str) -> DataFrame:
        mx = df.agg(F.max(col).alias("mx"))
        return df.crossJoin(F.broadcast(mx)).select(
            key, F.expr(f"CAST({col} * {_HITS_SCALE} DIV mx AS BIGINT)").alias(col)
        )

    hub = renorm(
        e.groupBy("c").agg(
            (F.count(F.lit(1)) * _HITS_SCALE).cast("long").alias("hub")
        ),
        "c",
        "hub",
    )
    auth = renorm(
        e.join(hub, "c").groupBy("p").agg(F.sum("hub").cast("long").alias("auth")),
        "p",
        "auth",
    )
    hub2 = renorm(
        e.join(auth, "p").groupBy("c").agg(F.sum("auth").cast("long").alias("hub")),
        "c",
        "hub",
    )
    a2 = (
        e.join(hub2, "c")
        .groupBy("p")
        .agg(
            F.sum("hub").cast("long").alias("auth"),
            F.count(F.lit(1)).cast("long").alias("n_buyers"),
        )
    )
    return a2.orderBy(F.desc("auth"), "p").limit(20)


# ---------------------------------------------------------------------------
# Population stability index (model-monitoring drift)
# ---------------------------------------------------------------------------

_PSI_BUCKETS = 10
_PSI_WIDTH = 5000  # cents per bucket over the ~0..49k value domain


@query(
    "x_psi_drift",
    oracle=f"""
    WITH b AS (
      SELECT least(CAST(round(value * 100) AS BIGINT) // {_PSI_WIDTH},
                   {_PSI_BUCKETS - 1}) AS bucket,
             CASE WHEN epoch_us(ts) * 2 <=
                  (SELECT min(epoch_us(ts)) + max(epoch_us(ts)) FROM events)
                  THEN 1 ELSE 0 END AS first_half
      FROM events
    ),
    c AS (
      SELECT bucket,
             CAST(sum(first_half) AS BIGINT) AS c1,
             CAST(sum(1 - first_half) AS BIGINT) AS c2
      FROM b GROUP BY bucket
    ),
    t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
          FROM c)
    SELECT c.bucket, c.c1, c.c2,
           CAST(round(1000000 *
               (CAST((c1 + 1) * (n2 + {_PSI_BUCKETS}) -
                     (c2 + 1) * (n1 + {_PSI_BUCKETS}) AS DOUBLE)
                / (CAST(n1 + {_PSI_BUCKETS} AS DOUBLE)
                   * (n2 + {_PSI_BUCKETS})))
               * ln(CAST((c1 + 1) * (n2 + {_PSI_BUCKETS}) AS DOUBLE)
                    / ((c2 + 1) * (n1 + {_PSI_BUCKETS})))
           ) AS BIGINT) AS term_micro
    FROM c CROSS JOIN t
    ORDER BY c.bucket
    """,
    tags=("analytics", "drift", "ml-eval"),
)
def x_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between the first and second half of
    the event history — THE production model-monitoring drift metric
    (PSI > 0.2 conventionally triggers retraining), complementing the
    KS test: PSI weighs the whole distribution, KS the worst point.
    Per-bucket term (p-q)*ln(p/q) with Laplace smoothing is released
    micro-rounded from one shared IEEE expression (a single ln over
    an exact integer-product quotient), so the per-bucket terms and
    their sum are engine-exact integers.

    Scale shape: the time midpoint is an O(1) broadcast scalar; the
    corpus collapses to {_PSI_BUCKETS} bucket counts in one
    map-side-combinable aggregate — drift monitoring costs one scan
    regardless of volume.
    """
    ev = Tables(spark, sf_dir).events
    mid = ev.agg(
        (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))).alias("mm")
    )
    b = ev.crossJoin(F.broadcast(mid)).select(
        F.least(
            F.expr(f"CAST(round(value * 100) AS BIGINT) DIV {_PSI_WIDTH}"),
            F.lit(_PSI_BUCKETS - 1),
        ).alias("bucket"),
        F.when(F.unix_micros("ts") * 2 <= F.col("mm"), 1).otherwise(0).alias(
            "first_half"
        ),
    )
    c = b.groupBy("bucket").agg(
        F.sum("first_half").cast("long").alias("c1"),
        F.sum(1 - F.col("first_half")).cast("long").alias("c2"),
    )
    t = c.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    k = _PSI_BUCKETS
    term = F.round(
        1000000
        * (
            ((F.col("c1") + 1) * (F.col("n2") + k)
             - (F.col("c2") + 1) * (F.col("n1") + k)).cast("double")
            / ((F.col("n1") + k).cast("double") * (F.col("n2") + k))
        )
        * F.log(
            ((F.col("c1") + 1) * (F.col("n2") + k)).cast("double")
            / ((F.col("c2") + 1) * (F.col("n1") + k))
        )
    ).cast("long")
    return (
        c.crossJoin(F.broadcast(t))
        .select("bucket", "c1", "c2", term.alias("term_micro"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast evaluation (sMAPE + MAE)
# ---------------------------------------------------------------------------


@query(
    "x_smape_seasonal_naive",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT a.cents AS x, b.cents AS f
      FROM daily a JOIN daily b ON b.d = a.d - 7
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(abs(x - f)) AS BIGINT) AS mae_cents_sum,
           CAST(sum(CASE WHEN x + f = 0 THEN 0
                    ELSE CAST(round(1000000 * 2.0 * abs(x - f) / (x + f))
                         AS BIGINT) END) AS BIGINT) AS smape_micro_sum,
           CAST(sum(CASE WHEN x + f = 0 THEN 0
                    ELSE CAST(round(1000000 * 2.0 * abs(x - f) / (x + f))
                         AS BIGINT) END) // count(*) AS BIGINT) AS smape_micro
    FROM p
    """,
    tags=("analytics", "timeseries", "forecast-eval"),
)
def x_smape_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy floor: evaluate the SEASONAL-NAIVE forecast
    (tomorrow = same weekday last week) with sMAPE and MAE — the
    baseline every real forecasting model must beat, and the standard
    first row of a forecast-eval report (M-competitions convention).
    Per-day sMAPE terms 2|x-f|/(x+f) are micro-rounded individually
    (one IEEE division over exact integers), so the sums and the
    integer-divided mean are engine-exact.

    Scale shape: the corpus collapses to the O(days) daily series in
    one aggregate; the lag-7 alignment is a broadcast self-join on the
    tiny series; the eval is a 4-integer global aggregate.

    Degenerate-denominator guard (r13 static divide audit): a day
    where actual and forecast are both zero contributes the sMAPE
    convention 0 (perfect forecast of nothing) on BOTH engines rather
    than Spark raising ANSI DIVIDE_BY_ZERO on 0/0.
    """
    ev = Tables(spark, sf_dir).events
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint()  # O(days); both join sides
    )
    p = (
        daily.alias("a")
        .join(
            F.broadcast(daily.alias("b")),
            F.col("b.d") == F.date_sub(F.col("a.d"), 7),
        )
        .select(F.col("a.cents").alias("x"), F.col("b.cents").alias("f"))
    )
    term = F.when(F.col("x") + F.col("f") == 0, F.lit(0).cast("long")).otherwise(
        F.round(
            1000000
            * 2.0
            * F.abs(F.col("x") - F.col("f"))
            / (F.col("x") + F.col("f"))
        ).cast("long")
    )
    return p.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum(F.abs(F.col("x") - F.col("f"))).cast("long").alias("mae_cents_sum"),
        F.sum(term).cast("long").alias("smape_micro_sum"),
        F.expr(
            "CAST(sum(CASE WHEN x + f = 0 THEN 0"
            " ELSE CAST(round(1000000 * 2.0 * abs(x - f) / (x + f)) AS BIGINT) END)"
            " DIV count(*) AS BIGINT)"
        ).alias("smape_micro"),
    )


# ---------------------------------------------------------------------------
# MMR diversity reranking (retrieval post-processing)
# ---------------------------------------------------------------------------


def _mmr_cos(a: str, b: str) -> str:
    return (
        f"CAST(round(1000000 * list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b})))) AS BIGINT)"
    )


def _mmr_oracle() -> str:
    from map2db_spark.queries_pipeline import _ANN_INT

    return f"""
    WITH iv AS (SELECT vec_id, {_ANN_INT} AS v FROM embeddings),
    q AS (SELECT v AS qv FROM iv WHERE vec_id = 0),
    cands AS (
      SELECT vec_id, v, {_mmr_cos("qv", "v")} AS rel
      FROM iv CROSS JOIN q WHERE vec_id != 0
      ORDER BY rel DESC, vec_id LIMIT 10
    ),
    sims AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib, {_mmr_cos("a.v", "b.v")} AS sim
      FROM cands a JOIN cands b ON a.vec_id != b.vec_id
    ),
    s1 AS (SELECT vec_id, rel FROM cands ORDER BY rel DESC, vec_id LIMIT 1),
    m2 AS (
      SELECT c.vec_id, c.rel, c.rel - s.sim AS mmr
      FROM cands c JOIN sims s
        ON s.ia = c.vec_id AND s.ib = (SELECT vec_id FROM s1)
      WHERE c.vec_id != (SELECT vec_id FROM s1)
    ),
    s2 AS (SELECT vec_id, rel, mmr FROM m2 ORDER BY mmr DESC, vec_id LIMIT 1),
    sel12 AS (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2),
    m3 AS (
      SELECT c.vec_id, c.rel, c.rel - max(s.sim) AS mmr
      FROM cands c JOIN sims s
        ON s.ia = c.vec_id AND s.ib IN (SELECT vec_id FROM sel12)
      WHERE c.vec_id NOT IN (SELECT vec_id FROM sel12)
      GROUP BY c.vec_id, c.rel
    ),
    s3 AS (SELECT vec_id, rel, mmr FROM m3 ORDER BY mmr DESC, vec_id LIMIT 1)
    SELECT CAST(1 AS BIGINT) AS pick, vec_id, rel AS rel_micro,
           rel AS mmr_micro FROM s1
    UNION ALL SELECT 2, vec_id, rel, mmr FROM s2
    UNION ALL SELECT 3, vec_id, rel, mmr FROM s3
    """


@query("v_mmr_rerank", oracle=_mmr_oracle(), tags=("ann", "retrieval", "rerank"))
def v_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance reranking — the diversity
    post-processor of retrieval (RAG context selection, dedup of
    near-identical hits): after a top-10 relevance shortlist, picks
    are greedy argmax of rel - max_similarity_to_already_picked
    (lambda = 1/2 scaled out), so the second and third picks trade
    relevance for novelty.  All scores are micro-rounded cosines —
    integers — so the greedy selection (the part where a float ulp
    could flip a pick) is engine-exact, with vec_id tiebreaks.

    Scale shape: the corpus is touched ONLY by the brute shortlist
    pass (broadcast query, no corpus shuffle — swap in the LSH/IVF
    path at scale); everything after runs on the k=10 shortlist
    (O(k^2) sims), which is driver-trivial but kept distributed and
    deterministic.
    """
    from map2db_spark.functions.similarity import int_dot, int_vec

    emb = Tables(spark, sf_dir).embeddings
    iv = emb.select("vec_id", int_vec(F.col("embedding")).alias("v"))

    def cos_micro(a, b):
        return F.round(
            1000000
            * int_dot(a, b).cast("double")
            / (
                F.sqrt(int_dot(a, a).cast("double"))
                * F.sqrt(int_dot(b, b).cast("double"))
            )
        ).cast("long")

    q = iv.where(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    cands = (
        iv.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "v", cos_micro(F.col("qv"), F.col("v")).alias("rel"))
        .orderBy(F.desc("rel"), "vec_id")
        .limit(10)
        .localCheckpoint()  # k-row shortlist, base of every greedy round
    )
    sims = (
        cands.alias("a")
        .join(cands.alias("b"), F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            cos_micro(F.col("a.v"), F.col("b.v")).alias("sim"),
        )
    )
    s1 = cands.orderBy(F.desc("rel"), "vec_id").limit(1).select("vec_id", "rel")
    sel1 = s1.select(F.col("vec_id").alias("sel_id"))
    m2 = (
        cands.join(sel1.hint("broadcast"), F.col("vec_id") == F.col("sel_id"), "left_anti")
        .join(
            sims.join(sel1.hint("broadcast"), sims["ib"] == F.col("sel_id")).select(
                "ia", "sim"
            ),
            F.col("vec_id") == F.col("ia"),
        )
        .select("vec_id", "rel", (F.col("rel") - F.col("sim")).alias("mmr"))
    )
    s2 = m2.orderBy(F.desc("mmr"), "vec_id").limit(1).select("vec_id", "rel", "mmr")
    sel12 = sel1.unionByName(s2.select(F.col("vec_id").alias("sel_id")))
    m3 = (
        cands.join(sel12.hint("broadcast"), F.col("vec_id") == F.col("sel_id"), "left_anti")
        .join(
            sims.join(sel12.hint("broadcast"), sims["ib"] == F.col("sel_id")).select(
                "ia", "sim"
            ),
            F.col("vec_id") == F.col("ia"),
        )
        .groupBy("vec_id", "rel")
        .agg((F.col("rel") - F.max("sim")).alias("mmr"))
    )
    s3 = m3.orderBy(F.desc("mmr"), "vec_id").limit(1).select("vec_id", "rel", "mmr")
    return (
        s1.select(
            F.lit(1).cast("long").alias("pick"),
            "vec_id",
            F.col("rel").alias("rel_micro"),
            F.col("rel").alias("mmr_micro"),
        )
        .unionByName(
            s2.select(
                F.lit(2).cast("long").alias("pick"),
                "vec_id",
                F.col("rel").alias("rel_micro"),
                F.col("mmr").alias("mmr_micro"),
            )
        )
        .unionByName(
            s3.select(
                F.lit(3).cast("long").alias("pick"),
                "vec_id",
                F.col("rel").alias("rel_micro"),
                F.col("mmr").alias("mmr_micro"),
            )
        )
    )


# ---------------------------------------------------------------------------
# Measured recall of the MinHash-LSH dedup vs exact Jaccard
# ---------------------------------------------------------------------------


def _minhash_recall_oracle(threshold: float = 0.5) -> str:
    from map2db_spark.queries_pipeline import _minhash_cte_body

    return f"""
    {_minhash_cte_body()},
    exact AS (
      SELECT id_a, id_b
      FROM inter JOIN sizes na ON na.sid = id_a
                 JOIN sizes nb ON nb.sid = id_b
      WHERE round(shared / (na.n + nb.n - shared), 6) >= {threshold}
    )
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand,
           CAST((SELECT count(*) FROM exact JOIN cand USING (id_a, id_b))
                AS BIGINT) AS n_hit,
           CASE WHEN (SELECT count(*) FROM exact) = 0 THEN NULL
                ELSE CAST((SELECT count(*) FROM exact JOIN cand
                           USING (id_a, id_b))
                          * 1000000
                          // (SELECT count(*) FROM exact) AS BIGINT)
           END AS recall_ppm
    """


@query(
    "d_minhash_recall_eval",
    oracle=_minhash_recall_oracle(),
    tags=("dedup", "lsh", "evaluation", "pipeline"),
)
def d_minhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured RECALL of the engine's own MinHash-LSH dedup against
    exact Jaccard ground truth at threshold 0.5 — the evaluation that
    turns "we use LSH" into a dial: 8 hashes in 4 bands of 2 catch
    pairs with P = 1-(1-j^2)^4 (j=0.5 -> ~68%), so a measured recall
    in that region CONFIRMS the theory on real data, and a production
    run sizes num_hashes from this curve rather than folklore.  The
    sibling of v_ann_recall_eval for the token-similarity side.
    Counts and the ppm recall are exact integers.

    Scale shape: ground truth uses the INTENTIONALLY-UNCAPPED exact
    inverted-index join — a df cap would make the "ground truth"
    itself lossy, corrupting the very recall number this query
    measures, so this is the one registered jaccard_pairs call that
    deliberately skips the skew rail.  At 100 TB one runs this
    evaluation on a bounded SAMPLE of the corpus (the dataflow is
    identical), never on the full corpus; the LSH side is the
    production candidate dataflow and the comparison is a
    co-partitioned pair join.
    """
    from map2db_spark.functions import dedup as D

    docs = Tables(spark, sf_dir).documents
    sh = D.shingle_table(docs).localCheckpoint()  # base of both sides
    exact = D.jaccard_pairs(sh, threshold=0.5).select("id_a", "id_b")
    cand = D.lsh_candidate_pairs(
        # numeric=True: order-preserving hex->int chunk bijection (see
        # minhash_signatures) — candidate sets are value-identical, but
        # the signature aggregate plans a no-sort partial HashAggregate
        # instead of Sort+SortAggregate over the exploded shingles
        D.minhash_signatures(sh, num_hashes=8, numeric=True),
        num_hashes=8, band_size=2,
        bucket_cap=50,
    ).select("id_a", "id_b")
    hit = exact.join(cand, ["id_a", "id_b"], "left_semi")
    ne = exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    nc = cand.agg(F.count(F.lit(1)).cast("long").alias("n_cand"))
    nh = hit.agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    return (
        ne.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(nh))
        .select(
            "n_exact",
            "n_cand",
            "n_hit",
            # r13 static divide audit: an empty ground-truth set yields
            # NULL recall on BOTH engines instead of an ANSI raise
            F.expr(
                "CASE WHEN n_exact = 0 THEN NULL"
                " ELSE CAST(n_hit * 1000000 DIV n_exact AS BIGINT) END"
            ).alias("recall_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# LSH recall on a SKEWED corpus: what the bucket cap costs
# ---------------------------------------------------------------------------

_HOT_TEMPLATE = (
    "breaking update the quick brown fox jumps over the lazy dog while "
    "market analysts expect steady growth across all regional sectors "
    "this quarter according to officials familiar with the matter"
)
_SKEW_CAP = 10  # deliberately below the hot-bucket size at sf >= 0.01


def _skewed_corpus_sql() -> str:
    return f"""
    SELECT doc_id,
           CASE WHEN doc_id % 10 = 0
                THEN '{_HOT_TEMPLATE} tailword' || CAST(doc_id % 7 AS VARCHAR)
                ELSE text END AS text
    FROM documents WHERE doc_id < 300
    """


def _minhash_recall_skewed_oracle(threshold: float = 0.5) -> str:
    from map2db_spark.queries_pipeline import _minhash_cte_body

    body = _minhash_cte_body(
        bucket_cap=_SKEW_CAP,
        corpus_sql=_skewed_corpus_sql(),
        include_uncapped=True,
    )
    return f"""
    {body},
    exact AS (
      SELECT id_a, id_b
      FROM inter JOIN sizes na ON na.sid = id_a
                 JOIN sizes nb ON nb.sid = id_b
      WHERE round(shared / (na.n + nb.n - shared), 6) >= {threshold}
    )
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand_capped,
           CAST((SELECT count(*) FROM cand_nocap) AS BIGINT)
             AS n_cand_uncapped,
           CAST((SELECT count(*) FROM exact JOIN cand USING (id_a, id_b))
                AS BIGINT) AS n_hit_capped,
           CAST((SELECT count(*) FROM exact JOIN cand_nocap
                 USING (id_a, id_b)) AS BIGINT) AS n_hit_uncapped,
           CASE WHEN (SELECT count(*) FROM exact) = 0 THEN NULL
                ELSE CAST((SELECT count(*) FROM exact JOIN cand
                           USING (id_a, id_b))
                          * 1000000 // (SELECT count(*) FROM exact)
                          AS BIGINT)
           END AS recall_capped_ppm,
           CASE WHEN (SELECT count(*) FROM exact) = 0 THEN NULL
                ELSE CAST((SELECT count(*) FROM exact JOIN cand_nocap
                           USING (id_a, id_b))
                          * 1000000 // (SELECT count(*) FROM exact)
                          AS BIGINT)
           END AS recall_uncapped_ppm
    """


@query(
    "d_minhash_recall_skewed",
    oracle=_minhash_recall_skewed_oracle(),
    tags=("dedup", "lsh", "evaluation", "skew", "pipeline"),
)
def d_minhash_recall_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall on a SKEWED corpus — the price tag on bucket_cap:
    one hot template is stamped onto ~10% of documents (tail word
    varies so hot pairs are near- not exact-duplicates), making every
    band's hot bucket larger than the cap.  The capped candidate path
    (the production skew rail) then SKIPS those buckets, so this
    query reports recall with AND without the cap against exact
    Jaccard ground truth — the measured recall cost that
    d_minhash_recall_eval's uniform corpus cannot show (there the cap
    never fires and both numbers coincide).  A production run reads
    this pair: if capped recall on its skew profile is unacceptable,
    raise the cap or add bands — with evidence, not folklore.

    The exact ground-truth pair table is INTENTIONALLY UNCAPPED (a df
    cap would corrupt the measurement); the corpus is a bounded
    fixture (doc_id < 300), the same sample-bounded shape the uniform
    recall eval uses at 100 TB.
    """
    from map2db_spark.functions import dedup as D

    docs = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 300).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.lit(_HOT_TEMPLATE + " tailword"),
                (F.col("doc_id") % 7).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    sh = D.shingle_table(docs).localCheckpoint()  # base of all sides
    exact = D.jaccard_pairs(sh, threshold=0.5).select("id_a", "id_b")
    # numeric=True: the hex->int chunk bijection keeps every band key
    # equality (and so both candidate sets) value-identical while the
    # signature aggregate — hidden from the final plan by this
    # localCheckpoint but still executed — plans hash-based, no sort
    sigs = D.minhash_signatures(sh, num_hashes=8, numeric=True).localCheckpoint()
    capped = D.lsh_candidate_pairs(
        sigs, num_hashes=8, band_size=2, bucket_cap=_SKEW_CAP
    ).select("id_a", "id_b")
    uncapped = D.lsh_candidate_pairs(
        sigs, num_hashes=8, band_size=2, bucket_cap=None
    ).select("id_a", "id_b")
    ne = exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    ncc = capped.agg(F.count(F.lit(1)).cast("long").alias("n_cand_capped"))
    ncu = uncapped.agg(
        F.count(F.lit(1)).cast("long").alias("n_cand_uncapped")
    )
    nhc = exact.join(capped, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit_capped")
    )
    nhu = exact.join(uncapped, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit_uncapped")
    )
    return (
        ne.crossJoin(F.broadcast(ncc))
        .crossJoin(F.broadcast(ncu))
        .crossJoin(F.broadcast(nhc))
        .crossJoin(F.broadcast(nhu))
        .select(
            "n_exact",
            "n_cand_capped",
            "n_cand_uncapped",
            "n_hit_capped",
            "n_hit_uncapped",
            # r13 static divide audit: empty ground truth -> NULL recall
            F.expr(
                "CASE WHEN n_exact = 0 THEN NULL"
                " ELSE CAST(n_hit_capped * 1000000 DIV n_exact AS BIGINT) END"
            ).alias("recall_capped_ppm"),
            F.expr(
                "CASE WHEN n_exact = 0 THEN NULL"
                " ELSE CAST(n_hit_uncapped * 1000000 DIV n_exact AS BIGINT)"
                " END"
            ).alias("recall_uncapped_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Semantic-dedup recall on a hot embedding mode — the price tag on cell_cap
# ---------------------------------------------------------------------------


_HOTCELL_N = 240       # bounded eval sample (exact ground truth stays small)
_HOTCELL_CAP = 40      # deliberately below the planted hot-cluster size (~77)
# low threshold so ORGANIC moderate-similarity pairs count too: capped
# recall then shows the organic pairs surviving while the hot mode is
# skipped, instead of collapsing to 0-vs-100%
_HOTCELL_TAU = 0.35


def _hotcell_corpus_sql() -> str:
    """Hot-embedding-mode corpus: every third vector from vec_id 9 on
    is replaced by one near-constant template (coordinate 1 varies in
    the 4th decimal so hot pairs are near- not exact-duplicates) — the
    embedding-space analogue of d_minhash_recall_skewed's stamped text
    template.  vec_id < 9 stays organic so the k-means seeds (vec_id
    < k) are all organic and the hot mode must CAPTURE a cluster, as
    a real boilerplate mode does, rather than owning seeds."""
    return f"""
      SELECT vec_id,
             CASE WHEN vec_id % 3 = 0 AND vec_id >= 9 THEN
               list_transform(range(1, 65), i ->
                 CASE WHEN i = 1 THEN 0.5 + (vec_id % 7) * 0.001
                      ELSE 0.5 END)
             ELSE list_transform(embedding, x -> CAST(x AS DOUBLE)) END
               AS embedding
      FROM embeddings WHERE vec_id < {_HOTCELL_N}
    """


def _semdedup_recall_hotcell_oracle() -> str:
    from map2db_spark.queries_pipeline import _kmeans_cte_parts

    parts = _kmeans_cte_parts(
        k=8, iters=3, dim=64, corpus_sql=_hotcell_corpus_sql()
    )
    cos = (
        "round(list_dot_product(a.iv, b.iv)"
        " / (sqrt(list_dot_product(a.iv, a.iv))"
        " * sqrt(list_dot_product(b.iv, b.iv))), 6)"
    )
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined},
    exact AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM a3 a JOIN a3 b ON a.vec_id < b.vec_id
      WHERE {cos} >= {_HOTCELL_TAU}
    ),
    small AS (
      SELECT cid FROM a3 GROUP BY cid HAVING count(*) <= {_HOTCELL_CAP}
    ),
    railed AS (
      SELECT c.* FROM a3 c SEMI JOIN small s ON c.cid = s.cid
    ),
    hits_capped AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM railed a JOIN railed b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE {cos} >= {_HOTCELL_TAU}
    ),
    hits_uncapped AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM a3 a JOIN a3 b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE {cos} >= {_HOTCELL_TAU}
    )
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST((SELECT count(*) FROM hits_capped) AS BIGINT)
             AS n_hit_capped,
           CAST((SELECT count(*) FROM hits_uncapped) AS BIGINT)
             AS n_hit_uncapped,
           CASE WHEN (SELECT count(*) FROM exact) = 0 THEN NULL
                ELSE CAST((SELECT count(*) FROM hits_capped) * 1000000
                          // (SELECT count(*) FROM exact) AS BIGINT)
           END AS recall_capped_ppm,
           CASE WHEN (SELECT count(*) FROM exact) = 0 THEN NULL
                ELSE CAST((SELECT count(*) FROM hits_uncapped) * 1000000
                          // (SELECT count(*) FROM exact) AS BIGINT)
           END AS recall_uncapped_ppm
    """


@query(
    "d_semdedup_recall_hotcell",
    oracle=_semdedup_recall_hotcell_oracle(),
    tags=("dedup", "embedding", "evaluation", "skew", "pipeline"),
)
def d_semdedup_recall_hotcell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-dedup recall on a HOT embedding mode — the price tag on
    the cluster cap (r3 verdict item 1), mirroring what
    d_minhash_recall_skewed measures for the LSH bucket_cap: every
    third vector (outside the seed range) is replaced by one
    near-constant template (a boilerplate embedding mode), so one
    trained k-means cluster — the same quantizer c_semdedup rails —
    swells past the cap.  The capped path (the production skew rail)
    skips that cluster entirely; this query reports recall with AND
    without the cap against exact all-pairs cosine ground truth.  A
    production run reads this pair: if capped recall on its mode
    profile is unacceptable, raise the cap, retrain the quantizer, or
    route the hot mode through the LSH path — with evidence, not
    folklore.

    The exact ground-truth pair table is INTENTIONALLY UNCAPPED (a cap
    would corrupt the measurement); the corpus is a bounded fixture
    (vec_id < 240), the same sample-bounded shape the other recall
    evals use at 100 TB.  recall_uncapped also exposes the cluster-
    boundary miss rate of the method itself (pairs straddling
    clusters).
    """
    from map2db_spark.functions.clustering import kmeans_assignments

    hot = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: F.when(
            i == 1,
            F.lit(0.5) + (F.col("vec_id") % 7).cast("double") * F.lit(0.001),
        ).otherwise(F.lit(0.5)),
    )
    corpus = Tables(spark, sf_dir).embeddings.where(
        F.col("vec_id") < _HOTCELL_N
    ).select(
        "vec_id",
        F.when((F.col("vec_id") % 3 == 0) & (F.col("vec_id") >= 9), hot)
        .otherwise(F.col("embedding").cast("array<double>"))
        .alias("embedding"),
    )
    a = kmeans_assignments(corpus, k=8, iters=3, dim=64).persist()
    small = (
        a.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("csz"))
        .where(F.col("csz") <= _HOTCELL_CAP)
        .select("cid")
    )
    railed = a.join(small, ["cid"], "left_semi")

    dot = F.aggregate(
        F.zip_with("xiv", "yiv", lambda p, q: p * q),
        F.lit(0).cast("long"),
        lambda s, t: s + t,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.zip_with(c, c, lambda p, q: p * q),
            F.lit(0).cast("long"),
            lambda s, t: s + t,
        ).cast("double")
    )
    cos = F.round(dot.cast("double") / (norm("xiv") * norm("yiv")), 6)

    def pairs(side: DataFrame, within_cluster: bool) -> DataFrame:
        x = side.select(F.col("vid").alias("u"), F.col("iv").alias("xiv"),
                        "cid")
        y = side.select(F.col("vid").alias("v"), F.col("iv").alias("yiv"),
                        F.col("cid").alias("ycid"))
        cond = [x["u"] < y["v"]]
        if within_cluster:
            cond.append(x["cid"] == y["ycid"])
        joined = x.join(y, cond[0] if len(cond) == 1 else cond[0] & cond[1])
        return joined.where(cos >= _HOTCELL_TAU).select("u", "v")

    exact = pairs(a, within_cluster=False)
    capped = pairs(railed, within_cluster=True)
    uncapped = pairs(a, within_cluster=True)
    ne = exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    nhc = capped.agg(F.count(F.lit(1)).cast("long").alias("n_hit_capped"))
    nhu = uncapped.agg(F.count(F.lit(1)).cast("long").alias("n_hit_uncapped"))
    return (
        ne.crossJoin(F.broadcast(nhc))
        .crossJoin(F.broadcast(nhu))
        .select(
            "n_exact",
            "n_hit_capped",
            "n_hit_uncapped",
            # r13 static divide audit: empty ground truth -> NULL recall
            F.expr(
                "CASE WHEN n_exact = 0 THEN NULL"
                " ELSE CAST(n_hit_capped * 1000000 DIV n_exact AS BIGINT) END"
            ).alias("recall_capped_ppm"),
            F.expr(
                "CASE WHEN n_exact = 0 THEN NULL"
                " ELSE CAST(n_hit_uncapped * 1000000 DIV n_exact AS BIGINT)"
                " END"
            ).alias("recall_uncapped_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction interval for the seasonal-naive forecast
# ---------------------------------------------------------------------------


@query(
    "x_conformal_interval",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT a.d, abs(a.cents - b.cents) AS resid
      FROM daily a JOIN daily b ON b.d = a.d - 7
    ),
    lim AS (
      SELECT min(d) AS d0, max(d) AS d1 FROM p
    ),
    split AS (
      SELECT p.d, p.resid,
             CASE WHEN (p.d - l.d0) * 2 <= (l.d1 - l.d0) THEN 1 ELSE 0 END
               AS cal
      FROM p CROSS JOIN lim l
    ),
    calr AS (
      SELECT resid,
             row_number() OVER (ORDER BY resid) AS rn,
             count(*) OVER () AS n
      FROM split WHERE cal = 1
    ),
    q AS (
      SELECT CAST(max(n) AS BIGINT) AS n_cal,
             CAST(max(CASE WHEN rn = least((n * 9 + 18) // 10, n)
                           THEN resid END) AS BIGINT) AS q_hat
      FROM calr
    )
    SELECT q.n_cal, q.q_hat,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN s.resid <= q.q_hat THEN 1 ELSE 0 END) AS BIGINT)
             AS n_covered
    FROM split s CROSS JOIN q
    WHERE s.cal = 0
    GROUP BY q.n_cal, q.q_hat
    """,
    tags=("analytics", "ml-eval", "uncertainty"),
)
def x_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval around the seasonal-naive
    forecast: calibrate the 90% residual quantile q_hat = the
    ceil(0.9*(n+1))-th order statistic of |x - f| on the FIRST half
    of days, then measure empirical coverage (resid <= q_hat) on the
    second half — distribution-free uncertainty quantification, the
    finite-sample guarantee (coverage >= 90% in expectation) that
    model-agnostic forecasting pipelines ship with their point
    predictions.  All quantities — the nearest-rank quantile, the
    split, the coverage counts — are exact integers.

    Scale shape: the corpus collapses to the O(days) series; the
    calibration quantile is one rank window over that series; the
    coverage check is a broadcast of one (q_hat) row.  Conformal
    calibration at 100 TB is series- or residual-sample-sized, never
    corpus-sized.
    """
    ev = Tables(spark, sf_dir).events
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint()  # O(days); both join sides
    )
    p = (
        daily.alias("a")
        .join(F.broadcast(daily.alias("b")), F.col("b.d") == F.date_sub(F.col("a.d"), 7))
        .select(
            F.col("a.d").alias("d"),
            F.abs(F.col("a.cents") - F.col("b.cents")).alias("resid"),
        )
    )
    lim = p.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    split = p.crossJoin(F.broadcast(lim)).select(
        "d",
        "resid",
        F.when(
            F.datediff(F.col("d"), F.col("d0")) * 2
            <= F.datediff(F.col("d1"), F.col("d0")),
            1,
        )
        .otherwise(0)
        .alias("cal"),
    )
    from pyspark.sql.window import Window as W

    calr = (
        split.where(F.col("cal") == 1)
        .select(
            "resid",
            F.row_number().over(W.orderBy("resid")).alias("rn"),
            F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
        )
    )
    q = calr.agg(
        F.max("n").cast("long").alias("n_cal"),
        F.max(
            F.when(
                F.col("rn") == F.least(F.expr("(n * 9 + 18) DIV 10"), F.col("n")),
                F.col("resid"),
            )
        )
        .cast("long")
        .alias("q_hat"),
    )
    return (
        split.where(F.col("cal") == 0)
        .crossJoin(F.broadcast(q))
        .groupBy("n_cal", "q_hat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(F.when(F.col("resid") <= F.col("q_hat"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
        )
    )


# ---------------------------------------------------------------------------
# WebP frame-geometry decode (real RIFF chunk walk, stdlib only)
# ---------------------------------------------------------------------------


@query(
    "m_webp_dims",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(20 + (doc_id % 11) * 5 AS INTEGER) AS width,
           CAST(10 + (doc_id % 6) * 7 AS INTEGER) AS height,
           CASE doc_id % 3 WHEN 0 THEN 'VP8 ' WHEN 1 THEN 'VP8L'
                ELSE 'VP8X' END AS layout,
           CAST(1 AS INTEGER) AS n_chunks,
           CAST(CASE doc_id % 3 WHEN 0 THEN 40 WHEN 1 THEN 36 ELSE 30 END
                AS INTEGER) AS n_bytes
    FROM documents WHERE doc_id < 45
    """,
    tags=("multimodal", "image", "metadata"),
)
def m_webp_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WebP metadata decode across all three container layouts:
    lossy VP8 (sync-coded u16 dims), lossless VP8L (28-bit LSB-first
    packing), extended VP8X (24-bit canvas) — fabricated in-kernel
    with closed-form geometry and walked by functions/webp.py's RIFF
    chunk parser.  Together with m_jpeg_dims and m_png_decode this
    closes the metadata pass over the three dominant web image
    formats; WebP pixel decode keeps its honest stub (needs a VP8
    codec).  The oracle recomputes geometry, layout, and container
    byte length from the closed form, value-verifying the chunk walk
    (sizes, padding, per-layout bit packing) end to end.

    Scale shape: one map-only mapInPandas pass; the walker reads only
    chunk headers — metadata extraction over an image corpus is
    I/O-bound, not CPU-bound.
    """
    from map2db_spark.functions.multimodal import (
        documents_as_webp_media,
        extract_webp_dims,
    )

    docs = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 45)
    return extract_webp_dims(documents_as_webp_media(docs))


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test (randomness of the daily series)
# ---------------------------------------------------------------------------

# shared verbatim by the DuckDB oracle and the Spark F.expr, so the
# degenerate-variance guard (r13 static divide audit) binds both
# engines at once: n1*n2*(2*n1*n2 - n1 - n2) = 0 exactly when a side
# is empty or n1 = n2 = 1 — the cases where the z variance is zero
# and Spark ANSI would raise where DuckDB yields NULL/inf
_RUNS_Z = """
    CASE WHEN n1 * n2 * (2 * n1 * n2 - n1 - n2) = 0 THEN NULL
    ELSE CAST(round(1000000 * (
        (CAST(runs AS DOUBLE)
         - (2.0 * n1 * n2 / (CAST(n1 AS DOUBLE) + n2) + 1.0))
        / sqrt(
            2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
            / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2)
               * (CAST(n1 AS DOUBLE) + n2 - 1.0))
        )
    )) AS BIGINT) END"""


@query(
    "x_runs_test",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    r1 AS (
      SELECT d, cents,
             row_number() OVER (ORDER BY cents) AS rn,
             count(*) OVER () AS n
      FROM daily
    ),
    med AS (
      SELECT CAST(sum(cents * (
          (CASE WHEN rn = (n + 1) // 2 THEN 1 ELSE 0 END)
        + (CASE WHEN rn = n // 2 + 1 THEN 1 ELSE 0 END))) AS BIGINT) AS med2
      FROM r1
    ),
    s AS (
      SELECT d, CASE WHEN 2 * cents > med2 THEN 1 ELSE 0 END AS above
      FROM daily CROSS JOIN med
      WHERE 2 * cents != med2
    ),
    runs_t AS (
      SELECT above,
             CASE WHEN lag(above) OVER (ORDER BY d) IS NULL
                  OR lag(above) OVER (ORDER BY d) != above
                  THEN 1 ELSE 0 END AS new_run
      FROM s
    ),
    c AS (
      SELECT CAST(sum(above) AS BIGINT) AS n1,
             CAST(sum(1 - above) AS BIGINT) AS n2,
             CAST(sum(new_run) AS BIGINT) AS runs
      FROM runs_t
    )
    SELECT n1, n2, runs, {_RUNS_Z} AS z_micro FROM c
    """,
    tags=("analytics", "statistics", "randomness"),
)
def x_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily revenue series: is the
    above/below-median sequence random, or does it trend/cluster
    (too few runs) or oscillate (too many)?  The randomness
    diagnostic that catches serial dependence ACF's linear
    correlation can miss.  Median comparison uses the doubled order
    statistic (2c vs med2 — exact, tie rows excluded exactly); run
    boundaries come from one lag window; z is released micro-scaled
    from one shared IEEE expression over the three integer counts.

    Scale shape: corpus -> O(days) series in one aggregate; both
    windows run at series scale.  The median over an unbounded
    series swaps to the histogram two-pass locate, semantics
    unchanged.
    """
    from map2db_spark.queries_round3 import _MED2  # noqa: F401 (doc link)
    from pyspark.sql.window import Window as W

    ev = Tables(spark, sf_dir).events
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint()  # O(days); median + sign passes
    )
    r1 = daily.select(
        "cents",
        F.row_number().over(W.orderBy("cents")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    pick = (
        F.when(F.col("rn") == F.expr("(n + 1) div 2"), 1).otherwise(0)
        + F.when(F.col("rn") == F.expr("n div 2 + 1"), 1).otherwise(0)
    )
    med = r1.agg(F.sum(F.col("cents") * pick).cast("long").alias("med2"))
    s = (
        daily.crossJoin(F.broadcast(med))
        .where(2 * F.col("cents") != F.col("med2"))
        .select(
            "d", F.when(2 * F.col("cents") > F.col("med2"), 1).otherwise(0).alias("above")
        )
    )
    lagged = s.select(
        "above",
        F.when(
            F.lag("above").over(W.orderBy("d")).isNull()
            | (F.lag("above").over(W.orderBy("d")) != F.col("above")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    c = lagged.agg(
        F.sum("above").cast("long").alias("n1"),
        F.sum(1 - F.col("above")).cast("long").alias("n2"),
        F.sum("new_run").cast("long").alias("runs"),
    )
    return c.select("n1", "n2", "runs", F.expr(_RUNS_Z).alias("z_micro"))


# ---------------------------------------------------------------------------
# Local clustering coefficient over the co-purchase graph
# ---------------------------------------------------------------------------

_CC_DEG_CAP = 64


@query(
    "g_clustering_coefficient",
    oracle=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    e AS (
      SELECT x.p AS u, y.p AS v
      FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    adj AS (
      SELECT u AS w, v AS x FROM e UNION ALL SELECT v AS w, u AS x FROM e
    ),
    deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY w),
    tri AS (
      SELECT a.w AS node, CAST(count(*) AS BIGINT) AS n_tri
      FROM adj a
      JOIN adj b ON a.w = b.w AND a.x < b.x
      JOIN e ON e.u = a.x AND e.v = b.x
      JOIN deg dd ON dd.w = a.w
      WHERE dd.d <= {_CC_DEG_CAP}
      GROUP BY a.w
    )
    SELECT deg.w AS node, deg.d AS degree,
           CAST(coalesce(tri.n_tri, 0) AS BIGINT) AS n_tri,
           CAST(coalesce(tri.n_tri, 0) * 2 * 1000000
                // (deg.d * (deg.d - 1)) AS BIGINT) AS coeff_ppm
    FROM deg LEFT JOIN tri ON tri.node = deg.w
    WHERE deg.d BETWEEN 2 AND {_CC_DEG_CAP}
    ORDER BY coeff_ppm DESC, node LIMIT 25
    """,
    tags=("graph", "analytics"),
)
def g_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node — how much of each
    node's neighborhood is itself connected (2*tri / deg*(deg-1)),
    the community-structure statistic that separates tightly-knit
    product families from hub-and-spoke accessories.  Complements the
    global triangle count (g_triangle_count) with the per-node view.
    Exact integers throughout: triangle counts via neighbor-pair
    wedges closed against the edge set, coefficient as integer ppm.

    Scale shape: wedges generate per CENTER with the explicit
    deg <= {_CC_DEG_CAP} rail (a deg-d center emits d^2/2 wedges);
    the closure check joins the wedge against the edge table on the
    (a, b) pair key — co-partitioned with the pair aggregation.  Hub
    coefficients, when needed, come from degree-ordered orientation
    (the g_triangle_count dataflow) rather than raw wedges.
    """
    li = (
        Tables(spark, sf_dir)
        .lineitem.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e = (
        li.alias("x")
        .join(li.alias("y"), (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")))
        .groupBy(F.col("x.p").alias("u"), F.col("y.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
        .select("u", "v")
        .localCheckpoint()  # adjacency + closure branches
    )
    adj = e.select(F.col("u").alias("w"), F.col("v").alias("x")).unionAll(
        e.select(F.col("v").alias("w"), F.col("u").alias("x"))
    )
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("d"))
    degc = deg.where(F.col("d") <= _CC_DEG_CAP).select(
        F.col("w").alias("dw"), "d"
    )
    tri = (
        adj.alias("a")
        .join(adj.alias("b"), (F.col("a.w") == F.col("b.w")) & (F.col("a.x") < F.col("b.x")))
        .join(degc.hint("broadcast"), F.col("a.w") == F.col("dw"))
        .join(e.alias("e"), (F.col("e.u") == F.col("a.x")) & (F.col("e.v") == F.col("b.x")))
        .groupBy(F.col("a.w").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    out = (
        deg.where((F.col("d") >= 2) & (F.col("d") <= _CC_DEG_CAP))
        .join(tri, F.col("w") == F.col("node"), "left")
        .select(
            F.col("w").alias("node"),
            F.col("d").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
            F.expr(
                "CAST(coalesce(n_tri, 0) * 2 * 1000000 DIV (d * (d - 1))"
                " AS BIGINT)"
            ).alias("coeff_ppm"),
        )
    )
    return out.orderBy(F.desc("coeff_ppm"), "node").limit(25)


# ---------------------------------------------------------------------------
# Binary quantization retrieval: sign-bit pack + Hamming prefilter + rerank
# ---------------------------------------------------------------------------


def _bq_word_duck(lo: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN v[{lo + b + 1}] > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(32)
    )
    return f"CAST({terms} AS BIGINT)"


def _bq_word_spark(lo: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN element_at(v, {lo + b + 1}) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(32)
    )
    return f"CAST({terms} AS BIGINT)"


@query(
    "v_binary_quantization",
    oracle=f"""
    WITH iv AS (
      SELECT vec_id,
             list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
      FROM embeddings
    ),
    packed AS (
      SELECT vec_id, v, {_bq_word_duck(0)} AS w0, {_bq_word_duck(32)} AS w1
      FROM iv
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, w0 AS qw0, w1 AS qw1
          FROM packed WHERE vec_id < 3),
    ham AS (
      SELECT q.query_id, c.vec_id AS cand_id, c.v AS cv, q.qv,
             CAST(bit_count(xor(c.w0, q.qw0))
                  + bit_count(xor(c.w1, q.qw1)) AS BIGINT) AS hamming
      FROM packed c CROSS JOIN q WHERE c.vec_id != q.query_id
    ),
    short AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY hamming, cand_id) AS hrank
        FROM ham
      ) WHERE hrank <= 20
    ),
    rer AS (
      SELECT query_id, cand_id, hamming,
             CAST(round(1000000 * list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv))
                    * sqrt(list_dot_product(cv, cv)))) AS BIGINT) AS cos_micro
      FROM short
    )
    SELECT query_id, cand_id, hamming, cos_micro, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_micro DESC, cand_id) AS rank
      FROM rer
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    tags=("ann", "quantization", "retrieval"),
)
def v_binary_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization retrieval — the 64x-compression pattern
    modern vector stores ship (sign-bit embeddings + Hamming
    prefilter + exact rerank): each 64-dim vector packs its sign
    bits into two 32-bit words; candidate generation scans ONLY the
    16-byte codes by Hamming distance (bit_count(xor)); the top-20
    shortlist is then reranked by exact integer-scaled cosine.
    Complements v_int8_quantization (8-bit fidelity) and v_pq_adc
    (codebook ADC) as the third quantization regime.  All scores are
    integers — Hamming exactly, cosine micro-rounded.

    Scale shape: the Hamming scan touches 16 bytes/vector with the
    query codes broadcast — no corpus shuffle, and at 100 TB the
    packed codes fit ~64x more vectors per executor page; full
    vectors are fetched only for the k=20 shortlist (here carried
    inline; at scale a by-id join back).
    """
    from map2db_spark.functions.similarity import int_dot, int_vec
    from pyspark.sql.window import Window as W

    emb = Tables(spark, sf_dir).embeddings
    packed = emb.select(
        "vec_id", int_vec(F.col("embedding")).alias("v")
    ).select(
        "vec_id",
        "v",
        F.expr(_bq_word_spark(0)).alias("w0"),
        F.expr(_bq_word_spark(32)).alias("w1"),
    )
    q = packed.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
    )
    ham = (
        packed.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.col("v").alias("cv"),
            "qv",
            (
                F.bit_count(F.expr("w0 ^ qw0")) + F.bit_count(F.expr("w1 ^ qw1"))
            )
            .cast("long")
            .alias("hamming"),
        )
    )
    short = (
        ham.withColumn(
            "hrank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy("hamming", "cand_id")
            ),
        )
        .where(F.col("hrank") <= 20)
    )
    cos = F.round(
        1000000
        * int_dot(F.col("qv"), F.col("cv")).cast("double")
        / (
            F.sqrt(int_dot(F.col("qv"), F.col("qv")).cast("double"))
            * F.sqrt(int_dot(F.col("cv"), F.col("cv")).cast("double"))
        )
    ).cast("long")
    rer = short.select(
        "query_id", "cand_id", "hamming", cos.alias("cos_micro")
    )
    return (
        rer.withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.desc("cos_micro"), "cand_id")
            ),
        )
        .where(F.col("rank") <= 5)
        .select("query_id", "cand_id", "hamming", "cos_micro",
                F.col("rank").cast("int").alias("rank"))
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the co-purchase graph
# ---------------------------------------------------------------------------


@query(
    "g_degree_assortativity",
    oracle=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    e AS (
      SELECT x.p AS u, y.p AS v
      FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    adj AS (
      SELECT u AS w, v AS x FROM e UNION ALL SELECT v AS w, u AS x FROM e
    ),
    deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY w),
    ends AS (
      SELECT da.d AS dx, db.d AS dy
      FROM adj JOIN deg da ON da.w = adj.w JOIN deg db ON db.w = adj.x
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
             CAST(sum(dx * dy) AS BIGINT) AS sxy,
             CAST(sum(dx * dx) AS BIGINT) AS sxx,
             CAST(sum(dy * dy) AS BIGINT) AS syy
      FROM ends
    )
    SELECT n, {_SPEARMAN_RHO} AS r_micro FROM m
    """,
    tags=("graph", "analytics", "statistics"),
)
def g_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: the Pearson
    correlation of endpoint degrees over all directed edge instances
    — positive means hubs link to hubs (social-network shape),
    negative means hubs link to leaves (star/dependency shape); it
    predicts how the graph fragments under node removal and how skew
    concentrates in edge-keyed joins.  Exact BIGINT moments over the
    symmetrized edge list; r released micro-scaled through the shared
    IEEE Pearson expression.

    Scale shape: the degree table joins back onto the edge list by
    each endpoint (two co-partitioned joins on node keys), then one
    map-side-combinable moment aggregate — no wedges, no pair
    explosion.
    """
    li = (
        Tables(spark, sf_dir)
        .lineitem.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e = (
        li.alias("x")
        .join(li.alias("y"), (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")))
        .groupBy(F.col("x.p").alias("u"), F.col("y.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
        .select("u", "v")
    )
    adj = e.select(F.col("u").alias("w"), F.col("v").alias("x")).unionAll(
        e.select(F.col("v").alias("w"), F.col("u").alias("x"))
    ).localCheckpoint()
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("d"))
    da = deg.select(F.col("w").alias("wa"), F.col("d").alias("dx"))
    db = deg.select(F.col("w").alias("wb"), F.col("d").alias("dy"))
    ends = (
        adj.join(da, F.col("w") == F.col("wa"))
        .join(db, F.col("x") == F.col("wb"))
        .select("dx", "dy")
    )
    m = ends.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
    )
    return m.select("n", F.expr(_SPEARMAN_RHO).alias("r_micro"))


# ---------------------------------------------------------------------------
# Incremental dedup: new shard vs existing signature index
# ---------------------------------------------------------------------------

_INC_SPLIT = 400


def _incremental_dedup_oracle() -> str:
    from map2db_spark.queries_pipeline import _SHINGLES_SQL

    mins = ", ".join(
        f"min(substr(md5(shingle), {i * 4 + 1}, 4)) AS mh{i}" for i in range(8)
    )
    band_cols = ", ".join(
        f"concat_ws('#', mh{b * 2}, mh{b * 2 + 1}) AS band{b}" for b in range(4)
    )
    band_long = "\n      UNION ALL ".join(
        f"SELECT sid, is_new, {b} AS band_idx, band{b} AS bk FROM bands"
        for b in range(4)
    )
    return f"""
    WITH sh AS (
      SELECT doc_id AS sid,
             CASE WHEN doc_id >= {_INC_SPLIT} THEN 1 ELSE 0 END AS is_new,
             unnest({_SHINGLES_SQL}) AS shingle
      FROM documents
    ),
    sig AS (SELECT sid, max(is_new) AS is_new, {mins} FROM sh GROUP BY sid),
    bands AS (SELECT sid, is_new, {band_cols} FROM sig),
    bl AS (
      {band_long}
    ),
    cand AS (
      SELECT DISTINCT n.sid AS new_id, o.sid AS hit_id,
             CASE WHEN o.is_new = 1 THEN 'batch' ELSE 'index' END AS side
      FROM bl n JOIN bl o
        ON n.band_idx = o.band_idx AND n.bk = o.bk
       AND n.is_new = 1 AND (o.is_new = 0 OR o.sid < n.sid)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_candidate_pairs,
           CAST(count(DISTINCT new_id) AS BIGINT) AS n_new_docs_hit,
           CAST(sum(CASE WHEN side = 'index' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_vs_index,
           CAST(sum(CASE WHEN side = 'batch' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_within_batch
    FROM cand
    """


@query(
    "d_incremental_dedup",
    oracle=_incremental_dedup_oracle(),
    tags=("dedup", "lsh", "incremental", "pipeline"),
)
def d_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the operational shape of corpus ingestion:
    a new shard (doc_id >= {_INC_SPLIT}) is checked against the
    EXISTING corpus's persisted signature index plus itself, without
    recomputing anything for the old corpus beyond reading its band
    table.  Candidates split into vs-index hits (new doc duplicates
    something already ingested -> drop it) and within-batch hits
    (both docs arrived in this shard -> cluster then keep one).  At
    100 TB this is the difference between an O(shard) nightly job and
    an O(corpus) one; the band table IS the dedup index, partitioned
    by (band, key) so a shard's probes touch only its buckets.

    Exact integer candidate accounting; the signature/band dataflow
    is the production d_minhash_lsh one on both sides.
    """
    from map2db_spark.functions import dedup as D

    docs = Tables(spark, sf_dir).documents
    old = docs.where(F.col("doc_id") < _INC_SPLIT)
    new = docs.where(F.col("doc_id") >= _INC_SPLIT)

    def band_table(d: DataFrame) -> DataFrame:
        # numeric=True: hex->int chunk bijection — band keys stay
        # equality-identical, the signature min plans hash-based
        sig = D.minhash_signatures(
            D.shingle_table(d), num_hashes=8, numeric=True
        )
        bands = sig.select(
            F.col("sid"),
            *[
                F.concat_ws(
                    "#", F.col(f"mh{b * 2}"), F.col(f"mh{b * 2 + 1}")
                ).alias(f"band{b}")
                for b in range(4)
            ],
        )
        out = None
        for b in range(4):
            part = bands.select(
                "sid", F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("bk")
            )
            out = part if out is None else out.unionByName(part)
        return out

    idx = band_table(old)   # at scale: read from the persisted index
    nb = band_table(new).localCheckpoint()  # probe side, reused twice
    vs_index = (
        nb.join(idx, ["band_idx", "bk"])
        .select(nb["sid"].alias("new_id"), idx["sid"].alias("hit_id"))
        .distinct()
        .select("new_id", "hit_id", F.lit("index").alias("side"))
    )
    within = (
        nb.alias("n")
        .join(
            nb.alias("o"),
            (F.col("n.band_idx") == F.col("o.band_idx"))
            & (F.col("n.bk") == F.col("o.bk"))
            & (F.col("o.sid") < F.col("n.sid")),
        )
        .select(F.col("n.sid").alias("new_id"), F.col("o.sid").alias("hit_id"))
        .distinct()
        .select("new_id", "hit_id", F.lit("batch").alias("side"))
    )
    cand = vs_index.unionByName(within)
    return cand.agg(
        F.count("*").cast("long").alias("n_candidate_pairs"),
        F.countDistinct("new_id").cast("long").alias("n_new_docs_hit"),
        F.sum(F.when(F.col("side") == "index", 1).otherwise(0))
        .cast("long")
        .alias("n_vs_index"),
        F.sum(F.when(F.col("side") == "batch", 1).otherwise(0))
        .cast("long")
        .alias("n_within_batch"),
    )


# ---------------------------------------------------------------------------
# Parquet schema evolution (mergeSchema read over mixed-schema shards)
# ---------------------------------------------------------------------------


@query(
    "f_schema_evolution",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN doc_id < 250 THEN n_chars ELSE NULL END)
                AS BIGINT) AS v1_chars,
           CAST(count(CASE WHEN doc_id >= 250 THEN 1 END) AS BIGINT)
             AS n_v2_rows
    FROM documents GROUP BY lang
    """,
    tags=("functions", "formats", "schema-evolution"),
)
def f_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet shards: generation v1 wrote
    (doc_id, lang, n_chars); generation v2 added a quality column and
    DROPPED n_chars.  Reading the directory with mergeSchema=true
    unions the schemas — v1 rows carry NULL quality, v2 rows NULL
    n_chars — exactly the long-lived-dataset reality a 100 TB lake
    accumulates.  The aggregate proves NULL containment per
    generation (v1 chars sum excludes v2 rows by construction).
    Scale note: mergeSchema reads every file FOOTER at planning time
    — fine per-directory, expensive over 10^6 files; production pins
    the merged schema explicitly after evolution events, which is why
    the read also passes an explicit schema check here.
    """
    import tempfile

    docs = Tables(spark, sf_dir).documents
    tmp = tempfile.mkdtemp(prefix="m2db_schevo_")
    docs.where(F.col("doc_id") < 250).select("doc_id", "lang", "n_chars").write.mode(
        "overwrite"
    ).parquet(tmp + "/g=v1")
    docs.where(F.col("doc_id") >= 250).select(
        "doc_id", "lang", (F.col("n_chars") % 100).alias("quality")
    ).write.mode("overwrite").parquet(tmp + "/g=v2")
    merged = spark.read.option("mergeSchema", True).parquet(
        tmp + "/g=v1", tmp + "/g=v2"
    )
    assert set(merged.columns) == {"doc_id", "lang", "n_chars", "quality"}
    return _cleanup_roundtrip(
        merged.groupBy("lang").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("v1_chars"),
            F.count("quality").cast("long").alias("n_v2_rows"),
        ),
        tmp,
    )


# ---------------------------------------------------------------------------
# Dynamic partition overwrite (replace only touched partitions)
# ---------------------------------------------------------------------------


@query(
    "f_dynamic_partition_overwrite",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN lang = 'en' THEN n_chars * 2 ELSE n_chars END)
                AS BIGINT) AS chars_after
    FROM documents GROUP BY lang
    """,
    tags=("functions", "formats", "sink", "lakehouse"),
)
def f_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the lakehouse upsert-by-partition
    idiom: a corrected 'en' slice is written with mode=overwrite
    under partitionOverwriteMode=dynamic, which replaces ONLY the
    lang=en partition and leaves every other partition's files
    untouched (static mode would have truncated the whole table —
    the classic data-loss footgun this setting exists to prevent).
    The read-back aggregate proves exactly the en rows changed
    (doubled n_chars) while all other partitions survived.

    Scale shape: partitioned layout + dynamic overwrite is how a
    100 TB table takes daily corrections without rewriting itself;
    the overwritten unit is the partition directory, so the job cost
    is O(corrected slice).
    """
    import tempfile

    docs = Tables(spark, sf_dir).documents.select("doc_id", "lang", "n_chars")
    tmp = tempfile.mkdtemp(prefix="m2db_dpo_")
    docs.write.mode("overwrite").partitionBy("lang").parquet(tmp)
    fixed_en = docs.where(F.col("lang") == "en").select(
        "doc_id", "lang", (F.col("n_chars") * 2).alias("n_chars")
    )
    fixed_en.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("lang").parquet(tmp)
    back = spark.read.parquet(tmp)
    return _cleanup_roundtrip(
        back.groupBy("lang").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("chars_after"),
        ),
        tmp,
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test on the daily series
# ---------------------------------------------------------------------------

_MK_Z = """
    CAST(round(1000000 * (
        CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
             WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
             ELSE 0.0 END
    )) AS BIGINT)"""


@query(
    "x_mann_kendall",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN b.cents > a.cents THEN 1
                  WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b ON b.d > a.d
    ),
    ties AS (
      SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY cents
    ),
    c AS (
      SELECT (SELECT CAST(sum(sgn) AS BIGINT) FROM pairs) AS s,
             (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n,
             (SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) FROM ties)
               AS tie18
    ),
    v AS (
      SELECT s, n, CAST(n * (n - 1) * (2 * n + 5) - tie18 AS BIGINT) AS var18
      FROM c
    )
    SELECT n, s, var18, {_MK_Z} AS z_micro FROM v
    """,
    tags=("analytics", "timeseries", "statistics"),
)
def x_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test: S = sum of sign(x_j - x_i) over all
    day pairs i < j — the standard nonparametric monotone-trend
    detector (hydrology/ops-monitoring canon), robust where OLS slope
    (x_group_linreg) is pulled by outliers.  S, n, and the
    tie-corrected variance numerator var18 = n(n-1)(2n+5) - sum
    t(t-1)(2t+5) are exact integers; z (with the +-1 continuity
    correction) is one shared IEEE expression.

    Scale shape: the corpus collapses to the O(days) series first;
    the O(days^2) pair comparison runs on series-scale data (a
    broadcast self-join).  For series too long for pairs, S converts
    to a rank formulation (one window) with identical semantics.
    """
    ev = Tables(spark, sf_dir).events
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint()
    )
    pairs = (
        daily.alias("a")
        .join(F.broadcast(daily.alias("b")), F.col("b.d") > F.col("a.d"))
        .select(
            F.when(F.col("b.cents") > F.col("a.cents"), 1)
            .when(F.col("b.cents") < F.col("a.cents"), -1)
            .otherwise(0)
            .alias("sgn")
        )
    )
    s = pairs.agg(F.sum("sgn").cast("long").alias("s"))
    n = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    tie18 = (
        daily.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("long")
            .alias("tie18")
        )
    )
    v = (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(tie18))
        .select(
            "s",
            "n",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie18")
            )
            .cast("long")
            .alias("var18"),
        )
    )
    return v.select("n", "s", "var18", F.expr(_MK_Z).alias("z_micro"))


# ---------------------------------------------------------------------------
# Maximum drawdown of cumulative daily revenue
# ---------------------------------------------------------------------------


@query(
    "w_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT))
                  - 350000 AS BIGINT) AS delta
      FROM events GROUP BY 1
    ),
    cum AS (
      SELECT d, sum(delta) OVER (ORDER BY d) AS level
      FROM daily
    ),
    dd AS (
      SELECT d, level,
             max(level) OVER (ORDER BY d) AS peak
      FROM cum
    )
    SELECT CAST(max(peak - level) AS BIGINT) AS max_drawdown_cents,
           CAST(max(CASE WHEN peak - level =
                 (SELECT max(peak - level) FROM dd) THEN d END) AS DATE)
             AS trough_day,
           CAST(max(peak) AS BIGINT) AS peak_level_cents
    FROM dd
    """,
    tags=("analytics", "timeseries", "window"),
)
def w_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the demeaned cumulative daily revenue —
    the largest peak-to-trough fall, THE risk statistic of any
    cumulative metric (P&L, cache hit budget, error-budget burn).
    Classic two-window composition: running sum -> running max ->
    max gap, all in exact integer cents (the daily deltas are
    centered by a constant so the cumulative path actually goes up
    AND down on this data).  Trough day reported with a
    deterministic latest-day tiebreak.

    Scale shape: corpus -> O(days) series, then two ordered windows
    over the series (range-partitioned two-pass prefix form for
    unbounded series, operators/ids.py).
    """
    from pyspark.sql.window import Window as W

    ev = Tables(spark, sf_dir).events
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("long")) - 350000
        )
        .cast("long")
        .alias("delta")
    )
    cum = daily.select(
        "d",
        F.sum("delta").over(W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)).alias("level"),
    )
    dd = cum.select(
        "d",
        "level",
        F.max("level").over(W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)).alias("peak"),
    ).localCheckpoint()
    mx = dd.agg(F.max(F.col("peak") - F.col("level")).alias("mdd"))
    return (
        dd.crossJoin(F.broadcast(mx))
        .agg(
            F.max("mdd").cast("long").alias("max_drawdown_cents"),
            F.max(
                F.when(F.col("peak") - F.col("level") == F.col("mdd"), F.col("d"))
            ).alias("trough_day"),
            F.max("peak").cast("long").alias("peak_level_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Chatterjee's xi correlation (rank-based dependence)
# ---------------------------------------------------------------------------


@query(
    "x_xicor",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    ranked AS (
      SELECT d, cents,
             CAST(count(*) OVER (ORDER BY cents
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS r,
             CAST(count(*) OVER (ORDER BY cents DESC
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS l,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM daily
    ),
    seq AS (
      SELECT r, l, n,
             lead(r) OVER (ORDER BY d) AS r_next
      FROM ranked
    ),
    c AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST(sum(abs(r_next - r)) AS BIGINT) AS s1,
             CAST(sum(l * (n - l)) AS BIGINT) AS s2
      FROM seq
    )
    SELECT n, s1, s2,
           CAST(round(1000000 *
               (1.0 - CAST(n AS DOUBLE) * s1 / (2.0 * s2))) AS BIGINT)
             AS xi_micro
    FROM c
    """,
    tags=("analytics", "statistics", "dependence"),
)
def x_xicor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chatterjee's xi correlation of the daily revenue series against
    time — the modern rank-based dependence coefficient (Chatterjee
    2021): ~0 iff independent, ->1 iff y is a measurable FUNCTION of
    x, linear or not — detecting dependence shapes Pearson and
    Spearman both score ~0 (e.g. seasonal oscillation).  The general
    tie-valid form: xi = 1 - n*sum|r_(i+1) - r_i| / (2*sum l_i(n-l_i))
    with r_i = #{y_j <= y_i}, l_i = #{y_j >= y_i} — every ingredient
    an exact integer count (RANGE-framed cume counts), one IEEE
    division at the end.

    Scale shape: corpus -> O(days) series; two cume-count windows
    plus one lead over the series.  Asymmetric by design (xi(x,y) !=
    xi(y,x)) — here ordered by time, ranks over value.
    """
    from pyspark.sql.window import Window as W

    ev = Tables(spark, sf_dir).events
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    )
    ranked = daily.select(
        "d",
        F.count(F.lit(1))
        .over(W.orderBy("cents").rangeBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("r"),
        F.count(F.lit(1))
        .over(W.orderBy(F.desc("cents")).rangeBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("l"),
        F.count(F.lit(1)).over(W.partitionBy()).cast("long").alias("n"),
    )
    seq = ranked.select(
        "r", "l", "n", F.lead("r").over(W.orderBy("d")).alias("r_next")
    )
    c = seq.agg(
        F.max("n").cast("long").alias("n"),
        F.sum(F.abs(F.col("r_next") - F.col("r"))).cast("long").alias("s1"),
        F.sum(F.col("l") * (F.col("n") - F.col("l"))).cast("long").alias("s2"),
    )
    return c.select(
        "n",
        "s1",
        "s2",
        F.round(
            1000000
            * (1.0 - F.col("n").cast("double") * F.col("s1") / (2.0 * F.col("s2")))
        )
        .cast("long")
        .alias("xi_micro"),
    )


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF duration decode (real box walk, stdlib only)
# ---------------------------------------------------------------------------


@query(
    "m_mp4_duration",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             CAST(600 + (doc_id % 5) * 300 AS BIGINT) AS timescale,
             CAST(((doc_id % 20) + 1) * (600 + (doc_id % 5) * 300)
                  + doc_id % 7 AS BIGINT) AS duration
      FROM documents WHERE doc_id < 40
    )
    SELECT doc_id AS media_id, 'isom' AS brand, timescale, duration,
           CAST(duration * 1000 // timescale AS BIGINT) AS duration_ms,
           CAST(doc_id % 2 AS INTEGER) AS version,
           CAST(4 AS INTEGER) AS n_boxes
    FROM g
    """,
    tags=("multimodal", "video", "metadata"),
)
def m_mp4_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4 metadata decode: structurally-valid ISO-BMFF streams
    (ftyp + moov(mvhd) + mdat, mvhd v0/v1 alternating — v1's 64-bit
    times included) are walked per ISO/IEC 14496-12 by
    functions/mp4.py to recover brand, movie timescale, and duration
    — the clip-length/routing pass that runs over every video before
    any frame decode (frame sampling plans, m_frame_sample_plan, are
    derived FROM this duration).  duration_ms is the exact integer
    duration*1000 div timescale, matched closed-form by the oracle.
    With JPEG/WebP/PNG (images) and WAV (audio), this completes real
    metadata decode across all three modalities; codec-level frame
    decode stays an honest stub.

    Scale shape: one map-only mapInPandas pass reading only box
    headers (~200 bytes) regardless of mdat size — at 100 TB the
    duration sweep is bounded by I/O on the binary column, and with
    a range-request source it reads only the moov prefix.
    """
    from map2db_spark.functions.multimodal import (
        documents_as_mp4_media,
        extract_mp4_meta,
    )

    docs = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 40)
    return extract_mp4_meta(documents_as_mp4_media(docs))


# ---------------------------------------------------------------------------
# PMI-ranked collocations (bigram association mining)
# ---------------------------------------------------------------------------

_COLL_MIN_N = 30


@query(
    "t_collocations_pmi",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    ),
    big AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM toks
      CROSS JOIN LATERAL
        (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
      WHERE len(t) >= 2
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM big),
    bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy FROM big
           GROUP BY 1, 2),
    u1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS n_x FROM big GROUP BY 1),
    u2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_y FROM big GROUP BY 1)
    SELECT bg.w1, bg.w2, bg.n_xy,
           CAST(round(1000000 * ln(
               CAST(bg.n_xy * n.n_total AS DOUBLE)
               / CAST(u1.n_x * u2.n_y AS DOUBLE)
           )) AS BIGINT) AS pmi_micro
    FROM bg JOIN u1 USING (w1) JOIN u2 USING (w2) CROSS JOIN n
    WHERE bg.n_xy >= {_COLL_MIN_N}
    ORDER BY pmi_micro DESC, w1, w2 LIMIT 20
    """,
    tags=("text", "collocations", "pipeline"),
)
def t_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-ranked collocations: word pairs that co-occur adjacently
    far more than their unigram frequencies predict — the classic
    multiword-expression miner (tokenizer vocab seeding, phrase
    detection a la word2vec's phrase pass).  The min-support floor
    ({_COLL_MIN_N}) removes the rare-pair PMI bias (a 1-occurrence
    pair of two rare words gets absurd PMI).  Token-level sibling of
    x_mutual_information; the single ln runs on an identical
    integer-product quotient, micro-rounded.

    Scale shape: one bigram count with map-side combine
    (Zipf-collapsed), unigram marginals the same, broadcast back
    onto the surviving cells; top-20 is TakeOrderedAndProject.
    """
    docs = Tables(spark, sf_dir).documents
    t = F.split(F.trim(F.col("text")), r"\s+")
    big = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select(t.alias("t"))
        .where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(element_at(t, i) AS w1,"
                    " element_at(t, i + 1) AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    n = big.agg(F.count("*").cast("long").alias("n_total"))
    bg = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
    u1 = big.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("n_x"))
    u2 = big.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n_y"))
    return (
        bg.where(F.col("n_xy") >= _COLL_MIN_N)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "n_xy",
            F.round(
                1000000
                * F.log(
                    (F.col("n_xy") * F.col("n_total")).cast("double")
                    / (F.col("n_x") * F.col("n_y")).cast("double")
                )
            )
            .cast("long")
            .alias("pmi_micro"),
        )
        .orderBy(F.desc("pmi_micro"), "w1", "w2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Embedding centroid drift (vector-space distribution monitoring)
# ---------------------------------------------------------------------------


@query(
    "v_centroid_drift",
    oracle="""
    WITH iv AS (
      SELECT label,
             CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END AS half,
             list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    cnt AS (
      SELECT label, half, CAST(count(*) AS BIGINT) AS n
      FROM iv GROUP BY 1, 2
    ),
    sums AS (
      SELECT label, half, g.d, CAST(sum(v[g.d]) AS BIGINT) AS s
      FROM iv CROSS JOIN LATERAL
        (SELECT unnest(generate_series(1, 64)) AS d) g
      GROUP BY 1, 2, 3
    ),
    dots AS (
      SELECT a.label,
             CAST(sum(a.s * b.s) AS BIGINT) AS dot_ab,
             CAST(sum(a.s * a.s) AS BIGINT) AS dot_aa,
             CAST(sum(b.s * b.s) AS BIGINT) AS dot_bb
      FROM sums a JOIN sums b
        ON a.label = b.label AND a.d = b.d
       AND a.half = 'a' AND b.half = 'b'
      GROUP BY a.label
    )
    SELECT d.label, ca.n AS n_a, cb.n AS n_b,
           CAST(round(1000000 * CAST(dot_ab AS DOUBLE)
                / (sqrt(CAST(dot_aa AS DOUBLE))
                   * sqrt(CAST(dot_bb AS DOUBLE)))) AS BIGINT)
             AS centroid_cos_micro
    FROM dots d
    JOIN cnt ca ON ca.label = d.label AND ca.half = 'a'
    JOIN cnt cb ON cb.label = d.label AND cb.half = 'b'
    ORDER BY d.label
    """,
    tags=("ann", "drift", "monitoring"),
)
def v_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: per label, the cosine between
    the centroid of one data half and the other (cohorts by vec_id
    parity standing in for time slices) — the vector-side sibling of
    PSI: when an upstream encoder changes or the input distribution
    shifts, centroid cosine drops before any downstream metric does.
    Centroid cosine == cosine of the per-half SUM vectors (the 1/n
    scalars cancel), so the whole statistic reduces to exact integer
    per-dimension sums (milli-scaled components keep every product
    within BIGINT through corpus scale) with one IEEE expression at
    the end — no float mean vectors, no order-dependent float sums.

    Scale shape: one map-side-combinable aggregate collapses the
    corpus to O(labels * halves * dim) per-dimension sums — a few
    thousand integers cross the network regardless of corpus size;
    the cosines are computed on that tiny table.
    """
    emb = Tables(spark, sf_dir).embeddings
    iv = emb.select(
        "label",
        F.when(F.col("vec_id") % 2 == 0, "a").otherwise("b").alias("half"),
        F.expr(
            "transform(embedding,"
            " x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
        ).alias("v"),
    )
    cnt = iv.groupBy("label", "half").agg(F.count("*").cast("long").alias("n"))
    sums = (
        iv.select("label", "half", F.posexplode("v").alias("p", "val"))
        .groupBy("label", "half", "p")
        .agg(F.sum("val").cast("long").alias("s"))
    )
    a = sums.where(F.col("half") == "a").select(
        F.col("label").alias("la"), F.col("p").alias("pa"), F.col("s").alias("sa")
    )
    b = sums.where(F.col("half") == "b").select(
        F.col("label").alias("lb"), F.col("p").alias("pb"), F.col("s").alias("sb")
    )
    dots = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("pa") == F.col("pb")))
        .groupBy(F.col("la").alias("label"))
        .agg(
            F.sum(F.col("sa") * F.col("sb")).cast("long").alias("dot_ab"),
            F.sum(F.col("sa") * F.col("sa")).cast("long").alias("dot_aa"),
            F.sum(F.col("sb") * F.col("sb")).cast("long").alias("dot_bb"),
        )
    )
    ca = cnt.where(F.col("half") == "a").select(
        F.col("label").alias("cl_a"), F.col("n").alias("n_a")
    )
    cb = cnt.where(F.col("half") == "b").select(
        F.col("label").alias("cl_b"), F.col("n").alias("n_b")
    )
    return (
        dots.join(F.broadcast(ca), F.col("label") == F.col("cl_a"))
        .join(F.broadcast(cb), F.col("label") == F.col("cl_b"))
        .select(
            "label",
            "n_a",
            "n_b",
            F.round(
                1000000
                * F.col("dot_ab").cast("double")
                / (
                    F.sqrt(F.col("dot_aa").cast("double"))
                    * F.sqrt(F.col("dot_bb").cast("double"))
                )
            )
            .cast("long")
            .alias("centroid_cos_micro"),
        )
        .orderBy("label")
    )




# ---------------------------------------------------------------------------
# SQL LATERAL correlated subquery surface
# ---------------------------------------------------------------------------


@query(
    "sql_lateral_subquery",
    oracle="""
    SELECT n.n_name, t.o_orderkey, t.cents
    FROM nation n
    CROSS JOIN LATERAL (
      SELECT o.o_orderkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
    ) t
    ORDER BY n.n_name, t.cents DESC, t.o_orderkey
    """,
    tags=("sql", "surface", "lateral"),
)
def sql_lateral_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — the SQL-standard form of
    "top-N per outer row" (each nation's 2 largest orders), supported
    natively by Spark since 3.2 and by DuckDB: the inner query
    references the outer row, and the optimizer decorrelates it into
    a ranked window rather than executing per-row.  The DataFrame
    twin is w_topn_per_group; this pins the SQL SURFACE and the
    decorrelation.  Exact cents keep the hash stable.
    """
    t = Tables(spark, sf_dir)
    t.nation.createOrReplaceTempView("nation_lat")
    t.orders.createOrReplaceTempView("orders_lat")
    t.customer.createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT n.n_name, t.o_orderkey, t.cents
        FROM nation_lat n,
        LATERAL (
          SELECT o.o_orderkey,
                 CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
          FROM orders_lat o JOIN customer_lat c ON c.c_custkey = o.o_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
        ) t
        ORDER BY n.n_name, t.cents DESC, t.o_orderkey
        """
    )


# ---------------------------------------------------------------------------
# Parquet compression-codec round-trips (zstd / snappy / gzip)
# ---------------------------------------------------------------------------


@query(
    "f_compression_codecs",
    oracle="""
    SELECT codec,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events
    CROSS JOIN (SELECT unnest(['gzip', 'snappy', 'zstd']) AS codec)
    GROUP BY codec ORDER BY codec
    """,
    tags=("functions", "formats", "compression"),
)
def f_compression_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet compression-codec breadth: the events table round-trips
    through snappy, zstd and gzip parquet (written and read by
    executor tasks) and every codec's aggregate hash-matches the
    source — byte-preserving transcode across the three codecs a
    100 TB lake actually chooses between (zstd ~30-40% smaller than
    snappy at similar scan speed is the modern default; the CHOICE is
    a table property, and this query proves the engine reads them all
    interchangeably).  Scale shape: transcode is map-only per codec;
    aggregates are map-side-combinable.
    """
    import tempfile

    ev = Tables(spark, sf_dir).events.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    tmp = tempfile.mkdtemp(prefix="m2db_codec_")
    out = None
    for codec in ("gzip", "snappy", "zstd"):
        path = f"{tmp}/{codec}"
        ev.write.mode("overwrite").option("compression", codec).parquet(path)
        agg = (
            spark.read.parquet(path)
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum("cents").cast("long").alias("sum_cents"),
            )
            .select(F.lit(codec).alias("codec"), "n", "sum_cents")
        )
        out = agg if out is None else out.unionByName(agg)
    return _cleanup_roundtrip(out.orderBy("codec"), tmp)


# ---------------------------------------------------------------------------
# Inverse-propensity-weighted treatment effect (observational ATE)
# ---------------------------------------------------------------------------


@query(
    "x_ipw_ate",
    oracle="""
    WITH base AS (
      SELECT event_type AS seg,
             CASE WHEN CAST(concat('0x',
                 substr(md5('ipw:' || CAST(event_id AS VARCHAR)), 1, 6))
                 AS BIGINT) % 100 <
                 (CASE event_type WHEN 'purchase' THEN 70
                                  WHEN 'click' THEN 40 ELSE 20 END)
                  THEN 1 ELSE 0 END AS treated,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    seg AS (
      SELECT seg,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(treated) AS BIGINT) AS n_t,
             CAST(sum(treated * cents) AS BIGINT) AS y_t,
             CAST(sum((1 - treated) * cents) AS BIGINT) AS y_c
      FROM base GROUP BY seg
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM seg)
    SELECT s.seg, s.n, s.n_t, s.y_t, s.y_c,
           CASE WHEN s.n_t = 0 OR s.n = s.n_t THEN NULL
                ELSE CAST(round(1000000 * (
               CAST(s.y_t AS DOUBLE) / s.n_t
             - CAST(s.y_c AS DOUBLE) / (s.n - s.n_t)
           )) AS BIGINT) END AS seg_effect_micro,
           CASE WHEN s.n_t = 0 OR s.n = s.n_t THEN NULL
                ELSE CAST(round(1000000 * CAST(s.n AS DOUBLE) / t.big_n
                * (CAST(s.y_t AS DOUBLE) / s.n_t
                   - CAST(s.y_c AS DOUBLE) / (s.n - s.n_t)))
                AS BIGINT) END AS weighted_term_micro
    FROM seg s CROSS JOIN tot t
    ORDER BY s.seg
    """,
    tags=("analytics", "ml-eval", "causal"),
)
def x_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted treatment effect under confounded
    (observational) assignment: treatment probability deliberately
    VARIES by segment (70%/40%/20% by event type, md5-deterministic),
    so the naive treated-vs-control mean difference is confounded by
    segment mix.  Stratified IPW recovers the effect: within each
    segment the treated/control means are unconfounded (propensity is
    constant there), and the ATE is the segment-size-weighted sum —
    exactly the Horvitz-Thompson estimator with exact cell counts.
    Completes the causal family (x_did_estimator, x_cuped_adjustment)
    with the observational-data case.  All sufficient statistics are
    exact integers; the per-segment and weighted terms are each one
    IEEE expression, micro-rounded.

    Scale shape: ONE map-side-combinable aggregate to O(segments)
    rows; the total is a broadcast scalar.  Event volume changes scan
    time only.
    """
    ev = Tables(spark, sf_dir).events
    prop = (
        F.when(F.col("event_type") == "purchase", 70)
        .when(F.col("event_type") == "click", 40)
        .otherwise(20)
    )
    treated = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ipw:"), F.col("event_id").cast("string"))), 1, 6
            ),
            16,
            10,
        ).cast("long")
        % 100
        < prop
    ).cast("int")
    base = ev.select(
        F.col("event_type").alias("seg"),
        treated.alias("treated"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    seg = base.groupBy("seg").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("treated").cast("long").alias("n_t"),
        F.sum(F.col("treated") * F.col("cents")).cast("long").alias("y_t"),
        F.sum((1 - F.col("treated")) * F.col("cents")).cast("long").alias("y_c"),
    )
    tot = seg.agg(F.sum("n").cast("long").alias("big_n"))
    eff = (
        F.col("y_t").cast("double") / F.col("n_t")
        - F.col("y_c").cast("double") / (F.col("n") - F.col("n_t"))
    )
    # r13 static divide audit: an all-control or all-treated segment
    # (thin data) has no within-stratum contrast -> NULL on BOTH
    # engines instead of a Spark ANSI raise
    degenerate = (F.col("n_t") == 0) | (F.col("n") == F.col("n_t"))
    return (
        seg.crossJoin(F.broadcast(tot))
        .select(
            "seg",
            "n",
            "n_t",
            "y_t",
            "y_c",
            F.when(degenerate, F.lit(None).cast("long"))
            .otherwise(F.round(1000000 * eff).cast("long"))
            .alias("seg_effect_micro"),
            F.when(degenerate, F.lit(None).cast("long"))
            .otherwise(
                F.round(
                    1000000 * F.col("n").cast("double") / F.col("big_n") * eff
                ).cast("long")
            )
            .alias("weighted_term_micro"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# Experiment power analysis (required sample size per arm)
# ---------------------------------------------------------------------------


@query(
    "x_power_analysis",
    oracle="""
    WITH base AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' AND value > 300
                           THEN 1 ELSE 0 END) AS BIGINT) AS conv
      FROM events
    ),
    rel AS (SELECT unnest([5, 10, 20]) AS mde_pct)
    SELECT rel.mde_pct, base.n, base.conv,
           CASE WHEN conv = 0 THEN NULL
           ELSE CAST(ceil(
             2.0 * power(1.959964 + 0.841621, 2)
             * (CAST(conv AS DOUBLE) / n) * (1.0 - CAST(conv AS DOUBLE) / n)
             / power((CAST(conv AS DOUBLE) / n) * rel.mde_pct / 100.0, 2)
           ) AS BIGINT) END AS n_per_arm
    FROM base CROSS JOIN rel
    ORDER BY rel.mde_pct
    """,
    tags=("analytics", "ml-eval", "experimentation"),
)
def x_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis: the required sample size per arm to
    detect a 5/10/20% relative lift on the measured baseline
    conversion rate at alpha=0.05, power=0.8 — the go/no-go
    calculation that precedes every A/B test (x_ab_test_proportions
    is the readout; this is the planning step).  n = 2(z_a+z_b)^2 *
    p(1-p) / (p*mde)^2 with the z quantiles inlined as shared
    literals; the baseline p comes from exact integer counts, and the
    whole formula is one shared IEEE expression (power() on identical
    doubles is correctly-rounded-enough to agree: both engines call
    the same libm pow on identical inputs, and the ceil absorbs any
    ulp at the 6th digit).

    Scale shape: one map-side-combinable count pair; everything else
    is O(1).
    """
    ev = Tables(spark, sf_dir).events
    base = ev.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 300), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("conv"),
    )
    rel = spark.createDataFrame([(5,), (10,), (20,)], "mde_pct int")
    p = F.col("conv").cast("double") / F.col("n")
    n_arm = F.ceil(
        2.0
        * F.pow(F.lit(1.959964 + 0.841621), 2)
        * p
        * (1.0 - p)
        / F.pow(p * F.col("mde_pct") / 100.0, 2)
    ).cast("long")
    # a zero baseline rate has no finite answer: emit NULL like the
    # oracle (Spark ANSI raises on double/0 where DuckDB yields NULL
    # — the sf0.001 thin-data sweep caught this)
    n_arm = F.when(F.col("conv") == 0, F.lit(None).cast("long")).otherwise(n_arm)
    return (
        base.crossJoin(F.broadcast(rel))
        .select("mde_pct", "n", "conv", n_arm.alias("n_per_arm"))
        .orderBy("mde_pct")
    )


# ---------------------------------------------------------------------------
# OHLC bar resampling (open/high/low/close per window)
# ---------------------------------------------------------------------------


@query(
    "w_ohlc_bars",
    oracle="""
    SELECT time_bucket(INTERVAL 6 HOUR, ts) AS bar_start,
           CAST(arg_min(CAST(round(value * 100) AS BIGINT),
                        CAST(epoch_us(ts) AS HUGEINT) * 10000000000 + event_id) AS BIGINT) AS open,
           CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS high,
           CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS low,
           CAST(arg_max(CAST(round(value * 100) AS BIGINT),
                        CAST(epoch_us(ts) AS HUGEINT) * 10000000000 + event_id) AS BIGINT) AS close,
           CAST(count(*) AS BIGINT) AS n_ticks
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics", "timeseries", "resample"),
)
def w_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling: purchase values roll up into 6-hour bars
    of open (first tick), high, low, close (last tick) — the
    canonical tick-to-bar downsampling of market/sensor data, and a
    shape Spark expresses as ONE aggregation because min_by/max_by
    make first/last order statistics aggregable (no window over raw
    ticks).  First/last ties at equal timestamps resolve by event_id
    through a 128-bit packed key — epoch_us * 1e10 + event_id as
    decimal(38,0) on Spark / HUGEINT in the oracle — exact for any
    representable timestamp and unique for event_id < 1e10 (both
    engines compare the identical integer), so the bars are
    deterministic with no multi-year overflow cliff.

    Scale shape: one map-side-combinable aggregate per bar key; at
    100 TB of ticks the shuffle carries O(bars), not O(ticks) — the
    reason min_by/max_by beat the window formulation at scale.
    """
    ev = Tables(spark, sf_dir).events.where(F.col("event_type") == "purchase")
    cents = F.round(F.col("value") * 100).cast("long")
    key = (
        F.unix_micros("ts").cast("decimal(38,0)") * 10000000000
        + F.col("event_id")
    )
    return (
        ev.select(
            F.window("ts", "6 hours").alias("w"),
            cents.alias("cents"),
            key.alias("k"),
        )
        .groupBy(F.col("w.start").alias("bar_start"))
        .agg(
            F.min_by("cents", "k").cast("long").alias("open"),
            F.max("cents").cast("long").alias("high"),
            F.min("cents").cast("long").alias("low"),
            F.max_by("cents", "k").cast("long").alias("close"),
            F.count("*").cast("long").alias("n_ticks"),
        )
        .orderBy("bar_start")
    )


# ---------------------------------------------------------------------------
# Plain-text source (spark.read.text over one-doc-per-line shards)
# ---------------------------------------------------------------------------


@query(
    "f_text_source",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(md5(text)) AS min_md5
    FROM documents WHERE doc_id < 200
    """,
    tags=("functions", "formats", "source"),
)
def f_text_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text source breadth: documents are written one per line
    and read back through ``spark.read.text`` — the rawest corpus
    entry path (crawl dumps, log shards), splittable by newline so a
    large shard still reads in parallel.  Byte-exactness proven by
    md5 over the round-tripped lines.  Scale note: ``wholetext``
    mode (one row per FILE) is the non-splittable variant for
    document-per-file layouts — use binaryFile (m_binaryfile_ingest)
    instead when files can be large.

    Invariant made explicit: line-per-doc parity requires the written
    column to contain NO newline (write.text would split such a row
    into several lines, silently diverging from the oracle only when
    the data generator changes) — the projection raises per-row on
    violation instead of relying on the generator's current behavior.
    """
    import tempfile

    docs = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 200)
    tmp = tempfile.mkdtemp(prefix="m2db_text_")
    guarded = docs.select(
        F.when(
            F.col("text").contains("\n"),
            F.raise_error(
                "f_text_source: newline in documents.text breaks "
                "line-per-doc round-trip parity"
            ),
        )
        .otherwise(F.col("text"))
        .alias("text")
    )
    guarded.coalesce(2).write.mode("overwrite").text(tmp)
    back = spark.read.text(tmp)
    # r16 (guide §7.2, functions/extrema.py): the global md5 minimum
    # goes through TakeOrderedAndProject top-1 instead of a
    # min(string) whose immutable buffer planned Sort + SortAggregate
    # for the whole aggregate; the persisted narrow projection keeps
    # the text read single-pass under the split aggregate.
    from map2db_spark.functions.extrema import attach_global_extremum

    narrow = back.select(
        F.length("value").alias("__nc"), F.md5(F.col("value")).alias("__h")
    ).persist()
    aggs = narrow.agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum("__nc").cast("long").alias("total_chars"),
    )
    return _cleanup_roundtrip(
        attach_global_extremum(aggs, narrow, F.col("__h"), "min_md5"),
        tmp,
    )


# ---------------------------------------------------------------------------
# Magic-byte media dispatch (one-pass multi-format routing)
# ---------------------------------------------------------------------------


@query(
    "m_media_dispatch",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 7 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                WHEN 2 THEN 'webp' WHEN 3 THEN 'wav' WHEN 4 THEN 'mp4'
                WHEN 5 THEN 'tiff' ELSE 'gif' END AS fmt,
           CAST(CASE doc_id % 7
                WHEN 0 THEN 4 + doc_id % 3
                WHEN 1 THEN 16 + (doc_id % 7) * 3
                WHEN 2 THEN 20 + (doc_id % 11) * 5
                WHEN 3 THEN 8000
                WHEN 4 THEN 600 + (doc_id % 5) * 300
                WHEN 5 THEN 5 + doc_id % 4
                ELSE 6 + doc_id % 5 END AS BIGINT) AS a,
           CAST(CASE doc_id % 7
                WHEN 0 THEN 3 + doc_id % 2
                WHEN 1 THEN 9 + (doc_id % 5) * 4
                WHEN 2 THEN 10 + (doc_id % 6) * 7
                WHEN 3 THEN 8 + doc_id % 9
                WHEN 4 THEN
                  (((doc_id % 20) + 1) * (600 + (doc_id % 5) * 300)
                   + doc_id % 7) * 1000
                  // (600 + (doc_id % 5) * 300)
                WHEN 5 THEN 4 + doc_id % 3
                ELSE 3 + doc_id % 4 END AS BIGINT) AS b
    FROM documents WHERE doc_id < 50
    """,
    tags=("multimodal", "dispatch", "metadata"),
)
def m_media_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte media dispatch — the realistic front door of a
    multimodal corpus: the binary column does NOT declare its codec,
    so ONE Arrow pass sniffs each payload's leading bytes and routes
    to the matching stdlib parser (PNG pixel decode, JPEG marker
    walk, WebP RIFF walk, WAV PCM parse, MP4 box walk, TIFF IFD walk
    + strip decompression — the r6 family), emitting a normalized
    (fmt, a, b) feature pair.  Composes all six real
    codecs in a single kernel; unknown magic raises (quarantine
    upstream), never silently mis-parses.  The oracle recomputes
    every routed feature closed-form from the doc_id construction —
    value-verifying the sniffing AND each per-format parser at once.

    Scale shape: one map-only mapInPandas pass, per-row dispatch
    inside the kernel — no per-format jobs, no payload shuffle;
    partition sizing by bytes as with every media pass.
    """
    from map2db_spark.functions.multimodal import (
        documents_as_mixed_media,
        sniff_and_extract,
    )

    docs = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 50)
    return sniff_and_extract(documents_as_mixed_media(docs))


# ---------------------------------------------------------------------------
# Exact weighted median (quantity-weighted price)
# ---------------------------------------------------------------------------


@query(
    "x_weighted_median",
    oracle="""
    WITH c AS (
      SELECT l_returnflag AS rf,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
      SELECT rf, cents, w,
             sum(w) OVER (PARTITION BY rf ORDER BY cents) AS cw,
             sum(w) OVER (PARTITION BY rf) AS tw
      FROM c
    )
    SELECT rf,
           CAST(max(tw) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cw >= tw THEN cents END) AS BIGINT)
             AS wmedian_cents
    FROM cum GROUP BY rf ORDER BY rf
    """,
    tags=("analytics", "quantile", "statistics"),
)
def x_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median: the smallest price whose cumulative
    quantity weight reaches half the total — the inventory/portfolio
    median where each row counts by its size, not once (unweighted
    median is g_exact_median).  Entirely integer: weights in
    quantity-hundredths, the half test doubled (2*cw >= tw) so no
    division ever happens; ties collapse by aggregating weight per
    distinct price BEFORE the cumulative, making the window length
    the price cardinality, not the row count.

    Scale shape: one map-side-combinable (group, price) aggregate,
    then a cumulative window over distinct prices within each group —
    the same collapse-then-compute shape as the KS test.
    """
    from pyspark.sql.window import Window as W

    li = Tables(spark, sf_dir).lineitem
    c = li.groupBy(
        F.col("l_returnflag").alias("rf"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    ).agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
        .cast("long")
        .alias("w")
    )
    cum = c.select(
        "rf",
        "cents",
        "w",
        F.sum("w")
        .over(W.partitionBy("rf").orderBy("cents").rowsBetween(W.unboundedPreceding, 0))
        .alias("cw"),
        F.sum("w").over(W.partitionBy("rf")).alias("tw"),
    )
    return (
        cum.groupBy("rf")
        .agg(
            F.max("tw").cast("long").alias("total_weight"),
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("cents")))
            .cast("long")
            .alias("wmedian_cents"),
        )
        .orderBy("rf")
    )


# ---------------------------------------------------------------------------
# Readability scoring (Flesch-style, exact counts + one IEEE expression)
# ---------------------------------------------------------------------------


@query(
    "t_readability",
    oracle="""
    WITH c AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_words,
             CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT)
               AS n_syll
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, n_words, n_syll,
           CAST(round(1000 * (206.835
               - 1.015 * CAST(n_words AS DOUBLE)
               - 84.6 * CAST(n_syll AS DOUBLE) / n_words)) AS BIGINT)
             AS flesch_milli
    FROM c ORDER BY doc_id
    """,
    tags=("text", "quality", "pipeline"),
)
def t_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability scoring: 206.835 - 1.015*(words per
    sentence) - 84.6*(syllables per word), with syllables counted as
    vowel groups (the standard cheap proxy) and the whole document as
    one sentence (the corpus carries no terminal punctuation —
    documented degradation, not hidden).  Readability joins length /
    stopword-ratio / LM-frequency in the quality-filter toolbox: a
    pretraining corpus drops both unreadable fragments and
    too-templated text.  Counts are exact integers; the score is one
    shared IEEE expression, milli-rounded.

    Scale shape: map-only column expressions (two regexp passes per
    row), no shuffle at all beyond the ordered release.
    """
    docs = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 100)
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    n_syll = F.regexp_count(F.col("text"), F.lit("[aeiouy]+")).cast("long")
    c = docs.select(
        "doc_id", n_words.alias("n_words"), n_syll.alias("n_syll")
    )
    flesch = F.round(
        1000
        * (
            206.835
            - 1.015 * F.col("n_words").cast("double")
            - 84.6 * F.col("n_syll").cast("double") / F.col("n_words")
        )
    ).cast("long")
    return c.select(
        "doc_id", "n_words", "n_syll", flesch.alias("flesch_milli")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Durbin-Watson autocorrelation diagnostic on forecast residuals
# ---------------------------------------------------------------------------


@query(
    "x_durbin_watson",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    resid AS (
      SELECT a.d, a.cents - b.cents AS e
      FROM daily a JOIN daily b ON b.d = a.d - 7
    ),
    seq AS (
      SELECT e, lag(e) OVER (ORDER BY d) AS e_prev FROM resid
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN e_prev IS NOT NULL
                         THEN (e - e_prev) * (e - e_prev) END) AS BIGINT)
             AS diff_sq,
           CAST(sum(e * e) AS BIGINT) AS resid_sq,
           CAST(round(1000000 *
               CAST(sum(CASE WHEN e_prev IS NOT NULL
                        THEN (e - e_prev) * (e - e_prev) END) AS DOUBLE)
               / sum(e * e)) AS BIGINT) AS dw_micro
    FROM seq
    """,
    tags=("analytics", "timeseries", "forecast-eval"),
)
def x_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic on the seasonal-naive forecast
    residuals: DW = sum((e_t - e_t-1)^2) / sum(e_t^2) — ~2 means the
    residuals are white (the forecast extracted all structure), <<2
    means positive autocorrelation remains (a better model exists).
    The diagnostic that closes the forecast-eval loop: sMAPE says how
    big the errors are, DW says whether they are still predictable.
    Both quadratic forms are exact BIGINTs; the ratio is one IEEE
    division, micro-rounded.

    Scale shape: corpus -> O(days) series -> lag-1 window at series
    scale -> 3-integer aggregate.
    """
    from pyspark.sql.window import Window as W

    ev = Tables(spark, sf_dir).events
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint()
    )
    resid = (
        daily.alias("a")
        .join(F.broadcast(daily.alias("b")), F.col("b.d") == F.date_sub(F.col("a.d"), 7))
        .select(F.col("a.d").alias("d"), (F.col("a.cents") - F.col("b.cents")).alias("e"))
    )
    seq = resid.select("e", F.lag("e").over(W.orderBy("d")).alias("e_prev"))
    diff_sq = F.sum(
        F.when(
            F.col("e_prev").isNotNull(),
            (F.col("e") - F.col("e_prev")) * (F.col("e") - F.col("e_prev")),
        )
    ).cast("long")
    resid_sq = F.sum(F.col("e") * F.col("e")).cast("long")
    return seq.agg(
        F.count("*").cast("long").alias("n"),
        diff_sq.alias("diff_sq"),
        resid_sq.alias("resid_sq"),
        F.round(1000000 * diff_sq.cast("double") / resid_sq)
        .cast("long")
        .alias("dw_micro"),
    )


# ---------------------------------------------------------------------------
# Token-budget apportionment (largest-remainder / Hamilton method)
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 100_000


@query(
    "c_token_budget",
    oracle=f"""
    WITH src AS (
      SELECT source,
             CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
                  AS BIGINT) AS toks
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(toks) AS BIGINT) AS big_t FROM src),
    quota AS (
      SELECT source, toks,
             CAST(toks * {_BUDGET_TOKENS} // big_t AS BIGINT) AS floor_alloc,
             CAST(toks * {_BUDGET_TOKENS} % big_t AS BIGINT) AS remainder
      FROM src CROSS JOIN tot
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY remainder DESC, source) AS rr,
             CAST({_BUDGET_TOKENS} - sum(floor_alloc) OVER () AS BIGINT)
               AS leftover
      FROM quota
    )
    SELECT source, toks, floor_alloc,
           CAST(floor_alloc + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM ranked ORDER BY source
    """,
    tags=("curation", "sampling", "allocation"),
)
def c_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget apportionment by the largest-remainder (Hamilton)
    method: a {_BUDGET_TOKENS}-token training budget is split across
    sources proportionally to their token mass, with the integer
    leftovers going to the largest fractional remainders — the exact
    integer apportionment that sums EXACTLY to the budget (naive
    rounding drifts by up to n_sources/2 tokens, and at a 10^12-token
    budget that drift is a reproducibility bug).  The decision is
    pure integer arithmetic (floor via DIV, remainder via MOD,
    deterministic remainder-rank tiebreak) — bit-stable across
    engines and cluster layouts.

    Scale shape: one map-side-combinable token count per source, then
    O(sources) window work.  This is the allocation step upstream of
    c_domain_mixing / c_temperature_sampling, which spend the
    allocation row-locally.
    """
    from pyspark.sql.window import Window as W

    docs = Tables(spark, sf_dir).documents
    src = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("long")
        .alias("toks")
    )
    tot = src.agg(F.sum("toks").cast("long").alias("big_t"))
    quota = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "toks",
        F.expr(f"CAST(toks * {_BUDGET_TOKENS} DIV big_t AS BIGINT)").alias(
            "floor_alloc"
        ),
        F.expr(f"CAST(toks * {_BUDGET_TOKENS} % big_t AS BIGINT)").alias(
            "remainder"
        ),
    )
    ranked = quota.select(
        "*",
        F.row_number()
        .over(W.orderBy(F.desc("remainder"), "source"))
        .alias("rr"),
        (F.lit(_BUDGET_TOKENS) - F.sum("floor_alloc").over(W.partitionBy()))
        .cast("long")
        .alias("leftover"),
    )
    return ranked.select(
        "source",
        "toks",
        "floor_alloc",
        (
            F.col("floor_alloc")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Curriculum ordering (difficulty buckets, stratified interleave)
# ---------------------------------------------------------------------------


@query(
    "c_curriculum_order",
    oracle="""
    WITH bucketed AS (
      SELECT doc_id,
             CAST(ntile(5) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
               AS difficulty
      FROM documents
    ),
    scored AS (
      SELECT doc_id, difficulty,
             row_number() OVER (
               PARTITION BY difficulty
               ORDER BY md5('cur:' || CAST(doc_id AS VARCHAR))
             ) AS pos_in_bucket
      FROM bucketed
    )
    SELECT row_number() OVER (ORDER BY pos_in_bucket, difficulty, doc_id)
             AS seq,
           doc_id, difficulty
    FROM scored
    ORDER BY seq LIMIT 30
    """,
    tags=("curation", "ordering", "pipeline"),
)
def c_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering with stratified interleave: documents fall
    into 5 difficulty buckets (by length here; any score plugs in),
    are md5-shuffled within their bucket, and the final training
    order takes one document from each bucket per cycle (easy ->
    hard, repeat) — the anti-clumping schedule curriculum-learning
    pipelines use so no batch is all-hard or all-easy.  Every
    ordering key is deterministic (ntile over a total order,
    md5-shuffle, lexicographic interleave), so the curriculum is
    bit-reproducible — resuming a run reproduces the same stream.

    Scale shape: NO corpus-wide window — the difficulty ntile AND the
    per-bucket shuffle rank both ride the two-pass range-partitioned
    rank (operators/ids.py): one global rank over (difficulty,
    md5-shuffle-key) is contiguous per bucket, so pos_in_bucket is
    rank minus the bucket's start offset, and the exactly-known ntile
    bucket sizes make that offset driver-side arithmetic.  The final
    seq window runs over the 30 interleave survivors of a
    TakeOrderedAndProject — bounded, never corpus-sized.
    """
    from pyspark.sql.window import Window as W

    from map2db_spark.operators.ids import _ntile_bounds, ranked, with_ntile

    docs = Tables(spark, sf_dir).documents.select("doc_id", "n_chars")
    b = with_ntile(docs, ["n_chars", "doc_id"], 5, "difficulty").select(
        "doc_id",
        F.col("difficulty").cast("long").alias("difficulty"),
        F.md5(F.concat(F.lit("cur:"), F.col("doc_id").cast("string"))).alias(
            "__shuf"
        ),
    )
    out, n = ranked(b, ["difficulty", "__shuf"], rank_col="__g")
    q, r, cut = _ntile_bounds(n, 5)
    d0 = F.col("difficulty") - 1
    start = F.when(d0 < r, d0 * (q + 1)).otherwise(cut + (d0 - r) * q)
    scored = out.select(
        "doc_id",
        "difficulty",
        (F.col("__g") - start + 1).alias("pos_in_bucket"),
    )
    top = scored.orderBy("pos_in_bucket", "difficulty", "doc_id").limit(30)
    return (
        top.select(
            F.row_number()
            .over(W.orderBy("pos_in_bucket", "difficulty", "doc_id"))
            .alias("seq"),
            "doc_id",
            "difficulty",
        )
        .orderBy("seq")
    )


# ---------------------------------------------------------------------------
# Typed JSON promotion (from_json with explicit struct schema)
# ---------------------------------------------------------------------------


@query(
    "f_from_json_typed",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           min(json_extract_string(props, '$.tag')) AS min_tag
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("functions", "json", "schema"),
)
def f_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON promotion: the semi-structured props column is
    parsed ONCE by ``from_json`` with an explicit struct schema into
    real typed columns — the third point on the JSON-access spectrum
    the engine covers (get_json_object = per-path string extraction,
    VARIANT = open-schema binary, from_json = closed-schema struct).
    Closed-schema structs are the right end-state for stabilized
    event payloads: downstream expressions are codegen'd column
    reads, no per-row parsing ever again after the first
    materialization.  Schema inference (schema_of_json) exists but
    costs a sampling pass and drifts — production pins the struct,
    as here.

    Scale shape: parse is map-side and SINGLE-pass (the typed columns
    persist narrow); the fixed-width aggregates are one
    map-side-combinable no-sort shuffle and the min(tag) string
    extremum rides a WindowGroupLimit top-1 window (r16, guide §7.2
    via functions/extrema.py — the string min's immutable buffer had
    dragged count/sum through a per-task Sort + SortAggregate of the
    parsed table).
    """
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from map2db_spark.functions.extrema import attach_group_extremum

    schema = StructType(
        [StructField("k", LongType()), StructField("tag", StringType())]
    )
    ev = Tables(spark, sf_dir).events
    parsed = ev.select(F.from_json(F.col("props"), schema).alias("p"))
    narrow = parsed.select(
        (F.col("p.k") % 7).alias("k_mod"),
        F.col("p.k").alias("__k"),
        F.col("p.tag").alias("__tag"),
    ).persist()
    aggs = narrow.groupBy("k_mod").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("__k").cast("long").alias("k_sum"),
    )
    return attach_group_extremum(
        aggs, narrow, ["k_mod"], F.col("__tag"), "min_tag"
    ).orderBy("k_mod")


# ---------------------------------------------------------------------------
# Arrow-optimized scalar Python UDF (Spark 3.5+/4 useArrow surface)
# ---------------------------------------------------------------------------


@query(
    "u_arrow_python_udf",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN n_chars % 2 = 0
                         THEN n_chars * 3 + 7 ELSE n_chars * 5 + 1 END)
                AS BIGINT) AS mix_sum
    FROM documents GROUP BY lang ORDER BY lang
    """,
    tags=("udf", "arrow", "surface"),
)
def u_arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (``F.udf(useArrow=True)``) —
    the third Python-execution surface the engine pins next to
    pandas_udf (u_pandas_udf_haversine) and mapInPandas kernels:
    row-at-a-time author ergonomics with Arrow-batched transfer, the
    migration path for legacy pickled UDFs (~2x from serialization
    alone, still below vectorized pandas_udf — which is why every
    HOT kernel in this engine is mapInPandas/built-in, and this query
    exists to cover the surface, not to recommend it).  The UDF is an
    integer branch-and-mix, value-checked against the SQL twin.
    """
    from pyspark.sql.types import LongType

    @F.udf(returnType=LongType(), useArrow=True)
    def mix(n: int) -> int:
        return n * 3 + 7 if n % 2 == 0 else n * 5 + 1

    docs = Tables(spark, sf_dir).documents
    return (
        docs.select("lang", mix(F.col("n_chars")).alias("m"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("m").cast("long").alias("mix_sum"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Seasonality strength (variance-ratio decomposition readout)
# ---------------------------------------------------------------------------


@query(
    "x_seasonality_strength",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    detr AS (
      SELECT d,
             7 * cents - sum(cents) OVER (ORDER BY d
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS dt7,
             count(*) OVER (ORDER BY d
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
      FROM daily
    ),
    ok AS (
      SELECT dayofweek(d) AS dow, dt7 FROM detr WHERE wn = 7
    ),
    sea AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dt7) AS BIGINT) AS s
      FROM ok GROUP BY dow
    ),
    agg AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM ok) AS n_days,
             (SELECT CAST(sum(dt7 * dt7) AS BIGINT) FROM ok) AS tot_sq,
             (SELECT CAST(sum(s * s // n) AS BIGINT) FROM sea)
               AS sea_sum
    )
    SELECT n_days,
           CAST(round(1000000 * CAST(sea_sum AS DOUBLE) / tot_sq)
                AS BIGINT) AS strength_micro
    FROM agg
    """,
    tags=("analytics", "timeseries", "seasonality"),
)
def x_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality strength of the daily series: after centered-7
    detrending (the w_seasonal_decompose trick — 7*x - sum7 stays
    integer), strength = 1 - var(residual)/var(detrended) where the
    residual removes day-of-week means — the 0..1 readout (Hyndman's
    FPP convention) that turns the decomposition into one routing
    decision: strong seasonality -> seasonal model / weekly partition
    keys; weak -> treat as noise.  Computed through the exact
    within-group variance identity (sum of resid^2 = sum dt7^2 -
    sum_dow s^2/n), so strength = (sum_dow s^2/n) / (sum dt7^2):
    every sum is an exact integer (the per-dow rational is carried as
    a truncating integer division — absolute error < 7 against sums
    of ~1e16, and the headroom keeps every product inside BIGINT
    through sf0.1; promote to DECIMAL(38,0) beyond) and
    ONE IEEE division releases the ratio.  No float is ever summed,
    so partitioning cannot perturb the value — the policy a naive
    sum-of-squared-residual-doubles formulation would violate.

    Scale shape: corpus -> O(days) series; one centered window, one
    7-row day-of-week aggregate, two integer moment sums.
    """
    from pyspark.sql.window import Window as W

    ev = Tables(spark, sf_dir).events
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    )
    w7 = W.orderBy("d").rowsBetween(-3, 3)
    detr = daily.select(
        "d",
        (7 * F.col("cents") - F.sum("cents").over(w7)).alias("dt7"),
        F.count(F.lit(1)).over(w7).alias("wn"),
    )
    ok = detr.where(F.col("wn") == 7).select(
        F.dayofweek("d").alias("dow"), "dt7"
    ).localCheckpoint()  # O(days); feeds both moment passes
    tot = ok.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum(F.col("dt7") * F.col("dt7")).cast("long").alias("tot_sq"),
    )
    sea = (
        ok.groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("dt7").cast("long").alias("s"),
        )
        .agg(
            F.sum(F.expr("CAST(s * s DIV n AS BIGINT)"))
            .cast("long")
            .alias("sea_sum")
        )
    )
    return (
        tot.crossJoin(F.broadcast(sea))
        .select(
            "n_days",
            F.round(
                1000000 * F.col("sea_sum").cast("double") / F.col("tot_sq")
            )
            .cast("long")
            .alias("strength_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Decision-stump split finder (weighted Gini impurity scan)
# ---------------------------------------------------------------------------


@query(
    "x_gini_split",
    oracle="""
    WITH c AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS pos
      FROM events GROUP BY 1
    ),
    cum AS (
      SELECT cents,
             sum(n) OVER (ORDER BY cents) AS n_l,
             sum(pos) OVER (ORDER BY cents) AS pos_l,
             sum(n) OVER () AS big_n,
             sum(pos) OVER () AS big_pos
      FROM c
    ),
    scored AS (
      SELECT cents AS threshold_cents,
             CAST(n_l AS BIGINT) AS n_left,
             CAST(pos_l AS BIGINT) AS pos_left,
             CAST(big_n - n_l AS BIGINT) AS n_right,
             CAST(big_pos - pos_l AS BIGINT) AS pos_right,
             CAST(round(1000000 * 2.0 * (
               CAST(pos_l * (n_l - pos_l) AS DOUBLE) / n_l
             + CAST((big_pos - pos_l) * ((big_n - n_l) - (big_pos - pos_l))
                    AS DOUBLE) / (big_n - n_l)
             ) / big_n) AS BIGINT) AS impurity_micro
      FROM cum WHERE n_l < big_n
    )
    SELECT threshold_cents, n_left, pos_left, n_right, pos_right,
           impurity_micro
    FROM scored
    ORDER BY impurity_micro, threshold_cents LIMIT 1
    """,
    tags=("analytics", "ml-eval", "tree"),
)
def x_gini_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split finder: the value threshold minimizing
    weighted Gini impurity for separating purchases from other events
    — the inner loop of decision-tree/GBDT training, expressed as ONE
    cumulative scan: per distinct value, the left/right class counts
    come from a running sum, the weighted impurity 2*(p_l q_l n_l +
    p_r q_r n_r)/N from those exact integers, and the argmin is a
    deterministic (score, threshold) top-1.  Both engines evaluate
    the identical IEEE expression on identical integers, so the
    SELECTED threshold — the part a float ulp could flip — agrees
    bit-for-bit.

    Scale shape: collapse-then-compute — the corpus becomes its
    distinct-value class histogram in one map-side-combinable
    aggregate; the cumulative window and argmin run over distinct
    values only.  A full tree layer evaluates every feature this way
    in parallel; XGBoost's histogram mode is exactly this scan with
    pre-bucketed values.
    """
    from pyspark.sql.window import Window as W

    ev = Tables(spark, sf_dir).events
    c = ev.groupBy(
        F.round(F.col("value") * 100).cast("long").alias("cents")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("pos"),
    )
    cum = c.select(
        "cents",
        F.sum("n").over(W.orderBy("cents").rowsBetween(W.unboundedPreceding, 0)).alias("n_l"),
        F.sum("pos").over(W.orderBy("cents").rowsBetween(W.unboundedPreceding, 0)).alias("pos_l"),
        F.sum("n").over(W.partitionBy()).alias("big_n"),
        F.sum("pos").over(W.partitionBy()).alias("big_pos"),
    )
    pos_r = F.col("big_pos") - F.col("pos_l")
    n_r = F.col("big_n") - F.col("n_l")
    impurity = F.round(
        1000000
        * 2.0
        * (
            (F.col("pos_l") * (F.col("n_l") - F.col("pos_l"))).cast("double")
            / F.col("n_l")
            + (pos_r * (n_r - pos_r)).cast("double") / n_r
        )
        / F.col("big_n")
    ).cast("long")
    scored = cum.where(F.col("n_l") < F.col("big_n")).select(
        F.col("cents").alias("threshold_cents"),
        F.col("n_l").cast("long").alias("n_left"),
        F.col("pos_l").cast("long").alias("pos_left"),
        n_r.cast("long").alias("n_right"),
        pos_r.cast("long").alias("pos_right"),
        impurity.alias("impurity_micro"),
    )
    return scored.orderBy("impurity_micro", "threshold_cents").limit(1)


# ---------------------------------------------------------------------------
# Heaps' law: vocabulary growth exponent (first-occurrence trick)
# ---------------------------------------------------------------------------

_HEAPS_STEP = 50


@query(
    "t_heaps_law",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents
    ),
    first_seen AS (
      SELECT token, CAST(min(doc_id) AS BIGINT) AS first_doc
      FROM tok GROUP BY token
    ),
    toks_cum AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id, count(*) AS n_tok
      FROM tok GROUP BY doc_id
    ),
    marks AS (SELECT unnest(generate_series({_HEAPS_STEP}, 500,
                                            {_HEAPS_STEP})) AS m),
    pts AS (
      SELECT m,
             (SELECT CAST(sum(n_tok) AS BIGINT) FROM toks_cum
              WHERE doc_id < m) AS n_corpus,
             (SELECT CAST(count(*) AS BIGINT) FROM first_seen
              WHERE first_doc < m) AS v
      FROM marks
    ),
    lg AS (
      -- degenerate-input audit (r14): a checkpoint BEFORE the first
      -- document has n_corpus/v = 0 — DuckDB ln(0) raises where the
      -- Spark side's inner joins never produce the row; filter the
      -- empty checkpoints on this side so the point sets match
      SELECT CAST(round(1000 * ln(CAST(n_corpus AS DOUBLE))) AS BIGINT) AS x,
             CAST(round(1000 * ln(CAST(v AS DOUBLE))) AS BIGINT) AS y
      FROM pts WHERE n_corpus > 0 AND v > 0
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM lg
    )
    SELECT n,
           CAST(n * sxy - sx * sy AS BIGINT) AS beta_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS beta_den,
           -- a single-document corpus makes every checkpoint identical:
           -- zero log-log variance -> slope undefined, NULL on BOTH
           -- engines (degenerate-input audit, r14)
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE CAST((1000000 * (n * sxy - sx * sy))
                          // (n * sxx - sx * sx) AS BIGINT) END AS beta_micro
    FROM s
    """,
    tags=("text", "analytics", "vocabulary"),
)
def t_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth exponent: V(n) ~ K * n^beta fitted
    log-log over checkpoints every {_HEAPS_STEP} documents — the
    companion of t_zipf_fit (beta ~ 0.4-0.6 for natural text; beta
    near 1 means near-disjoint vocabularies, near 0 means a closed
    template vocabulary — both pretraining red flags).  Cumulative
    distinct counting is made ONE-PASS by the first-occurrence trick:
    V(m) = #{{tokens whose MIN doc_id < m}}, so no per-checkpoint
    distinct pass and no stateful scan — two map-side-combinable
    aggregates (min per token, sum per doc) answer every checkpoint
    at once.  The slope is exact integer OLS over milli-ln points
    (the t_zipf_fit machinery).

    Scale shape: min-per-token and tokens-per-doc collapse the corpus
    in one shuffle each; checkpoints are a broadcast O(points) probe
    of those tables.
    """
    from pyspark.sql.window import Window as W

    docs = Tables(spark, sf_dir).documents
    tok = docs.select(
        F.col("doc_id"),
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    )
    first_seen = tok.groupBy("token").agg(
        F.min("doc_id").cast("long").alias("first_doc")
    )
    toks_cum = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    marks = spark.range(_HEAPS_STEP, 501, _HEAPS_STEP).select(
        F.col("id").alias("m")
    )
    n_corpus = (
        marks.join(toks_cum, toks_cum["doc_id"] < marks["m"])
        .groupBy("m")
        .agg(F.sum("n_tok").cast("long").alias("n_corpus"))
    )
    v = (
        marks.join(first_seen, first_seen["first_doc"] < marks["m"])
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    pts = n_corpus.join(v, "m").select(
        F.round(1000 * F.log(F.col("n_corpus").cast("double")))
        .cast("long")
        .alias("x"),
        F.round(1000 * F.log(F.col("v").cast("double"))).cast("long").alias("y"),
    )
    s = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("beta_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("beta_den"),
        F.expr(
            "CASE WHEN n * sxx - sx * sx = 0 THEN NULL"
            " ELSE CAST((1000000 * (n * sxy - sx * sy))"
            " DIV (n * sxx - sx * sx) AS BIGINT) END"
        ).alias("beta_micro"),
    )


# ---------------------------------------------------------------------------
# Cluster-aware train/test split (leakage-free by construction)
# ---------------------------------------------------------------------------


@query(
    "c_cluster_aware_split",
    oracle=f"""
    WITH RECURSIVE
    sh AS (
      SELECT doc_id AS sid, unnest(list_distinct(list_transform(
               generate_series(1, len(regexp_split_to_array(trim(text), '\\s+')) - 2),
               i -> array_to_string(list_slice(
                      regexp_split_to_array(trim(text), '\\s+'), i, i + 2), ' '))))
             AS shingle
      FROM documents WHERE doc_id < 200
    ),
    shc AS (
      SELECT sh.* FROM sh JOIN (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING count(DISTINCT sid) <= {_DF_CAP}
      ) rare USING (shingle)
    ),
    sizes AS (SELECT sid, count(DISTINCT shingle) AS n FROM shc GROUP BY sid),
    inter AS (
      SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS shared
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.sid < b.sid
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b
      FROM inter JOIN sizes na ON na.sid = id_a
                 JOIN sizes nb ON nb.sid = id_b
      WHERE round(shared / (na.n + nb.n - shared), 6) >= 0.02
    ),
    sym AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
    reach(node, lbl) AS (
      SELECT DISTINCT a AS node, a AS lbl FROM sym
      UNION
      SELECT s.b AS node, r.lbl FROM reach r JOIN sym s ON s.a = r.node
    ),
    comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
    assigned AS (
      SELECT d.doc_id,
             coalesce(c.cluster_id, d.doc_id) AS unit,
             CASE WHEN CAST(concat('0x', substr(md5('cas:' ||
                  CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 6))
                  AS BIGINT) % 10 < 8 THEN 'train' ELSE 'test' END AS split
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
      WHERE d.doc_id < 200
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT unit) AS BIGINT) AS n_units,
           CAST(sum(CASE WHEN unit != doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clustered_docs
    FROM assigned GROUP BY split ORDER BY split
    """,
    tags=("curation", "split", "dedup", "pipeline"),
)
def c_cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware train/test split — leakage prevention by
    CONSTRUCTION, the complement of c_cross_split_leakage's
    detection: near-duplicate clusters are the split UNIT, so a
    document and its near-copies can never straddle the boundary (a
    doc-level md5 split leaks every duplicated document with
    probability 2*p*(1-p)).  Unclustered documents split
    individually; the decision is an md5 draw on the CLUSTER id —
    deterministic, and stable under re-clustering of unrelated docs.

    Scale shape: rides the d_dup_clusters dataflow (df-capped shingle
    self-join edges + large-star/small-star components), then the
    split is a broadcast join of the O(clustered-docs) assignment onto
    the corpus and a row-local md5 — the split itself adds no corpus
    shuffle.
    """
    from map2db_spark.functions import dedup as D
    from map2db_spark.operators.components import connected_components

    docs = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 200)
    edges = D.jaccard_pairs(
        D.shingle_table(docs), threshold=0.02, df_cap=_DF_CAP
    ).select("id_a", "id_b")
    comps = connected_components(edges, src="id_a", dst="id_b").select(
        F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id")
    )
    unit = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    split = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cas:"), unit.cast("string"))), 1, 6
            ),
            16,
            10,
        ).cast("long")
        % 10
        < 8,
        "train",
    ).otherwise("test")
    assigned = docs.join(F.broadcast(comps), "doc_id", "left").select(
        "doc_id", unit.alias("unit"), split.alias("split")
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("unit").cast("long").alias("n_units"),
            F.sum(F.when(F.col("unit") != F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_clustered_docs"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding (leakage-safe categorical feature)
# ---------------------------------------------------------------------------


@query(
    "w_target_encoding",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_id < 500
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s
      FROM base GROUP BY event_type
    )
    SELECT b.event_id,
           CASE WHEN g.n = 1 THEN NULL
                ELSE CAST(round(1000000 * CAST(g.s - b.cents AS DOUBLE)
                          / (g.n - 1)) AS BIGINT)
           END AS loo_mean_micro
    FROM base b JOIN g USING (event_type)
    ORDER BY b.event_id
    """,
    tags=("analytics", "ml-eval", "feature-engineering"),
)
def w_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: each row's categorical feature
    becomes the mean target of its category EXCLUDING the row itself
    — (sum - own)/(n - 1) — the standard high-cardinality encoding
    that avoids self-leakage (plain mean encoding memorizes each
    row's own target and inflates validation scores).  The LOO
    subtraction makes the per-row encode exact from two broadcast
    integers per category plus the row's own value — no window over
    the raw rows, no second shuffle.

    Scale shape: one map-side-combinable (category -> n, sum)
    aggregate broadcast back onto the stream; the encode is a
    row-local expression.  The category table is O(categories)
    regardless of row count — the scalable shape that makes target
    encoding a one-scan feature at 100 TB.
    """
    ev = Tables(spark, sf_dir).events.where(F.col("event_id") < 500)
    base = ev.select(
        "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    g = base.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    return (
        base.join(F.broadcast(g), "event_type")
        .select(
            "event_id",
            # r13 static divide audit: a singleton category has no
            # leave-one-out peers -> NULL on BOTH engines
            F.when(F.col("n") == 1, F.lit(None).cast("long"))
            .otherwise(
                F.round(
                    1000000
                    * (F.col("s") - F.col("cents")).cast("double")
                    / (F.col("n") - 1)
                ).cast("long")
            )
            .alias("loo_mean_micro"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Truncated harmonic centrality (multi-seed BFS with exact 1/d credit)
# ---------------------------------------------------------------------------

_HC_SEEDS = 5
_HC_HOPS = 3


@query(
    "g_harmonic_centrality",
    oracle=f"""
    WITH RECURSIVE
    li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (
      SELECT a.p AS u, b.p AS v
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    adj AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d
            FROM adj GROUP BY u),
    seeds AS (SELECT node FROM deg ORDER BY d DESC, node LIMIT {_HC_SEEDS}),
    reach(seed, node, dist) AS (
      SELECT node, node, 0 FROM seeds
      UNION
      SELECT r.seed, adj.v, r.dist + 1
      FROM reach r JOIN adj ON adj.u = r.node
      WHERE r.dist < {_HC_HOPS}
    ),
    md AS (
      SELECT seed, node, CAST(min(dist) AS BIGINT) AS dist
      FROM reach GROUP BY seed, node
    )
    SELECT seed,
           CAST(count(CASE WHEN dist > 0 THEN 1 END) AS BIGINT) AS n_reached,
           CAST(sum(CASE WHEN dist > 0 THEN 1000000 // dist ELSE 0 END)
                AS BIGINT) AS harmonic_micro
    FROM md GROUP BY seed ORDER BY seed
    """,
    tags=("graph", "centrality", "analytics"),
)
def g_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated harmonic centrality of the {_HC_SEEDS} highest-degree
    parts: H(s) = sum over nodes within {_HC_HOPS} hops of 1/dist —
    the centrality that handles disconnected graphs gracefully
    (unreachable nodes contribute 0, no infinite closeness), here
    truncated at {_HC_HOPS} hops, which is how it is actually run at
    scale (full-radius harmonic centrality on a big graph uses
    HyperBall-style HLL frontiers — the engine's x_hll_manual shows
    the sketch; this query pins the exact small-radius form).  The
    1/dist credits are micro-scaled truncating integer divisions, so
    the centralities are exact integers.

    Scale shape: one multi-seed BFS — frontier rows are (seed, node)
    pairs, each hop one adjacency equi-join + a min-dist aggregate;
    per-seed visited state rides the same keyed shuffle.
    """
    li = (
        Tables(spark, sf_dir)
        .lineitem.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e = (
        li.alias("x")
        .join(li.alias("y"), (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")))
        .groupBy(F.col("x.p").alias("u"), F.col("y.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
        .select("u", "v")
    )
    adj = (
        e.select("u", "v")
        .unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint()
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    seeds = (
        deg.orderBy(F.desc("d"), "u")
        .limit(_HC_SEEDS)
        .select(F.col("u").alias("seed"))
    )
    # frontier/visited carry (seed, node, dist); min-dist by first visit
    visited = seeds.select("seed", F.col("seed").alias("node"), F.lit(0).alias("dist"))
    frontier = visited
    for hop in range(1, _HC_HOPS + 1):
        nxt = (
            frontier.join(adj, frontier["node"] == adj["u"])
            .select("seed", F.col("v").alias("node"))
            .distinct()
            .join(visited.select("seed", "node"), ["seed", "node"], "left_anti")
            .select("seed", "node", F.lit(hop).alias("dist"))
            .localCheckpoint()  # truncate lineage per hop
        )
        visited = visited.unionByName(nxt)
        frontier = nxt
    return (
        visited.where(F.col("dist") > 0)
        .groupBy("seed")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            F.sum(F.expr("CAST(1000000 DIV dist AS BIGINT)"))
            .cast("long")
            .alias("harmonic_micro"),
        )
        .orderBy("seed")
    )


# ---------------------------------------------------------------------------
# Linear multi-touch attribution
# ---------------------------------------------------------------------------


@query(
    "x_linear_attribution",
    oracle="""
    WITH conv AS (
      SELECT event_id AS conv_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT event_id AS touch_id, user_id, ts, event_type AS channel
      FROM events WHERE event_type IN ('view', 'click')
    ),
    pairs AS (
      SELECT c.conv_id, t.touch_id, t.channel
      FROM conv c JOIN touch t
        ON t.user_id = c.user_id
       AND t.ts <= c.ts AND t.ts > c.ts - INTERVAL 7 DAY
    ),
    k AS (
      SELECT conv_id, CAST(count(*) AS BIGINT) AS n_touches
      FROM pairs GROUP BY conv_id
    )
    SELECT p.channel,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(count(DISTINCT p.conv_id) AS BIGINT) AS n_conversions,
           CAST(sum(1000000 // k.n_touches) AS BIGINT) AS credit_micro
    FROM pairs p JOIN k USING (conv_id)
    GROUP BY p.channel ORDER BY p.channel
    """,
    tags=("analytics", "attribution", "marketing"),
)
def x_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every view/click in the 7 days
    before a purchase shares the conversion credit equally (1/k per
    touch) — the multi-touch counterpart of j_first_touch_attribution
    (first-touch gives winner-take-all; linear answers "which
    channels PARTICIPATE in converting paths").  Credits are
    micro-scaled truncating integer divisions, so channel totals are
    exact and order-independent.

    Scale shape: the conversion-touch pairing is a user-keyed join
    bounded by per-user activity in the window (never a cross join
    over users); the per-conversion touch count co-partitions on the
    same conversion key; channel totals are map-side-combinable.
    Hot users are the skew rail — AQE skew-split applies, and a
    per-user activity cap is the content-level rail.
    """
    ev = Tables(spark, sf_dir).events
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), "user_id", F.col("ts").alias("cts")
    )
    touch = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    pairs = conv.join(touch, "user_id").where(
        (F.col("tts") <= F.col("cts"))
        & (F.col("tts") > F.col("cts") - F.expr("INTERVAL 7 DAYS"))
    ).select("conv_id", "touch_id", "channel")
    k = pairs.groupBy("conv_id").agg(F.count(F.lit(1)).cast("long").alias("n_touches"))
    return (
        pairs.join(k, "conv_id")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.countDistinct("conv_id").cast("long").alias("n_conversions"),
            F.sum(F.expr("CAST(1000000 DIV n_touches AS BIGINT)"))
            .cast("long")
            .alias("credit_micro"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Cross-source duplication matrix (who copies from whom)
# ---------------------------------------------------------------------------


@query(
    "d_cross_source_matrix",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id AS sid, unnest(list_distinct(list_transform(
               generate_series(1, len(regexp_split_to_array(trim(text), '\\s+')) - 2),
               i -> array_to_string(list_slice(
                      regexp_split_to_array(trim(text), '\\s+'), i, i + 2), ' '))))
             AS shingle
      FROM documents WHERE doc_id < 300
    ),
    shc AS (
      SELECT sh.* FROM sh JOIN (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING count(DISTINCT sid) <= {_DF_CAP}
      ) rare USING (shingle)
    ),
    sizes AS (SELECT sid, count(DISTINCT shingle) AS n FROM shc GROUP BY sid),
    inter AS (
      SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS shared
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.sid < b.sid
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b
      FROM inter JOIN sizes na ON na.sid = id_a
                 JOIN sizes nb ON nb.sid = id_b
      WHERE round(shared / (na.n + nb.n - shared), 6) >= 0.5
    ),
    lab AS (
      SELECT p.id_a, p.id_b,
             least(da.source, db.source) AS src_lo,
             greatest(da.source, db.source) AS src_hi
      FROM pairs p
      JOIN documents da ON da.doc_id = p.id_a
      JOIN documents db ON db.doc_id = p.id_b
    )
    SELECT src_lo, src_hi, CAST(count(*) AS BIGINT) AS n_dup_pairs
    FROM lab GROUP BY 1, 2 ORDER BY n_dup_pairs DESC, src_lo, src_hi
    """,
    tags=("dedup", "provenance", "pipeline"),
)
def d_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-duplicate pairs (Jaccard
    >= 0.5) labeled by the SOURCE pair of their endpoints — the
    provenance report that turns dedup output into acquisition
    decisions (a source pair with heavy off-diagonal mass means one
    mirrors the other: drop the mirror, don't dedup it forever;
    heavy diagonal means within-source templating).  Source pairs are
    order-normalized (least/greatest) so the matrix is triangular and
    counts are exact.

    Scale shape: rides the exact-Jaccard pair dataflow with the
    df-capped inverted index (hot shingles dropped pre-join on both
    engines); the source labeling is two narrow joins on the pair
    endpoints (doc_id -> source only — column pruning keeps the
    metadata side thin).
    """
    from map2db_spark.functions import dedup as D

    docs = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 300)
    pairs = D.jaccard_pairs(
        D.shingle_table(docs), threshold=0.5, df_cap=_DF_CAP
    ).select("id_a", "id_b")
    meta = docs.select("doc_id", "source")
    lab = (
        pairs.join(
            meta.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")),
            "id_a",
        )
        .join(
            meta.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")),
            "id_b",
        )
        .select(
            F.least("sa", "sb").alias("src_lo"),
            F.greatest("sa", "sb").alias("src_hi"),
        )
    )
    return (
        lab.groupBy("src_lo", "src_hi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_pairs"))
        .orderBy(F.desc("n_dup_pairs"), "src_lo", "src_hi")
    )


# ---------------------------------------------------------------------------
# Q-Q decile comparison (where two distributions differ)
# ---------------------------------------------------------------------------


@query(
    "x_qq_deciles",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS side,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('click', 'view')
    ),
    r AS (
      SELECT side, cents,
             row_number() OVER (PARTITION BY side ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY side) AS n
      FROM s
    ),
    d AS (SELECT unnest(generate_series(1, 9)) AS dec),
    q AS (
      SELECT d.dec, r.side, CAST(max(r.cents) AS BIGINT) AS qv
      FROM r JOIN d ON r.rn = (r.n * d.dec + 9) // 10
      GROUP BY d.dec, r.side
    )
    SELECT a.dec,
           a.qv AS q_click,
           b.qv AS q_view,
           CAST(a.qv - b.qv AS BIGINT) AS gap_cents
    FROM q a JOIN q b ON a.dec = b.dec AND a.side = 'a' AND b.side = 'b'
    ORDER BY a.dec
    """,
    tags=("analytics", "statistics", "drift"),
)
def x_qq_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-Q decile comparison between two event types' value
    distributions: nearest-rank deciles of each sample side by side —
    the diagnostic that says WHERE two distributions differ (KS gives
    one worst-point number, PSI one mass number; the Q-Q gaps show
    tails-vs-center shape).  Nearest-rank order statistics keep every
    quantile an exact observed value; the gaps are exact integer
    cents.

    Scale shape: one rank window per side over the group-keyed
    Exchange; the decile probe joins rank = ceil(n*k/10) — O(9) rows
    out.  Unbounded domains swap to the histogram two-pass locate.
    """
    from pyspark.sql.window import Window as W

    ev = Tables(spark, sf_dir).events.where(
        F.col("event_type").isin("click", "view")
    )
    s = ev.select(
        F.when(F.col("event_type") == "click", "a").otherwise("b").alias("side"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    r = s.select(
        "side",
        "cents",
        F.row_number().over(W.partitionBy("side").orderBy("cents")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("side")).alias("n"),
    )
    d = spark.range(1, 10).select(F.col("id").alias("dec"))
    q = (
        r.join(F.broadcast(d), r["rn"] == F.expr("(n * dec + 9) div 10"))
        .groupBy("dec", "side")
        .agg(F.max("cents").cast("long").alias("qv"))
    )
    a = q.where(F.col("side") == "a").select(F.col("dec").alias("da"), F.col("qv").alias("q_click"))
    b = q.where(F.col("side") == "b").select(F.col("dec").alias("db"), F.col("qv").alias("q_view"))
    return (
        a.join(b, F.col("da") == F.col("db"))
        .select(
            F.col("da").alias("dec"),
            "q_click",
            "q_view",
            (F.col("q_click") - F.col("q_view")).cast("long").alias("gap_cents"),
        )
        .orderBy("dec")
    )


# ---------------------------------------------------------------------------
# NDCG@5 of the LSH ANN ranking vs the exact brute ranking
# ---------------------------------------------------------------------------


def _ndcg_oracle() -> str:
    from map2db_spark.queries_pipeline import _ANN_INT, _lsh_ann_oracle

    # the whole seeded-bucket LSH top-5 oracle nests as a subquery
    # (DuckDB allows WITH inside a CTE body), then its ranking is
    # graded against brute-force relevance
    base = _lsh_ann_oracle()
    ideal = " + ".join(
        f"CAST(round(1000000 * {6 - rk} / ln(CAST({rk} + 1 AS DOUBLE)))"
        f" AS BIGINT)"
        for rk in range(1, 6)
    )
    return f"""
    WITH lsh5 AS (
      SELECT query_id, cand_id, rank FROM ({base}) z
    ),
    brute AS (
      SELECT q.query_id, c.vec_id AS cand_id,
             row_number() OVER (PARTITION BY q.query_id ORDER BY
               round(list_dot_product(q.qv, c.v)
                 / (sqrt(list_dot_product(q.qv, q.qv))
                    * sqrt(list_dot_product(c.v, c.v))), 6) DESC,
               c.vec_id) AS brank
      FROM (SELECT vec_id, {_ANN_INT} AS v FROM embeddings) c
      CROSS JOIN (SELECT vec_id AS query_id, {_ANN_INT} AS qv
                  FROM embeddings WHERE vec_id < 10) q
      WHERE c.vec_id != q.query_id
    ),
    graded AS (
      SELECT l.query_id, l.rank,
             CASE WHEN b.brank <= 5 THEN 6 - b.brank ELSE 0 END AS rel
      FROM lsh5 l JOIN brute b
        ON b.query_id = l.query_id AND b.cand_id = l.cand_id
    )
    SELECT query_id,
           CAST(sum(CAST(round(1000000 * rel /
                 ln(CAST(rank + 1 AS DOUBLE))) AS BIGINT)) AS BIGINT)
             AS dcg_micro,
           CAST({ideal} AS BIGINT) AS idcg_micro
    FROM graded GROUP BY query_id ORDER BY query_id
    """


@query(
    "v_ann_ndcg",
    oracle=_ndcg_oracle(),
    tags=("ann", "evaluation", "ranking"),
)
def v_ann_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of the LSH ANN ranking against exact brute-force
    relevance: each LSH top-5 candidate is graded by its TRUE rank
    (brute top-1 -> relevance 5 ... top-5 -> 1, else 0), discounted
    by 1/ln(rank+1) at its LSH position — the position-aware ranking
    metric that completes the ANN evaluation family (recall@k counts
    hits anywhere, MRR scores only the top hit; NDCG grades the whole
    ordering).  Each discount term is micro-rounded individually
    (single ln on an identical integer argument), so DCG sums are
    exact integers; the ideal DCG is a shared closed-form constant.

    Scale shape: the LSH side is the production bucketed dataflow;
    the brute grading side broadcasts the 10-query set (corpus never
    shuffles) — the evaluator stays cheap enough to run continuously.
    """
    from map2db_spark.functions import similarity as S
    from map2db_spark.queries_pipeline import _PLANES
    from pyspark.sql.window import Window as W

    emb = Tables(spark, sf_dir).embeddings
    queries = emb.where(F.col("vec_id") < 10)
    lsh5 = S.lsh_topk(emb, queries, planes=_PLANES, k=5).select(
        "query_id", "cand_id", "rank"
    )
    brute = S.brute_force_topk(emb, queries, k=1_000_000_000).select(
        "query_id", "cand_id", F.col("rank").alias("brank")
    )
    graded = lsh5.join(brute, ["query_id", "cand_id"]).select(
        "query_id",
        "rank",
        F.when(F.col("brank") <= 5, 6 - F.col("brank")).otherwise(0).alias("rel"),
    )
    term = F.round(
        1000000 * F.col("rel") / F.log(F.col("rank").cast("double") + 1)
    ).cast("long")
    import math as _m

    idcg = sum(
        int(round(1000000 * (6 - rk) / _m.log(rk + 1))) for rk in range(1, 6)
    )
    return (
        graded.groupBy("query_id")
        .agg(F.sum(term).cast("long").alias("dcg_micro"))
        .select(
            "query_id", "dcg_micro", F.lit(idcg).cast("long").alias("idcg_micro")
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# MinHash estimator calibration (sketch estimate vs exact Jaccard)
# ---------------------------------------------------------------------------


def _minhash_estimate_oracle() -> str:
    from map2db_spark.queries_pipeline import _minhash_cte_body

    matches = " + ".join(
        f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(8)
    )
    return f"""
    {_minhash_cte_body()},
    est AS (
      SELECT c.id_a, c.id_b, CAST({matches} AS BIGINT) AS n_match
      FROM cand c JOIN sig a ON a.sid = c.id_a JOIN sig b ON b.sid = c.id_b
    ),
    err AS (
      SELECT e.n_match,
             abs(e.n_match * 125000
                 - CAST(round(1000000.0 * i.shared
                              / (na.n + nb.n - i.shared)) AS BIGINT))
               AS abs_err_micro
      FROM est e
      JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
      JOIN sizes na ON na.sid = e.id_a
      JOIN sizes nb ON nb.sid = e.id_b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(abs_err_micro) AS BIGINT) AS sum_abs_err_micro,
           CAST(max(abs_err_micro) AS BIGINT) AS max_abs_err_micro,
           CAST(sum(abs_err_micro) // count(*) AS BIGINT)
             AS mean_abs_err_micro
    FROM err
    """


@query(
    "d_minhash_estimate_error",
    oracle=_minhash_estimate_oracle(),
    tags=("dedup", "lsh", "evaluation", "sketch"),
)
def d_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator CALIBRATION: over the LSH candidate pairs,
    the 8-hash similarity estimate (matching minhashes / 8) is
    compared against exact Jaccard — the measured error of the sketch
    (theory: std ~ sqrt(j(1-j)/8) ~ 0.17 at j=0.5), which is what
    justifies (or indicts) skipping exact verification at a given
    hash budget.  Completes the sketch-quality family next to
    d_minhash_recall_eval (does LSH FIND the pairs) with "does the
    sketch SCORE them accurately".  The estimate is an integer match
    count; the per-pair error is an exact integer micro difference
    (one IEEE division for the exact-Jaccard micro value).

    Scale shape: estimates join the O(candidates) pair table against
    the signature table twice (id-keyed); the exact side rides the
    candidate-filtered inverted index — nothing corpus-sized beyond
    the production dedup dataflow.
    """
    from map2db_spark.functions import dedup as D

    docs = Tables(spark, sf_dir).documents
    sh = D.shingle_table(docs).localCheckpoint()
    # numeric=True: hex->int chunk bijection — the mh_i equality tests
    # below and the band keys are value-equivalent, the signature min
    # plans a no-sort partial HashAggregate (n_match is unchanged)
    sigs = D.minhash_signatures(sh, num_hashes=8, numeric=True)
    cand = D.lsh_candidate_pairs(sigs, num_hashes=8, band_size=2, bucket_cap=50)
    exact = D.jaccard_pairs(sh, threshold=0.0, candidates=cand).select(
        "id_a", "id_b", "jaccard"
    )
    sa = sigs.select(
        F.col("sid").alias("id_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(8)]
    )
    sb = sigs.select(
        F.col("sid").alias("id_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(8)]
    )
    n_match = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(8)
    )
    est = cand.select("id_a", "id_b").join(sa, "id_a").join(sb, "id_b").select(
        "id_a", "id_b", n_match.cast("long").alias("n_match")
    )
    err = est.join(exact, ["id_a", "id_b"]).select(
        F.abs(
            F.col("n_match") * 125000
            - F.round(1000000 * F.col("jaccard")).cast("long")
        ).alias("abs_err_micro")
    )
    return err.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("abs_err_micro").cast("long").alias("sum_abs_err_micro"),
        F.max("abs_err_micro").cast("long").alias("max_abs_err_micro"),
        F.expr(
            "CAST(sum(abs_err_micro) DIV count(*) AS BIGINT)"
        ).alias("mean_abs_err_micro"),
    )


# ---------------------------------------------------------------------------
# Cumulative gains / lift table (decile targeting quality)
# ---------------------------------------------------------------------------


@query(
    "x_gains_deciles",
    oracle="""
    WITH base AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
             event_id
      FROM events
    ),
    r AS (
      SELECT pos,
             ntile(10) OVER (ORDER BY cents DESC, event_id) AS dec
      FROM base
    ),
    d AS (
      SELECT CAST(dec AS BIGINT) AS dec,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS n_pos
      FROM r GROUP BY dec
    ),
    t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS total_pos,
                 CAST(sum(n) AS BIGINT) AS total_n FROM d)
    SELECT d.dec, d.n, d.n_pos,
           CAST(sum(d.n_pos) OVER (ORDER BY d.dec) AS BIGINT) AS cum_pos,
           CASE WHEN t.total_pos = 0 THEN NULL
                ELSE CAST(sum(d.n_pos) OVER (ORDER BY d.dec) * 1000000
                          // t.total_pos AS BIGINT)
           END AS cum_gain_ppm,
           CASE WHEN t.total_pos = 0 THEN NULL
                ELSE CAST(d.n_pos * t.total_n * 1000000
                          // (CAST(d.n AS BIGINT) * t.total_pos) AS BIGINT)
           END AS lift_ppm
    FROM d CROSS JOIN t ORDER BY d.dec
    """,
    tags=("analytics", "ml-eval", "ranking"),
)
def x_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table: rank rows by a score (here the
    event value standing in for a model score), split into deciles,
    and report what share of all positives each cumulative decile
    captures plus the per-decile lift over random — the business
    rendering of ranking quality (AUC compresses the same curve to
    one number; the gains table says "calling the top 20% captures
    X% of buyers", which is what a targeting budget needs).  All
    quantities are exact integer counts and truncating ppm divisions;
    the decile assignment has a deterministic event_id tiebreak.

    Scale shape: the decile assignment is the two-pass range-
    partitioned rank + driver-side bucket arithmetic (operators/
    ids.py with_ntile) — no single-task global window; then one
    10-row aggregate and O(1) broadcast totals (the cumulative
    window runs over the collapsed 10-row series only).
    """
    from pyspark.sql.window import Window as W

    from map2db_spark.operators.ids import with_ntile

    ev = Tables(spark, sf_dir).events
    base = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
        "event_id",
    )
    r = with_ntile(
        base, [F.desc("cents"), "event_id"], 10, bucket_col="dec"
    ).select("pos", "dec")
    d = r.groupBy(F.col("dec").cast("long").alias("dec")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
    )
    t = d.agg(
        F.sum("n_pos").cast("long").alias("total_pos"),
        F.sum("n").cast("long").alias("total_n"),
    )
    wc = W.orderBy("dec").rowsBetween(W.unboundedPreceding, 0)
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            "dec",
            "n",
            "n_pos",
            F.sum("n_pos").over(wc).cast("long").alias("cum_pos"),
            # r13 static divide audit: no positives -> NULL gains/lift
            F.expr(
                "CASE WHEN total_pos = 0 THEN NULL"
                " ELSE CAST(sum(n_pos) OVER (ORDER BY dec"
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                " * 1000000 DIV total_pos AS BIGINT) END"
            ).alias("cum_gain_ppm"),
            F.expr(
                "CASE WHEN total_pos = 0 THEN NULL"
                " ELSE CAST(n_pos * total_n * 1000000"
                " DIV (n * total_pos) AS BIGINT) END"
            ).alias("lift_ppm"),
        )
        .orderBy("dec")
    )


# ---------------------------------------------------------------------------
# Soft dedup: duplication-count downweighting instead of removal
# ---------------------------------------------------------------------------


@query(
    "c_soft_dedup_weights",
    oracle=f"""
    WITH RECURSIVE
    sh AS (
      SELECT doc_id AS sid, unnest(list_distinct(list_transform(
               generate_series(1, len(regexp_split_to_array(trim(text), '\\s+')) - 2),
               i -> array_to_string(list_slice(
                      regexp_split_to_array(trim(text), '\\s+'), i, i + 2), ' '))))
             AS shingle
      FROM documents WHERE doc_id < 200
    ),
    shc AS (
      SELECT sh.* FROM sh JOIN (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING count(DISTINCT sid) <= {_DF_CAP}
      ) rare USING (shingle)
    ),
    sizes AS (SELECT sid, count(DISTINCT shingle) AS n FROM shc GROUP BY sid),
    inter AS (
      SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS shared
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.sid < b.sid
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b
      FROM inter JOIN sizes na ON na.sid = id_a
                 JOIN sizes nb ON nb.sid = id_b
      WHERE round(shared / (na.n + nb.n - shared), 6) >= 0.02
    ),
    sym AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
    reach(node, lbl) AS (
      SELECT DISTINCT a AS node, a AS lbl FROM sym
      UNION
      SELECT s.b AS node, r.lbl FROM reach r JOIN sym s ON s.a = r.node
    ),
    comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
    csize AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS k
              FROM comp GROUP BY cluster_id),
    weighted AS (
      SELECT d.doc_id,
             coalesce(cs.k, 1) AS k,
             CAST(1000000 // coalesce(cs.k, 1) AS BIGINT) AS weight_micro
      FROM documents d
      LEFT JOIN comp c ON c.node = d.doc_id
      LEFT JOIN csize cs ON cs.cluster_id = c.cluster_id
      WHERE d.doc_id < 200
    )
    SELECT CAST(k AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(weight_micro) AS BIGINT) AS weight_micro,
           CAST(sum(weight_micro) AS BIGINT) AS effective_mass_micro
    FROM weighted GROUP BY k ORDER BY k
    """,
    tags=("curation", "dedup", "sampling"),
)
def c_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT dedup: instead of dropping near-duplicates, every member
    of a k-doc cluster gets sampling weight 1/k, so each piece of
    CONTENT contributes one unit of training mass regardless of how
    many times it was crawled — the downweighting alternative
    (repetition-aware sampling) that keeps rare-context copies a hard
    dedup would destroy.  Weights are truncating micro integers; the
    report shows, per cluster size, how many raw documents collapse
    to how much effective mass.

    Scale shape: rides the components dataflow over df-capped
    Jaccard edges (hot shingles dropped pre-join on both engines);
    the cluster-size table is O(clusters) and broadcast back; the
    weight itself is a row-local expression the sampler
    (c_weighted_sample) consumes directly.
    """
    from map2db_spark.functions import dedup as D
    from map2db_spark.operators.components import connected_components

    docs = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 200)
    edges = D.jaccard_pairs(
        D.shingle_table(docs), threshold=0.02, df_cap=_DF_CAP
    ).select("id_a", "id_b")
    comp = connected_components(edges, src="id_a", dst="id_b").select(
        F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id")
    )
    csize = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).cast("long").alias("k"))
    weighted = (
        docs.select("doc_id")
        .join(F.broadcast(comp), "doc_id", "left")
        .join(F.broadcast(csize), "cluster_id", "left")
        .select(
            F.coalesce(F.col("k"), F.lit(1)).alias("k"),
            F.expr("CAST(1000000 DIV coalesce(k, 1) AS BIGINT)").alias(
                "weight_micro"
            ),
        )
    )
    return (
        weighted.groupBy(F.col("k").cast("long").alias("cluster_size"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("weight_micro").cast("long").alias("weight_micro"),
            F.sum("weight_micro").cast("long").alias("effective_mass_micro"),
        )
        .orderBy("cluster_size")
    )


# ---------------------------------------------------------------------------
# Shard-boundary overlap: suffix-of-one == prefix-of-another
# ---------------------------------------------------------------------------

_BOUND_W = 10


@query(
    "t_boundary_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
      WHERE doc_id < 20 AND len(regexp_split_to_array(trim(text), '\\s+'))
            >= {_BOUND_W} * 2 + 10
    ),
    frags AS (
      SELECT doc_id * 2 AS frag_id,
             list_slice(t, 1, len(t) // 2 + {_BOUND_W}) AS t
      FROM toks
      UNION ALL
      SELECT doc_id * 2 + 1 AS frag_id,
             list_slice(t, len(t) // 2 + 1, len(t)) AS t
      FROM toks
    ),
    ends AS (
      SELECT frag_id,
             md5(array_to_string(list_slice(t, 1, {_BOUND_W}), ' '))
               AS prefix_md5,
             md5(array_to_string(list_slice(t, len(t) - {_BOUND_W} + 1,
                                            len(t)), ' ')) AS suffix_md5
      FROM frags
    )
    SELECT a.frag_id AS tail_frag, b.frag_id AS head_frag
    FROM ends a JOIN ends b
      ON a.suffix_md5 = b.prefix_md5 AND a.frag_id != b.frag_id
    ORDER BY tail_frag, head_frag
    """,
    tags=("text", "dedup", "provenance"),
)
def t_boundary_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-boundary overlap detection: fragment pairs where one's
    {_BOUND_W}-word SUFFIX equals another's PREFIX — the signature of
    a long source document split across extraction shards with
    overlapping windows (the seam double-counts, and reassembly order
    is recoverable from the chain).  Jaccard dedup misses these (two
    halves of a long doc share few shingles overall); the boundary
    join finds exactly them.  The fixture corpus is built IN-QUERY by
    splitting each source doc into two fragments sharing a
    {_BOUND_W}-word seam, so every expected pair is a known positive
    the oracle reconstructs independently.

    Scale shape: two row-local md5s per fragment, one equi-join on
    the fingerprint — exact-dedup cost; a df-cap on hot fingerprints
    (boilerplate openings) is the skew rail.
    """
    docs = Tables(spark, sf_dir).documents
    t = F.split(F.trim(F.col("text")), r"\s+")
    toks = (
        docs.where(F.col("doc_id") < 20)
        .select("doc_id", t.alias("t"))
        .where(F.size("t") >= _BOUND_W * 2 + 10)
    )
    frag_a = toks.select(
        (F.col("doc_id") * 2).alias("frag_id"),
        F.expr(f"slice(t, 1, size(t) div 2 + {_BOUND_W})").alias("t"),
    )
    frag_b = toks.select(
        (F.col("doc_id") * 2 + 1).alias("frag_id"),
        F.expr("slice(t, size(t) div 2 + 1, size(t))").alias("t"),
    )
    frags = frag_a.unionByName(frag_b)
    ends = frags.select(
        "frag_id",
        F.md5(F.expr(f"array_join(slice(t, 1, {_BOUND_W}), ' ')")).alias(
            "prefix_md5"
        ),
        F.md5(
            F.expr(
                f"array_join(slice(t, size(t) - {_BOUND_W} + 1,"
                f" {_BOUND_W}), ' ')"
            )
        ).alias("suffix_md5"),
    )
    a = ends.select(F.col("frag_id").alias("tail_frag"), "suffix_md5")
    b = ends.select(F.col("frag_id").alias("head_frag"), "prefix_md5")
    return (
        a.join(b, a["suffix_md5"] == b["prefix_md5"])
        .where(F.col("tail_frag") != F.col("head_frag"))
        .select("tail_frag", "head_frag")
        .orderBy("tail_frag", "head_frag")
    )


# ---------------------------------------------------------------------------
# Compressibility quality filter (zlib-ratio heuristic, invariant-checked)
# ---------------------------------------------------------------------------


@query(
    "t_compressibility_filter",
    oracle="""
    SELECT doc_id,
           CAST(TRUE AS BOOLEAN) AS ratio_in_range,
           CAST(TRUE AS BOOLEAN) AS doubling_compresses_better
    FROM documents WHERE doc_id < 50 ORDER BY doc_id
    """,
    tags=("text", "quality", "curation"),
)
def t_compressibility_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility quality filter: the zlib compression ratio of a
    document is the classic cheap proxy for templated/repetitive text
    (highly compressible -> boilerplate; near-incompressible ->
    binary junk or high-entropy noise — both pruned in published web
    pipelines).  zlib runs inside an Arrow kernel (stdlib, level 6,
    deterministic bytes for a given input), so the ratio itself is
    engine-specific and NOT SQL-expressible; the hard signal instead
    checks two per-document invariants the true ratio must satisfy —
    0 < ratio < 2, and doubling the text strictly improves the
    per-byte ratio (self-repetition must compress better, the very
    property the filter exploits) — the bounded-error-boolean pattern
    the approximate sketches use.  A false row means the kernel or
    the heuristic broke.

    Scale shape: one mapInPandas pass, two zlib calls per document —
    CPU-bounded map work, no shuffle before the ordered release.
    """
    import pandas as pd

    def kernel(batches):
        import zlib

        for pdf in batches:
            out = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                c1 = len(zlib.compress(raw, 6))
                c2 = len(zlib.compress(raw + raw, 6))
                ratio_micro = c1 * 1_000_000 // len(raw)
                out.append(
                    (
                        int(did),
                        0 < ratio_micro < 2_000_000,
                        c2 * len(raw) < c1 * len(raw + raw),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "ratio_in_range",
                         "doubling_compresses_better"],
            )

    docs = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 50)
    return (
        docs.select("doc_id", "text")
        .mapInPandas(
            kernel,
            schema="doc_id LONG, ratio_in_range BOOLEAN,"
            " doubling_compresses_better BOOLEAN",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Graph robustness: largest component before/after hub removal
# ---------------------------------------------------------------------------

_ROB_HUBS = 5


@query(
    "g_robustness_hub_removal",
    oracle=f"""
    WITH RECURSIVE
    li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (
      SELECT a.p AS u, b.p AS v
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    adj AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d
            FROM adj GROUP BY u),
    hubs AS (SELECT node FROM deg ORDER BY d DESC, node LIMIT {_ROB_HUBS}),
    sym0 AS (SELECT u AS a, v AS b FROM adj),
    reach0(node, lbl) AS (
      SELECT DISTINCT a, a FROM sym0
      UNION
      SELECT s.b, r.lbl FROM reach0 r JOIN sym0 s ON s.a = r.node
    ),
    comp0 AS (SELECT node, min(lbl) AS c FROM reach0 GROUP BY node),
    sym1 AS (
      SELECT a, b FROM sym0
      WHERE a NOT IN (SELECT node FROM hubs)
        AND b NOT IN (SELECT node FROM hubs)
    ),
    reach1(node, lbl) AS (
      SELECT DISTINCT a, a FROM sym1
      UNION
      SELECT s.b, r.lbl FROM reach1 r JOIN sym1 s ON s.a = r.node
    ),
    comp1 AS (SELECT node, min(lbl) AS c FROM reach1 GROUP BY node)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM comp0) AS n_nodes_before,
           (SELECT CAST(max(sz) AS BIGINT) FROM
              (SELECT count(*) AS sz FROM comp0 GROUP BY c) z) AS lcc_before,
           (SELECT CAST(count(*) AS BIGINT) FROM comp1) AS n_nodes_after,
           (SELECT CAST(coalesce(max(sz), 0) AS BIGINT) FROM
              (SELECT count(*) AS sz FROM comp1 GROUP BY c) z) AS lcc_after
    """,
    tags=("graph", "robustness", "analytics"),
)
def g_robustness_hub_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph robustness under targeted attack: the largest connected
    component before and after removing the {_ROB_HUBS} highest-degree
    hubs — the percolation readout that quantifies how much a
    network's connectivity hangs on its hubs (scale-free graphs
    shatter under targeted removal while staying robust to random
    failure; the answer decides replication and rate-limit placement
    for the hot keys the skew profiler found).  Deterministic hub
    pick (degree, node); exact component sizes both rounds via the
    large-star/small-star dataflow.

    Scale shape: two runs of the O(log n)-round components algorithm
    (the second on the hub-filtered edge list — two broadcast
    anti-joins); hub removal at 100 TB is a {_ROB_HUBS}-row broadcast.
    """
    from map2db_spark.operators.components import connected_components

    li = (
        Tables(spark, sf_dir)
        .lineitem.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e = (
        li.alias("x")
        .join(li.alias("y"), (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")))
        .groupBy(F.col("x.p").alias("u"), F.col("y.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
        .select("u", "v")
        .localCheckpoint()  # both component rounds + degree pass
    )
    adj = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    hubs = (
        deg.orderBy(F.desc("d"), "u").limit(_ROB_HUBS)
        .select(F.col("u").alias("hub"))
    )

    comp0 = connected_components(e, src="u", dst="v")
    s0 = comp0.groupBy("comp").agg(F.count(F.lit(1)).alias("sz")).agg(
        F.sum("sz").cast("long").alias("n_nodes_before"),
        F.max("sz").cast("long").alias("lcc_before"),
    )
    e1 = (
        e.join(hubs.hint("broadcast"), e["u"] == hubs["hub"], "left_anti")
        .join(hubs.hint("broadcast"), F.col("v") == hubs["hub"], "left_anti")
    )
    comp1 = connected_components(e1, src="u", dst="v")
    s1 = comp1.groupBy("comp").agg(F.count(F.lit(1)).alias("sz")).agg(
        F.sum("sz").cast("long").alias("n_nodes_after"),
        F.coalesce(F.max("sz"), F.lit(0)).cast("long").alias("lcc_after"),
    )
    return s0.crossJoin(F.broadcast(s1))


# ---------------------------------------------------------------------------
# Theil-Sen robust trend slope (median of pairwise slopes)
# ---------------------------------------------------------------------------


@query(
    "x_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS di,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    slopes AS (
      SELECT (b.cents - a.cents) * 1000000 // (b.di - a.di) AS s_micro
      FROM daily a JOIN daily b ON b.di > a.di
    ),
    r AS (
      SELECT s_micro,
             row_number() OVER (ORDER BY s_micro) AS rn,
             count(*) OVER () AS n
      FROM slopes
    )
    SELECT CAST(max(n) AS BIGINT) AS n_pairs,
           CAST(sum(s_micro * (
               (CASE WHEN rn = (n + 1) // 2 THEN 1 ELSE 0 END)
             + (CASE WHEN rn = n // 2 + 1 THEN 1 ELSE 0 END))) AS BIGINT)
             AS med2_slope_micro
    FROM r
    """,
    tags=("analytics", "timeseries", "robust"),
)
def x_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope of the daily revenue series: the MEDIAN of all
    pairwise slopes — the robust trend ESTIMATOR that pairs with
    Mann-Kendall's trend TEST (same pairwise structure; 29%
    breakdown point, so outlier days cannot steer the slope the way
    they steer OLS / x_group_linreg).  Each pairwise slope is an
    exact truncating micro integer (cents-per-day over integer day
    gaps — identical in both engines), and the median is the doubled
    order statistic, so the estimate is bit-deterministic.

    Scale shape: corpus -> O(days) series; the O(days^2) slope pairs
    and their rank window run at series scale (a broadcast
    self-join).  For very long series the estimator is computed on a
    deterministic pair sample with the same dataflow.
    """
    from pyspark.sql.window import Window as W

    ev = Tables(spark, sf_dir).events
    daily = (
        ev.groupBy(
            F.col("ts").cast("date").alias("d"),
            F.expr("CAST(unix_micros(ts) DIV 86400000000 AS BIGINT)").alias("di"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint()
    )
    slopes = (
        daily.alias("a")
        .join(F.broadcast(daily.alias("b")), F.col("b.di") > F.col("a.di"))
        .select(
            F.expr(
                "CAST((b.cents - a.cents) * 1000000 DIV (b.di - a.di)"
                " AS BIGINT)"
            ).alias("s_micro")
        )
    )
    r = slopes.select(
        "s_micro",
        F.row_number().over(W.orderBy("s_micro")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    pick = (
        F.when(F.col("rn") == F.expr("(n + 1) div 2"), 1).otherwise(0)
        + F.when(F.col("rn") == F.expr("n div 2 + 1"), 1).otherwise(0)
    )
    return r.agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.sum(F.col("s_micro") * pick).cast("long").alias("med2_slope_micro"),
    )


# ---------------------------------------------------------------------------
# Bigram conditional entropy (corpus predictability / entropy rate)
# ---------------------------------------------------------------------------


@query(
    "t_conditional_entropy",
    oracle=r"""
    WITH toks AS (
      SELECT regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents
    ),
    big AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM toks
      CROSS JOIN LATERAL
        (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
      WHERE len(t) >= 2
    ),
    bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM big
           GROUP BY 1, 2),
    u AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cx FROM bg GROUP BY w1),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS big_n FROM bg)
    SELECT n.big_n AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
           CAST(sum(CAST(round(1000000
               * (CAST(bg.c AS DOUBLE) / n.big_n)
               * ln(CAST(u.cx AS DOUBLE) / bg.c)) AS BIGINT)) AS BIGINT)
             AS h_cond_micro
    FROM bg JOIN u USING (w1) CROSS JOIN n
    GROUP BY n.big_n
    """,
    tags=("text", "language-model", "analytics"),
)
def t_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional entropy H(next | current) — the first-order
    entropy rate of the corpus, the information-theoretic twin of the
    compressibility filter (low H = templated/predictable text, high
    H = word salad; natural language sits in a band, and a corpus
    drifting out of it changed character).  Each term c(xy)/N *
    ln(c(x)/c(xy)) is micro-rounded individually (single ln on an
    identical integer quotient), so the sum is an exact
    order-independent integer.

    Scale shape: bigram and unigram counts collapse Zipf-hard under
    map-side combine; the unigram marginals join back on w1 — the
    same key as the bigram count shuffle (co-partitioned); one
    O(cells) aggregate releases the statistic.
    """
    docs = Tables(spark, sf_dir).documents
    t = F.split(F.trim(F.col("text")), r"\s+")
    big = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select(t.alias("t"))
        .where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(element_at(t, i) AS w1,"
                    " element_at(t, i + 1) AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    bg = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c"))
    u = bg.groupBy("w1").agg(F.sum("c").cast("long").alias("cx"))
    n = bg.agg(F.sum("c").cast("long").alias("big_n"))
    term = F.round(
        1000000
        * (F.col("c").cast("double") / F.col("big_n"))
        * F.log(F.col("cx").cast("double") / F.col("c"))
    ).cast("long")
    return (
        bg.join(u, "w1")
        .crossJoin(F.broadcast(n))
        .groupBy(F.col("big_n").alias("n_bigrams"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_bigrams"),
            F.sum(term).cast("long").alias("h_cond_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Snake-balanced shard assignment (token-even data layout)
# ---------------------------------------------------------------------------

_SNAKE_SHARDS = 8


@query(
    "c_shard_snake_balance",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS toks,
             row_number() OVER (ORDER BY
               len(regexp_split_to_array(trim(text), '\\s+')) DESC, doc_id)
               AS rk
      FROM documents
    ),
    assigned AS (
      SELECT doc_id, toks,
             CASE WHEN ((rk - 1) // {_SNAKE_SHARDS}) % 2 = 0
                  THEN (rk - 1) % {_SNAKE_SHARDS}
                  ELSE {_SNAKE_SHARDS - 1} - (rk - 1) % {_SNAKE_SHARDS} END
               AS shard
      FROM sized
    ),
    pershard AS (
      SELECT CAST(shard AS BIGINT) AS shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS shard_toks
      FROM assigned GROUP BY shard
    )
    SELECT shard, n_docs, shard_toks,
           CAST((shard_toks * {_SNAKE_SHARDS} - (SELECT sum(shard_toks)
                 FROM pershard)) * 1000000
                // (SELECT sum(shard_toks) FROM pershard) AS BIGINT)
             AS imbalance_ppm
    FROM pershard ORDER BY shard
    """,
    tags=("curation", "layout", "allocation"),
)
def c_shard_snake_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment by snake (boustrophedon)
    ordering: documents sort by size descending and deal to
    {_SNAKE_SHARDS} shards in alternating direction (1..k, k..1,
    ...), so each round places one large-ish and one small-ish doc
    per shard — the CLOSED-FORM load balancer (assignment is pure
    arithmetic on the size rank, no sequential greedy state), within
    a fraction of a percent of optimal for heavy-tailed sizes.  This
    is the layout step that makes training shards finish together;
    imbalance_ppm quantifies the residual skew.  All integers.

    Scale shape: one size-rank window (two-pass range-partitioned at
    corpus scale), then the shard id is a row-local expression —
    the shuffle to the final layout IS the write.
    """
    from pyspark.sql.window import Window as W

    docs = Tables(spark, sf_dir).documents
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    sized = docs.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        "toks",
        F.row_number().over(W.orderBy(F.desc("toks"), "doc_id")).alias("rk"),
    )
    k = _SNAKE_SHARDS
    shard = F.when(
        ((F.col("rk") - 1) / k).cast("long") % 2 == 0, (F.col("rk") - 1) % k
    ).otherwise(k - 1 - (F.col("rk") - 1) % k)
    pershard = (
        sized.select("toks", shard.cast("long").alias("shard"))
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("toks").cast("long").alias("shard_toks"),
        )
    )
    tot = pershard.agg(F.sum("shard_toks").cast("long").alias("big_t"))
    return (
        pershard.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "shard_toks",
            F.expr(
                f"CAST((shard_toks * {k} - big_t) * 1000000 DIV big_t"
                " AS BIGINT)"
            ).alias("imbalance_ppm"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# Term burstiness (index of dispersion across documents)
# ---------------------------------------------------------------------------

_BURST_MIN_DF = 50


@query(
    "t_term_burstiness",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+'))
               AS token
      FROM documents
    ),
    per_doc AS (
      SELECT token, doc_id, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    ),
    nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tok),
    m AS (
      SELECT token,
             CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS ss
      FROM per_doc GROUP BY token
    )
    SELECT token, df, s AS total_count,
           CAST(round(1000000 * (
               (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / nd.n_docs)
               / (nd.n_docs - 1)
           ) / (CAST(s AS DOUBLE) / nd.n_docs)) AS BIGINT)
             AS dispersion_micro
    FROM m CROSS JOIN nd
    WHERE df >= {_BURST_MIN_DF}
    ORDER BY dispersion_micro DESC, token LIMIT 20
    """,
    tags=("text", "analytics", "ir"),
)
def t_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness: the index of dispersion (variance-to-mean
    ratio of per-document counts, zeros included) for each frequent
    term — the classic IR statistic separating TOPICAL terms (bursty:
    absent mostly, heavy where present, dispersion >> 1) from
    function words (uniform, dispersion ~ 1, Poisson-like); it is the
    principled replacement for hand-listed stopwords and a direct
    input to RAKE/TF-IDF weighting.  Sufficient statistics (df, sum,
    sum of squares over PRESENT docs — zeros enter through the N-doc
    moments algebraically) are exact integers; the ratio is one
    shared IEEE expression, micro-rounded.

    Scale shape: one (token, doc) count with map-side combine, one
    token-keyed moment aggregate, a broadcast O(1) doc total;
    release is TakeOrderedAndProject.
    """
    docs = Tables(spark, sf_dir).documents
    tok = docs.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    )
    per_doc = tok.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    nd = tok.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    m = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    disp = F.round(
        1000000
        * (
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double") * F.col("s") / F.col("n_docs")
            )
            / (F.col("n_docs") - 1)
        )
        / (F.col("s").cast("double") / F.col("n_docs"))
    ).cast("long")
    return (
        m.where(F.col("df") >= _BURST_MIN_DF)
        .crossJoin(F.broadcast(nd))
        .select("token", "df", F.col("s").alias("total_count"),
                disp.alias("dispersion_micro"))
        .orderBy(F.desc("dispersion_micro"), "token")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier (multi-objective dominance)
# ---------------------------------------------------------------------------


@query(
    "x_skyline_pareto",
    oracle="""
    WITH pts AS (
      SELECT l_returnflag AS rf,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
             CAST(max(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    sky AS (
      SELECT rf, price, qty,
             max(qty) OVER (PARTITION BY rf ORDER BY price
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_prev
      FROM pts
    )
    SELECT rf, price, qty
    FROM sky WHERE best_prev IS NULL OR qty > best_prev
    ORDER BY rf, price
    """,
    tags=("analytics", "skyline", "operator"),
)
def x_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) query: per return flag, the
    (price, quantity) points not DOMINATED by any other (another
    point with price <= and quantity >=, one strictly) — the
    multi-objective shortlist operator (cheapest-for-the-quantity
    offers; model points on a cost/quality frontier).  The naive form
    is an all-pairs dominance join; the 2-D skyline reduces to ONE
    cumulative window: collapse equal prices to their max quantity,
    sort by price, keep points whose quantity strictly exceeds the
    running max of everything cheaper.  Exact integer cents
    throughout.

    Scale shape: one map-side-combinable (group, price) aggregate,
    one group-keyed cumulative window over distinct prices — the
    collapse-then-compute shape again; higher dimensions use the
    block-nested-loop skyline over this 2-D pre-filter.
    """
    from pyspark.sql.window import Window as W

    li = Tables(spark, sf_dir).lineitem
    pts = li.groupBy(
        F.col("l_returnflag").alias("rf"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price"),
    ).agg(
        F.max(F.round(F.col("l_quantity") * 100).cast("long"))
        .cast("long")
        .alias("qty")
    )
    w = W.partitionBy("rf").orderBy("price").rowsBetween(
        W.unboundedPreceding, -1
    )
    sky = pts.select(
        "rf", "price", "qty", F.max("qty").over(w).alias("best_prev")
    )
    return (
        sky.where(F.col("best_prev").isNull() | (F.col("qty") > F.col("best_prev")))
        .select("rf", "price", "qty")
        .orderBy("rf", "price")
    )


# ---------------------------------------------------------------------------
# Dedup threshold-response curve (similarity histogram)
# ---------------------------------------------------------------------------


# Sweep-specific df cap: larger than the dedup queries' _DF_CAP because
# the histogram needs the mid-similarity pairs the tight cap drops —
# still a hard bound on self-join fan-out (<= cap^2 rows per shingle).
_SWEEP_DF_CAP = 16


@query(
    "d_threshold_sweep",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id AS sid, unnest(list_distinct(list_transform(
               generate_series(1, len(regexp_split_to_array(trim(text), '\\s+')) - 2),
               i -> array_to_string(list_slice(
                      regexp_split_to_array(trim(text), '\\s+'), i, i + 2), ' '))))
             AS shingle
      FROM documents
    ),
    shc AS (
      SELECT sh.* FROM sh JOIN (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING count(DISTINCT sid) <= {_SWEEP_DF_CAP}
      ) rare USING (shingle)
    ),
    sizes AS (SELECT sid, count(DISTINCT shingle) AS n FROM shc GROUP BY sid),
    inter AS (
      SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS shared
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.sid < b.sid
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT least(CAST(round(1000000.0 * i.shared
                 / (na.n + nb.n - i.shared)) AS BIGINT) // 100000, 9)
               AS bucket
      FROM inter i JOIN sizes na ON na.sid = i.id_a
                   JOIN sizes nb ON nb.sid = i.id_b
    ),
    hist AS (
      SELECT CAST(bucket AS BIGINT) AS sim_decile,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM scored GROUP BY bucket
    )
    SELECT sim_decile, n_pairs,
           CAST(sum(n_pairs) OVER (ORDER BY sim_decile DESC) AS BIGINT)
             AS n_pairs_at_or_above
    FROM hist ORDER BY sim_decile
    """,
    tags=("dedup", "tuning", "pipeline"),
)
def d_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold-response curve: the histogram of pairwise
    Jaccard similarities (decile buckets) with a reversed cumulative
    count — n_pairs_at_or_above IS the number of pairs a dedup run at
    each threshold would remove, computed from ONE exact pair table
    instead of re-running dedup per candidate threshold.  This is how
    the 0.8-vs-0.9 decision gets made with evidence: a cliff in the
    curve marks the true-duplicate mode; a flat tail means the
    threshold barely matters.

    Scale shape: one df-capped inverted-index pair computation (hot
    shingles dropped before the self-join, here AND in the oracle)
    feeding a 10-row histogram — the sweep costs one dedup, not ten.
    The curve is therefore Jaccard-over-informative-shingles, the
    same similarity every registered dedup query thresholds on.
    """
    from pyspark.sql.window import Window as W

    docs = Tables(spark, sf_dir).documents
    from map2db_spark.functions import dedup as D

    scored = D.jaccard_pairs(
        D.shingle_table(docs), threshold=0.0, df_cap=_SWEEP_DF_CAP
    ).select(
        F.least(
            F.expr(
                "CAST(round(1000000 * jaccard) AS BIGINT) DIV 100000"
            ),
            F.lit(9),
        ).alias("bucket")
    )
    hist = scored.groupBy(F.col("bucket").cast("long").alias("sim_decile")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    return hist.select(
        "sim_decile",
        "n_pairs",
        F.sum("n_pairs")
        .over(W.orderBy(F.desc("sim_decile")).rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("n_pairs_at_or_above"),
    ).orderBy("sim_decile")


# ---------------------------------------------------------------------------
# Rocchio pseudo-relevance feedback (query expansion)
# ---------------------------------------------------------------------------


def _rocchio_oracle() -> str:
    from map2db_spark.queries_round5 import _mmr_cos  # self-import safe at call

    return f"""
    WITH iv AS (
      SELECT vec_id,
             list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    q AS (SELECT v AS qv FROM iv WHERE vec_id = 1),
    r1 AS (
      SELECT vec_id, v,
             row_number() OVER (ORDER BY
               {_mmr_cos("qv", "v")} DESC, vec_id) AS rk
      FROM iv CROSS JOIN q WHERE vec_id != 1
    ),
    fb AS (SELECT vec_id, v FROM r1 WHERE rk <= 3),
    fbsum AS (
      SELECT g.d, CAST(sum(v[g.d]) AS BIGINT) AS s
      FROM fb CROSS JOIN LATERAL
        (SELECT unnest(generate_series(1, 64)) AS d) g
      GROUP BY g.d
    ),
    qed AS (
      SELECT g.d, 3 * q.qv[g.d] + fbsum.s AS comp
      FROM q CROSS JOIN LATERAL
        (SELECT unnest(generate_series(1, 64)) AS d) g
      JOIN fbsum ON fbsum.d = g.d
    ),
    qe AS (SELECT list(comp ORDER BY d) AS ev FROM qed),
    r2 AS (
      SELECT i.vec_id,
             row_number() OVER (ORDER BY
               {_mmr_cos("qe.ev", "i.v")} DESC, i.vec_id) AS rk2
      FROM iv i CROSS JOIN qe WHERE i.vec_id != 1
    )
    SELECT a.rk AS orig_rank, a.vec_id AS orig_id,
           b.rk2 AS exp_rank, b.vec_id AS exp_id
    FROM (SELECT vec_id, rk FROM r1 WHERE rk <= 5) a
    JOIN (SELECT vec_id, rk2 FROM r2 WHERE rk2 <= 5) b
      ON b.rk2 = a.rk
    ORDER BY orig_rank
    """


@query(
    "v_rocchio_expansion",
    oracle=_rocchio_oracle(),
    tags=("ann", "retrieval", "feedback"),
)
def v_rocchio_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio pseudo-relevance feedback: retrieve top-3 for the
    query, move the query toward their centroid (q' = 3q + sum of
    feedback vectors — the alpha/beta weights folded into exact
    integer scales), and re-retrieve — the classic zero-supervision
    recall booster (the expanded query pulls in neighbors-of-
    neighbors the original embedding missed).  The output pairs the
    original and expanded top-5 rank-by-rank so the reranking effect
    is directly visible.  All vectors are milli-scaled integers; the
    expansion is exact integer arithmetic; every ranking uses the
    micro-rounded shared-IEEE cosine with vec_id tiebreaks, so both
    retrievals are bit-deterministic.

    Scale shape: two brute passes with the (1-row) query side
    broadcast — at scale both swap to the LSH/IVF path unchanged;
    the feedback centroid is an O(k * dim) aggregate.
    """
    from map2db_spark.functions.similarity import int_dot
    from pyspark.sql.window import Window as W

    emb = Tables(spark, sf_dir).embeddings
    iv = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
        ).alias("v"),
    ).localCheckpoint()  # both retrieval passes + feedback

    def cos_micro(a, b):
        return F.round(
            1000000
            * int_dot(a, b).cast("double")
            / (
                F.sqrt(int_dot(a, a).cast("double"))
                * F.sqrt(int_dot(b, b).cast("double"))
            )
        ).cast("long")

    q = iv.where(F.col("vec_id") == 1).select(F.col("v").alias("qv"))
    r1 = (
        iv.where(F.col("vec_id") != 1)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "v",
            F.row_number()
            .over(W.orderBy(F.desc(cos_micro(F.col("qv"), F.col("v"))), "vec_id"))
            .alias("rk"),
        )
    ).localCheckpoint()
    fb = r1.where(F.col("rk") <= 3)
    fb_sum = fb.agg(
        *[
            F.sum(F.expr(f"element_at(v, {d})")).cast("long").alias(f"f{d}")
            for d in range(1, 65)
        ]
    )
    qe = (
        q.crossJoin(F.broadcast(fb_sum))
        .select(
            F.expr(
                "transform(sequence(1, 64), d -> 3 * element_at(qv, d) + "
                + "element_at(array("
                + ", ".join(f"f{d}" for d in range(1, 65))
                + "), d))"
            ).alias("ev")
        )
    )
    r2 = (
        iv.where(F.col("vec_id") != 1)
        .crossJoin(F.broadcast(qe))
        .select(
            "vec_id",
            F.row_number()
            .over(W.orderBy(F.desc(cos_micro(F.col("ev"), F.col("v"))), "vec_id"))
            .alias("rk2"),
        )
    )
    a = r1.where(F.col("rk") <= 5).select(
        F.col("rk").alias("orig_rank"), F.col("vec_id").alias("orig_id")
    )
    b = r2.where(F.col("rk2") <= 5).select(
        F.col("rk2").alias("exp_rank"), F.col("vec_id").alias("exp_id")
    )
    return a.join(b, a["orig_rank"] == b["exp_rank"]).select(
        "orig_rank", "orig_id", "exp_rank", "exp_id"
    ).orderBy("orig_rank")


# ---------------------------------------------------------------------------
# JPEG PIXEL decode (real baseline Huffman + IDCT, stdlib+numpy)
# ---------------------------------------------------------------------------


@query(
    "m_jpeg_pixels",
    oracle="""
    WITH g AS (
      SELECT d.doc_id, by.i AS by, bx.i AS bx,
             (d.doc_id * 37 + by.i * 11 + bx.i * 5) % 256 AS v
      FROM (SELECT doc_id FROM documents WHERE doc_id < 40) d
      CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS i) by
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) bx
      WHERE by.i <= d.doc_id % 2 AND bx.i <= 1 + d.doc_id % 3
    )
    SELECT doc_id AS media_id,
           CAST(8 * (2 + doc_id % 3) AS INTEGER) AS width,
           CAST(8 * (1 + doc_id % 2) AS INTEGER) AS height,
           CAST(sum(v) * 64 AS BIGINT) AS sum_px,
           CAST(min(v) AS BIGINT) AS min_px,
           CAST(max(v) AS BIGINT) AS max_px
    FROM g GROUP BY doc_id
    """,
    tags=("multimodal", "image", "pixels"),
)
def m_jpeg_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG pixel decode — the stub is gone: per row, a
    constant-per-8x8-block grayscale image (closed-form values from
    doc_id) is ENCODED as a real baseline-sequential JPEG (FDCT,
    quantization, zigzag, DC prediction, run/size AC coding,
    canonical Huffman, byte stuffing — functions/jpeg_codec.py) and
    then DECODED back through the full entropy+IDCT path inside one
    Arrow kernel; the emitted pixel statistics come from the DECODED
    array.  Constant blocks carry only a DC coefficient, and the
    fixture DC quantizer of 8 makes the x8-DCT-gain/quantize/IDCT
    chain exact integer arithmetic in float64, so the decode is
    BIT-EXACT and the oracle recomputes the stats closed-form — a
    hash match certifies the whole codec (bit writer/reader, stuffing,
    Huffman tables, DC prediction, EOB, dequantize, IDCT DC gain) on
    real compressed streams.  Lossy-path error bounds and color are
    covered in tests/test_jpeg.py; subsampled streams decode too
    (m_jpeg_subsampled) and spectral-selection progressive round-trips
    under m_jpeg_progressive — only successive-approximation
    refinement (Ah != 0) remains an honest NotImplementedError.

    Scale shape: map-only mapInPandas; payloads never shuffle and
    never touch the driver."""
    import pandas as pd

    from map2db_spark.session import ship_package

    ship_package(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 40
    ).select("doc_id")

    def kernel(batches):
        import numpy as np

        from map2db_spark.functions.jpeg_codec import (
            decode_jpeg_baseline,
            encode_jpeg_baseline,
        )

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "sum_px": [], "min_px": [], "max_px": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                bw, bh = 2 + doc_id % 3, 1 + doc_id % 2
                blocks = np.array(
                    [[(doc_id * 37 + by * 11 + bx * 5) % 256
                      for bx in range(bw)] for by in range(bh)]
                )
                img = np.kron(blocks, np.ones((8, 8), dtype=np.int64)).astype(
                    np.uint8
                )
                decoded = decode_jpeg_baseline(encode_jpeg_baseline(img))
                out["media_id"].append(doc_id)
                out["height"].append(decoded.shape[0])
                out["width"].append(decoded.shape[1])
                out["sum_px"].append(int(decoded.astype(np.int64).sum()))
                out["min_px"].append(int(decoded.min()))
                out["max_px"].append(int(decoded.max()))
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        kernel,
        schema="media_id LONG, width INT, height INT, sum_px LONG,"
        " min_px LONG, max_px LONG",
    )


# ---------------------------------------------------------------------------
# Bigram language-model perplexity scoring (corpus quality signal)
# ---------------------------------------------------------------------------


@query(
    "t_bigram_perplexity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    ),
    big AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM toks CROSS JOIN LATERAL
        (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
    ),
    c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n2
           FROM big GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS n1
           FROM big GROUP BY w1),
    scored AS (
      SELECT b.doc_id,
             CAST(round(1000000 * ln(CAST(c1.n1 AS DOUBLE) / c2.n2))
                  AS BIGINT) AS nll_micro
      FROM big b JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
                 JOIN c1 ON c1.w1 = b.w1
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(nll_micro) AS BIGINT) AS nll_sum_micro,
           CAST(sum(nll_micro) // count(*) AS BIGINT) AS nll_avg_micro
    FROM scored WHERE doc_id < 200
    GROUP BY doc_id
    """,
    tags=("text", "language-model", "quality", "pipeline"),
)
def t_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model perplexity scoring — the model-based
    quality signal every curation stack runs next to the heuristic
    filters (t_quality_scores): a bigram LM is TRAINED on the corpus
    itself (count tables) and each document is scored by its average
    negative log-likelihood.  Low-NLL documents are templated or
    duplicated (the LM predicts them — candidates for dedup/
    downweighting), high-NLL documents are noise (candidates for the
    quality gate) — this is the CCNet/KenLM filtering pattern with
    the engine's own counts as the model.

    Cross-engine exactness: one ln per bigram TYPE applied to the
    identical double quotient of exact integer counts, rounded to
    integer micro-nats BEFORE summation — the per-doc sum is then an
    integer aggregate, immune to float summation order.

    Scale shape: the bigram explode streams into two map-side-
    combinable count aggregates; the score-back joins are UNHINTED so
    AQE broadcasts them while the distinct-bigram table is small and
    falls back to a sort-merge co-partitioned with the count
    shuffle's own key once natural-language bigram cardinality
    outgrows broadcast (a production run also prunes singleton
    bigrams first).  One final doc_id-keyed aggregate; training and
    scoring are the same two passes at any corpus size.
    """
    docs = Tables(spark, sf_dir).documents
    par = spark.sparkContext.defaultParallelism
    toks = docs.repartition(par).select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("t")
    )
    big = toks.select(
        "doc_id",
        F.posexplode(
            F.expr("transform(slice(t, 1, size(t) - 1), (w, i) -> struct(w AS w1, t[i + 1] AS w2))")
        ).alias("_i", "bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("n2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("n1"))
    nll = F.round(
        F.lit(1000000) * F.log(F.col("n1").cast("double") / F.col("n2"))
    ).cast("long")
    # no broadcast HINT: on this corpus AQE auto-broadcasts the tiny
    # count tables, but natural-language bigram TYPES can approach
    # corpus cardinality, where a forced broadcast would OOM — the
    # unhinted join lets AQE pick broadcast vs a sort-merge that
    # co-partitions with the count shuffle's own bigram key
    scored = (
        big.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .select("doc_id", nll.alias("nll_micro"))
    )
    return (
        scored.where(F.col("doc_id") < 200)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("nll_micro").cast("long").alias("nll_sum_micro"),
            F.expr("CAST(sum(nll_micro) DIV count(*) AS BIGINT)").alias(
                "nll_avg_micro"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership (build + probe, md5 k-hash, exact fp count)
# ---------------------------------------------------------------------------

_BLOOM_M = 8192  # bits
_BLOOM_K = 4  # hash functions


def _bloom_oracle() -> str:
    pos_terms = ",\n        ".join(
        f"CAST(concat('0x', substr(md5('bf{i}:' || CAST(key AS VARCHAR)), 1, 8)) AS BIGINT) % {_BLOOM_M} AS p{i}"
        for i in range(_BLOOM_K)
    )
    probe_union = " UNION ALL ".join(
        f"SELECT key, p{i} AS pos FROM probe_pos" for i in range(_BLOOM_K)
    )
    build_union = " UNION ALL ".join(
        f"SELECT p{i} AS pos FROM build_pos" for i in range(_BLOOM_K)
    )
    return f"""
    WITH members AS (SELECT c_custkey AS key FROM customer),
    probes AS (
      SELECT c_custkey AS key, TRUE AS is_member FROM customer
      UNION ALL
      SELECT p_partkey + 10000000 AS key, FALSE AS is_member FROM part
    ),
    build_pos AS (
      SELECT {pos_terms}
      FROM members
    ),
    bits AS (SELECT DISTINCT pos FROM ({build_union})),
    probe_pos AS (
      SELECT key, {pos_terms}
      FROM probes
    ),
    hits AS (
      SELECT pp.key, CAST(count(b.pos) AS BIGINT) AS n_set
      FROM ({probe_union}) pp LEFT JOIN bits b ON b.pos = pp.pos
      GROUP BY pp.key
    ),
    verdicts AS (
      SELECT p.key, p.is_member, (h.n_set = {_BLOOM_K}) AS claimed
      FROM probes p JOIN hits h ON h.key = p.key
    )
    SELECT CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_members,
           CAST(sum(CASE WHEN is_member AND claimed THEN 1 ELSE 0 END)
                AS BIGINT) AS n_member_hits,
           CAST(sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nonmembers,
           CAST(sum(CASE WHEN NOT is_member AND claimed THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_positives,
           CAST(sum(CASE WHEN NOT is_member AND claimed THEN 1 ELSE 0 END)
                * 1000000
                // sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS fp_ppm
    FROM verdicts
    """


@query(
    "x_bloom_filter",
    oracle=_bloom_oracle(),
    tags=("analytics", "sketch", "membership"),
)
def x_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership — build + probe as dataflow, the third
    probabilistic structure next to x_hll_manual (cardinality) and
    x_countmin_sketch (frequency): customer keys build an m=8192-bit
    k=4 filter (bit positions from md5 slices, portable across
    engines), then every member and a disjoint non-member set (part
    keys shifted out of range) are probed.  The result certifies the
    two Bloom properties exactly: ZERO false negatives (every member
    hits) and a measured false-positive rate to compare against the
    (1 - e^(-kn/m))^k ≈ theory value — how an engine sizes the
    runtime bloom-join filters it pushes into scans.  This is the
    STRUCTURE certification of the repo's bloom family; the
    applications are x_bloom_semi_join (join-side pruning) and
    c_contamination_bloom (bounded-memory eval-set screening).

    Scale shape: the filter is the DISTINCT bit-position table
    (bounded by m = 8192 rows regardless of input size) and is
    BROADCAST to the probe side — membership probing never shuffles
    the probe stream; build is one map + bounded distinct.
    """
    cust = Tables(spark, sf_dir).customer.select(
        F.col("c_custkey").alias("key")
    )
    part = Tables(spark, sf_dir).part.select(
        (F.col("p_partkey") + 10000000).alias("key")
    )
    probes = cust.select("key", F.lit(True).alias("is_member")).unionByName(
        part.select("key", F.lit(False).alias("is_member"))
    )

    def pos(i: int) -> F.Column:
        h = F.md5(F.concat(F.lit(f"bf{i}:"), F.col("key").cast("string")))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BLOOM_M

    bits = None
    for i in range(_BLOOM_K):
        b = cust.select(pos(i).alias("pos"))
        bits = b if bits is None else bits.unionByName(b)
    bits = bits.distinct()  # the filter: <= m rows, broadcastable

    probe_pos = None
    for i in range(_BLOOM_K):
        p = probes.select("key", "is_member", pos(i).alias("pos"))
        probe_pos = p if probe_pos is None else probe_pos.unionByName(p)
    hits = (
        probe_pos.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("key", "is_member")
        .agg(F.count(F.lit(1)).alias("n_set"))
    )
    verdicts = probes.join(hits, ["key", "is_member"], "left").select(
        "is_member",
        (F.coalesce(F.col("n_set"), F.lit(0)) == _BLOOM_K).alias("claimed"),
    )
    return verdicts.agg(
        F.sum(F.when(F.col("is_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_members"),
        F.sum(F.when(F.col("is_member") & F.col("claimed"), 1).otherwise(0))
        .cast("long")
        .alias("n_member_hits"),
        F.sum(F.when(~F.col("is_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_nonmembers"),
        F.sum(F.when(~F.col("is_member") & F.col("claimed"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_positives"),
        F.expr(
            "CAST(sum(CASE WHEN NOT is_member AND claimed THEN 1 ELSE 0 END)"
            " * 1000000 DIV sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("fp_ppm"),
    )


# ---------------------------------------------------------------------------
# WebP-lossless PIXEL decode (real VP8L bitstream, simple-code subset)
# ---------------------------------------------------------------------------


@query(
    "m_webp_pixels",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             4 + doc_id % 5 AS w,
             3 + doc_id % 4 AS h,
             (doc_id * 31) % 256 AS r0,
             (doc_id * 57) % 256 AS g0,
             (doc_id * 13) % 256 AS b0,
             CASE WHEN doc_id % 5 = 0 THEN (doc_id * 31) % 256
                  ELSE (doc_id * 91 + 17) % 256 END AS r1,
             CASE WHEN doc_id % 5 = 0 THEN (doc_id * 57) % 256
                  ELSE (doc_id * 73 + 5) % 256 END AS g1,
             CASE WHEN doc_id % 5 = 0 THEN (doc_id * 13) % 256
                  ELSE (doc_id * 29 + 11) % 256 END AS b1
      FROM documents WHERE doc_id < 40
    ),
    e AS (
      SELECT *,
             w * h AS t,
             ((w + 1) // 2) * ((h + 1) // 2) + (w // 2) * (h // 2) AS even_cells
      FROM g
    ),
    n AS (
      SELECT *,
             CASE WHEN doc_id % 2 = 0 THEN even_cells
                  ELSE t - even_cells END AS n0
      FROM e
    )
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(n0 * r0 + (t - n0) * r1 AS BIGINT) AS sum_r,
           CAST(n0 * g0 + (t - n0) * g1 AS BIGINT) AS sum_g,
           CAST(n0 * b0 + (t - n0) * b1 AS BIGINT) AS sum_b,
           CAST(t * 255 AS BIGINT) AS sum_a
    FROM n
    """,
    tags=("multimodal", "image", "pixels", "webp"),
)
def m_webp_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WebP-lossless PIXEL decode: per row, a two-tone RGB
    checkerboard (colors and geometry closed-form from doc_id; every
    fifth doc degenerates to a solid fill, exercising the
    zero-bit-per-pixel one-symbol path) is ENCODED as a genuine VP8L
    bitstream — RIFF container, LSB-first 14-bit geometry, transform/
    cache/meta flags, five simple prefix codes, one bit per two-tone
    channel per pixel (functions/webp_vp8l.py) — then DECODED back
    through the same spec layout inside one Arrow kernel, and the
    emitted channel sums come from the DECODED RGBA array.  The
    oracle recomputes the sums from the checker parity count, so a
    hash match certifies the full encode+decode bit path.  Normal
    prefix codes + LZ77 are covered by m_webp_lz77_pixels (r4);
    predictor/color/palette transforms, 2D proximity distance codes
    and lossy VP8 stay honest NotImplementedError slots inside the
    codec.

    Scale shape: map-only mapInPandas; payloads never shuffle and
    never touch the driver."""
    import pandas as pd

    from map2db_spark.session import ship_package

    ship_package(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 40
    ).select("doc_id")

    def kernel(batches):
        import numpy as np

        from map2db_spark.functions.webp_vp8l import (
            decode_vp8l_simple,
            encode_vp8l_simple,
        )

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "sum_r": [], "sum_g": [], "sum_b": [], "sum_a": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 4
                c0 = ((d * 31) % 256, (d * 57) % 256, (d * 13) % 256)
                c1 = c0 if d % 5 == 0 else (
                    (d * 91 + 17) % 256, (d * 73 + 5) % 256, (d * 29 + 11) % 256
                )
                img = np.zeros((h, w, 3), dtype=np.uint8)
                for y in range(h):
                    for x in range(w):
                        img[y, x] = c0 if (x + y + d) % 2 == 0 else c1
                dec = decode_vp8l_simple(encode_vp8l_simple(img))
                out["media_id"].append(d)
                out["height"].append(dec.shape[0])
                out["width"].append(dec.shape[1])
                s = dec.astype(np.int64).sum(axis=(0, 1))
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
                out["sum_a"].append(int(s[3]))
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        kernel,
        schema="media_id LONG, width INT, height INT, sum_r LONG,"
        " sum_g LONG, sum_b LONG, sum_a LONG",
    )


# ---------------------------------------------------------------------------
# REAL image resize (decode -> exact nearest-neighbor -> PNG re-encode)
# ---------------------------------------------------------------------------


@query(
    "m_resize_pixels",
    oracle="""
    WITH tgt AS (
      SELECT d.doc_id, tx.i AS tx, ty.i AS ty, ch.i AS ch,
             (tx.i * (4 + d.doc_id % 5)) // 6 AS sx,
             (ty.i * (3 + d.doc_id % 4)) // 5 AS sy
      FROM (SELECT doc_id FROM documents WHERE doc_id < 60) d
      CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS i) tx
      CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS i) ty
      CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS i) ch
    )
    SELECT doc_id AS media_id,
           CAST(6 AS INTEGER) AS width,
           CAST(5 AS INTEGER) AS height,
           CAST(sum(CASE WHEN ch = 0
                THEN (doc_id * 7 + sx * 3 + sy * 5) % 256 ELSE 0 END)
                AS BIGINT) AS sum_r,
           CAST(sum(CASE WHEN ch = 1
                THEN (doc_id * 7 + sx * 3 + sy * 5 + 11) % 256 ELSE 0 END)
                AS BIGINT) AS sum_g,
           CAST(sum(CASE WHEN ch = 2
                THEN (doc_id * 7 + sx * 3 + sy * 5 + 22) % 256 ELSE 0 END)
                AS BIGINT) AS sum_b
    FROM tgt GROUP BY doc_id
    """,
    tags=("multimodal", "image", "resize", "pipeline"),
)
def m_resize_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize end to end (the byte-truncation stand-in is
    gone): deterministic PNG payloads decode through the stdlib
    codec, resample with the exact integer nearest-neighbor map
    (src = t * s DIV target), re-encode as PNG, and the RESIZED
    payloads are decoded AGAIN for their per-channel pixel sums — so
    the hash match pins decode -> resample -> encode -> decode as one
    chain.  The oracle recomputes the same sums closed-form from the
    NN index arithmetic over the fixture pixel formula.

    Scale shape: two map-only Arrow passes (resize, then feature
    extraction); payloads never shuffle and never touch the driver —
    the shape of every image-normalization stage in a multimodal
    training pipeline."""
    from map2db_spark.functions.multimodal import (
        documents_as_png_media,
        extract_png_features,
        resize_images,
    )
    from map2db_spark.session import ship_package

    ship_package(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 60
    )
    resized = resize_images(documents_as_png_media(docs), 6, 5)
    return extract_png_features(resized)


# ---------------------------------------------------------------------------
# Memorization-risk audit: duplicated n-gram coverage
# ---------------------------------------------------------------------------


@query(
    "t_dup_ngram_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             array_to_string(list_slice(t, i, i + 4), ' ') AS g
      FROM toks CROSS JOIN LATERAL
        (SELECT unnest(generate_series(1, len(t) - 4)) AS i)
    ),
    freq AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM grams GROUP BY g)
    SELECT CAST(count(*) AS BIGINT) AS n_distinct_grams,
           CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_grams,
           CAST(sum(n) AS BIGINT) AS n_occurrences,
           CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
             AS n_dup_occurrences,
           CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) * 1000000
                // sum(n) AS BIGINT) AS dup_occurrence_ppm
    FROM freq
    """,
    tags=("text", "dedup", "memorization", "pipeline"),
)
def t_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization-risk audit: what share of the corpus's 5-gram
    OCCURRENCES belong to 5-grams that appear more than once — the
    number privacy/memorization reviews ask for ("how much verbatim
    repetition will the model see?"), and the metric that motivates
    span-level dedup (d_span_dedup removes exactly these).  Reported
    as exact counts plus an integer-ppm share.

    Scale shape: one explode -> map-side-combinable n-gram count ->
    one 5-number collapse; the n-gram table shuffles once on the gram
    key and nothing corpus-sized is ever collected or joined.
    """
    docs = Tables(spark, sf_dir).documents
    par = spark.sparkContext.defaultParallelism
    toks = docs.repartition(par).select(
        F.split(F.trim("text"), r"\s+").alias("t")
    )
    grams = toks.select(
        F.explode(
            F.expr(
                "transform(slice(t, 1, greatest(size(t) - 4, 0)),"
                " (w, i) -> concat_ws(' ', slice(t, i + 1, 5)))"
            )
        ).alias("g")
    )
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return freq.agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_grams"),
        F.sum(F.when(F.col("n") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_grams"),
        F.sum("n").cast("long").alias("n_occurrences"),
        F.sum(F.when(F.col("n") >= 2, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_dup_occurrences"),
        F.expr(
            "CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) * 1000000"
            " DIV sum(n) AS BIGINT)"
        ).alias("dup_occurrence_ppm"),
    )


# ---------------------------------------------------------------------------
# SemDeDup: cluster-pruned semantic deduplication (Abbas et al., 2023)
# ---------------------------------------------------------------------------

_SEMDEDUP_N = 500  # corpus bound (each vector appears twice -> 2N rows)
_SEMDEDUP_TAU = 0.95
# cluster-size rail: clusters above this population are excluded from
# the within-cluster pair verify (skip-and-count, like an oversized
# LSH bucket).  2N/k ~ 125 here, so the rail only trips when k-means
# collapses — mirrored verbatim in the oracle so both engines skip
# the same clusters.
_SEMDEDUP_CAP = 400


def _semdedup_oracle() -> str:
    from map2db_spark.queries_pipeline import _SHIFT, _kmeans_cte_parts

    corpus = f"""
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_SEMDEDUP_N}
      UNION ALL
      SELECT vec_id + {_SHIFT}, embedding FROM embeddings
      WHERE vec_id < {_SEMDEDUP_N}
    """
    parts = _kmeans_cte_parts(k=8, iters=3, dim=64, corpus_sql=corpus)
    cos = (
        "round(list_dot_product(x.iv, y.iv) / "
        "(sqrt(list_dot_product(x.iv, x.iv)) * "
        "sqrt(list_dot_product(y.iv, y.iv))), 6)"
    )
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined},
    small_cid AS (
      SELECT cid FROM a3 GROUP BY cid HAVING count(*) <= {_SEMDEDUP_CAP}
    ),
    railed AS (
      SELECT a.* FROM a3 a SEMI JOIN small_cid s ON a.cid = s.cid
    ),
    pairs AS (
      SELECT x.vec_id AS u, y.vec_id AS v
      FROM railed x JOIN railed y
        ON x.cid = y.cid AND x.vec_id < y.vec_id
      WHERE {cos} >= {_SEMDEDUP_TAU}
    ),
    drops AS (SELECT DISTINCT v FROM pairs)
    SELECT a.cid,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(count(d.v) AS BIGINT) AS n_dropped,
           CAST(count(d.v) * 1000000 // count(*) AS BIGINT) AS drop_ppm
    FROM a3 a LEFT JOIN drops d ON d.v = a.vec_id
    GROUP BY a.cid ORDER BY a.cid
    """


@query(
    "c_semdedup",
    oracle=_semdedup_oracle(),
    tags=("dedup", "embedding", "clustering", "curation", "pipeline"),
)
def c_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup — cluster-pruned SEMANTIC deduplication (the public
    Abbas et al. 2023 recipe): k-means clusters the embedding corpus,
    and near-duplicate detection (cosine >= tau) runs ONLY within each
    cluster — the cluster id prunes the N^2 pair space to
    sum-of-cluster-sizes^2, which is the whole point of the method (k
    grows with N so per-cluster populations stay SIZED; a degenerate
    cluster is the same hazard as a hot LSH bucket and takes the same
    cap rail: clusters above _SEMDEDUP_CAP are skipped by the pair
    verify, skip-and-count, mirrored in the oracle — their members
    are reported with zero drops and recoverable through the LSH
    path).  Of each near-dup pair the lower vec_id survives; the
    corpus here doubles every vector (vec_id + shift) so exact
    semantic duplicates exist by construction and the expected drop
    rate is ~50% per cluster.

    Exactness: clustering is the deterministic exact-integer Lloyd's
    loop shared with v_kmeans_clusters (assignments bit-identical to
    the layered-CTE oracle); cosine is one shared IEEE expression over
    exact integer vectors, rounded before thresholding.

    Scale shape: the Lloyd's loop is O(partitions*k*dim) traffic per
    iteration; the pair join shuffles on cid only; the drop list is
    O(duplicates) and the report is a k-row aggregate.
    """
    from map2db_spark.functions.clustering import kmeans_assignments
    from map2db_spark.queries_pipeline import _SHIFT

    emb = (
        Tables(spark, sf_dir).embeddings.where(F.col("vec_id") < _SEMDEDUP_N)
        .select("vec_id", "embedding")
    )
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + _SHIFT).alias("vec_id"), "embedding")
    )
    a = kmeans_assignments(corpus, k=8, iters=3, dim=64).persist()
    # skew rail: only clusters within the population cap feed the
    # quadratic pair verify (skip-and-count; see _SEMDEDUP_CAP)
    small = (
        a.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("csz"))
        .where(F.col("csz") <= _SEMDEDUP_CAP)
        .select("cid")
    )
    railed = a.join(small, ["cid"], "left_semi")
    x = railed.select(F.col("vid").alias("u"), F.col("iv").alias("xiv"), "cid")
    y = railed.select(F.col("vid").alias("v"), F.col("iv").alias("yiv"), "cid")
    dot = F.aggregate(
        F.zip_with("xiv", "yiv", lambda p, q: p * q),
        F.lit(0).cast("long"),
        lambda s, t: s + t,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.zip_with(c, c, lambda p, q: p * q),
            F.lit(0).cast("long"),
            lambda s, t: s + t,
        ).cast("double")
    )
    cos = F.round(dot.cast("double") / (norm("xiv") * norm("yiv")), 6)
    pairs = (
        x.join(y, "cid")
        .where(F.col("u") < F.col("v"))
        .where(cos >= _SEMDEDUP_TAU)
        .select("v")
    )
    drops = pairs.distinct()
    return (
        a.join(F.broadcast(drops), a["vid"] == drops["v"], "left")
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.count("v").cast("long").alias("n_dropped"),
            F.expr(
                "CAST(count(v) * 1000000 DIV count(*) AS BIGINT)"
            ).alias("drop_ppm"),
        )
        .orderBy("cid")
    )


# ---------------------------------------------------------------------------
# Spark 4 SQL surface: string collations + named parameter markers
# ---------------------------------------------------------------------------


@query(
    "f_collated_grouping",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                  ELSE event_type END AS s
      FROM events
    )
    SELECT lower(min(s)) AS k, CAST(count(*) AS BIGINT) AS n, min(s) AS min_s
    FROM s GROUP BY lower(s) ORDER BY k
    """,
    tags=("functions", "sql-surface", "collation"),
)
def f_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string COLLATIONS: grouping on ``collate(s,
    'UTF8_LCASE')`` merges case variants at the COMPARISON level — no
    lower() rewrite of the data — the new engine-native way to get
    case-insensitive semantics (per-column collation is how SQL
    engines express locale/case rules; the oracle proves the UTF8_LCASE
    equivalence classes equal lower()-equality for this data).
    Deterministic output: the representative is min(s) under binary
    collation, not the engine's arbitrary group exemplar.

    Scale shape: one combinable aggregate over the collated key; the
    collated comparison is a per-row key transform inside codegen.
    The SortAggregate this plans is ADJUDICATED, not an oversight
    (r16): GROUPING on a non-binary-collated key is sort-based by
    Spark 4.1 engine design (hash aggregation requires binary-
    comparable group keys), so the plan sorts regardless of which
    aggregates ride it — splitting min(s) onto the extrema.py window
    path was tried and only ADDED a second sorted pass over the same
    rows without removing the first (plans/r16/
    f_collated_grouping_{before,split_attempt}.txt); the one-pass
    form is the cheapest shape the engine offers for collated
    grouping."""
    ev = Tables(spark, sf_dir).events
    s = F.when(
        F.col("event_id") % 2 == 0, F.upper("event_type")
    ).otherwise(F.col("event_type"))
    base = ev.select(s.alias("s"))
    return (
        base.groupBy(F.expr("collate(s, 'UTF8_LCASE')").alias("ck"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(F.col("s").cast("string")).alias("min_s"),
        )
        .select(F.lower("min_s").alias("k"), "n", "min_s")
        .orderBy("k")
    )


@query(
    "f_parameterized_sql",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_extendedprice * (100 - l_discount * 100))
                AS BIGINT)) AS BIGINT) AS rev_scaled
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02' AND l_quantity < 24
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("functions", "sql-surface", "parameters"),
)
def f_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named PARAMETER MARKERS (spark.sql(..., args={...})) — the
    injection-safe way to template SQL: the values bind as typed
    literals at parse time, never via string concatenation, so user
    input cannot alter query structure and plans stay cacheable by
    shape.  The oracle inlines the same constants; identical results
    prove the binding is literal-equivalent (the Catalyst constant
    folding sees exactly the inlined plan).

    Scale shape: plain filtered aggregate with both predicates pushed
    to the scan."""
    li = Tables(spark, sf_dir).lineitem
    li.createOrReplaceTempView("lineitem_param")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_extendedprice * (100 - l_discount * 100))
                    AS BIGINT)) AS BIGINT) AS rev_scaled
        FROM lineitem_param
        WHERE l_shipdate <= :cutoff AND l_quantity < :maxqty
        GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        args={"cutoff": "1998-09-02", "maxqty": 24},
    )


# ---------------------------------------------------------------------------
# Python UDTF surface (LATERAL table function)
# ---------------------------------------------------------------------------

_UDTF_W = 25  # chunk width (tokens)


@query(
    "u_python_udtf",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents WHERE doc_id < 100
    ),
    chunks AS (
      SELECT doc_id, i.i AS chunk_idx,
             array_to_string(
               list_slice(t, i.i * {_UDTF_W} + 1, (i.i + 1) * {_UDTF_W}), ' '
             ) AS chunk
      FROM toks CROSS JOIN LATERAL (
        SELECT unnest(generate_series(
          0, CAST(ceil(len(t) / {_UDTF_W}.0) AS INT) - 1)) AS i
      ) i
    )
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(len(regexp_split_to_array(chunk, ' ')) AS INTEGER)
             AS n_tokens,
           md5(chunk) AS chunk_md5
    FROM chunks
    """,
    tags=("udf-surface", "udtf", "chunking", "pipeline"),
)
def u_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface — ``@udtf`` + ``LATERAL chunker(...)`` in
    SQL: a user-defined TABLE function fans each document into
    fixed-width token chunks (the training-sequence chunking step)
    with per-chunk index, token count and content hash, value-checked
    against the SQL slicing oracle.  Like u_arrow_python_udf, this
    covers the API surface, not the hot-path recommendation: UDTFs
    run row-at-a-time Python, so corpus-scale chunking belongs in the
    Arrow kernels (c_sequence_packing / mapInPandas) — but the
    LATERAL-table-function shape is what makes ad-hoc explode logic
    expressible directly in SQL by analysts."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string, n_tokens int")
    class Chunker:
        def eval(self, text: str, width: int):
            toks = text.split()
            for i in range(0, len(toks), width):
                part = toks[i : i + width]
                yield (i // width, " ".join(part), len(part))

    spark.udtf.register("m2db_chunker", Chunker)
    docs = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 100)
    docs.createOrReplaceTempView("docs_udtf")
    return spark.sql(
        f"""
        SELECT doc_id, c.chunk_idx, c.n_tokens, md5(c.chunk) AS chunk_md5
        FROM docs_udtf, LATERAL m2db_chunker(trim(text), {_UDTF_W}) AS c
        """
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon vocabulary divergence between sources (corpus drift)
# ---------------------------------------------------------------------------


@query(
    "t_js_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
      FROM documents WHERE source IN ('src0', 'src1')
    ),
    c AS (
      SELECT t,
             CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c2
      FROM tok GROUP BY t
    ),
    n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                 CAST(sum(c2) AS BIGINT) AS n2 FROM c),
    terms AS (
      SELECT
        CASE WHEN c1 > 0 THEN CAST(round(1000000 * 0.5
             * (CAST(c1 AS DOUBLE) / n1)
             * ln((CAST(c1 AS DOUBLE) / n1)
                  / (0.5 * (CAST(c1 AS DOUBLE) / n1
                            + CAST(c2 AS DOUBLE) / n2)))) AS BIGINT)
             ELSE 0 END AS pa,
        CASE WHEN c2 > 0 THEN CAST(round(1000000 * 0.5
             * (CAST(c2 AS DOUBLE) / n2)
             * ln((CAST(c2 AS DOUBLE) / n2)
                  / (0.5 * (CAST(c1 AS DOUBLE) / n1
                            + CAST(c2 AS DOUBLE) / n2)))) AS BIGINT)
             ELSE 0 END AS pb
      -- degenerate-input audit (r14): an absent source (n1 or n2 = 0)
      -- makes the quotients 0/0 — Spark ANSI raises where DuckDB
      -- yields NULL; with no second distribution the JSD is
      -- undefined: emit the empty term set (n_terms 0, jsd NULL) on
      -- BOTH engines
      FROM c CROSS JOIN n WHERE n1 > 0 AND n2 > 0
    )
    SELECT 'src0' AS source_a, 'src1' AS source_b,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(pa) + sum(pb) AS BIGINT) AS jsd_micro
    FROM terms
    """,
    tags=("text", "drift", "statistics", "pipeline"),
)
def t_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between two sources' VOCABULARY
    distributions — the categorical drift metric next to x_psi_drift's
    numeric one: JSD = 0.5*KL(P||M) + 0.5*KL(Q||M) over term
    frequencies, symmetric and bounded (ln 2), the number a corpus
    review quotes for "how different is this source's language".

    Exactness: every ln applies to an identical double quotient of
    exact integer counts and each term rounds to integer micro-nats
    BEFORE summation — order-independent, the t_bigram_perplexity
    convention.

    Scale shape: one token explode -> map-side-combinable conditional
    counts per term -> broadcast totals -> one collapse; the term
    table is vocabulary-sized.
    """
    docs = Tables(spark, sf_dir).documents.where(
        F.col("source").isin("src0", "src1")
    )
    tok = docs.select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("t")
    )
    c = tok.groupBy("t").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    n = c.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    ct = c.crossJoin(F.broadcast(n)).where(
        (F.col("n1") > 0) & (F.col("n2") > 0)
    )
    p = F.col("c1").cast("double") / F.col("n1")
    q = F.col("c2").cast("double") / F.col("n2")
    m = 0.5 * (p + q)
    pa = F.when(
        F.col("c1") > 0,
        F.round(F.lit(1000000) * 0.5 * p * F.log(p / m)).cast("long"),
    ).otherwise(0)
    pb = F.when(
        F.col("c2") > 0,
        F.round(F.lit(1000000) * 0.5 * q * F.log(q / m)).cast("long"),
    ).otherwise(0)
    return ct.select(pa.alias("pa"), pb.alias("pb")).agg(
        F.lit("src0").alias("source_a"),
        F.lit("src1").alias("source_b"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        (F.sum("pa") + F.sum("pb")).cast("long").alias("jsd_micro"),
    )


# ---------------------------------------------------------------------------
# Filtered ANN: metadata predicate BEFORE the distance math
# ---------------------------------------------------------------------------


@query(
    "v_ann_filtered",
    oracle=f"""
    WITH iv AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM iv WHERE vec_id < 3),
    cand AS (SELECT * FROM iv WHERE vec_id % 7 IN (2, 5)),
    scored AS (
      SELECT q.query_id, c.vec_id AS cand_id,
             round(list_dot_product(qv, c.v)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
      FROM cand c CROSS JOIN q
      WHERE c.vec_id != q.query_id
    )
    SELECT query_id, cand_id, sim, CAST(rank AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, cand_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    tags=("ann", "filtered-search", "pipeline"),
)
def v_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search — the workload shape vector databases
    are actually asked for ("nearest docs WHERE lang = .. AND date >
    .."): the metadata predicate applies BEFORE any distance math, so
    selectivity directly cuts the scored set (post-filtering top-k
    instead would silently return fewer than k under tight filters —
    the classic filtered-ANN bug this query's shape avoids).  With an
    index (IVF/LSH) the same predicate composes with the bucket probe;
    the exact filtered scan here is both the baseline and the ground
    truth for measuring that composition's recall.

    Scale shape: filter -> broadcast query side -> per-partition top-k
    heap (TakeOrderedAndProject per query) — the corpus is scanned
    once, never shuffled.
    """
    from map2db_spark.functions import similarity as S

    emb = Tables(spark, sf_dir).embeddings
    queries = emb.where(F.col("vec_id") < 3)
    cands = emb.where((F.col("vec_id") % 7).isin(2, 5))
    return S.brute_force_topk(cands, queries, k=5)


# ---------------------------------------------------------------------------
# BM25 retrieval (the lexical-search baseline)
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("table", "window", "stream")


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM tok
           GROUP BY doc_id),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(len) AS BIGINT) AS total_len FROM dl),
    tf AS (
      SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE t IN ({terms}) GROUP BY doc_id, t
    ),
    df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
    scored AS (
      SELECT tf.doc_id,
             CAST(round(1000000
               * ln((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * ({_BM25_K1} + 1.0))
               / (tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * CAST(len AS DOUBLE) * n / total_len))
             ) AS BIGINT) AS s_micro
      FROM tf
      JOIN df USING (t)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    ),
    agg AS (
      SELECT doc_id, CAST(sum(s_micro) AS BIGINT) AS bm25_micro
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, bm25_micro, CAST(rank AS INT) AS rank FROM (
      SELECT *, row_number() OVER (ORDER BY bm25_micro DESC, doc_id) AS rank
      FROM agg
    ) WHERE rank <= 15
    """


@query(
    "x_bm25_retrieval",
    oracle=_bm25_oracle(),
    tags=("text", "retrieval", "ranking", "pipeline"),
)
def x_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 — THE lexical retrieval baseline (Okapi k1/b form, with
    the +1 idf floor that keeps common terms non-negative): top-15
    documents for a fixed 3-term query, scored with document-length
    normalization against the corpus average.  Every per-(doc, term)
    contribution is one shared IEEE expression over exact integer
    (tf, df, len, N, total_len) rounded to integer micro BEFORE the
    per-doc sum, so ranking is reduction-order independent and the
    doc_id tiebreak makes top-k deterministic.

    Scale shape: token explode -> doc-length aggregate (map-side) +
    tf aggregate restricted to query terms (the IN pre-filter means
    the tf shuffle carries only matching postings — the inverted-
    index access pattern); df and corpus stats broadcast; final
    top-15 is TakeOrderedAndProject, no global sort.
    """
    docs = Tables(spark, sf_dir).documents
    par = spark.sparkContext.defaultParallelism
    tok = docs.repartition(par).select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("t")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("len"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("len").cast("long").alias("total_len"),
    )
    tf = (
        tok.where(F.col("t").isin(*_BM25_TERMS))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log(
        (F.col("n").cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        + 1.0
    )
    tfn = (F.col("tf") * (_BM25_K1 + 1.0)) / (
        F.col("tf")
        + _BM25_K1
        * (
            1.0
            - _BM25_B
            + _BM25_B
            * F.col("len").cast("double")
            * F.col("n")
            / F.col("total_len")
        )
    )
    scored = (
        tf.join(F.broadcast(df), "t")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(F.lit(1000000) * idf * tfn).cast("long").alias("s_micro"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("s_micro").cast("long").alias("bm25_micro")
    )
    w = Window.orderBy(F.desc("bm25_micro"), F.col("doc_id"))
    return (
        agg.orderBy(F.desc("bm25_micro"), "doc_id")
        .limit(15)
        .select(
            "doc_id",
            "bm25_micro",
            F.row_number().over(w).cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix (heuristic vs labeled ground truth)
# ---------------------------------------------------------------------------


def _lang_confusion_oracle() -> str:
    from map2db_spark.queries_pipeline import _langid_expr_sql

    return f"""
    SELECT lang AS labeled,
           {_langid_expr_sql()} AS detected,
           CAST(count(*) AS BIGINT) AS n
    FROM documents
    GROUP BY 1, 2 ORDER BY 1, 2
    """


@query(
    "t_lang_confusion",
    oracle=_lang_confusion_oracle(),
    tags=("text", "evaluation", "pipeline"),
)
def t_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID CONFUSION MATRIX: the stopword-inventory heuristic
    (t_language_id) evaluated against the corpus's labeled lang
    column — per (labeled, detected) cell counts, the table a
    curation review reads before trusting a classifier to gate data
    (which languages leak into 'en'? which fall to 'unknown'?).
    t_language_id histograms predictions alone; this is the paired
    evaluation that turns it into a measured error profile.

    Scale shape: one map-only projection + one map-side-combinable
    two-column aggregate over a bounded (langs x langs) key space.
    """
    from map2db_spark.functions.text import detect_language

    docs = Tables(spark, sf_dir).documents
    return (
        docs.select(
            F.col("lang").alias("labeled"),
            detect_language(F.col("text")).alias("detected"),
        )
        .groupBy("labeled", "detected")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("labeled", "detected")
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (the memory-bounded scale variant)
# ---------------------------------------------------------------------------

_CB_M = 65536  # filter bits
_CB_K = 4  # hash functions
_CB_N = 8  # gram width (matches c_decontaminate)


def _contamination_bloom_oracle() -> str:
    from map2db_spark.queries_curation import _grams_sql

    pos = ",\n             ".join(
        f"CAST(concat('0x', substr(md5('cb{i}:' || gram), 1, 8)) AS BIGINT)"
        f" % {_CB_M} AS p{i}"
        for i in range(_CB_K)
    )
    bld = " UNION ALL ".join(
        f"SELECT p{i} AS pos FROM build_pos" for i in range(_CB_K)
    )
    prb = " UNION ALL ".join(
        f"SELECT doc_id, gram, p{i} AS pos FROM probe_pos"
        for i in range(_CB_K)
    )
    return f"""
    WITH grams AS (
      SELECT doc_id, unnest({_grams_sql(_CB_N)}) AS gram FROM documents
    ),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 17 = 0),
    build_pos AS (SELECT {pos} FROM bench),
    bits AS (SELECT DISTINCT pos FROM ({bld})),
    tg AS (
      SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 17 <> 0
    ),
    probe_pos AS (SELECT doc_id, gram, {pos} FROM tg),
    hits AS (
      SELECT pp.doc_id, pp.gram, CAST(count(b.pos) AS BIGINT) AS n_set
      FROM ({prb}) pp LEFT JOIN bits b ON b.pos = pp.pos
      GROUP BY pp.doc_id, pp.gram
    ),
    bloom_docs AS (
      SELECT DISTINCT doc_id FROM hits WHERE n_set = {_CB_K}
    ),
    exact_docs AS (
      SELECT DISTINCT t.doc_id FROM tg t JOIN bench USING (gram)
    )
    SELECT CAST((SELECT count(*) FROM exact_docs) AS BIGINT) AS n_exact,
           CAST((SELECT count(*) FROM bloom_docs) AS BIGINT) AS n_bloom,
           CAST((SELECT count(*) FROM exact_docs e
                 JOIN bloom_docs b ON b.doc_id = e.doc_id) AS BIGINT)
             AS n_caught,
           CAST((SELECT count(*) FROM bloom_docs) -
                (SELECT count(*) FROM exact_docs e
                 JOIN bloom_docs b ON b.doc_id = e.doc_id) AS BIGINT)
             AS n_false_flagged
    """


@query(
    "c_contamination_bloom",
    oracle=_contamination_bloom_oracle(),
    tags=("curation", "decontamination", "sketch", "pipeline"),
)
def c_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter DECONTAMINATION — the memory-bounded variant of
    c_decontaminate: instead of broadcasting the benchmark's n-gram
    SET (gigabytes once eval suites pile up), broadcast an m-bit
    Bloom filter (here 64Kbit, k=4 md5 positions — constant size
    regardless of benchmark growth) and flag any training doc whose
    grams all-bits-hit.  The result certifies the operational
    contract: n_caught = n_exact (ZERO false negatives — no
    contaminated doc escapes), and n_false_flagged quantifies the
    over-quarantine cost a production run trades for the bounded
    broadcast (flagged docs can be re-checked exactly, so fp only
    costs recheck work, never leakage).

    Scale shape: filter build is bench-side only; the corpus probes
    through k CHAINED broadcast semi-joins against the bounded bit
    table — entirely map-side, so the only corpus-keyed exchange is
    the final distinct over flagged doc_ids (O(flagged), tiny); same
    dataflow as the exact path but with O(m) instead of O(benchmark)
    broadcast state.
    """
    from map2db_spark.functions.dedup import word_shingles

    docs = Tables(spark, sf_dir).documents
    grams = docs.select(
        "doc_id",
        F.explode(word_shingles(F.col("text"), _CB_N)).alias("gram"),
    )
    bench = grams.where(F.col("doc_id") % 17 == 0).select("gram").distinct()
    # no corpus-side distinct: duplicate (doc, gram) rows are harmless
    # to flag-only semantics (the final doc_id distincts dedup), and
    # dropping it removes the last corpus-keyed exchange
    tg = grams.where(F.col("doc_id") % 17 != 0)

    def pos(i: int) -> F.Column:
        h = F.md5(F.concat(F.lit(f"cb{i}:"), F.col("gram")))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _CB_M

    bits = None
    for i in range(_CB_K):
        b = bench.select(pos(i).alias("pos"))
        bits = b if bits is None else bits.unionByName(b)
    bits = bits.distinct()

    # all-k-bits-set via CHAINED broadcast semi-joins — each probe
    # column checks against the bounded bit table map-side, so the
    # gram stream is never unioned k-fold or shuffled for a count
    g = tg.select(
        "doc_id", "gram", *[pos(i).alias(f"p{i}") for i in range(_CB_K)]
    )
    for i in range(_CB_K):
        g = g.join(
            F.broadcast(bits.select(F.col("pos").alias(f"p{i}"))),
            f"p{i}",
            "left_semi",
        )
    bloom_docs = g.select("doc_id").distinct()
    exact_docs = (
        tg.join(F.broadcast(bench), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    ne = exact_docs.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    nb = bloom_docs.agg(F.count(F.lit(1)).cast("long").alias("n_bloom"))
    nc = exact_docs.join(bloom_docs, "doc_id", "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_caught")
    )
    return (
        ne.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nc))
        .select(
            "n_exact",
            "n_bloom",
            "n_caught",
            (F.col("n_bloom") - F.col("n_caught"))
            .cast("long")
            .alias("n_false_flagged"),
        )
    )


# ---------------------------------------------------------------------------
# Betweenness centrality (integer-truncated Brandes, seeded + bounded)
# ---------------------------------------------------------------------------

_BC_SEEDS = 3
_BC_DEPTH = 3
_BC_MICRO = 1_000_000
# per-order item cap: the co-purchase pair builder is quadratic in the
# items of one order, so the estimator contract is enforced by the
# OPERATOR (skip-and-count degenerate orders, mirrored in the oracle),
# not by the fixture-shaped l_partkey < 4000 sample bound.  TPC-H
# orders carry <= 7 lineitems, so the rail trips only on degenerate
# bulk/template orders — exactly the rows that are artifacts, not
# co-purchase signal.
_BC_ORDER_CAP = 25


def _copurchase_edges(li0: DataFrame, order_cap: int) -> DataFrame:
    """Undirected co-purchase edge table from a distinct (o, p) table,
    with the per-order pair-count rail: the pair self-join is
    quadratic per order, so orders with more than ``order_cap``
    distinct items are skipped entirely (skip-and-count — a
    degenerate bulk order is a template artifact, not co-purchase
    signal).  Unit-tested directly in test_operators.py."""
    ok = (
        li0.groupBy("o")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .where(F.col("n_items") <= order_cap)
        .select("o")
    )
    li = li0.join(ok, ["o"], "left_semi")
    e = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")),
        )
        .select(F.col("x.p").alias("u"), F.col("y.p").alias("v"))
        .distinct()
    )
    return e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _betweenness_oracle() -> str:
    D = _BC_DEPTH
    parts = [
        "li0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p\n      FROM lineitem WHERE l_partkey < 4000)",
        f"ok AS (SELECT o FROM li0 GROUP BY o HAVING count(*) <= {_BC_ORDER_CAP})",
        "li AS (SELECT li0.* FROM li0 SEMI JOIN ok ON li0.o = ok.o)",
        """e AS (SELECT a.p AS u, b.p AS v
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2)""",
        "adj AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e)",
        "deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u)",
        f"seeds AS (SELECT node FROM deg ORDER BY d DESC, node LIMIT {_BC_SEEDS})",
        "l0 AS (SELECT node AS seed, node, CAST(1 AS BIGINT) AS sigma FROM seeds)",
        "vis0 AS (SELECT seed, node FROM l0)",
    ]
    for d in range(1, D + 1):
        parts.append(f"""l{d} AS (
      SELECT p.seed, adj.v AS node, CAST(sum(p.sigma) AS BIGINT) AS sigma
      FROM l{d - 1} p JOIN adj ON adj.u = p.node
      WHERE NOT EXISTS (SELECT 1 FROM vis{d - 1} x
                        WHERE x.seed = p.seed AND x.node = adj.v)
      GROUP BY 1, 2)""")
        parts.append(
            f"vis{d} AS (SELECT seed, node FROM vis{d - 1} "
            f"UNION SELECT seed, node FROM l{d})"
        )
    parts.append(
        f"d{D} AS (SELECT seed, node, CAST(0 AS BIGINT) AS dm FROM l{D})"
    )
    for d in range(D - 1, -1, -1):
        parts.append(f"""c{d} AS (
      SELECT cur.seed, cur.node,
             cur.sigma * ({_BC_MICRO} + nx.dm) // w.sigma AS c
      FROM l{d} cur
      JOIN adj ON adj.u = cur.node
      JOIN l{d + 1} w ON w.seed = cur.seed AND w.node = adj.v
      JOIN d{d + 1} nx ON nx.seed = w.seed AND nx.node = w.node)""")
        parts.append(f"""d{d} AS (
      SELECT cur.seed, cur.node, CAST(coalesce(s.c, 0) AS BIGINT) AS dm
      FROM l{d} cur LEFT JOIN (
        SELECT seed, node, sum(c) AS c FROM c{d} GROUP BY 1, 2) s
      ON s.seed = cur.seed AND s.node = cur.node)""")
    union = " UNION ALL ".join(
        f"SELECT seed, node, dm FROM d{d}" for d in range(D + 1)
    )
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined},
    alld AS ({union})
    SELECT node, CAST(sum(dm) AS BIGINT) AS bc_micro
    FROM alld WHERE node <> seed
    GROUP BY node
    ORDER BY bc_micro DESC, node LIMIT 15
    """


@query(
    "g_betweenness",
    oracle=_betweenness_oracle(),
    tags=("graph", "centrality", "analytics"),
)
def g_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEENNESS centrality — the last of the four classic
    centralities (degree/assortativity, harmonic-closeness,
    eigenvector-family PageRank/HITS are already registered) — via
    Brandes' algorithm from the top-degree seed set within a bounded
    radius: forward layered BFS accumulates shortest-path counts
    (sigma), then dependencies back-propagate layer by layer
    (delta(v) = sum over successors w of sigma_v/sigma_w *
    (1 + delta(w))).  Seeded + depth-bounded is the standard
    production estimator (exact Brandes is O(V*E)); the truncation
    radius and seed count are the knobs.

    Cross-engine exactness: the dependency ratio is carried as the
    INTEGER recursion delta_micro(v) = sum(sigma_v * (1e6 +
    delta_micro(w)) DIV sigma_w) — truncating integer division at
    each step, so both engines run the identical integer program and
    the aggregate is reduction-order independent (float Brandes would
    diverge in the last ulp across partitionings).

    Scale shape: per layer one frontier-keyed neighbor join + one
    visited anti-join (the g_bfs_layers shape, with sigma as a
    map-side-combinable sum); the backward pass is one co-keyed join
    per layer; layers are checkpointed so plan depth stays flat.
    Cost is O(seeds * depth) bounded joins, never all-pairs.
    """
    t = Tables(spark, sf_dir)
    # sf-independent subgraph cap: betweenness is a seeded, bounded
    # ESTIMATOR by design — the cap keeps the co-purchase subgraph
    # (and the oracle's layered CTEs) a fixed size at every sf, the
    # same bounded-sample shape as d_minhash_recall_eval
    li0 = (
        t.lineitem.where(F.col("l_partkey") < 4000)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    # per-order pair-count rail (skip-and-count, mirrored in the
    # oracle): the pair builder is quadratic per order, so a degenerate
    # bulk order is excluded by the operator itself (_copurchase_edges),
    # not by the sample bound above
    edges = _copurchase_edges(li0, _BC_ORDER_CAP).localCheckpoint()
    deg = edges.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    seeds = [
        r["node"]
        for r in deg.orderBy(F.desc("d"), "node").limit(_BC_SEEDS).collect()
    ]
    seed_df = spark.createDataFrame([(s,) for s in seeds], "seed long")
    l0 = seed_df.select(
        "seed", F.col("seed").alias("node"), F.lit(1).cast("long").alias("sigma")
    )
    layers = [l0.localCheckpoint()]
    visited = layers[0].select("seed", "node").localCheckpoint()
    for _d in range(1, _BC_DEPTH + 1):
        raw = (
            layers[-1]
            .join(edges, layers[-1]["node"] == edges["u"])
            .select("seed", F.col("v").alias("node"), "sigma")
        )
        nxt = (
            raw.join(visited, ["seed", "node"], "left_anti")
            .groupBy("seed", "node")
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .localCheckpoint()
        )
        layers.append(nxt)
        visited = visited.unionByName(nxt.select("seed", "node")).localCheckpoint()
    delta = layers[_BC_DEPTH].select(
        "seed", "node", F.lit(0).cast("long").alias("dm")
    )
    all_deltas = [delta]
    for d in range(_BC_DEPTH - 1, -1, -1):
        cur = layers[d]
        succ = (
            layers[d + 1]
            .select("seed", F.col("node").alias("wnode"), F.col("sigma").alias("sigw"))
            .join(
                delta.select(
                    "seed", F.col("node").alias("wnode"), F.col("dm").alias("dw")
                ),
                ["seed", "wnode"],
            )
        )
        contrib = (
            cur.join(edges, cur["node"] == edges["u"])
            .select("seed", "node", "sigma", F.col("v").alias("wnode"))
            .join(succ, ["seed", "wnode"])
            .select(
                "seed",
                "node",
                F.expr(
                    f"CAST(sigma * ({_BC_MICRO} + dw) DIV sigw AS BIGINT)"
                ).alias("c"),
            )
        )
        delta = (
            cur.select("seed", "node")
            .join(
                contrib.groupBy("seed", "node").agg(
                    F.sum("c").cast("long").alias("dm")
                ),
                ["seed", "node"],
                "left",
            )
            .select(
                "seed", "node",
                F.coalesce("dm", F.lit(0)).cast("long").alias("dm"),
            )
            .localCheckpoint()
        )
        all_deltas.append(delta)
    alld = all_deltas[0]
    for p in all_deltas[1:]:
        alld = alld.unionByName(p)
    return (
        alld.where(F.col("node") != F.col("seed"))
        .groupBy("node")
        .agg(F.sum("dm").cast("long").alias("bc_micro"))
        .orderBy(F.desc("bc_micro"), "node")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# VP8L normal-code + LZ77 pixel decode (r3 verdict item 5)
# ---------------------------------------------------------------------------


@query(
    "m_webp_lz77_pixels",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             8 + doc_id % 5 AS w,
             6 + doc_id % 4 AS h
      FROM documents WHERE doc_id < 30
    )
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(3 * h * w * (w - 1) // 2 + 2 * w * (h // 2)
                + w * h * doc_id AS BIGINT) AS sum_r,
           CAST(h * (5 * w * (w - 1) // 2 + (40 + doc_id % 7) * w)
                AS BIGINT) AS sum_g,
           CAST(w * (2 * (h // 2) + (60 + doc_id % 11) * h)
                AS BIGINT) AS sum_b,
           CAST(255 * w * h AS BIGINT) AS sum_a,
           CAST(1 AS BIGINT) AS lz_smaller
    FROM g
    """,
    tags=("multimodal", "image", "pixels", "webp", "lz77"),
)
def m_webp_lz77_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VP8L NORMAL-code + LZ77 pixel decode — the round-4 extension of
    m_webp_pixels beyond the simple-code subset: per row, a many-valued
    gradient image (r = 3x + 2*(y%2) + doc_id, g = 5x + 40 + d%7,
    b = 2*(y%2) + 60 + d%11 — dozens of distinct symbols per channel, so
    every channel takes a length-limited package-merge Huffman code in
    the spec's NORMAL form, code lengths entropy-coded by the 19-symbol
    code-length code) whose alternating row pattern repeats with period
    two, so the greedy matcher emits genuine LZ77 backward references
    (direct distance codes).  The image is ENCODED into a real VP8L
    bitstream, DECODED back through the same spec layout inside one
    Arrow kernel, and the channel sums come from the DECODED array; the
    oracle recomputes them in closed form, so a hash match certifies
    the whole normal-code + LZ77 encode/decode bit path.  lz_smaller
    additionally pins that the reference-bearing stream beats the
    literal-only encoding of the same image — i.e. the backrefs are
    real, not an idle code path.  Remaining honest stubs:
    palette combined with other transforms, 2D proximity distance
    codes, lossy VP8 (functions/webp_vp8l.py docstring; the color
    cache, subtract-green, meta prefix images and all four transforms
    became real alongside — tested in test_webp.py).

    Scale shape: map-only mapInPandas; payloads never shuffle and
    never touch the driver."""
    import pandas as pd

    from map2db_spark.session import ship_package

    ship_package(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 30
    ).select("doc_id")

    def kernel(batches):
        import numpy as np

        from map2db_spark.functions.webp_vp8l import (
            decode_vp8l,
            encode_vp8l,
        )

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "sum_r": [], "sum_g": [], "sum_b": [], "sum_a": [],
                   "lz_smaller": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 + d % 5, 6 + d % 4
                ys = np.arange(h)[:, None]
                xs = np.arange(w)[None, :]
                img = np.stack(
                    [
                        (3 * xs + 2 * (ys % 2) + d).astype(np.uint8)
                        + np.zeros((h, w), dtype=np.uint8),
                        (5 * xs + 40 + d % 7).astype(np.uint8)
                        + np.zeros((h, w), dtype=np.uint8),
                        (2 * (ys % 2) + 60 + d % 11).astype(np.uint8)
                        + np.zeros((h, w), dtype=np.uint8),
                    ],
                    axis=-1,
                )
                enc = encode_vp8l(img)
                enc_nolz = encode_vp8l(img, use_lz77=False)
                dec = decode_vp8l(enc)
                out["media_id"].append(d)
                out["height"].append(dec.shape[0])
                out["width"].append(dec.shape[1])
                s = dec.astype(np.int64).sum(axis=(0, 1))
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
                out["sum_a"].append(int(s[3]))
                out["lz_smaller"].append(int(len(enc) < len(enc_nolz)))
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        kernel,
        schema=(
            "media_id LONG, width INT, height INT, sum_r LONG, sum_g LONG,"
            " sum_b LONG, sum_a LONG, lz_smaller LONG"
        ),
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (Munro-Paterson compaction) with exact audit
# ---------------------------------------------------------------------------

_QSK_B = 32   # compaction buckets (production: ~ executor count)
_QSK_S = 32   # per-bucket stride (candidate weight)
_QSK_BOUND = 2 * _QSK_B * _QSK_S  # certified rank-error bound
_QSK_PCTS = (1, 5, 25, 50, 75, 95, 99)


@query(
    "x_quantile_sketch",
    oracle=f"""
    WITH v AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             l_orderkey AS okey, l_linenumber AS lnum,
             l_orderkey % {_QSK_B} AS bucket
      FROM lineitem
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    rnk AS (
      SELECT cents, okey, lnum,
             row_number() OVER (PARTITION BY bucket
                                ORDER BY cents, okey, lnum) AS rn
      FROM v
    ),
    cand AS (
      SELECT cents, okey, lnum FROM rnk WHERE rn % {_QSK_S} = {_QSK_S // 2}
    ),
    summ AS (
      SELECT cents,
             {_QSK_S} * row_number() OVER (ORDER BY cents, okey, lnum)
               - {_QSK_S // 2} AS est_rank
      FROM cand
    ),
    targets AS (
      SELECT unnest([{", ".join(str(p) for p in _QSK_PCTS)}]) AS q_pct
    ),
    chosen AS (
      SELECT t.q_pct,
             (t.q_pct * nn.n) // 100 AS target_rank,
             coalesce(
               arg_min(s.cents, s.est_rank)
                 FILTER (s.est_rank >= (t.q_pct * nn.n) // 100),
               max(s.cents)
             ) AS value_cents
      FROM targets t CROSS JOIN nn CROSS JOIN summ s
      GROUP BY t.q_pct, nn.n
    ),
    audited AS (
      SELECT c.q_pct, c.value_cents, c.target_rank,
             CAST(count(*) FILTER (v.cents <= c.value_cents) AS BIGINT)
               AS true_rank
      FROM chosen c CROSS JOIN v
      GROUP BY c.q_pct, c.value_cents, c.target_rank
    )
    SELECT q_pct, value_cents, target_rank, true_rank,
           CAST(abs(true_rank - target_rank) AS BIGINT) AS rank_err,
           CAST(CASE WHEN abs(true_rank - target_rank) <= {_QSK_BOUND}
                     THEN 1 ELSE 0 END AS BIGINT) AS within_bound
    FROM audited ORDER BY q_pct
    """,
    tags=("analytics", "sketch", "quantiles", "mergeable"),
)
def x_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE sketch — the fifth classic sketch alongside
    the registered Misra-Gries, count-min, HyperLogLog and Bloom
    rows, upgrading approximate quantiles from x_approx_quantiles'
    rows-only check to a hash-matched, error-CERTIFIED row: a
    Munro-Paterson-style one-level compaction (each of B
    content-derived buckets sorts locally and keeps every S-th value
    as a weight-S candidate), then each target percentile picks the
    first candidate whose estimated rank reaches the target, and an
    EXACT audit counts the candidate's true rank and certifies
    |true_rank - target_rank| <= 2*B*S.  Every step is deterministic
    integer arithmetic on a content-derived bucketing (l_orderkey %
    B), so both engines build the identical sketch and the bound is
    verified — not assumed — on every run.

    Scale shape: the per-bucket compaction is one partitionBy(B)
    window (B scales with the cluster; deeper corpora stack
    compaction levels, halving weights per level — the knob is
    documented, the one-level contract is what's certified here); the
    candidate summary is N/S rows ranked by the TWO-PASS
    range-partitioned operator (operators/ids.py ranked — no
    single-partition window); the audit is a broadcast of |targets|
    chosen values against one corpus pass.  Candidates and the chosen
    set are the only things that ever leave their partitions.
    """
    from map2db_spark.operators.ids import ranked

    v = Tables(spark, sf_dir).lineitem.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lnum"),
        (F.col("l_orderkey") % _QSK_B).alias("bucket"),
    )
    n_total = v.count()  # exact corpus count (one light action)
    w = Window.partitionBy("bucket").orderBy("cents", "okey", "lnum")
    cand = (
        v.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") % _QSK_S == _QSK_S // 2)
        .select("cents", "okey", "lnum")
    )
    summ, _n_cand = ranked(cand, ["cents", "okey", "lnum"], rank_col="pos")
    summ = summ.select(
        "cents",
        (F.lit(_QSK_S) * (F.col("pos") + 1) - F.lit(_QSK_S // 2)).alias(
            "est_rank"
        ),
    )
    targets = spark.createDataFrame(
        [(p, p * n_total // 100) for p in _QSK_PCTS],
        "q_pct long, target_rank long",
    )
    chosen = (
        targets.crossJoin(summ)
        .groupBy("q_pct", "target_rank")
        .agg(
            F.coalesce(
                F.min_by(
                    "cents",
                    F.when(
                        F.col("est_rank") >= F.col("target_rank"),
                        F.col("est_rank"),
                    ),
                ),
                F.max("cents"),
            ).alias("value_cents")
        )
    )
    audited = (
        v.crossJoin(F.broadcast(chosen))
        .groupBy("q_pct", "value_cents", "target_rank")
        .agg(
            F.sum(
                F.when(F.col("cents") <= F.col("value_cents"), 1).otherwise(0)
            ).cast("long").alias("true_rank")
        )
    )
    err = F.abs(F.col("true_rank") - F.col("target_rank"))
    return audited.select(
        "q_pct", "value_cents", "target_rank", "true_rank",
        err.cast("long").alias("rank_err"),
        F.when(err <= _QSK_BOUND, 1).otherwise(0).cast("long").alias(
            "within_bound"
        ),
    ).orderBy("q_pct")


# ---------------------------------------------------------------------------
# VP8L cross-channel color transform (r4 verdict item 2)
# ---------------------------------------------------------------------------


@query(
    "m_webp_color_transform",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             9 + doc_id % 7 AS w,
             7 + doc_id % 5 AS h
      FROM documents WHERE doc_id < 24
    )
    SELECT doc_id AS media_id,
           CAST(2 + doc_id % 4 AS INTEGER) AS ct_bits,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(3 * h * w * (w - 1) + w * h * (h - 1) // 2
                AS BIGINT) AS sum_r,
           CAST(5 * h * w * (w - 1) // 2 + w * h * (h - 1) // 2
                AS BIGINT) AS sum_g,
           CAST(5 * h * w * (w - 1) + w * h * (h - 1) // 2
                AS BIGINT) AS sum_b,
           CAST(255 * w * h AS BIGINT) AS sum_a,
           CAST(1 AS BIGINT) AS ct_exact
    FROM g
    """,
    tags=("multimodal", "image", "pixels", "webp", "color-transform"),
)
def m_webp_color_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VP8L CROSS-CHANNEL COLOR transform (type 1) certified end to
    end: per row a channel-correlated image (g = (5x + y) % 100,
    r = g + x, b = 2g - y — red and blue track green, exactly the
    content the transform exists for) is encoded with color_bits
    = 2 + doc_id % 4 (block sizes 4..32, widths 9..15 so the last
    block column is partial), which makes the encoder search per-block
    signed 3.5 fixed-point multipliers (g2r/g2b/r2b), subtract the
    (int8*int8)>>5 floor-shift deltas, and carry the cte map as a
    recursively-coded VP8L image; the stream is then DECODED back and
    the channel sums come from the decoded array.  The oracle
    recomputes the sums in closed form (all channel values stay < 256
    by construction: g <= 80, r <= 94, b = 10x + y <= 150), and
    ct_exact pins exact array equality between the decoded image and
    the source — a hash match certifies forward transform, cte-map
    round-trip and floor-semantics inverse together.  Fixed-point
    semantics and multiplier engagement are additionally pinned in
    tests/test_webp.py (test_vp8l_color_transform*).

    Scale shape: map-only mapInPandas; payloads never shuffle and
    never touch the driver."""
    import pandas as pd

    from map2db_spark.session import ship_package

    ship_package(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 24
    ).select("doc_id")

    def kernel(batches):
        import numpy as np

        from map2db_spark.functions.webp_vp8l import (
            decode_vp8l,
            encode_vp8l,
        )

        for pdf in batches:
            out = {"media_id": [], "ct_bits": [], "width": [],
                   "height": [], "sum_r": [], "sum_g": [], "sum_b": [],
                   "sum_a": [], "ct_exact": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 9 + d % 7, 7 + d % 5
                bits = 2 + d % 4
                ys = np.arange(h)[:, None] + np.zeros((1, w), dtype=int)
                xs = np.arange(w)[None, :] + np.zeros((h, 1), dtype=int)
                g = (5 * xs + ys) % 100
                img = np.stack(
                    [g + xs, g, 2 * g - ys], axis=-1
                ).astype(np.uint8)
                dec = decode_vp8l(encode_vp8l(img, color_bits=bits))
                out["media_id"].append(d)
                out["ct_bits"].append(bits)
                out["height"].append(dec.shape[0])
                out["width"].append(dec.shape[1])
                s = dec.astype(np.int64).sum(axis=(0, 1))
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
                out["sum_a"].append(int(s[3]))
                out["ct_exact"].append(
                    int(np.array_equal(dec[:, :, :3], img))
                )
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        kernel,
        schema=(
            "media_id LONG, ct_bits INT, width INT, height INT,"
            " sum_r LONG, sum_g LONG, sum_b LONG, sum_a LONG,"
            " ct_exact LONG"
        ),
    )


# ---------------------------------------------------------------------------
# Seeded-quantizer robustness on an id-sorted crawl (r4 verdict item 6)
# ---------------------------------------------------------------------------

_SEEDROB_N = 240
_SEEDROB_CELLS = 8
_SEEDROB_QMOD = 5  # queries = every 5th vector (48 of 240)


def _seedrob_corpus_sql() -> str:
    """Id-SORTED adversarial crawl: 4 contiguous-id domains (vec_id //
    60), each shifted onto its own axis (0.25x + unit bump at
    component = domain) — exact binary-scale arithmetic both engines.
    Every corpus_seed_centroids seed (vec_id < 8) sits in domain 0."""
    return f"""
      SELECT vec_id,
             list_transform(range(1, 65), i ->
               0.25 * CAST(embedding[i] AS DOUBLE)
               + CASE WHEN i = vec_id // 60 + 1 THEN 1.0 ELSE 0.0 END)
               AS embedding
      FROM embeddings WHERE vec_id < {_SEEDROB_N}
    """


def _ivf_seed_robustness_oracle() -> str:
    from map2db_spark.queries_pipeline import _kmeans_cte_parts

    parts = _kmeans_cte_parts(
        k=_SEEDROB_CELLS, iters=3, dim=64, corpus_sql=_seedrob_corpus_sql()
    )
    dist = ("list_sum(list_transform(generate_series(1, 64), "
            "i -> (v.iv[i] - c.iv[i]) * (v.iv[i] - c.iv[i])))")
    cos = (
        "round(list_dot_product(a.iv, b.iv)"
        " / (sqrt(list_dot_product(a.iv, a.iv))"
        " * sqrt(list_dot_product(b.iv, b.iv))), 6)"
    )
    joined = ",\n    ".join(parts)
    nq = _SEEDROB_N // _SEEDROB_QMOD
    return f"""
    WITH {joined},
    a4 AS (
      SELECT vec_id, iv, cid FROM (
        SELECT s.*, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT v.vec_id, v.iv, c.cid, {dist} AS d
              FROM v CROSS JOIN c3f c) s
      ) WHERE rn = 1
    ),
    nn AS (
      SELECT u, nv FROM (
        SELECT a.vec_id AS u, b.vec_id AS nv,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {cos} DESC, b.vec_id) AS rn
        FROM v a JOIN v b ON b.vec_id != a.vec_id
        WHERE a.vec_id % {_SEEDROB_QMOD} = 0
      ) WHERE rn = 1
    ),
    m AS (
      SELECT 'seeded' AS method, vec_id, cid FROM a1
      UNION ALL
      SELECT 'trained' AS method, vec_id, cid FROM a4
    ),
    bal AS (
      SELECT method, CAST(count(DISTINCT cid) AS BIGINT) AS n_cells_used,
             CAST(max(cnt) * 1000000 // {_SEEDROB_N} AS BIGINT)
               AS max_cell_ppm
      FROM (SELECT method, cid, count(*) AS cnt FROM m GROUP BY method, cid)
      GROUP BY method
    ),
    hit AS (
      SELECT mu.method, CAST(count(*) AS BIGINT) AS nn_in_cell
      FROM nn JOIN m mu ON mu.vec_id = nn.u
              JOIN m mv ON mv.vec_id = nn.nv AND mv.method = mu.method
      WHERE mu.cid = mv.cid
      GROUP BY mu.method
    )
    SELECT bal.method, bal.n_cells_used, bal.max_cell_ppm,
           COALESCE(hit.nn_in_cell, 0) AS nn_in_cell,
           CAST({nq} AS BIGINT) AS n_queries,
           CAST(COALESCE(hit.nn_in_cell, 0) * 1000000 // {nq} AS BIGINT)
             AS nn_recall_ppm
    FROM bal LEFT JOIN hit ON hit.method = bal.method
    ORDER BY bal.method
    """


@query(
    "v_ivf_seed_robustness",
    oracle=_ivf_seed_robustness_oracle(),
    tags=("ann", "ivf", "evaluation", "skew", "quantizer"),
)
def v_ivf_seed_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded-vs-trained coarse-quantizer robustness on an ID-SORTED
    crawl (r4 verdict item 6) — the price tag on
    similarity.corpus_seed_centroids' first-n_cells-by-id seeding,
    mirroring what d_semdedup_recall_hotcell measures for the cluster
    cap.  The fixture is the adversarial case the r4 verdict named:
    ids correlate with content (4 contiguous-id domains, each on its
    own embedding axis), so every seed vector comes from domain 0.
    For both quantizers — 'seeded' (corpus_seed_centroids verbatim:
    the first 8 vectors as cells) and 'trained'
    (clustering.train_centroids: the same seeds refined by 3
    exact-integer Lloyd iterations) — the query reports cell balance
    (cells actually used, largest cell share in ppm) and
    nearest-neighbor retention at nprobe=1 (the share of query vectors
    whose true cosine-NN lands in the query's own cell — the recall an
    IVF search would see).  A production run reads this pair on its
    own corpus: if the seeded balance collapses (one domain owning the
    seeds), train on a sample instead — with evidence, not folklore.

    The oracle rides the SAME k-means CTE chain as the kmeans/SemDeDup
    family: its iteration-1 assignment (a1) IS the seeded quantizer's
    argmin (corpus_seed_centroids returns exactly the c0f seed rows,
    ties (dist, cid) == ivf_prepared's first-min), and an extra argmin
    over the final centroids (c3f) is train_centroids' assignment.

    Scale shape: the quantizer diagnostics are O(n_cells) collects +
    one assignment pass; the exact-NN ground truth is intentionally
    all-pairs over a bounded fixture (240 vectors, 48 queries) — the
    same sample-bounded shape every recall eval here uses at 100 TB.
    """
    from map2db_spark.functions.clustering import train_centroids
    from map2db_spark.functions.similarity import (
        corpus_seed_centroids,
        ivf_prepared,
    )

    emb = Tables(spark, sf_dir).embeddings.where(
        F.col("vec_id") < _SEEDROB_N
    )
    corpus = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, (x, i) -> 0.25 * CAST(x AS DOUBLE)"
            " + CASE WHEN i = CAST(vec_id DIV 60 AS INT)"
            " THEN 1.0D ELSE 0.0D END)"
        ).alias("embedding"),
    ).localCheckpoint()

    seeded = corpus_seed_centroids(corpus, _SEEDROB_CELLS)
    trained = train_centroids(
        corpus, k=_SEEDROB_CELLS, iters=3, dim=64
    )

    def assigned(centroids, method: str) -> DataFrame:
        return ivf_prepared(
            corpus, centroids, "vec_id", "embedding", "vid", "iv", "nrm"
        ).withColumn("method", F.lit(method))

    m = assigned(seeded, "seeded").unionByName(
        assigned(trained, "trained")
    ).persist()

    bal = (
        m.groupBy("method", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("method")
        .agg(
            F.countDistinct("cell").cast("long").alias("n_cells_used"),
            F.expr(
                f"CAST(max(cnt) * 1000000 DIV {_SEEDROB_N} AS BIGINT)"
            ).alias("max_cell_ppm"),
        )
    )

    one = m.where(F.col("method") == "seeded").select("vid", "iv", "nrm")
    q = one.where(F.col("vid") % _SEEDROB_QMOD == 0).select(
        F.col("vid").alias("u"), F.col("iv").alias("uiv"),
        F.col("nrm").alias("unrm"),
    )
    c = one.select(
        F.col("vid").alias("nv"), F.col("iv").alias("viv"),
        F.col("nrm").alias("vnrm"),
    )
    dot = F.aggregate(
        F.zip_with("uiv", "viv", lambda p, s: p * s),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    cos = F.round(dot.cast("double") / (F.col("unrm") * F.col("vnrm")), 6)
    w = Window.partitionBy("u").orderBy(F.desc("cos"), "nv")
    nn = (
        q.join(c, F.col("nv") != F.col("u"))
        .select("u", "nv", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("u", "nv")
    )
    hits = (
        nn.join(
            m.select("method", F.col("vid").alias("u"),
                     F.col("cell").alias("ucell")),
            "u",
        )
        .join(
            m.select(F.col("method").alias("m2"),
                     F.col("vid").alias("nv"),
                     F.col("cell").alias("vcell")),
            "nv",
        )
        .where(
            (F.col("method") == F.col("m2"))
            & (F.col("ucell") == F.col("vcell"))
        )
        .groupBy("method")
        .agg(F.count(F.lit(1)).cast("long").alias("nn_in_cell"))
    )
    nq = _SEEDROB_N // _SEEDROB_QMOD
    return (
        bal.join(hits, "method", "left")
        .select(
            "method",
            "n_cells_used",
            "max_cell_ppm",
            F.coalesce("nn_in_cell", F.lit(0)).cast("long").alias(
                "nn_in_cell"
            ),
            F.lit(nq).cast("long").alias("n_queries"),
            (F.coalesce("nn_in_cell", F.lit(0)) * 1000000 / F.lit(nq))
            .cast("long").alias("nn_recall_ppm"),
        )
        .orderBy("method")
    )


# ---------------------------------------------------------------------------
# VP8 (lossy WebP) keyframe-header decode via the RFC 6386 bool coder
# ---------------------------------------------------------------------------


@query(
    "m_vp8_header_params",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(16 + doc_id % 9 AS INTEGER) AS width,
           CAST(16 + doc_id % 7 AS INTEGER) AS height,
           CAST(doc_id * 37 % 128 AS INTEGER) AS y_ac_qi,
           CAST(doc_id % 31 - 15 AS INTEGER) AS uv_ac_delta,
           CAST(doc_id * 13 % 31 - 15 AS INTEGER) AS y2_dc_delta,
           CAST(doc_id % 64 AS INTEGER) AS loop_filter_level,
           CAST(doc_id % 8 AS INTEGER) AS sharpness_level,
           CAST(doc_id % 2 AS INTEGER) AS filter_type,
           CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
                WHEN 2 THEN 4 ELSE 8 END AS INTEGER) AS dct_partitions,
           CAST(1 AS BIGINT) AS walker_agrees
    FROM documents WHERE doc_id < 32
    """,
    tags=("multimodal", "image", "webp", "vp8", "bool-coder"),
)
def m_vp8_header_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossy-WebP (VP8) keyframe-HEADER decode certified end to end
    through a real RFC 6386 boolean range coder (functions/vp8.py):
    per row, doc_id-derived filter/quantizer parameters are encoded
    into a spec-layout keyframe first partition (frame tag, 9D 01 2A
    sync, 14-bit dims, then the bool-coded header through the
    quantizer block — genuine arithmetic coding with renormalization,
    not bit packing), DECODED back, and the decoded fields are
    emitted; the oracle recomputes every parameter in closed form, so
    a hash match certifies the encoder layout, the range coder and the
    field walk together.  walker_agrees pins that functions/webp.py's
    RIFF walker reads the same dims from the same bytes (one container
    layout, two parsers).  Pixel reconstruction stays out of envelope
    (honest NotImplementedError) — this is the metadata/typed-column
    slot of the multimodal family, same shape as m_jpeg_dims.

    Scale shape: map-only mapInPandas; payloads never shuffle and
    never touch the driver."""
    import pandas as pd

    from map2db_spark.session import ship_package

    ship_package(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 32
    ).select("doc_id")

    def kernel(batches):
        from map2db_spark.functions.vp8 import (
            decode_vp8_header,
            encode_vp8_keyframe_header,
        )
        from map2db_spark.functions.webp import parse_webp_header

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "y_ac_qi": [], "uv_ac_delta": [], "y2_dc_delta": [],
                   "loop_filter_level": [], "sharpness_level": [],
                   "filter_type": [], "dct_partitions": [],
                   "walker_agrees": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 16 + d % 9, 16 + d % 7
                buf = encode_vp8_keyframe_header(
                    w, h,
                    y_ac_qi=d * 37 % 128,
                    q_deltas={
                        "uv_ac_delta": d % 31 - 15,
                        "y2_dc_delta": d * 13 % 31 - 15,
                    },
                    loop_filter_level=d % 64,
                    sharpness_level=d % 8,
                    filter_type=d % 2,
                    dct_partition_log2=d % 4,
                )
                hp = decode_vp8_header(buf)
                wk = parse_webp_header(buf)
                out["media_id"].append(d)
                out["width"].append(hp["width"])
                out["height"].append(hp["height"])
                out["y_ac_qi"].append(hp["y_ac_qi"])
                out["uv_ac_delta"].append(hp["uv_ac_delta"])
                out["y2_dc_delta"].append(hp["y2_dc_delta"])
                out["loop_filter_level"].append(hp["loop_filter_level"])
                out["sharpness_level"].append(hp["sharpness_level"])
                out["filter_type"].append(hp["filter_type"])
                out["dct_partitions"].append(hp["dct_partitions"])
                out["walker_agrees"].append(int(
                    (wk["width"], wk["height"], wk["layout"])
                    == (hp["width"], hp["height"], "VP8 ")
                ))
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        kernel,
        schema=(
            "media_id LONG, width INT, height INT, y_ac_qi INT,"
            " uv_ac_delta INT, y2_dc_delta INT, loop_filter_level INT,"
            " sharpness_level INT, filter_type INT, dct_partitions INT,"
            " walker_agrees LONG"
        ),
    )


# ---------------------------------------------------------------------------
# JPEG 4:2:0 chroma subsampling decode (baseline codec extension)
# ---------------------------------------------------------------------------


@query(
    "m_jpeg_subsampled",
    oracle="""
    WITH g AS (
      SELECT doc_id, 9 + doc_id % 12 AS h, 9 + doc_id % 10 AS w
      FROM documents WHERE doc_id < 28
    ),
    blocks AS (
      SELECT g.doc_id, g.h, g.w, by.i AS by, bx.i AS bx
      FROM g, generate_series(0, 2) AS by(i), generate_series(0, 2) AS bx(i)
      WHERE by.i * 8 < g.h AND bx.i * 8 < g.w
    ),
    sums AS (
      SELECT doc_id, ANY_VALUE(h) AS h, ANY_VALUE(w) AS w,
             CAST(SUM((60 + (doc_id * 7 + by * 5 + bx * 3) % 160)
                  * LEAST(8, h - 8 * by) * LEAST(8, w - 8 * bx))
               AS BIGINT) AS plane_sum
      FROM blocks GROUP BY doc_id
    )
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           plane_sum AS sum_r, plane_sum AS sum_g, plane_sum AS sum_b,
           CAST(1 AS BIGINT) AS rt_exact,
           CAST(1 AS BIGINT) AS ss_smaller
    FROM sums
    """,
    tags=("multimodal", "image", "pixels", "jpeg", "subsampling"),
)
def m_jpeg_subsampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG with 4:2:0 CHROMA SUBSAMPLING certified end to
    end — the extension that moves the codec envelope from "4:4:4
    only" to "progressive only": per row a gray-valued image with
    per-8x8-block constant luma (value 60 + (doc_id*7 + by*5 + bx*3)
    % 160, dims 9..20 x 9..18 so MCU padding and cropping both
    engage) is encoded at 4:2:0 — Y at 2x2 sampling (FOUR Y blocks
    interleave per MCU, exercising the DC prediction chain through
    the 2x2 walk), chroma box-filtered to a quarter of the blocks —
    then decoded back through the general integer-ratio MCU walk.
    Gray pixels keep Cb=Cr=128 exactly through the box prefilter and
    block-constant luma carries only DC (quantizer 8 = exact integer
    math), so the subsampled stream round-trips BIT-EXACTLY: the
    oracle recomputes the per-block closed form and rt_exact pins
    array equality; ss_smaller pins that the 4:2:0 stream genuinely
    beats the 4:4:4 encoding of the same image (the chroma block
    count drops 4x — subsampling is real, not a flag).  Colored
    content (bounded-error) and 4:2:2 are covered in
    tests/test_jpeg.py.

    Scale shape: map-only mapInPandas; payloads never shuffle and
    never touch the driver."""
    import pandas as pd

    from map2db_spark.session import ship_package

    ship_package(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 28
    ).select("doc_id")

    def kernel(batches):
        import numpy as np

        from map2db_spark.functions.jpeg_codec import (
            decode_jpeg_baseline,
            encode_jpeg_baseline,
        )

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "sum_r": [], "sum_g": [], "sum_b": [],
                   "rt_exact": [], "ss_smaller": []}
            for d in pdf["doc_id"]:
                d = int(d)
                h, w = 9 + d % 12, 9 + d % 10
                bh, bw = -(-h // 8), -(-w // 8)
                by = np.arange(bh)[:, None]
                bx = np.arange(bw)[None, :]
                vals = 60 + (d * 7 + by * 5 + bx * 3) % 160
                img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)[
                    :h, :w
                ].astype(np.uint8)
                rgb = np.stack([img, img, img], axis=-1)
                enc = encode_jpeg_baseline(rgb, subsampling="420")
                enc444 = encode_jpeg_baseline(rgb)
                dec = decode_jpeg_baseline(enc)
                s = dec.astype(np.int64).sum(axis=(0, 1))
                out["media_id"].append(d)
                out["width"].append(dec.shape[1])
                out["height"].append(dec.shape[0])
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
                out["rt_exact"].append(int(np.array_equal(dec, rgb)))
                out["ss_smaller"].append(int(len(enc) < len(enc444)))
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        kernel,
        schema=(
            "media_id LONG, width INT, height INT, sum_r LONG,"
            " sum_g LONG, sum_b LONG, rt_exact LONG, ss_smaller LONG"
        ),
    )
