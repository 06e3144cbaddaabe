"""Round-5 additions: the distribution-comparison statistics a
training-data pipeline runs continuously — two-sample KS drift
detection, Spearman rank correlation, Welch's unequal-variance t-test,
Poisson-bootstrap uncertainty, and per-segment Shannon entropy — plus
(further down) link prediction, deterministic random walks, DSIR
importance weighting, and text/row source-format round-trips.

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

from map2db_spark.registry import query
from map2db_spark.tables import Tables


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
           CAST(max(abs(cum_a * t.nb - cum_b * t.na)) * 1000000
                // (t.na * t.nb) AS BIGINT) AS d_ppm
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
    to its distinct-value table; the cumulative window then runs over
    distinct values only (bounded by the value domain, here <=49k
    cent levels — NOT the row count).  For an unbounded domain, swap
    the single-partition window for the two-pass range-partitioned
    prefix sum (operators/ids.py) with identical semantics.
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
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = d.select(
        F.sum("ca").over(w).alias("cum_a"), F.sum("cb").over(w).alias("cum_b")
    )
    gap = F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na"))
    return (
        cum.crossJoin(F.broadcast(t))
        .groupBy("na", "nb")
        .agg(
            F.max(gap).cast("long").alias("d_num"),
            F.expr(
                "CAST(max(abs(cum_a * nb - cum_b * na)) * 1000000"
                " DIV (na * nb) AS BIGINT)"
            ).alias("d_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (doubled midranks, exact moments)
# ---------------------------------------------------------------------------


_SPEARMAN_RHO = """
    CAST(round(1000000 *
        (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
           * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
    ) AS BIGINT)"""


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


_WELCH_T = """
    CAST(round(1000000 * (
        (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
        / sqrt(
            (CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a)
              / (n_a - 1) / n_a
          + (CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * s_b / n_b)
              / (n_b - 1) / n_b
        )
    )) AS BIGINT)"""


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
           CAST(sum(wgt * cents) * 1000000 // sum(wgt) AS BIGINT)
             AS mean_micro
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
                "CAST(sum(wgt * cents) * 1000000 DIV sum(wgt) AS BIGINT)"
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
