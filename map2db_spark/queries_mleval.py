"""ML-evaluation and data-management operators a 100 TB training
pipeline needs around the core curation ops: exact ROC-AUC from rank
sums, mutual information between categorical metadata columns,
percentile winsorization, a distributed covariance matrix (the PCA
front-end), small-file compaction planning, and train/test leakage
detection via cross-split MinHash near-dup.

Parity conventions (CLAUDE.md + memory/spark-duckdb-parity-tricks.md):
cross-engine values are integers (scaled where needed), md5-derived
strings, or single-libm-call doubles on identical integer inputs;
column aliases identical on both sides; no container-typed result
cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from map2db_spark.registry import query
from map2db_spark.tables import Tables

# ---------------------------------------------------------------------------
# Exact ROC-AUC via the Mann-Whitney rank statistic
# ---------------------------------------------------------------------------


@query(
    "x_auc_rank",
    oracle="""
    WITH s AS (
      SELECT user_id % 4 AS segment,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    r AS (
      SELECT segment, pos,
             rank()    OVER (PARTITION BY segment ORDER BY cents) AS mr,
             count(*)  OVER (PARTITION BY segment, cents)         AS tc
      FROM s
    )
    SELECT segment,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(1 - pos) AS BIGINT) AS n_neg,
           CAST(sum(CASE WHEN pos = 1 THEN 2 * mr + tc - 1 ELSE 0 END)
                - sum(pos) * (sum(pos) + 1) AS BIGINT) AS u2,
           CASE WHEN sum(pos) = 0 OR sum(1 - pos) = 0 THEN NULL
                ELSE CAST((1000000 *
                           (sum(CASE WHEN pos = 1 THEN 2 * mr + tc - 1 ELSE 0 END)
                            - sum(pos) * (sum(pos) + 1)))
                          // (2 * sum(pos) * sum(1 - pos)) AS BIGINT)
           END AS auc_micro
    FROM r GROUP BY segment
    """,
    tags=("analytics", "ml-eval", "window"),
)
def x_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC per segment from the Mann-Whitney U statistic,
    fully integer: with midranks m (tie-averaged), U = sum_pos(m) -
    n_pos(n_pos+1)/2 and AUC = U / (n_pos*n_neg).  Midranks are
    half-integers, so everything is carried doubled: 2*midrank =
    2*rank + tie_count - 1, u2 = 2*U, auc_micro = floor(1e6*u2 /
    (2*n_pos*n_neg)).  Scale shape: one shuffle on segment for the
    rank window (at 100 TB, segment cardinality spreads the sort);
    the AUC itself is a map-side-combinable aggregate over ranked
    rows — no per-pair O(n_pos*n_neg) comparison ever materializes."""
    s = (
        Tables(spark, sf_dir).events
        .where(F.col("event_type").isin("purchase", "view"))
        .select(
            (F.col("user_id") % 4).alias("segment"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.when(F.col("event_type") == "purchase", F.lit(1))
            .otherwise(F.lit(0))
            .alias("pos"),
        )
    )
    r = s.select(
        "segment",
        "pos",
        F.rank().over(Window.partitionBy("segment").orderBy("cents")).alias("mr"),
        F.count("*").over(Window.partitionBy("segment", "cents")).alias("tc"),
    )
    u2 = F.sum(
        F.when(F.col("pos") == 1, 2 * F.col("mr") + F.col("tc") - 1).otherwise(F.lit(0))
    ) - F.sum("pos") * (F.sum("pos") + 1)
    return (
        r.groupBy("segment")
        .agg(
            F.sum("pos").cast("long").alias("n_pos"),
            F.sum(1 - F.col("pos")).cast("long").alias("n_neg"),
            u2.cast("long").alias("u2"),
            # r13 static divide audit: a one-class segment (no
            # positives or no negatives) has undefined AUC -> NULL on
            # BOTH engines instead of a Spark ANSI raise
            F.expr(
                "CASE WHEN sum(pos) = 0 OR sum(1 - pos) = 0 THEN NULL"
                " ELSE CAST((1000000 *"
                " (sum(CASE WHEN pos = 1 THEN 2*mr + tc - 1 ELSE 0 END)"
                " - sum(pos) * (sum(pos) + 1)))"
                " div (2 * sum(pos) * sum(1 - pos)) AS BIGINT) END"
            ).alias("auc_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Mutual information / PMI between categorical metadata columns
# ---------------------------------------------------------------------------


@query(
    "x_mutual_information",
    oracle="""
    WITH n AS (SELECT count(*) AS n_total FROM documents),
    xy AS (SELECT lang, source, count(*) AS n_xy FROM documents GROUP BY 1, 2),
    x AS (SELECT lang, count(*) AS n_x FROM documents GROUP BY 1),
    y AS (SELECT source, count(*) AS n_y FROM documents GROUP BY 1)
    SELECT xy.lang, xy.source,
           CAST(n_xy AS BIGINT) AS n_xy,
           CAST(n_x AS BIGINT) AS n_x,
           CAST(n_y AS BIGINT) AS n_y,
           CAST(n_total AS BIGINT) AS n_total,
           CAST(round(1000000 * ln(
               CAST(n_xy * n_total AS DOUBLE) / CAST(n_x * n_y AS DOUBLE)
           )) AS BIGINT) AS pmi_micro
    FROM xy JOIN x USING (lang) JOIN y USING (source) CROSS JOIN n
    """,
    tags=("analytics", "ml-eval", "feature-selection"),
)
def x_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between two categorical metadata
    columns (lang x source), the cell-level sufficient statistic of
    mutual information: pmi = ln(p(x,y) / (p(x)p(y))).  Emitted per
    cell as exact integer counts plus a micro-scaled PMI whose single
    ln call runs on an identical IEEE-double quotient of integers in
    both engines.  Scale shape: three independent count aggregates
    (map-side combinable) and two broadcast joins of marginal tables
    (|X| and |Y| rows) onto the |X|x|Y| cell table — nothing
    corpus-sized shuffles more than once."""
    docs = Tables(spark, sf_dir).documents
    n = docs.agg(F.count("*").cast("long").alias("n_total"))
    xy = docs.groupBy("lang", "source").agg(F.count("*").cast("long").alias("n_xy"))
    x = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n_x"))
    y = docs.groupBy("source").agg(F.count("*").cast("long").alias("n_y"))
    return (
        xy.join(F.broadcast(x), "lang")
        .join(F.broadcast(y), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            "n_xy",
            "n_x",
            "n_y",
            "n_total",
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
    )


# ---------------------------------------------------------------------------
# Percentile winsorization (exact nearest-rank order statistics)
# ---------------------------------------------------------------------------


@query(
    "x_winsorize",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             count(*)     OVER (PARTITION BY event_type) AS n
      FROM c
    ),
    cuts AS (
      SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             CAST(max(CASE WHEN rn = (n * 5 + 99) // 100 THEN cents END)
                  AS BIGINT) AS lo_cents,
             CAST(max(CASE WHEN rn = (n * 95 + 99) // 100 THEN cents END)
                  AS BIGINT) AS hi_cents
      FROM r GROUP BY event_type
    )
    SELECT c.event_type, k.n, k.lo_cents, k.hi_cents,
           CAST(sum(least(greatest(c.cents, k.lo_cents), k.hi_cents))
                AS BIGINT) AS winsorized_sum_cents,
           CAST(sum(CASE WHEN c.cents < k.lo_cents OR c.cents > k.hi_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM c JOIN cuts k USING (event_type)
    GROUP BY c.event_type, k.n, k.lo_cents, k.hi_cents
    """,
    tags=("analytics", "robust", "quantile"),
)
def x_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization at exact nearest-rank p05/p95: cut
    ranks are pure integer arithmetic (ceil(n*p) = (n*p_pct+99)//100),
    the cut values are exact order statistics, and clipped sums stay
    in integer cents.  Scale shape: one shuffle on the group key for
    the rank window; the cuts table is O(groups) and broadcast back
    onto the data for the clip pass — at 100 TB the second pass is a
    map stage, not a second sort."""
    c = Tables(spark, sf_dir).events.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("cents")
    r = c.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    cuts = r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max(
            F.when(F.col("rn") == F.expr("(n * 5 + 99) div 100"), F.col("cents"))
        ).cast("long").alias("lo_cents"),
        F.max(
            F.when(F.col("rn") == F.expr("(n * 95 + 99) div 100"), F.col("cents"))
        ).cast("long").alias("hi_cents"),
    )
    return (
        c.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type", "n", "lo_cents", "hi_cents")
        .agg(
            F.sum(
                F.least(F.greatest(F.col("cents"), F.col("lo_cents")), F.col("hi_cents"))
            ).cast("long").alias("winsorized_sum_cents"),
            F.sum(
                F.when(
                    (F.col("cents") < F.col("lo_cents"))
                    | (F.col("cents") > F.col("hi_cents")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_clipped"),
        )
        .select("event_type", "n", "lo_cents", "hi_cents",
                "winsorized_sum_cents", "n_clipped")
    )


# ---------------------------------------------------------------------------
# Distributed covariance matrix (the PCA front-end)
# ---------------------------------------------------------------------------

_PCA_DIMS = 8
_PCA_SCALE = 1_000_000


def _pca_cov_oracle() -> str:
    return f"""
    WITH x AS (
      SELECT vec_id, i,
             CAST(round(CAST(embedding[i] AS DOUBLE) * {_PCA_SCALE})
                  AS BIGINT) AS xi
      FROM embeddings, generate_series(1, {_PCA_DIMS}) AS t(i)
    ),
    p AS (
      SELECT a.i AS ii, b.i AS jj, count(*) AS n,
             sum(a.xi * b.xi) AS sxy, sum(a.xi) AS sx, sum(b.xi) AS sy
      FROM x a JOIN x b USING (vec_id) WHERE a.i <= b.i
      GROUP BY 1, 2
    )
    SELECT CAST(ii - 1 AS BIGINT) AS dim_i,
           CAST(jj - 1 AS BIGINT) AS dim_j,
           CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS BIGINT) AS cov_num
    FROM p
    """


@query(
    "v_pca_covariance",
    oracle=_pca_cov_oracle(),
    tags=("vector", "ml", "linear-algebra"),
)
def v_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance matrix over embedding dims 0..7 — the
    front-end of exact PCA (eigendecomposition of the returned d x d
    matrix is O(d^3) driver work, independent of N).  Embeddings are
    micro-scaled to integers, so cov numerator n*Sxy - Sx*Sy is exact
    and summation-order-independent — what makes distributed
    re-partitioning safe.  Scale shape: ONE narrow aggregation pass
    computing all d(d+1)/2 product sums with map-side combine (no
    self-join, no explode, no shuffle of the vector table — contrast
    with the oracle's pedagogical unnest+join); the single agg row
    then unpivots driver-side via stack.  At 100 TB this is a scan +
    one exchange of ~40 longs per partition."""
    emb = Tables(spark, sf_dir).embeddings
    e = emb.select(
        *[
            F.round(F.col("embedding")[i].cast("double") * _PCA_SCALE)
            .cast("long")
            .alias(f"x{i}")
            for i in range(_PCA_DIMS)
        ]
    )
    aggs = [F.count("*").alias("n")]
    aggs += [F.sum(f"x{i}").alias(f"s{i}") for i in range(_PCA_DIMS)]
    pairs = [(i, j) for i in range(_PCA_DIMS) for j in range(_PCA_DIMS) if i <= j]
    aggs += [
        F.sum(F.col(f"x{i}") * F.col(f"x{j}")).alias(f"p{i}_{j}") for i, j in pairs
    ]
    row = e.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({i} AS BIGINT), CAST({j} AS BIGINT), "
        f"CAST(n * p{i}_{j} - s{i} * s{j} AS BIGINT)"
        for i, j in pairs
    )
    return row.select(
        F.col("n").cast("long").alias("n"),
        F.expr(f"stack({len(pairs)}, {stack_args}) AS (dim_i, dim_j, cov_num)"),
    ).select("dim_i", "dim_j", "n", "cov_num")


# ---------------------------------------------------------------------------
# Small-file compaction planning (next-fit by cumulative size)
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 2000


@query(
    "x_compaction_bins",
    oracle=f"""
    WITH f AS (
      SELECT source, doc_id, n_chars,
             COALESCE(sum(n_chars) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      FROM documents
    )
    SELECT source,
           CAST(prior // {_COMPACT_TARGET} AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(n_chars) AS BIGINT) AS bytes,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM f GROUP BY source, bin
    """,
    tags=("storage", "compaction", "window"),
)
def x_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: files (documents standing in as
    a file manifest, n_chars as size) are packed per directory into
    target-size bins by next-fit on the exclusive running size —
    bin = floor(prefix_sum / target).  Deterministic, one window pass,
    integer-only.  Scale shape: the manifest is metadata (file count,
    not data bytes), so even a 100 TB table's manifest is millions of
    rows — one shuffle on directory for the window, then the grouped
    plan drives a distributed rewrite where each task reads exactly
    one bin's files."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    f = Tables(spark, sf_dir).documents.select(
        "source",
        "doc_id",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("prior"),
    )
    return (
        f.select(
            "source",
            F.expr(f"prior div {_COMPACT_TARGET}").alias("bin"),
            "doc_id",
            "n_chars",
        )
        .groupBy("source", "bin")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("n_chars").cast("long").alias("bytes"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Train/test leakage via cross-split MinHash near-dup
# ---------------------------------------------------------------------------

_LEAK_SPLIT_SQL = "substr(md5('leak:' || CAST({id} AS VARCHAR)), 1, 2)"


def _leakage_oracle() -> str:
    from map2db_spark.queries_pipeline import _minhash_oracle

    split = _LEAK_SPLIT_SQL.format(id="doc_id")
    return f"""
    WITH pairs AS ({_minhash_oracle(threshold=0.8)}),
    splits AS (
      SELECT doc_id,
             CASE WHEN {split} < '80' THEN 'train' ELSE 'test' END AS split
      FROM documents
    )
    SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b, p.jaccard
    FROM pairs p
    JOIN splits sa ON sa.doc_id = p.id_a
    JOIN splits sb ON sb.doc_id = p.id_b
    WHERE sa.split <> sb.split
    """


@query(
    "c_cross_split_leakage",
    oracle=_leakage_oracle(),
    tags=("curation", "dedup", "leakage", "pipeline"),
)
def c_cross_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage detector: a deterministic 50/50 md5 split,
    then the MinHash+LSH near-dup pipeline (threshold 0.8), keeping
    only pairs whose members land in DIFFERENT splits — each one is a
    test document whose near-duplicate leaked into training.  Reuses
    the d_minhash_lsh dataflow end-to-end (signatures stream through
    map-side combine, candidates come from ONE banded self-join with
    the bucket_cap skew rail, verification explodes only the
    candidate neighborhood), plus one broadcast join of the O(pairs)
    result against the O(1)-per-row split column.  At 100 TB the
    added cost over plain near-dup detection is a map-side split
    assignment — leakage detection is free if you are deduping
    anyway.

    Skew rail: edges are BUILT FROM THE LSH-CANDIDATE PATH (the
    "build edges from candidates" alternative to df_cap) — the
    verification self-join runs over shingles of candidate docs only,
    every pair is semi-filtered against the bucket-capped candidate
    set before aggregation, and bucket_cap=50 bounds each band
    bucket, so no uncapped corpus-wide shingle self-join exists in
    this plan (asserted in test_plans.py)."""
    from map2db_spark.functions import dedup as D

    docs = Tables(spark, sf_dir).documents
    # distinct=False: codegen shingle pass; the min-agg signatures are
    # bit-identical with or without per-doc duplicate shingles
    sigs = D.minhash_signatures(
        D.shingle_table(docs, distinct=False), num_hashes=8
    )
    cands = D.lsh_candidate_pairs(
        sigs, num_hashes=8, band_size=2, bucket_cap=50
    ).localCheckpoint()
    cand_docs = (
        cands.select(F.col("id_a").alias("doc_id"))
        .unionByName(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sh = D.shingle_table(
        docs.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    ).localCheckpoint()
    pairs = D.jaccard_pairs(
        sh, threshold=0.8, candidates=cands, docs_prefiltered=True
    )
    h = F.substring(
        F.md5(F.concat(F.lit("leak:"), F.col("doc_id").cast("string"))), 1, 2
    )
    splits = docs.select(
        "doc_id",
        F.when(h < "80", F.lit("train")).otherwise(F.lit("test")).alias("split"),
    )
    sa = splits.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .where(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Power-iteration top eigenvector over the distributed covariance matrix
# ---------------------------------------------------------------------------

_POW_ITERS = 4
_POW_DOWN = 1_000_000_000  # covariance numerator downscale before matvec


def _pow_sql_iter(prev: str, idx: int) -> str:
    """One integer power-iteration step as SQL CTEs (matvec, infinity
    norm, truncating renormalize to ~1e6 scale)."""
    return f"""
    w{idx} AS (
      SELECT m.i, sum(m.c * v.x) AS w
      FROM mat m JOIN {prev} v ON v.j = m.j GROUP BY m.i
    ),
    n{idx} AS (SELECT max(abs(w)) AS mx FROM w{idx}),
    v{idx} AS (
      SELECT i AS j,
             (CASE WHEN w < 0 THEN -1 ELSE 1 END)
             * CAST(abs(w) // greatest(mx // 1000000, 1) AS BIGINT) AS x
      FROM w{idx}, n{idx}
    )"""


def _pca_power_oracle() -> str:
    iters = ",".join(_pow_sql_iter(f"v{i - 1}" if i > 1 else "v0", i)
                     for i in range(1, _POW_ITERS + 1))
    return f"""
    WITH x AS (
      SELECT vec_id, i,
             CAST(round(CAST(embedding[i] AS DOUBLE) * {_PCA_SCALE})
                  AS BIGINT) AS xi
      FROM embeddings, generate_series(1, {_PCA_DIMS}) AS t(i)
    ),
    p AS (
      SELECT a.i AS i, b.i AS j, count(*) AS n,
             sum(a.xi * b.xi) AS sxy, sum(a.xi) AS sx, sum(b.xi) AS sy
      FROM x a JOIN x b USING (vec_id)
      GROUP BY 1, 2
    ),
    mat AS (
      SELECT i - 1 AS i, j - 1 AS j,
             (CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END)
             * CAST(abs(n * sxy - sx * sy) // {_POW_DOWN} AS BIGINT) AS c
      FROM p
    ),
    v0 AS (
      SELECT i - 1 AS j, CAST(1000000 AS BIGINT) AS x
      FROM generate_series(1, {_PCA_DIMS}) AS t(i)
    ),
    {iters}
    SELECT j AS dim, CAST(x AS BIGINT) AS v_scaled FROM v{_POW_ITERS}
    """


@query(
    "v_pca_power",
    oracle=_pca_power_oracle(),
    tags=("vector", "ml", "linear-algebra", "iterative"),
)
def v_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component by integer power iteration: the d x d
    covariance matrix comes from the same ONE-pass distributed
    aggregation as v_pca_covariance (no join, no explode — map-side
    combine all the way), and the {iters}-step power iteration runs on
    the driver over d^2 = 64 integers, exactly how Spark MLlib's PCA
    eigen-solves the Gramian: per-iteration cost O(d^2), independent
    of N.  Every step is exact integer arithmetic (matvec, infinity
    norm, truncating renormalize), so Spark and the oracle's layered
    CTEs agree bit-for-bit.  Collect volume is O(d^2) — the documented
    bounded-driver-data exception, not a corpus collect."""
    emb = Tables(spark, sf_dir).embeddings
    e = emb.select(
        *[
            F.round(F.col("embedding")[i].cast("double") * _PCA_SCALE)
            .cast("long")
            .alias(f"x{i}")
            for i in range(_PCA_DIMS)
        ]
    )
    aggs = [F.count("*").alias("n")]
    aggs += [F.sum(f"x{i}").alias(f"s{i}") for i in range(_PCA_DIMS)]
    aggs += [
        F.sum(F.col(f"x{i}") * F.col(f"x{j}")).alias(f"p{i}_{j}")
        for i in range(_PCA_DIMS)
        for j in range(_PCA_DIMS)
        if i <= j
    ]
    r = e.agg(*aggs).collect()[0]  # O(d^2) scalars — bounded driver data
    n = r["n"]
    if not n:
        # empty corpus: the sums are NULL and the oracle's matvec
        # CTE chain joins away to zero rows — return the same empty
        # shape instead of letting 0 * None raise on the driver
        # (degenerate-input audit, VERDICT r14 #3)
        return spark.createDataFrame([], "dim BIGINT, v_scaled BIGINT")
    cov = {}
    for i in range(_PCA_DIMS):
        for j in range(_PCA_DIMS):
            lo, hi = (i, j) if i <= j else (j, i)
            num = n * r[f"p{lo}_{hi}"] - r[f"s{i}"] * r[f"s{j}"]
            sign = -1 if num < 0 else 1
            cov[(i, j)] = sign * (abs(num) // _POW_DOWN)
    v = [1_000_000] * _PCA_DIMS
    for _ in range(_POW_ITERS):
        w = [
            sum(cov[(i, j)] * v[j] for j in range(_PCA_DIMS))
            for i in range(_PCA_DIMS)
        ]
        mx = max(abs(x) for x in w)
        s = max(mx // 1_000_000, 1)
        v = [(-1 if x < 0 else 1) * (abs(x) // s) for x in w]
    return spark.createDataFrame(
        [(i, v[i]) for i in range(_PCA_DIMS)], "dim BIGINT, v_scaled BIGINT"
    )


# ---------------------------------------------------------------------------
# Probability calibration bins + Brier components
# ---------------------------------------------------------------------------


@query(
    "x_calibration_bins",
    oracle="""
    WITH s AS (
      SELECT CAST(concat('0x', substr(md5('cal:' || CAST(event_id AS VARCHAR)),
                                      1, 6)) AS BIGINT)
             * 1000000 // 16777216 AS pred_micro,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events
    )
    SELECT CAST(pred_micro // 100000 AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(pred_micro) AS BIGINT) AS sum_pred_micro,
           CAST(sum((pred_micro - pos * 1000000)
                    * (pred_micro - pos * 1000000)) AS BIGINT) AS brier_num
    FROM s GROUP BY bin
    """,
    tags=("analytics", "ml-eval"),
)
def x_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration-curve bins with exact Brier-score components: a
    deterministic md5-derived pseudo-probability (micro-scaled
    integer) is bucketed into deciles; each bin reports count,
    positives, summed prediction, and the integer Brier numerator
    sum((p - y)^2).  Mean calibration error and the Brier score fall
    out as ratios of the returned integers.  Scale shape: one
    map-side-combinable aggregate over a pure projection — the
    standard model-eval pass a 100 TB scored corpus needs, with no
    shuffle beyond 10 bin rows."""
    ev = Tables(spark, sf_dir).events
    pred = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cal:"), F.col("event_id").cast("string"))),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        * 1000000
    )
    s = ev.select(
        F.expr(
            "CAST(conv(substr(md5('cal:' || CAST(event_id AS STRING)), 1, 6),"
            " 16, 10) AS BIGINT) * 1000000 div 16777216"
        ).alias("pred_micro"),
        F.when(F.col("event_type") == "purchase", F.lit(1))
        .otherwise(F.lit(0))
        .alias("pos"),
    )
    err = F.col("pred_micro") - F.col("pos") * 1000000
    return (
        s.groupBy(F.expr("pred_micro div 100000").alias("bin"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.sum("pred_micro").cast("long").alias("sum_pred_micro"),
            F.sum(err * err).cast("long").alias("brier_num"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonal decomposition (centered moving average, exact integers)
# ---------------------------------------------------------------------------


@query(
    "w_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    win AS (
      SELECT d, cents,
             sum(cents) OVER (ORDER BY d
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sum7,
             count(*)   OVER (ORDER BY d
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt7
      FROM daily
    )
    SELECT CAST(((d - DATE '1970-01-01') + 4) % 7 AS BIGINT) AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(7 * cents - sum7) AS BIGINT) AS sum_detrended7,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM win WHERE cnt7 = 7
    GROUP BY dow
    """,
    tags=("timeseries", "window", "analytics"),
)
def w_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition on the daily revenue series:
    detrend with a centered 7-day moving sum (detrended7 = 7*cents -
    sum7 keeps everything integer — no division), then aggregate the
    detrended residual by day-of-week to expose the weekly seasonal
    profile.  Day-of-week is computed arithmetically ((epoch_days + 4)
    % 7, Sunday = 0) so both engines agree without calendar-function
    convention drift.  Scale shape: the daily rollup is the only
    corpus shuffle; the window then runs over O(days) rows — at 100 TB
    the series table is tiny regardless of event volume."""
    ev = Tables(spark, sf_dir).events
    daily = (
        ev.select(
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    win = daily.select(
        "d",
        "cents",
        F.sum("cents").over(w).alias("sum7"),
        F.count("*").over(w).alias("cnt7"),
    )
    return (
        win.where(F.col("cnt7") == 7)
        .groupBy(
            ((F.datediff(F.col("d"), F.lit("1970-01-01")) + 4) % 7)
            .cast("long")
            .alias("dow")
        )
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum(7 * F.col("cents") - F.col("sum7")).cast("long")
            .alias("sum_detrended7"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-round distributed BPE tokenizer training
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3

# Token-start sentinel representation: every token is prefixed with
# chr(1) and tokens are space-joined, so the chosen pair's substring
# "\x01x \x01y" can only match at a token boundary and a plain
# (non-regex) replace() — identical leftmost-non-overlapping scan in
# Spark and DuckDB — implements BPE's greedy left-to-right merge
# exactly (consecutive occurrences "x y x y" both merge; overlapping
# "a a a" merges once).  chr(2) joins merged halves inside a token.


def _bpe_oracle() -> str:
    parts = [
        r"""s0 AS (
      SELECT array_to_string(list_transform(
                 regexp_split_to_array(trim(text), '\s+'),
                 x -> chr(1) || x), ' ') AS s
      FROM documents
    )"""
    ]
    for k in range(1, _BPE_ROUNDS + 1):
        parts.append(f"""c{k} AS (
      SELECT t[i] || ' ' || t[i + 1] AS pair, count(*) AS n
      FROM (SELECT string_split(s, ' ') AS t FROM s{k - 1}) z
      CROSS JOIN LATERAL (
        SELECT unnest(generate_series(1, len(t) - 1)) AS i
      ) g
      GROUP BY 1
    ),
    t{k} AS (SELECT pair, n FROM c{k} ORDER BY n DESC, pair ASC LIMIT 1),
    s{k} AS (
      SELECT replace(s, (SELECT pair FROM t{k}),
                     replace((SELECT pair FROM t{k}), ' ', chr(2))) AS s
      FROM s{k - 1}
    )""")
        # NB: s{_BPE_ROUNDS} is defined but unused — harmless
    selects = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS round,"
        f" replace(replace(pair, chr(1), ''), chr(2), ' ') AS merge,"
        f" CAST(n AS BIGINT) AS n FROM t{k}"
        for k in range(1, _BPE_ROUNDS + 1)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + selects


@query(
    "t_bpe_train_rounds",
    oracle=_bpe_oracle(),
    tags=("text", "tokenizer", "iterative", "pipeline"),
)
def t_bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer TRAINING, three full induction
    rounds: count corpus-wide adjacent-pair frequencies, pick the
    most frequent pair (count-desc, pair-asc tiebreak), merge it
    everywhere, recount on the merged corpus.  The merge itself is a
    plain substring replace over a sentinel-prefixed representation
    (see module comment), which reproduces BPE's greedy
    left-to-right non-overlapping semantics identically in both
    engines — no regex, no lookaround, no UDF.

    Scale shape: per round, the pair count is one keyed shuffle with
    map-side partial aggregation (Zipf pairs collapse hard), the
    winning pair is top-1 via TakeOrderedAndProject, and the merge
    application is a map-only pass with the 1-row winner broadcast —
    the corpus itself never shuffles.  A production trainer would
    persist the corpus between rounds to cut lineage; at 100 TB each
    round is a scan, which is the known cost floor of distributed
    BPE induction."""
    docs = Tables(spark, sf_dir).documents
    cur = docs.select(
        F.expr(
            r"array_join(transform(split(trim(text), '\\s+'),"
            r" x -> concat(char(1), x)), ' ')"
        ).alias("s")
    )
    merges = []
    for k in range(1, _BPE_ROUNDS + 1):
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
        )
        merges.append(
            top1.select(
                F.lit(k).cast("long").alias("round"),
                F.expr(
                    "replace(replace(pair, char(1), ''), char(2), ' ')"
                ).alias("merge"),
                F.col("n").cast("long").alias("n"),
            )
        )
        cur = cur.crossJoin(F.broadcast(top1)).select(
            F.expr("replace(s, pair, replace(pair, ' ', char(2)))").alias("s")
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


# ---------------------------------------------------------------------------
# Spark 4 VARIANT ingestion of semi-structured JSON
# ---------------------------------------------------------------------------


@query(
    "f_variant_histogram",
    oracle="""
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10
                AS BIGINT) AS k_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY k_bucket
    """,
    tags=("functions", "json", "variant"),
)
def f_variant_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through Spark 4's VARIANT type:
    ``parse_json`` converts the JSON string column to a binary
    variant ONCE, and ``variant_get`` extracts the typed path without
    re-parsing per access — the engine-native path for open-schema
    event payloads (the oracle reaches the same values through
    DuckDB's JSON functions; VARIANT is the Spark-side physical
    representation, invisible in the result).  Scale shape: parse and
    extract are map-side; one shuffle for the bucket histogram with
    map-side combine."""
    ev = Tables(spark, sf_dir).events
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy(F.expr("k div 10").alias("k_bucket"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
            F.count_distinct(F.col("event_type")).cast("long").alias("n_types"),
        )
    )


# ---------------------------------------------------------------------------
# Differentially-private count release (deterministic Laplace mechanism)
# ---------------------------------------------------------------------------

_DP_SCALE_B = 10  # Laplace scale b = 1/epsilon, epsilon = 0.1


@query(
    "x_dp_noisy_counts",
    oracle=f"""
    WITH g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(concat('0x', substr(md5('dp:' || event_type), 1, 6))
                  AS BIGINT) AS h
      FROM events GROUP BY event_type
    ),
    u AS (
      SELECT event_type, n,
             (CAST(h AS DOUBLE) + 0.5) / 16777216.0 - 0.5 AS c
      FROM g
    )
    SELECT event_type, n,
           CAST(round(1000 * (CAST(n AS DOUBLE)
               - {_DP_SCALE_B} * (CASE WHEN c < 0 THEN -1.0 ELSE 1.0 END)
                 * ln(1.0 - 2.0 * abs(c)))) AS BIGINT) AS noisy_milli
    FROM u
    """,
    tags=("analytics", "privacy"),
)
def x_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release via the Laplace mechanism
    with a DETERMINISTIC noise draw: uniform u derives from md5 of the
    group key (centered c = u - 0.5), and the inverse-CDF transform
    -b*sign(c)*ln(1-2|c|) yields Laplace(b= 1/eps) noise — one libm ln
    on an identical IEEE double in both engines, released milli-scaled.
    (A production release would use a secret seed; the mechanism,
    sensitivity-1 count + Laplace(1/eps), is the textbook one.)  Scale
    shape: one map-side-combinable count; noise is O(groups) post-
    processing."""
    ev = Tables(spark, sf_dir).events
    g = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 6),
        16,
        10,
    ).cast("long")
    c = (h.cast("double") + 0.5) / 16777216.0 - 0.5
    noise = -F.lit(float(_DP_SCALE_B)) * F.when(c < 0, -1.0).otherwise(1.0) * F.log(
        1.0 - 2.0 * F.abs(c)
    )
    return g.select(
        "event_type",
        "n",
        F.round(1000 * (F.col("n").cast("double") + noise))
        .cast("long")
        .alias("noisy_milli"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

_K_ANON = 3


@query(
    "c_k_anonymity",
    oracle=f"""
    WITH q AS (
      SELECT lang, source, CAST(n_chars // 100 AS BIGINT) AS size_bucket,
             count(*) AS n
      FROM documents GROUP BY 1, 2, 3
    )
    SELECT lang, source, size_bucket, CAST(n AS BIGINT) AS n,
           CAST(CASE WHEN n < {_K_ANON} THEN 1 ELSE 0 END AS BIGINT)
             AS risky
    FROM q
    """,
    tags=("curation", "privacy"),
)
def c_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: group by the quasi-identifier tuple (lang,
    source, bucketed size) and flag equivalence classes smaller than
    k=3 — rows in those classes are re-identifiable by their
    metadata alone and need suppression or generalization before
    release.  Pairs with x_dp_noisy_counts as the privacy surface.
    Scale shape: one map-side-combinable count over a pure
    projection; the audit output is O(classes)."""
    docs = Tables(spark, sf_dir).documents
    return (
        docs.groupBy(
            "lang",
            "source",
            F.expr("n_chars div 100").alias("size_bucket"),
        )
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "lang",
            "source",
            "size_bucket",
            "n",
            F.when(F.col("n") < _K_ANON, F.lit(1)).otherwise(F.lit(0))
            .cast("long")
            .alias("risky"),
        )
    )


# ---------------------------------------------------------------------------
# Chi-squared independence test (per-cell contributions)
# ---------------------------------------------------------------------------


@query(
    "x_chi_squared",
    oracle="""
    WITH n AS (SELECT count(*) AS nt FROM documents),
    xy AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
    x AS (SELECT lang, count(*) AS nx FROM documents GROUP BY 1),
    y AS (SELECT source, count(*) AS ny FROM documents GROUP BY 1)
    SELECT xy.lang, xy.source,
           CAST(o AS BIGINT) AS observed,
           CAST(round(1000000.0 * nx * ny / nt) AS BIGINT)
             AS expected_micro,
           CAST(round(1000000.0
                * (CAST(o * nt - nx * ny AS DOUBLE)
                   * CAST(o * nt - nx * ny AS DOUBLE))
                / (CAST(nt AS DOUBLE) * nx * ny)) AS BIGINT)
             AS chi2_term_micro
    FROM xy JOIN x USING (lang) JOIN y USING (source) CROSS JOIN n
    """,
    tags=("analytics", "ml-eval", "feature-selection"),
)
def x_chi_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence test between two categorical columns,
    emitted per contingency cell: observed count, micro-scaled
    expected count, and the chi2 contribution (O-E)^2/E computed as
    (O*N - nx*ny)^2 / (N*nx*ny) so the numerator stays exact integer
    and the single double division is identical in both engines.  The
    statistic is the sum of the returned terms; with the per-cell
    form the whole test is hash-checkable.  Scale shape: same as
    x_mutual_information — three count aggregates, marginals
    broadcast onto the cells."""
    docs = Tables(spark, sf_dir).documents
    nt = docs.agg(F.count("*").cast("long").alias("nt"))
    xy = docs.groupBy("lang", "source").agg(F.count("*").cast("long").alias("o"))
    x = docs.groupBy("lang").agg(F.count("*").cast("long").alias("nx"))
    y = docs.groupBy("source").agg(F.count("*").cast("long").alias("ny"))
    num = F.col("o") * F.col("nt") - F.col("nx") * F.col("ny")
    return (
        xy.join(F.broadcast(x), "lang")
        .join(F.broadcast(y), "source")
        .crossJoin(F.broadcast(nt))
        .select(
            "lang",
            "source",
            F.col("o").alias("observed"),
            F.round(
                1000000.0 * F.col("nx") * F.col("ny") / F.col("nt")
            ).cast("long").alias("expected_micro"),
            F.round(
                1000000.0
                * (num.cast("double") * num.cast("double"))
                / (F.col("nt").cast("double") * F.col("nx") * F.col("ny"))
            ).cast("long").alias("chi2_term_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Two-proportion A/B test (z statistic from four integers)
# ---------------------------------------------------------------------------


@query(
    "x_ab_test_proportions",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CASE WHEN CAST(concat('0x',
                 substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 6))
                 AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             max(CASE WHEN event_type = 'purchase' AND value > 300
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY 1, 2
    ),
    c AS (
      SELECT CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN arm = 'A' THEN converted ELSE 0 END)
                  AS BIGINT) AS x_a,
             CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN arm = 'B' THEN converted ELSE 0 END)
                  AS BIGINT) AS x_b
      FROM u
    )
    SELECT n_a, x_a, n_b, x_b,
           CASE WHEN n_a = 0 OR n_b = 0 OR x_a + x_b = 0
                  OR x_a + x_b = n_a + n_b THEN NULL
           ELSE CAST(round(1000000 *
             (CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
             / sqrt(
                 (CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 / n_a + 1.0 / n_b)
             )) AS BIGINT) END AS z_micro
    FROM c
    """,
    tags=("analytics", "ml-eval", "ab-test"),
)
def x_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B test: users split into arms by md5 parity,
    conversion = any purchase over $300 (a rare event, so variance is nonzero); the pooled two-proportion z statistic
    is computed from the four exact integer counts in one identical
    IEEE expression (two divisions, one sqrt) on both engines,
    released micro-scaled.  Scale shape: one shuffle to the per-user
    conversion flag (map-side combine), then a 4-integer global
    aggregate — the experiment-analysis pass over any event volume is
    two map-side-combinable aggregations."""
    ev = Tables(spark, sf_dir).events
    arm = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))), 1, 6
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    u = ev.groupBy("user_id", arm.alias("arm")).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 300), 1
            ).otherwise(0)
        ).alias("converted")
    )
    c = u.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == "A", F.col("converted")).otherwise(0))
        .cast("long").alias("x_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("arm") == "B", F.col("converted")).otherwise(0))
        .cast("long").alias("x_b"),
    )
    p_pool = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (
        F.col("x_a").cast("double") / F.col("n_a")
        - F.col("x_b").cast("double") / F.col("n_b")
    ) / F.sqrt(
        p_pool * (1.0 - p_pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    # z is undefined when an arm is empty or the pooled rate is 0/1:
    # emit NULL like the oracle (Spark ANSI raises on double/0 where
    # DuckDB yields NULL — the sf0.001 thin-data sweep caught this)
    degenerate = (
        (F.col("n_a") == 0)
        | (F.col("n_b") == 0)
        | (F.col("x_a") + F.col("x_b") == 0)
        | (F.col("x_a") + F.col("x_b") == F.col("n_a") + F.col("n_b"))
    )
    return c.select(
        "n_a", "x_a", "n_b", "x_b",
        F.when(degenerate, F.lit(None).cast("long"))
        .otherwise(F.round(1000000 * z).cast("long"))
        .alias("z_micro"),
    )


# ---------------------------------------------------------------------------
# Zipf-law exponent of the corpus vocabulary
# ---------------------------------------------------------------------------

_ZIPF_TOPK = 100


@query(
    "t_zipf_fit",
    oracle=rf"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents
    ),
    freq AS (SELECT token, count(*) AS f FROM tok GROUP BY token),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, token ASC) AS r
      FROM freq ORDER BY f DESC, token ASC LIMIT {_ZIPF_TOPK}
    ),
    pts AS (
      SELECT CAST(round(1000 * ln(CAST(r AS DOUBLE))) AS BIGINT) AS x,
             CAST(round(1000 * ln(CAST(f AS DOUBLE))) AS BIGINT) AS y
      FROM ranked
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts
    )
    SELECT n,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CAST((1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
                AS BIGINT) AS slope_micro
    FROM s
    """,
    tags=("text", "analytics", "ml-eval"),
)
def t_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law exponent of the corpus vocabulary: log-log OLS slope
    over the top-100 token frequencies.  ln(rank), ln(freq) are
    milli-scaled to integers per point (single libm call each, on
    identical double inputs), then the slope is EXACT integer OLS —
    n*Sxy - Sx*Sy over n*Sxx - Sx^2 — so distributed summation order
    cannot move the estimate (~ -1 for natural text, shallower for
    templated/synthetic corpora: a cheap corpus-quality fingerprint).
    Scale shape: token counts map-side combine; top-100 is
    TakeOrderedAndProject; the regression runs over 100 rows."""
    docs = Tables(spark, sf_dir).documents
    tok = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("f"))
    top = freq.orderBy(F.desc("f"), F.asc("token")).limit(_ZIPF_TOPK)
    ranked = top.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.desc("f"), F.asc("token")))
        .alias("r"),
    )
    pts = ranked.select(
        F.round(1000 * F.log(F.col("r").cast("double"))).cast("long").alias("x"),
        F.round(1000 * F.log(F.col("f").cast("double"))).cast("long").alias("y"),
    )
    s = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "n",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.expr(
            "CAST((1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)"
            " AS BIGINT)"
        ).alias("slope_micro"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival sufficient statistics (user retention)
# ---------------------------------------------------------------------------


@query(
    "x_survival_km",
    oracle="""
    WITH span AS (
      SELECT user_id,
             CAST(max(CAST(ts AS DATE)) - min(CAST(ts AS DATE)) AS BIGINT)
               AS t_days,
             CAST(CASE WHEN max(CAST(ts AS DATE)) <
                 (SELECT max(CAST(ts AS DATE)) FROM events) - 7
               THEN 1 ELSE 0 END AS BIGINT) AS churned
      FROM events GROUP BY user_id
    ),
    risk AS (
      SELECT t_days,
             CAST(sum(churned) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_ending
      FROM span GROUP BY t_days
    ),
    tot AS (SELECT count(*) AS n_total FROM span)
    SELECT t_days, n_events, n_ending,
           CAST(n_total - COALESCE(sum(n_ending) OVER (
               ORDER BY t_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS n_at_risk
    FROM risk CROSS JOIN tot
    """,
    tags=("analytics", "ml-eval", "survival"),
)
def x_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival sufficient statistics for user
    retention: each user's observation span in days, churn = last
    activity more than 7 days before the dataset horizon (otherwise
    right-censored).  Emits, per distinct span length, the exact
    integer K-M inputs — events (churns), endings, and the at-risk
    count from a running prefix — from which S(t) = prod(1 -
    d_i/r_i) follows.  Products of rationals are deliberately NOT
    emitted (cross-engine float products drift); the integer table
    IS the estimator's state.  Scale shape: one shuffle to per-user
    spans (map-side combine), one O(distinct-spans) window."""
    ev = Tables(spark, sf_dir).events.select(
        "user_id", F.to_date("ts").alias("d")
    )
    horizon = ev.agg(F.max("d").alias("hmax"))
    span = (
        ev.groupBy("user_id")
        .agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff("dmax", "dmin").cast("long").alias("t_days"),
            F.when(
                F.datediff("hmax", "dmax") > 7, F.lit(1)
            ).otherwise(F.lit(0)).cast("long").alias("churned"),
        )
    )
    risk = span.groupBy("t_days").agg(
        F.sum("churned").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_ending"),
    )
    tot = span.agg(F.count("*").alias("n_total"))
    w = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, -1)
    return (
        risk.crossJoin(F.broadcast(tot))
        .select(
            "t_days",
            "n_events",
            "n_ending",
            (
                F.col("n_total")
                - F.coalesce(F.sum("n_ending").over(w), F.lit(0))
            ).cast("long").alias("n_at_risk"),
        )
    )


# ---------------------------------------------------------------------------
# Markov transition counts between event types
# ---------------------------------------------------------------------------


@query(
    "x_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(count(*)) OVER (PARTITION BY event_type) AS BIGINT)
             AS from_total
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
    tags=("analytics", "sequence", "ml-eval"),
)
def x_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences ((ts, event_id)-ordered, so ties are deterministic):
    the |types|^2 transition matrix as exact integers with row
    totals — transition probabilities are n/from_total.  The
    user-behavior model every sessionized product-analytics stack
    fits.  Scale shape: one shuffle on user_id for the lead window,
    then a map-side-combinable count to O(types^2) rows; the row
    totals are a window over that tiny table."""
    ev = Tables(spark, sf_dir).events
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    counted = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    return counted.select(
        "from_type",
        "to_type",
        "n",
        F.sum("n").over(Window.partitionBy("from_type")).cast("long")
        .alias("from_total"),
    )


# ---------------------------------------------------------------------------
# ANN recall evaluation: LSH top-k vs the exact baseline
# ---------------------------------------------------------------------------


def _recall_vs_brute(spark, sf_dir, approx_pairs):
    """Shared recall assembly: approx top-k (query_id, cand_id) pairs
    vs the exact brute baseline; per-query integer counts."""
    from map2db_spark.functions import similarity as S

    emb = Tables(spark, sf_dir).embeddings
    queries = emb.where(F.col("vec_id") < 10)
    brute = S.brute_force_topk(emb, queries, k=5).select("query_id", "cand_id")
    n_lsh = approx_pairs.groupBy("query_id").agg(F.count("*").alias("n_lsh"))
    matched = (
        approx_pairs.join(brute, ["query_id", "cand_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_matched"))
    )
    return (
        brute.groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_brute"))
        .join(F.broadcast(n_lsh), "query_id", "left")
        .join(F.broadcast(matched), "query_id", "left")
        .select(
            "query_id",
            "n_brute",
            F.coalesce(F.col("n_lsh"), F.lit(0)).cast("long").alias("n_lsh"),
            F.coalesce(F.col("n_matched"), F.lit(0)).cast("long")
            .alias("n_matched"),
        )
    )


def _ann_recall_oracle() -> str:
    from map2db_spark.queries_pipeline import _ANN_INT, _PLANES

    bucket_terms = []
    for b, plane in enumerate(_PLANES):
        arr = "[" + ", ".join(str(v) for v in plane) + "]"
        bucket_terms.append(
            f"(CASE WHEN list_dot_product(v, {arr}::BIGINT[]) > 0"
            f" THEN {2**b} ELSE 0 END)"
        )
    bucket = " + ".join(bucket_terms)
    return f"""
    WITH iv AS (SELECT vec_id, {_ANN_INT} AS v FROM embeddings),
    bucketed AS (SELECT vec_id, v, CAST({bucket} AS INT) AS bucket FROM iv),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM bucketed
          WHERE vec_id < 10),
    lsh AS (
      SELECT query_id, cand_id FROM (
        SELECT q.query_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_dot_product(qv, c.v)
                       / (sqrt(list_dot_product(qv, qv))
                          * sqrt(list_dot_product(c.v, c.v))), 6) DESC,
                 c.vec_id) AS rank
        FROM bucketed c JOIN q USING (bucket)
        WHERE c.vec_id != q.query_id
      ) WHERE rank <= 5
    ),
    brute AS (
      SELECT query_id, cand_id FROM (
        SELECT q.query_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_dot_product(qv, c.v)
                       / (sqrt(list_dot_product(qv, qv))
                          * sqrt(list_dot_product(c.v, c.v))), 6) DESC,
                 c.vec_id) AS rank
        FROM iv c CROSS JOIN q
        WHERE c.vec_id != q.query_id
      ) WHERE rank <= 5
    )
    SELECT b.query_id,
           CAST(count(*) AS BIGINT) AS n_brute,
           CAST(COALESCE(max(l.n_lsh), 0) AS BIGINT) AS n_lsh,
           CAST(COALESCE(max(m.n_matched), 0) AS BIGINT) AS n_matched
    FROM brute b
    LEFT JOIN (SELECT query_id, count(*) AS n_lsh FROM lsh GROUP BY 1) l
      USING (query_id)
    LEFT JOIN (
      SELECT l2.query_id, count(*) AS n_matched
      FROM lsh l2 JOIN brute b2 USING (query_id, cand_id) GROUP BY 1
    ) m USING (query_id)
    GROUP BY b.query_id
    """


@query(
    "v_ann_recall_eval",
    oracle=_ann_recall_oracle(),
    tags=("ann", "ml-eval", "vector"),
)
def v_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the LSH ANN against the exact brute-force baseline,
    per query: how many of the true top-5 the bucketed search
    retrieved (n_matched / n_brute is the recall; n_lsh < 5 means the
    probed bucket ran short).  The quality measurement every ANN
    deployment needs running continuously — and the exact-integer
    similarity arithmetic is what makes the comparison itself
    deterministic.  Scale shape: the brute side broadcasts the query
    set and never shuffles the corpus; the LSH side joins only the
    probed bucket; the recall join is O(queries*k)."""
    from map2db_spark.functions import similarity as S
    from map2db_spark.queries_pipeline import _PLANES

    emb = Tables(spark, sf_dir).embeddings
    queries = emb.where(F.col("vec_id") < 10)
    lsh = S.lsh_topk(emb, queries, _PLANES, k=5).select("query_id", "cand_id")
    return _recall_vs_brute(spark, sf_dir, lsh)


# ---------------------------------------------------------------------------
# Difference-in-differences estimator
# ---------------------------------------------------------------------------


@query(
    "x_did_estimator",
    oracle="""
    WITH lim AS (
      SELECT min(CAST(ts AS DATE)) AS dmin, max(CAST(ts AS DATE)) AS dmax
      FROM events
    ),
    s AS (
      SELECT CASE WHEN CAST(concat('0x',
                 substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 6))
                 AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             CASE WHEN CAST(ts AS DATE) <=
                    dmin + CAST((dmax - dmin) // 2 AS INTEGER)
                  THEN 'pre' ELSE 'post' END AS period,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events CROSS JOIN lim
    ),
    c AS (
      SELECT
        CAST(sum(CASE WHEN arm='A' AND period='pre'  THEN 1 ELSE 0 END) AS BIGINT) AS n_a_pre,
        CAST(sum(CASE WHEN arm='A' AND period='pre'  THEN cents ELSE 0 END) AS BIGINT) AS s_a_pre,
        CAST(sum(CASE WHEN arm='A' AND period='post' THEN 1 ELSE 0 END) AS BIGINT) AS n_a_post,
        CAST(sum(CASE WHEN arm='A' AND period='post' THEN cents ELSE 0 END) AS BIGINT) AS s_a_post,
        CAST(sum(CASE WHEN arm='B' AND period='pre'  THEN 1 ELSE 0 END) AS BIGINT) AS n_b_pre,
        CAST(sum(CASE WHEN arm='B' AND period='pre'  THEN cents ELSE 0 END) AS BIGINT) AS s_b_pre,
        CAST(sum(CASE WHEN arm='B' AND period='post' THEN 1 ELSE 0 END) AS BIGINT) AS n_b_post,
        CAST(sum(CASE WHEN arm='B' AND period='post' THEN cents ELSE 0 END) AS BIGINT) AS s_b_post
      FROM s
    )
    SELECT *,
           CASE WHEN n_a_pre = 0 OR n_a_post = 0
                  OR n_b_pre = 0 OR n_b_post = 0 THEN NULL
                ELSE CAST(round(1000 * (
             (CAST(s_a_post AS DOUBLE)/n_a_post - CAST(s_a_pre AS DOUBLE)/n_a_pre)
           - (CAST(s_b_post AS DOUBLE)/n_b_post - CAST(s_b_pre AS DOUBLE)/n_b_pre)
           )) AS BIGINT) END AS did_milli_cents
    FROM c
    """,
    tags=("analytics", "ml-eval", "ab-test"),
)
def x_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences treatment-effect estimate: md5-parity
    arms x pre/post periods (midpoint of the observed date range),
    effect = (A_post - A_pre) - (B_post - B_pre) on mean value.  The
    eight cell statistics are exact integers; the effect is one IEEE
    expression over them, milli-cent scaled.  Scale shape: date
    limits broadcast, then a single map-side-combinable global
    aggregate — the standard quasi-experimental readout at any event
    volume."""
    ev = Tables(spark, sf_dir).events
    lim = ev.agg(
        F.min(F.to_date("ts")).alias("dmin"), F.max(F.to_date("ts")).alias("dmax")
    )
    arm = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))), 1, 6
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    period = F.when(
        F.datediff(F.to_date("ts"), F.col("dmin"))
        <= F.expr("CAST(datediff(dmax, dmin) div 2 AS INT)"),
        "pre",
    ).otherwise("post")
    s = ev.crossJoin(F.broadcast(lim)).select(
        arm.alias("arm"),
        period.alias("period"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def cell(a: str, p: str, what):
        return F.sum(
            F.when((F.col("arm") == a) & (F.col("period") == p), what).otherwise(0)
        ).cast("long")

    c = s.agg(
        cell("A", "pre", 1).alias("n_a_pre"),
        cell("A", "pre", F.col("cents")).alias("s_a_pre"),
        cell("A", "post", 1).alias("n_a_post"),
        cell("A", "post", F.col("cents")).alias("s_a_post"),
        cell("B", "pre", 1).alias("n_b_pre"),
        cell("B", "pre", F.col("cents")).alias("s_b_pre"),
        cell("B", "post", 1).alias("n_b_post"),
        cell("B", "post", F.col("cents")).alias("s_b_post"),
    )
    did = (
        F.col("s_a_post").cast("double") / F.col("n_a_post")
        - F.col("s_a_pre").cast("double") / F.col("n_a_pre")
    ) - (
        F.col("s_b_post").cast("double") / F.col("n_b_post")
        - F.col("s_b_pre").cast("double") / F.col("n_b_pre")
    )
    # r13 static divide audit: an empty arm-period cell (thin data)
    # makes the effect undefined -> NULL on BOTH engines
    empty_cell = (
        (F.col("n_a_pre") == 0)
        | (F.col("n_a_post") == 0)
        | (F.col("n_b_pre") == 0)
        | (F.col("n_b_post") == 0)
    )
    return c.select(
        "*",
        F.when(empty_cell, F.lit(None).cast("long"))
        .otherwise(F.round(1000 * did).cast("long"))
        .alias("did_milli_cents"),
    )


# ---------------------------------------------------------------------------
# Multi-probe LSH: recall recovered, measured against the same baseline
# ---------------------------------------------------------------------------


def _multiprobe_recall_oracle() -> str:
    from map2db_spark.queries_pipeline import _ANN_INT, _PLANES

    bucket_terms = []
    for b, plane in enumerate(_PLANES):
        arr = "[" + ", ".join(str(v) for v in plane) + "]"
        bucket_terms.append(
            f"(CASE WHEN list_dot_product(v, {arr}::BIGINT[]) > 0"
            f" THEN {2**b} ELSE 0 END)"
        )
    bucket = " + ".join(bucket_terms)
    probe_list = "[bucket, " + ", ".join(
        f"xor(bucket, {1 << b})" for b in range(len(_PLANES))
    ) + "]"
    return f"""
    WITH iv AS (SELECT vec_id, {_ANN_INT} AS v FROM embeddings),
    bucketed AS (SELECT vec_id, v, CAST({bucket} AS INT) AS bucket FROM iv),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM bucketed
          WHERE vec_id < 10),
    qp AS (
      SELECT query_id, qv, unnest({probe_list}) AS bucket FROM q
    ),
    lsh AS (
      SELECT query_id, cand_id FROM (
        SELECT qp.query_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY qp.query_id ORDER BY
                 round(list_dot_product(qv, c.v)
                       / (sqrt(list_dot_product(qv, qv))
                          * sqrt(list_dot_product(c.v, c.v))), 6) DESC,
                 c.vec_id) AS rank
        FROM bucketed c JOIN qp USING (bucket)
        WHERE c.vec_id != qp.query_id
      ) WHERE rank <= 5
    ),
    brute AS (
      SELECT query_id, cand_id FROM (
        SELECT q.query_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_dot_product(qv, c.v)
                       / (sqrt(list_dot_product(qv, qv))
                          * sqrt(list_dot_product(c.v, c.v))), 6) DESC,
                 c.vec_id) AS rank
        FROM iv c CROSS JOIN q
        WHERE c.vec_id != q.query_id
      ) WHERE rank <= 5
    )
    SELECT b.query_id,
           CAST(count(*) AS BIGINT) AS n_brute,
           CAST(COALESCE(max(l.n_lsh), 0) AS BIGINT) AS n_lsh,
           CAST(COALESCE(max(m.n_matched), 0) AS BIGINT) AS n_matched
    FROM brute b
    LEFT JOIN (SELECT query_id, count(*) AS n_lsh FROM lsh GROUP BY 1) l
      USING (query_id)
    LEFT JOIN (
      SELECT l2.query_id, count(*) AS n_matched
      FROM lsh l2 JOIN brute b2 USING (query_id, cand_id) GROUP BY 1
    ) m USING (query_id)
    GROUP BY b.query_id
    """


@query(
    "v_ann_multiprobe_recall",
    oracle=_multiprobe_recall_oracle(),
    tags=("ann", "ml-eval", "vector", "multiprobe"),
)
def v_ann_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of MULTI-PROBE LSH (own bucket + every 1-bit-flip
    neighbor, Lv et al.) against the exact baseline.  Versus
    single-probe (v_ann_recall_eval) it restores the CANDIDATE
    BUDGET — every query fills its top-5 (n_lsh=5 where single-probe
    returned 0-2) at 9 probed buckets — and recovers every neighbor
    that disagrees on exactly one hyperplane.  Measured honestly on
    this corpus recall stays low: the synthetic embeddings are
    near-isotropic (pairwise cosine ~0.3 at best), so a "true"
    neighbor's signature differs on several planes — the textbook
    demonstration that LSH recall is a property of the embedding
    geometry, which is exactly what this evaluator exists to surface
    before an ANN index ships.  Same single equi-join dataflow; each
    candidate lives in one bucket, so no pair dedup is needed."""
    from map2db_spark.functions import similarity as S
    from map2db_spark.queries_pipeline import _PLANES

    emb = Tables(spark, sf_dir).embeddings
    queries = emb.where(F.col("vec_id") < 10)
    mp = S.lsh_multiprobe_topk(emb, queries, _PLANES, k=5).select(
        "query_id", "cand_id"
    )
    return _recall_vs_brute(spark, sf_dir, mp)


# ---------------------------------------------------------------------------
# CUPED variance reduction for the A/B readout
# ---------------------------------------------------------------------------


@query(
    "x_cuped_adjustment",
    oracle="""
    WITH lim AS (
      SELECT min(CAST(ts AS DATE)) AS dmin, max(CAST(ts AS DATE)) AS dmax
      FROM events
    ),
    per_user AS (
      SELECT user_id,
             CAST(sum(CASE WHEN CAST(ts AS DATE) <=
                     dmin + CAST((dmax - dmin) // 2 AS INTEGER)
                   THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS pre_cents,
             CAST(sum(CASE WHEN CAST(ts AS DATE) >
                     dmin + CAST((dmax - dmin) // 2 AS INTEGER)
                   THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS post_cents
      FROM events CROSS JOIN lim GROUP BY user_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pre_cents) AS BIGINT) AS sx,
             CAST(sum(post_cents) AS BIGINT) AS sy,
             CAST(sum(pre_cents * post_cents) AS BIGINT) AS sxy,
             CAST(sum(pre_cents * pre_cents) AS BIGINT) AS sxx,
             CAST(sum(post_cents * post_cents) AS BIGINT) AS syy
      FROM per_user
    )
    SELECT n, sx, sy, sxy, sxx, syy,
           CAST(n * sxy - sx * sy AS BIGINT) AS theta_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS theta_den,
           -- degenerate-input audit (r14): a single user (or a
           -- constant pre/post column) zeroes a variance factor —
           -- the ratio is undefined, NULL on BOTH engines
           CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                THEN NULL
                ELSE CAST(round(1000000.0 *
                  (1.0 - (CAST(n * sxy - sx * sy AS DOUBLE)
                          * CAST(n * sxy - sx * sy AS DOUBLE))
                         / (CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE))))
                  AS BIGINT) END AS var_ratio_micro
    FROM s
    """,
    tags=("analytics", "ml-eval", "ab-test"),
)
def x_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al.): per-user pre-period
    spend as the covariate for the post-period metric.  Emits the six
    exact integer moments, the exact rational theta = cov(pre, post)
    / var(pre) as (num, den), and the adjusted-to-raw variance ratio
    1 - rho^2 micro-scaled (one IEEE expression over the integers) —
    on this corpus the readout shows how much experiment sensitivity
    the covariate buys.  Scale shape: one shuffle to per-user
    (pre, post) pairs with map-side combine, then a six-integer
    global aggregate.  Overflow ceiling: n * sxx must stay under
    2^63 — at ~1.2e6 cents/user that holds to ~4k users; at larger
    cohorts drop to dollar scaling or DECIMAL(38,0) moments (the
    x_decimal_ledger pattern)."""
    ev = Tables(spark, sf_dir).events
    lim = ev.agg(
        F.min(F.to_date("ts")).alias("dmin"), F.max(F.to_date("ts")).alias("dmax")
    )
    is_pre = F.datediff(F.to_date("ts"), F.col("dmin")) <= F.expr(
        "CAST(datediff(dmax, dmin) div 2 AS INT)"
    )
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = (
        ev.crossJoin(F.broadcast(lim))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(is_pre, cents).otherwise(0)).cast("long").alias("pre_cents"),
            F.sum(F.when(~is_pre, cents).otherwise(0)).cast("long")
            .alias("post_cents"),
        )
    )
    s = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pre_cents").cast("long").alias("sx"),
        F.sum("post_cents").cast("long").alias("sy"),
        F.sum(F.col("pre_cents") * F.col("post_cents")).cast("long").alias("sxy"),
        F.sum(F.col("pre_cents") * F.col("pre_cents")).cast("long").alias("sxx"),
        F.sum(F.col("post_cents") * F.col("post_cents")).cast("long").alias("syy"),
    )
    tn = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    td = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "n", "sx", "sy", "sxy", "sxx", "syy",
        tn.cast("long").alias("theta_num"),
        td.cast("long").alias("theta_den"),
        F.when((td == 0) | (vy == 0), F.lit(None).cast("long"))
        .otherwise(
            F.round(
                1000000.0
                * (1.0 - (tn.cast("double") * tn.cast("double"))
                   / (td.cast("double") * vy.cast("double")))
            ).cast("long")
        ).alias("var_ratio_micro"),
    )


# ---------------------------------------------------------------------------
# Source-format breadth: ORC round-trip, binaryFile ingestion
# ---------------------------------------------------------------------------


@query(
    "f_orc_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events GROUP BY event_type
    """,
    tags=("functions", "formats", "source"),
)
def f_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-format breadth: events round-trip through ORC (write
    by the executors, read back through Spark's native ORC reader
    with predicate/column pushdown) and aggregate to the same cents
    as the parquet-source oracle — byte-preserving transcode proven
    by the hash match.  Scale shape: format transcode is a map-only
    parallel pass; the aggregate is one map-side-combinable
    shuffle."""
    import tempfile

    ev = Tables(spark, sf_dir).events.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    from map2db_spark.tables import cleanup_roundtrip

    tmp = tempfile.mkdtemp(prefix="m2db_orc_")
    ev.write.mode("overwrite").orc(tmp)
    return cleanup_roundtrip(
        spark.read.orc(tmp)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
        ),
        tmp,
    )


@query(
    "m_binaryfile_ingest",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(n_chars) AS BIGINT) AS total_bytes,
           min(md5(text)) AS first_md5
    FROM (
      SELECT n_chars, text FROM documents WHERE doc_id < 8
    )
    """,
    tags=("multimodal", "source", "binary"),
)
def m_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary ingestion through Spark's `binaryFile` source —
    the entry path for multimodal payloads (images/audio/video land
    as (path, length, content) rows, never driver-side): eight
    documents are materialized as files, ingested via binaryFile,
    and fingerprinted; counts, total bytes, and the min content md5
    hash-match the table-side oracle, proving byte-exact ingestion.
    Scale shape: the source lists files on the driver but reads
    contents in executor tasks; partition sizing must be by BYTES
    (maxPartitionBytes), not rows — one 4K video row is not one CSV
    row.  The payload projects to (length, md5) BEFORE any reduction
    and persists, so content bytes are read once and never buffered
    past the map side; the global md5 minimum is a
    TakeOrderedAndProject top-1 instead of a min(string) whose
    immutable buffer planned Sort + SortAggregate for the whole
    aggregate (r16, guide §7.2 via functions/extrema.py)."""
    import os
    import tempfile

    from map2db_spark.functions.extrema import attach_global_extremum

    docs = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 8)
    tmp = tempfile.mkdtemp(prefix="m2db_bin_")
    for r in docs.select("doc_id", "text").collect():  # 8 rows, test rig only
        with open(os.path.join(tmp, f"{r['doc_id']:04d}.txt"), "wb") as f:
            f.write(r["text"].encode("utf-8"))
    from map2db_spark.tables import cleanup_roundtrip

    bf = spark.read.format("binaryFile").load(tmp)
    narrow = bf.select(
        F.length("content").alias("__nb"),
        F.md5(F.col("content")).alias("__h"),
    ).persist()
    aggs = narrow.agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("__nb").cast("long").alias("total_bytes"),
    )
    return cleanup_roundtrip(
        attach_global_extremum(aggs, narrow, F.col("__h"), "first_md5"),
        tmp,
    )


# ---------------------------------------------------------------------------
# Seasonal anomaly days: detrend then robust-gate the residuals
# ---------------------------------------------------------------------------


def _seasonal_anomaly_oracle() -> str:
    from map2db_spark.queries_round3 import _MED2

    return f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    win AS (
      SELECT d, cents,
             sum(cents) OVER (ORDER BY d
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sum7,
             count(*)   OVER (ORDER BY d
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt7
      FROM daily
    ),
    det AS (
      SELECT d, cents, 7 * cents - sum7 AS det7
      FROM win WHERE cnt7 = 7
    ),
    r1 AS (
      SELECT d, cents, det7,
             row_number() OVER (ORDER BY det7) AS rn,
             count(*) OVER () AS n
      FROM det
    ),
    med AS (SELECT {_MED2.format(v="det7")} AS med2 FROM r1),
    r2 AS (
      SELECT d, cents, det7, abs(2 * det7 - (SELECT med2 FROM med)) AS dev2
      FROM det
    ),
    r3 AS (
      SELECT dev2, row_number() OVER (ORDER BY dev2) AS rn,
             count(*) OVER () AS n
      FROM r2
    ),
    mad AS (SELECT {_MED2.format(v="dev2")} AS mad4 FROM r3)
    SELECT d, cents, CAST(det7 AS BIGINT) AS det7
    FROM r2 WHERE 2 * dev2 > 3 * (SELECT mad4 FROM mad)
    """


@query(
    "x_seasonal_anomaly_days",
    oracle=_seasonal_anomaly_oracle(),
    tags=("timeseries", "robust", "analytics"),
)
def x_seasonal_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous revenue days: detrend the daily series with the
    centered 7-day moving sum (det7 = 7*cents - sum7, integer), then
    gate the residuals with the doubled-order-statistic MAD rule
    (|x - median| > 3*MAD carried as 2*dev2 > 3*mad4 — everything
    integer, no division).  The trend-then-robust-gate composition is
    the standard production anomaly detector; both medians come from
    indicator sums over ONE ordered window pass each.  Scale shape:
    the corpus shuffles once for the daily rollup; everything after
    is O(days)."""
    ev = Tables(spark, sf_dir).events
    daily = (
        ev.select(
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    det = (
        daily.select(
            "d",
            "cents",
            F.sum("cents").over(w).alias("sum7"),
            F.count("*").over(w).alias("cnt7"),
        )
        .where(F.col("cnt7") == 7)
        .select("d", "cents", (7 * F.col("cents") - F.col("sum7")).alias("det7"))
    )

    def med2_of(df: DataFrame, col: str) -> DataFrame:
        r = df.select(
            F.col(col).alias("v"),
            F.row_number().over(Window.orderBy(col)).alias("rn"),
            F.count("*").over(Window.partitionBy()).alias("n"),
        )
        return r.agg(
            F.sum(
                F.col("v")
                * (
                    F.when(F.col("rn") == F.expr("(n + 1) div 2"), 1).otherwise(0)
                    + F.when(F.col("rn") == F.expr("n div 2 + 1"), 1).otherwise(0)
                )
            ).cast("long").alias("m2")
        )

    med2 = med2_of(det, "det7")
    r2 = det.crossJoin(F.broadcast(med2)).select(
        "d", "cents", "det7",
        F.abs(2 * F.col("det7") - F.col("m2")).alias("dev2"),
    )
    mad4 = med2_of(r2, "dev2").select(F.col("m2").alias("mad4"))
    return (
        r2.crossJoin(F.broadcast(mad4))
        .where(2 * F.col("dev2") > 3 * F.col("mad4"))
        .select("d", "cents", F.col("det7").cast("long").alias("det7"))
    )


# ---------------------------------------------------------------------------
# Newman modularity of the label partition over the similarity graph
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    from map2db_spark.queries_round3 import _lp_planes

    terms = []
    for b, plane in enumerate(_lp_planes()):
        arr = "[" + ", ".join(str(v) for v in plane) + "]::BIGINT[]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {arr}) > 0 THEN {2 ** b} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    iv = (
        "list_transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
    )
    return f"""
    WITH nodes AS (
      SELECT vec_id, CAST(label AS BIGINT) AS label,
             CAST({bucket.replace('v,', f'{iv},')} AS INT) AS bucket
      FROM embeddings
    ),
    edges AS (
      SELECT a.vec_id AS u, a.label AS lu, b.label AS lv
      FROM nodes a JOIN nodes b
        ON a.bucket = b.bucket AND a.vec_id != b.vec_id
    ),
    m AS (SELECT count(*) AS m2 FROM edges),
    deg AS (SELECT u, lu AS label, count(*) AS d FROM edges GROUP BY 1, 2),
    comm AS (
      SELECT label,
             CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d) AS BIGINT) AS deg_sum
      FROM deg GROUP BY label
    ),
    ein AS (
      SELECT lu AS label, CAST(count(*) AS BIGINT) AS e_in
      FROM edges WHERE lu = lv GROUP BY 1
    )
    SELECT c.label, c.n_nodes, c.deg_sum,
           CAST(COALESCE(e.e_in, 0) AS BIGINT) AS e_in,
           CAST(m2 AS BIGINT) AS m2,
           CAST(COALESCE(e.e_in, 0) * m2 - c.deg_sum * c.deg_sum AS BIGINT)
             AS q_num
    FROM comm c LEFT JOIN ein e USING (label) CROSS JOIN m
    """


@query(
    "g_modularity",
    oracle=_modularity_oracle(),
    tags=("graph", "analytics", "ml-eval"),
)
def g_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the ground-truth label partition over the
    LSH-bucket similarity graph (same seeded 4-bit buckets as
    g_label_prop): per community, the exact integer components
    q_num = e_in * 2m - deg_sum^2 whose sum over (2m)^2 is Q — high Q
    means labels align with embedding-similarity structure, the
    cluster-quality readout for any learned partition.  Isolated
    nodes (degree 0) drop out of the graph, as in the standard
    definition.  Scale shape: edges come from the bucket equi-join
    (never all-pairs), degrees and community sums are
    map-side-combinable counts, 2m broadcasts as one row."""
    import map2db_spark.functions.similarity as S
    from map2db_spark.queries_round3 import _lp_planes

    emb = Tables(spark, sf_dir).embeddings
    nodes = emb.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        S.lsh_bucket(F.col("embedding"), _lp_planes()).alias("bucket"),
    ).localCheckpoint()
    a, b = nodes.alias("a"), nodes.alias("b")
    edges = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("u"),
        F.col("a.label").alias("lu"),
        F.col("b.label").alias("lv"),
    )
    m = edges.agg(F.count("*").cast("long").alias("m2"))
    deg = edges.groupBy("u", F.col("lu").alias("label")).agg(
        F.count("*").alias("d")
    )
    comm = deg.groupBy("label").agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum("d").cast("long").alias("deg_sum"),
    )
    ein = (
        edges.where(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("label"))
        .agg(F.count("*").cast("long").alias("e_in"))
    )
    return (
        comm.join(F.broadcast(ein), "label", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "label",
            "n_nodes",
            "deg_sum",
            F.coalesce(F.col("e_in"), F.lit(0)).cast("long").alias("e_in"),
            "m2",
            (
                F.coalesce(F.col("e_in"), F.lit(0)) * F.col("m2")
                - F.col("deg_sum") * F.col("deg_sum")
            ).cast("long").alias("q_num"),
        )
    )


# ---------------------------------------------------------------------------
# Rank of the true nearest neighbor in the approximate list (MRR input)
# ---------------------------------------------------------------------------


def _mrr_oracle() -> str:
    from map2db_spark.queries_pipeline import _ANN_INT, _PLANES

    bucket_terms = []
    for b, plane in enumerate(_PLANES):
        arr = "[" + ", ".join(str(v) for v in plane) + "]"
        bucket_terms.append(
            f"(CASE WHEN list_dot_product(v, {arr}::BIGINT[]) > 0"
            f" THEN {2**b} ELSE 0 END)"
        )
    bucket = " + ".join(bucket_terms)
    probe_list = "[bucket, " + ", ".join(
        f"xor(bucket, {1 << b})" for b in range(len(_PLANES))
    ) + "]"
    sim = ("round(list_dot_product(qv, c.v)"
           " / (sqrt(list_dot_product(qv, qv))"
           "    * sqrt(list_dot_product(c.v, c.v))), 6)")
    return f"""
    WITH iv AS (SELECT vec_id, {_ANN_INT} AS v FROM embeddings),
    bucketed AS (SELECT vec_id, v, CAST({bucket} AS INT) AS bucket FROM iv),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM bucketed
          WHERE vec_id < 10),
    qp AS (SELECT query_id, qv, unnest({probe_list}) AS bucket FROM q),
    approx AS (
      SELECT query_id, cand_id, rank FROM (
        SELECT qp.query_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY qp.query_id
                                  ORDER BY {sim} DESC, c.vec_id) AS rank
        FROM bucketed c JOIN qp USING (bucket)
        WHERE c.vec_id != qp.query_id
      ) WHERE rank <= 5
    ),
    truth AS (
      SELECT query_id, cand_id AS true_top1 FROM (
        SELECT q.query_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {sim} DESC, c.vec_id) AS rank
        FROM iv c CROSS JOIN q
        WHERE c.vec_id != q.query_id
      ) WHERE rank = 1
    )
    SELECT t.query_id, CAST(t.true_top1 AS BIGINT) AS true_top1,
           CAST(COALESCE(a.rank, 0) AS BIGINT) AS found_rank
    FROM truth t
    LEFT JOIN approx a ON a.query_id = t.query_id AND a.cand_id = t.true_top1
    """


@query(
    "v_ann_mrr_rank",
    oracle=_mrr_oracle(),
    tags=("ann", "ml-eval", "vector"),
)
def v_ann_mrr_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank of the TRUE nearest neighbor inside the multi-probe
    approximate top-5, per query (0 = missed) — the per-query input
    to mean reciprocal rank, the metric that distinguishes "found it
    first" from "found it at all" (recall@k can't).  Kept integer:
    reciprocal-rank averaging is for the consumer.  Scale shape:
    identical to the recall evaluators — brute side broadcasts the
    query set, approximate side joins the probed buckets."""
    from pyspark.sql.window import Window as W

    from map2db_spark.functions import similarity as S
    from map2db_spark.queries_pipeline import _PLANES

    emb = Tables(spark, sf_dir).embeddings
    queries = emb.where(F.col("vec_id") < 10)
    approx = S.lsh_multiprobe_topk(emb, queries, _PLANES, k=5).select(
        "query_id", "cand_id", "rank"
    )
    truth = (
        S.brute_force_topk(emb, queries, k=1)
        .where(F.col("rank") == 1)
        .select("query_id", F.col("cand_id").alias("true_top1"))
    )
    return (
        truth.join(
            F.broadcast(approx).withColumnRenamed("cand_id", "true_top1"),
            ["query_id", "true_top1"],
            "left",
        )
        .select(
            "query_id",
            F.col("true_top1").cast("long").alias("true_top1"),
            F.coalesce(F.col("rank"), F.lit(0)).cast("long").alias("found_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Benford first-digit test (data-quality / fraud screening)
# ---------------------------------------------------------------------------


@query(
    "x_benford_test",
    oracle="""
    WITH s AS (
      SELECT CAST(substr(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS d
      FROM events WHERE round(value * 100) >= 1
    ),
    c AS (SELECT d, count(*) AS n_d FROM s GROUP BY d),
    t AS (SELECT sum(n_d) AS n FROM c)
    SELECT d, CAST(n_d AS BIGINT) AS n_d, CAST(n AS BIGINT) AS n_total,
           CAST(round(1000000 * log10(1.0 + 1.0 / d)) AS BIGINT)
             AS benford_p_micro,
           CAST(round(1000000
               * (n_d - n * log10(1.0 + 1.0 / d))
               * (n_d - n * log10(1.0 + 1.0 / d))
               / (n * log10(1.0 + 1.0 / d))) AS BIGINT) AS chi2_term_micro
    FROM c CROSS JOIN t
    """,
    tags=("analytics", "data-quality"),
)
def x_benford_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over transaction amounts: the
    classic data-quality / fraud-detection test.  Per digit: observed
    count, the Benford expectation log10(1 + 1/d) micro-scaled, and
    the chi-squared contribution — each a deterministic per-row IEEE
    expression over exact integers (one log10 per digit).  Scale
    shape: first-digit extraction is a string op on the map side; one
    9-row aggregate."""
    ev = Tables(spark, sf_dir).events
    cents = F.round(F.col("value") * 100).cast("long")
    s = ev.where(cents >= 1).select(
        F.substring(cents.cast("string"), 1, 1).cast("long").alias("d")
    )
    c = s.groupBy("d").agg(F.count("*").alias("n_d"))
    t = c.agg(F.sum("n_d").alias("n"))
    p = F.log10(1.0 + 1.0 / F.col("d"))
    dev = F.col("n_d") - F.col("n") * p
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "d",
            F.col("n_d").cast("long").alias("n_d"),
            F.col("n").cast("long").alias("n_total"),
            F.round(1000000 * p).cast("long").alias("benford_p_micro"),
            F.round(1000000 * dev * dev / (F.col("n") * p))
            .cast("long").alias("chi2_term_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Cohen's kappa between two heuristic quality raters
# ---------------------------------------------------------------------------


@query(
    "x_rater_kappa",
    oracle="""
    WITH r AS (
      SELECT CASE WHEN n_chars BETWEEN 100 AND 400 THEN 1 ELSE 0 END AS a,
             CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) >= 20
                  THEN 1 ELSE 0 END AS b
      FROM documents
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a * b) AS BIGINT) AS both_pass,
             CAST(sum(a * (1 - b)) AS BIGINT) AS only_a,
             CAST(sum((1 - a) * b) AS BIGINT) AS only_b,
             CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS neither
      FROM r
    )
    SELECT n, both_pass, only_a, only_b, neither,
           -- degenerate-input audit (r14): on a single document (or
           -- two deterministic raters with degenerate marginals)
           -- n^2 equals the marginal product sum — chance agreement
           -- is total, kappa undefined, NULL on BOTH engines
           CASE WHEN n * n = (both_pass + only_a) * (both_pass + only_b)
                             + (only_b + neither) * (only_a + neither)
                THEN NULL
                ELSE CAST(round(1000000 *
                  (CAST(n * (both_pass + neither)
                        - ((both_pass + only_a) * (both_pass + only_b)
                           + (only_b + neither) * (only_a + neither))
                        AS DOUBLE))
                  / (CAST(n AS DOUBLE) * n
                     - ((both_pass + only_a) * (both_pass + only_b)
                        + (only_b + neither) * (only_a + neither))))
                  AS BIGINT) END AS kappa_micro
    FROM c
    """,
    tags=("analytics", "ml-eval", "data-quality"),
)
def x_rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two heuristic quality raters (size-band
    vs token-count) — the chance-corrected agreement statistic used
    to validate LLM-judge and heuristic-filter pipelines against each
    other.  The 2x2 confusion table is exact integers; kappa =
    (n*agree - sum_marginal_products) / (n^2 - sum_marginal_products)
    is one IEEE expression over them, micro-scaled.  Scale shape: one
    map-side-combinable 4-cell aggregate over a pure projection."""
    docs = Tables(spark, sf_dir).documents
    a = F.when(F.col("n_chars").between(100, 400), 1).otherwise(0)
    b = F.when(
        F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 20, 1
    ).otherwise(0)
    r = docs.select(a.alias("a"), b.alias("b"))
    c = r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("both_pass"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("only_a"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("only_b"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("long").alias("neither"),
    )
    pa, pb = F.col("both_pass") + F.col("only_a"), F.col("both_pass") + F.col("only_b")
    qa, qb = F.col("only_b") + F.col("neither"), F.col("only_a") + F.col("neither")
    agree = F.col("both_pass") + F.col("neither")
    marg = pa * pb + qb * qa
    return c.select(
        "n", "both_pass", "only_a", "only_b", "neither",
        F.when(
            F.col("n") * F.col("n") == marg, F.lit(None).cast("long")
        ).otherwise(
            F.round(
                1000000
                * (F.col("n") * agree - marg).cast("double")
                / (F.col("n").cast("double") * F.col("n") - marg)
            ).cast("long")
        ).alias("kappa_micro"),
    )
