"""Round-3 additions: techniques a 100 TB training-data pipeline needs
that the engine did not yet carry as first-class, oracle-checked ops —
robust (MAD) outlier detection, a hand-built mergeable HyperLogLog,
MOSS winnowing document fingerprints, RAKE keyword extraction, and
product-quantization ANN.

Shared parity conventions (CLAUDE.md + memory/spark-duckdb-parity-
tricks.md): every cross-engine value is integer, md5 string, or a
bounded-error boolean; floats only via integer scaling; hex->int via
Spark ``conv(h,16,10)`` vs DuckDB ``CAST(concat('0x',h) AS BIGINT)``
with <=15 hex chars; seeded literals generated once in Python and
inlined into BOTH the Spark code and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from map2db_spark.registry import query
from map2db_spark.tables import Tables


# --------------------------------------------------------------------------
# Robust outliers: median absolute deviation, fully integer-exact
# --------------------------------------------------------------------------

_MED2 = """CAST(sum({v} * (
      (CASE WHEN rn = (n + 1) // 2 THEN 1 ELSE 0 END)
    + (CASE WHEN rn = n // 2 + 1 THEN 1 ELSE 0 END)
)) AS BIGINT)"""


@query(
    "w_mad_outliers",
    oracle=f"""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    r1 AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM c
    ),
    med AS (
      SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             {_MED2.format(v="cents")} AS med2
      FROM r1 GROUP BY event_type
    ),
    dev AS (
      SELECT c.event_type, abs(2 * c.cents - m.med2) AS dev2
      FROM c JOIN med m USING (event_type)
    ),
    r2 AS (
      SELECT event_type, dev2,
             row_number() OVER (PARTITION BY event_type ORDER BY dev2) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ),
    mad AS (
      SELECT event_type, {_MED2.format(v="dev2")} AS mad4
      FROM r2 GROUP BY event_type
    )
    SELECT m.event_type, m.n,
           m.med2 AS med2_cents,
           a.mad4 AS mad4_cents,
           CAST(sum(CASE WHEN 2 * d.dev2 > 3 * a.mad4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d
    JOIN med m USING (event_type)
    JOIN mad a USING (event_type)
    GROUP BY m.event_type, m.n, m.med2, a.mad4
    """,
    tags=("aggregate", "quantile", "robust", "analytics"),
)
def w_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier gate: |x - median| > 3 * MAD, where
    MAD = median(|x - median|).  Unlike the 3-sigma gate
    (x_zscore_outliers), a single wild value cannot inflate the
    threshold and mask its siblings — the breakdown point is 50%.

    Entirely integer-exact: values go to cents; ``med2`` = sum of the
    two middle order statistics (= 2*median, the g_exact_median trick);
    deviations are kept doubled (``dev2 = |2x - med2| = 2|x - med|``);
    the MAD median of those is ``mad4`` (= 4*MAD); the outlier test
    |x-med| > 3*MAD becomes ``2*dev2 > 3*mad4`` — no float ever enters
    the decision, so Spark and DuckDB agree bit-for-bit.

    Scale: two window passes and one broadcast-sized join, all
    partitioned on the group key — the same single-Exchange shape as
    g_exact_median, run twice.  Groups too large for one task swap to
    the histogram-bucket two-pass locate with identical semantics.
    """
    ev = Tables(spark, sf_dir).events.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )

    def med2_of(df: DataFrame, col: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(col)
        wn = Window.partitionBy("event_type")
        ranked = df.withColumn("rn", F.row_number().over(w)).withColumn(
            "n", F.count(F.lit(1)).over(wn)
        )
        pick = (
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), 1).otherwise(0)
            + F.when(F.col("rn") == F.expr("n div 2 + 1"), 1).otherwise(0)
        )
        return ranked.groupBy("event_type").agg(
            F.max("n").cast("bigint").alias("n"),
            F.sum(F.col(col) * pick).cast("bigint").alias(f"med2_{col}"),
        )

    med = med2_of(ev, "cents").withColumnRenamed("med2_cents", "med2")
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(2 * F.col("cents") - F.col("med2")).alias("dev2")
    )
    mad = (
        med2_of(dev, "dev2")
        .select("event_type", F.col("med2_dev2").alias("mad4"))
    )
    return (
        dev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "med2", "mad4")
        .agg(
            F.sum(
                F.when(2 * F.col("dev2") > 3 * F.col("mad4"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            "n",
            F.col("med2").alias("med2_cents"),
            F.col("mad4").alias("mad4_cents"),
            "n_outliers",
        )
    )


# --------------------------------------------------------------------------
# Hand-built HyperLogLog: register-exact cross-engine, mergeable sketch
# --------------------------------------------------------------------------

_HLL_P = 9  # 2^9 = 512 registers
_HLL_M = 1 << _HLL_P
# 15 hex chars = 60 hash bits; p go to the bucket, 60-p to rho
_HLL_RHO_MAX = 60 - _HLL_P + 1  # rho of an all-zero remainder


@query(
    "x_hll_manual",
    oracle=f"""
    WITH h AS (
      SELECT o_orderstatus,
             CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM orders
    ),
    rb AS (
      SELECT o_orderstatus, hv % {_HLL_M} AS bucket, hv // {_HLL_M} AS w
      FROM h
    ),
    rr AS (
      SELECT o_orderstatus, bucket,
             CASE WHEN w > 0 THEN {_HLL_RHO_MAX} - length(bin(w))
                  ELSE {_HLL_RHO_MAX} END AS rho
      FROM rb
    ),
    regs AS (
      SELECT o_orderstatus, bucket, CAST(max(rho) AS BIGINT) AS m
      FROM rr GROUP BY o_orderstatus, bucket
    ),
    fp AS (
      SELECT o_orderstatus,
             CAST(count(*) AS BIGINT) AS n_registers,
             md5(string_agg(bucket || ':' || m, ',' ORDER BY bucket))
               AS reg_fingerprint
      FROM regs GROUP BY o_orderstatus
    ),
    ex AS (
      SELECT o_orderstatus,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custkeys
      FROM orders GROUP BY o_orderstatus
    )
    SELECT fp.o_orderstatus, fp.n_registers, fp.reg_fingerprint,
           ex.exact_custkeys, TRUE AS within_15pct
    FROM fp JOIN ex USING (o_orderstatus)
    """,
    tags=("sketch", "approx", "analytics"),
)
def x_hll_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog built from primitives (Flajolet et al. 2007), per
    order status: bucket = low p bits of a 60-bit md5 hash, register =
    max leading-zero rank of the remaining bits.  Unlike
    ``approx_count_distinct`` (x_approx_distinct), whose HLL++ registers
    are engine-opaque, every register here is reproducible in ANSI SQL
    — the oracle matches the full register VECTOR by md5 fingerprint
    (rank via ``bin()`` string length, identical in both engines), so
    the sketch itself is hash-checked, not just its estimate.

    The estimate is engine-local float math, so it ships as a
    bounded-error boolean (|est - exact| <= 15% * exact; 512 registers
    give ~4.6% typical error) — the x_approx_distinct pattern.

    Scale: THE distributed-cardinality sketch.  State is 512 registers
    per group regardless of N; ``max`` per (group, bucket) combines
    map-side, registers merge across partitions/days/machines by
    pointwise max — reaggregatable (see x_incremental_reagg) where
    exact count(distinct) is not.
    """
    orders = Tables(spark, sf_dir).orders
    h = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashed = orders.select(
        "o_orderstatus", "o_custkey", h.alias("hv")
    ).select(
        "o_orderstatus",
        "o_custkey",
        (F.col("hv") % _HLL_M).alias("bucket"),
        F.expr(f"hv div {_HLL_M}").alias("w"),
    )
    rho = F.when(
        F.col("w") > 0, F.lit(_HLL_RHO_MAX) - F.length(F.bin(F.col("w")))
    ).otherwise(F.lit(_HLL_RHO_MAX))
    regs = hashed.groupBy("o_orderstatus", "bucket").agg(
        F.max(rho).cast("bigint").alias("m")
    )
    fp = regs.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_registers"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bucket", "m"))),
                    lambda s: F.concat(
                        s["bucket"].cast("string"),
                        F.lit(":"),
                        s["m"].cast("string"),
                    ),
                ),
                ",",
            )
        ).alias("reg_fingerprint"),
        # harmonic mean over ALL 512 registers: absent buckets hold 0,
        # each contributing 2^-0 = 1
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("sum_pow_present"),
    )
    exact = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact_custkeys")
    )
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    joined = fp.join(exact, "o_orderstatus").withColumn(
        "raw_est",
        F.lit(alpha * m * m)
        / (F.col("sum_pow_present") + (F.lit(m) - F.col("n_registers"))),
    )
    zeros = F.lit(m) - F.col("n_registers")
    est = F.when(
        (F.col("raw_est") <= 2.5 * m) & (zeros > 0),
        F.lit(m) * F.log(F.lit(m) / zeros),  # linear counting regime
    ).otherwise(F.col("raw_est"))
    return joined.select(
        "o_orderstatus",
        "n_registers",
        "reg_fingerprint",
        "exact_custkeys",
        (
            F.abs(est - F.col("exact_custkeys"))
            <= 0.15 * F.col("exact_custkeys")
        ).alias("within_15pct"),
    )


# --------------------------------------------------------------------------
# MOSS winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD 2003)
# --------------------------------------------------------------------------

_WIN_K = 8   # k-gram length (chars)
_WIN_W = 4   # window of consecutive k-gram positions
_WIN_PREFIX = 200  # chars of each document fingerprinted


@query(
    "d_winnow_fingerprints",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lower(substr(text, 1, {_WIN_PREFIX})) AS t
      FROM documents
      WHERE length(lower(substr(text, 1, {_WIN_PREFIX}))) >= {_WIN_K + _WIN_W - 1}
    ),
    g AS (
      SELECT doc_id, p,
             CAST(concat('0x',
               substr(md5(substr(t, CAST(p AS INT), {_WIN_K})), 1, 8))
               AS BIGINT) AS h
      FROM d, UNNEST(generate_series(1, length(t) - {_WIN_K - 1})) AS u(p)
    ),
    k AS (
      SELECT doc_id, p,
             row_number() OVER (PARTITION BY doc_id ORDER BY p) AS rn,
             min(h * 1024 + (1023 - p)) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN {_WIN_W - 1} PRECEDING AND CURRENT ROW
             ) AS wmin
      FROM g
    ),
    sel AS (
      SELECT DISTINCT doc_id, wmin FROM k WHERE rn >= {_WIN_W}
    ),
    dec AS (
      SELECT doc_id, wmin // 1024 AS h, 1023 - (wmin % 1024) AS p FROM sel
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_fp,
           md5(string_agg(h || ':' || p, ',' ORDER BY p)) AS fp_digest
    FROM dec GROUP BY doc_id
    """,
    tags=("dedup", "fingerprint", "text"),
)
def d_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm, Schleimer
    et al. 2003): hash every k-gram, slide a w-gram window, select the
    window minimum (ties -> rightmost), record distinct (hash, pos)
    pairs.  Guarantees every shared substring of length >= k+w-1 shares
    a fingerprint — the coverage bound 0-mod-p fingerprinting
    (t_rolling_fingerprint) cannot give.

    The rightmost-min-tie rule is folded into ONE window ``min`` by key
    packing: ``key = h*1024 + (1023 - p)`` orders first by hash then by
    DESCENDING position, so a plain frame min selects (min h, max p)
    and both engines decode the identical (h, p) back out of the winner
    — no self-join per window, no nested window functions.

    Scale: explode(xG grams) happens after a repartition on doc_id and
    the selection window rides that same partitioning (single Exchange,
    asserted in test_plans.py); everything else is per-doc-local.  The
    fingerprint index (join docs sharing a fingerprint) then follows
    the d_minhash_lsh candidate pattern with its df_cap rail.
    """
    docs = Tables(spark, sf_dir).documents
    d = (
        docs.select(
            "doc_id",
            F.lower(F.substring("text", 1, _WIN_PREFIX)).alias("t"),
        )
        .where(F.length("t") >= _WIN_K + _WIN_W - 1)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    g = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.length("t") - (_WIN_K - 1))
        ).alias("p"),
        "t",
    ).select(
        "doc_id",
        "p",
        F.conv(
            F.substring(F.md5(F.expr(f"substring(t, p, {_WIN_K})")), 1, 8),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    wo = Window.partitionBy("doc_id").orderBy("p")
    key = F.col("h") * 1024 + (1023 - F.col("p"))
    k = g.select(
        "doc_id",
        F.row_number().over(wo).alias("rn"),
        F.min(key).over(wo.rowsBetween(-(_WIN_W - 1), 0)).alias("wmin"),
    )
    dec = k.where(F.col("rn") >= _WIN_W).select(
        "doc_id",
        F.struct(
            (1023 - F.col("wmin") % 1024).alias("p"),
            F.expr("wmin div 1024").alias("h"),
        ).alias("fp"),
    )
    # dedup INSIDE the aggregate (array_distinct), not via .distinct():
    # the window already partitioned by doc_id, so this groupBy reuses
    # that Exchange and the whole query is a single shuffle
    arr = F.array_sort(F.array_distinct(F.collect_list("fp")))
    return dec.groupBy("doc_id").agg(
        F.size(arr).cast("bigint").alias("n_fp"),
        F.md5(
            F.array_join(
                F.transform(
                    arr,
                    lambda s: F.concat(
                        s["h"].cast("string"), F.lit(":"), s["p"].cast("string")
                    ),
                ),
                ",",
            )
        ).alias("fp_digest"),
    )


# --------------------------------------------------------------------------
# RAKE keyword extraction (Rose et al. 2010), integer-exact scoring
# --------------------------------------------------------------------------

_RAKE_STOP = (
    "a", "an", "the", "and", "or", "of", "to", "in", "on", "for", "with",
    "is", "are", "was", "were", "be", "by", "at", "as", "it", "this",
    "that", "from", "not", "but",
)
_RAKE_MAX_WORDS = 4
_RAKE_TOPK = 10
_RAKE_STOP_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOP)


@query(
    "t_rake_keywords",
    oracle=f"""
    WITH d AS (
      SELECT lang, doc_id,
             string_split_regex(lower(text), '[^a-z]+') AS arr
      FROM documents
    ),
    toks AS (
      SELECT lang, doc_id, p, arr[CAST(p AS INT)] AS word,
             CASE WHEN arr[CAST(p AS INT)] = ''
                    OR arr[CAST(p AS INT)] IN ({_RAKE_STOP_SQL})
                  THEN 1 ELSE 0 END AS boundary
      FROM d, UNNEST(generate_series(1, len(arr))) AS u(p)
    ),
    grouped AS (
      SELECT lang, doc_id, p, word, boundary,
             sum(boundary) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS UNBOUNDED PRECEDING
             ) AS grp
      FROM toks
    ),
    words AS (
      SELECT lang, doc_id, grp, p, word,
             count(*) OVER (PARTITION BY doc_id, grp) AS phrase_len
      FROM grouped WHERE boundary = 0
    ),
    stats AS (
      SELECT lang, word,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(phrase_len) AS BIGINT) AS deg
      FROM words GROUP BY lang, word
    ),
    phrases AS (
      SELECT w.lang, w.doc_id, w.grp,
             string_agg(w.word, ' ' ORDER BY w.p) AS phrase,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum((1000000 * s.deg) // s.freq) AS BIGINT) AS score_micros
      FROM words w JOIN stats s ON w.lang = s.lang AND w.word = s.word
      GROUP BY w.lang, w.doc_id, w.grp
      HAVING count(*) <= {_RAKE_MAX_WORDS}
    ),
    uniq AS (
      SELECT DISTINCT lang, phrase, n_words, score_micros FROM phrases
    ),
    ranked AS (
      SELECT lang, phrase, n_words, score_micros,
             row_number() OVER (
               PARTITION BY lang ORDER BY score_micros DESC, phrase
             ) AS rank
      FROM uniq
    )
    SELECT lang, CAST(rank AS INT) AS rank, phrase, n_words, score_micros
    FROM ranked WHERE rank <= {_RAKE_TOPK}
    """,
    tags=("text", "keywords", "analytics"),
)
def t_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free word runs; each word scores
    deg(w)/freq(w) over the corpus (deg = summed length of every
    phrase the word occurs in); a phrase scores the sum of its word
    scores.  Top-10 phrases per language.

    The classic float ratio becomes integer-exact per the repo rule:
    word score = (1_000_000 * deg) div freq (integer floor division in
    BOTH engines), summed per phrase — identical bigints, no rounding
    divergence.  Ties rank deterministically by phrase text.

    Scale: tokenization and phrase grouping are doc-local windows (one
    Exchange on doc_id); word stats are one groupBy(lang, word) whose
    output is vocabulary-sized; the stats join back to word
    occurrences is broadcast-able (vocab << corpus).  Final top-k is
    per-lang TakeOrdered.
    """
    docs = Tables(spark, sf_dir).documents
    d = docs.select(
        "lang", "doc_id", F.split(F.lower("text"), "[^a-z]+").alias("arr")
    ).repartition(spark.sparkContext.defaultParallelism, "doc_id")
    toks = d.select(
        "lang",
        "doc_id",
        F.posexplode("arr").alias("p0", "word"),
    ).select(
        "lang",
        "doc_id",
        (F.col("p0") + 1).alias("p"),
        "word",
        F.when(
            (F.col("word") == "") | F.col("word").isin(*_RAKE_STOP), 1
        )
        .otherwise(0)
        .alias("boundary"),
    )
    wg = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grouped = toks.withColumn("grp", F.sum("boundary").over(wg))
    words = grouped.where(F.col("boundary") == 0).withColumn(
        "phrase_len", F.count(F.lit(1)).over(Window.partitionBy("doc_id", "grp"))
    )
    stats = words.groupBy("lang", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("phrase_len").cast("bigint").alias("deg"),
    )
    phrases = (
        words.join(F.broadcast(stats), ["lang", "word"])
        .groupBy("lang", "doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "word"))),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.expr("(1000000 * deg) div freq"))
            .cast("bigint")
            .alias("score_micros"),
        )
        .where(F.col("n_words") <= _RAKE_MAX_WORDS)
    )
    uniq = phrases.select("lang", "phrase", "n_words", "score_micros").distinct()
    wr = Window.partitionBy("lang").orderBy(
        F.desc("score_micros"), F.asc("phrase")
    )
    return (
        uniq.withColumn("rank", F.row_number().over(wr).cast("int"))
        .where(F.col("rank") <= _RAKE_TOPK)
        .select("lang", "rank", "phrase", "n_words", "score_micros")
    )


# --------------------------------------------------------------------------
# Product quantization ANN (Jegou et al. 2011): ADC top-k
# --------------------------------------------------------------------------

_PQ_M = 8      # subspaces
_PQ_SUB = 8    # dims per subspace (8 x 8 = 64-dim embeddings)
_PQ_K = 16     # centroids per subspace codebook
_PQ_QUERY_IDS = (0, 101, 202, 303)
_PQ_TOPK = 5


def _pq_codebook() -> list[tuple[int, int, int, int]]:
    """Deterministic integer codebook rows (s, c, j, v), seeded so the
    oracle SQL inlines the SAME literals (the hyperplanes() pattern).
    Values span the integer-scaled embedding range (~±5.3e5)."""
    import random

    rng = random.Random(11)
    return [
        (s, c, j, rng.randint(-300000, 300000))
        for s in range(_PQ_M)
        for c in range(_PQ_K)
        for j in range(_PQ_SUB)
    ]


_PQ_ROWS = _pq_codebook()
_PQ_VALUES_SQL = ", ".join(f"({s},{c},{j},{v})" for s, c, j, v in _PQ_ROWS)
_PQ_QIDS_SQL = ", ".join(str(q) for q in _PQ_QUERY_IDS)


@query(
    "v_pq_adc_topk",
    oracle=f"""
    WITH cent(s, c, j, v) AS (VALUES {_PQ_VALUES_SQL}),
    iv AS (
      SELECT vec_id, (p - 1) // {_PQ_SUB} AS s, (p - 1) % {_PQ_SUB} AS j,
             CAST(round(CAST(embedding[CAST(p AS INT)] AS DOUBLE) * 1000000)
                  AS BIGINT) AS x
      FROM embeddings, UNNEST(generate_series(1, {_PQ_M * _PQ_SUB})) AS u(p)
    ),
    dists AS (
      SELECT iv.vec_id, iv.s, cent.c,
             sum((iv.x - cent.v) * (iv.x - cent.v)) AS dist
      FROM iv JOIN cent ON iv.s = cent.s AND iv.j = cent.j
      GROUP BY iv.vec_id, iv.s, cent.c
    ),
    codes AS (
      SELECT vec_id, s, c AS code FROM (
        SELECT vec_id, s, c,
               row_number() OVER (
                 PARTITION BY vec_id, s ORDER BY dist, c
               ) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    qd AS (
      SELECT vec_id AS query_id, s, c, dist FROM dists
      WHERE vec_id IN ({_PQ_QIDS_SQL})
    ),
    scored AS (
      SELECT qd.query_id, codes.vec_id AS cand_id,
             CAST(sum(qd.dist) AS BIGINT) AS adc_dist
      FROM codes JOIN qd ON codes.s = qd.s AND codes.code = qd.c
      WHERE codes.vec_id NOT IN ({_PQ_QIDS_SQL})
      GROUP BY qd.query_id, codes.vec_id
    )
    SELECT query_id, cand_id, adc_dist, CAST(rank AS INT) AS rank FROM (
      SELECT query_id, cand_id, adc_dist,
             row_number() OVER (
               PARTITION BY query_id ORDER BY adc_dist, cand_id
             ) AS rank
      FROM scored
    ) WHERE rank <= {_PQ_TOPK}
    """,
    tags=("similarity", "ann", "quantization"),
)
def v_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jegou, Douze, Schmid 2011) with
    asymmetric distance computation: each 64-dim embedding is split
    into 8 subvectors, each encoded as its nearest of 16 codebook
    centroids (integer-exact squared L2, ties -> lowest code), so a
    vector compresses 64 floats -> 8 nibbles.  A query scores a
    candidate by summing its PRECOMPUTED per-subspace distances to the
    candidate's codes — the table-lookup trick that makes
    billion-vector search RAM-resident.

    The codebook is seeded-literal (shared verbatim with the oracle,
    the hyperplanes() pattern); real deployments train it with
    functions/clustering.py's k-means on a sample — the operator shape
    is identical.

    Scale: encoding is a map stage against a broadcast codebook (16
    rows per subspace); the stored index is codes only (4 bytes/vec
    here vs 256 raw).  Query time touches the code table, never the
    raw vectors: distance tables are query_ids x 8 x 16 rows,
    broadcast; the only aggregation is per (query, candidate) over 8
    rows.  Recall/compression trades by _PQ_K and _PQ_M, not by plan
    shape.
    """
    emb = Tables(spark, sf_dir).embeddings
    cent = spark.createDataFrame(_PQ_ROWS, "s INT, c INT, j INT, v LONG")
    iv = (
        emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .select("vec_id", F.posexplode("embedding").alias("p0", "e"))
        .select(
            "vec_id",
            F.expr(f"p0 div {_PQ_SUB}").cast("int").alias("s"),
            (F.col("p0") % _PQ_SUB).cast("int").alias("j"),
            F.round(F.col("e").cast("double") * 1000000)
            .cast("long")
            .alias("x"),
        )
    )
    dists = (
        iv.join(F.broadcast(cent), ["s", "j"])
        .groupBy("vec_id", "s", "c")
        .agg(
            F.sum((F.col("x") - F.col("v")) * (F.col("x") - F.col("v"))).alias(
                "dist"
            )
        )
    )
    dists = dists.localCheckpoint()  # reused by codes AND query tables
    # argmin as min(dist * K + c), NOT min(struct(dist, c)) (r15,
    # guide §7.2): a struct min has an immutable aggregation buffer,
    # so Spark planned Sort + SortAggregate — a full sort of the code
    # table; the long encoding keeps the same lexicographic order
    # (dist >= 0, 0 <= c < K) in a no-sort partial HashAggregate.
    # No overflow: dist <= 8 subdims * (2e6)^2 scaled units ~ 3.2e13,
    # * 16 + 15 << 2^63.  Ties still break to the lowest code.
    codes = (
        dists.groupBy("vec_id", "s")
        .agg(F.min(F.col("dist") * _PQ_K + F.col("c")).alias("m"))
        .select("vec_id", "s", (F.col("m") % _PQ_K).cast("int").alias("code"))
    )
    qids = list(_PQ_QUERY_IDS)
    qd = dists.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "s", "c", "dist"
    )
    scored = (
        codes.where(~F.col("vec_id").isin(qids))
        .join(
            F.broadcast(qd),
            (codes["s"] == qd["s"]) & (codes["code"] == qd["c"]),
        )
        .groupBy("query_id", codes["vec_id"].alias("cand_id"))
        .agg(F.sum("dist").cast("bigint").alias("adc_dist"))
    )
    wr = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("int"))
        .where(F.col("rank") <= _PQ_TOPK)
        .select("query_id", "cand_id", "adc_dist", "rank")
    )


# --------------------------------------------------------------------------
# Decimal-typed ledger: exact money arithmetic through the type system
# --------------------------------------------------------------------------

@query(
    "x_decimal_ledger",
    oracle="""
    WITH amts AS (
      SELECT o_orderstatus AS status,
             strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             CAST(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                       AS DECIMAL(20,2)) / 100 AS DECIMAL(18,2)) AS amt
      FROM orders
    ),
    monthly AS (
      SELECT status, month,
             CAST(count(*) AS BIGINT) AS n,
             sum(amt) AS msum
      FROM amts GROUP BY status, month
    )
    SELECT status, month, n,
           CAST(CAST(msum AS DECIMAL(20,2)) AS VARCHAR) AS month_total,
           CAST(CAST(sum(msum) OVER (
                  PARTITION BY status ORDER BY month
                  ROWS UNBOUNDED PRECEDING
                ) AS DECIMAL(20,2)) AS VARCHAR) AS running_total
    FROM monthly
    """,
    tags=("types", "decimal", "window"),
)
def x_decimal_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money ledger through the DECIMAL type system: amounts enter as
    exact DECIMAL(18,2) (via integer cents, so the double->decimal
    boundary is rounding-rule-proof), monthly sums and the running
    balance stay decimal end-to-end, and the result renders the exact
    scale-2 string — '123.40', never 123.39999.

    This is the type-propagation surface the TPC-H-on-double queries
    skip: Spark widens sum(DECIMAL(18,2)) to DECIMAL(28,2) and DuckDB
    to DECIMAL(38,2); both are exact, and the final cast to
    DECIMAL(20,2) -> VARCHAR proves value AND scale agree across
    engines.  No floats anywhere after ingestion.

    Scale: one groupBy(status, month) with map-side combine, then a
    per-status running-total window over month-cardinality rows
    (O(groups), not O(orders)).
    """
    o = Tables(spark, sf_dir).orders.select(
        F.col("o_orderstatus").alias("status"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.expr(
            "CAST(CAST(CAST(round(o_totalprice * 100) AS BIGINT)"
            " AS DECIMAL(20,2)) / 100 AS DECIMAL(18,2))"
        ).alias("amt"),
    )
    monthly = o.groupBy("status", "month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("amt").alias("msum"),
    )
    wrun = (
        Window.partitionBy("status")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return monthly.select(
        "status",
        "month",
        "n",
        F.col("msum").cast("decimal(20,2)").cast("string").alias("month_total"),
        F.sum("msum")
        .over(wrun)
        .cast("decimal(20,2)")
        .cast("string")
        .alias("running_total"),
    )


# --------------------------------------------------------------------------
# Grouped-aggregate pandas UDF: the missing UDF surface
# --------------------------------------------------------------------------

@query(
    "u_grouped_agg_udf",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM c
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           CAST(sum(CASE WHEN rn > n // 4 AND rn <= n - n // 4
                         THEN cents ELSE 0 END) AS BIGINT) AS trimmed_cents
    FROM r GROUP BY event_type
    """,
    tags=("udf", "pandas", "aggregate"),
)
def u_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the GROUPED_AGG surface — scalar
    pandas UDFs, UDTFs, mapInPandas/Arrow and cogroup are covered
    elsewhere; this is the one Arrow UDF shape the engine didn't yet
    exercise): an interquartile-trimmed sum per group, computed as a
    numpy sort + slice inside the kernel, returning one integer per
    group.

    The trim is order-statistic-defined (drop the bottom and top n//4
    by rank), so the oracle reproduces it exactly with a rank window —
    integer cents make kernel and SQL agree bit-for-bit.

    Scale: Spark evaluates grouped-agg pandas UDFs after a hash
    shuffle on the group key with Arrow transfer per group — fine for
    bounded groups (trim needs the group in memory anyway).  Unbounded
    groups would swap to the rank-window formulation the oracle uses
    (two-pass, no whole-group materialization).
    """
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit eval type: `from __future__ import annotations` stringifies
    # type hints, which defeats pandas_udf's signature inference
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def trimmed_sum(cents):
        a = np.sort(cents.to_numpy(dtype=np.int64))
        n = len(a)
        return int(a[n // 4 : n - n // 4].sum())

    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one
    # agg(), so the group size is a second kernel, not F.count
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def group_n(cents):
        return len(cents)

    ev = Tables(spark, sf_dir).events.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    return ev.groupBy("event_type").agg(
        group_n("cents").alias("n"),
        trimmed_sum("cents").alias("trimmed_cents"),
    )


# --------------------------------------------------------------------------
# Apriori frequent-triple mining (candidate generation + pruning)
# --------------------------------------------------------------------------

_AP_MINSUP_NUM = 1   # support threshold: cnt * 10 >= 1 * total  (>= 10%)


@query(
    "x_itemset_triples",
    oracle=f"""
    WITH b AS (
      SELECT DISTINCT user_id, event_type AS item FROM events
    ),
    tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM b),
    l1 AS (
      SELECT item FROM b, tot GROUP BY item, tot.n
      HAVING count(*) * 10 >= {_AP_MINSUP_NUM} * tot.n
    ),
    bf AS (SELECT b.* FROM b JOIN l1 USING (item)),
    p2 AS (
      SELECT x.item AS a, y.item AS bb, count(*) AS cnt
      FROM bf x JOIN bf y ON x.user_id = y.user_id AND x.item < y.item
      GROUP BY x.item, y.item
    ),
    l2 AS (SELECT a, bb FROM p2, tot
           WHERE cnt * 10 >= {_AP_MINSUP_NUM} * tot.n),
    c3 AS (
      SELECT p.a, p.bb AS b2, q.bb AS c
      FROM l2 p JOIN l2 q ON p.a = q.a AND p.bb < q.bb
      WHERE EXISTS (SELECT 1 FROM l2 z WHERE z.a = p.bb AND z.bb = q.bb)
    ),
    supp AS (
      SELECT c3.a, c3.b2, c3.c, CAST(count(*) AS BIGINT) AS supp_cnt
      FROM c3
      JOIN bf x ON x.item = c3.a
      JOIN bf y ON y.item = c3.b2 AND y.user_id = x.user_id
      JOIN bf z ON z.item = c3.c AND z.user_id = x.user_id
      GROUP BY c3.a, c3.b2, c3.c
    )
    SELECT a, b2 AS b, c, supp_cnt,
           CAST((1000000 * supp_cnt) // tot.n AS BIGINT) AS supp_ppm
    FROM supp, tot
    WHERE supp_cnt * 10 >= {_AP_MINSUP_NUM} * tot.n
    """,
    tags=("itemsets", "apriori", "analytics"),
)
def x_itemset_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemset mining with real Apriori structure (Agrawal
    & Srikant 1994): frequent singles -> frequent pairs -> candidate
    triples generated by joining L2 pairs sharing a prefix, PRUNED by
    the downward-closure check that the (b, c) suffix is itself
    frequent, and only then counted against baskets.  x_basket_lift
    stops at pairs; the candidate-generation + pruning step is what
    keeps the exponential lattice tractable.

    Support thresholds are integer cross-multiplications
    (cnt * 10 >= total), support shares exact ppm — no float ratios.

    Scale: baskets shuffle once on user_id for the pair count; L1/L2
    are item-vocabulary-sized and broadcast; the triple count joins
    baskets on (user, item) with candidates broadcast — never an
    all-triples cartesian.  Deeper levels iterate the same
    generate-prune-count template.
    """
    ev = Tables(spark, sf_dir).events
    b = ev.select("user_id", F.col("event_type").alias("item")).distinct()
    b = b.localCheckpoint()  # reused by L1, pair, and triple counting
    total = b.select("user_id").distinct().count()

    l1 = (
        b.groupBy("item")
        .count()
        .where(F.col("count") * 10 >= _AP_MINSUP_NUM * total)
        .select("item")
    )
    bf = b.join(F.broadcast(l1), "item").select("user_id", "item")
    x = bf.alias("x")
    y = bf.alias("y")
    p2 = (
        x.join(
            y,
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.item") < F.col("y.item")),
        )
        .groupBy(F.col("x.item").alias("a"), F.col("y.item").alias("b"))
        .count()
    )
    l2 = p2.where(F.col("count") * 10 >= _AP_MINSUP_NUM * total).select("a", "b")
    p = l2.alias("p")
    q = l2.alias("q")
    cand = (
        p.join(
            q,
            (F.col("p.a") == F.col("q.a")) & (F.col("p.b") < F.col("q.b")),
        )
        .select(
            F.col("p.a").alias("a"),
            F.col("p.b").alias("b"),
            F.col("q.b").alias("c"),
        )
        # downward closure: the (b, c) suffix must be frequent too
        .join(
            F.broadcast(l2.select(F.col("a").alias("b"), F.col("b").alias("c"))),
            ["b", "c"],
            "left_semi",
        )
    )
    s1 = bf.join(F.broadcast(cand), bf["item"] == cand["a"]).select(
        "user_id", "a", "b", "c"
    )
    s2 = s1.join(
        bf.select(F.col("user_id").alias("uy"), F.col("item").alias("ib")),
        (F.col("user_id") == F.col("uy")) & (F.col("b") == F.col("ib")),
    ).select("user_id", "a", "b", "c")
    supp = (
        s2.join(
            bf.select(F.col("user_id").alias("uz"), F.col("item").alias("ic")),
            (F.col("user_id") == F.col("uz")) & (F.col("c") == F.col("ic")),
        )
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("supp_cnt"))
    )
    return supp.where(F.col("supp_cnt") * 10 >= _AP_MINSUP_NUM * total).select(
        "a",
        "b",
        "c",
        "supp_cnt",
        F.expr(f"(1000000 * supp_cnt) div {total}").cast("bigint").alias("supp_ppm"),
    )


# --------------------------------------------------------------------------
# Semi-supervised label propagation over an LSH similarity graph
# --------------------------------------------------------------------------

_LP_BITS = 4
_LP_ROUNDS = 3


def _lp_planes() -> list[list[int]]:
    import map2db_spark.functions.similarity as S

    return S.hyperplanes(dim=64, bits=_LP_BITS, seed=9)


def _lp_oracle() -> str:
    planes = _lp_planes()
    terms = []
    for b, plane in enumerate(planes):
        arr = "[" + ", ".join(str(v) for v in plane) + "]::BIGINT[]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {arr}) > 0 THEN {2 ** b} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    iv = (
        "list_transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
    )
    rounds = []
    for r in range(1, _LP_ROUNDS + 1):
        rounds.append(f"""
    v{r} AS (
      SELECT e.u, l.label, count(*) AS c
      FROM edges e JOIN l{r - 1} l ON e.v = l.vec_id
      WHERE l.label IS NOT NULL
      GROUP BY e.u, l.label
    ),
    b{r} AS (
      SELECT u, label FROM (
        SELECT u, label,
               row_number() OVER (PARTITION BY u ORDER BY c DESC, label) AS rn
        FROM v{r}
      ) WHERE rn = 1
    ),
    l{r} AS (
      SELECT n.vec_id, COALESCE(n.seed, b.label, p.label) AS label
      FROM nodes n
      LEFT JOIN b{r} b ON n.vec_id = b.u
      JOIN l{r - 1} p ON n.vec_id = p.vec_id
    )""")
    return f"""
    WITH ivs AS (SELECT vec_id, label, {iv} AS v FROM embeddings),
    nodes AS (
      SELECT vec_id, {bucket} AS bucket,
             CASE WHEN vec_id % 5 = 0 THEN CAST(label AS BIGINT) END AS seed
      FROM ivs
    ),
    edges AS (
      SELECT a.vec_id AS u, b.vec_id AS v
      FROM nodes a JOIN nodes b
        ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    l0 AS (SELECT vec_id, seed AS label FROM nodes),
    {", ".join(rounds)}
    SELECT n.vec_id, l{_LP_ROUNDS}.label AS final_label,
           n.seed IS NOT NULL AS is_seed
    FROM l{_LP_ROUNDS} JOIN nodes n USING (vec_id)
    """


@query("g_label_prop", oracle=_lp_oracle(), tags=("graph", "semisup", "analytics"))
def g_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation (Zhu & Ghahramani 2002) over
    an LSH-bucket similarity graph: 20% of embeddings keep their label
    as clamped seeds; each synchronous round, every node takes the
    majority label among its neighbors (ties -> lowest label), keeping
    its previous label when no neighbor is labeled.  Fixed round count
    makes the fixpoint-free iteration deterministic and lets the
    oracle unroll it as layered CTEs (the g_pagerank pattern).

    The graph itself is the scale-safe candidate structure: edges come
    from 4-bit random-hyperplane buckets (seeded literals shared with
    the oracle) — never an all-pairs similarity join.

    Scale: per round, one shuffle groupBy((node, label)) for votes and
    one broadcast-sized argmax join back; edges are checkpointed once
    and re-partitioned by dst so each round's join is co-located.
    Rounds are O(log diameter) in practice; components.py handles the
    exact-fixpoint regime.  The per-node majority argmax is a
    WindowGroupLimit top-1 window ordered (c DESC, label ASC) — r16,
    guide §7.2: min(struct(-c, label)) has an immutable struct
    buffer, planning Sort + SortAggregate over the votes table every
    round (hidden behind the per-round localCheckpoint but executed;
    the d_minhash_recall_skewed blind spot).  Value-identical
    INCLUDING ties: (c, label) pairs are unique within a node (votes
    is grouped by (u, label)), and the window's total order replays
    the struct-min's exact tie-break.  labels are unbounded bigints,
    so the PQ-style (-c)*K+label long encoding was rejected (overflow
    class, ADVICE r14)."""
    import map2db_spark.functions.similarity as S

    planes = _lp_planes()
    emb = Tables(spark, sf_dir).embeddings
    nodes = emb.select(
        "vec_id",
        S.lsh_bucket(F.col("embedding"), planes).alias("bucket"),
        F.when(F.col("vec_id") % 5 == 0, F.col("label").cast("bigint")).alias(
            "seed"
        ),
    ).localCheckpoint()
    a = nodes.alias("a")
    b = nodes.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("u"), F.col("b.vec_id").alias("v"))
        .localCheckpoint()
    )
    cur = nodes.select("vec_id", F.col("seed").alias("label"))
    for _ in range(_LP_ROUNDS):
        votes = (
            edges.join(
                cur.where(F.col("label").isNotNull()).select(
                    F.col("vec_id").alias("v"), "label"
                ),
                "v",
            )
            .groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        wnd = Window.partitionBy("u").orderBy(
            F.col("c").desc(), F.col("label").asc()
        )
        best = (
            votes.withColumn("__rn", F.row_number().over(wnd))
            .where(F.col("__rn") == 1)
            .select(F.col("u").alias("vec_id"), F.col("label").alias("maj"))
        )
        cur = (
            nodes.select("vec_id", "seed")
            .join(best, "vec_id", "left")
            .join(cur.select("vec_id", F.col("label").alias("prev")), "vec_id")
            .select(
                "vec_id",
                F.coalesce("seed", "maj", "prev").alias("label"),
            )
            .localCheckpoint()  # keep the iterative lineage flat
        )
    return cur.join(nodes.select("vec_id", "seed"), "vec_id").select(
        "vec_id",
        F.col("label").alias("final_label"),
        F.col("seed").isNotNull().alias("is_seed"),
    )
