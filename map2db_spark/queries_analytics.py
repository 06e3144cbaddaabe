"""Corpus/graph analytics extensions: triangle counting, weighted
sampling without replacement, and a count-min sketch — three more
operations a large-scale training-data pipeline needs, each expressed
Spark-first with an exact DuckDB oracle.

Shared parity conventions (CLAUDE.md): every cross-engine value is
integer or md5-string; hex->int via Spark ``conv(x,16,10)`` vs DuckDB
``CAST(concat('0x',x) AS BIGINT)``; identical column aliases both
sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map2db_spark.registry import query
from map2db_spark.tables import Tables


# --------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation)
# --------------------------------------------------------------------------

def count_triangles(e: DataFrame) -> DataFrame:
    """Degree-ordered exact triangle counting over a canonical edge
    table (columns a < b, no duplicates).  Returns one row: n_nodes,
    n_edges, n_wedges (orientation-free sum d(d-1)/2), n_triangles.
    Factored out of g_triangle_count so property tests can drive it
    on constructed graphs (K_n, stars, cycles) where the truth is
    closed-form — see tests/test_analytics_properties.py."""
    e = e.localCheckpoint()  # reused 4x below; keep lineage flat
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    )
    w1 = oriented.select(F.col("src"), F.col("dst").alias("v"))
    w2 = oriented.select(F.col("src"), F.col("dst").alias("w"))
    wedges = w1.join(w2, "src").where(F.col("v") < F.col("w"))
    triangles = wedges.join(
        e, (F.col("v") == F.col("a")) & (F.col("w") == F.col("b")), "left_semi"
    )
    n_tri = triangles.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    n_edges = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    deg_stats = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).cast("bigint").alias("n_wedges"),
    )
    return deg_stats.crossJoin(n_edges).crossJoin(n_tri)


@query(
    "g_triangle_count",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (
      SELECT DISTINCT a.p AS a, b.p AS b
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
      GROUP BY node
    ),
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
           (SELECT n_triangles FROM tri) AS n_triangles,
           -- degenerate-input audit (r14): a graph with no wedges
           -- (every node degree <= 1) has no closable paths — the
           -- closure rate is undefined, NULL on BOTH engines
           (SELECT CASE WHEN sum(d * (d - 1) // 2) = 0 THEN NULL
                   ELSE CAST((SELECT n_triangles FROM tri) * 3000000
                             // sum(d * (d - 1) // 2) AS BIGINT) END
            FROM deg) AS closure_ppm
    """,
    tags=("graph", "analytics", "scale"),
)
def g_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count on the part co-purchase graph (parts are
    adjacent iff some order contains both), via DEGREE-ORDERED
    ORIENTATION — the standard trick that makes distributed triangle
    counting survive skewed degree distributions: orient every edge
    from its lower-(degree, id) endpoint to the higher one, so each
    node's oriented out-degree is O(sqrt(E)) regardless of its raw
    degree, and the wedge join (pairs of oriented edges sharing a
    source) generates O(E^1.5) candidates instead of the
    sum-of-d-squared blowup a hub node causes in the naive plan.  Each
    triangle is found exactly once, pivoted at its lowest-(deg, id)
    vertex.

    The edge derivation itself is bounded: lineitem explodes per
    ORDER (<= 7 items -> <= 21 pairs), never per part, so a
    best-selling part with 10^6 orders costs nothing extra at pair
    time.  Global wedge count sum(d*(d-1)/2) is orientation-free, so
    the closure rate (3*triangles/wedges, exact ppm integer) is
    cross-engine checkable.

    Scale: three keyed shuffles (distinct items, distinct edges,
    degree agg) + the wedge self-join keyed on the oriented source.
    No cartesian anywhere — asserted in test_plans.py.
    """
    t = Tables(spark, sf_dir)
    li = (
        t.lineitem.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e = (
        li.alias("x")
        .join(li.alias("y"), (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")))
        .select(F.col("x.p").alias("a"), F.col("y.p").alias("b"))
        .distinct()
    )
    return (
        count_triangles(e)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.expr(
                "CASE WHEN n_wedges = 0 THEN NULL"
                " ELSE CAST(n_triangles * 3000000 DIV n_wedges"
                " AS BIGINT) END"
            ).alias("closure_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis, exact)
# --------------------------------------------------------------------------

_WS_KEY_SPARK = (
    "array_max(transform(sequence(1, w),"
    " j -> md5(cast(concat(cast(doc_id as string), ':', cast(j as string))"
    " as binary))))"
)

_WS_KEY_DUCK = (
    "list_max(list_transform(range(1, w + 1),"
    " j -> md5(CAST(doc_id AS VARCHAR) || ':' || j)))"
)


@query(
    "c_weighted_sample",
    oracle=f"""
    WITH wtd AS (
      SELECT doc_id, source,
             CAST(least(1 + n_chars // 80, 8) AS BIGINT) AS w
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, source, w, {_WS_KEY_DUCK} AS sample_key FROM wtd
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY sample_key DESC, doc_id) AS rk
      FROM keyed
    )
    SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, w, sample_key
    FROM ranked WHERE rk <= 3
    """,
    tags=("curation", "sampling", "pipeline"),
)
def c_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (top-3 per source,
    weight = document length bucket) via the Efraimidis-Spirakis
    exponential-key construction made EXACT and deterministic: for
    integer weight w, the max of w iid uniforms has CDF x^w — the
    same distribution as the classic u^(1/w) key — so taking
    ``max_{{j=1..w}} md5(doc_id:j)`` and keeping the top-k keys IS
    weighted sampling without replacement, with no floating-point
    pow/log anywhere (an ordering flip in the last ulp would change
    the selected set; md5-string comparison cannot drift between
    engines).

    Scale: the key is computed in ONE row-local higher-order-function
    expression (transform + array_max over a <= 8-element array — no
    explode, no extra rows), then one window shuffle partitioned by
    source picks top-3.  For few huge strata, swap the window for the
    per-partition-partial + global-merge top-k (s_global_topk
    pattern).
    """
    from pyspark.sql.window import Window

    docs = Tables(spark, sf_dir).documents.select(
        "doc_id",
        "source",
        F.expr("cast(least(1 + n_chars div 80, 8) as bigint)").alias("w"),
    )
    keyed = docs.withColumn("sample_key", F.expr(_WS_KEY_SPARK))
    win = Window.partitionBy("source").orderBy(F.desc("sample_key"), F.asc("doc_id"))
    return (
        keyed.withColumn("rk", F.row_number().over(win).cast("bigint"))
        .where(F.col("rk") <= 3)
        .select("source", "rk", "doc_id", "w", "sample_key")
    )


# --------------------------------------------------------------------------
# Count-min sketch (deterministic md5 rows, exact overestimate audit)
# --------------------------------------------------------------------------

_CMS_D = 3  # hash rows
_CMS_W = 16  # buckets per row — small on purpose so collisions are real


def _cms_col_spark(i: int, tok: str) -> str:
    return (
        f"cast(conv(substring(md5(cast(concat('cms{i}:', {tok}) as binary)),"
        f" 1, 8), 16, 10) as bigint) % {_CMS_W}"
    )


def _cms_col_duck(i: int, tok: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5('cms{i}:' || {tok}), 1, 8)) AS BIGINT)"
        f" % {_CMS_W}"
    )


@query(
    "x_countmin_sketch",
    oracle=f"""
    WITH tok AS (
      SELECT t AS tok FROM (
        SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
        FROM documents
      ) WHERE t <> ''
    ),
    exact AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS exact_n FROM tok GROUP BY tok
    ),
    cells AS (
      SELECT i, col, CAST(count(*) AS BIGINT) AS cnt FROM (
        {" UNION ALL ".join(
            f"SELECT {i} AS i, {_cms_col_duck(i, 'tok')} AS col FROM tok"
            for i in range(_CMS_D)
        )}
      ) GROUP BY i, col
    ),
    est AS (
      SELECT e.tok, e.exact_n, min(c.cnt) AS est_n
      FROM exact e
      JOIN cells c ON (
        {" OR ".join(
            f"(c.i = {i} AND c.col = {_cms_col_duck(i, 'e.tok')})"
            for i in range(_CMS_D)
        )}
      )
      GROUP BY e.tok, e.exact_n
    )
    SELECT tok, exact_n, est_n, est_n - exact_n AS overestimate
    FROM est
    ORDER BY exact_n DESC, tok
    LIMIT 10
    """,
    tags=("sketch", "analytics", "scale"),
)
def x_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the document token stream, with an EXACT
    overestimate audit: d=3 hash rows x w=16 buckets
    (md5-derived, deterministic — both engines build the identical
    sketch), estimate = min over rows of the hit counter, and the
    result reports est_n - exact_n per top-10 token, which the CMS
    guarantee says is >= 0 always and small with high probability.
    The bucket count is deliberately tiny so collisions actually
    happen at test scale and the overestimate column is non-trivial.

    Scale: THE point of a CMS — the sketch is d*w cells regardless of
    corpus size, each token occurrence updates d cells map-side, and
    the groupBy(i, col) partial-aggregates to at most d*w rows per
    partition before one fixed-size shuffle.  Sketches from disjoint
    corpus shards merge by cell-wise addition (the same groupBy).
    The exact side here exists only to audit the error; production
    keeps just the 48-cell sketch.  Token explode happens after a
    repartition so a single input file still parallelizes
    (CLAUDE.md explode rule).
    """
    docs = Tables(spark, sf_dir).documents.select("doc_id", "text").repartition(spark.sparkContext.defaultParallelism)
    tok = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("tok")
        )
        .where(F.col("tok") != "")
        .localCheckpoint()  # reused by the exact side and all d sketch rows
    )
    cells = (
        tok.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            F.expr(_cms_col_spark(i, "tok")).alias("col"),
                        )
                        for i in range(_CMS_D)
                    ]
                )
            ).alias("c")
        )
        .select("c.i", "c.col")
        .groupBy("i", "col")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    exact = tok.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
    probes = exact.select(
        "tok",
        "exact_n",
        *[
            F.expr(_cms_col_spark(i, "tok")).alias(f"col{i}")
            for i in range(_CMS_D)
        ],
    )
    est = probes
    for i in range(_CMS_D):
        ci = cells.where(F.col("i") == i).select(
            F.col("col").alias(f"col{i}"), F.col("cnt").alias(f"cnt{i}")
        )
        est = est.join(F.broadcast(ci), f"col{i}")
    return (
        est.select(
            "tok",
            "exact_n",
            F.least(*[F.col(f"cnt{i}") for i in range(_CMS_D)]).alias("est_n"),
        )
        .withColumn("overestimate", F.col("est_n") - F.col("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("tok"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Exact per-group median via integer order statistics
# --------------------------------------------------------------------------

@query(
    "g_exact_median",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    ranked AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM c
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           CAST(sum(cents * (
                 (CASE WHEN rn = (n + 1) // 2 THEN 1 ELSE 0 END)
               + (CASE WHEN rn = n // 2 + 1 THEN 1 ELSE 0 END)
           )) AS BIGINT) AS med2_cents,
           CAST(sum(cents * (
                 (CASE WHEN rn = (n + 1) // 2 THEN 1 ELSE 0 END)
               + (CASE WHEN rn = n // 2 + 1 THEN 1 ELSE 0 END)
           )) * 5000 AS BIGINT) AS median_micros
    FROM ranked
    GROUP BY event_type
    """,
    tags=("aggregate", "quantile", "analytics"),
)
def g_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median — no approx_percentile, no float
    interpolation ambiguity: values go to integer cents, each group is
    rank-numbered, and the median is reconstructed from the one or two
    middle order statistics as ``med2 = cents[(n+1)/2] + cents[n/2+1]``
    (the two indices coincide for odd n, so the indicator sum counts
    that row twice) — med2 is twice the median, kept integer; the
    display value is exact fixed-point micros (med2 * 5000).  Both
    engines agree bit-for-bit because ties need no ordering rule:
    order statistics only depend on the sorted multiset.

    Scale: one shuffle on the group key; rank + per-group count ride
    the same window partitioning (single Exchange).  For groups too
    large to sort in one task, swap to the two-pass
    count-then-locate form (histogram of value buckets, then exact
    scan of the straddling bucket) — same integer semantics.
    """
    from pyspark.sql.window import Window

    ev = Tables(spark, sf_dir).events.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("cents")
    wn = Window.partitionBy("event_type")
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    pick = (
        F.when(F.col("rn") == F.expr("(n + 1) div 2"), 1).otherwise(0)
        + F.when(F.col("rn") == F.expr("n div 2 + 1"), 1).otherwise(0)
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.col("cents") * pick).cast("bigint").alias("med2_cents"),
        (F.sum(F.col("cents") * pick) * 5000).cast("bigint").alias("median_micros"),
    )


# --------------------------------------------------------------------------
# Incremental re-aggregation (partial -> merge, never re-read raw)
# --------------------------------------------------------------------------

@query(
    "x_incremental_reagg",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    monthly_from_daily AS (
      SELECT date_trunc('month', day) AS month, event_type,
             CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM daily GROUP BY 1, 2
    ),
    monthly_direct AS (
      SELECT date_trunc('month', CAST(ts AS DATE)) AS month, event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(m.month AS DATE) AS month, m.event_type, m.n, m.cents,
           CAST(m.n = d.n AND m.cents = d.cents AS BOOLEAN) AS merge_exact
    FROM monthly_from_daily m
    JOIN monthly_direct d ON m.month = d.month AND m.event_type = d.event_type
    """,
    tags=("aggregate", "incremental", "scale"),
)
def x_incremental_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental re-aggregation — the materialized-rollup pattern
    that makes 100 TB dashboards affordable: daily partial aggregates
    (count + integer-cents sum, both MERGEABLE: merge = add) roll up
    to monthly totals WITHOUT re-reading raw events, and the query
    proves the contract by computing the monthly totals both ways and
    emitting a per-row ``merge_exact`` flag the oracle must agree is
    always true.  Works because count/sum are commutative monoids in
    exact integers — the same property that makes map-side partial
    aggregation correct, lifted to storage.

    Scale: in production the daily table is written once per day
    (O(days x types) rows); month-end reads scan partials, a ~10^4x
    data reduction here.  AVG-like stats stay mergeable by storing
    (sum, n) pairs, never the ratio.
    """
    ev = Tables(spark, sf_dir).events.select(
        F.col("ts").cast("date").alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    daily = ev.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("cents"),
    )
    monthly_from_daily = daily.groupBy(
        F.date_trunc("month", "day").cast("date").alias("month"), "event_type"
    ).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("cents"),
    )
    monthly_direct = ev.groupBy(
        F.date_trunc("month", "day").cast("date").alias("month"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("dn"),
        F.sum("cents").cast("bigint").alias("dcents"),
    )
    return (
        monthly_from_daily.join(monthly_direct, ["month", "event_type"])
        .select(
            "month",
            "event_type",
            "n",
            "cents",
            ((F.col("n") == F.col("dn")) & (F.col("cents") == F.col("dcents"))).alias(
                "merge_exact"
            ),
        )
    )


# --------------------------------------------------------------------------
# Key-skew profiler (log2 frequency histogram)
# --------------------------------------------------------------------------

@query(
    "x_key_skew_profile",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(length(bin(c)) AS BIGINT) AS bits,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(min(c) AS BIGINT) AS min_c,
           CAST(max(c) AS BIGINT) AS max_c,
           CAST(sum(c) AS BIGINT) AS n_rows
    FROM per_key
    GROUP BY 1
    """,
    tags=("diagnostics", "skew", "scale"),
)
def x_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew profiler: the diagnostic you run BEFORE choosing a
    shuffle strategy on a 100 TB join — per-key row counts bucketed by
    bit length (``length(bin(c))`` = floor(log2 c)+1, exact integer in
    both engines — no float log whose boundary rounding could differ),
    yielding the frequency histogram that tells you whether AQE skew
    splitting suffices, salting is needed, or a hot key must be
    broadcast-isolated.  A top bucket with few keys and a huge
    n_rows IS the skew signature.

    Scale: one keyed shuffle for per-key counts (map-side combined),
    then a ~64-row histogram aggregate — the profile costs one pass
    regardless of key cardinality.
    """
    orders = Tables(spark, sf_dir).orders.select("o_custkey")
    per_key = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return per_key.groupBy(
        F.length(F.bin(F.col("c"))).cast("bigint").alias("bits")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.min("c").cast("bigint").alias("min_c"),
        F.max("c").cast("bigint").alias("max_c"),
        F.sum("c").cast("bigint").alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Prefix-filtered exact set-similarity join (PPJoin-style)
# --------------------------------------------------------------------------

_TOKSET_DUCK = """
    SELECT DISTINCT doc_id AS sid, t AS tok FROM (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
      FROM documents WHERE doc_id < 100
    ) WHERE t <> ''
"""


def prefix_filter_pairs(tok: DataFrame, t_num: int, t_den: int) -> DataFrame:
    """PPJoin over a distinct (sid, tok) set table at Jaccard
    threshold t = t_num/t_den: df-ordered prefixes of length
    |s| - ceil(t|s|) + 1, prefix self-join for candidates, candidate-
    restricted inverted-index verification, exact cross-multiplied
    threshold.  Returns (id_a, id_b, inter_n, union_n).  Factored out
    of d_prefix_filter_join so the losslessness property (result ==
    brute force on arbitrary set families) is testable on constructed
    inputs — see tests/test_analytics_properties.py."""
    from pyspark.sql.window import Window

    tok = tok.localCheckpoint()  # base of 4 plan branches
    dfreq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    sizes = tok.groupBy("sid").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = (
        tok.join(dfreq, "tok")
        .join(sizes, "sid")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("sid").orderBy("df", "tok")),
        )
        # prefix length |s| - ceil(t|s|) + 1, exact integer ceil
        .where(
            F.col("rn")
            <= F.col("n") - F.expr(f"({t_num} * n + {t_den} - 1) div {t_den}") + 1
        )
        .select("sid", "tok")
    )
    cand = (
        ranked.alias("a")
        .join(ranked.alias("b"), "tok")
        .where(F.col("a.sid") < F.col("b.sid"))
        .select(F.col("a.sid").alias("id_a"), F.col("b.sid").alias("id_b"))
        .distinct()
    )
    a = tok.select(F.col("sid").alias("id_a"), "tok")
    b = tok.select(F.col("sid").alias("id_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .join(F.broadcast(cand), ["id_a", "id_b"], "left_semi")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter_n"))
    )
    na = sizes.select(F.col("sid").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("sid").alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .withColumn("union_n", F.col("n_a") + F.col("n_b") - F.col("inter_n"))
        .where(t_den * F.col("inter_n") >= t_num * F.col("union_n"))
        .select("id_a", "id_b", "inter_n", "union_n")
    )


@query(
    "d_prefix_filter_join",
    oracle=f"""
    WITH tok AS ({_TOKSET_DUCK}),
    sizes AS (SELECT sid, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY sid),
    inter AS (
      SELECT a.sid AS id_a, b.sid AS id_b, CAST(count(*) AS BIGINT) AS inter_n
      FROM tok a JOIN tok b ON a.tok = b.tok AND a.sid < b.sid
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, inter_n,
           na.n + nb.n - inter_n AS union_n,
           CAST(inter_n * 1000000 // (na.n + nb.n - inter_n) AS BIGINT)
             AS jac_ppm
    FROM inter JOIN sizes na ON na.sid = id_a
               JOIN sizes nb ON nb.sid = id_b
    WHERE 10 * inter_n >= 9 * (na.n + nb.n - inter_n)
    """,
    tags=("dedup", "similarity-join", "scale"),
)
def d_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity join at Jaccard >= 0.9 via PREFIX
    FILTERING (the PPJoin family) — the third similarity-join
    technique in the engine, complementary to LSH (probabilistic,
    d_minhash_lsh) and df-capped inverted-index (exact but
    all-overlapping-pairs, d_ngram_jaccard): order every document's
    token set by ascending global document frequency, index ONLY the
    first |s| - ceil(t*|s|) + 1 tokens, and join on those.  Lossless
    by the pigeonhole bound — two sets meeting threshold t must share
    a token within either's prefix — so unlike LSH there is no recall
    loss, yet at t=0.9 only ~10% of each set is indexed, and those
    are its RAREST tokens, exactly the ones with small join fan-out
    (frequent tokens never enter any prefix: the stopword-skew rail
    falls out of the algorithm instead of needing a df_cap).

    The verify stage is the candidate-restricted inverted-index count
    (jaccard_pairs convention, functions/dedup.py:137); the threshold
    compare is exact integer cross-multiplication (10*i >= 9*u — no
    float ratio at the decision boundary), and the oracle computes
    the ground truth by the BRUTE-FORCE method, so the test proves
    losslessness, not just self-agreement.

    Scale: shuffles are (a) the tokenize+distinct, (b) the window for
    df-rank (keyed on sid), (c) the prefix self-join keyed on token,
    (d) the candidate-restricted verification join.  No all-pairs
    anywhere; candidate volume is sum over prefix-tokens of df^2
    where df is small by construction.
    """
    docs = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 100)
    tok = (
        docs.select(
            F.col("doc_id").alias("sid"),
            F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .distinct()
    )
    return prefix_filter_pairs(tok, 9, 10).select(
        "id_a",
        "id_b",
        "inter_n",
        "union_n",
        F.expr("inter_n * 1000000 div union_n").cast("bigint").alias("jac_ppm"),
    )


# --------------------------------------------------------------------------
# Market-basket association (co-occurrence lift)
# --------------------------------------------------------------------------

@query(
    "x_basket_lift",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    n_orders AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS big_n FROM li),
    pc AS (SELECT p, CAST(count(*) AS BIGINT) AS n_p FROM li GROUP BY p),
    pairs AS (
      SELECT a.p AS part_a, b.p AS part_b, CAST(count(*) AS BIGINT) AS n_ab
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_ab,
           pa.n_p AS n_a, pb.n_p AS n_b,
           CAST(n_ab * big_n * 1000000 // (pa.n_p * pb.n_p) AS BIGINT)
             AS lift_ppm
    FROM pairs
    JOIN pc pa ON pa.p = part_a
    JOIN pc pb ON pb.p = part_b
    CROSS JOIN n_orders
    WHERE n_ab >= 3
    """,
    tags=("analytics", "association", "scale"),
)
def x_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: co-purchase pair supports and
    LIFT (P(a,b) / P(a)P(b), the association-rule strength measure),
    kept exact with integer cross-multiplication — lift_ppm =
    n_ab * N * 1e6 div (n_a * n_b) — so a 1000-executor shuffle cannot
    perturb a single row.  Pairs with support >= 3 only: the support
    threshold is what bounds A-priori-style mining at scale (a pair
    seen twice in 10^10 baskets is noise, and pruning it early is the
    entire algorithm).

    Scale: pair generation is per-basket bounded (<= 7 items per
    order -> <= 21 pairs), NEVER per part — the classic bipartite
    projection blowup is avoided by exploding along the small axis.
    One pair-keyed shuffle with map-side combine; the per-part count
    joins key on part_a/part_b.
    """
    t = Tables(spark, sf_dir)
    li = (
        t.lineitem.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint()  # base of 3 branches (N, per-part counts, pairs)
    )
    big_n = li.agg(F.countDistinct("o").cast("bigint").alias("big_n"))
    pc = li.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("n_p"))
    pairs = (
        li.alias("x")
        .join(li.alias("y"), (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")))
        .groupBy(F.col("x.p").alias("part_a"), F.col("y.p").alias("part_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= 3)
    )
    pa = pc.select(F.col("p").alias("part_a"), F.col("n_p").alias("n_a"))
    pb = pc.select(F.col("p").alias("part_b"), F.col("n_p").alias("n_b"))
    return (
        pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .crossJoin(big_n)
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr("n_ab * big_n * 1000000 div (n_a * n_b)")
            .cast("bigint")
            .alias("lift_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Rolling 7-day distinct users (bounded explode, no range join)
# --------------------------------------------------------------------------

@query(
    "w_rolling_active_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    days AS (SELECT DISTINCT day FROM ud),
    au AS (
      SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS active_users_7d
      FROM days d
      JOIN ud u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    ),
    ev7 AS (
      SELECT d.day, CAST(sum(daily.n_events) AS BIGINT) AS events_7d
      FROM days d
      JOIN daily ON daily.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT au.day, au.active_users_7d, ev7.events_7d
    FROM au JOIN ev7 ON au.day = ev7.day
    """,
    tags=("window", "timeseries", "scale"),
)
def w_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the metric every
    growth dashboard needs and the one a naive range frame CANNOT
    compute (COUNT(DISTINCT) over a RANGE window isn't supported, and
    a range JOIN of events x days is quadratic pressure).  Spark-first
    form: distinct (user, day) pairs explode to the <= 7 target days
    they contribute to (a BOUNDED explode along the small axis — 7x,
    compare the unbounded per-day probe join), then one
    (target-day)-keyed countDistinct.  The oracle computes the same
    thing by the lateral range join DuckDB is happy with at test
    scale — two different algorithms, one answer.

    Scale: distinct-pair dedup is one shuffle keyed (user, day);
    the 7x explode is map-side; the final agg keys on ~10^3 days.
    countDistinct(user) per day re-shuffles by (day, user) — for
    10^9-user days switch to the two-level exact form (groupBy(day,
    user) then groupBy(day)) which Catalyst already plans here.
    """
    ev = Tables(spark, sf_dir).events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    bounds = ev.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    ud = ev.distinct()
    daily = ev.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    # each (user, day) contributes to target days day..day+6
    targets = ud.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, date_add(day, 6), interval 1 day)")
        ).alias("tday"),
    )
    daily_t = daily.select(
        F.col("n_events"),
        F.explode(
            F.expr("sequence(day, date_add(day, 6), interval 1 day)")
        ).alias("tday"),
    )
    users_7d = targets.groupBy("tday").agg(
        F.countDistinct("user_id").cast("bigint").alias("active_users_7d")
    )
    events_7d = daily_t.groupBy("tday").agg(
        F.sum("n_events").cast("bigint").alias("events_7d")
    )
    return (
        users_7d.join(events_7d, "tday")
        .crossJoin(F.broadcast(bounds))
        # clip to days that actually exist in the data (the explode
        # manufactures up to 6 days past the horizon)
        .where((F.col("tday") >= F.col("lo")) & (F.col("tday") <= F.col("hi")))
        .select(F.col("tday").alias("day"), "active_users_7d", "events_7d")
    )


# --------------------------------------------------------------------------
# k-core peeling (fixed rounds, layered-CTE oracle)
# --------------------------------------------------------------------------

_KCORE_K = 100
_KCORE_ROUNDS = 2


@query(
    "g_kcore_peel",
    oracle=f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e0 AS (
      SELECT DISTINCT a.p AS a, b.p AS b
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
    ),
    d0 AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT a AS node FROM e0 UNION ALL SELECT b AS node FROM e0)
      GROUP BY node
    ),
    s1 AS (SELECT node FROM d0 WHERE d >= {_KCORE_K}),
    e1 AS (
      SELECT e0.a, e0.b FROM e0
      JOIN s1 x ON x.node = e0.a JOIN s1 y ON y.node = e0.b
    ),
    d1 AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT a AS node FROM e1 UNION ALL SELECT b AS node FROM e1)
      GROUP BY node
    ),
    s2 AS (SELECT node FROM d1 WHERE d >= {_KCORE_K}),
    e2 AS (
      SELECT e1.a, e1.b FROM e1
      JOIN s2 x ON x.node = e1.a JOIN s2 y ON y.node = e1.b
    )
    SELECT 0 AS round, (SELECT CAST(count(*) AS BIGINT) FROM d0) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e0) AS n_edges
    UNION ALL
    SELECT 1, (SELECT CAST(count(*) AS BIGINT) FROM s1),
           (SELECT CAST(count(*) AS BIGINT) FROM e1)
    UNION ALL
    SELECT 2, (SELECT CAST(count(*) AS BIGINT) FROM s2),
           (SELECT CAST(count(*) AS BIGINT) FROM e2)
    """,
    tags=("graph", "iterative", "scale"),
)
def g_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (k=100) on the part co-purchase graph, 2 fixed
    peel rounds: drop every node with degree < k, recompute degrees on
    the induced subgraph, repeat — each round removes nodes whose
    degree only LOOKED sufficient because of since-peeled neighbors
    (the cascade is the whole point; a single degree filter is not a
    core).  Fixed-round form keeps the oracle expressible as layered
    CTEs (g_pagerank convention) and is how production jobs bound
    iteration cost; convergence is detectable by n_nodes reaching a
    fixpoint between rounds.

    Scale: per round one degree aggregation (map-side combined) and
    two semi-joins of edges against survivors — all keyed on node
    ids; edges localCheckpoint between rounds so the plan never
    re-derives round i-1 (components.py convention).  At 100 TB:
    persist per-round edges; rounds are O(E) each and typically <= 20
    even for billion-node graphs.
    """
    t = Tables(spark, sf_dir)
    li = (
        t.lineitem.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    edges = (
        li.alias("x")
        .join(li.alias("y"), (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")))
        .select(F.col("x.p").alias("a"), F.col("y.p").alias("b"))
        .distinct()
        .localCheckpoint()
    )

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        )

    rows = []
    deg = degrees(edges)
    rows.append((0, deg, edges))
    for rnd in range(1, _KCORE_ROUNDS + 1):
        survivors = deg.where(F.col("d") >= _KCORE_K).select("node")
        edges = (
            edges.join(
                survivors.select(F.col("node").alias("a")), "a", "left_semi"
            )
            .join(survivors.select(F.col("node").alias("b")), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint()
        )
        deg = degrees(edges)
        rows.append((rnd, survivors, edges))

    out = None
    for rnd, nodes, e in rows:
        stat = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes")).crossJoin(
            e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        ).select(F.lit(rnd).cast("int").alias("round"), "n_nodes", "n_edges")
        out = stat if out is None else out.unionByName(stat)
    return out


# --------------------------------------------------------------------------
# Exact z-score outlier gate (decimal-exact, no sqrt)
# --------------------------------------------------------------------------

@query(
    "x_zscore_outliers",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS DECIMAL(38, 0)) AS s1,
             CAST(sum(cents * cents) AS DECIMAL(38, 0)) AS s2
      FROM c GROUP BY event_type
    )
    SELECT c.event_type, max(s.n) AS n,
           CAST(sum(CASE WHEN
                 (CAST(c.cents AS DECIMAL(38,0)) * s.n - s.s1)
               * (CAST(c.cents AS DECIMAL(38,0)) * s.n - s.s1)
               > 9 * s.n * (s.n * s.s2 - s.s1 * s.s1) / s.n
               THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(coalesce(min(CASE WHEN
                 (CAST(c.cents AS DECIMAL(38,0)) * s.n - s.s1)
               * (CAST(c.cents AS DECIMAL(38,0)) * s.n - s.s1)
               > 9 * s.n * (s.n * s.s2 - s.s1 * s.s1) / s.n
               THEN c.cents END), -1) AS BIGINT) AS min_out_cents,
           CAST(coalesce(max(CASE WHEN
                 (CAST(c.cents AS DECIMAL(38,0)) * s.n - s.s1)
               * (CAST(c.cents AS DECIMAL(38,0)) * s.n - s.s1)
               > 9 * s.n * (s.n * s.s2 - s.s1 * s.s1) / s.n
               THEN c.cents END), -1) AS BIGINT) AS max_out_cents
    FROM c JOIN s USING (event_type)
    GROUP BY c.event_type
    """,
    tags=("analytics", "outliers", "scale"),
)
def x_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group 3-sigma outlier gate computed EXACTLY — no sqrt, no
    float variance: |z| > 3 is equivalent to the cross-multiplied
    integer inequality (x*n - sum)^2 > 9*(n*sumsq - sum^2), so the
    outlier decision is bit-identical on any executor count (a float
    mean/std pipeline can flip boundary rows between runs when the
    reduction order changes).  Products are carried in DECIMAL(38,0):
    cents*n is ~1e9 here and its square ~1e18 — already at the int64
    edge at sf0.1, so the decimal widening is the overflow rail, not
    pedantry.

    Scale: two passes over the group — one map-side-combined moment
    aggregation (n, sum, sumsq per key), one re-scan with the
    broadcast moments to gate each row.  Never a self-join; never a
    sort.  The same cross-multiplication trick generalizes to any
    rational threshold test (see g_exact_median, x_basket_lift).
    """
    ev = Tables(spark, sf_dir).events.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    mom = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).cast("decimal(38,0)").alias("s2"),
    )
    dev = "(cast(cents as decimal(38,0)) * n - s1)"
    is_out = F.expr(
        f"{dev} * {dev} > 9 * n * (n * s2 - s1 * s1) / n"
    )
    return (
        ev.join(F.broadcast(mom), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
            F.coalesce(F.min(F.when(is_out, F.col("cents"))), F.lit(-1))
            .cast("bigint")
            .alias("min_out_cents"),
            F.coalesce(F.max(F.when(is_out, F.col("cents"))), F.lit(-1))
            .cast("bigint")
            .alias("max_out_cents"),
        )
    )


# --------------------------------------------------------------------------
# Sequential pattern mining: top event-type trigrams
# --------------------------------------------------------------------------

@query(
    "t_event_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS trigram,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, trigram
    LIMIT 10
    """,
    tags=("analytics", "sequence-mining", "pipeline"),
)
def t_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining, the n=3 case: the most frequent
    behavioral trigrams (ordered event-type triples per user) across
    the corpus — the first question any funnel/recommendation analysis
    asks of an event log.  Ordering inside a user is (ts, event_id) so
    simultaneous events have a deterministic tiebreak and both engines
    see identical sequences.

    Scale: one user-keyed window shuffle builds the trigrams (lead x2
    — state is 2 rows regardless of history length), then a
    map-side-combined count and a TakeOrdered top-10; the trigram
    alphabet is tiny (|types|^3) so the final agg is bounded.  For
    n-grams over 10^9-event users the window partitioning is the same
    — per-user state stays O(n) of the gram, never of the history.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = Tables(spark, sf_dir).events.select("user_id", "event_type", "ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("trigram")
        )
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("trigram"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Table-version diff (snapshot reconciliation)
# --------------------------------------------------------------------------

@query(
    "x_table_diff",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey AS k,
             md5(o_orderstatus || ':' ||
                 CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR))
               AS h
      FROM orders
    ),
    v2 AS (
      SELECT o_orderkey AS k,
             md5(CASE WHEN o_orderkey % 13 = 0 THEN 'X'
                      ELSE o_orderstatus END || ':' ||
                 CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR))
               AS h
      FROM orders WHERE o_orderkey % 97 <> 0
    )
    SELECT CAST(sum(CASE WHEN v1.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_added,
           CAST(sum(CASE WHEN v2.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(sum(CASE WHEN v1.k IS NOT NULL AND v2.k IS NOT NULL
                          AND v1.h <> v2.h THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(sum(CASE WHEN v1.h = v2.h THEN 1 ELSE 0 END) AS BIGINT)
             AS n_same
    FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
    """,
    tags=("data-ops", "reconciliation", "scale"),
)
def x_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation — the diff between two versions of a
    keyed table (v2 simulates the next day's snapshot: keys divisible
    by 97 deleted, statuses of keys divisible by 13 rewritten),
    classified into added / removed / changed / same via ONE full
    outer join on the key comparing md5 row digests.  The digest
    hashes integer cents, not raw doubles — float-to-string rendering
    differs between engines and would poison the hash (CLAUDE.md
    parity rule).

    Scale: this is how you audit a CDC feed or a migrated table at
    100 TB — one co-partitioned full outer join (both sides key-hash
    to the same partitioning) and a 4-counter aggregate; the digest
    collapses arbitrary row width to 32 bytes BEFORE the shuffle, so
    wide tables diff at key-column cost.
    """
    t = Tables(spark, sf_dir)
    base = t.orders.select(
        F.col("o_orderkey").alias("k"),
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    v1 = base.select(
        "k",
        F.md5(
            F.concat_ws(":", "o_orderstatus", F.col("cents").cast("string")).cast(
                "binary"
            )
        ).alias("h"),
    )
    v2 = (
        base.where(F.col("k") % 97 != 0)
        .select(
            "k",
            F.md5(
                F.concat_ws(
                    ":",
                    F.when(F.col("k") % 13 == 0, F.lit("X")).otherwise(
                        F.col("o_orderstatus")
                    ),
                    F.col("cents").cast("string"),
                ).cast("binary")
            ).alias("h"),
        )
    )
    j = v1.alias("a").join(v2.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
    return j.agg(
        F.sum(F.when(F.col("a.k").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_added"),
        F.sum(F.when(F.col("b.k").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
        F.sum(
            F.when(
                F.col("a.k").isNotNull()
                & F.col("b.k").isNotNull()
                & (F.col("a.h") != F.col("b.h")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_changed"),
        F.sum(F.when(F.col("a.h") == F.col("b.h"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_same"),
    )


# --------------------------------------------------------------------------
# Duplicate-cluster size histogram (dedup reporting)
# --------------------------------------------------------------------------

@query(
    "d_dup_size_histogram",
    oracle="""
    WITH fp AS (
      SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS sz
      FROM documents GROUP BY md5(text)
    )
    SELECT sz AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs,
           CAST(sz * count(*) - count(*) AS BIGINT) AS n_removable
    FROM fp GROUP BY sz
    """,
    tags=("dedup", "reporting", "pipeline"),
)
def d_dup_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup impact report: histogram of exact-duplicate cluster sizes
    (md5 text fingerprint), with ``n_removable`` = docs the dedup pass
    would delete per size class — the number a data curator actually
    asks for before committing a dedup run ("how much of the corpus is
    copies, and in how big clusters?").

    Scale: two map-side-combined aggregations (fingerprint -> size,
    size -> class counts); the second input is one row per distinct
    document, the histogram is O(max cluster size) rows.  The same
    two-level rollup shape reports MinHash cluster sizes by feeding
    it d_dup_clusters output instead.
    """
    docs = Tables(spark, sf_dir).documents
    fp = docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    return fp.groupBy("sz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.col("sz") * F.count(F.lit(1))).cast("bigint").alias("n_docs"),
        (F.col("sz") * F.count(F.lit(1)) - F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_removable"),
    ).select(
        F.col("sz").alias("cluster_size"), "n_clusters", "n_docs", "n_removable"
    )


# --------------------------------------------------------------------------
# Integer random projection (signed Johnson-Lindenstrauss sketch)
# --------------------------------------------------------------------------

def _rp_signs(k: int, dim: int = 64) -> list[int]:
    """Deterministic +-1 projection vector k: sign i is the top bit of
    md5("rp{k}:{i}") — reproducible in any engine/language, so the
    SAME constants are embedded in the Spark plan and the oracle."""
    import hashlib

    return [
        1 if int(hashlib.md5(f"rp{k}:{i}".encode()).hexdigest()[0], 16) >= 8 else -1
        for i in range(dim)
    ]


def _rp_duck_term(k: int) -> str:
    terms = []
    for i, s in enumerate(_rp_signs(k)):
        sign = "+" if s > 0 else "-"
        terms.append(
            f"{sign} CAST(round(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000)"
            " AS BIGINT)"
        )
    return " ".join(terms)


@query(
    "v_random_projection",
    oracle=f"""
    SELECT vec_id,
           CAST({_rp_duck_term(0)} AS BIGINT) AS p0,
           CAST({_rp_duck_term(1)} AS BIGINT) AS p1,
           CAST({_rp_duck_term(2)} AS BIGINT) AS p2,
           CAST({_rp_duck_term(3)} AS BIGINT) AS p3
    FROM embeddings WHERE vec_id < 50
    """,
    tags=("similarity", "projection", "pipeline"),
)
def v_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed random projection (the +-1 Johnson-Lindenstrauss /
    Achlioptas construction): 64-dim embeddings project to 4
    coordinates via md5-derived +-1 vectors, computed EXACTLY on
    integer-scaled components (zip_with multiply + aggregate sum — the
    int_dot convention, similarity.py:33) so both engines produce
    identical bigints.  This is the primitive under the hyperplane LSH
    the ANN queries already use; exposed standalone because dimension
    reduction before a downstream index is its own pipeline stage
    (project once, store 4 ints instead of 64 floats — a 64x index
    shrink whose distance distortion is the JL bound).

    Scale: pure map — one row-local HOF chain per projection, no
    shuffle at all; the projection constants live in the plan
    (closure), not in a join.
    """
    from map2db_spark.functions.similarity import int_vec

    emb = Tables(spark, sf_dir).embeddings.where(F.col("vec_id") < 50)
    v = int_vec(F.col("embedding"))
    cols = [F.col("vec_id")]
    for k in range(4):
        signs = F.array(*[F.lit(s).cast("long") for s in _rp_signs(k)])
        proj = F.aggregate(
            F.zip_with(v, signs, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        cols.append(proj.cast("bigint").alias(f"p{k}"))
    return emb.select(*cols)


# --------------------------------------------------------------------------
# Data-quality expectations suite (dbt-test style, one result row per check)
# --------------------------------------------------------------------------

@query(
    "x_dq_expectations",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST(count(*) AS BIGINT) AS n_checked,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations,
           CAST(count(*) = count(DISTINCT o_orderkey) AS BOOLEAN) AS pass
    FROM orders
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
                AS BOOLEAN)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'events_value_range',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN value < 0 OR value > 1000 THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(sum(CASE WHEN value < 0 OR value > 1000 THEN 1 ELSE 0 END) = 0
                AS BOOLEAN)
    FROM events
    UNION ALL
    SELECT 'customer_key_not_null',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) = 0
                AS BOOLEAN)
    FROM customer
    """,
    tags=("data-ops", "quality", "pipeline"),
)
def x_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations suite (the dbt-test / Great-
    Expectations shape): primary-key uniqueness, referential
    integrity, value-range, and not-null checks, each emitted as a
    result ROW (check_name, n_checked, n_violations, pass) rather than
    a mid-run exception — the same violations-are-data philosophy as
    the MapsForge pipeline (COVERAGE.md divergence table): on a
    distributed run you want the full audit report, not the first
    stack trace.

    Scale: uniqueness is count vs countDistinct in one
    map-side-combined pass; referential integrity is ONE left join
    keyed on the fk (at 100 TB: the dimension side broadcast if it
    fits, else co-partitioned); range/null checks are pure map
    aggregates.  Each check scans its table once, no check scans
    twice.
    """
    t = Tables(spark, sf_dir)
    orders_chk = t.orders.agg(
        F.lit("orders_pk_unique").alias("check_name"),
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("n_violations"),
        (F.count(F.lit(1)) == F.countDistinct("o_orderkey")).alias("pass"),
    )
    fk = (
        t.lineitem.select("l_orderkey")
        .join(
            t.orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.lit("lineitem_fk_orders").alias("check_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_violations"),
            (
                F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)) == 0
            ).alias("pass"),
        )
    )
    rng = t.events.agg(
        F.lit("events_value_range").alias("check_name"),
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        F.sum(F.when((F.col("value") < 0) | (F.col("value") > 1000), 1).otherwise(0))
        .cast("bigint")
        .alias("n_violations"),
        (
            F.sum(
                F.when((F.col("value") < 0) | (F.col("value") > 1000), 1).otherwise(0)
            )
            == 0
        ).alias("pass"),
    )
    nn = t.customer.agg(
        F.lit("customer_key_not_null").alias("check_name"),
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_violations"),
        (F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)) == 0).alias(
            "pass"
        ),
    )
    return orders_chk.unionByName(fk).unionByName(rng).unionByName(nn)


# --------------------------------------------------------------------------
# Exact group-wise linear regression (rational slope, no floats)
# --------------------------------------------------------------------------

@query(
    "x_group_linreg",
    oracle="""
    WITH base AS (
      SELECT event_type,
             CAST(date_diff('second',
                            (SELECT min(ts) FROM events), ts) AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DECIMAL(38, 0)) AS sx,
             CAST(sum(y) AS DECIMAL(38, 0)) AS sy,
             CAST(sum(x * y) AS DECIMAL(38, 0)) AS sxy,
             CAST(sum(x * x) AS DECIMAL(38, 0)) AS sxx
      FROM base GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(CAST(n * sxy - sx * sy AS DECIMAL(38, 0)) AS VARCHAR)
             AS slope_num,
           CAST(CAST(n * sxx - sx * sx AS DECIMAL(38, 0)) AS VARCHAR)
             AS slope_den,
           -- degenerate-input audit (r14): a single-observation (or
           -- single-timestamp) group has zero x-variance — the slope
           -- is undefined, NULL on BOTH engines
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(CAST((n * sxy - sx * sy) * 1000000000 AS HUGEINT)
                          // CAST(n * sxx - sx * sx AS HUGEINT)
                          AS BIGINT) END AS slope_nanos,
           CAST(CAST(sy * 1000000 AS HUGEINT) // CAST(n AS HUGEINT) AS BIGINT)
             AS mean_cents_e6
    FROM s
    """,
    tags=("analytics", "regression", "scale"),
)
def x_group_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend (value over time)
    computed as an EXACT RATIONAL: slope = (n*Sxy - Sx*Sy) /
    (n*Sxx - Sx^2), numerator and denominator computed as DECIMAL(38,0)
    and EMITTED AS VARCHAR (the x_decimal_ledger convention: DuckDB's
    pandas path coerces wide decimals to float64, corrupting values
    above 2^53 — slope_den is ~2.3e18 — so exact rationals cross the
    engine boundary as canonical digit strings), plus a fixed-point
    quotient (nanocents/second) — no float covariance pipeline, so the
    fitted trend is bit-identical across any shuffle order and the
    oracle hash-matches without tolerance.
    x is seconds since the corpus min timestamp: re-basing keeps
    n*Sxx ~ 1e21 at sf0.1 (vs ~1e29 on raw epoch seconds), well
    inside DECIMAL(38) even at petabyte row counts — the docstring
    math IS the overflow audit (x_zscore_outliers convention).

    Scale: one map-side-combined moment aggregation per group (five
    sums), O(groups) output — regression over a trillion rows costs
    exactly one shuffle of 5-number partials.  The global min(ts) is
    an O(1) broadcast scalar.
    """
    ev = Tables(spark, sf_dir).events
    t0 = ev.agg(F.min("ts").alias("t0"))
    base = ev.crossJoin(F.broadcast(t0)).select(
        "event_type",
        (F.unix_timestamp("ts") - F.unix_timestamp("t0")).cast("bigint").alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    s = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
    )
    return s.select(
        "event_type",
        "n",
        F.expr("cast(cast(n * sxy - sx * sy as decimal(38,0)) as string)")
        .alias("slope_num"),
        F.expr("cast(cast(n * sxx - sx * sx as decimal(38,0)) as string)")
        .alias("slope_den"),
        F.expr(
            "case when n * sxx - sx * sx = 0 then null"
            " else cast((n * sxy - sx * sy) * 1000000000"
            " div (n * sxx - sx * sx) as bigint) end"
        ).alias("slope_nanos"),
        F.expr("cast(sy * 1000000 div n as bigint)").alias("mean_cents_e6"),
    )


# --------------------------------------------------------------------------
# Exact Gini coefficient per segment
# --------------------------------------------------------------------------

@query(
    "x_gini_concentration",
    oracle="""
    WITH c AS (
      SELECT c_mktsegment AS segment,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    ranked AS (
      SELECT segment, cents,
             row_number() OVER (PARTITION BY segment
                                ORDER BY cents, cents) AS rk,
             count(*) OVER (PARTITION BY segment) AS n
      FROM c
    )
    SELECT segment, CAST(max(n) AS BIGINT) AS n,
           CAST(CAST(2 * sum(CAST(rk AS DECIMAL(38,0)) * cents)
                - (max(n) + 1) * sum(CAST(cents AS DECIMAL(38,0)))
                AS DECIMAL(38,0)) AS VARCHAR) AS gini_num,
           CAST(CAST(CAST(max(n) AS DECIMAL(38,0)) * sum(CAST(cents AS DECIMAL(38,0)))
                AS DECIMAL(38,0)) AS VARCHAR) AS gini_den,
           CAST(CAST((2 * sum(CAST(rk AS DECIMAL(38,0)) * cents)
                      - (max(n) + 1) * sum(CAST(cents AS DECIMAL(38,0))))
                     * 1000000 AS HUGEINT)
                // CAST(CAST(max(n) AS DECIMAL(38,0))
                        * sum(CAST(cents AS DECIMAL(38,0))) AS HUGEINT)
                AS BIGINT) AS gini_ppm
    FROM ranked GROUP BY segment
    """,
    tags=("analytics", "concentration", "scale"),
)
def x_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini concentration of order value per market segment via
    the rank formula G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))
    over ascending-sorted cents — rational numerator/denominator
    computed in DECIMAL(38,0) and emitted as VARCHAR (x_decimal_ledger
    convention; see x_group_linreg for why wide decimals cannot cross
    the DuckDB pandas boundary raw) plus an exact ppm quotient
    (HUGEINT-matched integral division, see x_group_linreg).  Rank ties need no tiebreak column
    for cross-engine equality: a block of equal values x spanning
    consecutive ranks contributes x * (sum of those ranks) to
    sum(i*x_i) regardless of which tied row receives which rank.

    Scale: one segment-keyed window shuffle (rank + count ride the
    same Exchange) and one map-side-combined aggregate.  sum(rk*cents)
    is ~1e16 at sf0.1 and grows with n^2*x — DECIMAL(38) holds to
    ~1e10 rows/segment; beyond that, switch to the binned Lorenz
    approximation (the docstring IS the overflow audit).
    """
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    c = (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )
    wr = Window.partitionBy("segment").orderBy("cents")
    wn = Window.partitionBy("segment")
    ranked = c.withColumn("rk", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    g = ranked.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.expr("cast(rk as decimal(38,0)) * cents")).alias("srx"),
        F.sum(F.expr("cast(cents as decimal(38,0))")).alias("sx"),
    )
    return g.select(
        "segment",
        "n",
        F.expr(
            "cast(cast(2 * srx - (n + 1) * sx as decimal(38,0)) as string)"
        ).alias("gini_num"),
        F.expr(
            "cast(cast(cast(n as decimal(38,0)) * sx as decimal(38,0)) as string)"
        ).alias("gini_den"),
        F.expr(
            "cast((2 * srx - (n + 1) * sx) * 1000000"
            " div (cast(n as decimal(38,0)) * sx) as bigint)"
        ).alias("gini_ppm"),
    )


# --------------------------------------------------------------------------
# Per-group mode with deterministic tie-break
# --------------------------------------------------------------------------

@query(
    "g_mode_per_group",
    oracle="""
    WITH f AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY nation
                                   ORDER BY n DESC, segment) AS rk
      FROM f
    )
    SELECT nation, segment AS mode_segment, n AS mode_n
    FROM ranked WHERE rk = 1
    """,
    tags=("aggregate", "analytics"),
)
def g_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent market segment per nation) with a
    DETERMINISTIC tie-break (count desc, then value asc) — the detail
    that separates a reproducible pipeline from a flaky one: Spark's
    built-in ``mode()`` aggregate is non-deterministic under ties, so
    re-running a job could silently flip labels downstream.  Two
    map-side-combined aggregations: (group, value) counts, then a
    top-1 window over the ~|values|-sized count table — the window
    input is already reduced, never the raw rows.

    Scale: both shuffles key on the group; the second operates on
    |groups| x |distinct values| rows regardless of input size.
    """
    from pyspark.sql.window import Window

    cust = Tables(spark, sf_dir).customer
    f = cust.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("nation").orderBy(F.desc("n"), F.asc("segment"))
    return (
        f.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("nation", F.col("segment").alias("mode_segment"), F.col("n").alias("mode_n"))
    )


# --------------------------------------------------------------------------
# Per-domain capped sampling (boilerplate-domain rail)
# --------------------------------------------------------------------------

@query(
    "c_domain_cap",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk,
             count(*) OVER (PARTITION BY source) AS n_total
      FROM documents
    )
    SELECT source,
           CAST(max(n_total) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN rk <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(max(n_total) - sum(CASE WHEN rk <= 15 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped
    FROM ranked GROUP BY source
    """,
    tags=("curation", "sampling", "scale"),
)
def c_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (keep <= 15 per source) — the standard
    crawl-curation rail against boilerplate-heavy domains: without it,
    one template-spam host contributes millions of near-identical
    pages and dominates the training mixture.  Selection is a
    DETERMINISTIC md5 rank (salted hash of doc_id, tiebreak doc_id),
    so the kept set is identical across reruns, engines, and cluster
    sizes — Spark's sample() is partition-layout dependent and would
    not be (the reason every sampling op in this engine draws from
    md5, CLAUDE.md rule).

    Scale: one source-keyed window shuffle.  For pathological single
    domains holding 10^8+ docs, pre-aggregate a per-partition top-cap
    first (the s_global_topk two-level pattern) so no task sorts more
    than its own slice.
    """
    from pyspark.sql.window import Window

    docs = Tables(spark, sf_dir).documents
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")).cast("binary")),
        F.asc("doc_id"),
    )
    wn = Window.partitionBy("source")
    ranked = docs.select("source", "doc_id").withColumn(
        "rk", F.row_number().over(w)
    ).withColumn("n_total", F.count(F.lit(1)).over(wn))
    return ranked.groupBy("source").agg(
        F.max("n_total").cast("bigint").alias("n_total"),
        F.sum(F.when(F.col("rk") <= 15, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        (
            F.max("n_total")
            - F.sum(F.when(F.col("rk") <= 15, 1).otherwise(0))
        )
        .cast("bigint")
        .alias("n_dropped"),
    )


# --------------------------------------------------------------------------
# Exact per-group quartiles (integer order statistics, generalized median)
# --------------------------------------------------------------------------

def _q_pick_sql(num: int, den: int) -> str:
    """Indicator pair selecting the one-or-two order statistics that
    straddle quantile num/den (median-style rule generalized):
    lo = ceil(num*n/den), hi = floor(num*n/den) + 1.  When n*num is
    divisible by den the two ranks differ (average of neighbors);
    otherwise they coincide and the indicator counts that row twice —
    either way the sum is exactly 2x the quantile."""
    lo = f"({num} * n + {den} - 1) // {den}"
    hi = f"{num} * n // {den} + 1"
    return (
        f"(CASE WHEN rn = {lo} THEN 1 ELSE 0 END"
        f" + CASE WHEN rn = {hi} THEN 1 ELSE 0 END)"
    )


@query(
    "g_exact_quartiles",
    oracle=f"""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    ranked AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM c
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           CAST(sum(cents * {_q_pick_sql(1, 4)}) AS BIGINT) AS q1_x2,
           CAST(sum(cents * {_q_pick_sql(2, 4)}) AS BIGINT) AS q2_x2,
           CAST(sum(cents * {_q_pick_sql(3, 4)}) AS BIGINT) AS q3_x2,
           CAST(sum(cents * {_q_pick_sql(3, 4)})
                - sum(cents * {_q_pick_sql(1, 4)}) AS BIGINT) AS iqr_x2
    FROM ranked
    GROUP BY event_type
    """,
    tags=("aggregate", "quantile", "analytics"),
)
def g_exact_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quartiles + IQR, generalizing g_exact_median's
    order-statistic reconstruction to p25/p50/p75: each quartile is
    the sum of its one-or-two straddling order statistics (doubled
    when they coincide), kept as the exact integer 2x value — no
    interpolation convention ambiguity, no float percentile, and the
    IQR (the robust spread measure behind every outlier fence) comes
    out exact by subtraction.  Contrast x_approx_quantiles: that
    checks the SKETCH within bounds; this is the exact answer the
    sketch approximates.

    Scale: identical to g_exact_median — rank and count ride ONE
    group-keyed window Exchange, then a map-side-combined aggregate;
    all three quartiles come from the same pass (the indicator sums
    just select different ranks).
    """
    from pyspark.sql.window import Window

    ev = Tables(spark, sf_dir).events.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("cents")
    wn = Window.partitionBy("event_type")
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )

    def pick(num: int, den: int):
        lo = F.expr(f"({num} * n + {den} - 1) div {den}")
        hi = F.expr(f"{num} * n div {den} + 1")
        return (
            F.when(F.col("rn") == lo, 1).otherwise(0)
            + F.when(F.col("rn") == hi, 1).otherwise(0)
        )

    q1 = F.sum(F.col("cents") * pick(1, 4)).cast("bigint")
    q2 = F.sum(F.col("cents") * pick(2, 4)).cast("bigint")
    q3 = F.sum(F.col("cents") * pick(3, 4)).cast("bigint")
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        q1.alias("q1_x2"),
        q2.alias("q2_x2"),
        q3.alias("q3_x2"),
        (q3 - q1).alias("iqr_x2"),
    )


# --------------------------------------------------------------------------
# Time-weighted average (TWAP, exact integral)
# --------------------------------------------------------------------------

@query(
    "w_twap_per_user",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    seg AS (
      SELECT user_id,
             CAST(date_diff('second', ts, nxt) AS BIGINT) AS dt_s,
             cents
      FROM seq WHERE nxt IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) + 1 AS BIGINT) AS n_events,
           CAST(sum(dt_s) AS BIGINT) AS span_s,
           CAST(sum(dt_s * cents) AS BIGINT) AS twap_num,
           CAST(CAST(sum(dt_s * cents) * 1000000 AS HUGEINT)
                // CAST(sum(dt_s) AS HUGEINT) AS BIGINT) AS twap_micros
    FROM seg
    GROUP BY user_id
    HAVING sum(dt_s) > 0
    """,
    tags=("window", "timeseries", "analytics"),
)
def w_twap_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP — the telemetry/
    finance staple that plain AVG gets wrong when observations are
    irregularly spaced: a value held for an hour must weigh 3600x one
    held for a second).  Each observation is held until the next
    (step-function integral): twap = sum(dt_i * v_i) / sum(dt_i),
    carried as exact integer second-cents with a fixed-point micros
    quotient (HUGEINT-matched division, x_group_linreg convention).
    Ordering ties break on event_id so simultaneous events integrate
    identically in both engines.

    Scale: one user-keyed window Exchange (lead has 1-row state) and
    a map-side-combined aggregate on the same key — AQE coalesces to
    a single shuffle.  Unbounded history per user costs O(1) memory.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = Tables(spark, sf_dir).events.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    seg = (
        ev.withColumn("nxt", F.lead("ts").over(w))
        .where(F.col("nxt").isNotNull())
        .select(
            "user_id",
            (F.unix_timestamp("nxt") - F.unix_timestamp("ts"))
            .cast("bigint")
            .alias("dt_s"),
            "cents",
        )
    )
    return (
        seg.groupBy("user_id")
        .agg(
            (F.count(F.lit(1)) + 1).cast("bigint").alias("n_events"),
            F.sum("dt_s").cast("bigint").alias("span_s"),
            F.sum(F.col("dt_s") * F.col("cents")).cast("bigint").alias("twap_num"),
            F.expr("cast(sum(dt_s * cents) * 1000000 div sum(dt_s) as bigint)").alias(
                "twap_micros"
            ),
        )
        .where(F.col("span_s") > 0)
    )


# --------------------------------------------------------------------------
# Stratified k-fold assignment (cross-validation splits)
# --------------------------------------------------------------------------

@query(
    "c_kfold_assign",
    oracle="""
    WITH ranked AS (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('fold:' || CAST(doc_id AS VARCHAR)), doc_id
             ) - 1 AS rk,
             count(*) OVER (PARTITION BY lang) AS n_stratum
      FROM documents
    )
    SELECT lang, CAST(rk % 5 AS BIGINT) AS fold,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(n_stratum) AS BIGINT) AS n_stratum,
           CAST(count(*) - (max(n_stratum) // 5) <= 1 AS BOOLEAN)
             AS balanced
    FROM ranked
    GROUP BY lang, rk % 5
    """,
    tags=("curation", "ml-ops", "pipeline"),
)
def c_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified k-fold assignment (k=5) for cross-validation:
    within each language stratum, documents are md5-rank-numbered and
    folds are rank mod k — EXACTLY balanced (fold sizes differ by at
    most 1 within every stratum, asserted by the ``balanced`` column)
    and fully deterministic, where the naive hash(doc_id) % k is only
    balanced in expectation and can leave a small stratum's folds
    skewed 2:1.  The md5 rank also makes folds stable under corpus
    append-with-new-ids: existing docs keep their relative order.

    Scale: one stratum-keyed window Exchange; the mod-k bucketing and
    balance audit ride the same partitioning.  For strata too large
    for one task's sort, the two-pass partition-offset rank
    (operators/ids.py:25) drops in with identical output.
    """
    from pyspark.sql.window import Window

    docs = Tables(spark, sf_dir).documents
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("fold:"), F.col("doc_id").cast("string")).cast("binary")),
        F.asc("doc_id"),
    )
    wn = Window.partitionBy("lang")
    ranked = docs.select("lang", "doc_id").withColumn(
        "rk", F.row_number().over(w) - 1
    ).withColumn("n_stratum", F.count(F.lit(1)).over(wn))
    return ranked.groupBy("lang", (F.col("rk") % 5).cast("bigint").alias("fold")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("n_stratum").cast("bigint").alias("n_stratum"),
        (
            F.count(F.lit(1)) - F.expr("max(n_stratum) div 5") <= 1
        ).alias("balanced"),
    )


# --------------------------------------------------------------------------
# Fixed-depth BFS layers (frontier expansion with visited pruning)
# --------------------------------------------------------------------------

@query(
    "g_bfs_layers",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (
      SELECT DISTINCT a.p AS a, b.p AS b
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
    ),
    adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u),
    seed AS (SELECT node FROM deg ORDER BY d DESC, node LIMIT 1),
    l0 AS (SELECT node FROM seed),
    l1 AS (
      SELECT DISTINCT adj.v AS node FROM adj JOIN l0 ON adj.u = l0.node
      WHERE adj.v NOT IN (SELECT node FROM l0)
    ),
    l2 AS (
      SELECT DISTINCT adj.v AS node FROM adj JOIN l1 ON adj.u = l1.node
      WHERE adj.v NOT IN (SELECT node FROM l0)
        AND adj.v NOT IN (SELECT node FROM l1)
    ),
    l3 AS (
      SELECT DISTINCT adj.v AS node FROM adj JOIN l2 ON adj.u = l2.node
      WHERE adj.v NOT IN (SELECT node FROM l0)
        AND adj.v NOT IN (SELECT node FROM l1)
        AND adj.v NOT IN (SELECT node FROM l2)
    )
    SELECT 0 AS layer, (SELECT CAST(count(*) AS BIGINT) FROM l0) AS n_nodes
    UNION ALL SELECT 1, (SELECT CAST(count(*) AS BIGINT) FROM l1)
    UNION ALL SELECT 2, (SELECT CAST(count(*) AS BIGINT) FROM l2)
    UNION ALL SELECT 3, (SELECT CAST(count(*) AS BIGINT) FROM l3)
    """,
    tags=("graph", "iterative", "scale"),
)
def g_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-depth BFS from the highest-degree part (3 hops): per-hop
    frontier = neighbors of the previous frontier MINUS everything
    already visited — the visited-set anti-join is what distinguishes
    BFS from the static per-iteration shape of PageRank (state GROWS
    across iterations) and is the core of every distributed reachability
    / shortest-path job.  Deterministic seed: max (degree, node id).

    Scale: per hop one neighbor join keyed on the frontier node +
    one anti-join against the visited set; frontier and visited are
    localCheckpointed per hop so hop i's plan never re-derives hop
    i-1 (components.py convention).  Visited grows monotonically —
    at 10^9 nodes switch the anti-join to a broadcast Bloom/In-set
    probe per hop (x_bloom_semi_join pattern).
    """
    t = Tables(spark, sf_dir)
    li = (
        t.lineitem.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e = (
        li.alias("x")
        .join(li.alias("y"), (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")))
        .select(F.col("x.p").alias("a"), F.col("y.p").alias("b"))
        .distinct()
    )
    adj = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint()
    )
    deg = adj.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    seed = deg.orderBy(F.desc("d"), F.asc("node")).limit(1).select("node")

    frontier = seed.localCheckpoint()
    visited = frontier
    out = frontier.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes")).select(
        F.lit(0).cast("int").alias("layer"), "n_nodes"
    )
    for hop in range(1, 4):
        nxt = (
            adj.join(frontier.select(F.col("node").alias("u")), "u", "left_semi")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint()
        )
        out = out.unionByName(
            nxt.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes")).select(
                F.lit(hop).cast("int").alias("layer"), "n_nodes"
            )
        )
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return out


# --------------------------------------------------------------------------
# CUSUM change-point detection (exact integer, argmax with tiebreak)
# --------------------------------------------------------------------------

@query(
    "w_cusum_changepoint",
    oracle="""
    WITH c AS (
      SELECT event_type, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    seq AS (
      SELECT event_type, cents,
             row_number() OVER w AS rn,
             sum(cents) OVER w AS prefix,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(cents) OVER (PARTITION BY event_type) AS total
      FROM c
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    dev AS (
      SELECT event_type, rn, n,
             abs(CAST(n AS DECIMAL(38,0)) * prefix
                 - CAST(rn AS DECIMAL(38,0)) * total) AS adev
      FROM seq
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY adev DESC, rn) AS pk
      FROM dev
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(rn AS BIGINT) AS change_idx,
           CAST(CAST(adev AS DECIMAL(38,0)) AS VARCHAR) AS peak_dev
    FROM ranked WHERE pk = 1
    """,
    tags=("analytics", "changepoint", "timeseries"),
)
def w_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per series, EXACT: the classic
    cumulative-deviation statistic cusum_i = prefix_i - (i/n)*total
    peaks at the index where the series' mean shifts — scaled through
    by n (adev = |n*prefix_i - i*total|, DECIMAL(38,0), peak emitted
    as VARCHAR per the x_decimal_ledger convention) so the argmax
    is over exact integers and no float accumulation can move the
    detected index.  The argmax itself is a rank window with an
    earliest-index tiebreak — the deterministic-argmax idiom
    (g_mode_per_group convention) rather than max_by, whose tie
    behavior is engine-defined.

    Scale: the running prefix, total, and the argmax rank all ride
    ONE series-keyed window Exchange.  n*prefix is ~2e13 at sf0.1 and
    ~1e9 rows/series needs the decimal widening already applied —
    the overflow audit convention (x_zscore_outliers).
    """
    from pyspark.sql.window import Window

    ev = Tables(spark, sf_dir).events.select(
        "event_type", "ts", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("event_type")
    seq = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("prefix", F.sum("cents").over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("total", F.sum("cents").over(wn))
        .select(
            "event_type",
            "rn",
            "n",
            F.abs(
                F.expr(
                    "cast(n as decimal(38,0)) * prefix"
                    " - cast(rn as decimal(38,0)) * total"
                )
            ).alias("adev"),
        )
    )
    pk = Window.partitionBy("event_type").orderBy(F.desc("adev"), F.asc("rn"))
    return (
        seq.withColumn("pk", F.row_number().over(pk))
        .where(F.col("pk") == 1)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("rn").cast("bigint").alias("change_idx"),
            F.col("adev").cast("decimal(38,0)").cast("string").alias("peak_dev"),
        )
    )


# --------------------------------------------------------------------------
# Quantile normalization across strata (exact rank mapping)
# --------------------------------------------------------------------------

@query(
    "c_quantile_normalize",
    oracle="""
    WITH pooled AS (
      SELECT n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS pr
      FROM documents
    ),
    big AS (SELECT CAST(count(*) AS BIGINT) AS big_n FROM documents),
    strat AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n_g
      FROM documents
    ),
    mapped AS (
      SELECT s.lang,
             p.n_chars AS norm_chars
      FROM strat s
      CROSS JOIN big
      JOIN pooled p
        ON p.pr = ((2 * s.rn - 1) * big.big_n) // (2 * s.n_g)
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(norm_chars) AS BIGINT) AS sum_norm,
           CAST(min(norm_chars) AS BIGINT) AS min_norm,
           CAST(max(norm_chars) AS BIGINT) AS max_norm
    FROM mapped GROUP BY lang
    """,
    tags=("curation", "normalization", "ml-ops"),
)
def c_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across strata — the preprocessing step
    that forces every language's document-length distribution onto
    the POOLED distribution (rank-to-rank mapping, the microarray /
    feature-normalization classic): each doc's within-stratum rank rn
    of n_g maps to pooled position ((2rn-1)*N) div (2*n_g) (exact
    integer midpoint — no float quantile), whose pooled value becomes
    the normalized value.  After normalization every stratum has
    byte-identical value distributions, which the per-lang min/max/sum
    audit exposes.

    Scale: the within-stratum rank is a keyed window; the POOLED rank
    — a global total order — deliberately avoids the single-reducer
    `row_number() OVER (ORDER BY ...)` and uses the two-pass
    range-partitioned rank (operators/ids.py:25) instead; the rank
    join keys on the pooled position.  The oracle uses the naive
    global window — same answer, different algorithm (DuckDB is
    single-node; the Spark side is the one that must scale).
    """
    from pyspark.sql.window import Window

    from map2db_spark.operators.ids import assign_sequential_ids

    docs = Tables(spark, sf_dir).documents.select("lang", "doc_id", "n_chars")
    pooled = assign_sequential_ids(
        docs.select("n_chars", "doc_id"), ["n_chars", "doc_id"], id_col="pr"
    ).select("pr", F.col("n_chars").alias("norm_chars"))
    big_n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("big_n"))
    ws = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("lang")
    strat = (
        docs.withColumn("rn", F.row_number().over(ws))
        .withColumn("n_g", F.count(F.lit(1)).over(wn))
        .crossJoin(F.broadcast(big_n))
        .withColumn("pr", F.expr("((2 * rn - 1) * big_n) div (2 * n_g)"))
    )
    mapped = strat.join(pooled, "pr")
    return mapped.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("norm_chars").cast("bigint").alias("sum_norm"),
        F.min("norm_chars").cast("bigint").alias("min_norm"),
        F.max("norm_chars").cast("bigint").alias("max_norm"),
    )


# --------------------------------------------------------------------------
# Blocked edit-distance join (SymSpell deletion neighborhoods, k=1)
# --------------------------------------------------------------------------

@query(
    "d_edit_blocked_join",
    oracle="""
    SELECT CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM part a JOIN part b ON a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 1
    GROUP BY 1
    """,
    tags=("fuzzy", "dedup", "scale"),
)
def d_edit_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance join at k<=1 over the FULL part table via
    SYMSPELL DELETION NEIGHBORHOODS — the scale path that
    r_fuzzy_levenshtein's docstring promises: every name generates
    its L+1 single-deletion variants (plus itself, a bounded <=13x
    row-local explode), and any pair within edit distance 1
    necessarily shares a variant (equal: the string itself;
    insert/delete: one's original is the other's deletion;
    substitute: deleting the differing position from each yields the
    same string) — so the variant equi-join is a LOSSLESS candidate
    generator and the exact levenshtein runs only on candidates.
    Sharing a variant does NOT imply ed<=1 (e.g. 'ab'/'ba'), hence
    the verify step.  The oracle brute-forces all pairs — two
    algorithms, one answer (d_prefix_filter_join convention).

    Scale: never all-pairs — candidate volume is sum over variants of
    collisions^2, bounded by name-template density, vs N^2/2 = 2M
    pairs brute force here and 10^18 at corpus scale.  One variant-
    keyed shuffle + one keyed verify join; the variant explode is
    map-side.
    """
    p = Tables(spark, sf_dir).part.select("p_partkey", "p_name")
    variants = p.select(
        F.col("p_partkey").alias("k"),
        F.col("p_name").alias("nm"),
        F.explode(
            F.expr(
                "transform(sequence(0, length(p_name)),"
                " i -> IF(i = 0, p_name,"
                " concat(substring(p_name, 1, i - 1),"
                " substring(p_name, i + 1, length(p_name)))))"
            )
        ).alias("v"),
    ).distinct()
    cand = (
        variants.alias("a")
        .join(variants.alias("b"), "v")
        .where(F.col("a.k") < F.col("b.k"))
        .select(
            F.col("a.k").alias("key_a"),
            F.col("a.nm").alias("name_a"),
            F.col("b.k").alias("key_b"),
            F.col("b.nm").alias("name_b"),
        )
        .distinct()
    )
    return (
        cand.select(F.levenshtein("name_a", "name_b").cast("bigint").alias("dist"))
        .where(F.col("dist") <= 1)
        .groupBy("dist")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# Positional inverted index + exact phrase search
# --------------------------------------------------------------------------

_PHRASE = ("table", "hash")


@query(
    "t_phrase_search",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    pos AS (
      SELECT doc_id, unnest(l) AS tok,
             unnest(range(1, len(l) + 1)) AS p
      FROM toks
    ),
    hits AS (
      SELECT a.doc_id
      FROM pos a JOIN pos b
        ON b.doc_id = a.doc_id AND b.p = a.p + 1
      WHERE a.tok = 'table' AND b.tok = 'hash'
    )
    SELECT 'table hash' AS phrase,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM hits
    """,
    tags=("text", "search", "pipeline"),
)
def t_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over a POSITIONAL inverted index — the IR
    primitive bag-of-words token stats can't answer (the tokens
    'table' and 'hash' co-occurring anywhere is not the phrase 'table
    hash' occurring): tokenize with positions, keep only the two
    phrase terms' postings, and adjacency is the equi-join
    b.pos = a.pos + 1 within a document.  Catalyst extracts
    (doc_id, pos+1) = (doc_id, pos) as hash keys, so the adjacency
    join is a keyed hash join, not a positional scan.

    Scale: the term filter cuts the postings to the phrase terms
    BEFORE the join (pushdown visible as the tok predicate), so join
    input is document frequency of the rarer term, not corpus token
    count — the standard phrase-query plan of a search engine,
    expressed relationally.
    """
    docs = Tables(spark, sf_dir).documents.repartition(spark.sparkContext.defaultParallelism)
    toks = docs.select(
        "doc_id",
        F.expr(
            "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
        ).alias("l"),
    )
    pos = toks.select(
        "doc_id", F.posexplode("l").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    a = pos.where(F.col("tok") == _PHRASE[0]).select("doc_id", F.col("p").alias("pa"))
    b = pos.where(F.col("tok") == _PHRASE[1]).select("doc_id", F.col("p").alias("pb"))
    hits = a.join(b, (a["doc_id"] == b["doc_id"]) & (F.col("pb") == F.col("pa") + 1)).select(
        a["doc_id"]
    )
    return hits.agg(
        F.lit(" ".join(_PHRASE)).alias("phrase"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.max("doc_id").cast("bigint").alias("max_doc"),
    )


# --------------------------------------------------------------------------
# Cogrouped Arrow kernel (applyInPandas over a cogroup)
# --------------------------------------------------------------------------

@query(
    "u_cogroup_merge",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS event_cents
      FROM events GROUP BY user_id
    ),
    o AS (
      SELECT o_custkey AS user_id, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS order_cents
      FROM orders WHERE o_custkey < 150 GROUP BY o_custkey
    )
    SELECT user_id,
           coalesce(e.n_events, 0) AS n_events,
           coalesce(e.event_cents, 0) AS event_cents,
           coalesce(o.n_orders, 0) AS n_orders,
           coalesce(o.order_cents, 0) AS order_cents
    FROM e FULL OUTER JOIN o USING (user_id)
    """,
    tags=("udf-surface", "cogroup", "api"),
)
def u_cogroup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped Arrow kernel — the
    ``groupBy().cogroup(other.groupBy()).applyInPandas`` API surface:
    both inputs shuffle ONCE on the shared key and arrive at the same
    task as two aligned pandas frames per key, the escape hatch for
    per-key logic that needs BOTH sides at once (custom as-of merges,
    per-key reconciliation, feature joins with in-kernel logic).
    The kernel here computes both sides' exact-cents totals in one
    pass; the oracle is the equivalent relational full outer join of
    two grouped aggregates — kernel and plan must agree exactly.

    Scale: one co-partitioned shuffle per side, Arrow-batched
    transfer, per-task memory bounded by the largest single key group
    (same rail as any applyInPandas; for skewed keys pre-aggregate
    inside mapInPandas first).
    """
    import pandas as pd

    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "user_id", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    od = t.orders.where(F.col("o_custkey") < 150).select(
        F.col("o_custkey").alias("user_id"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        (uid,) = key
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_events": [len(left)],
                "event_cents": [int(left["cents"].sum()) if len(left) else 0],
                "n_orders": [len(right)],
                "order_cents": [int(right["cents"].sum()) if len(right) else 0],
            }
        )

    return (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("user_id"))
        .applyInPandas(
            merge,
            schema="user_id long, n_events long, event_cents long,"
            " n_orders long, order_cents long",
        )
    )


# --------------------------------------------------------------------------
# mapInArrow kernel (RecordBatch-level Arrow surface)
# --------------------------------------------------------------------------

@query(
    "u_map_in_arrow",
    oracle="""
    SELECT CAST(doc_id % 16 AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split_regex(lower(text), '[^a-z0-9]+'))
                    - len(list_filter(string_split_regex(lower(text),
                                                         '[^a-z0-9]+'),
                          x -> x = ''))) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY 1
    """,
    tags=("udf-surface", "arrow", "api"),
)
def u_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow kernel — the RecordBatch-level sibling of
    mapInPandas (no pandas conversion at all: the kernel sees raw
    pyarrow batches, the lowest-overhead Python surface Spark
    offers).  Tokenizes and counts per document inside Arrow compute,
    emits per-batch partials, and a tiny keyed aggregate merges them
    — the pre-aggregate-inside-the-kernel shape that keeps Python
    boundary traffic at O(shards), not O(rows).

    Scale: map-side kernel + one 16-row aggregate; use this API over
    mapInPandas when the kernel is itself vectorized (Arrow compute /
    numpy on buffers) and the pandas conversion would just burn
    cycles.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = Tables(spark, sf_dir).documents.select("doc_id", "text").repartition(spark.sparkContext.defaultParallelism)

    def kernel(batches):
        for batch in batches:
            doc_id = batch.column("doc_id")
            toks = pc.split_pattern_regex(
                pc.utf8_lower(batch.column("text")), "[^a-z0-9]+"
            )
            # count non-empty tokens per row: list lengths minus empties
            n_all = pc.list_value_length(toks)
            flat = pc.list_flatten(toks)
            empty_mask = pc.equal(flat, "")
            # per-row empty counts via parent indices of the flattened list
            parents = pc.list_parent_indices(toks)
            empt = pa.table(
                {"p": parents, "e": pc.cast(empty_mask, pa.int64())}
            ).group_by("p").aggregate([("e", "sum")])
            empties = dict(
                zip(empt.column("p").to_pylist(), empt.column("e_sum").to_pylist())
            )
            shard = pc.cast(
                pc.subtract(
                    doc_id, pc.multiply(pc.divide(doc_id, 16), 16)
                ),
                pa.int64(),
            )
            n_tok = [
                int(n_all[i].as_py()) - int(empties.get(i, 0))
                for i in range(len(batch))
            ]
            out = pa.table(
                {
                    "shard": shard,
                    "n_docs": pa.array([1] * len(batch), pa.int64()),
                    "n_tokens": pa.array(n_tok, pa.int64()),
                }
            )
            yield from out.to_batches()

    partial = docs.mapInArrow(
        kernel, schema="shard long, n_docs long, n_tokens long"
    )
    return partial.groupBy("shard").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# Longest increasing streak per user (gaps-and-islands on direction)
# --------------------------------------------------------------------------

@query(
    "w_longest_streak",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             row_number() OVER w AS rn,
             lag(CAST(round(value * 100) AS BIGINT)) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    flagged AS (
      SELECT user_id, rn,
             CASE WHEN prev IS NULL OR cents <= prev THEN 1 ELSE 0 END
               AS brk
      FROM seq
    ),
    islands AS (
      SELECT user_id, rn,
             sum(brk) OVER (PARTITION BY user_id ORDER BY rn
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS island
      FROM flagged
    ),
    runs AS (
      SELECT user_id, island, CAST(count(*) AS BIGINT) AS run_len
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id, CAST(max(run_len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_runs
    FROM runs GROUP BY user_id
    """,
    tags=("window", "streaks", "analytics"),
)
def w_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest strictly-increasing value streak per user — the
    gaps-and-islands pattern applied to run DIRECTION instead of time
    gaps (w_scd2_intervals' sibling): a break flag wherever the value
    fails to increase, a running sum of breaks as the island id, then
    run lengths per island.  Integer cents make the comparison exact;
    (ts, event_id) ordering makes islands deterministic.

    Scale: the lag, the running sum, and both aggregates all ride ONE
    user-keyed window Exchange — four logical steps, one shuffle;
    state per row is O(1).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = Tables(spark, sf_dir).events.select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    seq = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("prev", F.lag("cents").over(w))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("cents") <= F.col("prev")), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("brk").over(wrun))
    )
    runs = seq.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("bigint").alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.max("run_len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
    )


# --------------------------------------------------------------------------
# Percent-of-parent contribution (share-of-hierarchy analysis)
# --------------------------------------------------------------------------

@query(
    "x_share_of_parent",
    oracle="""
    WITH seg AS (
      SELECT n.n_name AS nation, c.c_mktsegment AS segment,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT nation, segment, cents,
           CAST(cents * 1000000 //
                sum(cents) OVER (PARTITION BY nation) AS BIGINT)
             AS share_of_nation_ppm,
           CAST(cents * 1000000 // sum(cents) OVER () AS BIGINT)
             AS share_of_total_ppm
    FROM seg
    """,
    tags=("analytics", "contribution", "window-over-agg"),
)
def x_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent contribution analysis — each (nation,
    segment) cell's share of its nation and of the grand total, the
    drill-down ratio every BI hierarchy needs — computed as windows
    OVER THE AGGREGATE OUTPUT (~125 rows), never over raw orders: the
    base aggregation reduces first, then two window passes on the
    tiny result supply both denominator levels.  Shares are exact ppm
    integers (cents * 1e6 div parent cents).

    Scale: the expensive shuffle is the one keyed base aggregation
    (map-side combined, dims broadcast); the nation window and the
    global window run on O(|nations| x |segments|) rows where a
    single-partition exchange is FINE — the single-reducer rule is
    about row counts, not operator names.
    """
    t = Tables(spark, sf_dir)
    seg = (
        t.orders.join(
            t.customer, F.col("o_custkey") == F.col("c_custkey")
        )
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    return seg.withColumn(
        "share_of_nation_ppm",
        F.expr("cents * 1000000 div sum(cents) over (partition by nation)").cast(
            "bigint"
        ),
    ).withColumn(
        "share_of_total_ppm",
        F.expr("cents * 1000000 div sum(cents) over ()").cast("bigint"),
    )


# --------------------------------------------------------------------------
# First-touch attribution (earliest qualifying event in a bounded window)
# --------------------------------------------------------------------------

@query(
    "j_first_touch_attribution",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'view'
                  THEN date_diff('second', TIMESTAMP '1970-01-01', ts)
                       * 10000000 + event_id END AS view_key
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    attributed AS (
      SELECT user_id, ts, event_id, event_type,
             min(view_key) OVER (
               PARTITION BY user_id
               ORDER BY date_diff('second', TIMESTAMP '1970-01-01', ts)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
             ) AS first_view_key
      FROM tagged
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CASE WHEN first_view_key IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
           CAST(coalesce(min(CASE WHEN first_view_key IS NOT NULL
                                  THEN first_view_key % 10000000 END), -1)
                AS BIGINT) AS min_first_view_event
    FROM attributed
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
    tags=("analytics", "attribution", "window"),
)
def j_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: every purchase credits the EARLIEST
    view within the preceding 7 days — the mirror image of the as-of
    join (j_asof_join credits the LATEST prior event) and the other
    half of marketing attribution.  Computed with zero joins: views
    and purchases are unioned into one stream, each view carries a
    composite (epoch*1e7 + event_id) key, and a RANGE-framed running
    min over event-time surfaces the earliest view key still inside
    the 7-day window at each purchase.  The composite key keeps the
    tiebreak deterministic and lets the view's event_id be recovered
    exactly (mod 1e7).

    Scale: ONE user-keyed window Exchange for the whole attribution —
    no purchase x view join, no row multiplication; the range frame's
    state is bounded by the 7-day horizon.  This union-then-window
    shape is why event streams should carry a type tag instead of
    living in separate tables.
    """
    from pyspark.sql.window import Window

    ev = Tables(spark, sf_dir).events.where(
        F.col("event_type").isin("view", "purchase")
    ).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.col("event_type") == "view",
            F.unix_timestamp("ts") * 10_000_000 + F.col("event_id"),
        ).alias("view_key"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-604_800, Window.currentRow)
    )
    attributed = ev.withColumn("first_view_key", F.min("view_key").over(w))
    return (
        attributed.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(F.when(F.col("first_view_key").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_attributed"),
            F.coalesce(
                F.min(
                    F.when(
                        F.col("first_view_key").isNotNull(),
                        F.col("first_view_key") % 10_000_000,
                    )
                ),
                F.lit(-1),
            )
            .cast("bigint")
            .alias("min_first_view_event"),
        )
    )


# --------------------------------------------------------------------------
# Column profiler (dataset documentation / stats pass)
# --------------------------------------------------------------------------

@query(
    "x_column_profile",
    oracle="""
    SELECT 'orders.o_orderstatus' AS col,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
           CAST(min(len(o_orderstatus)) AS BIGINT) AS min_len,
           CAST(max(len(o_orderstatus)) AS BIGINT) AS max_len
    FROM orders
    UNION ALL
    SELECT 'customer.c_mktsegment',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(DISTINCT c_mktsegment) AS BIGINT),
           CAST(min(len(c_mktsegment)) AS BIGINT),
           CAST(max(len(c_mktsegment)) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'documents.lang',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT lang) AS BIGINT),
           CAST(min(len(lang)) AS BIGINT),
           CAST(max(len(lang)) AS BIGINT)
    FROM documents
    """,
    tags=("data-ops", "profiling", "pipeline"),
)
def x_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler — the stats pass behind dataset documentation
    and automatic quality baselines (row count, null count, exact
    distinct cardinality, value-length range per column), emitted as
    one row per profiled column across multiple tables.  The DQ suite
    (x_dq_expectations) asserts invariants; this MEASURES the shape a
    curator reads before writing those invariants.

    Scale: one map-side-combined pass per table; exact countDistinct
    shuffles the (few) distinct values only.  For 10^9-cardinality
    columns swap exact distinct for the bounded-error sketch
    (x_approx_distinct pattern) — profiling never needs the last
    digit.
    """
    t = Tables(spark, sf_dir)

    def profile(df: DataFrame, table: str, col: str) -> DataFrame:
        c = F.col(col)
        return df.agg(
            F.lit(f"{table}.{col}").alias("col"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("bigint").alias("n_nulls"),
            F.countDistinct(c).cast("bigint").alias("n_distinct"),
            F.min(F.length(c)).cast("bigint").alias("min_len"),
            F.max(F.length(c)).cast("bigint").alias("max_len"),
        )

    return (
        profile(t.orders, "orders", "o_orderstatus")
        .unionByName(profile(t.customer, "customer", "c_mktsegment"))
        .unionByName(profile(t.documents, "documents", "lang"))
    )
