"""Scalar-function and additional TPC-H-shape surface: string/regexp,
JSON extraction, higher-order array functions, conditional/bitwise
aggregates, exact percentiles, ordered string aggregation, lateral
explode, deterministic hash sampling, union-by-name, interval
arithmetic, and the remaining classic TPC-H query shapes (Q6, Q12,
Q14, Q19, Q22).

The reference's scalar surface is P1-P10 (SURVEY.md §2.2 — tile math,
tag decode, nibble unpack, JSON serialization, `map2db.py:322-451`);
everything here is the engine-complete superset a Spark user expects
on top of that, each declared as a (Spark plan, DuckDB oracle) pair.

Parity conventions (see module docstring of queries_relational.py):
identical aliases, explicit rounds/casts on both sides, total
deterministic order for any top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from map2db_spark.registry import query
from map2db_spark.tables import Tables


# ---------------------------------------------------------------------------
# Remaining classic TPC-H shapes
# ---------------------------------------------------------------------------


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global agg, zero joins.

    Scale: every predicate reaches the parquet scan (PushedFilters) and
    only 4 columns are read (ReadSchema) — asserted in test_plans.py.
    The aggregate is a map-side partial sum; the shuffle carries one row
    per task regardless of SF.
    """
    li = Tables(spark, sf_dir).lineitem
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "q12_priority_case_agg",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate
    GROUP BY l_linestatus
    """,
    tags=("agg", "join", "case"),
)
def q12_priority_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE-conditional counts inside one aggregation.

    Scale: one shuffle for the orders⋈lineitem join, then map-side
    partial sums; the CASE stays in whole-stage codegen (no UDF).
    """
    t = Tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.orders.join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "q14_promo_effect",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                       / sum(l_extendedprice * (1 - l_discount)), 3) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    tags=("agg", "join", "case"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional sums over a month window.

    Scale: part is broadcast (dimension-sized); lineitem is filtered at
    the scan to one month before the join, so the join input is a
    fraction of the fact table.
    """
    t = Tables(spark, sf_dir)
    li = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 3).alias("promo_pct"))
    )


@query(
    "q19_disjunctive_pushdown",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("agg", "join", "pushdown"),
)
def q19_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.

    Scale: Catalyst derives the single-table implications of the
    disjunction (p_brand IN (...), l_quantity BETWEEN 1 AND 30) and
    pushes them below the join, so both scans are pre-filtered even
    though the full predicate must evaluate after the join.
    """
    t = Tables(spark, sf_dir)
    joined = t.lineitem.join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@query(
    "q22_idle_customers",
    oracle="""
    SELECT cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(bal), 2) AS totacctbal
    FROM (
        SELECT substring(c_name, 10, 2) AS cntrycode, c_acctbal AS bal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
    )
    GROUP BY cntrycode
    """,
    tags=("agg", "antijoin", "subquery"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti-join
    + substring-derived grouping key.

    Scale: the threshold is a one-row broadcast (not a cross join of the
    fact); the anti-join shuffles only customer keys against the orders
    key projection.
    """
    t = Tables(spark, sf_dir)
    cust = t.customer
    threshold = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = cust.join(F.broadcast(threshold)).where(F.col("c_acctbal") > F.col("avg_bal"))
    recent = t.orders.where(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    idle = rich.join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    return (
        idle.select(
            F.substring("c_name", 10, 2).alias("cntrycode"), F.col("c_acctbal").alias("bal")
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("bal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar function surface
# ---------------------------------------------------------------------------


@query(
    "f_string_surface",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           regexp_extract(p_name, '([a-z]+)$', 1)          AS last_word,
           string_split(p_name, ' ')[1]                    AS first_word,
           CAST(length(p_name) AS INT)                     AS name_len,
           replace(p_name, ' ', '_')                       AS name_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded,
           reverse(p_brand)                                AS brand_rev,
           concat_ws('|', p_brand, p_type)                 AS brand_type
    FROM part
    WHERE p_partkey % 7 = 0
    """,
    tags=("scalar", "string"),
)
def f_string_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/regexp scalar surface (the engine analog of the
    reference's tag-string handling, map2db.py:424-451): case mapping,
    regexp group extraction, split + 1-based element access, length,
    replace, pad, reverse, multi-arg concat — all JVM-side builtins,
    no UDFs.
    """
    p = Tables(spark, sf_dir).part
    return p.where(F.col("p_partkey") % 7 == 0).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@query(
    "f_json_extraction",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_total,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)    AS k_max,
           CAST(count(*) AS BIGINT)                                            AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json"),
)
def f_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column, then aggregation on
    the extracted value (the engine analog of the reference's JSON tag
    serialization P10, map2db.py:872-875 — here read back, not just
    written).

    Scale: get_json_object is a JVM builtin evaluated inside codegen;
    no Python involved.  For repeated multi-key extraction, from_json
    to a struct once beats N path extractions.
    """
    ev = Tables(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("k_total"),
        F.max(k).cast("int").alias("k_max"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "h_array_higher_order",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT)    AS n_pos,
           round(list_max(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))), 5)                      AS max_val
    FROM embeddings
    WHERE vec_id % 50 = 0
    """,
    tags=("scalar", "array", "higher-order"),
)
def h_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform / filter / aggregate)
    over the embedding column — the JVM-side lambda surface that keeps
    vector math out of Python entirely.

    Parity note: float32 elements are promoted to double BEFORE any
    arithmetic on both sides; the fold order is left-to-right on both
    engines so the sums agree bit-for-bit before rounding.
    """
    emb = Tables(spark, sf_dir).embeddings
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.where(F.col("vec_id") % 50 == 0).select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(F.array_max(F.transform("embedding", lambda x: x.cast("double"))), 5).alias(
            "max_val"
        ),
    )


# ---------------------------------------------------------------------------
# Aggregate surface extensions
# ---------------------------------------------------------------------------


@query(
    "x_conditional_bitwise_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS n_big,
           bool_or(o_orderpriority = '1-URGENT')                         AS any_urgent,
           bool_and(o_totalprice > 0)                                    AS all_positive,
           CAST(bit_and(o_orderkey) AS BIGINT)                           AS key_bit_and,
           CAST(bit_or(o_orderkey) AS BIGINT)                            AS key_bit_or,
           CAST(bit_xor(o_orderkey) AS BIGINT)                           AS key_bit_xor
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "conditional", "bitwise"),
)
def x_conditional_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (FILTER/count_if), boolean (bool_and/bool_or) and
    bitwise (bit_and/or/xor) aggregates — all commutative+associative,
    so map-side partials apply and the shuffle stays O(groups)."""
    o = Tables(spark, sf_dir).orders
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bit_and("o_orderkey").alias("key_bit_and"),
        F.bit_or("o_orderkey").alias("key_bit_or"),
        F.bit_xor("o_orderkey").alias("key_bit_xor"),
    )


@query(
    "x_median_percentile",
    oracle="""
    SELECT l_returnflag,
           round(median(l_quantity), 2)                           AS med_qty,
           round(CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE), 2) AS p90_price,
           round(CAST(quantile_cont(l_extendedprice, 0.1) AS DOUBLE), 2) AS p10_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def x_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median and continuous percentiles per group (the exact
    counterparts of the approx sketches in x_approx_quantiles).

    Scale: exact percentiles need the group's values together — this is
    the one aggregate family where approx_percentile is the 100 TB
    answer; the exact form is for dimension-sized groups.
    """
    li = Tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 2).alias("med_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 2).alias("p90_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.1)), 2).alias("p10_price"),
    )


@query(
    "r_string_agg_ordered",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("agg", "string"),
)
def r_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg/string_agg): collect_list is
    order-nondeterministic under parallelism, so the deterministic form
    is sort-then-join — array_sort(collect_list()) + concat_ws."""
    t = Tables(spark, sf_dir)
    return (
        F.broadcast(t.region)
        .join(t.nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations")
        )
    )


# ---------------------------------------------------------------------------
# Row-generating / set-shaping surface
# ---------------------------------------------------------------------------


@query(
    "r_lateral_explode",
    oracle="""
    SELECT tok, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(o_orderpriority, '-')) AS tok FROM orders)
    GROUP BY tok
    """,
    tags=("generator", "explode"),
)
def r_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral row generation: split a scalar into an array and explode
    one row per element (the tokenize-then-count shape every text
    pipeline starts with; t_token_stats is the documents-scale version).

    Scale: explode multiplies rows — repartition BEFORE a
    work-amplifying explode when the source is few large files
    (CLAUDE.md rule); here the amplification factor is 2, harmless.
    """
    o = Tables(spark, sf_dir).orders
    return (
        o.select(F.explode(F.split("o_orderpriority", "-")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "r_sample_hash",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)      AS n_sampled,
           round(avg(o_totalprice), 2)   AS avg_price,
           CAST(min(o_orderkey) AS BIGINT) AS min_key
    FROM orders
    WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '10'
    """,
    tags=("sampling", "filter"),
)
def r_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling: md5-of-key prefix threshold gives a
    reproducible ~1/16 sample on any engine — unlike TABLESAMPLE /
    df.sample(seed), whose RNG streams are engine- and partition-
    dependent and can never cross-check.

    Scale: the predicate is a pure row-local function of the key — no
    shuffle, no state, identical sample membership at any parallelism.
    """
    o = Tables(spark, sf_dir).orders
    sampled = o.where(
        F.substring(F.md5(F.col("o_orderkey").cast("string").cast("binary")), 1, 2) < "10"
    )
    return sampled.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.min("o_orderkey").alias("min_key"),
    )


@query(
    "r_union_by_name",
    oracle="""
    SELECT src,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(bal), 2)       AS total_bal
    FROM (
        SELECT c_custkey AS id, c_acctbal AS bal, 'customer' AS src FROM customer
        UNION ALL BY NAME
        SELECT 'supplier' AS src, s_acctbal AS bal, s_suppkey AS id FROM supplier
    )
    GROUP BY src
    """,
    tags=("setop", "union"),
)
def r_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union by column NAME, not position — the schema-evolution-safe
    union (positional UNION ALL would silently pair id with src here).
    """
    t = Tables(spark, sf_dir)
    cust = t.customer.select(
        F.col("c_custkey").alias("id"),
        F.col("c_acctbal").alias("bal"),
        F.lit("customer").alias("src"),
    )
    supp = t.supplier.select(
        F.lit("supplier").alias("src"),
        F.col("s_acctbal").alias("bal"),
        F.col("s_suppkey").alias("id"),
    )
    return (
        cust.unionByName(supp)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("bal"), 2).alias("total_bal"),
        )
    )


@query(
    "d_interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP)  AS due_ts,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS qtr,
           CAST(date_part('doy', o_orderdate) AS INT)        AS doy,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INT) AS days_since
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
    tags=("scalar", "datetime"),
)
def d_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic and calendar decomposition: timestamp +
    INTERVAL, quarter truncation, day-of-year, day difference from an
    epoch — all codegen'd JVM builtins."""
    o = Tables(spark, sf_dir).orders
    return o.where(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.date_trunc("quarter", "o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since"),
    )


# ---------------------------------------------------------------------------
# Window + grouping-set completions
# ---------------------------------------------------------------------------


@query(
    "w_cume_dist_first_last",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           round(cume_dist() OVER w, 4) AS cd,
           round(first_value(s_acctbal) OVER
                 (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS min_bal,
           round(last_value(s_acctbal) OVER
                 (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 2) AS max_bal
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal)
    """,
    tags=("window", "analytic"),
)
def w_cume_dist_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + first_value/last_value with explicit ROWS frames
    (last_value needs CURRENT ROW .. UNBOUNDED FOLLOWING — the default
    frame ends at the current row, a classic silent-wrong-answer).

    The frame windows tiebreak on s_suppkey for full determinism;
    cume_dist orders by the value alone so ties share a value.
    """
    s = Tables(spark, sf_dir).supplier
    w_cd = Window.partitionBy("s_nationkey").orderBy("s_acctbal")
    w_frame = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.cume_dist().over(w_cd), 4).alias("cd"),
        F.round(
            F.first("s_acctbal").over(
                w_frame.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("min_bal"),
        F.round(
            F.last("s_acctbal").over(
                w_frame.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            ),
            2,
        ).alias("max_bal"),
    )


@query(
    "g_grouping_sets_explicit",
    oracle="""
    SELECT n_name, o_orderstatus,
           CAST(count(*) AS BIGINT)     AS n,
           round(sum(o_totalprice), 2)  AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, o_orderstatus), (n_name), ())
    """,
    tags=("rollup", "sql"),
)
def g_grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube desugar to)
    via the SQL surface — the DataFrame API only exposes rollup/cube.

    Scale: one Expand node + one shuffle for all three grouping sets —
    not three scans.
    """
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    t.customer.createOrReplaceTempView("customer")
    t.nation.createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT n_name, o_orderstatus,
               count(*)                    AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name, o_orderstatus), (n_name), ())
        """
    )


@query(
    "x_argmax_min_by",
    oracle="""
    SELECT o_orderstatus,
           CAST(arg_max(o_orderkey,
                CAST(round(o_totalprice * 100) AS BIGINT) * 1000000 + o_orderkey)
                AS BIGINT) AS priciest_order,
           CAST(arg_min(o_orderkey,
                CAST(round(o_totalprice * 100) AS BIGINT) * 1000000 + o_orderkey)
                AS BIGINT) AS cheapest_order,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "argmax"),
)
def x_argmax_min_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregates (max_by / min_by ~ arg_max / arg_min) —
    the single-shuffle form of "row with the extreme value per group"
    that otherwise costs a window + filter.

    Parity note: max_by ties are engine-arbitrary, so the ordering
    value is made strictly unique by exact integer encoding
    (price-cents * 1e6 + key) — same trick as the consolidation
    argmax (operators/consolidate.py).
    """
    o = Tables(spark, sf_dir).orders
    rank_val = (
        F.round(F.col("o_totalprice") * 100).cast("bigint") * F.lit(1000000).cast("bigint")
        + F.col("o_orderkey")
    )
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", rank_val).alias("priciest_order"),
        F.min_by("o_orderkey", rank_val).alias("cheapest_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "d_date_spine_fill",
    oracle="""
    WITH spine AS (
      SELECT CAST(gs AS TIMESTAMP) AS month
      FROM generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '1998-12-01',
                           INTERVAL 1 MONTH) AS t(gs)
    ),
    rev AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             sum(o_totalprice) AS r
      FROM orders GROUP BY 1
    )
    SELECT s.month, round(coalesce(r, 0.0), 2) AS revenue
    FROM spine s LEFT JOIN rev ON s.month = rev.month
    """,
    tags=("generator", "datetime", "join"),
)
def d_date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap filling: generate a complete month axis with
    sequence(), left-join actual revenue, zero-fill missing months —
    the reporting shape where absent data must appear as 0, not as a
    missing row.

    Scale: the spine is 48 rows — broadcast side of the join; the
    revenue aggregate is the only shuffle.
    """
    o = Tables(spark, sf_dir).orders
    spine = spark.sql(
        """SELECT explode(sequence(TIMESTAMP '1995-01-01',
                                   TIMESTAMP '1998-12-01',
                                   INTERVAL 1 MONTH)) AS month"""
    )
    rev = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.sum("o_totalprice").alias("r")
    )
    return (
        F.broadcast(spine)
        .join(rev, "month", "left")
        .select("month", F.round(F.coalesce(F.col("r"), F.lit(0.0)), 2).alias("revenue"))
    )


@query(
    "w_forward_fill",
    oracle="""
    SELECT user_id, event_id,
           round(last_value(CASE WHEN event_type = 'purchase' THEN value END
                            IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 2) AS last_purchase_value
    FROM events
    WHERE user_id < 40
    """,
    tags=("window", "timeseries"),
)
def w_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last observation carried forward): sparse signal
    (purchase value) propagated along each user's timeline via
    last_value IGNORE NULLS with an explicit running frame — the
    time-series imputation primitive.

    Rows before a user's first purchase stay NULL on both engines.
    """
    ev = Tables(spark, sf_dir).events.where(F.col("user_id") < 40)
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.last(sparse, ignorenulls=True).over(w), 2).alias("last_purchase_value"),
    )


@query(
    "j_cross_join_grid",
    oracle="""
    WITH grid AS (
      SELECT r_name, status
      FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders)
    ),
    counts AS (
      SELECT r_name AS rn, o_orderstatus AS st, count(*) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation   ON c_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
      GROUP BY 1, 2
    )
    SELECT g.r_name, g.status, CAST(coalesce(n, 0) AS BIGINT) AS n
    FROM grid g LEFT JOIN counts c ON c.rn = g.r_name AND c.st = g.status
    """,
    tags=("join", "crossjoin"),
)
def j_cross_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join building a dense (region x status) grid,
    zero-filled from sparse counts — every grid cell present even when
    empty.

    Scale: cross joins are only ever sane dimension x dimension; both
    sides here are tiny and broadcast.  The fact-table aggregation is
    the one shuffle.
    """
    t = Tables(spark, sf_dir)
    statuses = t.orders.select(F.col("o_orderstatus").alias("status")).distinct()
    grid = t.region.select("r_name").crossJoin(F.broadcast(statuses))
    counts = (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("rn"), F.col("o_orderstatus").alias("st"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        grid.join(
            counts,
            (F.col("rn") == F.col("r_name")) & (F.col("st") == F.col("status")),
            "left",
        )
        .select("r_name", "status", F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("n"))
    )


@query(
    "r_values_inline",
    oracle="""
    SELECT n_name, tier
    FROM nation
    JOIN (VALUES (0, 'amer'), (1, 'emea'), (2, 'apac'), (3, 'amer'), (4, 'emea'))
         AS m(rk, tier)
      ON n_regionkey = rk
    """,
    tags=("source", "values"),
)
def r_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES as a first-class source (driver-defined lookup
    table joined against data) — the idiom for small reference mappings
    that live in code, broadcast to every executor."""
    n = Tables(spark, sf_dir).nation
    mapping = spark.createDataFrame(
        [(0, "amer"), (1, "emea"), (2, "apac"), (3, "amer"), (4, "emea")],
        "rk int, tier string",
    )
    return n.join(F.broadcast(mapping), F.col("n_regionkey") == F.col("rk")).select(
        "n_name", "tier"
    )


@query(
    "f_map_surface",
    oracle="""
    SELECT o_orderkey, k, v FROM (
      SELECT o_orderkey, 'status' AS k, o_orderstatus AS v
      FROM orders WHERE o_orderkey % 500 = 0
      UNION ALL
      SELECT o_orderkey, 'priority' AS k, o_orderpriority AS v
      FROM orders WHERE o_orderkey % 500 = 0
      UNION ALL
      SELECT o_orderkey, 'bucket' AS k,
             CAST(CAST(o_totalprice AS BIGINT) // 100000 AS VARCHAR) AS v
      FROM orders WHERE o_orderkey % 500 = 0
    )
    """,
    tags=("scalar", "map"),
)
def f_map_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a map from scalars (create_map), extend it
    (map_concat), explode to (key, value) rows — the open-schema column
    pattern the engine uses for variable tags (SURVEY §1.3: MapType
    replaces the reference's ALTER TABLE, map2db.py:860-871).

    The oracle states the same key/value set relationally; the
    hash-compare is order-insensitive so map iteration order is free.
    """
    o = Tables(spark, sf_dir).orders.where(F.col("o_orderkey") % 500 == 0)
    base = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    bucket = F.create_map(
        F.lit("bucket"),
        (F.col("o_totalprice").cast("bigint") / 100000).cast("bigint").cast("string"),
    )
    return (
        o.select("o_orderkey", F.map_concat(base, bucket).alias("m"))
        .select("o_orderkey", F.explode("m").alias("k", "v"))
    )


@query(
    "f_regexp_surface",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[aeiou]{2}')) AS INT) AS n_double_vowels,
           md5(regexp_replace(text, '[0-9]+', '#', 'g'))            AS masked_md5,
           regexp_matches(text, '^[a-z]')                           AS starts_lower
    FROM documents WHERE doc_id < 150
    """,
    tags=("scalar", "regexp"),
)
def f_regexp_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar surface: occurrence counting (regexp_count),
    global substitution (regexp_replace), anchored matching (rlike) —
    the text-normalization primitives every corpus pipeline applies
    before tokenizing.  The substitution result is md5'd so the oracle
    compares content without hauling full texts through the hash."""
    d = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 150)
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("[aeiou]{2}")).alias("n_double_vowels"),
        F.md5(F.regexp_replace("text", "[0-9]+", "#").cast("binary")).alias("masked_md5"),
        F.col("text").rlike("^[a-z]").alias("starts_lower"),
    )


@query(
    "f_file_provenance",
    oracle="""
    SELECT 'documents.parquet' AS file, CAST(count(*) AS BIGINT) AS n
    FROM documents
    """,
    tags=("scalar", "metadata"),
)
def f_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden file-metadata column surface: every row carries its source
    file via _metadata.file_path — the lineage hook for audit trails and
    selective reprocessing (at 100 TB, "which files produced these bad
    rows" must be a column, not a log grep).  The oracle pins the known
    single-file layout; the Spark side actually extracts the name from
    the scan metadata."""
    d = Tables(spark, sf_dir).documents
    return d.select(
        F.regexp_extract(F.col("_metadata.file_path"), "([^/]+)$", 1).alias("file")
    ).groupBy("file").agg(F.count(F.lit(1)).alias("n"))


@query(
    "h_array_setops",
    oracle="""
    SELECT doc_id,
           CAST(len(list_intersect(toks,
                ['the', 'a', 'of', 'and', 'to', 'in'])) AS INT) AS n_stop_kinds,
           CAST(len(list_distinct(toks)) AS INT)                AS n_distinct,
           CAST(len(list_filter(list_distinct(toks),
                t -> NOT list_contains(['the', 'a', 'of', 'and', 'to', 'in'], t)))
                AS INT)                                         AS n_content_kinds
    FROM (
      SELECT doc_id,
             list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks
      FROM documents WHERE doc_id < 120
    )
    """,
    tags=("scalar", "array", "setop"),
)
def h_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations (intersect / distinct / except) on token
    arrays — vocabulary-overlap primitives computed per row, JVM-side.
    Outputs are cardinalities because set-op element ORDER is engine-
    arbitrary; the sizes are exact."""
    stop = F.array(*[F.lit(w) for w in ["the", "a", "of", "and", "to", "in"]])
    d = Tables(spark, sf_dir).documents.where(F.col("doc_id") < 120)
    toks = F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
    return d.select(
        "doc_id",
        F.size(F.array_intersect(toks, stop)).alias("n_stop_kinds"),
        F.size(toks).alias("n_distinct"),
        F.size(F.array_except(toks, stop)).alias("n_content_kinds"),
    )


@query(
    "x_width_bucket_histogram",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice >= 500000 THEN 11
                     WHEN o_totalprice < 0 THEN 0
                     ELSE floor(o_totalprice / 50000) + 1 END AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT)    AS n,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY 1
    """,
    tags=("agg", "histogram"),
)
def x_width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket (10 buckets over
    [0, 500k]) — the fixed-bin companion to the quantile binning in
    w_ntile_buckets.  The oracle spells out width_bucket's clamp
    semantics arithmetically."""
    o = Tables(spark, sf_dir).orders
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(500000.0), F.lit(10)).alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


@query(
    "f_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(round(CAST(round(o_totalprice * 100) AS BIGINT) * 10
                      / NULLIF(o_orderkey % 5, 0)) AS BIGINT) AS price_per_milli,
           TRY_CAST(o_orderstatus AS INT)                     AS status_as_int,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INT)  AS priority_num
    FROM orders WHERE o_orderkey % 97 = 0
    """,
    tags=("scalar", "null-safety"),
)
def f_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic and casting: try_divide yields NULL on
    division by zero, try_cast yields NULL on malformed input — the
    poison-row containment every batch pipeline needs (one bad row must
    not kill a 100 TB job).

    Parity note: the division runs on exact integer milli-cents and
    rounds to an INTEGER, where Spark's HALF_UP and DuckDB's
    round-half-away agree for every representable quotient; rounding
    a raw double quotient to 3 DECIMALS is engine-divergent at
    shortest-representation .0005 boundaries (Spark rounds the
    decimal string, DuckDB the scaled double — one sf0.1 row hit it)."""
    o = Tables(spark, sf_dir).orders.where(F.col("o_orderkey") % 97 == 0)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return o.select(
        "o_orderkey",
        F.round(F.try_divide(cents * 10, F.col("o_orderkey") % 5))
        .cast("long")
        .alias("price_per_milli"),
        F.col("o_orderstatus").try_cast("int").alias("status_as_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("priority_num"),
    )
