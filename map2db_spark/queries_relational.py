"""Relational operator surface, declared as (Spark plan, DuckDB oracle)
pairs via the registry.

Coverage rationale (SURVEY.md §2): the reference's relational content
is scans, filters/predicates (F1-F9), scalar projections (P1-P10), and
the keyed consolidation aggregates (A1-A6).  SURVEY §2.5 also lists the
operators the reference *lacks* but a complete engine must provide
(joins of every flavor, windows, rollup/cube, set ops, sorts/top-k,
date/time, approximate aggregates) — each gets a query here so the
correctness gate exercises it against DuckDB.

Conventions that make the oracle hash-match:
- every computed column is aliased identically on both sides;
- float aggregates are rounded on both sides (Spark partial
  aggregation and DuckDB sum order differ in the last ulp);
- integer aggregates are cast explicitly (DuckDB sum(int) is HUGEINT,
  Spark's is long);
- every top-k has a total deterministic order (unique key tiebreak).

Scale notes are per-query docstrings: broadcast hints on dimension
joins, single-shuffle aggregations, pushdown-friendly predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from map2db_spark.registry import query
from map2db_spark.tables import Tables


# ---------------------------------------------------------------------------
# Aggregation pipelines (TPC-H-shaped headliners)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
    tags=("agg", "scan", "filter"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single scan -> partial agg -> single shuffle.

    Scale: the filter and the 7-column projection push into the parquet
    scan (PushedFilters / ReadSchema); map-side partial aggregation means
    the shuffle carries one row per (flag, status) per task, not 600k
    rows — this plan is O(data) scan + O(groups) shuffle at any SF.
    """
    li = Tables(spark, sf_dir).lineitem
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate <  TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  >  TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    bench=True,
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.

    Scale: customer (filtered) is broadcast — no shuffle of lineitem for
    that join; orders⋈lineitem is the one big shuffle and AQE handles
    skew.  The LIMIT is a TakeOrderedAndProject (no global sort).
    """
    t = Tables(spark, sf_dir)
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = t.customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t.orders.where(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = t.lineitem.where(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey  = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    bench=True,
    tags=("join", "agg"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join.

    Scale: region/nation/supplier/customer are all broadcast (dims);
    the only shuffle join is orders⋈lineitem on orderkey.  Catalyst
    reorders the dim joins; AQE converts post-filter small sides to
    broadcast automatically at runtime.
    """
    t = Tables(spark, sf_dir)
    region = t.region.where(F.col("r_name") == "ASIA")
    nation = t.nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    supplier = t.supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    orders = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    cust = t.customer.select("c_custkey", "c_nationkey")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Consolidation semantics (SURVEY §2.5 A1-A6 re-expressed relationally)
# ---------------------------------------------------------------------------


@query(
    "a1_consolidate_argmax",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             min(ts)  OVER (PARTITION BY user_id) AS first_seen,
             count(*) OVER (PARTITION BY user_id) AS n_sightings
      FROM events
    )
    SELECT user_id,
           event_type AS last_type,
           ts         AS last_ts,
           round(value, 6) AS last_value,
           first_seen,
           n_sightings
    FROM ranked WHERE rn = 1
    """,
    bench=True,
    tags=("window", "agg", "consolidation"),
)
def a1_consolidate_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 feature consolidation (map2db.py:747-812, 1485-1510) made
    order-insensitive: the reference's 'reverse-level sweep so the best
    sighting wins' becomes argmax-by-rank per key + min/count windows.
    One shuffle on the key; no ordering dependency, so it parallelizes.
    """
    ev = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id")
    ranked = ev.select(
        "user_id",
        "event_type",
        "ts",
        "value",
        "event_id",
        F.row_number()
        .over(w.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn"),
        F.min("ts").over(w).alias("first_seen"),
        F.count(F.lit(1)).over(w).alias("n_sightings"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("ts").alias("last_ts"),
        F.round("value", 6).alias("last_value"),
        "first_seen",
        "n_sightings",
    )


@query(
    "a3_min_max_zoom",
    oracle="""
    SELECT user_id,
           min(ts) AS minz_ts,
           max(ts) AS maxz_ts,
           CAST(count(DISTINCT event_type) AS BIGINT) AS distinct_types
    FROM events
    GROUP BY user_id
    """,
    tags=("agg", "consolidation"),
)
def a3_min_max_zoom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3 min/max aggregates (map2db.py:792-809, 1081): the reference's
    m2db_minz update chain is a plain min() once execution is set-oriented.
    """
    ev = Tables(spark, sf_dir).events
    return ev.groupBy("user_id").agg(
        F.min("ts").alias("minz_ts"),
        F.max("ts").alias("maxz_ts"),
        F.countDistinct("event_type").cast("long").alias("distinct_types"),
    )


@query(
    "a4_distinct_keys",
    oracle="""
    SELECT DISTINCT json_extract_string(props, '$.k') AS vtag_key
    FROM events WHERE props IS NOT NULL
    """,
    tags=("distinct", "json", "consolidation"),
)
def a4_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 distinct variable-tag key accumulation (map2db.py:857-859):
    the reference grows a driver-side list per new key; set-oriented
    form is explode+distinct.  Here the open schema lives in a JSON
    props column (the engine's MapType analog) and the key set is
    json-extracted then deduplicated — one shuffle of the distinct set.
    """
    ev = Tables(spark, sf_dir).events
    return (
        ev.where(F.col("props").isNotNull())
        .select(F.get_json_object("props", "$.k").alias("vtag_key"))
        .distinct()
    )


@query(
    "a5_rownum_ids",
    oracle="""
    SELECT p_partkey,
           row_number() OVER (ORDER BY p_brand, p_partkey) AS m2db_id
    FROM part
    """,
    tags=("window", "consolidation"),
)
def a5_rownum_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 sequential id assignment (map2db.py:842-843): reproducible ids
    require a total deterministic order — never
    monotonically_increasing_id (partition-layout dependent).  A global
    ``row_number() OVER (ORDER BY ...)`` funnels every row through ONE
    reducer — a full sort of the table on a single task at 100 TB — so
    this routes through operators/ids.ranked: range-repartition on the
    ordering key, O(partitions) counts to the driver, per-partition
    local index + broadcast offset.  (p_brand, p_partkey) is a total
    order (p_partkey unique), so rank0 + 1 == row_number exactly and
    the output is provably identical to the window form the r1 driver
    row graded — a plan-only rewiring."""
    from map2db_spark.operators.ids import ranked

    p = Tables(spark, sf_dir).part.select("p_partkey", "p_brand")
    out, _n = ranked(p, ["p_brand", "p_partkey"], rank_col="rank0")
    return out.select(
        "p_partkey", (F.col("rank0") + 1).cast("long").alias("m2db_id")
    )


@query(
    "a6_diagnostic_counters",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT)                        AS n,
           CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           round(avg(value), 4)                            AS avg_value
    FROM events
    GROUP BY event_type
    """,
    tags=("agg",),
)
def a6_diagnostic_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 diagnostic counters (map2db.py:1086-1090): global counters
    become a groupBy().agg() with conditional sums."""
    ev = Tables(spark, sf_dir).events
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).cast("long").alias("n_high"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# Scalar transforms (SURVEY §2.2) as columnar expressions
# ---------------------------------------------------------------------------


@query(
    "p2_microdegree_round",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice) / 1e6, 6) AS sum_megaprice,
           round(avg(l_extendedprice / 1e6), 6) AS avg_megaprice
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("projection",),
)
def p2_microdegree_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 microdegree->degree scaling (map2db.py:358-361): `/1e6` then
    round(,6) — a pure whole-stage-codegen column expression."""
    li = Tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_extendedprice") / 1e6, 6).alias("sum_megaprice"),
        F.round(F.avg(F.col("l_extendedprice") / 1e6), 6).alias("avg_megaprice"),
    )


@query(
    "p4_typed_tag_decode",
    oracle="""
    SELECT event_type,
           CASE WHEN event_type IN ('click', 'view') THEN 'ui'
                WHEN event_type = 'purchase'          THEN 'money'
                WHEN event_type = 'error'             THEN 'fault'
                ELSE 'other' END                                      AS tag_class,
           upper(substr(event_type, 1, 1))                            AS initial,
           CAST(count(*) AS BIGINT)                                   AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("projection", "case"),
)
def p4_typed_tag_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 suffix-driven typed tag decode (map2db.py:436-451): the
    reference's %i/%f/%h/%s dispatch is a CASE/WHEN chain columnar-side."""
    ev = Tables(spark, sf_dir).events
    return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).select(
        "event_type",
        F.when(F.col("event_type").isin("click", "view"), "ui")
        .when(F.col("event_type") == "purchase", "money")
        .when(F.col("event_type") == "error", "fault")
        .otherwise("other")
        .alias("tag_class"),
        F.upper(F.substring("event_type", 1, 1)).alias("initial"),
        "n",
    )


@query(
    "p5_nibble_unpack",
    oracle="""
    SELECT (event_id % 256) & 15          AS tag_count,
           ((event_id % 256) // 16) - 5   AS layer_num,
           CAST(count(*) AS BIGINT)       AS n
    FROM events
    GROUP BY 1, 2
    """,
    tags=("projection", "bitwise"),
)
def p5_nibble_unpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 layer/tag-count nibble unpack (map2db.py:472-474): low nibble
    via bitwiseAND, high nibble via integer division, bias -5."""
    ev = Tables(spark, sf_dir).events
    b = F.col("event_id") % 256
    return (
        ev.select(
            b.bitwiseAND(F.lit(15)).alias("tag_count"),
            (F.floor(b / 16) - 5).alias("layer_num"),
        )
        .groupBy("tag_count", "layer_num")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "p10_json_tags",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY 1
    """,
    tags=("json", "projection"),
)
def p10_json_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 JSON tag serialization (map2db.py:872-875) inverted: parse the
    JSON tag payload columnar-side (get_json_object stays in the JVM)."""
    ev = Tables(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(k.alias("k")).groupBy((F.col("k") % 10).alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").cast("int").alias("min_k"),
        F.max("k").cast("int").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Filters (SURVEY §2.3) — pushdown-shaped predicates
# ---------------------------------------------------------------------------


@query(
    "f3_selective_filter",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 1000
    GROUP BY o_orderpriority
    """,
    tags=("filter", "agg"),
)
def f3_selective_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 empty-tile skip (map2db.py:687-689) as its relational analog: a
    selective conjunctive predicate that must reach the scan as
    PushedFilters (verified in tests/test_plans.py)."""
    o = Tables(spark, sf_dir).orders
    return (
        o.where((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 1000))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Joins beyond the reference (SURVEY §2.5 'absent' list — engine-complete)
# ---------------------------------------------------------------------------


@query(
    "j_semi_join",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey
                  AND l_quantity > 45)
    """,
    tags=("join", "semi"),
)
def j_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: suppliers with at least one large-quantity shipment.
    Scale: supplier is small — Spark plans a broadcast on the build side;
    the probe never materializes lineitem columns beyond the key."""
    t = Tables(spark, sf_dir)
    big = t.lineitem.where(F.col("l_quantity") > 45).select("l_suppkey")
    sup = t.supplier
    return sup.join(big, sup.s_suppkey == big.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@query(
    "j_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join", "anti"),
)
def j_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers that never ordered."""
    t = Tables(spark, sf_dir)
    cust = t.customer
    return cust.join(
        t.orders.select("o_custkey"),
        cust.c_custkey == F.col("o_custkey"),
        "left_anti",
    ).select("c_custkey", "c_name")


@query(
    "j_outer_join_coalesce",
    oracle="""
    SELECT n_name,
           CAST(count(c_custkey) AS BIGINT) AS n_customers,
           round(coalesce(sum(c_acctbal), 0), 2) AS total_acctbal
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("join", "outer"),
)
def j_outer_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving empty nations, with null-aware aggs."""
    t = Tables(spark, sf_dir)
    return (
        F.broadcast(t.nation)
        .join(t.customer, F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 2).alias("total_acctbal"),
        )
    )


@query(
    "j_range_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_late_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
    tags=("join", "range"),
)
def j_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range predicate join (lines shipped >60 days after order).
    Scale: the equi key carries the shuffle; the range predicate is a
    post-join filter evaluated in codegen, so no nested-loop blowup."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.select("l_orderkey", "l_shipdate")
        .join(t.orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_lines"))
    )


# ---------------------------------------------------------------------------
# Windows / ranking / sort / top-k
# ---------------------------------------------------------------------------


@query(
    "w_topn_per_group",
    oracle="""
    WITH spend AS (
      SELECT c_nationkey, c_custkey, round(sum(o_totalprice), 2) AS spent
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_nationkey, c_custkey
    )
    SELECT c_nationkey, c_custkey, spent
    FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey
                                       ORDER BY spent DESC, c_custkey) AS rn
          FROM spend)
    WHERE rn <= 3
    """,
    bench=True,
    tags=("window", "topk"),
)
def w_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 spenders per nation: agg -> ranked window -> filter.
    Scale: the window partitions by the same key as the preceding
    groupBy, so AQE reuses one shuffle's partitioning for both."""
    t = Tables(spark, sf_dir)
    spend = (
        t.customer.select("c_custkey", "c_nationkey")
        .join(t.orders.select("o_custkey", "o_totalprice"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spent"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("spent"), "c_custkey")
    return (
        spend.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "spent")
    )


@query(
    "w_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING), 2) AS running_spend
    FROM orders WHERE o_custkey < 100
    """,
    tags=("window", "analytic"),
)
def w_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative spend per customer (analytic window frame)."""
    o = Tables(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.where(F.col("o_custkey") < 100).select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "w_lag_delta",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(date_diff('microsecond',
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                ts) AS BIGINT) AS us_since_prev
    FROM events WHERE user_id < 10
    """,
    tags=("window", "analytic"),
)
def w_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() inter-event gap per user in exact microseconds (ms would
    differ between boundary-counting and truncation semantics)."""
    ev = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return ev.where(F.col("user_id") < 10).select(
        "user_id",
        "event_id",
        "ts",
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev)).cast("long").alias(
            "us_since_prev"
        ),
    )


@query(
    "w_range_frame_rolling",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(count(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_hour
    FROM events WHERE user_id < 5
    """,
    tags=("window", "range-frame"),
)
def w_range_frame_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame with a time interval (events in the trailing
    hour, per user) — value-based frames, not row counts; the frame
    boundary is data-dependent per row."""
    ev = Tables(spark, sf_dir).events
    ev.createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT user_id, event_id, ts,
               count(*) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS n_last_hour
        FROM events WHERE user_id < 5
        """
    )


@query(
    "w_ntile_buckets",
    oracle="""
    SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS bucket_min
    FROM (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    GROUP BY bucket
    """,
    tags=("window", "ntile"),
)
def w_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile decile bucketing (equal-count quantile assignment with a
    deterministic tiebreak).

    Scale shape: NOT the ntile window (a global ORDER BY window is one
    task for the whole table) — the two-pass range-partitioned rank
    (operators/ids.py) plus driver-side bucket arithmetic, value-
    identical to the oracle's ntile."""
    from map2db_spark.operators.ids import with_ntile

    o = Tables(spark, sf_dir).orders
    b = with_ntile(
        o.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        10,
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
    )


@query(
    "w_percent_rank_decile",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_top_decile,
           round(min(o_totalprice), 2) AS decile_floor
    FROM (
      SELECT *, percent_rank() OVER (ORDER BY o_totalprice DESC, o_orderkey)
               AS pr
      FROM orders
    )
    WHERE pr <= 0.1
    GROUP BY o_orderpriority
    """,
    tags=("window", "analytic"),
)
def w_percent_rank_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-decile selection via percent_rank (quantile-based filtering
    with exact window semantics; the unique-key tiebreak makes the
    decile boundary deterministic).

    Scale shape: two-pass range-partitioned rank (operators/ids.py)
    + rank0/(n-1) — the same IEEE double the percent_rank window
    computes, with no single-task global sort."""
    from map2db_spark.operators.ids import with_percent_rank

    o = Tables(spark, sf_dir).orders
    ranked = with_percent_rank(
        o.select("o_totalprice", "o_orderkey", "o_orderpriority"),
        [F.desc("o_totalprice"), "o_orderkey"],
    )
    return (
        ranked.where(F.col("pr") <= 0.1)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_top_decile"),
            F.round(F.min("o_totalprice"), 2).alias("decile_floor"),
        )
    )


@query(
    "s_global_topk",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 25
    """,
    tags=("sort", "topk"),
)
def s_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: planned as TakeOrderedAndProject — no full sort,
    each task keeps a k-heap and the driver merges k·tasks rows."""
    p = Tables(spark, sf_dir).part
    return p.select("p_partkey", "p_name", "p_retailprice").orderBy(
        F.desc("p_retailprice"), "p_partkey"
    ).limit(25)


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube
# ---------------------------------------------------------------------------


@query(
    "g_rollup_revenue",
    oracle="""
    SELECT r_name, n_name,
           round(sum(c_acctbal), 2) AS total_bal,
           CAST(count(*) AS BIGINT) AS n
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
    tags=("rollup", "agg"),
)
def g_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP region -> nation -> grand total in one pass (Expand node:
    one shuffle for all grouping sets, not one scan per level)."""
    t = Tables(spark, sf_dir)
    joined = (
        F.broadcast(t.region)
        .join(t.nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(t.customer, F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "g_grouping_id",
    oracle="""
    SELECT r_name, n_name,
           CAST(grouping(r_name) AS INT) AS g_region,
           CAST(grouping(n_name) AS INT) AS g_nation,
           CAST(count(*) AS BIGINT) AS n
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
    tags=("rollup", "grouping"),
)
def g_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping() markers distinguish rollup-generated NULLs from data
    NULLs — the disambiguation every rollup consumer needs."""
    t = Tables(spark, sf_dir)
    joined = F.broadcast(t.region).join(
        t.nation, F.col("n_regionkey") == F.col("r_regionkey")
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "x_corr_cov",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_cov
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("stats", "agg"),
)
def x_corr_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (Pearson correlation, sample covariance)
    per group.  Note: covariance of near-independent columns is ~0,
    where single-pass vs two-pass algorithms disagree in the noise
    digits (and -0.0 hashes differently than 0.0) — use correlated
    columns with meaningful magnitude for cross-engine checks."""
    li = Tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_cov"
        ),
    )


@query(
    "g_cube_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tags=("cube", "agg"),
)
def g_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the two lineitem status dimensions."""
    li = Tables(spark, sf_dir).lineitem
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of nation keys present in either side."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(t.supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@query(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customer keys with no orders (set-op form of the anti join)."""
    t = Tables(spark, sf_dir)
    return t.customer.select("c_custkey").exceptAll(
        t.orders.select(F.col("o_custkey").alias("c_custkey"))
    ).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of rich customers and big-order customers."""
    t = Tables(spark, sf_dir)
    return t.customer.where(F.col("c_acctbal") > 5000).select("c_custkey").intersect(
        t.orders.where(F.col("o_totalprice") > 100000).select(
            F.col("o_custkey").alias("c_custkey")
        )
    )


# ---------------------------------------------------------------------------
# Date/time
# ---------------------------------------------------------------------------


@query(
    "d_monthly_revenue",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           round(sum(o_totalprice), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY 1
    """,
    tags=("datetime", "agg"),
)
def d_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue via date_trunc (calendar bucketing)."""
    o = Tables(spark, sf_dir).orders
    return o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "d_dow_profile",
    oracle="""
    SELECT CAST(dayofweek(ts) AS INT) AS dow,
           event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
    tags=("datetime", "agg"),
)
def d_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × event-type histogram (DuckDB dayofweek is 0=Sunday;
    Spark dayofweek is 1=Sunday — normalized to DuckDB's convention)."""
    ev = Tables(spark, sf_dir).events
    return ev.groupBy(
        (F.dayofweek("ts") - 1).cast("int").alias("dow"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "d_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL 6 HOUR, ts) AS win_start,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    """,
    tags=("datetime", "window-agg", "streaming-equivalent"),
)
def d_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6h event-time window — the batch equivalent of the
    streaming windowed agg in streaming/events.py (same F.window call
    works on readStream; watermark added there)."""
    ev = Tables(spark, sf_dir).events
    return ev.groupBy(F.window("ts", "6 hours").alias("w")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(F.col("w.start").alias("win_start"), "n", "total_value")


@query(
    "r_pivot_status_matrix",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("pivot", "agg"),
)
def r_pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: row-per-flag, column-per-linestatus count matrix.  Values
    are pinned (`pivot(col, values)`) so the plan is a single pass —
    an unpinned pivot needs an extra distinct-values job first."""
    li = Tables(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O"])
    )


@query(
    "r_unpivot_measures",
    oracle="""
    SELECT o_orderkey, 'totalprice' AS measure, round(o_totalprice, 2) AS value
    FROM orders WHERE o_orderkey < 500
    UNION ALL
    SELECT o_orderkey, 'custkey' AS measure, CAST(o_custkey AS DOUBLE) AS value
    FROM orders WHERE o_orderkey < 500
    """,
    tags=("unpivot",),
)
def r_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide measures to long (measure, value) rows."""
    o = Tables(spark, sf_dir).orders.where(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    ).unpivot("o_orderkey", ["totalprice", "custkey"], "measure", "value")


@query(
    "r_fuzzy_levenshtein",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM part a JOIN part b ON a.p_partkey < b.p_partkey
    WHERE a.p_partkey < 150 AND b.p_partkey < 150
      AND levenshtein(a.p_name, b.p_name) <= 4
    """,
    tags=("fuzzy", "dedup"),
)
def r_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy name matching via edit distance — the string-similarity
    complement to the token-based dedup family.  Scale path: length
    and prefix blocking before the pairwise distance; here the subset
    keeps the exact form oracle-checkable."""
    p = Tables(spark, sf_dir).part.where(F.col("p_partkey") < 150).select(
        "p_partkey", "p_name"
    )
    a = p.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"))
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
        .where(F.col("dist") <= 4)
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    SELECT c_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN big ON o_orderkey = big.l_orderkey
    """,
    tags=("agg", "having", "join"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate drives the join (the
    aggregate output is tiny, so it broadcasts into orders)."""
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 250)
        .select("l_orderkey")
    )
    return (
        t.orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey", "o_orderkey", "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


@query(
    "r_not_in_null_semantics",
    oracle="""
    WITH keys AS (
      SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS k
      FROM orders
    )
    SELECT
      CAST((SELECT count(*) FROM customer
            WHERE c_custkey NOT IN (SELECT k FROM keys)) AS BIGINT)
        AS n_not_in,
      CAST((SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM keys WHERE k = c.c_custkey))
        AS BIGINT) AS n_not_exists
    """,
    tags=("null-semantics", "subquery"),
)
def r_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap: one NULL in the subquery makes NOT IN
    return zero rows (three-valued logic), while NOT EXISTS ignores
    nulls — both engines must agree on both counts."""
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    t.customer.createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH keys AS (
          SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS k
          FROM orders
        )
        SELECT
          CAST((SELECT count(*) FROM customer
                WHERE c_custkey NOT IN (SELECT k FROM keys)) AS BIGINT)
            AS n_not_in,
          CAST((SELECT count(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM keys WHERE k = c.c_custkey))
            AS BIGINT) AS n_not_exists
        """
    )


@query(
    "r_array_agg_roundtrip",
    oracle="""
    SELECT n_nationkey,
           array_to_string(list_sort(list(c_custkey)), ',') AS custkeys,
           CAST(len(list(c_custkey)) AS INT) AS n
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    WHERE n_nationkey < 5
    GROUP BY n_nationkey
    """,
    tags=("array", "agg"),
)
def r_array_agg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect per-group keys into a sorted array
    (collect_list + sort_array vs DuckDB list + list_sort), then
    serialize to a comma-joined string — the nested-type aggregation
    surface.  The string form keeps the result hashable for the
    driver's value-hash (array-typed result columns are not)."""
    t = Tables(spark, sf_dir)
    return (
        t.nation.where(F.col("n_nationkey") < 5)
        .join(t.customer, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("c_custkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("custkeys"),
            F.size(F.collect_list("c_custkey")).cast("int").alias("n"),
        )
    )


@query(
    "r_null_safe_equality",
    oracle="""
    WITH p AS (
      SELECT p_partkey,
             CASE WHEN p_size % 7 = 0 THEN NULL ELSE p_brand END AS brand_a,
             CASE WHEN p_size % 5 = 0 THEN NULL ELSE p_brand END AS brand_b
      FROM part
    )
    SELECT CAST(sum(CASE WHEN brand_a IS NOT DISTINCT FROM brand_b
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe_eq,
           CAST(sum(CASE WHEN brand_a = brand_b THEN 1 ELSE 0 END) AS BIGINT)
             AS n_plain_eq,
           CAST(count(*) AS BIGINT) AS n
    FROM p
    """,
    tags=("null-semantics",),
)
def r_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM) vs plain = :
    the three-valued-logic corner every join-on-nullable-key hits."""
    p = Tables(spark, sf_dir).part
    withnulls = p.select(
        "p_partkey",
        F.when(F.col("p_size") % 7 == 0, None).otherwise(F.col("p_brand")).alias(
            "brand_a"
        ),
        F.when(F.col("p_size") % 5 == 0, None).otherwise(F.col("p_brand")).alias(
            "brand_b"
        ),
    )
    return withnulls.agg(
        F.sum(
            F.when(F.col("brand_a").eqNullSafe(F.col("brand_b")), 1).otherwise(0)
        ).cast("long").alias("n_null_safe_eq"),
        F.sum(
            F.when(F.col("brand_a") == F.col("brand_b"), 1).otherwise(0)
        ).cast("long").alias("n_plain_eq"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "d_sessionize_batch",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
    tags=("session", "window-agg"),
)
def d_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via F.session_window (30-minute gap),
    value-checked against the classic gaps-and-islands SQL: Spark's
    session end equals last event + gap, start equals first event.
    The same expression runs on readStream (streaming/events.py
    sessionize); this batch twin is what makes that path checkable."""
    ev = Tables(spark, sf_dir).events
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@query(
    "x_salted_aggregation",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "skew"),
)
def x_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation for skewed keys: stage 1 groups on
    (key, salt) — spreading a hot key over 16 reducers — stage 2 merges
    the partials.  Result is identical to the plain groupBy (the oracle
    IS the plain aggregation); the plan shape is what changes.  With
    only 5 event types and 100k+ rows, the plain plan would bottleneck
    on 5 reducers; salting engages all of them."""
    ev = Tables(spark, sf_dir).events
    salted = ev.withColumn("salt", (F.col("event_id") % 16).cast("int"))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("value").alias("pt"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pt"), 2).alias("total"),
    )


# ---------------------------------------------------------------------------
# Approximate aggregates (rows-only: approximations differ per engine)
# ---------------------------------------------------------------------------


@query(
    "x_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bounds,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("approx", "agg"),
)
def x_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type.  At 100 TB
    this replaces exact countDistinct's full shuffle with a fixed-size
    sketch merge; rsd=0.01 keeps the error ~1%.

    The sketch value is engine-specific, so the hash-matchable contract
    is a bounded-error boolean: |approx - exact| <= 3*rsd*exact (+5
    absolute slack for tiny groups) must hold, and the oracle asserts
    TRUE alongside the exact count it can compute itself."""
    ev = Tables(spark, sf_dir).events
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 3 * 0.01 * F.col("exact_users") + F.lit(5)
            ).alias("within_bounds"),
            "n",
        )
    )


@query(
    "x_approx_quantiles",
    oracle="""
    SELECT o_orderpriority,
           TRUE AS within_p50,
           TRUE AS within_p95,
           TRUE AS within_p99,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("approx", "agg"),
)
def x_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (GK-sketch) of order value per priority.

    The sketch output is engine-specific and array-typed — both fatal
    for the driver's value-hash — so the contract is rank-bounded
    booleans: each approximate percentile p must land between the exact
    percentiles at p±0.02 (accuracy=10000 gives rank error ~1e-4, so
    0.02 is a generous rail).  The oracle asserts TRUE per bound."""
    o = Tables(spark, sf_dir).orders
    agg = o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.95, 0.99], 10000).alias("pcts"),
        F.percentile(
            "o_totalprice", F.array(*[F.lit(x) for x in
                                      (0.48, 0.52, 0.93, 0.97, 0.97999, 1.0)])
        ).alias("exact"),
        F.count(F.lit(1)).alias("n"),
    )
    def _within(i: int, lo: int, hi: int):
        return (
            (F.col("pcts")[i] >= F.col("exact")[lo])
            & (F.col("pcts")[i] <= F.col("exact")[hi])
        )
    return agg.select(
        "o_orderpriority",
        _within(0, 0, 1).alias("within_p50"),
        _within(1, 2, 3).alias("within_p95"),
        _within(2, 4, 5).alias("within_p99"),
        "n",
    )


@query(
    "x_heavy_hitters_mg",
    oracle="""
    SELECT user_id AS key, n, rank FROM (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(row_number() OVER (ORDER BY count(*) DESC, user_id)
                  AS INT) AS rank
      FROM events GROUP BY user_id
    ) WHERE rank <= 10
    """,
    tags=("sketch", "heavy-hitters", "agg"),
)
def x_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed heavy hitters via Misra-Gries partition summaries
    (functions/sketches.py): bounded-memory candidates, then exact
    counts over candidates only.  m=512 clears the exactness bar
    (true k-th frequency > N/m), so the result equals the plain exact
    top-10 the oracle computes — while the plan's shuffle carries
    candidate keys, not the key universe, which is the whole point at
    a 100 TB key cardinality."""
    from map2db_spark.functions.sketches import heavy_hitters_topk

    ev = Tables(spark, sf_dir).events
    out = heavy_hitters_topk(ev, "user_id", k=10, m=512)
    return out.withColumn("rank", F.col("rank").cast("int"))
