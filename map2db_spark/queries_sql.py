"""Spark SQL surface: the engine's tables exposed through
``spark.sql`` with correlated and scalar subqueries — the query shapes
the DataFrame API expresses awkwardly.  Also the vectorized
(Arrow/pandas) UDF surface with an oracle-checked example.

The reference IS one big UDF over bytes (SURVEY §2.5); here the UDF
surface is exposed the way a Spark user consumes it: `@pandas_udf`
registered and called inside SQL/DataFrame expressions, batched via
Arrow — never row-at-a-time Python.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from map2db_spark.registry import query
from map2db_spark.tables import Tables


def _register(spark: SparkSession, sf_dir: str, *names: str) -> None:
    t = Tables(spark, sf_dir)
    for n in names:
        getattr(t, n).createOrReplaceTempView(n)


@query(
    "sql_exists_correlated",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("sql", "subquery"),
)
def sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS decorrelated by Catalyst into
    a left-semi join (check: no per-row subquery execution)."""
    _register(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@query(
    "sql_scalar_subquery",
    oracle="""
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n_expensive
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) * 1.2 FROM part)
    GROUP BY p_brand
    """,
    tags=("sql", "subquery"),
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (parts priced >1.2x the mean):
    planned as a one-row broadcast, not a cross join."""
    _register(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n_expensive
        FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) * 1.2 FROM part)
        GROUP BY p_brand
        """
    )


@query(
    "sql_correlated_scalar",
    oracle="""
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
      AND c_custkey < 300
    """,
    tags=("sql", "subquery"),
)
def sql_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (above own nation's average balance):
    Catalyst rewrites it to an aggregate + join on the correlation key."""
    _register(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
          AND c_custkey < 300
        """
    )


@query(
    "sql_registered_udf",
    oracle="""
    WITH pts AS (
      SELECT user_id,
             CAST((user_id % 180) - 90 AS DOUBLE) * 0.9 AS lat,
             CAST((user_id % 360) - 180 AS DOUBLE) * 0.9 AS lon
      FROM (SELECT DISTINCT user_id FROM events) WHERE user_id < 50
    )
    SELECT user_id,
           round(2 * 6371.0 * asin(sqrt(
             pow(sin(radians(0.0 - lat) / 2), 2)
             + cos(radians(lat)) * cos(radians(0.0))
               * pow(sin(radians(0.0 - lon) / 2), 2)
           )), 4) AS km
    FROM pts
    """,
    tags=("sql", "udf"),
)
def sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's kernels registered for SQL callers: the same
    Arrow-batched haversine invoked from SQL text."""
    from map2db_spark.functions.register import register_engine_udfs

    register_engine_udfs(spark)
    _register(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH pts AS (
          SELECT user_id,
                 CAST((user_id % 180) - 90 AS DOUBLE) * 0.9 AS lat,
                 CAST((user_id % 360) - 180 AS DOUBLE) * 0.9 AS lon
          FROM (SELECT DISTINCT user_id FROM events) WHERE user_id < 50
        )
        SELECT user_id,
               round(m2db_haversine_km(lat, lon, 0.0d, 0.0d), 4) AS km
        FROM pts
        """
    )


_RECURSIVE_SQL = """
WITH RECURSIVE walk(start, node, depth) AS (
  SELECT user_id AS start, user_id AS node, 0 AS depth
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 20)
  UNION ALL
  SELECT start, CAST(floor(node / 2) AS INT) AS node, depth + 1
  FROM walk WHERE node > 0
)
SELECT CAST(start AS BIGINT) AS start, CAST(node AS BIGINT) AS node,
       CAST(depth AS INT) AS depth
FROM walk
"""


@query(
    "sql_recursive_cte",
    oracle=_RECURSIVE_SQL,
    tags=("sql", "recursive"),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4+): walk each user id up a binary-tree
    parent chain (node -> floor(node/2)) to the root — iterative
    graph traversal expressed declaratively, identical SQL on both
    engines."""
    _register(spark, sf_dir, "events")
    return spark.sql(_RECURSIVE_SQL)


@query(
    "sql_min_cost_supplier",
    oracle="""
    SELECT p.p_partkey, s.s_suppkey, round(s.s_acctbal, 2) AS s_acctbal
    FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_size < 5
      AND l.l_extendedprice = (
        SELECT min(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey)
    GROUP BY 1, 2, 3
    """,
    tags=("sql", "subquery"),
)
def sql_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated min over another table selects the
    cheapest supplier per small part.  Catalyst decorrelates into an
    aggregate join; the GROUP BY collapses ties from multiple lineitems
    at the minimum price."""
    _register(spark, sf_dir, "part", "lineitem", "supplier")
    return spark.sql(
        """
        SELECT p.p_partkey, s.s_suppkey, round(s.s_acctbal, 2) AS s_acctbal
        FROM part p
          JOIN lineitem l ON l.l_partkey = p.p_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE p.p_size < 5
          AND l.l_extendedprice = (
            SELECT min(l2.l_extendedprice) FROM lineitem l2
            WHERE l2.l_partkey = p.p_partkey)
        GROUP BY 1, 2, 3
        """
    )


@pandas_udf(DoubleType())
def haversine_km(
    lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series
) -> pd.Series:
    """Arrow-vectorized great-circle distance (NumPy over the whole
    batch — the pattern every Python kernel in this engine follows)."""
    import numpy as np

    r = 6371.0
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return pd.Series(2 * r * np.arcsin(np.sqrt(a)))


@query(
    "u_pandas_udf_haversine",
    oracle="""
    WITH pts AS (
      SELECT user_id,
             CAST((user_id % 180) - 90 AS DOUBLE) * 0.9 AS lat,
             CAST((user_id % 360) - 180 AS DOUBLE) * 0.9 AS lon
      FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT user_id,
           round(2 * 6371.0 * asin(sqrt(
             pow(sin(radians(0.0 - lat) / 2), 2)
             + cos(radians(lat)) * cos(radians(0.0))
               * pow(sin(radians(0.0 - lon) / 2), 2)
           )), 4) AS km_to_origin
    FROM pts
    """,
    tags=("udf", "pandas"),
)
def u_pandas_udf_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF checked value-for-value against the SQL
    trig reimplementation (identical IEEE ops -> identical doubles
    after rounding)."""
    ev = Tables(spark, sf_dir).events
    pts = ev.select("user_id").distinct().select(
        "user_id",
        (((F.col("user_id") % 180) - 90).cast("double") * 0.9).alias("lat"),
        (((F.col("user_id") % 360) - 180).cast("double") * 0.9).alias("lon"),
    )
    return pts.select(
        "user_id",
        F.round(
            haversine_km(F.col("lat"), F.col("lon"), F.lit(0.0), F.lit(0.0)), 4
        ).alias("km_to_origin"),
    )


@query(
    "sql_except_intersect_all",
    oracle="""
    WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
    recent AS (SELECT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
    SELECT 'except_all' AS op, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM (SELECT o_custkey FROM hi EXCEPT ALL SELECT o_custkey FROM recent)
    UNION ALL
    SELECT 'intersect_all', CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT)
    FROM (SELECT o_custkey FROM hi INTERSECT ALL SELECT o_custkey FROM recent)
    """,
    tags=("sql", "set-ops"),
)
def sql_except_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set operations (EXCEPT ALL / INTERSECT ALL):
    unlike the DISTINCT forms (set_except / set_intersect), the ALL
    variants preserve multiplicity — a customer with 3 high-value
    orders and 1 recent order survives EXCEPT ALL twice — which is
    the semantics you need when rows represent occurrences, not
    membership.  Both engines implement multiset difference per the
    SQL standard (min/max multiplicity rules), so the counts check
    the semantics exactly.

    Scale: Spark plans both as a single aggregate-style shuffle on
    the compared columns (count per side, emit the multiplicity
    difference) — no pairwise matching, no sort.
    """
    _register(spark, sf_dir, "orders")
    return spark.sql("""
        WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
        recent AS (SELECT o_custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
        SELECT 'except_all' AS op, CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
        FROM (SELECT o_custkey FROM hi EXCEPT ALL SELECT o_custkey FROM recent)
        UNION ALL
        SELECT 'intersect_all', CAST(count(*) AS BIGINT),
               CAST(count(DISTINCT o_custkey) AS BIGINT)
        FROM (SELECT o_custkey FROM hi INTERSECT ALL
              SELECT o_custkey FROM recent)
    """)
