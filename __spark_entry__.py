"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries are declared in map2db_spark.registry; this module is a
thin adapter so the declaration and the check never drift apart.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _nanos_as_long(spark: SparkSession) -> None:
    # Some testdata generations store events.ts as TIMESTAMP(NANOS); the
    # driver's session may not have the legacy flag set, so set it here
    # (runtime-settable SQL conf).  tables.load branches on the loaded
    # dtype, so this is harmless for TIMESTAMP(MICROS) generations.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Parquet timestamps are timezone-naive; DuckDB reads them verbatim.
    # Pin the Spark session to UTC so both engines render identical values.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Ship the package to executor Python workers: queries with Arrow
    # kernels (mapInPandas/applyInPandas) unpickle references to
    # map2db_spark on the worker side, and the harness's session may not
    # have this repo on the workers' sys.path.
    from map2db_spark.session import ship_package

    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _nanos_as_long(spark)
    from map2db_spark.registry import all_queries

    return all_queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from map2db_spark.registry import all_queries

    wrapped = {}
    for name, fn in all_queries().items():

        def _mk(f):
            def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
                _nanos_as_long(spark)
                return f(spark, sf_dir)

            return _q

        wrapped[name] = _mk(fn)
    return wrapped


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops -> rows-only check)."""
    from map2db_spark.registry import all_oracles

    return all_oracles()
