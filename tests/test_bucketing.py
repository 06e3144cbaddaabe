"""Bucketed co-located join: pre-bucketing both sides on the join key
removes the exchange from every subsequent join — the standing
infrastructure move for repeated large-table joins at 100 TB
(SURVEY §4 physical-execution notes)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # session warehouse dir is fixed at session start; use a dedicated
    # database with explicit paths via saveAsTable default location
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketing_test")
    yield "bucketing_test"
    spark.sql("DROP DATABASE IF EXISTS bucketing_test CASCADE")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, warehouse):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(f"{warehouse}.li_bucketed")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(f"{warehouse}.orders_bucketed")
    )
    # disable broadcast so the join must choose a distribution
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lb = spark.table(f"{warehouse}.li_bucketed")
        ob = spark.table(f"{warehouse}.orders_bucketed")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = _plan(joined)
        join_section = plan.split("HashAggregate")[0]
        # co-located: SortMergeJoin with NO Exchange feeding it
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in join_section
        assert "Exchange hashpartitioning(o_orderkey" not in join_section
        # and the result is still right
        n = joined.agg(F.sum("n")).collect()[0][0]
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
