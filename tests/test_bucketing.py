"""Bucketed layout: joins and aggregations on the bucket key run with NO
shuffle Exchange — the write-once-shuffle-never pattern for 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def bucketed(spark):
    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.sources.writers import write_bucketed

    li = load_table(spark, SF_ORACLE, "lineitem")
    o = load_table(spark, SF_ORACLE, "orders")
    write_bucketed(li.select("l_orderkey", "l_quantity", "l_extendedprice"),
                   "li_bucketed", "l_orderkey", 8)
    write_bucketed(o.select("o_orderkey", "o_totalprice", "o_orderpriority"),
                   "o_bucketed", "o_orderkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_exchange(spark, bucketed):
    li = spark.table("li_bucketed")
    o = spark.table("o_bucketed")
    # force a shuffle-based join path (no broadcast) to expose exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = _plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert joined.count() > 0

        # same join WITHOUT bucketing shuffles both sides
        from azure_serverless_etl_pipeline_spark.sources import load_table

        li_raw = load_table(spark, SF_ORACLE, "lineitem")
        o_raw = load_table(spark, SF_ORACLE, "orders")
        raw_plan = _plan(li_raw.join(o_raw, li_raw.l_orderkey == o_raw.o_orderkey))
        assert "Exchange hashpartitioning" in raw_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_agg_no_exchange(spark, bucketed):
    li = spark.table("li_bucketed")
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert "Exchange hashpartitioning" not in _plan(agg)
    # results identical to the unbucketed aggregation
    from azure_serverless_etl_pipeline_spark.sources import load_table

    raw = (
        load_table(spark, SF_ORACLE, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    a = agg.toPandas().sort_values("l_orderkey", ignore_index=True)
    b = raw.toPandas().sort_values("l_orderkey", ignore_index=True)
    assert a.equals(b)
