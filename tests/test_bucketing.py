"""Bucketed co-located joins: correct results, zero exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mahjong_etl_spark.plans.bucketing import (
    colocated_join,
    verify_colocated,
    write_bucketed,
)
from mahjong_etl_spark.sources.tables import load


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    write_bucketed(o, "orders_b", "o_orderkey", num_buckets=8)
    write_bucketed(
        l, "lineitem_b", "l_orderkey", num_buckets=8, sorted_by="l_orderkey"
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_is_shuffle_free(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(lt).join(
            spark.table(ot),
            spark.table(lt).l_orderkey == spark.table(ot).o_orderkey,
        )
        joined.collect()
        verify_colocated(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    plain = (
        load(spark, sf_dir, "lineitem")
        .join(load(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    bucketed = (
        spark.table(lt)
        .join(spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, bucketed.collect()))


def test_bucketed_groupby_key_reuses_layout(spark, bucketed_tables):
    """Aggregating on the bucket key must also be exchange-free."""
    _, lt = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
