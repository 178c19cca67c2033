"""Exact distributed percent_rank (functions/ranks.py) must equal the
single-window form bit-for-bit, ties and all."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mahjong_etl_spark.functions.ranks import (
    with_percent_rank,
    with_value_percent_rank,
)
from mahjong_etl_spark.sources.tables import load


def _naive(df, col):
    pr = F.percent_rank().over(Window.orderBy(col))
    return df.select(F.col(col).alias("v"), pr.alias("pr"))


def test_matches_single_window_with_ties(spark):
    # heavy ties: values 0..9 repeated, shuffled input order
    rows = [(i % 10,) for i in range(1000)]
    df = spark.createDataFrame(rows, ["x"]).repartition(13)
    got = sorted(
        (r.x, r.pr) for r in with_percent_rank(df, "x", "pr").collect()
    )
    want = sorted((r.v, r.pr) for r in _naive(df, "x").collect())
    assert got == want  # exact doubles, not approximate


def test_matches_on_lineitem(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_extendedprice")
    got = sorted(
        (r.l_extendedprice, r.pr)
        for r in with_percent_rank(li, "l_extendedprice", "pr").collect()
    )
    want = sorted((r.v, r.pr) for r in _naive(li, "l_extendedprice").collect())
    assert got == want


def test_partitioning_invariant(spark):
    rows = [((i * 37) % 101,) for i in range(500)]
    df = spark.createDataFrame(rows, ["x"])
    a = sorted(
        (r.x, r.pr)
        for r in with_percent_rank(df.repartition(3), "x", "pr").collect()
    )
    b = sorted(
        (r.x, r.pr)
        for r in with_percent_rank(
            df.repartition(17), "x", "pr", num_partitions=5
        ).collect()
    )
    assert a == b


def test_degenerate_sizes(spark):
    one = spark.createDataFrame([(42,)], ["x"])
    assert with_percent_rank(one, "x", "pr").collect()[0].pr == 0.0


def test_value_weighted_matches_row_level(spark):
    """The r14 value-count form must assign every distinct value the
    exact pr its member rows get from the single-window row-level
    form (ties share the min rank — the aggregated relation carries
    the group rank exactly)."""
    rows = [((i * 7) % 23,) for i in range(911)]  # ragged tie groups
    df = spark.createDataFrame(rows, ["x"]).repartition(11)
    vc = df.groupBy("x").agg(F.count(F.lit(1)).alias("cnt"))
    got = sorted(
        (r.x, r.pr)
        for r in with_value_percent_rank(vc, "x", "cnt", "pr").collect()
    )
    want = sorted(
        {(r.v, r.pr) for r in _naive(df, "x").collect()}
    )  # one entry per distinct value: ties share one pr
    assert got == want
    # degenerate: one value, one row -> pr 0.0
    one = spark.createDataFrame([(42, 1)], ["x", "cnt"])
    assert (
        with_value_percent_rank(one, "x", "cnt", "pr").collect()[0].pr == 0.0
    )
