"""Binned time-window join: exact semantics + equi-join plan shape."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mahjong_etl_spark.operators.rangejoin import time_window_join


def _ts(minute: int, second: int = 0):
    return datetime.datetime(2024, 1, 1, 12, minute, second)


def test_window_semantics_and_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 1001, _ts(30))], "user_id long, purchase_id long, p_ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, 1, _ts(30)),        # == p_ts -> inclusive end, in
            (1, 2, _ts(0)),         # 30 min before, in
            (2, 3, _ts(29)),        # other user, out
            (1, 4, _ts(31)),        # after purchase, out
        ],
        "user_id long, view_id long, v_ts timestamp",
    )
    got = time_window_join(
        left, right, ["user_id"], "p_ts", "v_ts", window_seconds=3600
    ).select("purchase_id", "view_id")
    assert sorted((r.purchase_id, r.view_id) for r in got.collect()) == [(1001, 1), (1001, 2)]
    # exclusive start: exactly window_seconds before the point is out
    start_edge = spark.createDataFrame(
        [(1, 9, _ts(30) - datetime.timedelta(seconds=3600))],
        "user_id long, view_id long, v_ts timestamp",
    )
    got2 = time_window_join(left, start_edge, ["user_id"], "p_ts", "v_ts", 3600)
    assert got2.count() == 0


def test_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 1001, _ts(30)), (2, 1002, _ts(30))],
        "user_id long, purchase_id long, p_ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 1, _ts(29))], "user_id long, view_id long, v_ts timestamp"
    )
    got = (
        time_window_join(left, right, ["user_id"], "p_ts", "v_ts", 3600, how="left")
        .groupBy("purchase_id")
        .agg(F.count("view_id").alias("n"))
    )
    assert {(r.purchase_id, r.n) for r in got.collect()} == {(1001, 1), (1002, 0)}


def test_property_matches_naive_join(spark):
    """Binned join == naive cross-join + filter on pseudo-random data
    spanning many bin boundaries (deterministic generation, no seed to
    ship — the point is coverage of edge alignments, not randomness)."""
    rows_l, rows_r = [], []
    for i in range(80):
        u = i % 5
        # timestamps scattered across +/- bin edges (3600s bins)
        t = (i * 977) % 14400
        rows_l.append((u, 1000 + i, _ts(0) + datetime.timedelta(seconds=t)))
        rows_r.append((u, i, _ts(0) + datetime.timedelta(seconds=(t * 7 + i * 13) % 14400)))
    left = spark.createDataFrame(rows_l, "user_id long, purchase_id long, p_ts timestamp")
    right = spark.createDataFrame(rows_r, "user_id long, view_id long, v_ts timestamp")
    got = {
        (r.purchase_id, r.view_id)
        for r in time_window_join(
            left, right, ["user_id"], "p_ts", "v_ts", 3600
        ).collect()
    }
    naive = {
        (r.purchase_id, r.view_id)
        for r in left.withColumnRenamed("user_id", "lu")
        .crossJoin(right)
        .where(
            (F.col("lu") == F.col("user_id"))
            & (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 3600 SECONDS"))
            & (F.col("v_ts") <= F.col("p_ts"))
        )
        .collect()
    }
    assert got == naive and len(naive) > 0


def test_plan_is_equi_join(spark):
    left = spark.range(10).select(
        F.col("id").alias("user_id"),
        F.col("id").alias("purchase_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("p_ts"),
    )
    right = spark.range(100).select(
        (F.col("id") % 10).alias("user_id"),
        F.col("id").alias("view_id"),
        F.timestamp_seconds(F.col("id")).alias("v_ts"),
    )
    plan = (
        time_window_join(left, right, ["user_id"], "p_ts", "v_ts", 3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan, plan
    assert "Cartesian" not in plan, plan
