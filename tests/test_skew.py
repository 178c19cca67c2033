"""salted_join must be semantics-preserving and actually spread hot keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from mahjong_etl_spark.functions.skew import salted_join


def _skewed_frames(spark):
    # 10k rows, 90% on key 0 — the pathological shuffle-join shape
    big = spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    return big, small


def test_salted_join_matches_plain_join(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, "k", num_salts=8).select("k", "payload", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, "k", "left").select("k", "payload", "name")
    salted = salted_join(big, small, "k", num_salts=4, how="left").select(
        "k", "payload", "name"
    )
    assert sorted(map(tuple, plain.collect()), key=str) == sorted(
        map(tuple, salted.collect()), key=str
    )


def test_salt_actually_spreads_hot_key(spark):
    big, _ = _skewed_frames(spark)
    salted = big.withColumn(
        "salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
    )
    spread = (
        salted.where(F.col("k") == 0).groupBy("salt").count().collect()
    )
    # the hot key's rows land on every salt, none holding > 1/4 of them
    assert len(spread) == 8
    assert max(r["count"] for r in spread) < 9000 / 4


def test_salt_deterministic_across_recompute(spark):
    big, _ = _skewed_frames(spark)
    salted = big.withColumn(
        "salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
    )
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, salted.collect()))  # recompute, no cache
    assert a == b


def test_salted_join_rejects_outer(spark):
    import pytest

    big, small = _skewed_frames(spark)
    # Replicating the small side num_salts times would surface every
    # unmatched small-side row as num_salts null-extended duplicates.
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, "k", how=how)


def test_aqe_splits_skewed_sort_merge_join(spark):
    """SCALE.md's first line of skew defense is AQE's skew-join split
    (salting is the explicit second line).  Pin that it actually fires:
    a sort-merge join with one pathological key must show skew=n in
    the adaptive final plan once the skewed partition crosses the
    (test-lowered) threshold."""
    saved = {
        k: spark.conf.get(k, None)
        for k in [
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        ]
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512KB")
        # force SMJ: no broadcast at any size
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        big = spark.range(300_000).select(
            F.when(F.col("id") % 10 < 9, 0)
            .otherwise(F.col("id") % 64)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id")).alias("payload"),
        )
        right = spark.range(64).select(
            F.col("id").alias("k"), F.lit("dim").alias("name")
        )
        df = big.join(right, "k").select("k", "payload", "name")
        # execute df's own plan so ITS AdaptiveSparkPlan finalizes —
        # count() would plan a separate query and leave this one
        # isFinalPlan=false with no skew annotation
        assert len(df.collect()) == 300_000
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=" in plan, f"AQE skew split did not fire:\n{plan[:2000]}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
