"""AQE skew-join proof: the session's adaptive config must actually
split a skewed shuffle partition — SCALE.md's first line of skew
defense, demonstrated rather than asserted.

salted_join (functions/skew.py) is the second, explicit line; this
test pins the implicit one: with skewJoin enabled, a sort-merge join
whose build of one key dwarfs the rest gets its oversized partition
split (the physical plan marks the SMJ with ``skew=true``), so one hot
key no longer serializes onto one task at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SKEW_CONFS = {
    # shrink the thresholds so test-scale data qualifies as "skewed"
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    # keep the join a sort-merge join (skew splitting targets SMJ)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def test_aqe_splits_skewed_partition(spark):
    saved = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    try:
        for k, v in SKEW_CONFS.items():
            spark.conf.set(k, v)
        # 95% of the left rows share one key; right side is uniform
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("w")
        )
        joined = left.join(right, "k")
        # execute THIS DataFrame so its query execution carries the
        # FINAL adaptive plan (pre-execution the plan is the static SMJ)
        rows = joined.collect()
        # correctness first: key 7 matches all 190k hot rows, the
        # multiple-of-20 ids < 1000 match 1 each
        assert len(rows) > 190_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
