"""Synthetic tile-wall (paiyama) generator — the reference's
random_pailist.py re-expressed as a spark.range pipeline.

Differences by design:
- Deterministic: the reference shuffles with an unseeded numpy RNG
  (random_pailist.py:12-16), so its output is irreproducible.  Here
  each wall is the 0..135 sequence sorted by xxhash64(wall_id, pos,
  seed) — a seeded Fisher-Yates-equivalent permutation computed
  entirely JVM-side, identical on any cluster size.
- No dropped remainder: the reference silently discards N % batch_size
  rows (random_pailist.py:35); spark.range(n) generates exactly n.

Id space preserved: id = 900_000_000_000 + days_since_epoch*100000 +
ordinal (random_pailist.py:31, 45) — disjoint from real kyoku ids but
joinable to kyokus.id.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EPOCH = datetime.date(1970, 1, 1)
ID_OFFSET = 900_000_000_000


def wall_df(
    spark: SparkSession, n: int, dt: datetime.date, seed: int = 0
) -> DataFrame:
    days = (dt - _EPOCH).days
    base = ID_OFFSET + days * 100000
    perm = F.expr(
        f"transform(array_sort(transform(sequence(0, 135),"
        f" t -> struct(xxhash64(id, t, {seed}) AS k, t AS t))),"
        f" s -> cast(s.t AS long))"
    )
    return spark.range(n).select(
        (F.lit(base) + F.col("id")).alias("id"),
        perm.alias("pai_ids"),
        F.lit(dt.isoformat()).alias("dt"),
    )


def write_walls(
    spark: SparkSession,
    n: int,
    dt: datetime.date,
    out_dir: str,
    seed: int = 0,
) -> None:
    wall_df(spark, n, dt, seed).write.mode("overwrite").partitionBy("dt").parquet(
        f"{out_dir}/paiyamas"
    )
