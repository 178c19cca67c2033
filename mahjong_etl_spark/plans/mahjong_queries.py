"""Mahjong-plane queries exposed on the driver's query surface.

The driver's DuckDB oracle only has the synthetic star-schema tables,
so the mahjong ETL plane (reference parity proper) appears here as
rows-only queries: each runs the REAL pipeline — binaryFile scan →
mapInPandas parse → key minting → DataFrame joins — over the
checked-in XML fixtures, entirely in memory (no sink), and returns a
small deterministic result.  The full row-level parity against
reference semantics lives in tests/test_mahjong_*.py; these entries
make the plane visible (and runnable) through __spark_entry__.

``sf_dir`` is accepted for signature compatibility and ignored — the
input is the fixture log tree, pinned so results are stable across
scale factors and rounds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query

FIXTURE_LOGS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
    "logs",
)


def _tables(spark: SparkSession, *names: str) -> dict[str, DataFrame]:
    from .etl import _with_offsets, parse_logs, table_df

    parsed = parse_logs(spark, FIXTURE_LOGS).where(F.col("error").isNull())
    offsets = _with_offsets(parsed)
    return {n: table_df(parsed, offsets, n) for n in names}


@query("mahjong_er_join_graph", oracle=None, bench=False)
def mahjong_er_join_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ER join graph end-to-end: games ⋈ kyokus ⋈ haipais with
    per-date grains — the reference's core Athena query shape."""
    t = _tables(spark, "games", "kyokus", "haipais")
    g, k, h = t["games"], t["kyokus"], t["haipais"]
    return (
        k.join(g.select(F.col("id").alias("gid"), "started_at"), k.game_id == F.col("gid"))
        .join(h, h.kyoku_id == k.id)
        .groupBy(k.dt)
        .agg(
            F.countDistinct("game_id").alias("n_games"),
            F.countDistinct(k.id).alias("n_kyokus"),
            F.count(F.lit(1)).alias("n_haipai_rows"),
        )
        .orderBy("dt")
    )


@query("mahjong_agari_yaku_stats", oracle=None, bench=False)
def mahjong_agari_yaku_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-of-struct UNNEST over agaris.yaku (the per-yaku stats
    idiom the star schema was designed for)."""
    t = _tables(spark, "agaris")
    return (
        t["agaris"]
        .select("kyoku_id", "han", "fu", F.explode("yaku").alias("y"))
        .groupBy(F.col("y.name").alias("yaku_name"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y.han").alias("total_han"),
        )
        .orderBy("yaku_name")
    )


@query("mahjong_action_sequences", oracle=None, bench=False)
def mahjong_action_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-event analytics over actions.seq: per (kyoku, player)
    draw/discard counts and the max turn number."""
    t = _tables(spark, "actions")
    return (
        t["actions"]
        .groupBy("kyoku_id", "player_index")
        .agg(
            F.count(F.lit(1)).alias("n_actions"),
            F.sum(F.when(F.col("type").startswith("tsumo"), 1).otherwise(0)).alias("n_draws"),
            F.sum(F.when(F.col("type") == "sutehai", 1).otherwise(0)).alias("n_discards"),
            F.max("seq").alias("last_seq"),
        )
        .orderBy("kyoku_id", "player_index")
    )


@query("mahjong_paiyama_walls", oracle=None, bench=False)
def mahjong_paiyama_walls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded synthetic walls: every wall must be a permutation of
    0..135 and ids disjoint from (but joinable to) real kyoku ids."""
    import datetime

    from ..sources.paiyama import wall_df

    walls = wall_df(spark, 64, datetime.date(2024, 1, 2), seed=7)
    is_perm = F.expr(
        "array_sort(pai_ids) = transform(sequence(0,135), x -> cast(x AS long))"
    )
    return walls.agg(
        F.count(F.lit(1)).alias("n_walls"),
        F.sum(F.when(is_perm, 1).otherwise(0)).alias("n_valid_perms"),
        F.countDistinct("id").alias("n_distinct_ids"),
        F.min("id").alias("min_id"),
    )
