"""End-to-end ETL golden test: fixture logs -> Spark pipeline ->
partitioned parquet -> row-for-row parity with the reference parser,
plus layout/pruning and paiyama property checks."""

from __future__ import annotations

import datetime
import glob
import math
import os
from decimal import Decimal

import pytest

from mahjong_etl_spark.plans.catalog import register_tables
from mahjong_etl_spark.plans.etl import run_etl
from mahjong_etl_spark.sources.paiyama import wall_df

from .reference_oracle import run_reference_date
from .test_mahjong_parser import FIXTURE_ROOT, _fixture_files

DATES = ["20240102", "20240103"]


@pytest.fixture(scope="module")
def etl_out(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mahjong_out"))
    counts = run_etl(spark, FIXTURE_ROOT, out)
    return out, counts


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 9) if not math.isnan(v) else "NaN"
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)[:10]
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _rowset(rows: list[dict]) -> set:
    out = set()
    for r in rows:
        out.add(tuple(sorted((k, _norm(v)) for k, v in r.items())))
    return out


def test_etl_output_matches_reference(spark, etl_out):
    out, _ = etl_out
    expected: dict[str, list[dict]] = {}
    for dt_dir in DATES:
        ref_rows = run_reference_date(_fixture_files(dt_dir), dt_dir)
        for t, rows in ref_rows.items():
            expected.setdefault(t, []).extend(rows)
    for table, exp_rows in expected.items():
        df = spark.read.parquet(f"{out}/{table}").drop("dt")
        # Row.asDict(recursive=True) keeps nested structs comparable
        act_rows = [r.asDict(recursive=True) for r in df.collect()]
        assert _rowset(act_rows) == _rowset(exp_rows), f"{table} differs"


def test_partition_layout_and_pruning(spark, etl_out):
    out, counts = etl_out
    # Hive layout contract: {table}/dt=YYYY-MM-DD/
    assert glob.glob(f"{out}/kyokus/dt=2024-01-02/*.parquet")
    assert glob.glob(f"{out}/kyokus/dt=2024-01-03/*.parquet")
    assert counts["games"] == 4 and counts["kyokus"] == 5
    registered = register_tables(spark, out)
    assert "games_wide" in registered
    # dt filter must prune partitions at scan time
    plan = (
        spark.sql("SELECT count(*) FROM kyokus WHERE dt = '2024-01-02'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "2024-01-02" in plan

    # the ER join graph runs end-to-end through SQL
    n = spark.sql(
        """
        SELECT count(*) AS n FROM kyokus k
        JOIN games g ON k.game_id = g.id
        JOIN haipais h ON h.kyoku_id = k.id
        WHERE k.dt = '2024-01-02'
        """
    ).collect()[0]["n"]
    assert n == 12  # 3 kyokus x 4 seats on that date


def test_games_wide_view(spark, etl_out):
    out, _ = etl_out
    register_tables(spark, out)
    rows = {
        r["id"]: r
        for r in spark.sql(
            "SELECT id, is_sanma, has_aka, level FROM games_wide"
        ).collect()
    }
    assert rows["g4sanma"]["is_sanma"] is True
    assert rows["g2melds"]["has_aka"] is True
    assert rows["g1minimal"]["level"] == 3  # GO type 169: bits 5+7 set


def test_paiyama_walls_are_permutations(spark):
    df = wall_df(spark, 64, datetime.date(2024, 1, 2), seed=7)
    from pyspark.sql import functions as F

    bad = df.where(
        F.array_sort("pai_ids") != F.sequence(F.lit(0), F.lit(135)).cast("array<long>")
    ).count()
    assert bad == 0
    ids = [r.id for r in df.select("id").collect()]
    assert len(set(ids)) == 64
    assert min(ids) == 900_000_000_000 + 19724 * 100000
    # seeded determinism + distinct walls
    again = wall_df(spark, 64, datetime.date(2024, 1, 2), seed=7)
    assert [r.pai_ids for r in df.orderBy("id").limit(2).collect()] == [
        r.pai_ids for r in again.orderBy("id").limit(2).collect()
    ]
    w0, w1 = [r.pai_ids for r in df.orderBy("id").limit(2).collect()]
    assert w0 != w1
