"""Streaming ETL must converge to the batch ETL's exact output —
all 9 tables, minted ids included — across chopped arrivals."""

from __future__ import annotations

import glob
import os
import shutil
import time

from mahjong_etl_spark.plans.mahjong_queries import FIXTURE_LOGS
from mahjong_etl_spark.schemas import TABLE_SCHEMAS
from mahjong_etl_spark.streaming.etl_stream import run_etl_stream


from .helpers import canon as _canon


def test_stream_etl_converges_to_batch_etl(spark, tmp_path):
    src_files = sorted(glob.glob(os.path.join(FIXTURE_LOGS, "*", "*.xml")))
    logs = tmp_path / "logs"
    out = str(tmp_path / "out_stream")
    ckpt = str(tmp_path / "ckpt")

    def arrive(files):
        for f in files:
            d = logs / os.path.basename(os.path.dirname(f))
            d.mkdir(parents=True, exist_ok=True)
            shutil.copy(f, d / os.path.basename(f))

    def drain():
        q = run_etl_stream(spark, str(logs), out, ckpt)
        q.awaitTermination(180)
        q.stop()
        time.sleep(0.2)

    half = max(1, len(src_files) // 2)
    arrive(src_files[:half])
    drain()
    arrive(src_files[half:])
    drain()

    from mahjong_etl_spark.plans.etl import run_etl

    out_batch = str(tmp_path / "out_batch")
    run_etl(spark, str(logs), out_batch)

    for t in TABLE_SCHEMAS:
        streamed = spark.read.parquet(f"{out}/{t}")
        batch = spark.read.parquet(f"{out_batch}/{t}")
        assert _canon(streamed) == _canon(batch), f"table {t} diverged"


def test_cli_stream_drains_available(tmp_path):
    from mahjong_etl_spark.cli import main

    src_files = sorted(glob.glob(os.path.join(FIXTURE_LOGS, "*", "*.xml")))[:2]
    logs = tmp_path / "logs"
    for f in src_files:
        d = logs / os.path.basename(os.path.dirname(f))
        d.mkdir(parents=True, exist_ok=True)
        shutil.copy(f, d / os.path.basename(f))
    out = str(tmp_path / "out")
    rc = main(
        [
            "stream",
            "-L",
            str(logs),
            "-O",
            out,
            "-C",
            str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 0
    from mahjong_etl_spark.session import get_spark

    spark = get_spark("cli-stream-check")
    assert spark.read.parquet(f"{out}/games").count() == len(src_files)
