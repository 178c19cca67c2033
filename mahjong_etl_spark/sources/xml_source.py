"""Tenhou log-directory scan: ``logs/YYYYMMDD/{game_id}.xml`` files.

The reference walks the directory tree single-threaded (reference
main.py:18-31).  Here the listing is a Spark ``binaryFile`` scan —
distributed, with pushdown of the filename glob — and the partition
date + game id are derived from the path, so the unit of parallelism
is the XML file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_logs(spark: SparkSession, log_dir: str) -> DataFrame:
    """(path, content, dt_raw, game_id) for every ``*/YYYYMMDD/*.xml``."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xml")
        .option("recursiveFileLookup", "true")
        .load(log_dir)
    )
    dt_raw = F.regexp_extract(F.col("path"), r"/(\d{8})/[^/]*$", 1)
    game_id = F.regexp_extract(F.col("path"), r"/([^/]+)\.xml$", 1)
    return (
        raw.select(
            "path",
            "content",
            dt_raw.alias("dt_raw"),
            game_id.alias("game_id"),
        )
        .where(F.col("dt_raw") != "")
    )
