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


def scan_logs(
    spark: SparkSession, log_dir: str, date_prefix: str | None = None
) -> DataFrame:
    """(path, content, dt_raw, game_id) for every ``*/YYYYMMDD/*.xml``.

    ``date_prefix`` scopes the scan to matching date DIRECTORIES at
    the listing level (``YYYYMMDD`` one day, ``YYYYMM`` a month,
    ``YYYY`` a year — the reference CLI's ``-d`` semantics,
    extractor.py:94-107): the glob is expanded before any file is
    listed, so a one-day incremental run over years of history never
    touches the other directories' metadata — at 100 TB the listing
    itself is the cost that matters.  No matching directory raises
    (loudly — a typo'd date must not succeed as an empty run).
    """
    path = log_dir if date_prefix is None else f"{log_dir}/{date_prefix}*"
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xml")
        .option("recursiveFileLookup", "true")
        .load(path)
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
