"""Partition compaction — the small-files answer at 100 TB.

The reference writes ONE file per table per date (reference
scrape.py:623-660) — a single-writer bottleneck at scale.  This
engine writes as many part files per ``dt=`` partition as there were
write tasks, which is right for throughput but, under continuous
ingest (streaming/ingest.py appends every micro-batch), accretes
thousands of small files per partition — each one a scan task, a
name-node entry and a parquet footer fetch.

``compact_table`` rewrites each affected partition's files into
``ceil(bytes / target_file_bytes)`` files via a per-partition-scoped
read → coalesce-style repartition → dynamic-partition overwrite.
Readers never notice: the directory contract (``table/dt=.../``) and
the rows are unchanged, only file granularity changes.  Run it where
the reference ran its daily rsync — after each ingest day closes.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def partition_stats(root: str, table: str) -> dict[str, tuple[int, int]]:
    """{dt: (n_files, total_bytes)} from the directory tree."""
    out: dict[str, tuple[int, int]] = {}
    tdir = os.path.join(root, table)
    if not os.path.isdir(tdir):
        return out
    for entry in sorted(os.listdir(tdir)):
        if not entry.startswith("dt="):
            continue
        pdir = os.path.join(tdir, entry)
        files = [
            os.path.join(pdir, f)
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        ]
        out[entry[3:]] = (len(files), sum(os.path.getsize(f) for f in files))
    return out


def compact_table(
    spark: SparkSession,
    root: str,
    table: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    min_files_to_compact: int = 2,
) -> dict[str, int]:
    """Compact every partition with more part files than its data
    needs; returns {dt: files_after} for the rewritten partitions."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    rewritten: dict[str, int] = {}
    for dt, (n_files, total_bytes) in partition_stats(root, table).items():
        want = max(1, math.ceil(total_bytes / target_file_bytes))
        if n_files < min_files_to_compact or n_files <= want:
            continue
        part = spark.read.parquet(f"{root}/{table}").where(F.col("dt") == dt)
        # repartition (not coalesce): coalesce would chain the upstream
        # scan tasks together and can skew one output file huge
        part.repartition(want).write.mode("overwrite").partitionBy("dt").parquet(
            f"{root}/{table}"
        )
        rewritten[dt] = want
    return rewritten
