"""Partition compaction — the small-files answer at 100 TB.

The reference writes ONE file per table per date (reference
scrape.py:623-660) — a single-writer bottleneck at scale.  This
engine writes as many part files per ``dt=`` partition as there were
write tasks, which is right for throughput but, under continuous
ingest (streaming/ingest.py publishes every micro-batch), accretes
thousands of small files per partition — each one a scan task, a
name-node entry and a parquet footer fetch.

``compact_table`` rewrites each affected partition's files into
``ceil(bytes / target_file_bytes)`` files via a per-partition-scoped
read → coalesce-style repartition → dynamic-partition overwrite.
Readers never notice: the directory contract (``table/dt=.../``) and
the rows are unchanged, only file granularity changes.  Run it where
the reference ran its daily rsync — after each ingest day closes.

Streaming-safety: the streaming publishes are batch-keyed
(``b{lineage}-{batch}-...`` names + a ``_batch_commits`` marker,
streaming/etl_stream.py) and a crash-replay erases-by-prefix before
republishing — folding an UNcommitted batch's files into anonymous
part files would turn that replay into row duplication.  A partition
holding batch-prefixed files whose commit marker is absent is
therefore skipped (in-flight; the next run picks it up once the
marker lands).  Listing goes through the JVM Hadoop FileSystem, so
any cluster scheme (hdfs://, s3a://, ...) works — an os.listdir walk
would silently no-op exactly where compaction matters most.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024

# b{lineage}-{batch}- prefix of the streaming publish (etl_stream.py)
_BATCH_PREFIX_RE = re.compile(r"^b([0-9a-f]{12}-\d+)-")


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(spark._jsc.hadoopConfiguration())


def partition_stats(
    spark: SparkSession, root: str, table: str
) -> dict[str, tuple[int, int, list[str]]]:
    """{dt: (n_files, total_bytes, file_names)} via the Hadoop
    FileSystem — scheme-agnostic, one listStatus per partition."""
    out: dict[str, tuple[int, int, list[str]]] = {}
    jvm, fs = _hadoop_fs(spark, root)
    tpath = jvm.org.apache.hadoop.fs.Path(f"{root}/{table}")
    if not fs.exists(tpath):
        return out
    for st in fs.listStatus(tpath):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("dt=")):
            continue
        files = [
            f
            for f in fs.listStatus(st.getPath())
            if f.isFile() and f.getPath().getName().endswith(".parquet")
        ]
        out[name[3:]] = (
            len(files),
            sum(f.getLen() for f in files),
            sorted(f.getPath().getName() for f in files),
        )
    return out


def _uncommitted_batch_keys(
    spark: SparkSession, root: str, file_names: list[str]
) -> set[str]:
    """Batch keys referenced by streaming-published files that have NO
    commit marker — an in-flight (crash-pending) batch."""
    keys = {
        m.group(1)
        for f in file_names
        if (m := _BATCH_PREFIX_RE.match(f)) is not None
    }
    if not keys:
        return set()
    jvm, fs = _hadoop_fs(spark, root)
    return {
        k
        for k in keys
        if not fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{root}/_batch_commits/{k}")
        )
    }


def compact_table(
    spark: SparkSession,
    root: str,
    table: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    min_files_to_compact: int = 2,
) -> dict[str, int]:
    """Compact every partition with more part files than its data
    needs; returns {dt: files_after} for the rewritten partitions.
    Partitions holding an in-flight streaming batch's files are
    skipped (see module docstring)."""
    prior_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    rewritten: dict[str, int] = {}
    try:
        for dt, (n_files, total_bytes, names) in partition_stats(
            spark, root, table
        ).items():
            want = max(1, math.ceil(total_bytes / target_file_bytes))
            if n_files < min_files_to_compact or n_files <= want:
                continue
            if _uncommitted_batch_keys(spark, root, names):
                continue  # in-flight streaming batch: its replay
                # erases by filename prefix, which compaction destroys
            part = spark.read.parquet(f"{root}/{table}").where(F.col("dt") == dt)
            # repartition (not coalesce): coalesce would chain the
            # upstream scan tasks together and can skew one output
            # file huge
            part.repartition(want).write.mode("overwrite").partitionBy(
                "dt"
            ).parquet(f"{root}/{table}")
            rewritten[dt] = want
        return rewritten
    finally:
        if prior_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prior_mode
            )
