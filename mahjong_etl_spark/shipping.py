"""Ship this package's source to Spark Python workers.

Functions referenced from mapInPandas / pandas_udf closures are
cloudpickled *by reference* to their defining module, so executors
must be able to ``import mahjong_etl_spark`` — true on a cluster only
if the package was shipped (spark-submit --py-files) and true locally
only if the driver's cwd happens to be the repo root.

``ensure_shipped(spark)`` makes both cases work: it zips the package
once per session and registers it with ``sparkContext.addPyFile``,
which appends it to every worker's sys.path (the standard runtime
equivalent of --py-files; on a 1000-executor cluster the zip rides
the existing file-distribution channel, a few KB once per executor).
Every operator that crosses the Python-worker boundary calls this
before building its UDF.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

# id -> the session itself: holding the reference keeps the id from
# being reused by a NEW session after a GC (an id()-only set would then
# wrongly skip shipping for the new session and break worker imports)
_SHIPPED_SESSIONS: dict[int, SparkSession] = {}


def ensure_shipped(spark: SparkSession) -> None:
    key = id(spark)
    if _SHIPPED_SESSIONS.get(key) is spark:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, zip_path = tempfile.mkstemp(prefix="mahjong_etl_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "mahjong_etl_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED_SESSIONS[key] = spark
