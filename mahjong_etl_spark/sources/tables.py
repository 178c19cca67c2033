"""Loaders for the driver's synthetic star-schema tables.

``/root/testdata/sf*/{name}.parquet`` — TPC-H-ish tables plus
``events`` (ordered event log), ``documents`` (text corpus) and
``embeddings`` (vector table).  See TESTDATA.md / FIXTURES.md §3.

Parquet scans are left fully declarative so Catalyst applies column
pruning and predicate pushdown (verify with ``.explain("formatted")``:
``PushedFilters`` / ``ReadSchema`` must reflect the query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables: always broadcastable in joins.
DIM_TABLES = {"region", "nation", "supplier", "customer", "part"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_spread(
    spark: SparkSession, sf_dir: str, name: str, min_parallelism: int | None = None
) -> DataFrame:
    """Load a table and guarantee enough partitions for CPU-heavy work.

    The local test tables are single parquet files → one input split,
    which would serialize per-row-expensive operators (shingling, token
    hashing, vector math) onto one core.  At cluster scale the input
    arrives as many splits and this is a no-op — the repartition only
    fires when the scan has fewer partitions than the session's
    parallelism, so no shuffle is added for a 100 TB input.
    """
    df = load(spark, sf_dir, name)
    target = min_parallelism or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as TIMESTAMP(NANOS), which Spark's
    parquet reader rejects ([PARQUET_TYPE_ILLEGAL]).  Read nanos as a
    raw long (legacy conf, runtime-settable so it also works under the
    driver's own session) and floor-truncate to a microsecond
    timestamp.  The source values DO carry sub-microsecond parts, so
    this drops real nanosecond precision — exactly the same floor
    truncation a Python client sees when DuckDB converts TIMESTAMP_NS
    to datetime.  Integer division (``div``) is essential: a
    double-precision ``/ 1000`` has 256 ns ulp at 2024-epoch
    magnitudes and lands on the wrong microsecond for ~12% of rows.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql access."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
