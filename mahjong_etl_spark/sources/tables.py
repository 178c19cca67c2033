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
    """Schema-adaptive events loader.

    Some corpus generations store ``ts`` as parquet TIMESTAMP(NANOS),
    which Spark's reader rejects ([PARQUET_TYPE_ILLEGAL]) unless the
    legacy nanos-as-long conf is on; newer generations store plain
    TIMESTAMP(MICROS).  With the conf set, a nanos file surfaces ``ts``
    as a raw LongType while a micros file surfaces a timestamp — so we
    read first and branch on the *observed* dtype instead of assuming a
    layout.  For the nanos case we floor-truncate to microseconds with
    integer division (``div``): a double-precision ``/ 1000`` has
    256 ns ulp at 2024-epoch magnitudes and lands on the wrong
    microsecond for ~12% of rows.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """The nanos branch of the layout adaptation, shared with the
    streaming reader (streaming/events.py::stream_events) so the
    subtle integer-``div`` fix lives in exactly one place (r7 review):
    a raw-Long (nanos) ``ts`` floor-truncates to microseconds with
    integer division; any other layout passes through unchanged."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> None:
    """Register tables as temp views for spark.sql access.

    ``names`` limits registration to the tables a query's SQL text
    actually references (r15, guide §1.2-2 per-task work): each
    registration is a driver-side parquet footer read for schema
    inference, so a 4-table query paid 10 footer reads per call —
    pure per-call overhead at any scale.  Default stays all tables."""
    for name in names if names is not None else TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def load_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution-tolerant read across parquet roots written at
    different times with drifting schemas (columns ADDED over the life
    of a 100 TB table — the normal case for a multi-month corpus).

    ``mergeSchema`` unions the file footers' schemas: rows from files
    predating a column surface it as NULL, so queries over the merged
    relation stay total.  The cost model matters at scale: merging
    reads every file footer up front (one listing pass, no data), and
    column pruning still applies afterwards — a query touching only
    v1 columns reads zero bytes of the added ones.  Columns REMOVED or
    retyped are NOT handled here by design; that is a breaking change
    routed through the CDC/SCD plane, not a silent union.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)
