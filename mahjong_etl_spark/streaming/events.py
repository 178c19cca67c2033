"""Structured Streaming over the events table.

The reference is pure batch, but its daily-archive loop is a de-facto
micro-batch ingestion pattern (SURVEY §1.1); this module is the
streaming surface a production deployment would use:

- ``stream_events``: file-source readStream with an explicit schema
  (streaming sources cannot infer) — new parquet files landing in the
  directory become micro-batches.
- ``hourly_counts``: watermarked tumbling-window aggregation; late
  events beyond the 1-hour watermark are dropped deterministically.
- ``run_hourly_available_now``: drains everything currently in the
  source with Trigger.AvailableNow into a memory sink and returns the
  result — the batch-equivalent execution used by tests to prove the
  streaming plan computes exactly what the batch plan does.

At scale the same code runs continuously: the file source tracks
processed files in the checkpoint, the watermark bounds state size,
and the windowed aggregate shuffles once per micro-batch on
(window, event_type).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# physical schema of events.parquet with ts read as raw nanos
# (see sources/tables.load_events for the TIMESTAMP(NANOS) story)
_EVENTS_RAW = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sources cannot infer schemas, but the PHYSICAL layout
    of ``ts`` varies by corpus generation (TIMESTAMP(NANOS) vs
    TIMESTAMP(MICROS) — see sources/tables.load_events).  One cheap
    batch footer read resolves the actual layout, and that schema is
    handed to the stream; the nanos→micros conversion only applies
    when the footer says nanos."""
    from ..sources.tables import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    observed = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(observed)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # the nanos->micros integer-div fix is shared with load_events
    raw = normalize_event_ts(raw)
    if not isinstance(observed["ts"].dataType, LongType):
        # Watermarks require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_
        # TYPE on NTZ).  The session-tz interpretation round-trips back
        # to the same wall-clock via date_format, so hourly keys match
        # the batch (NTZ) plan for any fixed-offset session tz.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def hourly_counts(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def drain_available_now(df: DataFrame, mode: str | None = None) -> DataFrame:
    """Drain ANY streaming DataFrame through Trigger.AvailableNow into
    a uniquely-named memory sink and return the materialized table —
    the one shared drain used by every streaming test surface (events,
    joins, scoring; r7 review: four verbatim copies)."""
    table = f"stream_out_{uuid.uuid4().hex[:8]}"
    w = df.writeStream.format("memory").queryName(table)
    if mode is not None:
        w = w.outputMode(mode)
    q = w.trigger(availableNow=True).start()
    q.awaitTermination()
    return df.sparkSession.table(table)


def run_hourly_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    return drain_available_now(
        hourly_counts(stream_events(spark, sf_dir)), "complete"
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """Sliding-window aggregation (1 h window, 30 min slide): each
    event lands in TWO overlapping windows — the smoothed-rate view
    tumbling windows cannot give.  Same watermark/state story as
    ``hourly_counts``; state size doubles with the overlap factor
    (width/slide), which is the documented knob at scale."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("win_start"),
            "n_events",
        )
    )


def native_session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user sessions via Spark's NATIVE ``session_window`` (gap-
    merging inside the aggregation operator) — the built-in
    counterpart of the custom ``applyInPandasWithState`` sessionizer
    in operators/sessionize.py.  Both exist deliberately: the native
    window covers count/sum session aggregates with zero custom code,
    the stateful UDF covers session payloads the built-in cannot
    express (ordered event lists, custom merge logic).  Watermark
    bounds the open-session state exactly as it does for the UDF."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("s_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("s_end"),
            "n_events",
        )
    )


def run_stream_available_now(spark: SparkSession, sf_dir: str, fn) -> DataFrame:
    """Drive any of the windowed aggregations above over the file
    stream with an AvailableNow trigger into a memory sink."""
    return drain_available_now(fn(stream_events(spark, sf_dir)), "complete")
