"""Streaming state-store introspection — query a live pipeline's state
offline, without stopping or instrumenting the stream.

At 100 TB/day the first operational question about a stateful stream
is "what is in the state store right now?" (how many open sessions,
which keys are hot, is state growing without bound).  Spark ships a
first-class answer: the ``statestore`` read format materializes any
checkpoint's state as a DataFrame, and ``state-metadata`` lists the
stateful operators a checkpoint contains.  This module wraps both with
the flattening that our `applyInPandasWithState` operators need, so an
operator on call can run plain SQL over production state snapshots.

Scale shape: the reader scans the checkpoint's state files partition-
parallel (one task per state-store partition), never the stream
itself; filters on key columns prune to the matching partitions only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """The stateful-operator inventory of a checkpoint: operator
    id/name, store name, partition count, and the batch-id range whose
    state is retrievable."""
    return spark.read.format("state-metadata").load(checkpoint_dir)


def read_operator_state(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int = 0,
    store_name: str = "default",
    batch_id: int | None = None,
) -> DataFrame:
    """Raw (key, value) state rows of one stateful operator, flattened
    one level: key fields and value.groupState fields (the layout
    ``applyInPandasWithState`` persists) become top-level columns.
    ``batch_id`` selects a historical snapshot; default is latest."""
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
        .option("storeName", store_name)
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    raw = reader.load(checkpoint_dir)
    key_cols = [
        F.col(f"key.{f.name}").alias(f.name)
        for f in raw.schema["key"].dataType.fields
    ]
    val_t = raw.schema["value"].dataType
    if "groupState" in val_t.fieldNames():
        val_cols = [
            F.col(f"value.groupState.{f.name}").alias(f.name)
            for f in val_t["groupState"].dataType.fields
        ]
    else:
        val_cols = [
            F.col(f"value.{f.name}").alias(f.name) for f in val_t.fields
        ]
    return raw.select(*key_cols, *val_cols, "partition_id")


def open_sessions(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """The sessionize stream's in-flight sessions, as analytics-ready
    rows: user_id, first/last event time, event count, and running
    duration — the live complement of the emitted (closed) sessions.
    (The current IDLE gap — last event to "now" — needs the stream's
    watermark as the reference clock, which the state snapshot does
    not carry; compute it downstream as ``watermark - last_event`` if
    the query's progress metrics are at hand.)"""
    st = read_operator_state(spark, checkpoint_dir)
    return st.select(
        "user_id",
        F.timestamp_micros(F.col("start_us")).alias("session_start"),
        F.timestamp_micros(F.col("last_us")).alias("last_event"),
        F.col("n").alias("n_events"),
        ((F.col("last_us") - F.col("start_us")) / 1e6).alias("duration_sec"),
    )
