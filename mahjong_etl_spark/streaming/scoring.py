"""Streaming model scoring: the deploy half of train-offline /
score-online.

The classifier trains in batch (operators/classifier.py — distributed,
bit-reproducible) and its QUANTIZED weights deploy into the stream as
a pure JVM expression: the exact int64 dot product compiles into
whole-stage codegen inside the micro-batch plan — no Python on the
hot path, no state store, no shuffle (scoring is per-row).  Because
scoring is exact-integer, one AvailableNow drain reproduces the batch
scorer BIT-FOR-BIT (pinned in tests/test_streaming.py) — the property
that lets a production pipeline prove its online scores match the
offline evaluation that qualified the model.

At 100 TB/day the scorer adds zero state and zero exchange to the
ingest plan; weight refresh swaps the literal expression between
micro-batches via foreachBatch, the same snapshot contract as the
stream-static profile join (streaming/joins.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# the ONE scoring expression, shared with the batch evaluator so the
# online scores provably use the offline formula (r7 review)
from ..operators.classifier import score_expr  # noqa: F401  (re-export)


def stream_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table as a file-source stream (schema pinned
    from the batch footer, maxFilesPerTrigger=1 so a real deployment
    would drain file-by-file)."""
    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    # file streams take a DIRECTORY; glob-filter to the one table
    # (same source shape as streaming/events.py::stream_events)
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )


def scored_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incoming vectors scored with the batch-trained model: vec_id,
    true label, exact integer logit, and the positive decision."""
    from ..operators.classifier import (
        X_SCALE,
        corpus_classifier,
        quantized_weights,
    )

    w = quantized_weights(corpus_classifier(spark, sf_dir))
    z = score_expr(w, X_SCALE)
    return stream_embeddings(spark, sf_dir).select(
        "vec_id",
        "label",
        z.alias("z_int"),
        (z > 0).cast("int").alias("pred_pos"),
    )


def run_scoring_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the scorer through Trigger.AvailableNow into a memory
    sink; returns the scored table."""
    from .events import drain_available_now

    return drain_available_now(scored_stream(spark, sf_dir))
