"""Streaming joins: stream-static enrichment and stream-stream
event-time joins.

The two join shapes a production ingestion of the events feed needs
beyond per-stream aggregation:

- ``enrich_with_user_profile``: every incoming event is decorated with
  its user's historical profile (a STATIC snapshot computed in batch).
  Spark re-plans the static side per micro-batch, so a broadcast hint
  keeps the join map-side — the stream never shuffles.  This is the
  feature-enrichment step of a training-data pipeline (attach quality
  priors, user aggregates, domain weights) expressed as the engine's
  native stream-static join.

- ``attribution_stream``: purchases joined to the most-recent-window
  views of the same user — the streaming counterpart of the batch
  ``events_attribution_window`` range join's SHAPE (its bounds differ:
  this stream uses an INCLUSIVE ``lookback_minutes`` lower bound,
  default 30 min, where the batch query uses a strict 1-hour one — the
  parity test builds the batch plan with the stream's own bounds).
  Both sides carry event-time watermarks and the join condition bounds
  view_ts to the look-back from the purchase, so Spark can expire
  buffered rows: state is O(events within the watermark + range
  bound), not O(stream history).  Without the time bound the state
  store would grow forever — the bound is what makes this runnable on
  an unbounded 100 TB/day feed.

Parity: ``tests/test_streaming.py`` drains both through
Trigger.AvailableNow and compares against the equivalent batch plan
row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events import stream_events


def user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static per-user profile snapshot (batch side of the stream-
    static join): event count and milli-exact mean value.

    The mean is exact-int-sum / count in double — the repo-wide
    engine-exactness discipline (registry.py conventions) — so the
    enriched stream can be compared bit-for-bit against a batch plan.
    """
    from ..sources.tables import load

    e = load(spark, sf_dir, "events")
    milli = F.round(F.col("value") * 1000).cast("long")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events_hist"),
        (F.sum(milli).cast("double") / F.count(F.lit(1)) / F.lit(1000.0)).alias(
            "avg_value_hist"
        ),
    )


def enrich_with_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static inner join: events stream ⋈ broadcast profile.

    The static side is pinned at stream start (snapshot semantics —
    the standard Spark stream-static contract); a periodically
    refreshed dim would swap the snapshot between micro-batches via
    foreachBatch.  Broadcast keeps the stream shuffle-free; at cluster
    scale a profile too big to broadcast drops the hint and AQE plans
    a shuffle join per micro-batch."""
    profile = user_profile(spark, sf_dir)
    stream = stream_events(spark, sf_dir)
    return stream.join(F.broadcast(profile), "user_id").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "n_events_hist",
        "avg_value_hist",
    )


def attribution_stream(
    spark: SparkSession, sf_dir: str, lookback_minutes: int = 30
) -> DataFrame:
    """Watermarked stream-stream join: each purchase matched to the
    same user's views in the preceding ``lookback_minutes``.

    Both sides are filtered projections of ONE file-source stream (a
    self-join — Spark buffers each side's rows in the state store
    keyed by user).  The watermark (1h) plus the explicit time-range
    condition lets the state store evict views older than
    watermark + lookback, bounding memory on an unbounded feed.
    Output: one row per (purchase, view) pair inside the window."""
    ev = stream_events(spark, sf_dir)
    views = (
        ev.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback_minutes} MINUTES")
        )
    )
    return purchases.join(views, cond, "inner").select(
        "purchase_id", "view_id", F.col("p_user").alias("user_id")
    )


def _drain(df: DataFrame, spark: SparkSession) -> DataFrame:
    from .events import drain_available_now

    return drain_available_now(df, "append")


def run_enrich_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain(enrich_with_user_profile(spark, sf_dir), spark)


def run_attribution_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain(attribution_stream(spark, sf_dir), spark)
