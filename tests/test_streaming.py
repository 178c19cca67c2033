"""Structured Streaming: the streaming plans must compute exactly what
their batch counterparts do (drained with Trigger.AvailableNow)."""

from __future__ import annotations

import uuid

from mahjong_etl_spark.operators.sessionize import (
    events_sessionized,
    sessionize_stream,
)
from mahjong_etl_spark.plans.registry import registry
from mahjong_etl_spark.shipping import ensure_shipped
from mahjong_etl_spark.streaming.events import (
    run_hourly_available_now,
    stream_events,
)


def test_streaming_hourly_equals_batch(spark, sf_dir):
    streamed = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in run_hourly_available_now(spark, sf_dir).collect()
    }
    batch = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in registry()["events_hourly"].spark_fn(spark, sf_dir).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_stateful_sessionize_stream_matches_batch(spark, sf_dir):
    """One AvailableNow drain = one micro-batch: every session except
    each user's final (still-open) one must be emitted, matching the
    batch gap-and-island result exactly."""
    ensure_shipped(spark)
    table = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(stream_events(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = [
        (r.user_id, r.n_events, r.duration_sec)
        for r in spark.table(table).collect()
    ]

    batch_rows = events_sessionized(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in batch_rows:
        by_user.setdefault(r.user_id, []).append(r)
    expected = []
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: r.session_num)
        for r in rows[:-1]:  # all but the open (last) session
            expected.append((uid, r.n_events, r.duration_sec))
    assert sorted(streamed) == sorted(expected)
    assert len(streamed) > 0
