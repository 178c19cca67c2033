"""Structured Streaming: the streaming plans must compute exactly what
their batch counterparts do (drained with Trigger.AvailableNow)."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from mahjong_etl_spark.operators.sessionize import (
    events_sessionized,
    sessionize_stream,
)
from mahjong_etl_spark.streaming.events import _EVENTS_RAW
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
    batch gap-and-island result exactly.  Timeout disabled so ONLY the
    gap rule closes sessions — this isolates the data path; the
    timeout path is pinned by the idle-session test below."""
    ensure_shipped(spark)
    table = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(stream_events(spark, sf_dir), watermark_delay=None)
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


def test_sessionize_stream_timeout_closes_idle_session(spark, tmp_path):
    """EventTimeTimeout: once the watermark passes an idle user's
    last_event + GAP, their final session must be EMITTED and their
    state entry dropped — otherwise state grows with every user ever
    seen.  Three single-file micro-batches: user 1's events land in
    batch 1, then user 2's later events advance the watermark past
    user 1's gap horizon, so user 1's session times out by batch 3."""
    ensure_shipped(spark)
    src = tmp_path / "events_src"
    src.mkdir()
    t0 = 1_700_000_000 * 1_000_000_000  # nanos
    hour = 3600 * 1_000_000_000

    def write_file(name: str, rows: list[tuple[int, int]], mtime: int) -> None:
        pdf = [
            {
                "event_id": i,
                "ts": ts,
                "user_id": uid,
                "event_type": "view",
                "value": 1.0,
                "props": "{}",
            }
            for i, (uid, ts) in enumerate(rows)
        ]
        path = str(src / name)
        spark.createDataFrame(pdf, schema=_EVENTS_RAW).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (mtime, mtime))

    write_file("f1", [(1, t0), (1, t0 + 10 * 1_000_000_000)], mtime=1_000)
    write_file("f2", [(2, t0 + 3 * hour)], mtime=2_000)
    write_file("f3", [(2, t0 + 6 * hour)], mtime=3_000)

    raw = (
        spark.readStream.schema(_EVENTS_RAW)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src) + "/*")
    )
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    table = f"sess_to_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(events, watermark_delay="10 minutes")
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.n_events, r.duration_sec)
        for r in spark.table(table).collect()
    }
    # user 1 never produced another event: only the timeout can close
    # their 2-event, 10-second session.
    assert (1, 2, 10.0) in got
    # user 2's first session closed by the ordinary gap rule.
    assert (2, 1, 0.0) in got


def test_stream_static_enrich_matches_batch(spark, sf_dir):
    """Stream-static join parity: every event decorated with its
    user's profile must match the pure-batch join bit-for-bit (the
    profile's mean is exact-int arithmetic, so double equality is
    exact, not approximate)."""
    from mahjong_etl_spark.sources.tables import load
    from mahjong_etl_spark.streaming.joins import (
        run_enrich_available_now,
        user_profile,
    )

    streamed = {
        (r.event_id, r.n_events_hist, r.avg_value_hist)
        for r in run_enrich_available_now(spark, sf_dir).collect()
    }
    batch = {
        (r.event_id, r.n_events_hist, r.avg_value_hist)
        for r in load(spark, sf_dir, "events")
        .join(user_profile(spark, sf_dir), "user_id")
        .select("event_id", "n_events_hist", "avg_value_hist")
        .collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_stream_stream_attribution_matches_batch(spark, sf_dir):
    """Watermarked stream-stream self-join parity: the (purchase,
    view) pairs inside the 30-minute look-back must equal the batch
    join's pairs.  One AvailableNow micro-batch holds all data, so no
    pair is lost to watermark eviction — eviction behavior itself is
    bounded-state plumbing, pinned by the state-store metrics, not by
    row loss here."""
    from mahjong_etl_spark.sources.tables import load
    from mahjong_etl_spark.streaming.joins import run_attribution_available_now

    streamed = {
        (r.purchase_id, r.view_id)
        for r in run_attribution_available_now(spark, sf_dir).collect()
    }
    e = load(spark, sf_dir, "events")
    v = e.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES"))
    )
    batch = {
        (r.purchase_id, r.view_id)
        for r in p.join(v, cond, "inner").select("purchase_id", "view_id").collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_sliding_window_stream_equals_batch(spark, sf_dir):
    """Sliding (overlapping) windows: the AvailableNow streaming result
    must equal the same window expression evaluated in batch."""
    from pyspark.sql import functions as F

    from mahjong_etl_spark.sources.tables import load_events
    from mahjong_etl_spark.streaming.events import (
        run_stream_available_now,
        sliding_counts,
    )

    got = {
        (r.win_start, r.n_events)
        for r in run_stream_available_now(spark, sf_dir, sliding_counts).collect()
    }
    batch = load_events(spark, sf_dir)
    expected = {
        (r.win_start, r.n_events)
        for r in (
            batch.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("win_start"),
                "n_events",
            )
            .collect()
        )
    }
    assert got == expected
    # overlap sanity: events are double-counted across windows
    assert sum(n for _, n in got) == 2 * batch.count()


def test_native_session_window_stream_equals_batch(spark, sf_dir):
    """Native session_window streaming result == batch evaluation of
    the same expression (gap merging is engine-side either way)."""
    from pyspark.sql import functions as F

    from mahjong_etl_spark.sources.tables import load_events
    from mahjong_etl_spark.streaming.events import (
        native_session_counts,
        run_stream_available_now,
    )

    got = {
        (r.user_id, r.s_start, r.s_end, r.n_events)
        for r in run_stream_available_now(
            spark, sf_dir, native_session_counts
        ).collect()
    }
    batch = load_events(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    expected = {
        (r.user_id, r.s_start, r.s_end, r.n_events)
        for r in (
            batch.groupBy(
                F.session_window("ts", "30 minutes").alias("w"), "user_id"
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("s_start"),
                F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("s_end"),
                "n_events",
            )
            .collect()
        )
    }
    assert got == expected
    assert got, "session output must not be empty"


def test_streaming_anomaly_matches_batch_prequential(spark, sf_dir):
    """One AvailableNow drain of the stateful anomaly screen must
    reproduce the batch prequential query BIT-FOR-BIT: same flagged
    event ids, same z values (both sides derive the 3-sigma test from
    exact integer sufficient statistics through the identical IEEE
    expression tree — the single events.parquet file arrives as one
    micro-batch, so the within-group event-time order matches)."""
    import uuid as _uuid

    from mahjong_etl_spark.streaming.anomaly_stream import anomaly_stream

    table = f"anom_{_uuid.uuid4().hex[:8]}"
    q = (
        anomaly_stream(stream_events(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r.event_id: (r.user_id, r.event_type, r.value, r.z)
        for r in spark.table(table).collect()
    }
    batch = {
        r.event_id: (r.user_id, r.event_type, r.value, r.z)
        for r in registry()["events_anomaly_prequential"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert set(streamed) == set(batch)
    assert len(batch) > 0
    for eid, (u, t, v, z) in batch.items():
        su, st_, sv, sz = streamed[eid]
        assert (su, st_) == (u, t)
        assert sv == v
        assert abs(sz - z) < 1e-12


def test_streaming_scorer_matches_batch_bitforbit(spark, sf_dir):
    """Train-offline / score-online parity: the AvailableNow drain of
    the streaming scorer must reproduce batch scoring exactly — the
    logit is an exact int64 dot product, so equality is integer, not
    approximate."""
    from mahjong_etl_spark.operators.classifier import (
        X_SCALE,
        corpus_classifier,
        quantized_weights,
    )
    from mahjong_etl_spark.sources.tables import load
    from mahjong_etl_spark.streaming.scoring import (
        run_scoring_available_now,
        score_expr,
    )

    streamed = {
        (r.vec_id, r.z_int, r.pred_pos)
        for r in run_scoring_available_now(spark, sf_dir).collect()
    }
    w = quantized_weights(corpus_classifier(spark, sf_dir))
    z = score_expr(w, X_SCALE)
    batch = {
        (r.vec_id, r.z_int, r.pred_pos)
        for r in load(spark, sf_dir, "embeddings")
        .select("vec_id", z.alias("z_int"), (z > 0).cast("int").alias("pred_pos"))
        .collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_state_store_introspection_sees_open_sessions(spark, sf_dir, tmp_path):
    """The statestore reader must expose exactly the sessions the
    drain left OPEN: for every user, the state row's event count equals
    the batch-computed final session's count, and start/last match."""
    import uuid as _uuid

    from mahjong_etl_spark.streaming.introspect import (
        open_sessions,
        state_metadata,
    )

    ensure_shipped(spark)
    ckpt = str(tmp_path / "ckpt")
    q = (
        sessionize_stream(stream_events(spark, sf_dir), watermark_delay=None)
        .writeStream.format("memory")
        .queryName(f"intro_{_uuid.uuid4().hex[:8]}")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    meta = state_metadata(spark, ckpt).collect()
    assert len(meta) == 1 and meta[0].operatorName == "applyInPandasWithState"

    live = {r.user_id: r for r in open_sessions(spark, ckpt).collect()}

    # batch sessionization: each user's LAST session is the open one
    final = {}
    for r in events_sessionized(spark, sf_dir).collect():
        cur = final.get(r.user_id)
        if cur is None or r.session_num > cur.session_num:
            final[r.user_id] = r
    assert set(live) == set(final)
    for uid, row in live.items():
        assert row.n_events == final[uid].n_events
        assert round(row.duration_sec, 3) == final[uid].duration_sec


def test_sessionize_stream_late_event_does_not_rewind_session(spark, tmp_path):
    """A watermark-allowed LATE event from an earlier wall-clock
    moment must only WIDEN the open session (min start / max last),
    never rewind last_us — the old unconditional assignment split the
    session on the next on-time event and could emit a negative
    duration on timeout (r7 review).  Batch 1: user 1 at t0 and
    t0+10min (the 10-min watermark delay still admits the late
    event: after batch 1 the watermark is exactly t0).
    Batch 2: a late event at t0+5min — inside the span.  Batch 3: an
    event at t0+25min — 15 min after the TRUE max (no split), though
    20 min after the late event.  One session of 4 events, 25 min."""
    ensure_shipped(spark)
    src = tmp_path / "late_src"
    src.mkdir()
    t0 = 1_700_000_000 * 1_000_000_000  # nanos
    minute = 60 * 1_000_000_000

    def write_file(name, rows, mtime):
        pdf = [
            {
                "event_id": i,
                "ts": ts,
                "user_id": uid,
                "event_type": "view",
                "value": 1.0,
                "props": "{}",
            }
            for i, (uid, ts) in enumerate(rows)
        ]
        path = str(src / name)
        spark.createDataFrame(pdf, schema=_EVENTS_RAW).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (mtime, mtime))

    write_file("f1", [(1, t0), (1, t0 + 10 * minute)], mtime=1_000)
    write_file("f2", [(1, t0 + 5 * minute)], mtime=2_000)  # late, in-span
    write_file("f3", [(1, t0 + 25 * minute)], mtime=3_000)
    # batch 4 far ahead: times out user 1's session (GAP=30 min)
    write_file("f4", [(2, t0 + 300 * minute)], mtime=4_000)

    raw = (
        spark.readStream.schema(_EVENTS_RAW)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src) + "/*")
    )
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    table = f"sess_late_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(events, watermark_delay="10 minutes")
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.n_events, r.duration_sec)
        for r in spark.table(table).collect()
    }
    # ONE unsplit session for user 1: 4 events spanning 25 minutes.
    # The old rewind produced a split (a 10-min session closed by f3).
    assert (1, 4, 1500.0) in got, got
    assert not any(u == 1 and n != 4 for (u, n, _) in got), got


def test_sessionize_stream_disjoint_late_event_splits_as_batch_would(spark, tmp_path):
    """A watermark-allowed late event more than GAP BEFORE the open
    session's start must close as its OWN earlier session — the batch
    twin's answer — instead of being silently widened into the current
    one (r7 advice; fixed by the r8 interval-merge scan).  User 1's
    open session starts at t0+40min; a late event at t0 (40 min
    earlier, GAP=30 min) arrives in batch 2 while the watermark
    (t0+30min) still admits it.  Expected: a singleton session at t0
    (duration 0) AND the on-time session intact."""
    ensure_shipped(spark)
    src = tmp_path / "late_split_src"
    src.mkdir()
    t0 = 1_700_000_000 * 1_000_000_000  # nanos
    minute = 60 * 1_000_000_000

    def write_file(name, rows, mtime):
        pdf = [
            {
                "event_id": i,
                "ts": ts,
                "user_id": uid,
                "event_type": "view",
                "value": 1.0,
                "props": "{}",
            }
            for i, (uid, ts) in enumerate(rows)
        ]
        path = str(src / name)
        spark.createDataFrame(pdf, schema=_EVENTS_RAW).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (mtime, mtime))

    # batch 1: on-time events at t0+40 and t0+42 -> watermark t0+32min
    write_file("f1", [(1, t0 + 40 * minute), (1, t0 + 42 * minute)], mtime=1_000)
    # batch 2: late event at t0+33min — 7 min inside the open session's
    # start-GAP horizon: merges (gap 7min <= 30min), batch-identical
    write_file("f2", [(1, t0 + 33 * minute)], mtime=2_000)
    # batch 3: late event at t0 — 33 min before the (widened) session
    # start: > GAP, so the batch twin makes it a singleton session
    write_file("f3", [(1, t0 + 0 * minute)], mtime=3_000)
    # batch 4 far ahead: times out user 1's open session
    write_file("f4", [(2, t0 + 600 * minute)], mtime=4_000)

    raw = (
        spark.readStream.schema(_EVENTS_RAW)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src) + "/*")
    )
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    table = f"sess_split_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(events, watermark_delay="60 minutes")
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.n_events, r.duration_sec)
        for r in spark.table(table).collect()
    }
    # singleton late session at t0, then the 3-event on-time session
    # (t0+33 .. t0+42 = 9 min) closed by the timeout
    assert (1, 1, 0.0) in got, got
    assert (1, 3, 540.0) in got, got
