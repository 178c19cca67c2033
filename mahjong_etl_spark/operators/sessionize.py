"""Sessionization of the event log (30-minute inactivity gap).

Two implementations of the same semantics:

- ``events_sessionized`` (batch): the classic gap-and-island window
  pattern — lag() to flag session starts, a running sum to number
  sessions, then a groupBy.  Fully SQL-expressible, so it carries a
  DuckDB oracle.  Cost: one shuffle on user_id (both window and
  groupBy reuse the same partitioning — Catalyst plans a single
  exchange).
- ``sessionize_stream`` (streaming): the custom-stateful-operator
  path via ``applyInPandasWithState`` — per-user session state lives
  in the state store across micro-batches; sessions close when the
  gap rule fires.  This is the 100 TB continuous-ingest shape: state
  is O(active users), not O(events).

The batch query is the correctness oracle for the streaming one
(tests compare them under Trigger.AvailableNow).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from ..plans.registry import query
from ..sources.tables import load

GAP_SEC = 1800


@query(
    "events_sessionized",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('microsecond', lag(ts) OVER w, ts)
                            > {GAP_SEC} * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_num
        FROM flagged
    )
    SELECT user_id, session_num,
           count(*) AS n_events,
           round(date_diff('microsecond', min(ts), max(ts)) / 1000000.0, 3)
               AS duration_sec
    FROM numbered GROUP BY user_id, session_num
    """,
)
def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: gap-and-island over the ordered event log."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ-safe (unix_micros rejects TIMESTAMP_NTZ inputs)
    gap_us = F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
    is_new = F.when(
        gap_us.isNull() | (gap_us > GAP_SEC * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    numbered = e.select(
        "user_id",
        "ts",
        F.sum(is_new).over(wrun).alias("session_num"),
    )
    dur = F.timestamp_diff("MICROSECOND", F.min("ts"), F.max("ts")) / 1_000_000.0
    return numbered.groupBy("user_id", "session_num").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(dur, 3).alias("duration_sec"),
    )


SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("duration_sec", DoubleType()),
    ]
)

# (session_start_us, last_event_us, n_events)
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _dur_sec(start_us: int, last_us: int) -> float:
    """Session duration rounded to ms EXACTLY like the batch twin's
    F.round(..., 3) (HALF_UP): integer half-up on the micros delta,
    then one division.  Python's round() is half-EVEN on the binary
    double and emits 1.234 where Spark emits 1.235 for a session whose
    length ends in 500 us (r7 review, verified divergence)."""
    return ((last_us - start_us) + 500) // 1000 / 1000.0


def _make_session_fn(event_time_timeout: bool):
    def _session_fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if event_time_timeout and state.hasTimedOut:
            # Watermark passed last_event + GAP: the user went idle, so
            # the in-flight session is final — emit it and drop the
            # state entry entirely (bounded state on idle keys).
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, n, _dur_sec(start_us, last_us))],
                columns=["user_id", "n_events", "duration_sec"],
            )
            return
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        closed: list[tuple[int, int, float]] = []
        # Concatenate ALL Arrow chunks for this group before sorting: one
        # user's micro-batch data can span multiple chunks, and sorting
        # each chunk independently would process events out of global time
        # order (spurious session splits / wrong durations).
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            # 1-D single-linkage merge of the batch's sorted events
            # with the OPEN session treated as one interval element
            # (r8, replaces the r7 min/max widening).  Invariant: the
            # open interval's internal gaps are all <= GAP (anything
            # larger split it when processed), so an event within
            # [start-GAP, last+GAP] merges exactly as the batch twin
            # would, while a watermark-allowed LATE event more than
            # GAP before the open session's start now closes as its
            # own earlier session — the batch twin's answer — instead
            # of being silently widened into the current one (r7
            # advice).  Residual stream-vs-batch divergence: a late
            # event landing within GAP of a session that ALREADY
            # emitted cannot retract it (append mode); the batch
            # backfill is the repair path, as for kyoku-id minting.
            elems: list[list] = (
                [[start_us, last_us, n]] if last_us is not None else []
            )
            all_ts = pd.concat(chunks)
            elems += [
                [int(t), int(t), 1]
                for t in all_ts.sort_values("ts_us")["ts_us"]
            ]
            elems.sort(key=lambda e: (e[0], e[1]))
            cur = elems[0]
            for lo, hi, cnt in elems[1:]:
                if lo - cur[1] <= GAP_SEC * 1_000_000:
                    cur[1] = max(cur[1], hi)
                    cur[2] += cnt
                else:
                    # the NEXT element is > GAP later: cur is final
                    closed.append((user_id, cur[2], _dur_sec(cur[0], cur[1])))
                    cur = [lo, hi, cnt]
            start_us, last_us, n = cur
        state.update((start_us, last_us, n))
        if event_time_timeout and last_us is not None:
            # Fire when the watermark passes the gap horizon.  Spark
            # rejects a timeout at-or-before the current watermark, so
            # clamp forward for a user whose last event is already far
            # behind it (their timeout then fires on the next batch).
            state.setTimeoutTimestamp(
                max(
                    last_us // 1000 + GAP_SEC * 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        yield pd.DataFrame(closed, columns=["user_id", "n_events", "duration_sec"])

    return _session_fn


def sessionize_stream(
    events: DataFrame, watermark_delay: str | None = "10 minutes"
) -> DataFrame:
    """Stateful streaming sessionization.

    Emits a row per CLOSED session.  A session closes two ways: a
    later event from the same user beyond the gap (the data path), or
    the event-time watermark passing ``last_event + GAP`` (the timeout
    path — without it an idle user's final session would sit in the
    state store forever and state would grow O(all users ever seen)
    instead of O(active users)).  ``watermark_delay`` is the lateness
    allowance; pass ``None`` to disable the watermark/timeout (state
    then never expires — test/diagnostic use only).
    """
    if watermark_delay is not None:
        events = events.withWatermark("ts", watermark_delay)
    # The streaming clock only ever takes DIFFERENCES of ts_us, so a
    # session-tz-dependent epoch is harmless; the cast makes this work
    # for TIMESTAMP_NTZ sources too (no-op for TIMESTAMP ones).
    prepared = events.select(
        "user_id", "ts", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(watermark_delay is not None),
        outputStructType=SESSION_OUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if watermark_delay is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
