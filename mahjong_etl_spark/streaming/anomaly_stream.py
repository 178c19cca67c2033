"""Streaming z-score anomaly screen — the continuous-ingest face of
``events_anomaly_prequential`` (plans/queries.py).

Per-(user, event-type) sufficient statistics (n, Σx, Σx²) live in the
state store as three int64s; every arriving event is tested against
the statistics of the events BEFORE it (prequential / test-then-update
— the only causally valid online formulation: the batch two-pass mean
would require the future) and then folded in.  State is O(distinct
user × event-type keys) and 24 bytes each — bounded by the key space,
not by stream length or time, which is why no timeout/expiry is needed
for correctness; an idle key's 24 bytes simply persist.  (Contrast
sessionize_stream, whose per-key state is only final when the event-
time timeout fires.)

Exactness discipline matches the batch twin: values snap to exact
milli-int64, the statistics are exact integer sums, and the 3σ test
compares doubles derived from those integers through the identical
IEEE expression tree — so one AvailableNow drain reproduces the batch
prequential query bit-for-bit (pinned in tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# An event is only testable once its group has this much history; below
# it the variance estimate is noise and every early event would flag.
MIN_PREV = 8
Z_K = 3.0

ANOMALY_OUT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("z", DoubleType()),
    ]
)

# (n, sum_milli, sum_milli_sq) — exact integer sufficient statistics
ANOMALY_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("sx", LongType()),
        StructField("sxx", LongType()),
    ]
)


def _anomaly_fn(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id, event_type = key
    n0, sx0, sxx0 = state.get if state.exists else (0, 0, 0)

    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        state.update((n0, sx0, sxx0))
        return
    # one group's micro-batch can span Arrow chunks: concatenate, THEN
    # order by event time so the prequential scan is causally valid
    pdf = pd.concat(chunks).sort_values(["ts_us", "event_id"])
    xm = pdf["xm"].to_numpy(dtype=np.int64)
    # EXACT integer space (Python ints via object dtype): xm*xm wraps
    # silently past int64 in numpy (value >= ~3.04e6 after the milli
    # scale), which would drive the variance negative -> NaN std ->
    # the key never flags again, with no error (r7 review).  The
    # group's micro-batch is small, so object math is not the
    # bottleneck; only the carried state must fit int64 (below).
    xm_obj = xm.astype(object)
    sq = xm_obj * xm_obj

    # exclusive prefix sums = statistics of the events strictly before
    # each row (continuing from the carried state)
    np_ = n0 + np.arange(len(xm), dtype=np.int64)
    sx = sx0 + np.concatenate(([0], np.cumsum(xm_obj)[:-1]))
    sxx = sxx0 + np.concatenate(([0], np.cumsum(sq)[:-1]))

    npd = np_.astype(np.float64)
    sxd = sx.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        std = np.sqrt(
            (npd * sxx.astype(np.float64) - sxd * sxd)
            / (npd * (np_ - 1).astype(np.float64))
        )
        dev = (np_.astype(object) * xm_obj - sx).astype(np.float64)
        flag = (np_ >= MIN_PREV) & (np.abs(dev) > Z_K * npd * std)
        z = dev / (npd * std)

    new_state = (
        int(n0 + len(xm)),
        int(sx0 + sum(int(v) for v in xm)),
        int(sxx0 + sum(int(v) for v in sq)),
    )
    if not all(-(2**63) <= v < 2**63 for v in new_state):
        # the carried state is LongType; overflowing it would corrupt
        # every later batch.  The batch twin's ANSI BIGINT sum raises
        # at the same magnitude — fail loudly, identically.
        raise OverflowError(
            f"anomaly state overflow for key {key}: {new_state}"
        )
    state.update(new_state)
    if not flag.any():
        return
    out = pdf.loc[flag, ["event_id"]].copy()
    out["user_id"] = user_id
    out["event_type"] = event_type
    out["value"] = xm[flag].astype(np.float64) / 1000.0
    out["z"] = z[flag]
    yield out[["event_id", "user_id", "event_type", "value", "z"]]


def anomaly_stream(events: DataFrame) -> DataFrame:
    """Flag events >3σ from their group's running mean, online.

    Input: a streaming events relation with ``ts`` (timestamp),
    ``event_id``, ``user_id``, ``event_type``, ``value``.  Emits one
    row per anomalous event in append mode.
    """
    prepared = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * 1000).cast("long").alias("xm"),
    )
    return prepared.groupBy("user_id", "event_type").applyInPandasWithState(
        _anomaly_fn,
        outputStructType=ANOMALY_OUT,
        stateStructType=ANOMALY_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
