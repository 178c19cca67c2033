"""Streaming deduplication — the continuous-ingest face of
operators/dedup.py's exact strategy.

``dropDuplicatesWithinWatermark`` keeps one row per key with state
bounded by the watermark horizon: a key's fingerprint is held only
until the watermark passes its event time, so state is O(keys per
horizon), not O(stream) — the property that makes exact dedup viable
on an unbounded 100 TB/day feed.  (Classic ``dropDuplicates`` on a
stream would grow state forever.)

Payload hashing mirrors the batch operator: the state key is the
md5 of the payload, never the payload itself, so state size is
~32 bytes/key regardless of document size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    events: DataFrame,
    payload_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-one-per-payload within the watermark horizon."""
    keyed = events.withColumn(
        "payload_hash", F.md5(F.concat_ws("\x00", *payload_cols))
    )
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["payload_hash"]
    )
