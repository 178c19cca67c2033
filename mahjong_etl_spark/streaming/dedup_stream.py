"""Streaming deduplication — the continuous-ingest face of
operators/dedup.py's exact strategy.

``dropDuplicatesWithinWatermark`` keeps one row per key with state
bounded by the watermark horizon: a key's fingerprint is held only
until the watermark passes its event time, so state is O(keys per
horizon), not O(stream) — the property that makes exact dedup viable
on an unbounded 100 TB/day feed.  (Classic ``dropDuplicates`` on a
stream would grow state forever.)

Payload hashing mirrors the batch operator's discipline: the state
key is the md5 of the payload, never the payload itself, so state
size is ~32 bytes/key regardless of document size.  The hashed form
is ``to_json(struct(cols...))`` — INJECTIVE over the column tuple,
unlike a separator join: ``concat_ws`` silently skips NULLs (so
("click", NULL) and (NULL, "click") would collide and one distinct
row be dropped) and an unescaped separator collides ("a\\x00", "b")
with ("a", "\\x00b"); JSON escapes values and carries field names, so
distinct tuples always hash distinct (r7 review).
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
        "payload_hash", F.md5(F.to_json(F.struct(*payload_cols)))
    )
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["payload_hash"]
    )
