"""Distributed Bloom-filter build + map-side join pruning.

The runtime-filter pattern for 100 TB joins: when a fact table joins a
selective build side, shipping every fact row into the join exchange
wastes the shuffle — a Bloom filter of the build-side keys, built
distributed and broadcast to the fact scan, drops non-matching rows
MAP-SIDE before any exchange.  Spark's own engine injects this in some
plans (spark.sql.optimizer.runtime.bloomFilter.enabled); this module is
the explicit, composable operator form: build any-side, prune
any-side, false positives harmless because the exact join still runs.

Build: one ``mapInPandas`` pass emits a partial bitmap per input
partition (numpy uint64 words, vectorized double hashing); partials
are OR-merged.  Driver traffic is n_partitions × m/8 bytes — for the
default 1 MiB filter and 10⁴ partitions that is ~10 GB collected as
≤10⁴ small rows; in practice m is sized to the build side (1 MiB
handles ~10⁶ keys at ~1% fp), and the build side of a runtime filter
is by definition the small side.  The merged filter is shipped to
executors via ``SparkContext.broadcast`` (torrent protocol, once per
executor) — NOT captured in the UDF closure: a closure-captured
ndarray is re-pickled into every task description, which at a
fact-scale filter size multiplies the bitmap bytes by the task count
(the same anti-pattern fix SemDeDup's centroids got,
operators/dedup.py broadcast path).

Hashing: splitmix64 finalizer over the int64 key gives h1; a second
round gives h2; bit i = (h1 + i·h2) mod m (Kirsch-Mitzenmacher double
hashing).  Pure numpy on both build and probe, so build/probe agree
bit-for-bit on every executor with nothing seeded.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

DEFAULT_M_BITS = 1 << 20  # 1 Mib -> ~1% fp at 10^5 keys, k=7
DEFAULT_K = 7

def _make_positions(m_bits: int, k: int):
    """Build the (keys) -> (len, k) bit-position function.

    Returned as a CLOSURE (not a module-level reference) on purpose:
    executor-side code must be cloudpickled BY VALUE — a module-level
    function would serialize as a reference to
    ``mahjong_etl_spark.functions.bloom``, which the driver's executors
    cannot import (the repo is on the driver's sys.path only).  Same
    constraint every mapInPandas operator in this repo honors via
    nested worker functions."""

    def positions(keys: np.ndarray) -> np.ndarray:
        def splitmix(x):
            x = x + np.uint64(0x9E3779B97F4A7C15)
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return x ^ (x >> np.uint64(31))

        with np.errstate(over="ignore"):
            h1 = splitmix(keys.astype(np.int64).view(np.uint64))
            h2 = splitmix(h1) | np.uint64(1)
            i = np.arange(k, dtype=np.uint64)
            return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)

    return positions


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> np.ndarray:
    """Distributed build: per-partition partial bitmaps, OR-merged.

    Returns the merged bitmap as a numpy uint64 word array.
    """
    n_words = m_bits // 64
    positions = _make_positions(m_bits, k)

    def partials(it):
        bitmap = np.zeros(n_words, dtype=np.uint64)
        saw = False
        for pdf in it:
            keys = pdf[col].to_numpy(dtype=np.int64, na_value=0)
            if len(keys):
                saw = True
                pos = positions(keys).ravel()
                np.bitwise_or.at(
                    bitmap, pos // 64, np.uint64(1) << (pos % np.uint64(64))
                )
        if saw:
            yield pd.DataFrame({"words": [bitmap.tobytes()]})

    rows = (
        df.select(col)
        .mapInPandas(partials, schema="words binary")
        .collect()
    )
    merged = np.zeros(n_words, dtype=np.uint64)
    for r in rows:
        merged |= np.frombuffer(r.words, dtype=np.uint64)
    return merged


# One broadcast per distinct bitmap per application: repeated
# bloom_prune calls (bench re-times, interactive reuse) must not
# accumulate never-released broadcasts.  LRU-capped; eviction
# UNPERSISTS (never destroy: a live lazy DataFrame may still hold an
# evicted broadcast — unpersist only drops executor copies and the
# next use lazily re-ships them, while destroy would fail that plan
# outright).  Keyed on applicationId, which unlike id(sc) is never
# reused after a context stops; releases on a stopped context are
# best-effort.
_BC_CACHE: OrderedDict = OrderedDict()
_BC_CACHE_MAX = 8


def _bitmap_broadcast(spark, bitmap: np.ndarray):
    import hashlib

    sc = spark.sparkContext
    key = (sc.applicationId, hashlib.sha256(bitmap.tobytes()).hexdigest())
    hit = _BC_CACHE.get(key)
    if hit is not None:
        _BC_CACHE.move_to_end(key)
        return hit
    bc = sc.broadcast(bitmap)
    _BC_CACHE[key] = bc
    while len(_BC_CACHE) > _BC_CACHE_MAX:
        _, old = _BC_CACHE.popitem(last=False)
        try:
            old.unpersist(False)
        except Exception:
            pass  # context already stopped; nothing to release
    return bc


def bloom_prune(
    df: DataFrame,
    col: str,
    bitmap: np.ndarray,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Map-side prune: keep rows whose key MIGHT be in the filter.

    No false negatives (every true key survives); false positives are
    removed by whatever exact join follows.  Arrow-batched vectorized
    membership test — one numpy gather per batch, no shuffle.  The
    bitmap rides a SparkContext broadcast (one torrent ship per
    executor, shared by every task), never the task closure.
    """

    positions = _make_positions(m_bits, k)
    bc = _bitmap_broadcast(df.sparkSession, bitmap)

    @F.pandas_udf(BooleanType())
    def member(keys: pd.Series) -> pd.Series:
        bm = bc.value
        kv = keys.to_numpy(dtype=np.int64, na_value=0)
        if not len(kv):
            return pd.Series([], dtype=bool)
        pos = positions(kv)
        bits = (bm[pos // 64] >> (pos % np.uint64(64))) & np.uint64(1)
        return pd.Series(bits.all(axis=1))

    # Non-deterministic marking (r14, guide §4.4): the function IS
    # deterministic, but declared so the optimizer's constraint
    # propagation would INFER the membership predicate across a later
    # equi-join onto the OTHER side — observed as a second
    # ArrowEvalPython evaluating the Python UDF over the entire
    # broadcast build side, where membership is true by construction
    # (its keys built the filter; no false negatives).  Marking it
    # non-deterministic pins the prune to the side the caller chose.
    return df.where(member.asNondeterministic()(F.col(col)))
