"""Bloom-filter build/prune properties (functions/bloom.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahjong_etl_spark.functions.bloom import (
    _make_positions,
    bloom_build,
    bloom_prune,
)
from mahjong_etl_spark.sources.tables import load


def test_no_false_negatives(spark):
    keys = list(range(0, 5000, 3)) + [-7, 2**40 + 13]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    bm = bloom_build(df, "k")
    kept = {r.k for r in bloom_prune(df, "k", bm).collect()}
    assert kept == set(keys)


def test_false_positive_rate_bounded(spark):
    member = spark.createDataFrame([(k,) for k in range(10_000)], ["k"])
    bm = bloom_build(member, "k")
    probe = spark.range(1_000_000, 1_050_000).withColumnRenamed("id", "k")
    fp = bloom_prune(probe, "k", bm).count()
    # 1 MiB / k=7 at 10^4 keys: theoretical fp << 1%; allow slack
    assert fp / 50_000 < 0.01


def test_positions_deterministic_and_spread():
    keys = np.arange(1000, dtype=np.int64)
    pos = _make_positions(1 << 20, 7)
    p1 = pos(keys)
    p2 = pos(keys.copy())
    assert (p1 == p2).all()
    # double hashing must not collapse: distinct positions per key
    assert (np.sort(p1, axis=1)[:, :-1] != np.sort(p1, axis=1)[:, 1:]).any()


def test_pruned_join_equals_plain_join(spark, sf_dir):
    from mahjong_etl_spark.plans.queries import (
        BLOOM_PRICE_CUT,
        bloom_pruned_revenue,
    )

    got = {
        (r.o_orderpriority, r.n_items, r.revenue)
        for r in bloom_pruned_revenue(spark, sf_dir).collect()
    }
    o = load(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > BLOOM_PRICE_CUT
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("pc"),
    )
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum("pc").cast("double") / F.lit(100.0)).alias("revenue"),
        )
    )
    want = {(r.o_orderpriority, r.n_items, r.revenue) for r in plain.collect()}
    assert got == want


def test_prune_actually_prunes(spark, sf_dir):
    # the pruned lineitem stream must be close to the true match count
    # (selectivity ~10%), far below the full table
    from mahjong_etl_spark.functions.bloom import bloom_build, bloom_prune
    from mahjong_etl_spark.plans.queries import BLOOM_PRICE_CUT

    o = load(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > BLOOM_PRICE_CUT
    )
    bm = bloom_build(o, "o_orderkey")
    li = load(spark, sf_dir, "lineitem")
    total = li.count()
    pruned = bloom_prune(li, "l_orderkey", bm).count()
    true = li.join(o, li.l_orderkey == o.o_orderkey, "left_semi").count()
    assert true <= pruned  # no false negatives
    assert pruned <= true + int(0.01 * total) + 10  # fp slack
    assert pruned < total / 2


# -- property-based invariants (numpy level, no Spark session cost) --

from hypothesis import given, settings
from hypothesis import strategies as st

_keys = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=500
)


@given(_keys)
@settings(max_examples=200, deadline=None)
def test_membership_never_false_negative_property(keys):
    import numpy as np

    from mahjong_etl_spark.functions.bloom import _make_positions

    m_bits, k = 1 << 16, 7
    pos_fn = _make_positions(m_bits, k)
    arr = np.asarray(keys, dtype=np.int64)
    bitmap = np.zeros(m_bits // 64, dtype=np.uint64)
    pos = pos_fn(arr).ravel()
    np.bitwise_or.at(bitmap, pos // 64, np.uint64(1) << (pos % np.uint64(64)))
    # every inserted key must test positive
    probe = pos_fn(arr)
    bits = (bitmap[probe // 64] >> (probe % np.uint64(64))) & np.uint64(1)
    assert bits.all()


@given(_keys)
@settings(max_examples=100, deadline=None)
def test_positions_in_range_property(keys):
    import numpy as np

    from mahjong_etl_spark.functions.bloom import _make_positions

    m_bits, k = 1 << 16, 7
    pos = _make_positions(m_bits, k)(np.asarray(keys, dtype=np.int64))
    assert pos.shape == (len(keys), k)
    assert (pos < m_bits).all()


def test_coexisting_filters_and_cache_eviction_keep_live_plans_valid(spark):
    """Two pruned DataFrames over DIFFERENT bitmaps must both stay
    collectable — including after the broadcast cache evicts their
    entries (eviction unpersists, never destroys: a destroyed
    broadcast fails any live plan still referencing it).  Also pins
    the cache actually capping (r7 review findings on _BC_CACHE)."""
    from mahjong_etl_spark.functions import bloom

    df = spark.createDataFrame([(k,) for k in range(1000)], ["k"])
    bm_even = bloom_build(df.where(F.col("k") % 2 == 0), "k")
    bm_big = bloom_build(df.where(F.col("k") >= 500), "k")

    pruned_even = bloom_prune(df, "k", bm_even)  # lazy — not collected yet
    pruned_big = bloom_prune(df, "k", bm_big)

    # churn the cache past its cap with distinct single-key bitmaps
    for i in range(bloom._BC_CACHE_MAX + 2):
        bm_i = bloom_build(df.where(F.col("k") == i), "k")
        assert bloom_prune(df, "k", bm_i).count() >= 1
    assert len(bloom._BC_CACHE) <= bloom._BC_CACHE_MAX

    # the early plans (whose broadcasts were evicted) still execute
    kept_even = {r.k for r in pruned_even.collect()}
    kept_big = {r.k for r in pruned_big.collect()}
    assert set(range(0, 1000, 2)) <= kept_even
    assert set(range(500, 1000)) <= kept_big
    assert all(k % 2 == 0 or k in kept_big for k in kept_even | kept_big)
