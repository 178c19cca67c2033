"""Round-10 contracts: the CUSUM reflection identity against a direct
recursive reference, and the vocabulary coverage curve's invariants —
semantics the sf-corpus oracles can't see (oracle parity itself rides
the strict sweep, as for the r7-r9 batches)."""

from __future__ import annotations

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# CUSUM: window reflection form == the textbook recursion
# ---------------------------------------------------------------------------


def _cusum_reference(values, n, sum_v, slack_centi, h_centi):
    """Direct Page-1954 recursion S_i = max(0, S_{i-1} + y_i) on the
    same n-scaled integer grid as the query."""
    s = 0
    max_s = 0
    breaches = 0
    first_breach_idx = None
    for i, vc in enumerate(values):
        y = n * vc - sum_v - n * slack_centi
        s = max(0, s + y)
        max_s = max(max_s, s)
        if s > n * h_centi:
            breaches += 1
            if first_breach_idx is None:
                first_breach_idx = i
    return max_s, breaches, first_breach_idx


def test_cusum_matches_direct_recursion(spark, sf_dir):
    """The reflection identity S_i = P_i - min(0, min_{j<=i} P_j) the
    query computes with two cumulative windows must equal the direct
    max(0, S+y) recursion replayed in python over the same ordered
    series — per type: same max statistic, same breach count, same
    first-breach timestamp."""
    from mahjong_etl_spark.plans.queries import (
        CUSUM_H_CENTI,
        CUSUM_SLACK_CENTI,
        events_cusum_changepoint,
    )

    got = {
        r.event_type: r
        for r in events_cusum_changepoint(spark, sf_dir).collect()
    }
    raw = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            "ts",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("vc"),
        )
        .orderBy("event_type", "ts", "event_id")
        .collect()
    )
    series: dict[str, list] = {}
    for r in raw:
        series.setdefault(r.event_type, []).append((r.ts, r.vc))
    assert set(got) == set(series)
    for et, pairs in series.items():
        vals = [vc for _, vc in pairs]
        n, sum_v = len(vals), sum(vals)
        max_s, breaches, first_idx = _cusum_reference(
            vals, n, sum_v, CUSUM_SLACK_CENTI, CUSUM_H_CENTI
        )
        row = got[et]
        assert row.n_events == n
        assert row.n_breaches == breaches, et
        assert abs(row.max_cusum - max_s / (100.0 * n)) < 1e-4, et
        if first_idx is None:
            assert row.first_breach_ts is None
        else:
            want_ts = pairs[first_idx][0]
            assert row.first_breach_ts == want_ts.strftime(
                "%Y-%m-%d %H:%M:%S"
            ), et


def test_cusum_flags_planted_mean_shift(spark, tmp_path):
    """A series that sits at the mean then shifts up must breach, and
    the first breach must land inside the shifted regime — the drift
    case a point z-score never flags (no single value is extreme)."""
    from datetime import datetime, timedelta

    from mahjong_etl_spark.plans.queries import events_cusum_changepoint

    t0 = datetime(2024, 1, 1)
    # 200 steady values of 10.0, then 200 at 14.0: each shifted point
    # is ~1σ of the pooled series (never a point outlier), but the
    # +1.5-above-(mean+slack) drift accumulates past h in ~14 steps
    rows = [
        (i, t0 + timedelta(seconds=i), 1, "drift", 10.0 if i < 200 else 14.0)
        for i in range(400)
    ]
    df = spark.createDataFrame(
        [(e, t, u, ty, v, "{}") for e, t, u, ty, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    (row,) = events_cusum_changepoint(spark, str(tmp_path)).collect()
    assert row.n_breaches > 0
    # breach strictly inside the shifted half
    assert row.first_breach_ts >= (t0 + timedelta(seconds=200)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def test_cusum_overflows_loudly_not_silently(spark, tmp_path):
    """Past the int64 headroom the chart must RAISE (as the DuckDB
    oracle does on int64 overflow), never wrap into wrong breach
    counts (r10 advice): a series whose n²·max|vc| bound exceeds 2^62
    trips the per-type guard with a message naming the fix."""
    from datetime import datetime, timedelta

    import pytest

    from mahjong_etl_spark.plans.queries import events_cusum_changepoint

    t0 = datetime(2024, 1, 1)
    # 1000 rows at value ~ 1e12 -> vc ~ 1e14 centi-units: sum_v ~ 1e17
    # fits int64 (the plain aggregate is fine, ANSI or not), but the
    # n-scaled accumulator bound 2·n·(n·max|vc| + |sum_v|) ~ 4e20
    # exceeds 2^62 ~ 4.6e18 — exactly the regime where the window
    # cumsum would be the thing that overflows
    rows = [
        (i, t0 + timedelta(seconds=i), 1, "huge", 1.0e12 + i, "{}")
        for i in range(1000)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    with pytest.raises(Exception, match="CUSUM headroom"):
        events_cusum_changepoint(spark, str(tmp_path)).collect()


# ---------------------------------------------------------------------------
# vocabulary coverage curve invariants
# ---------------------------------------------------------------------------


def test_vocab_coverage_curve_invariants(spark, sf_dir):
    """Coverage is a cumulative share: monotone non-decreasing in the
    budget, in (0, 1], n_terms_used = min(budget, |vocab|), and
    covered_tokens/total_tokens re-derivable from the raw term
    frequencies."""
    from mahjong_etl_spark.operators.text_analysis import (
        VOCAB_BUDGETS,
        text_vocab_coverage,
    )

    rows = sorted(
        text_vocab_coverage(spark, sf_dir).collect(),
        key=lambda r: r.vocab_budget,
    )
    assert [r.vocab_budget for r in rows] == sorted(VOCAB_BUDGETS)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    from collections import Counter

    tf = Counter()
    for d in docs:
        tf.update(d.text.split(" "))
    total = sum(tf.values())
    ordered = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))

    prev = 0.0
    for r in rows:
        want_terms = min(r.vocab_budget, len(ordered))
        want_covered = sum(c for _, c in ordered[:want_terms])
        assert r.n_terms_used == want_terms
        assert r.covered_tokens == want_covered
        assert r.total_tokens == total
        assert abs(r.coverage - want_covered / total) < 1e-6
        assert 0.0 < r.coverage <= 1.0
        assert r.coverage >= prev
        prev = r.coverage
