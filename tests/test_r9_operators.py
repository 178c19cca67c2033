"""Round-9 contracts: the bounded session-path aggregation buffer and
the approx-percentile MAD twin's tolerance laws — semantics the
sf-corpus oracles can't see (oracle parity itself rides the strict
sweep, as for the r7/r8 batches)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_iso, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [(e, t, u, ty, v, "{}") for e, t, u, ty, v in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.to_timestamp("ts").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


# ---------------------------------------------------------------------------
# session paths: the aggregation buffer is bounded at 8 entries
# ---------------------------------------------------------------------------


def test_session_paths_giant_session_bounded_buffer(spark, tmp_path):
    """One 100k-event session (the bot/service-user skew case the r8
    verdict flagged): the path must still be the first-8 prefix and
    n_events the full count — and the PLAN must show the prefix cut
    happening BEFORE aggregation (collect_list over the rn<=8
    conditional, never over the raw event structs), so no aggregation
    buffer ever materializes the whole session."""
    from mahjong_etl_spark.plans.queries import events_session_paths

    from datetime import datetime, timedelta

    n = 100_000
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    # 1-second spacing: every gap far below 30 min -> ONE session
    rows = [
        (
            i,
            (t0 + timedelta(seconds=i)).strftime("%Y-%m-%d %H:%M:%S"),
            7,
            f"T{min(i, 11)}",
            1.0,
        )
        for i in range(n)
    ]
    sf = _write_events(spark, tmp_path, rows)
    df = events_session_paths(spark, sf)
    (r,) = df.collect()
    assert r.path == ">".join(f"T{i}" for i in range(8))
    assert r.n_sessions == 1 and r.n_events == n

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    (cl_line,) = [
        ln
        for ln in plan.splitlines()
        if "collect_list" in ln and "Aggregate" in ln
    ]
    # the buffer admits only rn<=8 rows; the raw ts never enters it
    assert "rn" in cl_line.split("collect_list", 1)[1]
    assert "CASE WHEN" in cl_line.split("collect_list", 1)[1]


def test_session_paths_ties_and_order_stable(spark, tmp_path):
    """row_number prefix selection keeps (ts, event_id) order: equal
    timestamps break by event_id, exactly like the pre-r9 array_sort
    semantics (CORRECTNESS hash must not move)."""
    from mahjong_etl_spark.plans.queries import events_session_paths

    rows = [
        (5, "2024-01-01 10:00:00", 1, "B", 1.0),
        (2, "2024-01-01 10:00:00", 1, "A", 1.0),
        (9, "2024-01-01 10:01:00", 1, "C", 1.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    (r,) = events_session_paths(spark, sf).collect()
    assert r.path == "A>B>C"


# ---------------------------------------------------------------------------
# approx-percentile MAD twin
# ---------------------------------------------------------------------------


def test_anomaly_mad_approx_same_shape_and_screen(spark, sf_dir):
    """The knob changes the percentile engine ONLY: identical output
    schema, and at test scale (per-type counts far below the GK
    accuracy=10000 rank-error budget) the flagged top-25 screen must
    agree with the exact twin almost everywhere."""
    from mahjong_etl_spark.plans.queries import (
        events_anomaly_mad,
        events_anomaly_mad_approx,
    )

    exact = events_anomaly_mad(spark, sf_dir)
    approx = events_anomaly_mad_approx(spark, sf_dir)
    assert exact.schema == approx.schema

    ex = {r.event_id: r.robust_z for r in exact.collect()}
    ap = {r.event_id: r.robust_z for r in approx.collect()}
    common = set(ex) & set(ap)
    assert len(common) >= min(len(ex), len(ap)) - 2
    assert all(abs(ex[i] - ap[i]) < 0.25 for i in common)


def test_anomaly_mad_approx_median_rank_error_bound(spark, tmp_path):
    """GK contract on hand-built data: with values 1..N per type, the
    approx median's RANK error is within N*(1/accuracy)+1 of N/2, and
    (approx_percentile returns a data value) the result is one of the
    inputs — no interpolation off the int64 milli-grid."""
    n = 5000
    rows = [
        (i, "2024-01-01 10:00:00", i % 50, "click", float(i + 1))
        for i in range(n)
    ]
    sf = _write_events(spark, tmp_path, rows)
    e = spark.read.parquet(str(tmp_path / "events.parquet"))
    (got,) = (
        e.groupBy("event_type")
        .agg(
            F.expr(
                "approx_percentile(CAST(round(value*1000) AS BIGINT),"
                " 0.5, 10000)"
            ).alias("med_m")
        )
        .collect()
    )
    # values are (i+1)*1000 exactly: rank of med_m among them
    rank = got.med_m / 1000
    assert abs(rank - n / 2) <= n / 10000 + 1
    assert got.med_m % 1000 == 0  # an actual grid value, never between


def test_anomaly_mad_approx_broadcast_plan_shape(spark, sf_dir):
    """The approx twin keeps the exact twin's plan skeleton: three
    broadcast joins of rows-of-types tables, TakeOrdered cut, no
    sort-merge join anywhere."""
    from mahjong_etl_spark.plans.queries import events_anomaly_mad_approx

    df = events_anomaly_mad_approx(spark, sf_dir)
    df.collect()
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 3
    assert "TakeOrderedAndProject" in plan
