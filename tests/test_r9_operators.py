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


# ---------------------------------------------------------------------------
# JS-divergence corpus drift
# ---------------------------------------------------------------------------


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, source, text)."""
    df = spark.createDataFrame(
        [(d, s, t, "en", len(t)) for d, s, t in rows],
        "doc_id long, source string, text string, lang string, n_chars int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_drift_js_hand_computed_and_bounds(spark, tmp_path):
    """Planted two-term distributions: half 0 (even doc_ids) all 'aa',
    half 1 (odd) all 'bb' -> disjoint supports, JS = ln 2 exactly;
    a second source with IDENTICAL halves -> JS = 0."""
    import math

    from mahjong_etl_spark.operators.corpus import corpus_source_drift_js

    rows = []
    # source s1: evens say aa (x3 to clear min-count), odds say bb
    for i in range(6):
        rows.append((2 * i, "s1", "aa aa aa"))
        rows.append((2 * i + 1, "s1", "bb bb bb"))
    # source s2: both halves identical 50/50 mixture
    for i in range(6):
        rows.append((100 + 2 * i, "s2", "cc cc cc dd dd dd"))
        rows.append((101 + 2 * i, "s2", "cc cc cc dd dd dd"))
    sf = _write_docs(spark, tmp_path, rows)
    got = {r.source: r for r in corpus_source_drift_js(spark, sf).collect()}
    assert abs(got["s1"].js_divergence - math.log(2)) < 1e-6
    assert got["s1"].n_terms == 2
    # disjoint supports: both terms drift by probability 1
    assert got["s1"].top_drift_term == "aa"  # tiebreak: term asc
    assert abs(got["s1"].top_drift_delta - 1.0) < 1e-6
    assert got["s2"].js_divergence == 0.0
    assert got["s2"].top_drift_delta == 0.0


def test_drift_js_min_count_cuts_rare_terms(spark, tmp_path):
    """A term under VOCAB_MIN_COUNT in a half contributes 0 to that
    half (cut inside the aggregate), shifting — not crashing — the
    divergence; and JS stays within [0, ln 2]."""
    import math

    from mahjong_etl_spark.operators.corpus import corpus_source_drift_js

    rows = [
        (0, "s", "aa aa aa aa rare"),   # 'rare' x1 < 3: cut from half 0
        (2, "s", "aa aa aa aa"),
        (1, "s", "aa aa aa aa"),
        (3, "s", "aa aa aa aa"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    (r,) = corpus_source_drift_js(spark, sf).collect()
    assert r.n_terms == 1  # only 'aa' survives the cut in either half
    assert 0.0 <= r.js_divergence <= math.log(2) + 1e-9
    assert r.js_divergence < 1e-6  # identical surviving distributions


# ---------------------------------------------------------------------------
# audio energy segmentation
# ---------------------------------------------------------------------------


def _expected_segments(doc_id):
    h = doc_id * 2654435761 + 1234567
    bits = [(h >> f) & 1 for f in range(16)]
    runs, cur = [], 0
    for b in bits:
        if b:
            cur += 1
        elif cur:
            runs.append(cur)
            cur = 0
    if cur:
        runs.append(cur)
    return sum(bits), len(runs), max(runs) if runs else 0


def test_audio_segments_recover_planted_envelope(spark, tmp_path):
    """The full WAV encode->decode->frame-RMS->threshold->islands path
    must reproduce the planted voiced/silence bit pattern exactly,
    including an ALL-SILENT clip (n_segments = longest_run = 0)."""
    from mahjong_etl_spark.operators.multimodal import (
        multimodal_audio_segments,
    )

    # doc_id whose envelope hash has all-zero low 16 bits:
    # solve doc * 2654435761 + 1234567 == 0 (mod 2^16)
    silent = (-1234567 * pow(2654435761, -1, 1 << 16)) % (1 << 16)
    ids = [0, 1, 7, 12345, silent]
    sf = _write_docs(
        spark, tmp_path, [(d, "s", "x") for d in ids]
    )
    got = {
        r.doc_id: (r.n_voiced, r.n_segments, r.longest_run, r.voiced_ratio)
        for r in multimodal_audio_segments(spark, sf).collect()
    }
    assert set(got) == set(ids)
    for d in ids:
        nv, ns, lr = _expected_segments(d)
        assert got[d] == (nv, ns, lr, round(nv / 16.0, 6)), d
    nv_s, ns_s, lr_s = _expected_segments(silent)
    assert (nv_s, ns_s, lr_s) == (0, 0, 0)  # the edge case is real


def test_audio_segments_one_doc_exchange(spark, sf_dir):
    """r14 shape: the frame axis never leaves the Arrow batch — one
    row per doc out of the generator, so NO doc_id hash exchange and
    no window nodes remain (the only exchange is the final orderBy's
    range partitioning)."""
    from mahjong_etl_spark.operators.multimodal import (
        multimodal_audio_segments,
    )

    df = multimodal_audio_segments(spark, sf_dir)
    df.collect()
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange hashpartitioning") == 0
    assert plan.count("Window") == 0
    assert plan.count("MapInPandas") == 1


# ---------------------------------------------------------------------------
# leakage-safe split
# ---------------------------------------------------------------------------


def test_leakage_safe_split_groups_never_straddle(spark, tmp_path):
    """Planted duplicate groups whose members' PER-DOC hash buckets
    disagree: the leakage-safe split must put each group entirely in
    one split (zero straddle, by construction) and report exactly how
    many groups the naive per-doc split would have torn apart."""
    import hashlib

    from mahjong_etl_spark.operators.corpus import (
        VAL_HEX_CUTOFF,
        corpus_leakage_safe_split,
    )

    def naive(doc_id):
        b = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
        return "val" if b < VAL_HEX_CUTOFF else "train"

    ids = list(range(400))
    train_ids = [d for d in ids if naive(d) == "train"]
    val_ids = [d for d in ids if naive(d) == "val"]
    assert len(val_ids) >= 2 and len(train_ids) >= 2

    rows = []
    # group A: copies whose naive splits DISAGREE (one train, one val)
    rows.append((train_ids[0], "s", "Dup   Text one"))
    rows.append((val_ids[0], "s", "dup text ONE"))  # same normalized
    # group B: two copies, both naive-train (no naive leak)
    rows.append((train_ids[1], "s", "dup two"))
    rows.append((train_ids[2], "s", "DUP  TWO"))
    # singleton
    rows.append((val_ids[1], "s", "unique text"))
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.split: r for r in corpus_leakage_safe_split(spark, sf).collect()}

    # conservation: every doc and every group lands in exactly one split
    assert sum(r.n_docs for r in out.values()) == 5
    assert sum(r.n_groups for r in out.values()) == 3
    # exactly group A would have leaked under the per-doc split
    assert sum(r.naive_leaked_groups for r in out.values()) == 1
    # group A's split is decided by its representative (min doc_id)
    rep_split = naive(min(train_ids[0], val_ids[0]))
    assert out[rep_split].naive_leaked_groups == 1
