"""Unit tests for the as-of join operator and partition compaction."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mahjong_etl_spark.operators.asof import asof_join
from mahjong_etl_spark.plans.compaction import compact_table, partition_stats


def _ts(s: str):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "c1"),
            (1, _ts("2024-01-01 12:00:00"), "c2"),
            (2, _ts("2024-01-01 09:00:00"), "c3"),  # before any right row
            (3, _ts("2024-01-01 10:00:00"), "c4"),  # key with no right rows
        ],
        "k long, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), "r-early"),
            (1, _ts("2024-01-01 12:00:00"), "r-simultaneous"),
            (2, _ts("2024-01-01 11:00:00"), "r-late"),
        ],
        "k long, ts timestamp, tag string",
    )
    out = {
        (r.k, r.ev): r.tag_asof
        for r in asof_join(left, right, on="k", ts="ts").collect()
    }
    assert out == {
        (1, "c1"): "r-early",  # latest at-or-before 10:00
        (1, "c2"): "r-simultaneous",  # equal ts matches
        (2, "c3"): None,  # right row exists but only later
        (3, "c4"): None,  # no right rows for the key
    }


def test_asof_join_one_shuffle(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_micros(F.col("id") * 1000000).alias("ts"),
        F.col("id").alias("ev"),
    )
    right = spark.range(20).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_micros(F.col("id") * 4000000).alias("ts"),
        F.col("id").alias("tag"),
    )
    df = asof_join(left, right, on="k", ts="ts")
    df.collect()
    # AQE renders Final + Initial plans; count exchanges in the final only
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    # exactly one hash exchange (the per-key window); no join operator
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    root = str(tmp_path)
    df = spark.range(2000).select(
        F.lit("2024-01-02").alias("dt"), F.col("id"), (F.col("id") * 2).alias("v")
    )
    # fragment the partition into many small files
    df.repartition(16).write.partitionBy("dt").parquet(f"{root}/t")
    before = partition_stats(spark, root, "t")["2024-01-02"]
    assert before[0] == 16

    rewritten = compact_table(spark, root, "t", target_file_bytes=10**9)
    assert rewritten == {"2024-01-02": 1}
    after = partition_stats(spark, root, "t")["2024-01-02"]
    assert after[0] == 1

    back = spark.read.parquet(f"{root}/t")
    assert back.count() == 2000
    assert back.agg(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(2000))
    # idempotent: a second pass finds nothing to do
    assert compact_table(spark, root, "t", target_file_bytes=10**9) == {}


def test_asof_join_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "v1"),  # next right 10:30 (in tol)
            (1, _ts("2024-01-01 11:00:00"), "v2"),  # next right 14:00 (out of tol)
            (1, _ts("2024-01-01 14:00:00"), "v3"),  # simultaneous right matches
            (2, _ts("2024-01-01 09:00:00"), "v4"),  # no right rows for the key
        ],
        "k long, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:45:00"), "r-past"),  # behind every left: never matches forward
            (1, _ts("2024-01-01 10:30:00"), "r-near"),
            (1, _ts("2024-01-01 14:00:00"), "r-sim"),
        ],
        "k long, ts timestamp, tag string",
    )
    out = {
        (r.k, r.ev): r.tag_asof
        for r in asof_join(
            left, right, on="k", ts="ts", direction="forward",
            tolerance_seconds=3600,
        ).collect()
    }
    assert out == {
        (1, "v1"): "r-near",   # earliest at-or-after, within 1h
        (1, "v2"): None,       # next right is 3h away -> tolerance nulls it
        (1, "v3"): "r-sim",    # equal ts matches forward too
        (2, "v4"): None,
    }
    # backward with tolerance: v2's previous right (10:30) is within 1h
    back = {
        (r.k, r.ev): r.tag_asof
        for r in asof_join(
            left, right, on="k", ts="ts", direction="backward",
            tolerance_seconds=3600,
        ).collect()
    }
    assert back[(1, "v2")] == "r-near"
    assert back[(1, "v1")] == "r-past"  # 15 min back, in tolerance


def test_compaction_skips_partition_with_inflight_streaming_batch(spark, tmp_path):
    """A partition holding b{lineage}-{batch}- files whose commit
    marker is absent belongs to an in-flight streaming publish: its
    crash-replay erases by filename prefix, which compaction would
    destroy — so the partition must be skipped until the marker lands
    (r7 review)."""
    import os

    root = str(tmp_path)
    df = spark.range(200).select(
        F.lit("2024-01-02").alias("dt"), F.col("id"), (F.col("id") * 2).alias("v")
    )
    df.repartition(8).write.partitionBy("dt").parquet(f"{root}/t")
    pdir = f"{root}/t/dt=2024-01-02"
    plain = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
    # rename one file into the streaming-publish shape, NO marker
    key = "abcdef012345-3"
    os.rename(f"{pdir}/{plain[0]}", f"{pdir}/b{key}-{plain[0]}")

    assert compact_table(spark, root, "t", target_file_bytes=10**9) == {}

    # marker lands -> the batch is committed -> compaction proceeds
    os.makedirs(f"{root}/_batch_commits", exist_ok=True)
    open(f"{root}/_batch_commits/{key}", "w").close()
    assert compact_table(spark, root, "t", target_file_bytes=10**9) == {
        "2024-01-02": 1
    }
    back = spark.read.parquet(f"{root}/t")
    assert back.count() == 200


def test_compaction_never_drops_files_published_during_swap(spark, tmp_path, monkeypatch):
    """The r7 TOCTOU (advice, medium): a streaming micro-batch that
    publishes (and commits) between compaction's listing and its
    rewrite must survive.  The snapshot-swap deletes ONLY the listed
    files, so the late file rides through untouched."""
    import os

    import mahjong_etl_spark.plans.compaction as pc

    root = str(tmp_path)
    df = spark.range(100).select(
        F.lit("2024-01-02").alias("dt"), F.col("id"), (F.col("id") * 2).alias("v")
    )
    df.repartition(8).write.partitionBy("dt").parquet(f"{root}/t")
    pdir = f"{root}/t/dt=2024-01-02"

    # inject a committed streaming publish AFTER the listing happens
    real_stats = pc.partition_stats
    key = "0123456789ab-7"

    def stats_then_publish(spark_, root_, table_, part_col_="dt"):
        out = real_stats(spark_, root_, table_, part_col_)
        late = spark.range(1000, 1010).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        )
        late.coalesce(1).write.mode("overwrite").parquet(f"{root}/_late")
        src = [f for f in os.listdir(f"{root}/_late") if f.endswith(".parquet")][0]
        os.rename(f"{root}/_late/{src}", f"{pdir}/b{key}-{src}")
        os.makedirs(f"{root}/_batch_commits", exist_ok=True)
        open(f"{root}/_batch_commits/{key}", "w").close()
        return out

    monkeypatch.setattr(pc, "partition_stats", stats_then_publish)
    assert pc.compact_table(spark, root, "t", target_file_bytes=10**9) == {
        "2024-01-02": 1
    }
    # the late-published file survived the swap, rows intact: 100 + 10
    names = sorted(os.listdir(pdir))
    assert any(n.startswith(f"b{key}-") for n in names), names
    assert spark.read.parquet(f"{root}/t").count() == 110


def _fragment(spark, root, n=200):
    df = spark.range(n).select(
        F.lit("2024-01-02").alias("dt"), F.col("id"), (F.col("id") * 2).alias("v")
    )
    df.repartition(8).write.partitionBy("dt").parquet(f"{root}/t")


def test_compaction_crash_mid_move_rolls_back(spark, tmp_path, monkeypatch):
    """Crash while moving replacements in (before any original is
    deleted): repair deletes the landed replacements; originals are
    intact, row multiset unchanged, manifest cleared."""
    import os

    import pytest

    import mahjong_etl_spark.plans.compaction as pc
    import mahjong_etl_spark.streaming.etl_stream as es

    root = str(tmp_path)
    _fragment(spark, root)
    pdir = f"{root}/t/dt=2024-01-02"
    before = sorted(os.listdir(pdir))
    # force want=2 replacements so landing ONE is a partial move
    total = pc.partition_stats(spark, root, "t")["2024-01-02"][1]
    target = (total + 1) // 2

    calls = {"n": 0}
    real_par = es._par_files

    def crash_in_moves(fn, items):
        items = list(items)
        if items and isinstance(items[0], tuple):  # the move phase
            calls["n"] += 1
            fn(items[0])  # land exactly ONE replacement, then die
            raise RuntimeError("injected crash mid-move")
        return real_par(fn, items)

    monkeypatch.setattr(pc, "_par_files", crash_in_moves, raising=False)
    # compact_table resolves _par_files via its local import from
    # etl_stream; patch there instead
    monkeypatch.setattr(es, "_par_files", crash_in_moves)
    with pytest.raises(RuntimeError, match="injected crash"):
        pc.compact_table(spark, root, "t", target_file_bytes=target)
    assert calls["n"] == 1
    # ONE of two c{key}- replacements landed next to all 8 originals
    mid = sorted(os.listdir(pdir))
    assert len([n for n in mid if n.startswith("c")]) == 1
    assert set(before) <= set(mid)

    monkeypatch.setattr(es, "_par_files", real_par)
    fixed = pc.repair_compaction(spark, root)
    assert list(fixed.values()) == ["back"]
    after = sorted(os.listdir(pdir))
    assert after == before  # exact original snapshot restored
    assert spark.read.parquet(f"{root}/t").count() == 200
    assert pc.repair_compaction(spark, root) == {}  # idempotent


def test_compaction_crash_mid_delete_rolls_forward(spark, tmp_path, monkeypatch):
    """Crash while deleting originals (all replacements landed):
    repair finishes the deletion — compacted state, no duplicates."""
    import os

    import pytest

    import mahjong_etl_spark.plans.compaction as pc
    import mahjong_etl_spark.streaming.etl_stream as es

    root = str(tmp_path)
    _fragment(spark, root)
    pdir = f"{root}/t/dt=2024-01-02"

    real_par = es._par_files

    def crash_in_deletes(fn, items):
        items = list(items)
        if items and not isinstance(items[0], tuple) and "/dt=" in str(items[0]):
            fn(items[0])  # delete exactly ONE original, then die
            raise RuntimeError("injected crash mid-delete")
        return real_par(fn, items)

    monkeypatch.setattr(es, "_par_files", crash_in_deletes)
    with pytest.raises(RuntimeError, match="injected crash"):
        pc.compact_table(spark, root, "t", target_file_bytes=10**9)
    # both copies transiently on disk: 1 replacement + 7 originals
    mid = os.listdir(pdir)
    assert len([n for n in mid if n.startswith("c")]) == 1
    assert len([n for n in mid if n.startswith("part-")]) == 7

    monkeypatch.setattr(es, "_par_files", real_par)
    fixed = pc.repair_compaction(spark, root)
    assert list(fixed.values()) == ["forward"]
    after = [n for n in os.listdir(pdir) if n.endswith(".parquet")]
    assert len(after) == 1 and after[0].startswith("c")
    assert spark.read.parquet(f"{root}/t").count() == 200
    assert spark.read.parquet(f"{root}/t").select("id").distinct().count() == 200


def test_compaction_repair_converges_multiple_interrupted_swaps(spark, tmp_path, monkeypatch):
    """Several partitions' swaps interrupted in ONE run (first crashes
    mid-delete after its moves completed, leaving the rest never
    started): repair must roll the completed-move partition FORWARD
    and leave untouched partitions intact, in one pass."""
    import os

    import pytest

    import mahjong_etl_spark.plans.compaction as pc
    import mahjong_etl_spark.streaming.etl_stream as es

    root = str(tmp_path)
    df = spark.range(400).select(
        F.when(F.col("id") < 200, "2024-01-01").otherwise("2024-01-02").alias("dt"),
        F.col("id"),
        (F.col("id") * 2).alias("v"),
    )
    df.repartition(8).write.partitionBy("dt").parquet(f"{root}/t")

    real_par = es._par_files
    crashed = {"done": False}

    def crash_first_delete_phase(fn, items):
        items = list(items)
        if (
            items
            and not isinstance(items[0], tuple)
            and "/dt=" in str(items[0])
            and not crashed["done"]
        ):
            crashed["done"] = True
            fn(items[0])  # delete ONE original of the first partition
            raise RuntimeError("injected crash mid-delete")
        return real_par(fn, items)

    monkeypatch.setattr(es, "_par_files", crash_first_delete_phase)
    with pytest.raises(RuntimeError, match="injected crash"):
        pc.compact_table(spark, root, "t", target_file_bytes=10**9)

    monkeypatch.setattr(es, "_par_files", real_par)
    fixed = pc.repair_compaction(spark, root)
    assert list(fixed.values()) == ["forward"]
    # next run compacts the remaining fragmented partition normally
    out = pc.compact_table(spark, root, "t", target_file_bytes=10**9)
    assert len(out) == 1
    back = spark.read.parquet(f"{root}/t")
    assert back.count() == 400
    assert back.select("id").distinct().count() == 400
    for dt in ("2024-01-01", "2024-01-02"):
        files = [
            f
            for f in os.listdir(f"{root}/t/dt={dt}")
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (dt, files)
    assert not os.path.exists(f"{root}/_compaction") or not os.listdir(
        f"{root}/_compaction"
    )


def test_compaction_lease_blocks_overlapping_run(spark, tmp_path):
    """A LIVE lease (overlapping cron run) makes compact_table and the
    standalone repair refuse loudly — never roll back the live run's
    manifests; an EXPIRED lease (crashed holder) is taken over; the
    lease file is released after a successful run."""
    import json
    import time

    import pytest

    from mahjong_etl_spark.plans.compaction import (
        CompactionLeaseHeld,
        repair_compaction,
    )
    from mahjong_etl_spark.streaming.etl_stream import _meta_fs

    root = str(tmp_path)
    df = spark.range(500).select(
        F.lit("2024-01-02").alias("dt"), F.col("id"), (F.col("id") * 2).alias("v")
    )
    df.repartition(8).write.partitionBy("dt").parquet(f"{root}/t")

    fs = _meta_fs(spark, root)
    fs.mkdirs(f"{fs.root}/_compaction")
    fs.write_bytes(
        f"{fs.root}/_compaction/_lease",
        json.dumps(
            {"token": "other-live-run", "expires": time.time() + 600}
        ).encode(),
    )
    with pytest.raises(CompactionLeaseHeld):
        compact_table(spark, root, "t", target_file_bytes=10**9)
    with pytest.raises(CompactionLeaseHeld):
        repair_compaction(spark, root)
    # the live run's state is untouched
    assert partition_stats(spark, root, "t")["2024-01-02"][0] == 8

    # crashed holder: expired lease is taken over and the run proceeds
    fs.write_bytes(
        f"{fs.root}/_compaction/_lease",
        json.dumps(
            {"token": "crashed-run", "expires": time.time() - 1}
        ).encode(),
    )
    assert compact_table(spark, root, "t", target_file_bytes=10**9) == {
        "2024-01-02": 1
    }
    assert spark.read.parquet(f"{root}/t").count() == 500
    # released: the lease file is gone, a fresh run is unblocked
    assert fs.kind(f"{fs.root}/_compaction/_lease") is None
    assert compact_table(spark, root, "t", target_file_bytes=10**9) == {}


def test_unparseable_lease_treated_as_held_not_absent(spark, tmp_path):
    """A present-but-unparseable lease is a LIVE holder's partially
    visible write (no atomic create-exclusive in the portable FS
    surface), not an absent lease: an acquirer must refuse loudly and
    must NOT overwrite it (the pre-r10 behavior treated it as absent
    and steamrolled the live holder)."""
    import pytest

    from mahjong_etl_spark.plans.compaction import (
        CompactionLeaseHeld,
        _acquire_lease,
    )
    from mahjong_etl_spark.streaming.etl_stream import _meta_fs

    fs = _meta_fs(spark, str(tmp_path))
    fs.mkdirs(f"{fs.root}/_compaction")
    torn = b'{"token": "live-holder", "expi'  # torn mid-write
    fs.write_bytes(f"{fs.root}/_compaction/_lease", torn)
    with pytest.raises(CompactionLeaseHeld):
        _acquire_lease(fs, 600)
    # the torn lease survives — the racer never overwrote it
    assert fs.read_bytes(f"{fs.root}/_compaction/_lease") == torn
    # and it blocks for the FULL default TTL, not a 1-second grace
    # (r10 advice: a retry >1s later must still refuse — a live
    # holder's torn write gets the same protection as a valid lease)
    import time

    from mahjong_etl_spark.plans.compaction import (
        DEFAULT_LEASE_TTL_SEC,
        _read_lease,
    )

    info = _read_lease(fs)
    assert info["token"] == "<unparseable>"
    assert info["expires"] - time.time() > 0.9 * DEFAULT_LEASE_TTL_SEC


def test_compaction_lease_renewal_and_theft_detection(spark, tmp_path):
    """A long run renews per partition; a mid-run theft (another taker
    after TTL expiry) aborts loudly instead of continuing unprotected."""
    import json

    import pytest

    from mahjong_etl_spark.plans.compaction import (
        CompactionLeaseHeld,
        _acquire_lease,
        _read_lease,
        _renew_lease,
    )
    from mahjong_etl_spark.streaming.etl_stream import _meta_fs

    fs = _meta_fs(spark, str(tmp_path))
    token = _acquire_lease(fs, ttl_sec=900)
    before = float(_read_lease(fs)["expires"])
    _renew_lease(fs, token, ttl_sec=2000)
    assert float(_read_lease(fs)["expires"]) > before

    # theft: another compactor overwrote the lease (saw it expired)
    fs.write_bytes(
        f"{fs.root}/_compaction/_lease",
        json.dumps({"token": "thief", "expires": 9e18}).encode(),
    )
    with pytest.raises(CompactionLeaseHeld, match="mid-run"):
        _renew_lease(fs, token, ttl_sec=900)


def test_repair_rolls_back_pre_r11_manifest_with_dt_key(spark, tmp_path):
    """A pre-r11 manifest stored the partition VALUE under "dt" (no
    "part"/"part_col" keys).  A leftover interrupted swap journaled in
    that shape must still roll back/forward — the r11 generalization
    read m['part'] unconditionally, so such a manifest raised KeyError
    at the top of every compact_table/repair_compaction call,
    permanently wedging compaction (ADVICE r12)."""
    import json
    import os
    import shutil

    import mahjong_etl_spark.plans.compaction as pc

    root = str(tmp_path)
    _fragment(spark, root)
    pdir = f"{root}/t/dt=2024-01-02"
    before = sorted(n for n in os.listdir(pdir) if n.endswith(".parquet"))
    # simulate the pre-r11 crash point: ONE of two replacements landed
    landed = "clegacy0-part-00000.parquet"
    shutil.copy(f"{pdir}/{before[0]}", f"{pdir}/{landed}")
    os.makedirs(f"{root}/_compaction", exist_ok=True)
    with open(f"{root}/_compaction/legacy0", "w") as f:
        json.dump(
            {
                "table": "t",
                "dt": "2024-01-02",  # the legacy key layout
                "add": [landed, "clegacy0-part-00001.parquet"],
                "delete": before,
            },
            f,
        )
    fixed = pc.repair_compaction(spark, root)
    assert fixed == {"legacy0": "back"}
    after = sorted(n for n in os.listdir(pdir) if n.endswith(".parquet"))
    assert after == before  # originals intact, landed replacement gone
    assert spark.read.parquet(f"{root}/t").count() == 200
    # compaction itself must also run (it repairs first) — the wedge
    assert pc.compact_table(spark, root, "t", target_file_bytes=10**9) == {
        "2024-01-02": 1
    }


def test_compaction_recognizes_suffixed_batch_keys(spark, tmp_path):
    """r14 fix: the admission gate and the minhash shingle appends
    publish under SUFFIXED keys (b{lineage}-{batch}-bands / -sh /
    -adm).  The old prefix regex truncated them to {lineage}-{batch},
    whose marker never exists, so COMMITTED batches looked in-flight
    forever and their partitions were silently never compacted.  The
    key is now everything before '-part-'; an uncommitted suffixed
    batch still skips."""
    import os

    root = str(tmp_path)
    df = spark.range(200).select(
        F.lit("admit").alias("gate"), F.col("id"), (F.col("id") * 2).alias("v")
    )
    df.repartition(8).write.partitionBy("gate").parquet(f"{root}/admissions")
    pdir = f"{root}/admissions/gate=admit"
    plain = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
    key = "abcdef012345-0-adm"
    os.rename(f"{pdir}/{plain[0]}", f"{pdir}/b{key}-{plain[0]}")

    # no marker: in-flight, skipped
    assert (
        compact_table(
            spark, root, "admissions", target_file_bytes=10**9,
            part_col="gate",
        )
        == {}
    )
    # the SUFFIXED marker commits the batch -> compaction folds it
    os.makedirs(f"{root}/_batch_commits", exist_ok=True)
    open(f"{root}/_batch_commits/{key}", "w").close()
    assert compact_table(
        spark, root, "admissions", target_file_bytes=10**9, part_col="gate"
    ) == {"admit": 1}
    assert spark.read.parquet(f"{root}/admissions").count() == 200
