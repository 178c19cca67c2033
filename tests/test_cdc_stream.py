"""Streaming CDC apply (streaming/cdc_stream.py): chopped change-feed
arrivals must converge to the batch apply_changes fold, with the
versioned-snapshot + pointer-swap publish surviving every crash
window exactly-once."""

from __future__ import annotations

import json
import os
import time

import pytest

from pyspark.sql import functions as F

from mahjong_etl_spark.streaming.cdc_stream import (
    CURRENT_PTR,
    read_current,
    run_scd1_stream,
)

_CHANGE_SCHEMA = (
    "k long, op string, change_seq long, name string, score long"
)


def _drop(tmp_path, name, rows, mtime):
    d = tmp_path / "changes"
    d.mkdir(exist_ok=True)
    p = d / name
    with open(p, "w") as f:
        for k, op, seq, nm, sc in rows:
            f.write(
                json.dumps(
                    {"k": k, "op": op, "change_seq": seq, "name": nm, "score": sc}
                )
                + "\n"
            )
    os.utime(p, (mtime, mtime))
    return str(d)


def _stream(spark, changes_dir):
    return (
        spark.readStream.schema(_CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(changes_dir)
    )


def _drain(spark, changes_dir, base, ckpt, **kw):
    q = run_scd1_stream(spark, _stream(spark, changes_dir), base, ckpt, "k", **kw)
    assert q.awaitTermination(120), "stream did not drain in time"
    q.stop()
    time.sleep(0.2)


def _snapshot(spark, base):
    df = read_current(spark, base)
    return {r.k: (r.name, r.score) for r in df.collect()} if df is not None else None


def test_chopped_arrivals_converge_to_batch_fold(spark, tmp_path):
    """Three files -> three micro-batches; the final snapshot must be
    the latest-wins fold of the whole feed, deletes included, and the
    within-batch compaction must keep the highest change_seq."""
    base, ckpt = str(tmp_path / "base"), str(tmp_path / "ckpt")
    d = _drop(tmp_path, "b0.jsonl", [
        (1, "upsert", 1, "alice", 10),
        (2, "upsert", 2, "bob", 20),
        (2, "upsert", 3, "bobby", 21),  # same batch: seq 3 wins
    ], 1_000)
    _drop(tmp_path, "b1.jsonl", [
        (1, "delete", 4, None, None),
        (3, "upsert", 5, "carol", 30),
    ], 2_000)
    _drop(tmp_path, "b2.jsonl", [
        (1, "upsert", 6, "alice2", 11),  # re-insert after delete
        (3, "upsert", 7, "carol", 31),
    ], 3_000)

    _drain(spark, d, base, ckpt)
    assert _snapshot(spark, base) == {
        1: ("alice2", 11),
        2: ("bobby", 21),
        3: ("carol", 31),
    }
    # one committed marker per drained batch, pointer names the newest
    assert len(os.listdir(f"{base}/_merge_commits")) == 3
    with open(f"{base}/{CURRENT_PTR}") as f:
        assert f.read().strip().endswith("-2")


def test_incremental_drains_match_single_drain(spark, tmp_path):
    """Arrivals chopped across two separate query runs (restart from
    the same checkpoint) fold identically to one run."""
    base, ckpt = str(tmp_path / "base"), str(tmp_path / "ckpt")
    d = _drop(tmp_path, "b0.jsonl", [(1, "upsert", 1, "a", 1)], 1_000)
    _drain(spark, d, base, ckpt)
    assert _snapshot(spark, base) == {1: ("a", 1)}
    _drop(tmp_path, "b1.jsonl", [
        (1, "delete", 2, None, None),
        (2, "upsert", 3, "b", 2),
    ], 2_000)
    _drain(spark, d, base, ckpt)
    assert _snapshot(spark, base) == {2: ("b", 2)}


def test_crash_before_pointer_swap_replays_cleanly(spark, tmp_path, monkeypatch):
    """Kill the merge AFTER the snapshot directory is written but
    BEFORE the pointer swaps: the pointer still names the old
    snapshot; the replay rewrites the version dir and points it —
    no duplicates, no lost changes."""
    import mahjong_etl_spark.streaming.cdc_stream as cs

    base, ckpt = str(tmp_path / "base"), str(tmp_path / "ckpt")
    d = _drop(tmp_path, "b0.jsonl", [(1, "upsert", 1, "a", 1)], 1_000)
    _drain(spark, d, base, ckpt)

    real_meta = cs._meta_fs
    state = {"armed": True}

    def crashing_meta(session, path):
        fs = real_meta(session, path)
        if not state["armed"]:
            return fs
        real_write = fs.write_bytes

        def write_bytes(p, data):
            if ".tmp-" in p and state["armed"]:
                state["armed"] = False
                raise RuntimeError("injected crash before pointer swap")
            real_write(p, data)

        fs.write_bytes = write_bytes
        return fs

    monkeypatch.setattr(cs, "_meta_fs", crashing_meta)
    _drop(tmp_path, "b1.jsonl", [(2, "upsert", 2, "b", 2)], 2_000)
    q = run_scd1_stream(spark, _stream(spark, d), base, ckpt, "k")
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(120)
    q.stop()
    time.sleep(0.2)
    # pointer untouched: readers still see the old snapshot
    assert _snapshot(spark, base) == {1: ("a", 1)}

    monkeypatch.setattr(cs, "_meta_fs", real_meta)
    _drain(spark, d, base, ckpt)
    assert _snapshot(spark, base) == {1: ("a", 1), 2: ("b", 2)}


def test_crash_between_swap_and_marker_does_not_remerge(spark, tmp_path, monkeypatch):
    """The OTHER window: pointer swapped, marker missing (simulated by
    deleting the marker and the checkpoint commit).  The replay must
    recognize the pointer as the commit point — recording the marker
    without re-merging (a re-merge would read the new snapshot and
    overwrite the directory it reads from)."""
    import glob

    import mahjong_etl_spark.streaming.cdc_stream as cs

    base, ckpt = str(tmp_path / "base"), str(tmp_path / "ckpt")
    d = _drop(tmp_path, "b0.jsonl", [(1, "upsert", 1, "a", 1)], 1_000)
    _drain(spark, d, base, ckpt)

    os.remove(glob.glob(f"{base}/_merge_commits/*-0")[0])
    os.remove(os.path.join(ckpt, "commits", "0"))
    crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)

    writes = []
    real_compact = cs.compact_batch

    def spying_compact(df, key, seq_col="change_seq"):
        writes.append(1)
        return real_compact(df, key, seq_col)

    monkeypatch.setattr(cs, "compact_batch", spying_compact)
    _drain(spark, d, base, ckpt)
    assert writes == []  # fast path: no re-merge happened
    assert _snapshot(spark, base) == {1: ("a", 1)}
    assert glob.glob(f"{base}/_merge_commits/*-0")  # marker restored


def test_missing_pointer_recovers_from_commit_markers(spark, tmp_path):
    """A legacy no-pointer state (pre-journal writers could crash in a
    delete(_current)->move window): the pointer file is GONE but
    commits exist.  A reader must resolve the newest committed
    snapshot (never observe the dimension vanishing), and the next
    batch's merge must fold against that recovered base — not
    silently rebuild the dimension from one batch's upserts."""
    base, ckpt = str(tmp_path / "base"), str(tmp_path / "ckpt")
    d = _drop(tmp_path, "b0.jsonl", [
        (1, "upsert", 1, "a", 1),
        (2, "upsert", 2, "b", 2),
    ], 1_000)
    _drain(spark, d, base, ckpt)
    assert _snapshot(spark, base) == {1: ("a", 1), 2: ("b", 2)}

    # simulate the crash point: pointer deleted, replacement never
    # moved in (a stray tmp may linger — it must be ignored)
    os.remove(f"{base}/{CURRENT_PTR}")
    with open(f"{base}/{CURRENT_PTR}.tmp-deadbeef", "w") as f:
        f.write("_vbogus-99")

    # reader recovery: the committed snapshot is still visible
    assert _snapshot(spark, base) == {1: ("a", 1), 2: ("b", 2)}

    # writer recovery: the next merge folds against the recovered base
    _drop(tmp_path, "b1.jsonl", [(3, "upsert", 3, "c", 3)], 2_000)
    _drain(spark, d, base, ckpt)
    assert _snapshot(spark, base) == {
        1: ("a", 1),
        2: ("b", 2),
        3: ("c", 3),
    }
    # the swap re-established the pointer file itself
    with open(f"{base}/{CURRENT_PTR}") as f:
        assert f.read().strip().endswith("-1")


def test_parked_pointer_journal_beats_cross_lineage_markers(spark, tmp_path):
    """The rename-fallback park journal: with _current parked under
    .prev-{bkey} (the crash window between park and move-in), a reader
    resolves the PARKED value — even when a stale higher-batch marker
    from another lineage survives (the checkpoint-re-mint trap: batch
    numbers are only comparable within one lineage) — and the next
    writer restores the pointer before merging."""
    import shutil

    base, ckpt = str(tmp_path / "base"), str(tmp_path / "ckpt")
    d = _drop(tmp_path, "b0.jsonl", [(1, "upsert", 1, "a", 1)], 1_000)
    _drop(tmp_path, "b1.jsonl", [(2, "upsert", 2, "b", 2)], 2_000)
    _drain(spark, d, base, ckpt, keep_versions=2)
    with open(f"{base}/{CURRENT_PTR}") as f:
        current = f.read().strip()
    assert current.endswith("-1")

    # plant a STALE other-lineage commit (higher batch number, older
    # data): marker aaaaaaaaaaaa-99 + its _v dir cloned from batch 0
    v0 = current.rsplit("-", 1)[0] + "-0"
    shutil.copytree(f"{base}/{v0}", f"{base}/_vaaaaaaaaaaaa-99")
    open(f"{base}/_merge_commits/aaaaaaaaaaaa-99", "w").close()

    # crash window: pointer parked, replacement never moved in
    os.rename(f"{base}/{CURRENT_PTR}", f"{base}/{CURRENT_PTR}.prev-x")

    # reader resolves the journal (batch-1 data), NOT the stale
    # higher-batch marker of the foreign lineage (batch-0 data)
    assert _snapshot(spark, base) == {1: ("a", 1), 2: ("b", 2)}

    # writer restores the pointer, then folds normally
    _drop(tmp_path, "b2.jsonl", [(3, "upsert", 3, "c", 3)], 3_000)
    _drain(spark, d, base, ckpt, keep_versions=2)
    assert _snapshot(spark, base) == {
        1: ("a", 1),
        2: ("b", 2),
        3: ("c", 3),
    }
    assert not [
        p for p in os.listdir(base) if p.startswith(f"{CURRENT_PTR}.prev-")
    ]


def test_recover_pointer_prefers_live_current_over_legacy_markers(
    spark, tmp_path
):
    """The r10 race fix: a reader that entered recovery (pointer
    looked absent), found no park, and is about to fall back to the
    legacy marker scan must RE-CHECK _current first — on a legacy base
    carrying foreign-lineage markers, the live writer may have
    completed its swap in the meantime, and the marker scan would
    resolve a stale snapshot despite a fresh pointer."""
    from mahjong_etl_spark.streaming.cdc_stream import (
        _recover_pointer,
    )
    from mahjong_etl_spark.streaming.etl_stream import _meta_fs

    base, ckpt = str(tmp_path / "base"), str(tmp_path / "ckpt")
    d = _drop(tmp_path, "b0.jsonl", [(1, "upsert", 1, "a", 1)], 1_000)
    _drop(tmp_path, "b1.jsonl", [(2, "upsert", 2, "b", 2)], 2_000)
    _drain(spark, d, base, ckpt, keep_versions=2)
    with open(f"{base}/{CURRENT_PTR}") as f:
        current = f.read().strip()  # _v{lineage}-1, the LIVE pointer

    # legacy foreign-lineage marker with a higher batch number whose
    # snapshot dir still exists (cloned from batch 0 — stale data)
    import shutil

    v0 = current.rsplit("-", 1)[0] + "-0"
    shutil.copytree(f"{base}/{v0}", f"{base}/_vaaaaaaaaaaaa-99")
    open(f"{base}/_merge_commits/aaaaaaaaaaaa-99", "w").close()

    # no park on disk, _current present: recovery must return the live
    # pointer's value, never the foreign marker's
    fs = _meta_fs(spark, base)
    assert _recover_pointer(fs) == current


# ---------------------------------------------------------------------------
# r10 crash matrix: every rename-fallback crash point × both recovery
# actors, mirroring what tests/test_asof_compaction.py does for the
# compaction journal.  The fallback's step sequence is
#   [initial move fails] → park(_current → .prev-b) → move(tmp →
#   _current) → delete(.prev-b)
# so the reachable crash states are: BEFORE_PARK (the initial move
# failed transiently, nothing parked), AFTER_PARK (no _current — the
# journal carries the old value), AFTER_MOVE_IN (_current = new, the
# park is stale), AFTER_CLEANUP (fully swapped, marker not yet
# recorded).  For each state a READER must resolve the newest
# committed snapshot (old value until move-in lands, new after) and a
# WRITER must fold the next batch against that base, restoring /
# clearing the journal as a side effect.
# ---------------------------------------------------------------------------


def _plant_crash_state(base, point):
    """Rewind a healthy 2-batch base ({1: a, 2: b} current, batch-0
    snapshot retained) into the on-disk state the given crash point
    leaves behind.  Returns the k->(name, score) dict a correct reader
    must resolve."""
    import shutil

    with open(f"{base}/{CURRENT_PTR}") as f:
        current = f.read().strip()  # _v{lineage}-1
    lineage = current.rsplit("-", 1)[0]
    old_rows = {1: ("a", 1), 2: ("b", 2)}
    if point == "before_park":
        # the move(tmp, _current) failed transiently; _current intact,
        # the tmp replacement lingers (and must be ignored)
        with open(f"{base}/{CURRENT_PTR}.tmp-x", "w") as f:
            f.write("_vbogus-99")
        return old_rows
    if point == "after_park":
        # old pointer parked, replacement never moved in: no _current
        os.rename(f"{base}/{CURRENT_PTR}", f"{base}/{CURRENT_PTR}.prev-2")
        with open(f"{base}/{CURRENT_PTR}.tmp-2", "w") as f:
            f.write(f"{lineage}-2")
        return old_rows
    # Both remaining states have the NEW snapshot visible.  The
    # crashed publisher is given a FOREIGN lineage (the reachable
    # real-world shape: a checkpoint re-mint changed the lineage, the
    # re-minted writer crashed mid-fallback) so the fold that follows
    # exercises the genuine merge path — under the original lineage
    # the next batch id would collide with the fabricated version and
    # take the idempotent marker-only branch instead.
    new_version = "_vbbbbbbbbbbbb-7"
    shutil.copytree(f"{base}/{current}", f"{base}/{new_version}")
    with open(f"{base}/{CURRENT_PTR}", "w") as f:
        f.write(new_version)
    if point == "after_move_in":
        # the stale park survived (crash before delete(.prev-b))
        with open(f"{base}/{CURRENT_PTR}.prev-7", "w") as f:
            f.write(current)
    # after_cleanup: swapped and cleaned, only the marker is missing —
    # nothing else to plant
    return old_rows


@pytest.mark.parametrize(
    "point", ["before_park", "after_park", "after_move_in", "after_cleanup"]
)
@pytest.mark.parametrize("actor", ["reader", "writer"])
def test_fallback_crash_matrix(spark, tmp_path, point, actor):
    base, ckpt = str(tmp_path / "base"), str(tmp_path / "ckpt")
    d = _drop(tmp_path, "b0.jsonl", [(1, "upsert", 1, "a", 1)], 1_000)
    _drop(tmp_path, "b1.jsonl", [(2, "upsert", 2, "b", 2)], 2_000)
    _drain(spark, d, base, ckpt, keep_versions=2)

    expected = _plant_crash_state(base, point)
    if actor == "reader":
        # a reader racing the crashed writer resolves a committed
        # snapshot — never None, never a half state
        assert _snapshot(spark, base) == expected
        return
    # writer recovery: the next batch folds against the resolved base;
    # the journal/tmp debris is cleared by the time the fold commits
    _drop(tmp_path, "b2.jsonl", [(3, "upsert", 3, "c", 3)], 3_000)
    _drain(spark, d, base, ckpt, keep_versions=2)
    merged = dict(expected)
    merged[3] = ("c", 3)
    assert _snapshot(spark, base) == merged
    assert not [
        p for p in os.listdir(base) if p.startswith(f"{CURRENT_PTR}.prev-")
    ]
    # and the pointer file itself is back (a file, not a directory)
    assert os.path.isfile(f"{base}/{CURRENT_PTR}")


def test_version_retirement_keeps_pointer_target(spark, tmp_path):
    """Superseded _v dirs are retired down to keep_versions; the
    pointer's target always survives and stays readable."""
    base, ckpt = str(tmp_path / "base"), str(tmp_path / "ckpt")
    d = _drop(tmp_path, "b0.jsonl", [(1, "upsert", 1, "a", 1)], 1_000)
    _drop(tmp_path, "b1.jsonl", [(2, "upsert", 2, "b", 2)], 2_000)
    _drop(tmp_path, "b2.jsonl", [(3, "upsert", 3, "c", 3)], 3_000)
    _drain(spark, d, base, ckpt, keep_versions=0)
    versions = [v for v in os.listdir(base) if v.startswith("_v")]
    assert len(versions) == 1  # only the pointer's target survives
    assert _snapshot(spark, base) == {1: ("a", 1), 2: ("b", 2), 3: ("c", 3)}


def test_delete_only_feed_and_empty_snapshot(spark, tmp_path):
    """A feed that deletes every key leaves an EMPTY but readable
    snapshot (zero rows, schema intact) — not a missing pointer."""
    base, ckpt = str(tmp_path / "base"), str(tmp_path / "ckpt")
    d = _drop(tmp_path, "b0.jsonl", [(1, "upsert", 1, "a", 1)], 1_000)
    _drop(tmp_path, "b1.jsonl", [(1, "delete", 2, None, None)], 2_000)
    _drain(spark, d, base, ckpt)
    df = read_current(spark, base)
    assert df is not None and df.count() == 0
    assert set(df.columns) == {"k", "name", "score"}


# ---------------------------------------------------------------------------
# SCD2 (history-keeping) variant
# ---------------------------------------------------------------------------


def _drain2(spark, changes_dir, base, ckpt, **kw):
    from mahjong_etl_spark.streaming.cdc_stream import run_scd2_stream

    q = run_scd2_stream(spark, _stream(spark, changes_dir), base, ckpt, "k", **kw)
    assert q.awaitTermination(120), "stream did not drain in time"
    q.stop()
    time.sleep(0.2)


def _reference_scd2(rows):
    """Pure-python fold of the whole feed: every change is a version;
    upserts open [seq, next_change_seq); deletes close and open
    nothing."""
    by_key = {}
    for k, op, seq, nm, sc in sorted(rows, key=lambda r: (r[0], r[2])):
        by_key.setdefault(k, []).append((seq, op, nm, sc))
    out = set()
    for k, changes in by_key.items():
        for i, (seq, op, nm, sc) in enumerate(changes):
            if op != "upsert":
                continue
            nxt = changes[i + 1][0] if i + 1 < len(changes) else None
            out.add((k, nm, sc, seq, nxt, int(nxt is None)))
    return out


def test_scd2_stream_history_converges_across_choppings(spark, tmp_path):
    """Chopped arrivals must build the exact interval history the
    whole-feed fold implies — including a delete that closes without
    opening, a re-insert after delete, and multi-version batches."""
    rows = [
        (1, "upsert", 1, "alice", 10),
        (1, "upsert", 3, "alice", 11),
        (1, "delete", 5, None, None),
        (1, "upsert", 7, "alice2", 12),
        (2, "upsert", 2, "bob", 20),
        (2, "upsert", 4, "bobby", 21),
        (3, "upsert", 6, "carol", 30),
        (3, "delete", 8, None, None),
    ]
    want = _reference_scd2(rows)

    ordered = sorted(rows, key=lambda r: r[2])
    for chop in ([4, 8], [2, 5, 8], [8]):
        tag = "_".join(map(str, chop))
        base = str(tmp_path / f"base_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        feed = tmp_path / f"feed_{tag}"
        feed.mkdir()
        prev = 0
        for i, c in enumerate(chop):
            p = feed / f"b{i}.jsonl"
            with open(p, "w") as f:
                for k, op, seq, nm, sc in ordered[prev:c]:
                    f.write(json.dumps({
                        "k": k, "op": op, "change_seq": seq,
                        "name": nm, "score": sc,
                    }) + "\n")
            os.utime(p, (1000 + i, 1000 + i))
            prev = c
        from mahjong_etl_spark.streaming.cdc_stream import (
            read_current,
            run_scd2_stream,
        )

        q = run_scd2_stream(spark, _stream(spark, str(feed)), base, ckpt, "k")
        assert q.awaitTermination(120)
        q.stop()
        time.sleep(0.2)
        got = {
            (r.k, r.name, r.score, r.valid_from, r.valid_to, r.is_current)
            for r in read_current(spark, base).collect()
        }
        assert got == want, f"chopping {chop} diverged"


def test_scd2_stream_point_in_time_matches_as_of(spark, tmp_path):
    """The streamed history answers AS OF reads through the SAME
    scd2_as_of filter the batch plane uses."""
    from mahjong_etl_spark.operators.cdc import scd2_as_of
    from mahjong_etl_spark.streaming.cdc_stream import read_current

    base, ckpt = str(tmp_path / "base"), str(tmp_path / "ckpt")
    d = _drop(tmp_path, "b0.jsonl", [
        (1, "upsert", 1, "v1", 10),
        (1, "upsert", 5, "v2", 11),
    ], 1_000)
    _drop(tmp_path, "b1.jsonl", [(1, "delete", 9, None, None)], 2_000)
    _drain2(spark, d, base, ckpt)
    hist = read_current(spark, base)
    at = lambda v: {  # noqa: E731
        (r.k, r.name) for r in scd2_as_of(hist, v).collect()
    }
    assert at(1) == {(1, "v1")}
    assert at(4) == {(1, "v1")}
    assert at(5) == {(1, "v2")}
    assert at(9) == set()  # deleted


def test_cli_cdc_merge_drains(tmp_path):
    from mahjong_etl_spark.cli import main

    _drop(tmp_path, "b0.jsonl", [
        (1, "upsert", 1, "a", 1),
        (2, "upsert", 2, "b", 2),
    ], 1_000)
    _drop(tmp_path, "b1.jsonl", [(1, "delete", 3, None, None)], 2_000)
    out = str(tmp_path / "out")
    rc = main([
        "cdc",
        "-L", str(tmp_path / "changes"),
        "-O", out,
        "-C", str(tmp_path / "ckpt"),
        "-k", "k",
        "-s", _CHANGE_SCHEMA,
    ])
    assert rc == 0
    from mahjong_etl_spark.session import get_spark

    spark = get_spark("cli-cdc-check")
    assert _snapshot(spark, out) == {2: ("b", 2)}
