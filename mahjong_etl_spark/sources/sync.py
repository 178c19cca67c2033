"""Incremental directory synchronization — the engine-side equivalent
of the reference's object-store round-trip (reference upload.sh:4 and
run_scraper.sh:9-13: ``gcloud storage rsync parquet gs://$BUCKET/...
-x '.*\\.DS_Store'`` after every ETL, plus ``gcloud storage cp
gs://$BUCKET/logs/$DATE* ./logs`` before it).

Design:

- **Scheme-agnostic via Hadoop FileSystem.** Paths resolve through
  Spark's Hadoop configuration, so ``file:...``, ``hdfs:...``,
  ``s3a:...``, ``gs:...`` all work wherever the cluster's connectors
  do — the same resolution every ``df.write.parquet(path)`` already
  uses.  No cloud SDK dependency.
- **rsync semantics.** A file is copied only when missing at the
  destination or different by (size, and optionally mtime); an
  ``exclude`` regex mirrors rsync's ``-x``; ``delete=True`` mirrors
  ``--delete`` (remove destination files absent from the source);
  ``dry_run`` plans without touching anything.
- **Metadata diff on the driver, data movement distributed.** Listing
  is a metadata walk (one RPC per directory page — millions of
  entries are fine on a driver).  The byte movement is the expensive
  part, so copies fan out across the cluster as one task per file
  batch.  Executors have no JVM gateway, so the distributed path uses
  executor-side Python I/O: plain ``shutil`` for locally-mountable
  roots (``file:``, NFS, fuse), and ``pyarrow.fs`` handles (baked
  into every PySpark install — ``s3://``, ``gs://``, ``hdfs://``)
  for object-store URIs, resolved ON the executor so no connection
  state crosses the wire.  Each file publishes via write-to-temp +
  move — atomic rename on local/HDFS, copy+delete on object stores
  (either way the final name never exposes a partial write, and a
  re-run republishes idempotently).  Only when pyarrow cannot
  resolve BOTH roots (exotic Hadoop-only connectors, e.g. ``s3a``
  mapped by cluster config) does the driver-side Hadoop
  ``FileUtil.copy`` loop remain as the compatibility fallback — the
  reference's own single-node ``gcloud rsync`` behavior.  At 100 TB
  none of this is the design: the sinks write object-store paths
  DIRECTLY (SURVEY §2.1) and sync exists for the small-file logs
  round-trip and ad-hoc mirroring.

The reference's sync is fire-and-forget; ours returns a manifest of
planned/performed actions so orchestration (and the tests) can assert
incrementality: a second run over an unchanged tree must plan zero
copies.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import SparkSession

DEFAULT_EXCLUDE = r".*\.DS_Store"  # reference upload.sh:4


@dataclass(frozen=True)
class SyncAction:
    op: str  # "copy" | "delete"
    rel: str  # path relative to the sync roots
    size: int


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(jconf), jpath


def _list_tree(spark: SparkSession, root: str) -> dict[str, tuple[int, int]]:
    """Recursive {relative_path: (size, mtime_ms)} listing via Hadoop
    FileSystem.  Missing root -> empty tree (first sync into a fresh
    destination)."""
    fs, jroot = _fs_and_path(spark, root)
    if not fs.exists(jroot):
        return {}
    base = fs.getFileStatus(jroot).getPath().toUri().getPath()
    out: dict[str, tuple[int, int]] = {}
    it = fs.listFiles(jroot, True)  # recursive remote iterator
    while it.hasNext():
        st = it.next()
        p = st.getPath().toUri().getPath()
        rel = os.path.relpath(p, base)
        out[rel] = (st.getLen(), st.getModificationTime())
    return out


def plan_sync(
    spark: SparkSession,
    src: str,
    dst: str,
    exclude: str | None = DEFAULT_EXCLUDE,
    delete: bool = False,
) -> list[SyncAction]:
    """Diff source against destination and return the action list.

    Copy when the destination file is missing, size-different, or
    OLDER than the source (src mtime > dst mtime — rsync's --update
    rule, which catches same-size content rewrites: a re-scraped log
    regenerated at identical length still syncs because its mtime
    advanced past the copy's).  A dst at least as new as src with
    equal size is treated as in-sync; callers needing content-hash
    certainty use plans/manifest.py's footer audit instead."""
    pat = re.compile(exclude) if exclude else None
    s_tree = _list_tree(spark, src)
    d_tree = _list_tree(spark, dst)
    actions: list[SyncAction] = []
    for rel in sorted(s_tree):
        if pat and pat.fullmatch(rel):
            continue
        s_size, s_mtime = s_tree[rel]
        d = d_tree.get(rel)
        if d is None or d[0] != s_size or s_mtime > d[1]:
            actions.append(SyncAction("copy", rel, s_size))
    if delete:
        for rel in sorted(set(d_tree) - set(s_tree)):
            if pat and pat.fullmatch(rel):
                continue
            actions.append(SyncAction("delete", rel, d_tree[rel][0]))
    return actions


def _is_local(spark: SparkSession, path: str) -> bool:
    fs, _ = _fs_and_path(spark, path)
    return fs.getScheme() in ("file",)


def _qualified_uri(spark: SparkSession, path: str) -> str:
    """Fully-qualified scheme://... URI string (driver-side Hadoop
    resolution, so a bare path picks up the cluster's defaultFS)."""
    fs, jpath = _fs_and_path(spark, path)
    return fs.makeQualified(jpath).toUri().toString()


def _pyarrow_resolves(uri: str) -> bool:
    """Can pyarrow.fs open this URI?  Probed ON THE DRIVER before
    choosing the distributed copy path — executors then repeat the
    same resolution locally."""
    try:
        import pyarrow.fs as pafs

        pafs.FileSystem.from_uri(uri)
        return True
    except Exception:
        return False


def _local_root(spark: SparkSession, path: str) -> str:
    # makeQualified resolves relative paths against the FS working
    # directory ON THE DRIVER — executors must receive an absolute
    # path or each would resolve against its own cwd
    fs, jpath = _fs_and_path(spark, path)
    return fs.makeQualified(jpath).toUri().getPath()


def run_sync(
    spark: SparkSession,
    src: str,
    dst: str,
    exclude: str | None = DEFAULT_EXCLUDE,
    delete: bool = False,
    dry_run: bool = False,
) -> dict:
    """Execute (or just plan) a sync; returns a summary manifest.

    Before planning, orphaned ``*.inprogress`` temporaries in the
    destination (left by a crashed earlier copy between write and
    rename) are deleted — they are invisible to the incrementality
    diff and would otherwise accumulate forever.  Safe because syncs
    to one destination are single-writer (concurrent syncs already
    race on the rename publish)."""
    if not dry_run:
        d_fs, d_root = _fs_and_path(spark, dst)
        if d_fs.exists(d_root):
            it = d_fs.listFiles(d_root, True)
            while it.hasNext():
                st = it.next()
                if st.getPath().getName().endswith(".inprogress"):
                    d_fs.delete(st.getPath(), False)
    actions = plan_sync(spark, src, dst, exclude=exclude, delete=delete)
    copies = [a for a in actions if a.op == "copy"]
    deletes = [a for a in actions if a.op == "delete"]
    summary = {
        "n_copied": len(copies),
        "n_deleted": len(deletes),
        "bytes_copied": sum(a.size for a in copies),
        "dry_run": dry_run,
        "actions": [(a.op, a.rel) for a in actions],
    }
    if dry_run or not actions:
        return summary

    if copies:
        if _is_local(spark, src) and _is_local(spark, dst):
            # Distributed copy: one task per file batch, plain Python
            # I/O on the executors (valid exactly when both roots are
            # visible from every node — local runs, NFS, fuse).
            s_root, d_root = _local_root(spark, src), _local_root(spark, dst)
            rels = [a.rel for a in copies]
            par = min(len(rels), spark.sparkContext.defaultParallelism)

            def _copy_batch(batch):
                import shutil

                for rel in batch:
                    dst_f = os.path.join(d_root, rel)
                    os.makedirs(os.path.dirname(dst_f), exist_ok=True)
                    tmp = dst_f + ".inprogress"
                    shutil.copyfile(os.path.join(s_root, rel), tmp)
                    os.replace(tmp, dst_f)  # atomic publish per file
                return []

            spark.sparkContext.parallelize(rels, par).mapPartitions(
                lambda it: _copy_batch(list(it))
            ).collect()
        else:
            s_uri, d_uri = _qualified_uri(spark, src), _qualified_uri(spark, dst)
            if _pyarrow_resolves(s_uri) and _pyarrow_resolves(d_uri):
                # Distributed object-store copy: one task per file
                # batch, each executor resolving its own pyarrow
                # FileSystem handles from the qualified URIs (no
                # connection objects serialized).  Write-to-temp +
                # move publish: atomic rename on hdfs://, copy+delete
                # on s3://gs:// — the final name never exposes a
                # partial write and a replay republishes idempotently.
                rels = [a.rel for a in copies]
                par = min(len(rels), spark.sparkContext.defaultParallelism)

                def _copy_remote_batch(batch):
                    import pyarrow.fs as pafs

                    s_fs, s_root = pafs.FileSystem.from_uri(s_uri)
                    d_fs, d_root = pafs.FileSystem.from_uri(d_uri)
                    for rel in batch:
                        target = f"{d_root}/{rel}"
                        # ALWAYS ensure the parent — for a top-level
                        # rel that parent is the destination root
                        # itself, which may not exist yet (first sync
                        # into a fresh bucket; caught by the pytest
                        # run when a root-level file landed in a task
                        # with no nested predecessor)
                        d_fs.create_dir(
                            target.rsplit("/", 1)[0], recursive=True
                        )
                        tmp = target + ".inprogress"
                        with s_fs.open_input_stream(
                            f"{s_root}/{rel}"
                        ) as fin, d_fs.open_output_stream(tmp) as fout:
                            while True:
                                chunk = fin.read(8 << 20)
                                if not chunk:
                                    break
                                fout.write(chunk)
                        d_fs.move(tmp, target)
                    return []

                spark.sparkContext.parallelize(rels, par).mapPartitions(
                    lambda it: _copy_remote_batch(list(it))
                ).collect()
            else:
                # Hadoop-only connector (s3a://, abfss:// without a
                # pyarrow resolver): driver-side FileUtil loop — the
                # unresolvable-connector fallback, not the data path.
                # Same write-to-temp + rename publish discipline as
                # the distributed branches: the final name never holds
                # a partial copy, and the orphan sweep at the top of
                # run_sync reaps .inprogress leftovers of a crash
                # (r7 verdict item 7; branch pinned by
                # tests/test_sync.py::test_hadoop_fallback_copy_branch).
                jvm = spark.sparkContext._jvm
                jconf = spark.sparkContext._jsc.hadoopConfiguration()
                s_fs, s_root = _fs_and_path(spark, src)
                d_fs, d_root = _fs_and_path(spark, dst)
                for a in copies:
                    sp = jvm.org.apache.hadoop.fs.Path(s_root, a.rel)
                    dp = jvm.org.apache.hadoop.fs.Path(d_root, a.rel)
                    tmp = jvm.org.apache.hadoop.fs.Path(
                        d_root, a.rel + ".inprogress"
                    )
                    d_fs.mkdirs(dp.getParent())
                    jvm.org.apache.hadoop.fs.FileUtil.copy(
                        s_fs, sp, d_fs, tmp, False, True, jconf
                    )
                    # Hadoop rename refuses an existing destination:
                    # clear a stale copy of the file first (the diff
                    # only lists files whose content must change)
                    if d_fs.exists(dp):
                        d_fs.delete(dp, False)
                    if not d_fs.rename(tmp, dp):
                        raise IOError(f"rename failed: {tmp} -> {dp}")
    if deletes:
        d_fs, d_root = _fs_and_path(spark, dst)
        jvm = spark.sparkContext._jvm
        for a in deletes:
            d_fs.delete(jvm.org.apache.hadoop.fs.Path(d_root, a.rel), False)
    return summary
