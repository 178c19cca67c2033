"""Partition compaction — the small-files answer at 100 TB.

The reference writes ONE file per table per date (reference
scrape.py:623-660) — a single-writer bottleneck at scale.  This
engine writes as many part files per ``dt=`` partition as there were
write tasks, which is right for throughput but, under continuous
ingest (streaming/ingest.py publishes every micro-batch), accretes
thousands of small files per partition — each one a scan task, a
name-node entry and a parquet footer fetch.

``compact_table`` rewrites each affected partition's files into
``ceil(bytes / target_file_bytes)`` files via a SNAPSHOT-FILE SWAP:
read exactly the files listed, stage their compacted replacement,
record a manifest, move the replacements in under a ``c{key}-``
prefix, then delete exactly the listed originals.  Readers never
notice: the directory contract (``table/dt=.../``) and the rows are
unchanged, only file granularity changes.  Run it where the reference
ran its daily rsync — after each ingest day closes.

Streaming-safety (r8 — closes the r7 TOCTOU): compaction only ever
deletes the EXACT file set it read.  A streaming micro-batch that
publishes new ``b{key}-`` files between the listing and the swap is
untouched — its files are not in the snapshot, so nothing drops them
(the old dynamic-partition-overwrite rewrite replaced the whole
partition directory and silently destroyed any file that landed in
between, with the already-present commit marker then blocking the
stream from ever republishing them).  Additionally a partition
holding batch-prefixed files whose commit marker is absent is skipped
outright (in-flight; its crash-replay erases by prefix, which folding
into anonymous files would break).  Committed batches never replay
(marker short-circuit), so compacting their files is safe.

Crash-safety: the swap is manifest-journaled (``{root}/_compaction/``)
and ``repair_compaction`` — run automatically at the start of every
``compact_table`` — rolls an interrupted swap forward (all
replacements landed: finish deleting originals) or back (partial:
delete the landed replacements, originals still intact).  No crash
point loses or duplicates rows in the FINAL state; a reader that
lists the partition mid-swap can transiently see both copies, the
same class of anomaly as any non-atomic multi-file commit — the
documented operating mode is after the partition's ingest closes.

Single-compactor enforced (r9): overlapping runs used to treat each
other's live manifests as crash debris — run B's opening repair
rolled back run A's in-flight swap, and A's subsequent moves became
orphaned duplicates.  Both ``compact_table`` and the standalone
``repair_compaction`` now hold ``{root}/_compaction/_lease`` for the
duration (write-then-read-back-the-winner, TTL against dead holders)
and raise ``CompactionLeaseHeld`` instead of repairing under a live
peer.  The lease is renewed before each partition AND re-checked
after each partition's staging write (the long pole) immediately
before the first destination mutation — a theft during staging
aborts with the destination untouched.  Residual window: the
journal+move phase itself exceeding the TTL; it is metadata-sized
(two file batches), so size ``lease_ttl_sec`` against listing
latency, not data volume.

Listing and file ops go through the scheme-portable metadata FS of
streaming/etl_stream.py (pyarrow where it resolves, JVM Hadoop
connectors otherwise) — an os.listdir walk would silently no-op
exactly where compaction matters most.
"""

from __future__ import annotations

import json
import math
import re
import time
import uuid

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024

# single-compactor lease: a crashed holder blocks others only until
# expiry; a LIVE holder makes a second run refuse loudly instead of
# rolling back the live swap as if it had crashed.  TTL expiry
# compares the holder's recorded wall-clock against the taker's —
# hosts are assumed NTP-synchronized to well under the TTL; a taker
# whose clock runs minutes fast can steal a live lease early (the
# renew-per-partition check then makes the displaced holder refuse
# loudly rather than double-swap, so skew degrades to a spurious
# CompactionLeaseHeld, never a silent concurrent compaction)
DEFAULT_LEASE_TTL_SEC = 900.0


class CompactionLeaseHeld(RuntimeError):
    """Another compactor holds the lease — its in-flight manifests are
    live state, not crash debris; re-run after it finishes (or after
    the lease TTL if it died without releasing)."""


def _read_lease(fs) -> dict:
    lease = f"{fs.root}/_compaction/_lease"
    if fs.kind(lease) != "file":
        return {}
    for _ in range(3):
        try:
            return json.loads(fs.read_bytes(lease).decode())
        except ValueError:
            # present but unparseable: a concurrent holder's write is
            # partially visible (no atomic create-exclusive in the
            # portable FS surface).  That is a LIVE holder mid-write,
            # not an absent lease — treating it as absent would let a
            # racer overwrite it.  A short settle retry resolves the
            # torn read; if it never parses, report it as held so the
            # caller refuses loudly (operator deletes the file if it
            # is genuinely corrupt debris).
            time.sleep(0.05)
        except OSError:
            if fs.kind(lease) != "file":
                return {}  # deleted between the kind check and read
            time.sleep(0.05)
    # A persistently unparseable lease blocks for the FULL TTL, same
    # as a valid one: a live holder whose write stays torn must not
    # get weaker protection (r10 advice — the old now+1s sentinel let
    # any acquirer retrying >1s later steamroll it).  The escape hatch
    # for genuine corrupt debris stays the operator deleting the file.
    return {
        "token": "<unparseable>",
        "expires": time.time() + DEFAULT_LEASE_TTL_SEC,
    }


def _acquire_lease(fs, ttl_sec: float) -> str:
    """Take ``{root}/_compaction/_lease`` or raise CompactionLeaseHeld.

    Write-then-read-back with a delayed CONFIRMATION read: two racers
    can each read back their own token if their writes interleave with
    their first reads (A-write, A-read, B-write, B-read), so the
    winner is decided by a second read after a short settle — by then
    both writes have landed and at most one token survives.  Still not
    a distributed lock against a byzantine store (no atomic
    create-exclusive in the portable FS surface) — a guard that turns
    the silent mutual-rollback of overlapping cron runs into a loud
    refusal with a vanishingly small race window."""
    lease = f"{fs.root}/_compaction/_lease"
    now = time.time()
    cur = _read_lease(fs)
    if cur and now < float(cur.get("expires", 0)):
        raise CompactionLeaseHeld(
            f"compaction lease held until {cur.get('expires')} "
            f"by {cur.get('token')!r}"
        )
    token = uuid.uuid4().hex
    fs.mkdirs(f"{fs.root}/_compaction")
    fs.write_bytes(
        lease, json.dumps({"token": token, "expires": now + ttl_sec}).encode()
    )
    if _read_lease(fs).get("token") != token:
        raise CompactionLeaseHeld("lost lease race")
    time.sleep(0.05)  # let a same-tick racer's write land
    got = _read_lease(fs)
    if got.get("token") != token:
        raise CompactionLeaseHeld(f"lost lease race to {got.get('token')!r}")
    return token


def _renew_lease(fs, token: str, ttl_sec: float) -> None:
    """Push the expiry forward mid-run (called per partition in
    ``compact_table``): a run longer than the TTL must not silently
    lose the single-compactor guard — if the lease was stolen by a
    taker who saw it expired, refuse loudly instead of continuing a
    now-unprotected swap."""
    cur = _read_lease(fs)
    if cur.get("token") != token:
        raise CompactionLeaseHeld(
            f"lease lost mid-run to {cur.get('token')!r} — this run "
            f"exceeded the TTL and another compactor took over"
        )
    fs.write_bytes(
        f"{fs.root}/_compaction/_lease",
        json.dumps(
            {"token": token, "expires": time.time() + ttl_sec}
        ).encode(),
    )


def _release_lease(fs, token: str) -> None:
    if _read_lease(fs).get("token") == token:
        fs.delete_file(f"{fs.root}/_compaction/_lease")

# b{key}- prefix of the streaming publish (etl_stream.py).  A key is
# {lineage:12hex}-{batch}, optionally SUFFIXED — the admission gate
# and the minhash shingle appends publish under b{lineage}-{batch}-
# bands / -sh / -adm with per-table markers.  The staged file base
# always starts with "part-" (a Spark part file), so the key is
# everything between the leading "b" and the "-part-" separator;
# the narrow legacy pattern stays as a fallback for files whose base
# is not a part file.  (r14 fix: the legacy pattern alone truncated
# suffixed keys to {lineage}-{batch}, whose marker never exists, so
# committed admission/shingle batches looked in-flight FOREVER and
# their partitions were silently never compacted — conservative, but
# wrong.)
_BATCH_KEY_RE = re.compile(r"^b(.+?)-part-")
_BATCH_PREFIX_RE = re.compile(r"^b([0-9a-f]{12}-\d+)-")


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(spark._jsc.hadoopConfiguration())


def partition_stats(
    spark: SparkSession, root: str, table: str, part_col: str = "dt"
) -> dict[str, tuple[int, int, list[str]]]:
    """{partition value: (n_files, total_bytes, file_names)} via the
    Hadoop FileSystem — scheme-agnostic, one listStatus per partition.
    ``part_col`` is the hive partition column of the table's layout
    (``dt`` for the fact planes, ``cluster`` for ANN postings)."""
    out: dict[str, tuple[int, int, list[str]]] = {}
    jvm, fs = _hadoop_fs(spark, root)
    tpath = jvm.org.apache.hadoop.fs.Path(f"{root}/{table}")
    if not fs.exists(tpath):
        return out
    prefix_len = len(part_col) + 1
    for st in fs.listStatus(tpath):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(f"{part_col}=")):
            continue
        files = [
            f
            for f in fs.listStatus(st.getPath())
            if f.isFile() and f.getPath().getName().endswith(".parquet")
        ]
        out[name[prefix_len:]] = (
            len(files),
            sum(f.getLen() for f in files),
            sorted(f.getPath().getName() for f in files),
        )
    return out


def _uncommitted_batch_keys(
    spark: SparkSession, root: str, file_names: list[str]
) -> set[str]:
    """Batch keys referenced by streaming-published files that have NO
    commit marker — an in-flight (crash-pending) batch."""
    keys = {
        m.group(1)
        for f in file_names
        if (m := _BATCH_KEY_RE.match(f) or _BATCH_PREFIX_RE.match(f))
        is not None
    }
    if not keys:
        return set()
    jvm, fs = _hadoop_fs(spark, root)
    return {
        k
        for k in keys
        if not fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{root}/_batch_commits/{k}")
        )
    }


def repair_compaction(
    spark: SparkSession,
    root: str,
    lease_ttl_sec: float = DEFAULT_LEASE_TTL_SEC,
) -> dict[str, str]:
    """Converge any interrupted snapshot-swaps recorded under
    ``{root}/_compaction/``; returns {manifest_key: "forward"|"back"}.

    Roll FORWARD when every replacement file already landed in the
    partition (the crash hit during/after original-deletion): finish
    deleting the originals listed in the manifest.  Roll BACK
    otherwise (the crash hit mid-move): delete whichever replacements
    landed — the originals are all still present, because originals
    are only ever deleted after ALL replacements land.  Either way the
    final state holds each row exactly once.  Idempotent; called
    automatically by :func:`compact_table`.

    Runs under the single-compactor lease: a manifest can belong to a
    LIVE run (overlapping cron), and "repairing" it would roll back
    the live swap and orphan its later moves as duplicates — so a held
    lease raises :class:`CompactionLeaseHeld` instead."""
    from ..streaming.etl_stream import _meta_fs, _par_files

    fs = _meta_fs(spark, root)
    token = _acquire_lease(fs, lease_ttl_sec)
    try:
        return _repair_locked(fs, _par_files)
    finally:
        _release_lease(fs, token)


def _repair_locked(fs, _par_files) -> dict[str, str]:
    mdir = f"{fs.root}/_compaction"
    out: dict[str, str] = {}
    for mpath in fs.list_files(mdir) if fs.kind(mdir) == "dir" else []:
        key = mpath.rsplit("/", 1)[1]
        if key.startswith("_"):
            continue  # the lease file, not a manifest
        m = json.loads(fs.read_bytes(mpath).decode())
        # pre-r11 manifests carried the partition VALUE under "dt"
        # (no "part"/"part_col" keys) — a leftover interrupted-swap
        # manifest from before the generalization must still roll
        # forward/back, not KeyError and wedge every later compaction
        pc = m.get("part_col", "dt")
        part = m["part"] if "part" in m else m["dt"]
        pdir = f"{fs.root}/{m['table']}/{pc}={part}"
        present = {
            p.rsplit("/", 1)[1]
            for p in (fs.list_files(pdir) if fs.kind(pdir) == "dir" else [])
        }
        if set(m["add"]) <= present:
            out[key] = "forward"
            _par_files(
                fs.delete_file,
                [f"{pdir}/{n}" for n in m["delete"] if n in present],
            )
        else:
            out[key] = "back"
            _par_files(
                fs.delete_file,
                [f"{pdir}/{n}" for n in m["add"] if n in present],
            )
        sdir = f"{fs.root}/_compact_staging/{key}"
        if fs.kind(sdir) is not None:
            fs.delete_dir(sdir)
        fs.delete_file(mpath)
    return out


def compact_table(
    spark: SparkSession,
    root: str,
    table: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    min_files_to_compact: int = 2,
    lease_ttl_sec: float = DEFAULT_LEASE_TTL_SEC,
    part_col: str = "dt",
) -> dict[str, int]:
    """Compact every partition with more part files than its data
    needs; returns {dt: files_after} for the rewritten partitions.
    Partitions holding an in-flight streaming batch's files are
    skipped, and the swap touches ONLY the files listed in the
    snapshot (see module docstring).

    Single-compactor enforced: the whole run holds the
    ``_compaction/_lease`` file — an overlapping run (cron overlap)
    raises :class:`CompactionLeaseHeld` instead of treating this
    run's journaled manifests as crash debris and rolling back its
    live swaps.  A holder that died without releasing blocks others
    only until ``lease_ttl_sec`` expires."""
    from ..streaming.etl_stream import _meta_fs, _par_files

    fs = _meta_fs(spark, root)
    token = _acquire_lease(fs, lease_ttl_sec)
    try:
        return _compact_locked(
            spark, root, table, target_file_bytes, min_files_to_compact,
            fs, _par_files, token, lease_ttl_sec, part_col,
        )
    finally:
        _release_lease(fs, token)


def _compact_locked(
    spark: SparkSession,
    root: str,
    table: str,
    target_file_bytes: int,
    min_files_to_compact: int,
    fs,
    _par_files,
    token: str,
    lease_ttl_sec: float,
    part_col: str = "dt",
) -> dict[str, int]:
    _repair_locked(fs, _par_files)  # converge any interrupted swap first
    rewritten: dict[str, int] = {}
    for part, (n_files, total_bytes, names) in partition_stats(
        spark, root, table, part_col
    ).items():
        want = max(1, math.ceil(total_bytes / target_file_bytes))
        if n_files < min_files_to_compact or n_files <= want:
            continue
        if _uncommitted_batch_keys(spark, root, names):
            continue  # in-flight streaming batch: its replay
            # erases by filename prefix, which compaction destroys
        # a big-table run can outlive the TTL: renew per partition so
        # the single-compactor guard holds for the whole run (and a
        # stolen lease aborts BEFORE this partition's swap starts)
        _renew_lease(fs, token, lease_ttl_sec)
        key = uuid.uuid4().hex[:12]
        pdir = f"{fs.root}/{table}/{part_col}={part}"
        staging = f"{fs.root}/_compact_staging/{key}"
        # read EXACTLY the snapshot files (not the directory): a file
        # published concurrently is neither read nor, later, deleted.
        # repartition (not coalesce): coalesce would chain the
        # upstream scan tasks together and can skew one output file
        # huge.
        spark.read.parquet(
            *[f"{root}/{table}/{part_col}={part}/{n}" for n in names]
        ).repartition(want).write.mode("overwrite").parquet(staging)
        staged = [
            p
            for p in fs.list_files(staging)
            if not p.rsplit("/", 1)[1].startswith(("_", "."))
        ]
        adds = [f"c{key}-{p.rsplit('/', 1)[1]}" for p in staged]
        # the staging write is the long pole (a big partition can
        # alone outlive the TTL): re-check the lease AFTER staging and
        # BEFORE the first destination mutation — if a taker stole the
        # lease mid-stage it may have already swapped this partition,
        # and journaling/moving our adds on top would duplicate every
        # row; abort and drop our (destination-untouched) staging
        try:
            _renew_lease(fs, token, lease_ttl_sec)
        except CompactionLeaseHeld:
            fs.delete_dir(staging)
            raise
        # journal BEFORE any destination mutation: repair_compaction
        # can then converge any crash point (module docstring)
        fs.mkdirs(f"{fs.root}/_compaction")
        fs.write_bytes(
            f"{fs.root}/_compaction/{key}",
            json.dumps(
                {
                    "table": table,
                    "part_col": part_col,
                    "part": part,
                    "delete": names,
                    "add": adds,
                }
            ).encode(),
        )
        # strict phases: ALL replacements land, then originals go —
        # a crash mid-way therefore never needs the staging dir to
        # recover rows (roll back deletes landed adds; roll forward
        # deletes leftover originals)
        _par_files(
            lambda pa: fs.move(pa[0], pa[1]),
            [(p, f"{pdir}/{a}") for p, a in zip(staged, adds)],
        )
        _par_files(fs.delete_file, [f"{pdir}/{n}" for n in names])
        fs.delete_dir(staging)
        fs.delete_file(f"{fs.root}/_compaction/{key}")
        rewritten[part] = want
    return rewritten


def forget_rows(
    spark: SparkSession,
    root: str,
    table: str,
    ids,
    id_col: str,
    part_col: str = "dt",
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    lease_ttl_sec: float = DEFAULT_LEASE_TTL_SEC,
) -> dict:
    """Delete every row whose ``id_col`` is in ``ids`` (a one-column
    DataFrame — the bounded forget-request list, broadcast into every
    join) from a hive-partitioned table, rewriting ONLY the affected
    partitions via the same journaled snapshot-file swap as
    :func:`compact_table` — the storage half of the right-to-be-
    forgotten cascade (operators/governance.py is the computation
    half; this reaches the MAINTAINED derived stores, where "rewrite
    the table" is not a plan but a file operation).

    Inherits every safety property of the compaction swap, one copy
    of each: the single-compactor lease (forget and compaction
    serialize against each other — they share the manifest dir, so a
    crash in either is converged by the same ``repair_compaction``),
    manifest-journaled crash-safe swaps (all replacements land before
    any original is deleted), snapshot-exact deletes (a file a
    streaming batch publishes between listing and swap is neither
    read nor deleted), and the in-flight skip — a partition holding
    an UNCOMMITTED streaming batch's files is left alone and
    REPORTED in ``skipped_in_flight``: its crash-replay erases by
    filename prefix, which folding into anonymous files would break.
    Forget is therefore point-in-time: run it with the table's
    maintenance stream drained (or re-run after), both because of
    the skip and because a pending unmarked batch replaying AFTER
    the forget re-lands whatever rows it carried.  Idempotent — a
    re-run finds zero affected partitions.

    Scale shape: one broadcast semi-join scan finds the affected
    partitions and the delete count (row-group stats on ``id_col``
    prune where the layout allows); each affected partition is then
    rewritten snapshot-exact with a broadcast anti-join.  Work is
    (affected partitions' bytes), never table bytes, and the request
    list is queue-bounded by assumption (same contract as
    governance_forget_cascade)."""
    from pyspark.sql import functions as F

    from ..streaming.etl_stream import _meta_fs, _par_files

    fs = _meta_fs(spark, root)
    out = {
        "table": table,
        "rows_deleted": 0,
        "partitions_rewritten": {},
        "skipped_in_flight": [],
    }
    if fs.kind(f"{fs.root}/{table}") != "dir":
        return out
    idf = ids.toDF(id_col) if ids.columns != [id_col] else ids
    hits = (
        spark.read.parquet(f"{root}/{table}")
        .join(F.broadcast(idf), id_col, "left_semi")
        .groupBy(part_col)
        .count()
        .collect()
    )
    if not hits:
        return out
    affected = {str(r[part_col]): int(r["count"]) for r in hits}

    token = _acquire_lease(fs, lease_ttl_sec)
    try:
        _repair_locked(fs, _par_files)
        stats = partition_stats(spark, root, table, part_col)
        for part, n_rows in affected.items():
            n_files, total_bytes, names = stats.get(part, (0, 0, []))
            if not names:
                continue
            if _uncommitted_batch_keys(spark, root, names):
                out["skipped_in_flight"].append(part)
                continue
            _renew_lease(fs, token, lease_ttl_sec)
            key = uuid.uuid4().hex[:12]
            pdir = f"{fs.root}/{table}/{part_col}={part}"
            staging = f"{fs.root}/_compact_staging/{key}"
            want = max(1, math.ceil(total_bytes / target_file_bytes))
            # snapshot-files read: direct file paths carry the data
            # columns (id_col among them); the partition column comes
            # from the directory the replacements move back into
            (
                spark.read.parquet(
                    *[f"{root}/{table}/{part_col}={part}/{n}" for n in names]
                )
                .join(F.broadcast(idf), id_col, "left_anti")
                .repartition(want)
                .write.mode("overwrite")
                .parquet(staging)
            )
            staged = [
                p
                for p in fs.list_files(staging)
                if not p.rsplit("/", 1)[1].startswith(("_", "."))
            ]
            adds = [f"c{key}-{p.rsplit('/', 1)[1]}" for p in staged]
            try:
                _renew_lease(fs, token, lease_ttl_sec)
            except CompactionLeaseHeld:
                fs.delete_dir(staging)
                raise
            fs.mkdirs(f"{fs.root}/_compaction")
            fs.write_bytes(
                f"{fs.root}/_compaction/{key}",
                json.dumps(
                    {
                        "table": table,
                        "part_col": part_col,
                        "part": part,
                        "delete": names,
                        "add": adds,
                    }
                ).encode(),
            )
            _par_files(
                lambda pa: fs.move(pa[0], pa[1]),
                [(p, f"{pdir}/{a}") for p, a in zip(staged, adds)],
            )
            _par_files(fs.delete_file, [f"{pdir}/{n}" for n in names])
            fs.delete_dir(staging)
            fs.delete_file(f"{fs.root}/_compaction/{key}")
            out["partitions_rewritten"][part] = len(adds)
            out["rows_deleted"] += n_rows
    finally:
        _release_lease(fs, token)
    return out
