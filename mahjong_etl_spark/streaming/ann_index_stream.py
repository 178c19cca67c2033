"""Streaming IVF index maintenance: keep a persisted ANN index's
inverted lists current as new vectors arrive.

Closes the index lifecycle the batch plane opened
(operators/similarity.py): ``write_ivf_index`` trains the coarse
quantizer and materializes (centroids, postings) once per corpus
snapshot; THIS stream keeps the postings current between snapshot
rebuilds — the production shape for a growing embedding corpus, where
re-assigning the full corpus per arrival batch (or worse, retraining)
is exactly the cost an inverted-file index exists to avoid.

Per micro-batch of (vec_id, embedding) rows:

- assign each vector to its nearest persisted centroid — the SAME
  one-matmul-per-Arrow-batch pass the batch plane uses, against the
  SAME centroids (read once per (session, index) and cached, so a
  standing stream pays the centroid read exactly once);
- append the (cluster, vec_id) rows into ``{index}/postings`` through
  the SAME ``publish_batch`` the streaming ETL and the binaryFile
  ingest use (partitioned by ``cluster`` instead of ``dt``) — one
  copy of the effective-exactly-once delivery contract: a replayed
  batch erases its own leftovers before re-moving files in, a
  committed batch short-circuits on its marker, and a crash at any
  point replays into the same final file set (the
  erase-before-republish argument of streaming/etl_stream.py);
- record one DRIFT row into ``{index}/_drift/rows/``: batch
  size, mean residual distance to the assigned centroid, top-cell
  occupancy share, and their ratios against the build-time baseline
  ``write_ivf_index`` measured over the snapshot corpus.  Past the
  thresholds below the row carries ``rebuild_recommended: true`` —
  the retrain cadence becomes data-driven instead of calendar-driven
  (r10 verdict item 3: the drift limit used to be prose; now it is a
  number with a ledger behind it).

Because the centroids are FROZEN between rebuilds, assignment is
deterministic and the maintained index is BIT-IDENTICAL to a batch
``write_ivf_index`` over the union corpus with the same centroids —
pinned by tests/test_ann_index_stream.py, which serves queries from
the maintained index and from a from-scratch rebuild and demands
identical rows.

Rebuild fencing (r10 advice): replay idempotence of the publish
assumes frozen centroids — if ``write_ivf_index`` rebuilds IN PLACE
while a crashed (unmarked) maintenance batch is pending in the
checkpoint, a restart would re-assign that batch against the NEW
centroids and append vec_ids the rebuild already indexed.  Every
rebuild therefore stamps a fresh random ``{index}/_index_epoch``; the
maintenance stream binds its checkpoint to the epoch it first ran
against (``{checkpoint}/_index_epoch_bound``) and REFUSES to start
when they differ — an in-place rebuild requires a fresh checkpoint
(and a drained or re-dropped arrival directory), and the failure is
loud instead of a silent duplicate-append.

Scale shape: per batch, one mapInPandas matmul over the batch's rows
(no corpus scan, no shuffle — the cluster id IS the partition key of
the write) plus one batch-sized aggregate for the drift row (driver
traffic: a handful of scalars), state NONE (the index directory is
the state).  At 100 TB the postings table is fact-scale but the
stream only ever appends batch-sized slices; small posting files
accumulate at one-per-(batch, cluster).  A snapshot rebuild clears
them wholesale, but the measured curve (SCALE.md "postings
small-file probe": the served query degrades ~linearly past ~1k
files) says a standing stream cannot wait for the drift flag —
``compact_postings`` below is the between-rebuilds answer, the
generic manifest-journaled snapshot swap of plans/compaction.py
applied to the ``cluster=`` layout.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .etl_stream import _lineage_id, _meta_fs, publish_batch

# Rebuild-recommended thresholds.  Residual ratio: mean distance of a
# batch's vectors to their nearest frozen centroid, over the build-time
# corpus mean — 1.5 means arrivals sit 50% farther from the codebook
# than the data it was trained on (the standard IVF drift smell: cells
# stop being tight).  Top-cell share: one cell absorbing most of a
# batch means the codebook has no resolution where the new mass is.
# Batches smaller than DRIFT_MIN_BATCH are recorded but never flagged
# (a 3-vector batch's mean is noise, not drift).
DRIFT_RESIDUAL_RATIO = 1.5
DRIFT_TOP_CELL_SHARE = 0.5
DRIFT_MIN_BATCH = 64

# MinHash band-index drift thresholds (r13).  What stales an LSH
# index is not vector drift but a BOILERPLATE SURGE: the arrival
# stream turning copy-heavy fills band buckets with identical
# signatures, pushing buckets toward BUCKET_CAP (where the query
# path's bounded fanout starts costing recall) and flipping the pair
# path's regime economics.  A batch flags when its exact-duplicate
# rate is BOTH material in absolute terms AND a multiple of the
# build-time corpus rate — either bar alone misfires (a 2x ratio on
# a 0.1% base is noise; a 25% rate on a 30% base is business as
# usual).
MINHASH_DRIFT_MIN_DUP_RATE = 0.2
MINHASH_DRIFT_DUP_RATE_RATIO = 2.0

# PQ drift threshold (r12).  PQ reconstruction error lives on the
# unit sphere, so it is BOUNDED — unlike the unbounded IVF assignment
# residual, a 1.5x ratio is nearly unreachable.  Calibration sweep on
# the sf0.01 corpus (books trained on the corpus itself): arrivals
# from the same distribution score ratio 1.000; structured
# out-of-distribution shifts score 1.06 (per-vector random sign
# patterns), 1.09 (alternating sign + offset), 1.33 (axis-aligned
# one-hot spikes) — 1.2 separates the regimes with margin on both
# sides.
PQ_DRIFT_RECON_RATIO = 1.2

DRIFT_SCHEMA = (
    "batch_id long, n long, cells_touched long, top_cell_share double, "
    "mean_residual double, baseline_residual double, "
    "residual_ratio double, recon_ratio double, "
    "rebuild_recommended boolean, ts_ms long"
)

# (applicationId, index_dir) -> centroid ndarray / baseline dict.
# Keyed by applicationId, not id(sc) (ids reuse after stop).  Landed
# index snapshots are treated as immutable, and the one sanctioned way
# to retrain in place — operators/similarity.py::write_ivf_index —
# invalidates this cache for its path (invalidate_centroids below),
# so a same-application rebuild is never assigned against stale
# centroids.  An out-of-band overwrite from ANOTHER process remains
# invisible to the cache but is caught by the epoch fence at the next
# stream start.
_CENTROID_CACHE: dict[tuple, object] = {}
_BASELINE_CACHE: dict[tuple, dict] = {}
_BOOKS_CACHE: dict[tuple, object] = {}


def invalidate_centroids(index_dir: str) -> None:
    """Drop every cached centroid matrix / PQ codebook / drift
    baseline for ``index_dir`` (called by write_ivf_index and
    write_pq_index on rewrite, any app)."""
    for cache in (_CENTROID_CACHE, _BASELINE_CACHE, _BOOKS_CACHE):
        for key in [k for k in cache if k[1] == index_dir]:
            del cache[key]


def _index_centroids(spark: SparkSession, index_dir: str):
    from ..operators.similarity import _read_ndarray

    key = (spark.sparkContext.applicationId, index_dir)
    hit = _CENTROID_CACHE.get(key)
    if hit is None:
        hit = _read_ndarray(spark, f"{index_dir}/centroids")
        _CENTROID_CACHE[key] = hit
    return hit


def _index_baseline(spark: SparkSession, index_dir: str) -> dict:
    """Build-time drift baseline (written by write_ivf_index); a
    legacy index without one gets an empty dict — drift rows then
    carry null ratios and never flag."""
    key = (spark.sparkContext.applicationId, index_dir)
    hit = _BASELINE_CACHE.get(key)
    if hit is None:
        fs = _meta_fs(spark, index_dir)
        p = f"{fs.root}/_drift/baseline.json"
        hit = (
            json.loads(fs.read_bytes(p).decode())
            if fs.kind(p) == "file"
            else {}
        )
        _BASELINE_CACHE[key] = hit
    return hit


def assign_batch(
    spark: SparkSession, vectors: DataFrame, index_dir: str
) -> DataFrame:
    """(cluster, vec_id) for a batch of (vec_id, embedding) rows,
    assigned against the persisted index's frozen centroids."""
    from ..operators.similarity import _assign_clusters, with_norm

    cents = _index_centroids(spark, index_dir)
    return _assign_clusters(with_norm(vectors), cents).select(
        "cluster", "vec_id"
    )


def _bind_index_epoch(spark: SparkSession, index_dir: str, ckpt: str) -> str:
    """Fence the checkpoint to the index epoch (module docstring): the
    first run binds, every later run must match, a rebuilt index
    (fresh epoch) refuses loudly.  A legacy index without an epoch
    file gets one minted here so the fence covers it from now on.
    Returns the bound epoch so the live stream can re-verify it per
    batch (``_check_epoch``)."""
    ifs = _meta_fs(spark, index_dir)
    epoch_path = f"{ifs.root}/_index_epoch"
    if ifs.kind(epoch_path) != "file":
        import uuid

        ifs.write_bytes(epoch_path, uuid.uuid4().hex.encode())
    epoch = ifs.read_bytes(epoch_path).decode().strip()
    cfs = _meta_fs(spark, ckpt)
    bound_path = f"{cfs.root}/_index_epoch_bound"
    if cfs.kind(bound_path) != "file":
        cfs.mkdirs(cfs.root)
        cfs.write_bytes(bound_path, epoch.encode())
        return epoch
    bound = cfs.read_bytes(bound_path).decode().strip()
    if bound != epoch:
        raise RuntimeError(
            f"ann index maintenance: index {index_dir} was REBUILT "
            f"(epoch {epoch}) since this checkpoint last ran (bound "
            f"to {bound}).  A pending batch replayed against the new "
            f"centroids would duplicate vec_ids the rebuild already "
            f"indexed — restart with a fresh checkpoint (and re-drop "
            f"only vectors that arrived after the rebuild's corpus "
            f"snapshot)."
        )
    return epoch


def _check_epoch(spark: SparkSession, index_dir: str, bound: str) -> None:
    """Per-batch half of the rebuild fence (ADVICE r12): the start-time
    check alone cannot see a ``write_ivf_index`` rebuild that lands
    while the maintenance stream is LIVE in the same application —
    ``invalidate_centroids`` would make the very next micro-batch
    silently assign against the NEW centroids and append vec_ids the
    rebuild already indexed, the exact duplicate-append the fence
    exists to prevent, just via the live path instead of restart.
    One metadata-sized read per batch; raises before any destination
    mutation so the batch replays cleanly after a fresh checkpoint."""
    ifs = _meta_fs(spark, index_dir)
    epoch_path = f"{ifs.root}/_index_epoch"
    cur = (
        ifs.read_bytes(epoch_path).decode().strip()
        if ifs.kind(epoch_path) == "file"
        else None
    )
    if cur != bound:
        raise RuntimeError(
            f"ann index maintenance: index {index_dir} was REBUILT "
            f"(epoch {cur}) under a LIVE maintenance stream bound to "
            f"epoch {bound} — refusing to publish this batch.  "
            f"Restart the stream with a fresh checkpoint."
        )


def _drift_row(
    spark: SparkSession, assigned_res: DataFrame, index_dir: str, batch_id: int
) -> dict:
    """One ledger row from a batch's (cluster, vec_id, res2) rows —
    a k-bounded aggregate, driver traffic a handful of scalars."""
    occ = assigned_res.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.sqrt("res2")).alias("sres"),
    )
    (row,) = occ.agg(
        F.sum("n").alias("n"),
        F.max("n").alias("max_cell"),
        F.count(F.lit(1)).alias("cells"),
        F.sum("sres").alias("sres"),
    ).collect()
    n = row.n or 0
    mean_res = (row.sres / n) if n else 0.0
    top_share = (row.max_cell / n) if n else 0.0
    base = _index_baseline(spark, index_dir)
    base_res = base.get("mean_residual")
    ratio = (
        (mean_res / base_res)
        if (base_res and base_res > 0 and n)
        else None
    )
    # the top-cell bar is RELATIVE to the build-time skew where known:
    # a corpus whose own clustering is lopsided must not flag on
    # arrivals drawn from its own distribution — only on arrivals
    # measurably MORE concentrated than the codebook was trained for
    top_bar = max(
        DRIFT_TOP_CELL_SHARE, 2.0 * (base.get("top_cell_share") or 0.0)
    )
    flag = bool(
        n >= DRIFT_MIN_BATCH
        and (
            (ratio is not None and ratio > DRIFT_RESIDUAL_RATIO)
            or top_share > top_bar
        )
    )
    return {
        "batch_id": batch_id,
        "n": n,
        "cells_touched": row.cells if n else 0,
        "top_cell_share": round(top_share, 6),
        "mean_residual": round(mean_res, 6),
        "baseline_residual": base_res,
        "residual_ratio": round(ratio, 6) if ratio is not None else None,
        "rebuild_recommended": flag,
    }


# ledger retention: the rebuild decision reads recent batches, so the
# ledger keeps a bounded trailing window of per-batch row FILES.
# Pruning trims to MAX - SLACK once MAX is crossed (hysteresis): the
# prune pass must read every row's ts_ms to find the oldest (names are
# no longer arrival-ordered, r13), so it amortizes over SLACK batches
# instead of paying a full-ledger read per batch at the cap.
DRIFT_LEDGER_MAX_ROWS = 4096
DRIFT_LEDGER_PRUNE_SLACK = 256


def _append_drift(
    spark: SparkSession, index_dir: str, row: dict, lineage: str = "batch"
) -> None:
    """Record one ledger row as its OWN file under ``_drift/rows/``
    (ADVICE r12): one file per (lineage, batch) is write-once — no
    read-modify cycle for two driver processes to race — and lands
    via write-temp-then-move like the rest of the publish machinery,
    so a concurrent reader sees whole rows or nothing.

    The file is named ``{lineage}-{batch_id:012d}.json`` (r12 verdict
    item 3): the name carries NO wall-clock component, so a
    crash-replayed batch genuinely rewrites its SAME file — idempotent,
    the newest attempt wins, and ``rebuild_recommended`` can never
    double-count a replay (the previous name led with a millisecond
    stamp, so a replay landed a SECOND row for the same (lineage,
    batch)).  Arrival order across lineages (checkpoint restarts reset
    batch ids) is carried INSIDE the row as ``ts_ms``; the read path
    orders by it."""
    import time

    fs = _meta_fs(spark, index_dir)
    _migrate_drift_layout(fs)
    rows_dir = f"{fs.root}/_drift/rows"
    fs.mkdirs(rows_dir)
    row = {**row, "ts_ms": int(time.time() * 1000)}
    name = f"{lineage}-{int(row['batch_id']):012d}.json"
    tmp = f"{rows_dir}/.tmp-{name}"
    fs.write_bytes(tmp, (json.dumps(row) + "\n").encode())
    fs.move(tmp, f"{rows_dir}/{name}")
    # retention: once past the cap, prune the oldest rows by ts_ms
    # down to MAX - SLACK.  Concurrent pruners may race on the same
    # victim — deleting a file the other pruner already removed is a
    # no-op, never a lost LIVE row.
    files = _drift_row_files(fs)
    if len(files) > DRIFT_LEDGER_MAX_ROWS:
        stamped = []
        for p in sorted(files):
            try:
                r = json.loads(fs.read_bytes(p).decode())
                stamped.append(((r.get("ts_ms") or 0), p))
            except Exception:
                stamped.append((0, p))  # unreadable -> oldest
        stamped.sort(key=lambda t: t[0])
        keep = DRIFT_LEDGER_MAX_ROWS - DRIFT_LEDGER_PRUNE_SLACK
        for _, p in stamped[: max(0, len(stamped) - keep)]:
            try:
                fs.delete_file(p)
            except Exception:
                pass  # already pruned by a concurrent writer


def reset_drift_ledger(fs) -> None:
    """Clear the per-row drift ledger (every layout) at index REBUILD
    time — called by all four ``write_*_index`` builders alongside
    their ``_batch_commits`` clear (r13 ADVICE): the ledger's rows
    describe the PRE-rebuild index, so ``rebuild_recommended``
    reporting a stale last-row verdict immediately after the rebuild
    that was supposed to address it is exactly the confusion a
    rebuild must clear.  The builder rewrites ``_drift/baseline.json``
    right after, so the drift plane restarts from the fresh
    snapshot's reference with an empty history."""
    rows_dir = f"{fs.root}/_drift/rows"
    if fs.kind(rows_dir) == "dir":
        fs.delete_dir(rows_dir)
    legacy = f"{fs.root}/_drift/ledger.jsonl"
    if fs.kind(legacy) == "file":
        fs.delete_file(legacy)


def _drift_row_files(fs) -> list[str]:
    rows_dir = f"{fs.root}/_drift/rows"
    if fs.kind(rows_dir) != "dir":
        return []
    return [
        p
        for p in fs.list_files(rows_dir)
        if not p.rsplit("/", 1)[1].startswith(".")
    ]


def _migrate_drift_layout(fs) -> None:
    """One-shot migration to the single r13 ledger layout (r12 verdict
    item 6): after a restart burst the old read path interleaved THREE
    layouts (pre-r12 single-file ``ledger.jsonl``, r12 wall-clock-
    prefixed row files, r13 idempotent row files) by path order, so
    "the last row" could be a stale legacy row.  Every read and append
    first folds the older layouts into the r13 one:

    - ``ledger.jsonl`` rows become ``legacy-{i:012d}.json`` with
      ``ts_ms = i`` — tiny synthetic stamps, so they order BEFORE every
      real wall-clock row, which is where pre-r12 history belongs;
    - r12 ``{ms:015d}-{lineage}-{batch}.json`` files are renamed to
      ``{lineage}-{batch:012d}.json`` with the stamp moved inside the
      row; a replay-duplicated (lineage, batch) pair collapses to its
      newest stamp — retroactively applying the r13 idempotence.

    Idempotent and crash-safe: target rows are rewritten
    deterministically via write-temp-then-move and each source is
    deleted only after its rows landed, so a crash mid-migration
    re-runs to the same result (a not-yet-deleted source just rewrites
    the same targets)."""
    drift = f"{fs.root}/_drift"
    rows_dir = f"{drift}/rows"

    def land(row: dict, name: str) -> None:
        tmp = f"{rows_dir}/.tmp-mig-{name}"
        fs.write_bytes(tmp, (json.dumps(row) + "\n").encode())
        fs.move(tmp, f"{rows_dir}/{name}")

    # Every per-file read/land/delete below is individually guarded:
    # TWO driver processes maintaining one index (the scenario the
    # per-file ledger exists for) may both enter this migration after
    # an upgrade, and the loser of any single-file race must SKIP
    # (the winner migrated it) rather than fail the caller's
    # micro-batch — the ledger is telemetry, never part of the
    # exactly-once contract (r13 review finding).
    legacy = f"{drift}/ledger.jsonl"
    if fs.kind(legacy) == "file":
        fs.mkdirs(rows_dir)
        try:
            lines = [
                ln
                for ln in fs.read_bytes(legacy).decode().splitlines()
                if ln.strip()
            ]
        except Exception:
            lines = []  # concurrent migrator finished it first
        for i, line in enumerate(lines):
            try:
                row = json.loads(line)
                row.setdefault("ts_ms", i)
                land(row, f"legacy-{i:012d}.json")
            except Exception:
                pass  # torn row / target landed concurrently
        try:
            fs.delete_file(legacy)
        except Exception:
            pass  # already deleted by the other migrator
    for p in _drift_row_files(fs):
        name = p.rsplit("/", 1)[1]
        stamp, _, rest = name.partition("-")
        if not (len(stamp) == 15 and stamp.isdigit() and rest):
            continue  # already r13-named ({lineage}-{batch:012d}.json)
        if rest.endswith(".json"):
            rest = rest[: -len(".json")]
        lineage, _, bid = rest.rpartition("-")
        if not (bid.isdigit() and lineage):
            continue
        try:
            row = json.loads(fs.read_bytes(p).decode())
        except Exception:
            continue  # concurrent migrator already moved this file
        row.setdefault("ts_ms", int(stamp))
        target = f"{rows_dir}/{lineage}-{int(bid):012d}.json"
        newest = True
        if fs.kind(target) == "file":
            try:
                cur = json.loads(fs.read_bytes(target).decode())
                newest = (row.get("ts_ms") or 0) >= (cur.get("ts_ms") or 0)
            except Exception:
                newest = True
        try:
            if newest:
                land(row, f"{lineage}-{int(bid):012d}.json")
            fs.delete_file(p)
        except Exception:
            pass  # lost the race; the winner's result stands


def _read_drift_rows(fs) -> list[dict]:
    """Every ledger row, oldest-first by the in-row arrival stamp
    (ties broken by file name — a single layout after migration, so
    the order can never interleave wrongly across layouts)."""
    _migrate_drift_layout(fs)
    rows: list[dict] = []
    for path in sorted(_drift_row_files(fs)):
        rows.extend(
            json.loads(line)
            for line in fs.read_bytes(path).decode().splitlines()
            if line.strip()
        )
    rows.sort(key=lambda r: (r.get("ts_ms") or 0))
    return rows


def read_drift(spark: SparkSession, index_dir: str) -> DataFrame:
    """The drift ledger as a DataFrame — plain SQL over index health
    (the same discipline as streaming/metrics.py::read_progress)."""
    fs = _meta_fs(spark, index_dir)
    _migrate_drift_layout(fs)
    paths = sorted(_drift_row_files(fs))
    if not paths:
        return spark.createDataFrame([], DRIFT_SCHEMA)
    return spark.read.schema(DRIFT_SCHEMA).json(paths)


def rebuild_recommended(spark: SparkSession, index_dir: str) -> dict:
    """Operator-facing summary: the newest ledger row's verdict plus
    how many of the trailing rows flagged — the CLI `index` face of
    the drift plane.  An index with no ledger reports False."""
    rows = _read_drift_rows(_meta_fs(spark, index_dir))
    if not rows:
        return {"rebuild_recommended": False, "batches": 0, "flagged": 0}
    flagged = sum(1 for r in rows if r.get("rebuild_recommended"))
    last = rows[-1]
    return {
        "rebuild_recommended": bool(last.get("rebuild_recommended")),
        "batches": len(rows),
        "flagged": flagged,
        "last": last,
    }


def compact_postings(
    spark: SparkSession,
    index_dir: str,
    target_file_bytes: int = 8 * 1024 * 1024,
) -> dict[str, int]:
    """Compact the maintained index's inverted lists between snapshot
    rebuilds — ``plans/compaction.py``'s snapshot-file swap applied to
    the ``cluster=`` layout (r10 verdict item 4: the measured curve —
    SCALE.md "postings small-file probe" — shows the served ANN query
    degrading ~linearly past ~1000 posting files, 0.92 s at 16 files →
    2.76 s at 4085 on sf0.1/local[32], so "the rebuild is the
    compaction" only holds for streams that rebuild before ~1k
    batches; a standing stream needs this).

    Inherits every safety property of ``compact_table``: the
    single-compactor lease (serializes against concurrent compactions
    of the same index), manifest-journaled crash-safe swap, and the
    in-flight-batch skip — a cluster partition holding files of an
    UNCOMMITTED maintenance batch is left alone, because that batch's
    crash-replay erases by filename prefix, which folding into
    anonymous files would break.  Committed batches never replay
    (marker short-circuit), so merging their files is safe.  The
    default target is postings-sized (16-byte rows), not fact-sized.
    """
    from ..plans.compaction import compact_table

    return compact_table(
        spark,
        index_dir,
        "postings",
        target_file_bytes=target_file_bytes,
        part_col="cluster",
    )


# The measured knee of the postings small-file curve (SCALE.md
# "postings small-file probe"): the served ANN query degrades
# ~linearly with file count — 0.92 s at 16 files vs 2.76 s at 4,085
# on sf0.1/local[32] — and the degradation is material past ~1k.
POSTINGS_FILE_KNEE = 1000


def compact_recommended(
    spark: SparkSession, index_dir: str, table: str = "postings"
) -> dict:
    """Operator-facing compaction signal — the twin of
    :func:`rebuild_recommended`, so "watch one command" covers both
    retrain (drift) and compaction (small files) (r11 verdict item 5).

    Counts the data files in each hive partition of the maintained
    rows table (``postings/cluster=`` for IVF, ``codes/shard=`` for
    PQ — one metadata listing, no data read) and flags once the TOTAL
    crosses the measured knee — the serve path reads every probed
    partition, so the total, not the max, drives the observed latency
    curve."""
    fs = _meta_fs(spark, f"{index_dir}/{table}")
    per: dict[str, int] = {}
    if fs.kind(fs.root) == "dir":
        for p in fs.list_files(fs.root, recursive=True):
            rel = p[len(fs.root):].lstrip("/")
            name = rel.rsplit("/", 1)[-1]
            if name.startswith(("_", ".")) or "=" not in rel.split("/")[0]:
                continue
            per[rel.split("/", 1)[0]] = per.get(rel.split("/", 1)[0], 0) + 1
    total = sum(per.values())
    return {
        "files": total,
        "partitions": len(per),
        "max_partition_files": max(per.values(), default=0),
        "knee": POSTINGS_FILE_KNEE,
        "compact_recommended": total > POSTINGS_FILE_KNEE,
    }


def forget_from_index(
    spark: SparkSession,
    index_dir: str,
    ids,
    kind: str | None = None,
    target_file_bytes: int = 8 * 1024 * 1024,
) -> dict:
    """Right-to-be-forgotten for the four persisted index families
    (r14): delete every row belonging to the ids from the index's
    maintained tables WITHOUT a rebuild — the derived-store half of
    the governance cascade (operators/governance.py scrubs the fact
    tables; a deletion request must also reach the stores DERIVED
    from the deleted content: MinHash bands and shingle sets encode
    the document's text, PQ codes encode the vector — leaving them
    behind is retention, not deletion).

    ``ids``: a one-column DataFrame (or a Python list) of doc_ids
    (minhash) / vec_ids (ANN families) — the bounded request list.
    ``kind`` is auto-detected from the index layout when omitted.

    Per family, the tables scrubbed (each via
    ``plans/compaction.py::forget_rows`` — the journaled snapshot
    swap, so crash/lease/in-flight-batch safety is ONE copy shared
    with compaction):

    - minhash: ``bands/band=`` postings, the ``shingles/shard=``
      verify relation, and the ``admissions/gate=`` decision rows
      whose ``doc_id`` is forgotten.  Decision rows of OTHER docs
      that carry a forgotten id as ``matched_id`` are kept: they
      record that some admission matched *something*, reference the
      id only (no content), and rewriting them would falsify the
      audit trail — the documented retention choice;
    - ivf: ``postings/cluster=`` (vec_id membership);
    - pq: ``codes/shard=`` (the quantized vector IS derived
      content);
    - ivfpq: ``codes/cluster=``, plus — when present — the
      ``vectors/shard=`` raw verify relation (the vector itself)
      and the semantic gate's ``admissions/gate=`` rows (same
      doc-own-rows / matched_id-kept policy as minhash).

    The index stays live throughout: centroids/codebooks/geometry
    are untouched (they are corpus-level aggregates, the same
    residual the batch forget leaves in any trained model), the
    epoch is NOT bumped (membership-only change — exactly what
    maintenance appends do), and a standing maintenance stream keeps
    appending.  Run it with the stream drained or re-run after:
    partitions holding an uncommitted batch are skipped-and-reported
    (``skipped_in_flight``), and a pending unmarked batch replaying
    after the forget re-lands whatever rows it carried (the
    point-in-time contract of ``forget_rows``).

    Returns the per-table reports plus ``kind``; idempotent."""
    from ..plans.compaction import forget_rows

    fs = _meta_fs(spark, index_dir)
    if kind is None:
        if fs.kind(f"{fs.root}/bands") == "dir":
            kind = "minhash"
        elif fs.kind(f"{fs.root}/codes") == "dir":
            kind = (
                "ivfpq"
                if fs.kind(f"{fs.root}/centroids") == "dir"
                else "pq"
            )
        elif fs.kind(f"{fs.root}/postings") == "dir":
            kind = "ivf"
        else:
            raise ValueError(
                f"forget_from_index: {index_dir} has no recognizable "
                f"index layout (bands/codes/postings)"
            )
    id_col = "doc_id" if kind == "minhash" else "vec_id"
    if not isinstance(ids, DataFrame):
        ids = spark.createDataFrame(
            [(int(i),) for i in ids], f"{id_col} long"
        )
    tables = {
        "minhash": [("bands", "band"), ("shingles", "shard"), ("admissions", "gate")],
        "ivf": [("postings", "cluster")],
        "pq": [("codes", "shard")],
        # the optional raw-vector verify relation holds the vector
        # itself and the semantic gate's decision rows reference it —
        # both go with the codes (skipped when absent)
        "ivfpq": [
            ("codes", "cluster"),
            ("vectors", "shard"),
            ("admissions", "gate"),
        ],
    }[kind]
    report: dict = {"kind": kind, "tables": {}}
    for table, part_col in tables:
        if fs.kind(f"{fs.root}/{table}") != "dir":
            continue  # optional relation (bands-only index, no gate)
        report["tables"][table] = forget_rows(
            spark,
            index_dir,
            table,
            ids,
            id_col,
            part_col=part_col,
            target_file_bytes=target_file_bytes,
        )
    report["rows_deleted"] = sum(
        t["rows_deleted"] for t in report["tables"].values()
    )
    report["skipped_in_flight"] = {
        t: r["skipped_in_flight"]
        for t, r in report["tables"].items()
        if r["skipped_in_flight"]
    }
    return report


def run_ivf_maintenance_stream(
    spark: SparkSession,
    vectors_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and return) the standing index-maintenance query.

    ``vectors_stream`` must carry ``vec_id`` and ``embedding``
    (array<float/double>) — the same columns the batch index builder
    reads."""
    bound_epoch = _bind_index_epoch(spark, index_dir, checkpoint_dir)
    lineage = _lineage_id(spark, checkpoint_dir)

    def maintain(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.similarity import _assign_clusters_res, with_norm

        session = batch_df.sparkSession
        cents = _index_centroids(session, index_dir)
        ares = _assign_clusters_res(with_norm(batch_df), cents)
        # batch-sized; persisted so the publish and the drift
        # aggregate share one assignment pass
        ares.persist()
        try:
            # live half of the rebuild fence: re-verify the bound
            # epoch immediately before the first destination mutation
            _check_epoch(session, index_dir, bound_epoch)
            # the shared replay-idempotent publish (marker
            # short-circuit, staged erase-before-republish,
            # marker-after-all-tables) — one copy of the exactly-once
            # contract for ETL, ingest and this stream
            publish_batch(
                session,
                index_dir,
                f"{lineage}-{batch_id}",
                {"postings": ares.select("cluster", "vec_id")},
                part_col="cluster",
            )
            # drift row AFTER the publish: the ledger is operational
            # telemetry, not part of the exactly-once contract — a
            # crash between publish and append loses one ledger row,
            # never a posting (and a replay rewrites the same
            # (lineage, batch_id)-named row file — no duplicate)
            _append_drift(
                session,
                index_dir,
                _drift_row(session, ares, index_dir, batch_id),
                lineage=lineage,
            )
        finally:
            ares.unpersist()

    writer = (
        vectors_stream.writeStream.foreachBatch(maintain)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# PQ index maintenance (r12): the second index family on the same
# lifecycle — frozen codebooks between rebuilds, batch-keyed
# replay-idempotent code appends, epoch fencing, drift ledger.
# ---------------------------------------------------------------------------


def _index_books(spark: SparkSession, index_dir: str):
    from ..operators.similarity import _read_ndarray

    key = (spark.sparkContext.applicationId, index_dir)
    hit = _BOOKS_CACHE.get(key)
    if hit is None:
        hit = _read_ndarray(spark, f"{index_dir}/codebooks")
        _BOOKS_CACHE[key] = hit
    return hit


def run_pq_maintenance_stream(
    spark: SparkSession,
    vectors_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Keep a persisted PQ index's code table current as new vectors
    arrive — the PQ twin of :func:`run_ivf_maintenance_stream`, and
    deliberately the SAME machinery end to end:

    - per micro-batch, the arrivals are PQ-encoded against the
      persisted index's FROZEN codebooks (read once per (session,
      index), cache busted by write_pq_index's sanctioned rewrite)
      and appended into the ``{index}/codes`` ``shard=`` layout
      through ``publish_batch`` — the one copy of the
      effective-exactly-once contract;
    - the checkpoint is fenced to the index epoch at start AND the
      bound epoch is re-verified before every publish, so an in-place
      retrain under a live or crashed stream refuses loudly instead
      of appending codes the rebuild already encoded;
    - one drift row per batch: the batch's mean RECONSTRUCTION error
      (operators/similarity.py::pq_recon_partials) against the
      build-time baseline — codebooks that can no longer represent
      the arriving distribution show a rising ratio exactly like IVF
      centroids do, and ``rebuild_recommended``/``read_drift``/the
      CLI ``index`` summary work on a PQ index unchanged.

    Because the codebooks are frozen, encoding is deterministic and
    the maintained code table is BIT-IDENTICAL to a batch
    ``write_pq_index`` over the union corpus with the same books —
    pinned by tests/test_ann_index_stream.py::
    test_pq_maintained_index_matches_batch_rebuild."""
    from pyspark.sql import functions as F  # noqa: F811

    bound_epoch = _bind_index_epoch(spark, index_dir, checkpoint_dir)
    lineage = _lineage_id(spark, checkpoint_dir)

    def maintain(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.similarity import (
            PQ_CODE_SHARDS,
            pq_encode,
            pq_recon_partials,
            with_norm,
        )

        session = batch_df.sparkSession
        books = _index_books(session, index_dir)
        vecs = with_norm(batch_df).persist()
        try:
            codes = pq_encode(vecs, books).withColumn(
                "shard",
                F.pmod(F.col("vec_id"), F.lit(PQ_CODE_SHARDS)).cast("int"),
            )
            _check_epoch(session, index_dir, bound_epoch)
            publish_batch(
                session,
                index_dir,
                f"{lineage}-{batch_id}",
                {"codes": codes},
                part_col="shard",
            )
            # drift row AFTER the publish (telemetry, not part of the
            # exactly-once contract — same argument as the IVF stream)
            (row,) = (
                pq_recon_partials(vecs, books)
                .agg(F.sum("n").alias("n"), F.sum("serr").alias("serr"))
                .collect()
            )
            n = row.n or 0
            mean_res = (row.serr / n) if n else 0.0
            base = _index_baseline(session, index_dir)
            base_res = base.get("mean_residual")
            ratio = (
                (mean_res / base_res)
                if (base_res and base_res > 0 and n)
                else None
            )
            flag = bool(
                n >= DRIFT_MIN_BATCH
                and ratio is not None
                and ratio > PQ_DRIFT_RECON_RATIO
            )
            _append_drift(
                session,
                index_dir,
                {
                    "batch_id": batch_id,
                    "n": n,
                    "cells_touched": None,
                    "top_cell_share": None,
                    "mean_residual": round(mean_res, 6),
                    "baseline_residual": base_res,
                    "residual_ratio": (
                        round(ratio, 6) if ratio is not None else None
                    ),
                    "rebuild_recommended": flag,
                },
                lineage=lineage,
            )
        finally:
            vecs.unpersist()

    writer = (
        vectors_stream.writeStream.foreachBatch(maintain)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_ivfpq_maintenance_stream(
    spark: SparkSession,
    vectors_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Keep a persisted IVFADC index current as new vectors arrive —
    the third family on the shared lifecycle.  Per micro-batch the
    arrivals are unit-normalized, assigned against the FROZEN coarse
    centroids, their residuals PQ-encoded against the FROZEN
    codebooks, and the (cluster, vec_id, code) rows appended into the
    ``{index}/codes`` ``cluster=`` layout through ``publish_batch``.
    Same epoch fencing (start + per-batch); the drift row watches
    BOTH staleness axes (r12 verdict item 5): the COARSE quantizer's
    assignment residual + top-cell occupancy under the IVF thresholds
    (stale cells degrade probe recall and residual coding alike), AND
    the batch's PQ reconstruction-error ratio over the residual
    coding under ``PQ_DRIFT_RECON_RATIO`` — a shift that keeps cell
    geometry while rotating within-cell structure books-stales the
    ADC tables without moving the coarse signal.

    Frozen centroids + frozen books ⇒ deterministic encoding ⇒ the
    maintained code table is BIT-IDENTICAL to a batch
    ``write_ivfpq_index`` over the union corpus with the same
    components — pinned by tests/test_ann_index_stream.py.  When the
    index carries the persisted exact-verify relation
    (``{index}/vectors``, r14 ``with_vectors=True`` build), arrivals'
    raw vectors are appended there too under a second ``…-vec``
    marker — the minhash shingle-append contract on the embedding
    plane."""
    from pyspark.sql import functions as F  # noqa: F811

    bound_epoch = _bind_index_epoch(spark, index_dir, checkpoint_dir)
    lineage = _lineage_id(spark, checkpoint_dir)
    _vfs = _meta_fs(spark, index_dir)
    has_vec = _vfs.kind(f"{_vfs.root}/vectors") == "dir"

    def maintain(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.similarity import (
            _assign_clusters_res,
            _unit_corpus,
            pq_encode,
            pq_recon_partials,
            with_norm,
        )
        from ..session import local_rows_df

        session = batch_df.sparkSession
        cents = _index_centroids(session, index_dir)
        books = _index_books(session, index_dir)
        cn = _unit_corpus(with_norm(batch_df))
        # one assignment pass serves the publish AND the drift row
        ares = _assign_clusters_res(cn, cents).persist()
        res = None
        try:
            cent_df = local_rows_df(
                session,
                [
                    (int(i), [float(v) for v in cents[i]])
                    for i in range(len(cents))
                ],
                "cluster int, carr array<double>",
            )
            res = (
                cn.join(ares.select("vec_id", "cluster"), "vec_id")
                .join(F.broadcast(cent_df), "cluster")
                .select(
                    "vec_id",
                    "cluster",
                    F.zip_with(
                        "emb_d", "carr", lambda x, c: x - c
                    ).alias("emb_d"),
                    F.lit(1.0).alias("norm"),
                )
            ).persist()  # serves the encode AND the recon drift axis
            coded = (
                pq_encode(res, books)
                .join(ares.select("vec_id", "cluster"), "vec_id")
                .select("cluster", "vec_id", "code")
            )
            _check_epoch(session, index_dir, bound_epoch)
            # vectors before codes — the gate's crash-window argument
            if has_vec:
                from ..operators.similarity import _vector_table

                publish_batch(
                    session,
                    index_dir,
                    f"{lineage}-{batch_id}-vec",
                    {
                        "vectors": _vector_table(
                            batch_df.select("vec_id", "embedding")
                        )
                    },
                    part_col="shard",
                )
            publish_batch(
                session,
                index_dir,
                f"{lineage}-{batch_id}",
                {"codes": coded},
                part_col="cluster",
            )
            # drift row carries BOTH staleness axes (r12 verdict item
            # 5): the coarse-assignment residual/occupancy (cells
            # stale) from _drift_row, plus the batch's PQ
            # reconstruction-error ratio over the RESIDUAL coding
            # (books stale) — a shift that keeps cell geometry while
            # rotating within-cell structure degrades ADC precision
            # without moving the coarse signal, so either axis alone
            # may flip the flag.
            row = _drift_row(session, ares, index_dir, batch_id)
            (rr,) = (
                pq_recon_partials(res, books)
                .agg(F.sum("n").alias("n"), F.sum("serr").alias("serr"))
                .collect()
            )
            nrec = rr.n or 0
            base_recon = _index_baseline(session, index_dir).get(
                "mean_recon"
            )
            rratio = (
                ((rr.serr / nrec) / base_recon)
                if (nrec and base_recon and base_recon > 0)
                else None
            )
            row["recon_ratio"] = (
                round(rratio, 6) if rratio is not None else None
            )
            if (
                rratio is not None
                and nrec >= DRIFT_MIN_BATCH
                and rratio > PQ_DRIFT_RECON_RATIO
            ):
                row["rebuild_recommended"] = True
            _append_drift(session, index_dir, row, lineage=lineage)
        finally:
            ares.unpersist()
            if res is not None:
                res.unpersist()

    writer = (
        vectors_stream.writeStream.foreachBatch(maintain)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_minhash_maintenance_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Keep a persisted MinHash band index's postings current as new
    documents arrive — the dedup plane on the same lifecycle as the
    three ANN families (r13).  ``docs_stream`` carries (doc_id, text).

    Per micro-batch: the arrivals are signed with the SAME vectorized
    signature pass and banded with the SAME band-slice hash the batch
    builder and the pair path use (operators/dedup.py::
    minhash_signatures + band_rows — signatures are seed-fixed and
    deterministic, so the maintained postings are BIT-IDENTICAL to a
    batch ``write_minhash_index`` over the union corpus), appended
    into the ``{index}/bands`` ``band=`` layout through
    ``publish_batch`` (the one exactly-once contract), behind the
    same start-time + per-batch epoch fence.  When the index carries
    the persisted VERIFY relation (``{index}/shingles``, the r14
    default build), the arrivals' shingle rows are appended there too
    under a second batch-keyed marker (``…-sh``) — each marker
    replays idempotently on its own, and the stream never advances
    past a batch whose second publish failed (the admission gate's
    two-marker argument); a reader in the crash window between the
    two sees bands without shingles, which every verify consumer
    treats as "fall back to band hits", never as admitted.

    The drift row watches the signal that actually stales an LSH
    index: the batch's EXACT-DUPLICATE RATE vs the build-time corpus
    rate (constants above).  Field mapping onto the shared ledger
    schema: ``mean_residual`` = batch dup rate, ``baseline_residual``
    = build-time rate, ``residual_ratio`` = their ratio (null when
    the build corpus was dup-free) — ``read_drift`` /
    ``rebuild_recommended`` / ``compact_recommended`` / the CLI
    ``index --kind minhash`` face work unchanged."""
    from ..operators.dedup import band_rows, minhash_signatures
    from ..operators.minhash_index import (
        _shingle_table,
        read_minhash_geometry,
    )

    bound_epoch = _bind_index_epoch(spark, index_dir, checkpoint_dir)
    lineage = _lineage_id(spark, checkpoint_dir)
    # band with the INDEX's build geometry (recorded by
    # write_minhash_index): hardcoding the defaults would make a
    # non-default index silently un-probeable (r13 review finding)
    geo = read_minhash_geometry(spark, index_dir)
    # a bands-only / pre-r14 index never grows a shingles relation
    # mid-stream — decided once at start, like the geometry
    has_sh = (
        _meta_fs(spark, index_dir).kind(
            f"{_meta_fs(spark, index_dir).root}/shingles"
        )
        == "dir"
    )

    def maintain(batch_df: DataFrame, batch_id: int) -> None:
        session = batch_df.sparkSession
        docs = batch_df.select("doc_id", "text").persist()
        try:
            rows = band_rows(
                minhash_signatures(
                    docs, geo["n"], geo["bands"] * geo["rows_per_band"]
                ),
                geo["bands"],
                geo["rows_per_band"],
            )
            _check_epoch(session, index_dir, bound_epoch)
            publish_batch(
                session,
                index_dir,
                f"{lineage}-{batch_id}",
                {"bands": rows},
                part_col="band",
            )
            if has_sh:
                publish_batch(
                    session,
                    index_dir,
                    f"{lineage}-{batch_id}-sh",
                    {"shingles": _shingle_table(docs, geo["n"])},
                    part_col="shard",
                )
            # drift row AFTER the publish (telemetry, same contract
            # as the other families): one batch-sized aggregate
            (srow,) = docs.agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct(F.xxhash64("text")).alias("n_texts"),
            ).collect()
            n = srow.n or 0
            rate = ((n - (srow.n_texts or 0)) / n) if n else 0.0
            base = _index_baseline(session, index_dir).get("dup_rate")
            ratio = (rate / base) if (base and base > 0) else None
            flag = bool(
                n >= DRIFT_MIN_BATCH
                and rate > MINHASH_DRIFT_MIN_DUP_RATE
                and (
                    base is None
                    or base == 0
                    or rate > MINHASH_DRIFT_DUP_RATE_RATIO * base
                )
            )
            _append_drift(
                session,
                index_dir,
                {
                    "batch_id": batch_id,
                    "n": n,
                    "cells_touched": None,
                    "top_cell_share": None,
                    "mean_residual": round(rate, 6),
                    "baseline_residual": base,
                    "residual_ratio": (
                        round(ratio, 6) if ratio is not None else None
                    ),
                    "rebuild_recommended": flag,
                },
                lineage=lineage,
            )
        finally:
            docs.unpersist()

    writer = (
        docs_stream.writeStream.foreachBatch(maintain)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# Exact-verify admission default: flag at the dedup plane's standard
# near-dup bar when the caller enables verification but names none.
JACCARD_ADMIT_DEFAULT = 0.5

# Near-dup admission: how many of the 16 bands an arrival must share
# with some indexed doc before it is flagged.  An exact copy shares
# ALL bands (identical signature); a true near-dup at Jaccard j hits
# each band w.p. j^ROWS_PER_BAND (j=0.85 -> ~8 of 16 expected), so 2
# is a low-noise default: unrelated texts virtually never share two
# independent 4-row band slices.  Callers wanting exact precision
# pass verify_docs and a threshold instead — band hits then only
# nominate candidates and the flag follows the verified Jaccard.
NEARDUP_MIN_BANDS = 2


def run_neardup_admission_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    min_bands: int = NEARDUP_MIN_BANDS,
    verify_docs: DataFrame | None = None,
    threshold: float | None = None,
    within_batch: bool = False,
    available_now: bool = True,
):
    """The MinHash band index made load-bearing (r13): a streaming
    near-dup ADMISSION GATE over a document ingest.  Per micro-batch
    of (doc_id, text) arrivals:

    1. within-batch exact collapse — one rep (min doc_id) per
       distinct text; the other copies are flagged immediately
       (matched to their rep, Jaccard exactly 1.0 by identity);
    2. reps probe the persisted index: band rows from the SAME
       signature pass the whole dedup plane uses, joined against the
       postings on (band, bh) with the per-bucket rank cap — an
       arrival's ``n_band_hits`` against its best-matching indexed
       doc (most shared bands, ties to the smallest id) decides the
       flag at ``min_bands``.  Verify mode (``threshold`` and/or
       ``verify_docs`` given): band hits only NOMINATE and the flag
       follows the exact Jaccard at the bar — the usual LSH
       precision/cost dial, made explicit per deployment.  The
       verify texts come from the index's own persisted shingle
       relation (``{index}/shingles``, the r14 default build —
       pre-computed arrays, no per-batch corpus re-shingling) when
       it exists, falling back to ``verify_docs``; a candidate whose
       match has shingles in NEITHER (a bands-only index with an
       incomplete ``verify_docs``, or the crash window between the
       bands and shingles publishes) falls back to the band-hit flag
       at ``min_bands`` — fail-CLOSED, so verify mode can never
       silently admit a doc the band evidence flagged (r13 ADVICE,
       medium: the old inner-join verify dropped exactly the
       candidates the gate itself had admitted in earlier batches).
       ``threshold`` without any verify source raises ValueError at
       start — a silently ignored precision bar is worse than a loud
       one;
    3. the CLEAN reps' band rows — and, when the index carries the
       shingle relation, their shingle rows — are appended into the
       index through ``publish_batch``: the gate is SELF-MAINTAINING
       in both flagging modes (a copy of a doc admitted three
       batches ago is flagged today without any rebuild, and in
       verify mode its exact Jaccard is computable because its
       shingles were published with its bands).  Every decision
       lands in ``{index}/admissions`` (doc_id, n_band_hits,
       matched_id, jaccard, admitted, batch_id), partitioned by a
       ``gate`` routing column (``admit``/``quarantine``) so the
       downstream quarantine reader prunes straight to its slice
       while ``admitted`` stays a typed BOOLEAN data column (a hive
       partition value round-trips as a string).

    ``within_batch=True`` (r14, r13 verdict item 2) closes the
    in-batch NEAR-dup hole: the batch's reps are banded against
    THEMSELVES through the same capped ``probe_candidates`` shape
    (the rep relation standing in as postings), keeping only
    (earlier doc_id → later doc_id) directed candidates — the FIRST
    occurrence by doc_id admits, later in-batch near-dups quarantine
    against it (deterministically: the decision depends only on
    batch content + the effective index, so replays re-derive it).
    A later near-dup quarantines on its earlier match regardless of
    that match's own fate — matching a just-quarantined arrival is
    still evidence the text is not novel, and an order-dependent
    "only if the match admitted" rule would make admission depend on
    the index's verdict chain rather than the batch's content.  Off
    by default: the extra self-join prices every batch, and a
    bursty boilerplate surge is precisely when its bucket join is
    biggest; the default path is unchanged (exact copies collapse,
    in-batch near-dups admit together and are caught from the next
    batch on).

    Exactly-once shape: bands, shingles (when maintained) and
    admissions publish as batch-keyed markers (`…-bands`, `…-sh`,
    `…-adm`) — ``publish_batch`` partitions every table in one call
    by one column, and the tables partition differently (band /
    shard / gate).  Each marker replays idempotently on its own; a
    crash between them re-lands only the missing tables into the
    same final file set, and the stream never advances past a batch
    whose later publish failed.  Replay determinism: a replayed
    batch probes an index that may still hold its own crashed
    attempt's band (and shingle) files (the erase runs at publish
    time, after the decision) — but candidates exclude the batch's
    own doc ids (see the probe comment), leftover band files can
    only carry those ids, and a leftover shingle row is only ever
    joined for a candidate's match_id (never an own-batch id), so a
    replay re-derives bit-identical decisions from the identical
    effective index.

    Scale shape per batch of M arrivals: signing is M-linear, the
    probe join touches matched buckets only (rank-capped), the
    within-batch pass (when enabled) adds one batch-sized self-join
    under the same cap, and the verify join probes candidate
    match_ids against the persisted shingle relation — a broadcast
    of the candidate sliver against a column-pruned scan of
    pre-computed arrays (vs. re-shingling the corpus TEXT per batch,
    the pre-r14 cost; the scan is still corpus-file-sized, which the
    SCALE.md admission-drain row prices).  One drift row per batch
    records the FLAG RATE (mean_residual) rated against the index's
    build-time dup-rate baseline (``baseline_residual`` /
    ``residual_ratio``, the maintenance stream's two-bar shape — r13
    ADVICE: an ingest whose expected dup rate matches its corpus
    must not recommend rebuild forever)."""
    from pyspark.sql.window import Window

    from ..operators.dedup import band_rows, minhash_signatures, shingles_expr
    from ..operators.minhash_index import (
        _shingle_table,
        probe_candidates,
        read_minhash_geometry,
    )

    bound_epoch = _bind_index_epoch(spark, index_dir, checkpoint_dir)
    lineage = _lineage_id(spark, checkpoint_dir)
    geo = read_minhash_geometry(spark, index_dir)
    ifs = _meta_fs(spark, index_dir)
    has_sh = ifs.kind(f"{ifs.root}/shingles") == "dir"
    verify = threshold is not None or verify_docs is not None
    if threshold is not None and verify_docs is None and not has_sh:
        raise ValueError(
            f"neardup admission: threshold={threshold} given but the "
            f"index at {index_dir} has no persisted shingle relation "
            f"and no verify_docs was supplied — there is nothing to "
            f"verify the exact Jaccard against, and silently flagging "
            f"on band hits alone would ignore the caller's precision "
            f"bar.  Rebuild the index with with_shingles=True, pass "
            f"verify_docs, or drop the threshold for band-hit mode."
        )

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        session = batch_df.sparkSession
        docs = batch_df.select("doc_id", "text").persist()
        reps = decisions = q_bands = None
        try:
            # 1. within-batch exact collapse
            key = F.md5("text")
            groups = docs.groupBy(key.alias("k")).agg(
                F.min("doc_id").alias("rep")
            )
            members = (
                docs.select("doc_id", key.alias("k"))
                .join(groups, "k")
                .select("rep", "doc_id")
            )
            copies = members.where(F.col("doc_id") != F.col("rep")).select(
                "doc_id",
                F.lit(geo["bands"]).alias("n_band_hits"),
                F.col("rep").alias("matched_id"),
                F.round(F.lit(1.0), 6).alias("jaccard"),
                F.lit(False).alias("admitted"),
            )
            reps = docs.join(
                members.where(F.col("doc_id") == F.col("rep")).select(
                    "doc_id"
                ),
                "doc_id",
            ).persist()

            # 2. probe the index with the batch's own ids EXCLUDED
            # (probe_candidates removes them BEFORE its cap window):
            # semantically the gate asks "does this near-dup anything
            # ALREADY ingested", and operationally a crash-replayed
            # batch probes an index that still holds its own crashed
            # attempt's leftover band files (erase-before-republish
            # runs at PUBLISH time, after this decision) — without
            # the exclusion an admitted doc would match ITSELF on
            # replay and flip to quarantined, and a leftover row
            # consuming a cap slot could displace a genuine indexed
            # doc and flip a decision the other way (r13 review)
            postings = session.read.parquet(f"{index_dir}/bands").select(
                "band", "bh", "doc_id"
            )
            # persisted (r14, guide §2.4): q_bands has up to FIVE
            # consumers per batch (two inside the index probe's
            # probe_candidates, two more in the within-batch self
            # probe, and the clean-bands publish) and each otherwise
            # re-plans the Python signing pass; reps being persisted
            # caches only the signing's INPUT, not its output
            q_bands = (
                band_rows(
                    minhash_signatures(
                        reps, geo["n"], geo["bands"] * geo["rows_per_band"]
                    ),
                    geo["bands"],
                    geo["rows_per_band"],
                )
                .withColumnRenamed("doc_id", "q_id")
                .persist()
            )
            per_match = probe_candidates(
                postings, q_bands, exclude_ids=docs
            )
            if within_batch:
                # in-batch near-dups (r14): the reps' band rows stand
                # in as postings and probe THEMSELVES through the
                # same capped shape; only (earlier -> later) directed
                # rows survive, so the first occurrence by doc_id
                # admits and later in-batch near-dups quarantine
                # against it.  No exclude_ids: own-batch ids are the
                # point here, and the relation never holds crashed-
                # attempt leftovers (it is derived from the batch).
                in_batch = probe_candidates(
                    q_bands.select(
                        "band", "bh", F.col("q_id").alias("doc_id")
                    ),
                    q_bands,
                ).where(F.col("match_id") < F.col("q_id"))
                per_match = per_match.unionByName(in_batch)
            if verify:
                bar = (
                    JACCARD_ADMIT_DEFAULT if threshold is None else threshold
                )
                qsh = reps.select(
                    F.col("doc_id").alias("q_id"),
                    shingles_expr(geo["n"]).alias("sh_a"),
                )
                # sh_b sources, LEFT-joined in preference order: the
                # index's persisted relation (self-maintained,
                # pre-computed arrays), the caller's verify_docs, the
                # batch's own reps (within-batch candidates' matches).
                # Ids never conflict on VALUE across sources (same
                # doc -> same shingles), so coalesce order is cost,
                # not correctness.
                srcs = []
                if has_sh:
                    srcs.append(
                        session.read.parquet(
                            f"{index_dir}/shingles"
                        ).select(
                            F.col("doc_id").alias("match_id"),
                            F.col("shingles").alias("__shb0"),
                        )
                    )
                if verify_docs is not None:
                    srcs.append(
                        verify_docs.select(
                            F.col("doc_id").alias("match_id"),
                            shingles_expr(geo["n"]).alias("__shb1"),
                        )
                    )
                if within_batch:
                    srcs.append(
                        reps.select(
                            F.col("doc_id").alias("match_id"),
                            shingles_expr(geo["n"]).alias("__shb2"),
                        )
                    )
                cand = per_match.join(qsh, "q_id")
                cols = []
                for s in srcs:
                    cols.append(s.columns[-1])
                    cand = cand.join(s, "match_id", "left")
                sh_b = F.coalesce(*[F.col(c) for c in cols])
                inter = F.size(F.array_intersect(F.col("sh_a"), sh_b))
                union_sz = F.size("sh_a") + F.size(sh_b) - inter
                jac = inter.cast("double") / union_sz
                # verified candidates flag on the UNROUNDED exact
                # Jaccard at the bar; unverifiable ones (no shingle
                # source knows the match — a bands-only index with an
                # incomplete verify_docs, or the bands/shingles crash
                # window — or an empty shingle union) fall back to
                # the band-hit flag: fail-CLOSED (r13 ADVICE medium —
                # the old inner-join verify silently ADMITTED exactly
                # the candidates the gate itself had admitted before)
                keep = F.when(
                    jac.isNotNull(), jac >= F.lit(bar)
                ).otherwise(F.col("n_band_hits") >= F.lit(min_bands))
                per_match = (
                    cand.where(keep)
                    .withColumn(
                        "jaccard",
                        F.when(jac.isNotNull(), F.round(jac, 6)).cast(
                            "double"
                        ),
                    )
                    .select("q_id", "match_id", "n_band_hits", "jaccard")
                )
            else:
                per_match = per_match.where(
                    F.col("n_band_hits") >= F.lit(min_bands)
                ).withColumn("jaccard", F.lit(None).cast("double"))
            wbest = Window.partitionBy("q_id").orderBy(
                F.desc("n_band_hits"), F.asc("match_id")
            )
            best = (
                per_match.withColumn("__r", F.row_number().over(wbest))
                .where(F.col("__r") == 1)
                .select("q_id", "match_id", "n_band_hits", "jaccard")
            )
            rep_decisions = (
                reps.select("doc_id")
                .join(
                    best.withColumnRenamed("q_id", "doc_id"),
                    "doc_id",
                    "left",
                )
                .select(
                    "doc_id",
                    F.coalesce("n_band_hits", F.lit(0)).alias(
                        "n_band_hits"
                    ),
                    F.col("match_id").alias("matched_id"),
                    "jaccard",
                    F.col("match_id").isNull().alias("admitted"),
                )
            )
            decisions = (
                rep_decisions.unionByName(copies)
                .withColumn("batch_id", F.lit(batch_id).cast("long"))
                .withColumn(
                    "gate",
                    F.when(F.col("admitted"), "admit").otherwise(
                        "quarantine"
                    ),
                )
                .persist()
            )

            # 3. publish: clean reps' bands (the probe pass's own band
            # rows, filtered — no second signature pass), then the
            # decision table
            clean_bands = q_bands.withColumnRenamed(
                "q_id", "doc_id"
            ).join(decisions.where("admitted").select("doc_id"), "doc_id")
            _check_epoch(session, index_dir, bound_epoch)
            publish_batch(
                session,
                index_dir,
                f"{lineage}-{batch_id}-bands",
                {"bands": clean_bands.select("doc_id", "band", "bh")},
                part_col="band",
            )
            if has_sh:
                # the admitted reps' shingles join the verify relation
                # with their bands — this is what keeps verify-mode
                # self-maintenance true (docstring step 3)
                publish_batch(
                    session,
                    index_dir,
                    f"{lineage}-{batch_id}-sh",
                    {
                        "shingles": _shingle_table(
                            docs.join(
                                decisions.where("admitted").select(
                                    "doc_id"
                                ),
                                "doc_id",
                            ),
                            geo["n"],
                        )
                    },
                    part_col="shard",
                )
            publish_batch(
                session,
                index_dir,
                f"{lineage}-{batch_id}-adm",
                {"admissions": decisions},
                part_col="gate",
            )
            (srow,) = decisions.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("admitted"), 0).otherwise(1)).alias(
                    "flagged"
                ),
            ).collect()
            n = srow.n or 0
            rate = ((srow.flagged or 0) / n) if n else 0.0
            # rated against the index's build-time dup-rate baseline —
            # the maintenance stream's two-bar shape (r13 ADVICE): an
            # ingest whose flag rate matches the dup rate of the very
            # corpus the index was built from is business as usual,
            # not drift, and must not recommend rebuild forever
            base = _index_baseline(session, index_dir).get("dup_rate")
            ratio = (rate / base) if (base and base > 0) else None
            _append_drift(
                session,
                index_dir,
                {
                    "batch_id": batch_id,
                    "n": n,
                    "cells_touched": None,
                    "top_cell_share": None,
                    "mean_residual": round(rate, 6),
                    "baseline_residual": base,
                    "residual_ratio": (
                        round(ratio, 6) if ratio is not None else None
                    ),
                    "rebuild_recommended": bool(
                        n >= DRIFT_MIN_BATCH
                        and rate > MINHASH_DRIFT_MIN_DUP_RATE
                        and (
                            base is None
                            or base == 0
                            or rate > MINHASH_DRIFT_DUP_RATE_RATIO * base
                        )
                    ),
                },
                lineage=lineage,
            )
        finally:
            # unpersist in finally (r13 review): a fence refusal or
            # publish failure between persist and here must not leak
            # cached relations across a crash/retry loop
            docs.unpersist()
            if reps is not None:
                reps.unpersist()
            if q_bands is not None:
                q_bands.unpersist()
            if decisions is not None:
                decisions.unpersist()

    writer = (
        docs_stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# Semantic admission (r14): exact-cosine bar for the verified path —
# the SemDeDup-style "semantically redundant" threshold; arrivals at
# or above it against any indexed vector are quarantined.
SEMANTIC_ADMIT_COSINE = 0.92
# There is deliberately NO default quantized-score bar: measured on
# the test corpus, the ADC of an EXACT COPY ranges 0.37-0.75 (median
# 0.50) while the non-match shortlist p95 sits at ~0.26 — the PQ
# reconstruction error swamps any fixed margin under a cosine
# threshold, so ADC is nomination evidence, never a decision.  The
# gate therefore REQUIRES an exact verify source (the persisted
# vector relation or verify_vecs); a caller who has calibrated the
# separation on their own corpus may pass an explicit ``adc_bar``
# instead (decision: adc >= adc_bar for candidates no vector source
# can verify).
# Self-baseline warmup: the semantic drift row rates the batch flag
# rate against the TRAILING MEDIAN of this lineage's own prior rows
# (an IVFADC build records no "expected semantic-dup rate" the way
# the minhash build records its exact-dup rate) — before this many
# rows exist, the absolute bar alone decides, so a steady high-dup
# ingest flags during warmup and then goes quiet once its own rate
# IS the baseline.
SEMANTIC_DRIFT_WARMUP = 3
SEMANTIC_DRIFT_MIN_FLAG_RATE = 0.2
SEMANTIC_DRIFT_FLAG_RATE_RATIO = 2.0


def _lineage_trailing_baseline(
    fs, lineage: str, warmup: int = SEMANTIC_DRIFT_WARMUP
) -> float | None:
    """Median ``mean_residual`` of THIS lineage's prior drift rows
    (file names are ``{lineage}-{batch:012d}.json``, one metadata
    listing + a handful of tiny reads) — the self-baseline for
    streams whose index records no build-time rate to compare
    against.  None until ``warmup`` rows exist."""
    rows = []
    for p in _drift_row_files(fs):
        if not p.rsplit("/", 1)[1].startswith(f"{lineage}-"):
            continue
        try:
            r = json.loads(fs.read_bytes(p).decode())
        except Exception:
            continue
        if r.get("mean_residual") is not None:
            rows.append((r.get("batch_id") or 0, float(r["mean_residual"])))
    if len(rows) < warmup:
        return None
    vals = sorted(v for _, v in rows)
    mid = len(vals) // 2
    return (
        vals[mid]
        if len(vals) % 2
        else (vals[mid - 1] + vals[mid]) / 2.0
    )


def run_semantic_admission_stream(
    spark: SparkSession,
    vectors_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    threshold: float = SEMANTIC_ADMIT_COSINE,
    nprobe: int | None = None,
    rerank: int | None = None,
    verify_vecs: DataFrame | None = None,
    adc_bar: float | None = None,
    within_batch: bool = False,
    available_now: bool = True,
):
    """Streaming SEMANTIC admission gate over an embedding ingest —
    the embedding-plane twin of :func:`run_neardup_admission_stream`
    (r14), completing the admission family: exact/near-dup text
    (minhash), semantic redundancy (this), token budget
    (streaming/admission.py).  Per micro-batch of (vec_id, embedding)
    arrivals against a persisted IVFADC index:

    1. within-batch exact collapse — one rep (min vec_id) per
       BIT-identical embedding (xxhash64 over the array); copies are
       quarantined against their rep at cosine exactly 1.0;
    2. reps probe the index through the factored ADC nomination
       stage (operators/similarity.py::ivfpq_adc_shortlist — probe
       the nprobe nearest frozen cells, score ONLY those cells'
       residual codes, per-query top-``rerank`` shortlist; own-batch
       ids excluded BEFORE the cut, the replay-determinism ordering
       of the minhash gate's probe).  Each candidate is then decided
       by EXACT cosine where a vector source knows the match — the
       index's persisted ``vectors`` relation (self-maintained, the
       preferred source), the caller's ``verify_vecs``, or (for
       within-batch candidates) the batch itself.  At least one
       exact source is REQUIRED (ValueError otherwise): unlike
       minhash band hits, the ADC shortlist always nominates
       top-``rerank`` rows and its quantized score cannot carry a
       cosine bar (module calibration note: an exact copy's ADC is
       0.37-0.75 on the test corpus), so nomination never decides.
       A candidate NO source can verify flags only under a
       caller-calibrated ``adc_bar`` — and with the persisted
       relation such a candidate cannot arise from the gate's own
       operation, because vectors publish BEFORE codes (crash
       window produces the inert vector-without-code, never a
       nominating code row without its verify vector);
    3. ``within_batch=True`` additionally blocks the batch's reps by
       their top-1 coarse cell and exact-cosines each pair inside a
       cell — the first occurrence by vec_id admits, later in-batch
       semantic dups quarantine against it (same-cell blocking is
       the pair path's trade: a ≥-threshold pair straddling a cell
       boundary is missed here and caught from the next batch on);
    4. the CLEAN reps' residual codes join the index through
       ``publish_batch`` (the SAME frozen-component encode the
       maintenance stream uses — maintained-equals-rebuilt
       determinism holds), their raw vectors join the persisted
       verify relation when the index carries one, and every
       decision lands in ``{index}/admissions`` (vec_id, adc,
       matched_id, cosine, admitted, batch_id) partitioned by
       ``gate=admit/quarantine``.

    Exactly-once: up to three batch-keyed markers (``…-codes``,
    ``…-vec``, ``…-adm``), each replaying idempotently — the
    neardup gate's argument verbatim; decisions are deterministic in
    (batch content, effective index) because own-batch leftovers are
    excluded from nomination and frozen components make encoding
    deterministic.  Batch size is bounded by the loud PQ_Q_CAP
    (131072) of the driver-side ADC tables — size
    ``maxFilesPerTrigger`` accordingly.

    Drift: one row per batch records the FLAG RATE, rated against
    the TRAILING MEDIAN of this lineage's own prior rows
    (``_lineage_trailing_baseline``) — an IVFADC build records no
    expected semantic-dup rate, so the stream learns its own: a
    steady 30%-dup ingest flags only during the
    ``SEMANTIC_DRIFT_WARMUP`` cold-start and then goes quiet, while
    a genuine surge doubles the trailing median and flags (the r13
    ADVICE two-bar lesson, without a build-time baseline to lean
    on)."""
    from pyspark.sql.window import Window

    from ..operators.similarity import (
        IVFPQ_NPROBE,
        PQ_RERANK,
        _assign_clusters,
        _unit_corpus,
        _vector_table,
        cosine_expr,
        ivfpq_adc_shortlist,
        pq_encode,
        with_norm,
    )

    nprobe = IVFPQ_NPROBE if nprobe is None else nprobe
    rerank = PQ_RERANK if rerank is None else rerank
    bound_epoch = _bind_index_epoch(spark, index_dir, checkpoint_dir)
    lineage = _lineage_id(spark, checkpoint_dir)
    ifs = _meta_fs(spark, index_dir)
    has_vec = ifs.kind(f"{ifs.root}/vectors") == "dir"
    if not has_vec and verify_vecs is None and adc_bar is None:
        raise ValueError(
            f"semantic admission: the index at {index_dir} has no "
            f"persisted vector relation and no verify_vecs was "
            f"supplied — the ADC shortlist alone cannot DECIDE "
            f"admission (it always nominates top-{rerank} candidates "
            f"and the quantized score of even an exact copy is far "
            f"below the cosine bar — see the module calibration "
            f"note).  Rebuild with with_vectors=True, pass "
            f"verify_vecs, or pass an adc_bar you calibrated on "
            f"your own corpus."
        )

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        from ..session import local_rows_df

        session = batch_df.sparkSession
        vecs = batch_df.select("vec_id", "embedding").persist()
        reps = decisions = None
        try:
            # 1. within-batch exact collapse (bit-identical arrays)
            key = F.xxhash64("embedding")
            groups = vecs.groupBy(key.alias("k")).agg(
                F.min("vec_id").alias("rep")
            )
            members = (
                vecs.select("vec_id", key.alias("k"))
                .join(groups, "k")
                .select("rep", "vec_id")
            )
            copies = members.where(
                F.col("vec_id") != F.col("rep")
            ).select(
                "vec_id",
                F.lit(None).cast("double").alias("adc"),
                F.col("rep").alias("matched_id"),
                F.round(F.lit(1.0), 6).alias("cosine"),
                F.lit(False).alias("admitted"),
            )
            reps = vecs.join(
                members.where(F.col("vec_id") == F.col("rep")).select(
                    "vec_id"
                ),
                "vec_id",
            ).persist()
            batch_ids = [r.vec_id for r in reps.select("vec_id").collect()]

            # 2. ADC nomination against the persisted index, own ids
            # excluded before the shortlist cut
            cents = _index_centroids(session, index_dir)
            books = _index_books(session, index_dir)
            coded = session.read.parquet(f"{index_dir}/codes").select(
                "cluster", "vec_id", "code"
            )
            cand = ivfpq_adc_shortlist(
                session,
                reps,
                (cents, books, coded),
                nprobe=nprobe,
                rerank=rerank,
                exclude_ids=batch_ids,
            )
            if within_batch:
                # 3. same-cell exact-cosine pairs among the reps;
                # earlier vec_id admits (deterministic, batch-only)
                assigned = _assign_clusters(with_norm(reps), cents)
                rn = with_norm(reps).join(
                    assigned.select("vec_id", "cluster"), "vec_id"
                ).select("vec_id", "cluster", "emb_d", "norm")
                a = rn.alias("a")
                b = rn.alias("b")
                in_batch = (
                    a.join(b, F.col("a.cluster") == F.col("b.cluster"))
                    .where(F.col("b.vec_id") < F.col("a.vec_id"))
                    .select(
                        F.col("a.vec_id").alias("q_id"),
                        F.col("b.vec_id").alias("neighbor_id"),
                        cosine_expr("a", "b").alias("adc"),
                    )
                    .where(F.col("adc") >= F.lit(threshold))
                )
                cand = cand.unionByName(in_batch)

            # exact verification in preference order: persisted
            # vectors -> verify_vecs -> the batch's own reps
            srcs = []
            if has_vec:
                srcs.append(
                    session.read.parquet(f"{index_dir}/vectors").select(
                        F.col("vec_id").alias("neighbor_id"),
                        F.col("embedding").alias("__emb0"),
                    )
                )
            if verify_vecs is not None:
                srcs.append(
                    verify_vecs.select(
                        F.col("vec_id").alias("neighbor_id"),
                        F.col("embedding").alias("__emb1"),
                    )
                )
            if within_batch:
                srcs.append(
                    reps.select(
                        F.col("vec_id").alias("neighbor_id"),
                        F.col("embedding").alias("__emb2"),
                    )
                )
            qn = with_norm(reps).select(
                F.col("vec_id").alias("q_id"), "emb_d", "norm"
            )
            jc = cand.join(qn.alias("q"), "q_id")
            cols = []
            for s in srcs:
                cols.append(s.columns[-1])
                jc = jc.join(s, "neighbor_id", "left")
            if cols:
                # b-side prepared EXPLICITLY — with_norm would
                # short-circuit on the query side's emb_d column and
                # silently score q against itself
                emb_b = F.transform(
                    F.coalesce(*[F.col(c) for c in cols]),
                    lambda x: x.cast("double"),
                )
                norm_b = F.sqrt(
                    F.aggregate(
                        emb_b, F.lit(0.0), lambda acc, x: acc + x * x
                    )
                )
                dot = F.aggregate(
                    F.zip_with(
                        F.col("emb_d"), emb_b, lambda x, y: x * y
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                scored = jc.withColumn(
                    "__cos", dot / (F.col("norm") * norm_b)
                )
            else:
                scored = jc.withColumn(
                    "__cos", F.lit(None).cast("double")
                )
            # verified candidates decide on the exact cosine at the
            # bar; unverifiable ones only flag when the caller gave a
            # calibrated adc_bar (with the persisted relation and the
            # vectors-before-codes publish order, an unverifiable
            # candidate cannot arise from the gate's own operation —
            # only from an incomplete verify_vecs or a legacy index)
            keep = F.when(
                F.col("__cos").isNotNull(),
                F.col("__cos") >= F.lit(threshold),
            ).otherwise(
                F.lit(False)
                if adc_bar is None
                else F.col("adc") >= F.lit(adc_bar)
            )
            flagged = (
                scored.where(keep)
                .select(
                    "q_id",
                    F.col("neighbor_id").alias("matched_id"),
                    F.round("adc", 6).alias("adc"),
                    F.when(
                        F.col("__cos").isNotNull(),
                        F.round(F.col("__cos"), 6),
                    ).cast("double").alias("cosine"),
                )
            )
            wbest = Window.partitionBy("q_id").orderBy(
                F.desc_nulls_last("cosine"),
                F.desc_nulls_last("adc"),
                F.asc("matched_id"),
            )
            best = (
                flagged.withColumn("__r", F.row_number().over(wbest))
                .where(F.col("__r") == 1)
                .select("q_id", "matched_id", "adc", "cosine")
            )
            rep_decisions = (
                reps.select("vec_id")
                .join(
                    best.withColumnRenamed("q_id", "vec_id"),
                    "vec_id",
                    "left",
                )
                .select(
                    "vec_id",
                    "adc",
                    "matched_id",
                    "cosine",
                    F.col("matched_id").isNull().alias("admitted"),
                )
            )
            decisions = (
                rep_decisions.unionByName(copies)
                .withColumn("batch_id", F.lit(batch_id).cast("long"))
                .withColumn(
                    "gate",
                    F.when(F.col("admitted"), "admit").otherwise(
                        "quarantine"
                    ),
                )
                .persist()
            )

            # 4. publish: clean reps' residual codes (the maintenance
            # stream's exact encode — frozen components), optional raw
            # vectors, then the decision table
            clean = reps.join(
                decisions.where("admitted").select("vec_id"), "vec_id"
            )
            cn = _unit_corpus(with_norm(clean))
            assigned = _assign_clusters(cn, cents).select(
                "vec_id", "cluster"
            )
            cent_df = local_rows_df(
                session,
                [
                    (int(i), [float(v) for v in cents[i]])
                    for i in range(len(cents))
                ],
                "cluster int, carr array<double>",
            )
            res = (
                cn.join(assigned, "vec_id")
                .join(F.broadcast(cent_df), "cluster")
                .select(
                    "vec_id",
                    F.zip_with(
                        "emb_d", "carr", lambda x, c: x - c
                    ).alias("emb_d"),
                    F.lit(1.0).alias("norm"),
                )
            )
            coded_out = (
                pq_encode(res, books)
                .join(assigned, "vec_id")
                .select("cluster", "vec_id", "code")
            )
            _check_epoch(session, index_dir, bound_epoch)
            # vectors land BEFORE codes: a code row is what nominates
            # candidates, so the crash window can only produce the
            # inert "vector without code", never a code row whose
            # exact verification is impossible (the minhash
            # bands-before-shingles argument, direction REVERSED to
            # match which table drives nomination here)
            if has_vec:
                publish_batch(
                    session,
                    index_dir,
                    f"{lineage}-{batch_id}-vec",
                    {
                        "vectors": _vector_table(
                            clean.select("vec_id", "embedding")
                        )
                    },
                    part_col="shard",
                )
            publish_batch(
                session,
                index_dir,
                f"{lineage}-{batch_id}-codes",
                {"codes": coded_out},
                part_col="cluster",
            )
            publish_batch(
                session,
                index_dir,
                f"{lineage}-{batch_id}-adm",
                {"admissions": decisions},
                part_col="gate",
            )
            (srow,) = decisions.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("admitted"), 0).otherwise(1)).alias(
                    "flagged"
                ),
            ).collect()
            n = srow.n or 0
            rate = ((srow.flagged or 0) / n) if n else 0.0
            base = _lineage_trailing_baseline(ifs, lineage)
            ratio = (rate / base) if (base and base > 0) else None
            _append_drift(
                session,
                index_dir,
                {
                    "batch_id": batch_id,
                    "n": n,
                    "cells_touched": None,
                    "top_cell_share": None,
                    "mean_residual": round(rate, 6),
                    "baseline_residual": base,
                    "residual_ratio": (
                        round(ratio, 6) if ratio is not None else None
                    ),
                    "rebuild_recommended": bool(
                        n >= DRIFT_MIN_BATCH
                        and rate > SEMANTIC_DRIFT_MIN_FLAG_RATE
                        and (
                            base is None
                            or base == 0
                            or rate
                            > SEMANTIC_DRIFT_FLAG_RATE_RATIO * base
                        )
                    ),
                },
                lineage=lineage,
            )
        finally:
            vecs.unpersist()
            if reps is not None:
                reps.unpersist()
            if decisions is not None:
                decisions.unpersist()

    writer = (
        vectors_stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
