"""Streaming observability: per-micro-batch progress captured to a
queryable JSONL ledger via ``StreamingQueryListener``.

streaming/introspect.py answers "what is IN the state store";
this module answers the other on-call question — "how is the stream
DOING": rows/sec in and processed, trigger latency, and state-store
row/memory counts per batch, recorded as one JSON line per progress
event.  ``read_progress`` turns the ledger back into a DataFrame so
capacity questions ("p95 trigger latency last hour", "is state
growing") are plain SQL — the same discipline as the output manifest
(plans/manifest.py): operational truth lands in analyzable tables,
not log greps.

Scale shape: the listener runs driver-side on the existing progress
event bus (zero executor cost, zero effect on the query plan); each
line is a few hundred bytes per micro-batch.  The ledger is an
append-only local/posix file — on a cluster, point it at shared
storage or ship it with sources/sync.py; one file per driver process
(the writer is the only concurrency).

Rotation (r9): a long-lived driver (a standing stream triggers every
few seconds for months) must not grow one file without bound — when
the active file passes ``max_bytes`` it is renamed to ``{path}.{n}``
(n increasing — numeric order is age order; NOT lexicographic, which
breaks at ``.10`` vs ``.2``, so every reader sorts by the parsed
suffix) and only
the newest ``max_segments`` rotated segments are kept: total ledger
disk is bounded at ~(max_segments+1) x max_bytes no matter how long
the driver lives.  ``read_progress`` reads the active file AND every
surviving segment, so rotation is invisible to the SQL surface.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.listener import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_id string, run_id string, name string, batch_id long, "
    "ts string, num_input_rows long, input_rows_per_sec double, "
    "processed_rows_per_sec double, trigger_ms long, "
    "state_rows long, state_mem_bytes long"
)


def _rotated_indexes(path: str) -> list[int]:
    """Numeric suffixes of existing rotated segments, ascending."""
    out = []
    for p in _glob.glob(f"{_glob.escape(path)}.*"):
        suffix = p[len(path) + 1:]
        if suffix.isdigit():
            out.append(int(suffix))
    return sorted(out)


class ProgressRecorder(StreamingQueryListener):
    """Append one JSON line per micro-batch progress event, rotating
    the file at ``max_bytes`` and keeping ``max_segments`` rotated
    segments (module docstring)."""

    def __init__(
        self,
        path: str,
        max_bytes: int = 16 * 1024 * 1024,
        max_segments: int = 8,
    ):
        self.path = path
        self.max_bytes = max_bytes
        self.max_segments = max_segments
        self._lock = threading.Lock()

    def _rotate_locked(self) -> None:
        try:
            if os.path.getsize(self.path) < self.max_bytes:
                return
        except OSError:
            return  # nothing written yet
        idxs = _rotated_indexes(self.path)
        nxt = (idxs[-1] + 1) if idxs else 1
        os.replace(self.path, f"{self.path}.{nxt}")
        for old in (idxs + [nxt])[: -self.max_segments or None]:
            try:
                os.remove(f"{self.path}.{old}")
            except OSError:
                pass  # already gone — retention is best-effort

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = sum(
            (s.numRowsTotal or 0) for s in (p.stateOperators or [])
        )
        state_mem = sum(
            (s.memoryUsedBytes or 0) for s in (p.stateOperators or [])
        )
        dur = p.durationMs or {}
        row = {
            "query_id": str(p.id),
            "run_id": str(p.runId),
            "name": p.name,
            "batch_id": p.batchId,
            "ts": p.timestamp,
            "num_input_rows": p.numInputRows,
            "input_rows_per_sec": p.inputRowsPerSecond,
            "processed_rows_per_sec": p.processedRowsPerSecond,
            "trigger_ms": dur.get("triggerExecution"),
            "state_rows": state_rows,
            "state_mem_bytes": state_mem,
        }
        # progress events for different queries arrive on one bus
        # thread pool — serialize appends so lines never interleave;
        # rotation happens under the same lock so a segment boundary
        # can never split a line
        with self._lock:
            self._rotate_locked()
            with open(self.path, "a") as f:
                f.write(json.dumps(row) + "\n")


def attach_progress_recorder(
    spark: SparkSession,
    path: str,
    max_bytes: int = 16 * 1024 * 1024,
    max_segments: int = 8,
) -> ProgressRecorder:
    """Register (and return) a recorder on the session's listener bus;
    detach with ``spark.streams.removeListener(recorder)``."""
    rec = ProgressRecorder(path, max_bytes, max_segments)
    spark.streams.addListener(rec)
    return rec


def read_progress(spark: SparkSession, path: str) -> DataFrame:
    """The ledger as a DataFrame (plain SQL over stream health) —
    the active file plus every surviving rotated segment, so queries
    span rotation boundaries transparently.

    Segments are enumerated through the scheme-portable metadata FS
    (streaming/etl_stream.py), so a ledger shipped to shared storage
    keeps its rotated history; only EXACT ``{name}.{digits}`` siblings
    are included (a glob like ``{path}*`` would sweep ``.bak`` files
    into the scan as all-null PERMISSIVE rows, and break outright on
    glob metacharacters in the path).  ``ignoreMissingFiles`` plus one
    re-enumeration retry tolerate the live recorder rotating between
    listing and scan."""
    from .etl_stream import _meta_fs

    def _paths() -> list[str]:
        fs = _meta_fs(spark, path)
        parent, name = fs.root.rsplit("/", 1)
        if fs.kind(parent) is None:
            return [path]
        out = []
        for p in fs.list_files(parent):
            base = p.rsplit("/", 1)[-1]
            if base == name or (
                base.startswith(f"{name}.")
                and base[len(name) + 1:].isdigit()
            ):
                out.append(p)
        # age order = NUMERIC suffix order ('.10' is younger than
        # '.2'; lexicographic sorting would interleave them), active
        # file (no suffix) last as the youngest
        def _age(p: str) -> int:
            suffix = p.rsplit("/", 1)[-1][len(name) + 1:]
            return int(suffix) if suffix.isdigit() else 1 << 62

        return sorted(out, key=_age) or [path]

    reader = spark.read.schema(PROGRESS_SCHEMA).option(
        "ignoreMissingFiles", "true"
    )
    try:
        return reader.json(_paths())
    except Exception:
        # a rotation landed between enumeration and resolution —
        # re-enumerate once; a genuinely missing ledger re-raises
        return reader.json(_paths())
