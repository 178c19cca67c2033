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
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.listener import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_id string, run_id string, name string, batch_id long, "
    "ts string, num_input_rows long, input_rows_per_sec double, "
    "processed_rows_per_sec double, trigger_ms long, "
    "state_rows long, state_mem_bytes long"
)


class ProgressRecorder(StreamingQueryListener):
    """Append one JSON line per micro-batch progress event."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()

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
        # thread pool — serialize appends so lines never interleave
        with self._lock:
            with open(self.path, "a") as f:
                f.write(json.dumps(row) + "\n")


def attach_progress_recorder(
    spark: SparkSession, path: str
) -> ProgressRecorder:
    """Register (and return) a recorder on the session's listener bus;
    detach with ``spark.streams.removeListener(recorder)``."""
    rec = ProgressRecorder(path)
    spark.streams.addListener(rec)
    return rec


def read_progress(spark: SparkSession, path: str) -> DataFrame:
    """The ledger as a DataFrame (plain SQL over stream health)."""
    return spark.read.schema(PROGRESS_SCHEMA).json(path)
