"""Progress-ledger observability (streaming/metrics.py): every drained
micro-batch must land one queryable JSON line with consistent row
accounting, for stateless AND stateful queries."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from mahjong_etl_spark.streaming.metrics import (
    attach_progress_recorder,
    read_progress,
)


def _drop_files(tmp_path, n_files, rows_per_file):
    src = tmp_path / "src"
    src.mkdir()
    for i in range(n_files):
        p = src / f"f{i}.jsonl"
        with open(p, "w") as f:
            for j in range(rows_per_file):
                f.write(f'{{"user_id": {j % 3}, "v": {i * 100 + j}}}\n')
        os.utime(p, (1000 + i, 1000 + i))
    return str(src)


def test_progress_ledger_accounts_all_input_rows(spark, tmp_path):
    src = _drop_files(tmp_path, n_files=3, rows_per_file=40)
    ledger = str(tmp_path / "progress.jsonl")
    rec = attach_progress_recorder(spark, ledger)
    try:
        stream = (
            spark.readStream.schema("user_id long, v long")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = (
            stream.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("memory")
            .queryName("metrics_probe")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()
        # the listener bus delivers asynchronously; give it a moment
        for _ in range(50):
            if (
                os.path.exists(ledger)
                and sum(1 for _ in open(ledger)) >= 3
            ):
                break
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(rec)

    df = read_progress(spark, ledger).where(F.col("num_input_rows") > 0)
    rows = df.collect()
    assert len(rows) == 3  # one ledger line per data micro-batch
    assert sum(r.num_input_rows for r in rows) == 120
    assert {r.batch_id for r in rows} == {0, 1, 2}
    assert all(r.trigger_ms is not None and r.trigger_ms >= 0 for r in rows)
    # the stateful aggregate reports state rows (3 user_id keys)
    last = max(rows, key=lambda r: r.batch_id)
    assert last.state_rows == 3
    assert last.state_mem_bytes > 0
    # plain SQL over stream health works
    df.createOrReplaceTempView("stream_progress")
    (p95,) = spark.sql(
        "SELECT percentile(trigger_ms, 0.95) FROM stream_progress"
    ).collect()[0]
    assert p95 is not None


def test_progress_ledger_rotation_bounds_disk_and_spans_reads(spark, tmp_path):
    """A tiny max_bytes forces a rotation per append: the active file
    plus at most max_segments rotated segments survive (older ones
    deleted), and read_progress sees every surviving line across the
    boundary — rotation is invisible to the SQL surface."""
    from mahjong_etl_spark.streaming.metrics import ProgressRecorder

    ledger = str(tmp_path / "progress.jsonl")
    rec = ProgressRecorder(ledger, max_bytes=1, max_segments=3)

    class _P:
        def __init__(self, i):
            self.id, self.runId, self.name = f"q{i}", f"r{i}", "probe"
            self.batchId, self.timestamp = i, f"t{i}"
            self.numInputRows = 10 + i
            self.inputRowsPerSecond = 1.0
            self.processedRowsPerSecond = 2.0
            self.durationMs = {"triggerExecution": 5}
            self.stateOperators = []

    class _E:
        def __init__(self, i):
            self.progress = _P(i)

    for i in range(10):
        rec.onQueryProgress(_E(i))

    # every append past the first rotated: active file holds the last
    # line, and only max_segments=3 rotated segments survive
    segs = sorted(
        p for p in os.listdir(tmp_path) if p.startswith("progress.jsonl.")
    )
    assert len(segs) == 3
    assert {s.rsplit(".", 1)[1] for s in segs} == {"7", "8", "9"}

    # a sibling sharing the prefix but NOT a numeric segment must be
    # excluded (it would materialize as all-null PERMISSIVE rows)
    with open(f"{ledger}.bak", "w") as f:
        f.write("not json at all\n")

    df = read_progress(spark, ledger)
    got = sorted(r.batch_id for r in df.collect())
    # 4 surviving lines: 3 rotated segments + the active file
    assert got == [6, 7, 8, 9]
    assert all(r.num_input_rows == 10 + r.batch_id for r in df.collect())


def test_rotation_past_index_ten_keeps_numeric_age_order(spark, tmp_path):
    """Segment age order is the NUMERIC suffix order ('.10' is younger
    than '.2'; lexicographic sorting interleaves them — the r9
    docstring claimed otherwise).  Retention past ten segments must
    delete the numerically oldest, and read_progress must still see
    every surviving line."""
    from mahjong_etl_spark.streaming.metrics import (
        ProgressRecorder,
        _rotated_indexes,
        read_progress,
    )

    ledger = str(tmp_path / "p.jsonl")

    class _P:
        def __init__(self, i):
            self.id, self.runId, self.name = f"q{i}", f"r{i}", "probe"
            self.batchId, self.timestamp = i, f"t{i}"
            self.numInputRows = i
            self.inputRowsPerSecond = 1.0
            self.processedRowsPerSecond = 2.0
            self.durationMs = {"triggerExecution": 5}
            self.stateOperators = []

    class _E:
        def __init__(self, i):
            self.progress = _P(i)

    rec = ProgressRecorder(ledger, max_bytes=1, max_segments=4)
    for i in range(14):  # rotations reach suffix .13
        rec.onQueryProgress(_E(i))
    idxs = _rotated_indexes(ledger)
    # numerically newest four survive — lexicographic retention would
    # have kept {10, 11, 12, 13, 2}-style mixtures or dropped .13
    assert idxs == [10, 11, 12, 13]
    got = sorted(r.batch_id for r in read_progress(spark, ledger).collect())
    assert got == [9, 10, 11, 12, 13]
