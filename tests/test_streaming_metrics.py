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
