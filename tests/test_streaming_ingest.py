"""Continuous-ingest and streaming-dedup tests (Trigger.AvailableNow)."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F

from mahjong_etl_spark.streaming.dedup_stream import dedup_stream
from mahjong_etl_spark.streaming.ingest import start_ingest

FIXTURES = "tests/fixtures/logs"


def test_streaming_ingest_matches_batch_tables(spark, tmp_path):
    logs = tmp_path / "logs"
    shutil.copytree(FIXTURES, logs)
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    q = start_ingest(spark, str(logs), str(out), str(ckpt), available_now=True)
    q.awaitTermination()

    games = spark.read.parquet(f"{out}/games")
    kyokus = spark.read.parquet(f"{out}/kyokus")
    haipais = spark.read.parquet(f"{out}/haipais")
    assert games.count() == 4
    assert kyokus.count() == 5
    assert kyokus.select("id").distinct().count() == 5
    # hash-minted ids stay joinable and land above the batch id range
    assert haipais.join(kyokus, haipais.kyoku_id == kyokus.id).count() == haipais.count()
    assert kyokus.agg(F.min("id")).collect()[0][0] > 2**40

    # restart with the same checkpoint: nothing new to process,
    # nothing double-written (exactly-once per file)
    q2 = start_ingest(spark, str(logs), str(out), str(ckpt), available_now=True)
    q2.awaitTermination()
    assert spark.read.parquet(f"{out}/games").count() == 4

    # a newly-landed file is picked up incrementally
    late = logs / "20240104"
    late.mkdir()
    shutil.copy(f"{FIXTURES}/20240102/g1minimal.xml", late / "late1.xml")
    q3 = start_ingest(spark, str(logs), str(out), str(ckpt), available_now=True)
    q3.awaitTermination()
    assert spark.read.parquet(f"{out}/games").count() == 5
    assert spark.read.parquet(f"{out}/kyokus").select("id").distinct().count() == 6


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    rows1 = [(1, "2024-01-01 10:00:00", "doc-a"), (2, "2024-01-01 10:01:00", "doc-b")]
    rows2 = [(3, "2024-01-01 10:02:00", "doc-a"), (4, "2024-01-01 10:03:00", "doc-c")]
    schema = "id long, ts timestamp, text string"
    for i, rows in enumerate([rows1, rows2]):
        spark.createDataFrame(
            [(i0, __import__("datetime").datetime.fromisoformat(t), x) for i0, t, x in rows],
            schema,
        ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    table = f"dedup_out_{uuid.uuid4().hex[:8]}"
    q = (
        dedup_stream(stream, ["text"], ts_col="ts", watermark="1 hour")
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    texts = [r.text for r in spark.table(table).collect()]
    assert sorted(texts) == ["doc-a", "doc-b", "doc-c"]


def test_ingest_crash_mid_publish_replays_without_duplicates(spark, tmp_path, monkeypatch):
    """The binaryFile ingest shares the batch-keyed idempotent publish
    with the tenhou streaming ETL (r7 review: it used plain appends,
    so a crash-replayed micro-batch duplicated every table).  Fail one
    table's publish while the rest land (the fanout is concurrent
    since r8), restart, and row counts must equal a clean one-shot
    run."""
    import threading

    import pytest

    import mahjong_etl_spark.streaming.etl_stream as es

    logs = tmp_path / "logs"
    shutil.copytree(FIXTURES, logs)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    real = es._publish_table_df
    lock = threading.Lock()
    calls = {"n": 0, "failed": False}

    def flaky(df, t, out_dir, key, fs, part_col="dt"):
        with lock:
            calls["n"] += 1
            fail = t == "kyokus" and not calls["failed"]
            if fail:
                calls["failed"] = True
        if fail:
            raise RuntimeError("injected crash between sink writes")
        real(df, t, out_dir, key, fs, part_col)

    monkeypatch.setattr(es, "_publish_table_df", flaky)
    q = start_ingest(spark, str(logs), out, ckpt, available_now=True)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()
    q.stop()
    assert calls["failed"] and calls["n"] >= 2  # partial publish, no marker

    monkeypatch.setattr(es, "_publish_table_df", real)
    q2 = start_ingest(spark, str(logs), out, ckpt, available_now=True)
    q2.awaitTermination()
    games = spark.read.parquet(f"{out}/games")
    kyokus = spark.read.parquet(f"{out}/kyokus")
    assert games.count() == 4  # zero duplicates across the replay
    assert kyokus.select("id").distinct().count() == kyokus.count() == 5


def test_ingest_quarantines_corrupt_files(spark, tmp_path):
    """A malformed XML in the watched tree must land in {out}/_corrupt
    with the batch pipeline's (dt, game_id, error) row — never vanish
    (r7 review: the old filter silently dropped it)."""
    logs = tmp_path / "logs"
    shutil.copytree(FIXTURES, logs)
    (logs / "20240102" / "broken.xml").write_bytes(b"<mjloggm><UNCLOSED")

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = start_ingest(spark, str(logs), out, ckpt, available_now=True)
    q.awaitTermination()

    assert spark.read.parquet(f"{out}/games").count() == 4  # good ones intact
    bad = spark.read.parquet(f"{out}/_corrupt").collect()
    assert len(bad) == 1 and bad[0].game_id == "broken"
    assert "ParseError" in bad[0].error


def test_dedup_stream_null_shifted_payloads_stay_distinct(spark, tmp_path):
    """concat_ws skips NULLs, so ("click", NULL) and (NULL, "click")
    used to hash identically and one DISTINCT row was silently
    dropped; the JSON-struct hash keeps them distinct (r7 review)."""
    import datetime

    src = tmp_path / "null_src"
    rows = [
        (1, "2024-01-01 10:00:00", "click", None),
        (2, "2024-01-01 10:01:00", None, "click"),
        (3, "2024-01-01 10:02:00", "a\x00", "b"),
        (4, "2024-01-01 10:03:00", "a", "\x00b"),
        (5, "2024-01-01 10:04:00", "a\x00", "b"),  # true duplicate of 3
    ]
    schema = "id long, ts timestamp, a string, b string"
    spark.createDataFrame(
        [(i, datetime.datetime.fromisoformat(t), x, y) for i, t, x, y in rows],
        schema,
    ).coalesce(1).write.parquet(str(src))

    stream = (
        spark.readStream.schema(schema).parquet(str(src))
        .transform(lambda df: dedup_stream(df, ["a", "b"]))
    )
    name = f"null_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory").queryName(name)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    kept = {r.id for r in spark.table(name).collect()}
    assert kept == {1, 2, 3, 4}  # only the true duplicate dropped


def test_anomaly_stream_extreme_values_exact_not_wrapped(spark, tmp_path):
    """xm*xm past int64 used to WRAP in numpy: negative variance ->
    NaN std (warning suppressed) -> the key silently never flags
    again.  The exact-int rewrite keeps correct statistics while the
    carried LongType state fits, and fails LOUDLY (like the batch
    twin's ANSI sum) when it cannot (r7 review)."""
    import datetime

    import pytest

    from mahjong_etl_spark.streaming.anomaly_stream import anomaly_stream

    # 9 baseline events then one spike; value 2.5e6 -> xm=2.5e9,
    # xm^2 = 6.25e18 (fits int64) but the OLD cumsum-after-wrap path
    # is exercised by the second large value below
    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 7, "click", 100.0 + i)
        for i in range(9)
    ] + [(9, base + datetime.timedelta(minutes=9), 7, "click", 2.5e6)]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = tmp_path / "anom_src"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src))

    def drain(path):
        name = f"anom_{uuid.uuid4().hex[:8]}"
        q = (
            anomaly_stream(spark.readStream.schema(schema).parquet(str(path)))
            .writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return spark.table(name)

    flagged = drain(src).collect()
    # the spike is flagged with a finite z (old code: wrapped stats
    # could NaN out the flag)
    assert [r.event_id for r in flagged] == [9]
    assert flagged[0].z == flagged[0].z  # not NaN

    # two such spikes overflow the carried int64 sum-of-squares state:
    # the stream must fail loudly, not corrupt the statistics
    rows2 = rows + [
        (10, base + datetime.timedelta(minutes=10), 7, "click", 2.5e6)
    ]
    src2 = tmp_path / "anom_src2"
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(str(src2))
    with pytest.raises(Exception, match="[Oo]verflow"):
        drain(src2)
