"""The tenhou Python DataSource must reproduce the ETL's written
tables — minted kyoku ids included — straight off the raw log tree."""

from __future__ import annotations

import pytest

from mahjong_etl_spark.plans.mahjong_queries import FIXTURE_LOGS, _ensure_etl
from mahjong_etl_spark.schemas import TABLE_SCHEMAS
from mahjong_etl_spark.sources.tenhou_datasource import register_tenhou_source


from .helpers import canon as _canon


@pytest.fixture(scope="module")
def etl_root(spark):
    register_tenhou_source(spark)
    return _ensure_etl(spark)


@pytest.mark.parametrize("table", sorted(TABLE_SCHEMAS))
def test_source_matches_written_table(spark, etl_root, table):
    via_source = (
        spark.read.format("tenhou").option("table", table).load(FIXTURE_LOGS)
    )
    written = spark.read.parquet(f"{etl_root}/{table}").select(
        *[f.name for f in via_source.schema.fields]
    )
    # written dt is a hive partition value; normalize both to strings
    assert _canon(via_source) == _canon(written)


def test_partition_per_date_dir(spark, etl_root):
    import glob
    import os

    n_dates = len(glob.glob(os.path.join(FIXTURE_LOGS, "*")))
    df = spark.read.format("tenhou").option("table", "games").load(FIXTURE_LOGS)
    assert df.rdd.getNumPartitions() == n_dates


def test_date_prefix_prunes_and_typo_raises(spark, etl_root):
    import glob
    import os

    dates = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(FIXTURE_LOGS, "*"))
    )
    one = dates[0]
    df = (
        spark.read.format("tenhou")
        .option("table", "kyokus")
        .option("date", one)
        .load(FIXTURE_LOGS)
    )
    got_dts = {r.dt for r in df.select("dt").distinct().collect()}
    assert got_dts == {f"{one[:4]}-{one[4:6]}-{one[6:]}"}
    bad = (
        spark.read.format("tenhou")
        .option("table", "kyokus")
        .option("date", "19990101")
        .load(FIXTURE_LOGS)
    )
    with pytest.raises(Exception, match="no date directory"):
        bad.collect()


def test_unknown_table_rejected(spark, etl_root):
    with pytest.raises(Exception, match="unknown table"):
        spark.read.format("tenhou").option("table", "nope").load(FIXTURE_LOGS).schema


def test_stream_matches_batch_across_incremental_batches(spark, etl_root, tmp_path):
    """Chop the fixture tree into three arrivals; minted ids streamed
    across micro-batches must equal one batch read of the final tree."""
    import glob
    import os
    import shutil
    import time

    src_files = sorted(glob.glob(os.path.join(FIXTURE_LOGS, "*", "*.xml")))
    assert len(src_files) >= 3
    logs = tmp_path / "logs"
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def arrive(files):
        for f in files:
            d = logs / os.path.basename(os.path.dirname(f))
            d.mkdir(parents=True, exist_ok=True)
            shutil.copy(f, d / os.path.basename(f))

    def drain():
        # availableNow falls back to single-batch execution for Python
        # micro-batch sources — same drain semantics for this test;
        # the parquet sink + checkpoint give restartable exactly-once
        q = (
            spark.readStream.format("tenhou")
            .option("table", "kyokus")
            .load(str(logs))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        time.sleep(0.2)

    third = max(1, len(src_files) // 3)
    arrive(src_files[:third])
    drain()
    n_first = spark.read.parquet(sink).count()
    assert n_first > 0
    arrive(src_files[third:])
    drain()

    streamed = {
        tuple(str(v) for v in r)
        for r in spark.read.parquet(sink).select("dt", "id", "kyoku_num").collect()
    }
    batch = {
        tuple(str(v) for v in r)
        for r in spark.read.format("tenhou")
        .option("table", "kyokus")
        .load(str(logs))
        .select("dt", "id", "kyoku_num")
        .collect()
    }
    assert streamed == batch
    # incremental: the second drain added only the new files' rows
    assert len(streamed) > n_first


def test_stream_tolerates_not_yet_arrived_date(spark, tmp_path):
    """Watching a date that hasn't landed yet is a normal streaming
    state: latestOffset must report no data, not raise (batch keeps
    the loud-typo contract)."""
    from mahjong_etl_spark.sources.tenhou_datasource import (
        TenhouReader,
        TenhouStreamReader,
    )

    logs = tmp_path / "logs"
    logs.mkdir()
    r = TenhouStreamReader(
        TenhouReader({"path": str(logs), "date": "20990101"}, "kyokus")
    )
    assert r.latestOffset() == {"v": 2, "dates": {}}


def test_stream_raises_on_vanished_committed_file(spark, tmp_path):
    """A committed game id absent from the current listing must FAIL
    LOUDLY, not be silently skipped: landed logs are contractually
    immutable, so a missing committed file is always an anomaly
    (deletion, bad listing page) — and skipping it would shrink the
    rebuilt kyoku-minting offset, silently renumbering every id minted
    for that date afterwards (r6 advice)."""
    import glob
    import os
    import shutil

    import pytest

    from mahjong_etl_spark.sources.tenhou_datasource import (
        TenhouReader,
        TenhouStreamReader,
    )

    files = sorted(glob.glob(os.path.join(FIXTURE_LOGS, "*", "*.xml")),
                   key=os.path.basename)
    assert len(files) >= 2
    dt = "20240101"
    logs = tmp_path / "logs"
    (logs / dt).mkdir(parents=True)
    for f in files[:2]:
        shutil.copy(f, logs / dt / os.path.basename(f))

    r = TenhouStreamReader(TenhouReader({"path": str(logs)}, "games"))
    start = r.initialOffset()
    end1 = r.latestOffset()
    assert r.partitions(start, end1)  # both files visible: plans fine

    # the first committed file vanishes; a new file arrives
    gone = sorted((logs / dt).iterdir())[0]
    gone.unlink()
    shutil.copy(files[-1], logs / dt / os.path.basename(files[-1]))
    end2 = r.latestOffset()
    with pytest.raises(RuntimeError, match="vanished"):
        r.partitions(end1, end2)
    # same contract when the id is missing from END (offset log names
    # a file the re-listing no longer sees)
    with pytest.raises(RuntimeError, match="vanished"):
        r.partitions(start, end1)


def test_stream_late_arrival_no_dupes_no_skips(spark, tmp_path):
    """A file that sorts INSIDE the committed set (long game finishing
    after a later-started one) must still be processed exactly once —
    the failure mode of a sorted-prefix offset (r6 review finding)."""
    register_tenhou_source(spark)
    import glob
    import os
    import shutil

    # pool fixture games under ONE synthetic date dir so a
    # middle-sorted file can arrive late (any log parses under any
    # date — started_at comes from the directory name)
    files = sorted(glob.glob(os.path.join(FIXTURE_LOGS, "*", "*.xml")),
                   key=os.path.basename)
    dt = "20240101"
    assert len(files) >= 3
    logs = tmp_path / "logs"
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    (logs / dt).mkdir(parents=True)

    def arrive(f):
        shutil.copy(f, logs / dt / os.path.basename(f))

    def drain():
        q = (
            spark.readStream.format("tenhou")
            .option("table", "games")
            .load(str(logs))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    # first and LAST arrive first; the middle file arrives late
    arrive(files[0])
    arrive(files[-1])
    drain()
    arrive(files[1])
    drain()

    got = sorted(r.id for r in spark.read.parquet(sink).select("id").collect())
    want = sorted(os.path.splitext(os.path.basename(f))[0] for f in [files[0], files[1], files[-1]])
    assert got == want  # exactly once each: no dupes, no skips


def test_split_date_dir_minting_is_slice_invariant(spark, etl_root):
    """A hot date dir split across partitions must mint the SAME ids
    as the one-partition read: later slices rebuild their offset from
    the preceding files' <INIT> counts."""
    whole = (
        spark.read.format("tenhou").option("table", "kyokus").load(FIXTURE_LOGS)
    )
    split = (
        spark.read.format("tenhou")
        .option("table", "kyokus")
        .option("split", "1")  # one file per partition — maximal split
        .load(FIXTURE_LOGS)
    )
    assert split.rdd.getNumPartitions() > whole.rdd.getNumPartitions()
    assert _canon(split) == _canon(whole)


def test_stream_raises_on_vanished_whole_date_dir(spark, tmp_path):
    """A fully-committed date whose whole DIRECTORY vanished is absent
    from latestOffset, so iterating end-dates alone would silently
    skip the vanish check for exactly the total-loss case; partitions()
    must iterate the union of start and end dates (r7 review)."""
    import glob
    import os
    import shutil

    import pytest

    from mahjong_etl_spark.sources.tenhou_datasource import (
        TenhouReader,
        TenhouStreamReader,
    )

    files = sorted(glob.glob(os.path.join(FIXTURE_LOGS, "*", "*.xml")),
                   key=os.path.basename)
    dt = "20240101"
    logs = tmp_path / "logs"
    (logs / dt).mkdir(parents=True)
    shutil.copy(files[0], logs / dt / os.path.basename(files[0]))

    r = TenhouStreamReader(TenhouReader({"path": str(logs)}, "games"))
    committed = r.latestOffset()
    shutil.rmtree(logs / dt)  # the entire committed date dir vanishes
    end = r.latestOffset()
    assert dt not in end["dates"]
    with pytest.raises(RuntimeError, match="vanished"):
        r.partitions(committed, end)


def test_stream_raises_on_missing_root(spark, tmp_path):
    """A typo'd log_dir must fail loudly, not run as a forever-empty
    stream: only a watched DATE directory that has not arrived yet is
    the normal wait state (r7 review)."""
    import pytest

    from mahjong_etl_spark.sources.tenhou_datasource import (
        TenhouReader,
        TenhouStreamReader,
    )

    r = TenhouStreamReader(
        TenhouReader({"path": str(tmp_path / "lgos")}, "games")  # typo
    )
    with pytest.raises(FileNotFoundError):
        r.latestOffset()


def test_split_offset_rebuild_skips_corrupt_prior_file(spark, tmp_path):
    """Under on_error=skip a corrupt file contributes NO rows and NO
    offset — including when it lands in a PRIOR slice of a split date
    dir, where the rebuild used to byte-count its <INIT> tags and
    shift every id minted after it (r7 review).  The split read must
    mint identically to the unsplit read of the same tree."""
    import glob
    import os
    import shutil

    register_tenhou_source(spark)  # independent of the etl_root fixture
    files = sorted(glob.glob(os.path.join(FIXTURE_LOGS, "*", "*.xml")),
                   key=os.path.basename)
    dt = "20240101"
    logs = tmp_path / "logs"
    (logs / dt).mkdir(parents=True)
    for f in files:
        shutil.copy(f, logs / dt / os.path.basename(f))
    # corrupt file sorting FIRST: it is a prior file for every later
    # slice under split=1; its bytes still carry <INIT> tags
    (logs / dt / "a0corrupt.xml").write_bytes(
        b"<mjloggm><INIT seed/><INIT seed/><UNCLOSED"
    )

    def read(split):
        return (
            spark.read.format("tenhou")
            .option("table", "kyokus")
            .option("on_error", "skip")
            .option("split", str(split))
            .load(str(logs))
        )

    whole, split = read(256), read(1)
    assert split.rdd.getNumPartitions() > 1
    assert _canon(split) == _canon(whole)
    # and the minted ids equal the batch ETL's over the same tree
    from mahjong_etl_spark.plans.etl import run_etl

    out = str(tmp_path / "out")
    run_etl(spark, str(logs), out)
    written = spark.read.parquet(f"{out}/kyokus").select(
        *[f.name for f in whole.schema.fields]
    )
    assert _canon(whole) == _canon(written)


def test_batch_read_yields_arrow_batches_every_table():
    """The fast path contract, pinned at the reader level: EVERY
    table's read() — flat scans (r9) and the _parsed nested envelope
    (r11, the repo's last per-row-pickled production) — yields
    pyarrow.RecordBatch objects, and the envelope's Arrow encoding is
    value-identical to the raw tuple production it replaced."""
    import pyarrow as pa

    from mahjong_etl_spark.schemas import TABLE_SCHEMAS
    from mahjong_etl_spark.sources.tenhou_datasource import (
        PARSED_TABLE,
        TenhouReader,
        _fs_and_path,
        _read_files,
    )

    r = TenhouReader({"path": FIXTURE_LOGS}, "games")
    (part, *_) = r.partitions()
    out = list(r.read(part))
    assert out and all(isinstance(b, pa.RecordBatch) for b in out)
    assert out[0].schema.names[0] == "dt"
    assert sum(b.num_rows for b in out) > 0

    rp = TenhouReader({"path": FIXTURE_LOGS}, PARSED_TABLE)
    (part_p, *_) = rp.partitions()
    out_p = list(rp.read(part_p))
    assert out_p and all(isinstance(b, pa.RecordBatch) for b in out_p)
    assert out_p[0].schema.names[:2] == ["dt", "game_id"]

    # full value parity with the tuple production (same files, same
    # minting offset): every nested struct field of every table
    fs, _ = _fs_and_path(rp.path)
    raw = list(
        _read_files(
            rp, part_p.dt_raw, sorted(part_p.files), prior_offset=0, fs=fs
        )
    )
    got = []
    for b in out_p:
        d = b.to_pydict()
        for i in range(b.num_rows):
            env = [
                [
                    tuple(rd[f.name] for f in TABLE_SCHEMAS[t].fields)
                    for rd in d[t][i]
                ]
                for t in TABLE_SCHEMAS
            ]
            got.append((d["dt"][i], d["game_id"][i], env))
    want = [(r0[0], r0[1], [list(tbl) for tbl in r0[2:]]) for r0 in raw]
    assert got == want and got


def test_stream_read_yields_arrow_batches_for_flat_tables():
    """The r10 extension of the fast-path contract to the STREAM
    reader (a backlog drain is a batch-sized read in streaming
    clothes): flat-table stream partitions produce RecordBatches
    row-identical to the tuple production, and since r11 the _parsed
    envelope streams as Arrow too."""
    import pyarrow as pa

    from mahjong_etl_spark.sources.tenhou_datasource import (
        PARSED_TABLE,
        TenhouReader,
        TenhouStreamReader,
    )

    sr = TenhouStreamReader(TenhouReader({"path": FIXTURE_LOGS}, "actions"))
    parts = sr.partitions(sr.initialOffset(), sr.latestOffset())
    assert parts
    batches = list(sr.read(parts[0]))
    assert batches and all(isinstance(b, pa.RecordBatch) for b in batches)
    assert batches[0].schema.names[0] == "dt"
    # row-parity with the batch reader's production over the same
    # files (the batch read() path shares _arrow_batches, so this
    # pins the stream slice plumbing, not just the encoding)
    br = TenhouReader({"path": FIXTURE_LOGS}, "actions")
    bpart = next(
        p for p in br.partitions() if p.dt_raw == parts[0].dt_raw
    )
    want = [
        tuple(r)
        for b in br.read(bpart)
        for r in zip(*[c.to_pylist() for c in b.columns])
    ]
    got = [
        tuple(r)
        for b in batches
        for r in zip(*[c.to_pylist() for c in b.columns])
    ]
    assert got == want

    # the _parsed envelope stream rides the same Arrow production
    # (r11); batch-reader parity of the encoding itself is pinned by
    # test_batch_read_yields_arrow_batches_every_table
    srp = TenhouStreamReader(
        TenhouReader({"path": FIXTURE_LOGS}, PARSED_TABLE)
    )
    pparts = srp.partitions(srp.initialOffset(), srp.latestOffset())
    pbatches = list(srp.read(pparts[0]))
    assert pbatches and all(isinstance(b, pa.RecordBatch) for b in pbatches)
    assert pbatches[0].schema.names[:2] == ["dt", "game_id"]
