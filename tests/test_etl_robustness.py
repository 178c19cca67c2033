"""ETL robustness: corrupt-input quarantine and volume behavior."""

from __future__ import annotations

import glob
import shutil
import time

from pyspark.sql import functions as F

from mahjong_etl_spark.plans.etl import run_etl

FIXTURES = "tests/fixtures/logs"


def test_corrupt_xml_quarantined_not_fatal(spark, tmp_path):
    logs = tmp_path / "logs"
    shutil.copytree(FIXTURES, logs)
    (logs / "20240102" / "broken.xml").write_bytes(b"<mjloggm><UNCLOSED")
    # NB zero-byte files produce no binaryFile record at all (source
    # skips them); junk bytes exercise the quarantine path instead
    (logs / "20240103" / "junk.xml").write_bytes(b"\x00\x01not-xml")

    out = tmp_path / "out"
    counts = run_etl(spark, str(logs), str(out))

    # the 4 good games still produce their full output
    assert counts["games"] == 4 and counts["kyokus"] == 5
    assert counts["_corrupt"] == 2
    bad = spark.read.parquet(f"{out}/_corrupt")
    rows = {r.game_id: r for r in bad.collect()}
    assert set(rows) == {"broken", "junk"}
    assert "ParseError" in rows["broken"].error and rows["junk"].error
    assert glob.glob(f"{out}/_corrupt/dt=2024-01-02/*.parquet")


def test_etl_at_volume_unique_keys(spark, tmp_path):
    """Replicate one fixture game 300x across 3 dates: minted kyoku
    ids must stay unique and per-date-dense, and the pipeline is one
    parse pass (throughput printed as the BASELINE.md proxy)."""
    src = open(f"{FIXTURES}/20240102/g1minimal.xml", "rb").read()
    logs = tmp_path / "logs"
    n_per_date, dates = 100, ["20240110", "20240111", "20240112"]
    for d in dates:
        (logs / d).mkdir(parents=True)
        for i in range(n_per_date):
            (logs / d / f"g{i:04d}.xml").write_bytes(src)

    out = tmp_path / "out"
    t0 = time.perf_counter()
    counts = run_etl(spark, str(logs), str(out))
    wall = time.perf_counter() - t0
    n_games = n_per_date * len(dates)
    print(f"\nETL volume proxy: {n_games} games in {wall:.1f}s "
          f"({n_games / wall:.0f} games/sec)")

    assert counts["games"] == n_games
    # g1minimal has 1 kyoku -> one kyoku row per game, all ids unique
    k = spark.read.parquet(f"{out}/kyokus")
    assert k.count() == n_games
    assert k.select("id").distinct().count() == n_games
    # ids are dense per date: days*100000 + 0..n-1
    per_date = (
        k.withColumn("ordinal", F.col("id") % 100000)
        .groupBy("dt")
        .agg(F.min("ordinal").alias("lo"), F.max("ordinal").alias("hi"))
        .collect()
    )
    for r in per_date:
        assert (r.lo, r.hi) == (0, n_per_date - 1)
    # haipais joinable to kyokus across the whole output
    h = spark.read.parquet(f"{out}/haipais")
    joined = h.join(k, h.kyoku_id == k.id).count()
    assert joined == h.count()


def test_fixed_log_rerun_retires_stale_corrupt_partition(spark, tmp_path):
    """Dynamic partition overwrite only replaces partitions it writes:
    once a bad log is FIXED, the incremental re-run emits no corrupt
    rows for that date, so run_etl must explicitly drop the stale
    _corrupt/dt= partition instead of leaving it to flag the now-good
    game forever (r7 review finding)."""
    logs = tmp_path / "logs"
    shutil.copytree(FIXTURES, logs)
    good = (logs / "20240102").glob("*.xml")
    payload = next(iter(good)).read_bytes()
    (logs / "20240102" / "flaky.xml").write_bytes(b"<mjloggm><UNCLOSED")

    out = tmp_path / "out"
    counts = run_etl(spark, str(logs), str(out))
    assert counts["_corrupt"] == 1
    assert glob.glob(f"{out}/_corrupt/dt=2024-01-02/*.parquet")

    # operator repairs the log and re-runs just that date
    (logs / "20240102" / "flaky.xml").write_bytes(payload)
    counts2 = run_etl(spark, str(logs), str(out), date_prefix="20240102")
    assert counts2["_corrupt"] == 0
    assert not glob.glob(f"{out}/_corrupt/dt=2024-01-02/*.parquet")
    # the repaired game's rows landed in the good tables
    games = spark.read.parquet(f"{out}/games")
    assert games.where(F.col("id") == "flaky").count() == 1


def test_invalid_date_directory_quarantined_not_fatal(spark, tmp_path):
    """An 8-digit but INVALID date dir (month 13) passes the listing
    filter; its files must be quarantined under the raw dir name, not
    crash the mapInPandas task (r7 review — for the ingest stream the
    old behavior was a deterministic crash-loop)."""
    logs = tmp_path / "logs"
    shutil.copytree(FIXTURES, logs)
    bad_dir = logs / "20241301"
    bad_dir.mkdir()
    shutil.copy(logs / "20240102" / "g1minimal.xml", bad_dir / "odd.xml")

    out = tmp_path / "out"
    counts = run_etl(spark, str(logs), str(out))
    assert counts["games"] == 4  # good dates unaffected
    assert counts["_corrupt"] == 1
    bad = spark.read.parquet(f"{out}/_corrupt").collect()
    assert len(bad) == 1 and bad[0].game_id == "odd"
    assert "ValueError" in bad[0].error
    # raw dir name as the partition (hive inference reads it as int)
    assert str(bad[0].dt) == "20241301"


def test_manifest_handles_percent_encoded_paths(spark, tmp_path):
    """binaryFile's path column is a percent-encoded URI; the footer
    reader must decode it, so an output root with a space still audits
    (r7 review — removeprefix('file:') crashed on it)."""
    from mahjong_etl_spark.plans.manifest import output_manifest

    root = tmp_path / "out dir"  # space -> %20 in binaryFile paths
    df = spark.range(10).select(
        F.lit("2024-01-02").alias("dt"), F.col("id")
    )
    df.coalesce(1).write.partitionBy("dt").parquet(f"{root}/t")
    m = output_manifest(spark, str(root), ["t", "missing_table"]).collect()
    assert len(m) == 1
    assert m[0].n_rows == 10 and m[0].dt == "2024-01-02"
