"""CLI parity tests — in-process (reusing the session fixture's JVM;
get_spark is a getOrCreate so the CLI binds to the same session)."""

from __future__ import annotations

import shutil

import pytest

from mahjong_etl_spark.cli import main

FIXTURE_LOGS = "tests/fixtures/logs"


@pytest.fixture(scope="module")
def cli_out(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("cli_parquet")
    rc = main(["etl", "-L", FIXTURE_LOGS, "-O", str(out)])
    assert rc == 0
    yield str(out)
    shutil.rmtree(str(out), ignore_errors=True)


def test_cli_etl_writes_all_tables(cli_out, capsys):
    import glob

    for table in ["games", "rules", "kyokus", "haipais", "actions"]:
        assert glob.glob(f"{cli_out}/{table}/dt=*/*.parquet"), table


def test_cli_walls(spark, tmp_path, capsys):
    rc = main(["walls", "-n", "7", "-O", str(tmp_path), "-d", "20240105", "--seed", "1"])
    assert rc == 0
    df = spark.read.parquet(f"{tmp_path}/paiyamas")
    assert df.count() == 7
    # every wall is a permutation of 0..135
    from pyspark.sql import functions as F

    bad = df.where(
        F.expr("array_sort(pai_ids) <> transform(sequence(0,135), x -> cast(x AS long))")
    ).count()
    assert bad == 0


def test_cli_sql(cli_out, capsys):
    rc = main(
        [
            "sql",
            "-D",
            cli_out,
            "-q",
            "SELECT count(*) AS n FROM kyokus JOIN games ON kyokus.game_id = games.id",
        ]
    )
    assert rc == 0
    assert "5" in capsys.readouterr().out  # 5 kyokus across the fixtures


def test_cli_sql_empty_dir(tmp_path, capsys):
    rc = main(["sql", "-D", str(tmp_path), "-q", "SELECT 1"])
    assert rc == 1


def test_cli_query_list_and_run(capsys):
    from mahjong_etl_spark.cli import main

    assert main(["query", "--list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "[oracle]" in out

    assert (
        main(
            [
                "query",
                "q1_pricing_summary",
                "-D",
                "/root/testdata/sf0.001",
                "--limit",
                "3",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "l_returnflag" in out

    assert main(["query", "no_such_query"]) == 1


def test_cli_compact_and_repair(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from mahjong_etl_spark.cli import main

    root = str(tmp_path)
    spark.range(500).select(
        F.lit("2024-01-02").alias("dt"), "id"
    ).repartition(8).write.partitionBy("dt").parquet(f"{root}/t")

    assert main(["compact", "-D", root]) == 2  # table required
    capsys.readouterr()
    assert main(
        ["compact", "-D", root, "-t", "t", "--target-file-bytes", str(10**9)]
    ) == 0
    out = capsys.readouterr().out
    assert "t/dt=2024-01-02: 1 file(s)" in out
    assert spark.read.parquet(f"{root}/t").count() == 500

    assert main(["compact", "-D", root, "--repair-only"]) == 0
    assert "nothing to repair" in capsys.readouterr().out


def test_cli_progress_summary(spark, tmp_path, capsys):
    import json

    from mahjong_etl_spark.cli import main

    ledger = tmp_path / "progress.jsonl"
    with open(ledger, "w") as f:
        for i in range(4):
            f.write(json.dumps({
                "query_id": "q", "run_id": "r", "name": "probe",
                "batch_id": i, "ts": f"t{i}", "num_input_rows": 10,
                "input_rows_per_sec": 1.0, "processed_rows_per_sec": 2.0,
                "trigger_ms": 5 + i, "state_rows": i, "state_mem_bytes": 1,
            }) + "\n")

    assert main(["progress", str(ledger)]) == 0
    assert "probe" in capsys.readouterr().out
    assert main(["progress", str(ledger), "--summary"]) == 0
    out = capsys.readouterr().out
    assert "p95_trigger_ms" in out and "40" in out  # rows_in = 4 x 10


def test_cli_index_build_and_maintain(spark, sf_dir, tmp_path, capsys):
    """`index -V` builds a persisted IVF index; `index -M` drains a
    vector drop dir into it through the maintenance stream; usage
    errors (both modes / missing checkpoint) exit 2 without a run."""
    import glob
    import os

    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cut = int(e.count() * 0.8)
    base_pq = str(tmp_path / "base_vectors")
    e.where(F.col("vec_id") < cut).write.parquet(base_pq)
    index_dir = str(tmp_path / "index")

    rc = main(["index", "-I", index_dir, "-V", base_pq])
    assert rc == 0
    assert "built IVF index" in capsys.readouterr().out

    drop = tmp_path / "drop"
    drop.mkdir()
    e.where(F.col("vec_id") >= cut).coalesce(1).write.parquet(
        str(tmp_path / "stage")
    )
    (src,) = glob.glob(str(tmp_path / "stage" / "part-*.parquet"))
    os.rename(src, drop / "arrival.parquet")
    rc = main(
        [
            "index", "-I", index_dir,
            "-M", str(drop),
            "-C", str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert f"{e.count()} postings" in out
    # the drift plane's CLI face: every drain reports the ledger
    # verdict (in-distribution arrivals -> no rebuild recommended)
    assert "rebuild recommended: False" in out
    indexed = spark.read.parquet(f"{index_dir}/postings")
    assert indexed.select("vec_id").distinct().count() == e.count()

    # --compact folds the maintenance batch's files into the build's
    # (snapshot swap; rows unchanged)
    rc = main(["index", "-I", index_dir, "--compact"])
    assert rc == 0
    assert "compacted" in capsys.readouterr().out
    assert (
        spark.read.parquet(f"{index_dir}/postings").count() == e.count()
    )

    assert main(["index", "-I", index_dir]) == 2
    assert main(["index", "-I", index_dir, "-M", str(drop)]) == 2
    assert main(
        ["index", "-I", index_dir, "-V", base_pq, "--compact"]
    ) == 2


def test_cli_index_pq_kind(spark, sf_dir, tmp_path, capsys):
    """`index --kind pq` drives the PQ family through the SAME
    lifecycle verbs: build (codebooks + sharded codes), maintain
    (streaming encode-and-append with the drift summary), compact
    (shard-partition snapshot swap)."""
    import glob
    import os

    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cut = int(e.count() * 0.8)
    base_pq = str(tmp_path / "base_vectors")
    e.where(F.col("vec_id") < cut).write.parquet(base_pq)
    index_dir = str(tmp_path / "pqindex")

    rc = main(["index", "--kind", "pq", "-I", index_dir, "-V", base_pq])
    assert rc == 0
    assert "built PQ index" in capsys.readouterr().out

    drop = tmp_path / "drop"
    drop.mkdir()
    e.where(F.col("vec_id") >= cut).coalesce(1).write.parquet(
        str(tmp_path / "stage")
    )
    (src,) = glob.glob(str(tmp_path / "stage" / "part-*.parquet"))
    os.rename(src, drop / "arrival.parquet")
    rc = main(
        [
            "index", "--kind", "pq", "-I", index_dir,
            "-M", str(drop),
            "-C", str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert f"{e.count()} codes" in out
    assert "rebuild recommended: False" in out
    assert "compact recommended" in out
    codes = spark.read.parquet(f"{index_dir}/codes")
    assert codes.select("vec_id").distinct().count() == e.count()

    rc = main(["index", "--kind", "pq", "-I", index_dir, "--compact"])
    assert rc == 0
    assert "compacted" in capsys.readouterr().out
    assert spark.read.parquet(f"{index_dir}/codes").count() == e.count()


def test_cli_index_ivfpq_kind(spark, sf_dir, tmp_path, capsys):
    """`index --kind ivfpq` drives the IVFADC family: build persists
    centroids + codebooks + cluster-partitioned codes; maintain
    encodes arrivals against the frozen components and reports both
    lifecycle signals."""
    import glob
    import os

    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cut = int(e.count() * 0.8)
    base_pq = str(tmp_path / "base_vectors")
    e.where(F.col("vec_id") < cut).write.parquet(base_pq)
    index_dir = str(tmp_path / "ivfpq")

    rc = main(["index", "--kind", "ivfpq", "-I", index_dir, "-V", base_pq])
    assert rc == 0
    assert "built IVFPQ index" in capsys.readouterr().out
    assert os.path.isdir(f"{index_dir}/centroids")
    assert os.path.isdir(f"{index_dir}/codebooks")
    assert glob.glob(f"{index_dir}/codes/cluster=*")

    drop = tmp_path / "drop"
    drop.mkdir()
    e.where(F.col("vec_id") >= cut).coalesce(1).write.parquet(
        str(tmp_path / "stage")
    )
    (src,) = glob.glob(str(tmp_path / "stage" / "part-*.parquet"))
    os.rename(src, drop / "arrival.parquet")
    rc = main(
        [
            "index", "--kind", "ivfpq", "-I", index_dir,
            "-M", str(drop),
            "-C", str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert f"{e.count()} codes" in out
    assert "rebuild recommended: False" in out
    assert "compact recommended" in out
    codes = spark.read.parquet(f"{index_dir}/codes")
    assert codes.select("vec_id").distinct().count() == e.count()
