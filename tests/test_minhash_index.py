"""Persisted + maintained MinHash band index
(operators/minhash_index.py + streaming/ann_index_stream.py::
run_minhash_maintenance_stream): the maintained postings must be
BIT-IDENTICAL to a batch write over the union corpus (deterministic
signatures), the persisted query path must reproduce the in-corpus
pair path pair-for-pair, and the lifecycle (epoch fence, replay
idempotence, dup-rate drift, compaction) must mirror the ANN
families'."""

from __future__ import annotations

import glob
import os
import time

import pytest
from pyspark.sql import functions as F

from mahjong_etl_spark.operators.minhash_index import (
    query_minhash_index,
    read_minhash_index,
    write_minhash_index,
)
from mahjong_etl_spark.streaming.ann_index_stream import (
    run_minhash_maintenance_stream,
)

DOC_SCHEMA = "doc_id long, text string"


def _load_docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def _stage(df, tmp_path, drop, name, mtime):
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / f"stage_{name}")
    )
    (src,) = glob.glob(str(tmp_path / f"stage_{name}" / "part-*.parquet"))
    dst = drop / f"{name}.parquet"
    os.rename(src, dst)
    os.utime(dst, (mtime, mtime))


def _drain(spark, drop, index_dir, ckpt):
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    q = run_minhash_maintenance_stream(spark, stream, index_dir, str(ckpt))
    assert q.awaitTermination(180), "maintenance stream did not drain"
    q.stop()
    time.sleep(0.2)


def _bands_set(spark, index_dir):
    return {
        (r.band, r.bh, r.doc_id)
        for r in read_minhash_index(spark, index_dir).collect()
    }


def _matches(spark, docs, index_dir):
    return {
        (r.doc_id, r.match_id, r.jaccard)
        for r in query_minhash_index(
            spark, docs, docs, read_minhash_index(spark, index_dir)
        ).collect()
    }


def test_persisted_query_matches_pair_path(spark, sf_dir, tmp_path):
    """Querying the corpus against its own persisted index reproduces
    minhash_lsh_pairs pair-for-pair (shared banding + verify)."""
    from mahjong_etl_spark.operators.dedup import minhash_lsh_pairs

    docs = _load_docs(spark, sf_dir)
    index_dir = str(tmp_path / "mh")
    write_minhash_index(spark, docs, index_dir)
    got = {
        (min(a, b), max(a, b), j)
        for a, b, j in (
            (r.doc_id, r.match_id, r.jaccard)
            for r in query_minhash_index(
                spark, docs, docs, read_minhash_index(spark, index_dir)
            ).collect()
        )
    }
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs(docs).collect()
    }
    assert got == want and got


def test_maintained_bands_match_batch_rebuild(spark, sf_dir, tmp_path):
    """Build on 60% of the corpus, stream the rest in as three files:
    the maintained postings equal a from-scratch write over the FULL
    corpus (signatures are deterministic), and queries served from
    the maintained index return rows identical to the rebuild's."""
    docs = _load_docs(spark, sf_dir)
    cut = int(docs.count() * 0.6)
    index_dir = str(tmp_path / "mh")
    write_minhash_index(
        spark, docs.where(F.col("doc_id") < cut), index_dir
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    parts = docs.where(F.col("doc_id") >= cut).randomSplit(
        [1.0] * 3, seed=7
    )
    for i, p in enumerate(parts):
        _stage(p, tmp_path, drop, f"arrival{i}", 1_000 + i)
    _drain(spark, drop, index_dir, tmp_path / "ckpt")

    rebuilt = str(tmp_path / "rebuilt")
    write_minhash_index(spark, docs, rebuilt)
    assert _bands_set(spark, index_dir) == _bands_set(spark, rebuilt)
    # every doc is indexed in every band exactly once
    from mahjong_etl_spark.operators.dedup import BANDS

    bands = read_minhash_index(spark, index_dir)
    assert bands.count() == docs.count() * BANDS

    got = _matches(spark, docs, index_dir)
    want = _matches(spark, docs, rebuilt)
    assert got == want and got


def test_replay_does_not_duplicate_bands(spark, sf_dir, tmp_path):
    """Crash-window replay (marker + checkpoint commit wiped): the
    re-drain lands the SAME final postings set."""
    docs = _load_docs(spark, sf_dir)
    cut = int(docs.count() * 0.8)
    index_dir = str(tmp_path / "mh")
    write_minhash_index(
        spark, docs.where(F.col("doc_id") < cut), index_dir
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    _stage(
        docs.where(F.col("doc_id") >= cut), tmp_path, drop, "arrival", 1_000
    )
    ckpt = tmp_path / "ckpt"
    _drain(spark, drop, index_dir, ckpt)
    want = _bands_set(spark, index_dir)

    (marker,) = glob.glob(f"{index_dir}/_batch_commits/*-0")
    os.remove(marker)
    os.remove(os.path.join(str(ckpt), "commits", "0"))
    crc = os.path.join(str(ckpt), "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    _drain(spark, drop, index_dir, ckpt)
    assert _bands_set(spark, index_dir) == want


def test_rebuild_fences_stale_checkpoint(spark, sf_dir, tmp_path):
    """An in-place write_minhash_index rebuild (fresh epoch) refuses
    the old maintenance checkpoint."""
    docs = _load_docs(spark, sf_dir)
    cut = int(docs.count() * 0.8)
    index_dir = str(tmp_path / "mh")
    write_minhash_index(
        spark, docs.where(F.col("doc_id") < cut), index_dir
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    _stage(
        docs.where(F.col("doc_id") >= cut), tmp_path, drop, "arrival", 1_000
    )
    ckpt = tmp_path / "ckpt"
    _drain(spark, drop, index_dir, ckpt)

    write_minhash_index(spark, docs, index_dir)
    assert not os.path.exists(f"{index_dir}/_batch_commits")
    with pytest.raises(RuntimeError, match="REBUILT"):
        _drain(spark, drop, index_dir, ckpt)


def test_drift_flags_boilerplate_surge(spark, sf_dir, tmp_path):
    """The dup-rate drift signal: an in-distribution batch (the
    corpus under fresh ids — dup-free) records without flagging; a
    copy-heavy batch (every text triplicated) crosses the absolute +
    ratio bars and flips the flag, surfaced through the SAME
    read_drift / rebuild_recommended face as the ANN families."""
    from mahjong_etl_spark.streaming.ann_index_stream import (
        DRIFT_MIN_BATCH,
        MINHASH_DRIFT_MIN_DUP_RATE,
        read_drift,
        rebuild_recommended,
    )

    docs = _load_docs(spark, sf_dir)
    n = docs.count()
    assert n >= DRIFT_MIN_BATCH
    index_dir = str(tmp_path / "mh")
    write_minhash_index(spark, docs, index_dir)

    drop = tmp_path / "drop"
    drop.mkdir()
    same = docs.select((F.col("doc_id") + n).alias("doc_id"), "text")
    surge = docs.selectExpr(
        f"explode(sequence(1, 3)) AS copy", f"doc_id", "text"
    ).select(
        (F.col("doc_id") + 2 * n + F.col("copy") * 10 * n).alias("doc_id"),
        "text",
    )
    _stage(same, tmp_path, drop, "same", 1_000)
    _stage(surge, tmp_path, drop, "surge", 2_000)
    _drain(spark, drop, index_dir, tmp_path / "ckpt")

    rows = sorted(
        read_drift(spark, index_dir).collect(), key=lambda r: r.batch_id
    )
    assert len(rows) == 2
    assert not rows[0].rebuild_recommended
    assert rows[0].mean_residual == 0.0  # dup-free batch
    assert rows[1].rebuild_recommended
    assert rows[1].mean_residual > MINHASH_DRIFT_MIN_DUP_RATE
    assert rebuild_recommended(spark, index_dir)["rebuild_recommended"]


def test_minhash_index_lifecycle_end_to_end(spark, sf_dir, tmp_path):
    """The composed walk, mirroring the ANN families': build →
    maintain (dup-free + surge batches) → the flag flips → in-place
    rebuild under a fresh epoch → old checkpoint fenced →
    fresh-checkpoint maintenance resumes → compact the band layout →
    query parity with a from-scratch index over the full corpus."""
    from mahjong_etl_spark.plans.compaction import compact_table
    from mahjong_etl_spark.streaming.ann_index_stream import (
        compact_recommended,
        rebuild_recommended,
    )

    docs = _load_docs(spark, sf_dir)
    n = docs.count()

    # 1. build
    index_dir = str(tmp_path / "mh")
    write_minhash_index(spark, docs, index_dir)

    # 2. maintain: dup-free then surge
    drop = tmp_path / "drop"
    drop.mkdir()
    same = docs.select((F.col("doc_id") + n).alias("doc_id"), "text")
    surge = docs.selectExpr(
        "explode(sequence(1, 3)) AS copy", "doc_id", "text"
    ).select(
        (F.col("doc_id") + 2 * n + F.col("copy") * 10 * n).alias("doc_id"),
        "text",
    )
    _stage(same, tmp_path, drop, "same", 1_000)
    _stage(surge, tmp_path, drop, "surge", 2_000)
    ckpt = tmp_path / "ckpt"
    _drain(spark, drop, index_dir, ckpt)

    union = docs.unionByName(same).unionByName(surge)
    scratch1 = str(tmp_path / "scratch1")
    write_minhash_index(spark, union, scratch1)
    assert _bands_set(spark, index_dir) == _bands_set(spark, scratch1)

    # 3. the surge flips the data-driven signal
    assert rebuild_recommended(spark, index_dir)["rebuild_recommended"]

    # 4-5. in-place rebuild fences the old checkpoint
    write_minhash_index(spark, union, index_dir)
    with pytest.raises(RuntimeError, match="REBUILT"):
        _drain(spark, drop, index_dir, ckpt)

    # 6. fresh-checkpoint maintenance resumes, then compaction
    drop2 = tmp_path / "drop2"
    drop2.mkdir()
    more = docs.select((F.col("doc_id") + 40 * n).alias("doc_id"), "text")
    parts = more.randomSplit([1.0] * 4, seed=5)
    for i, p in enumerate(parts):
        _stage(p, tmp_path, drop2, f"late{i}", 3_000 + i)
    _drain(spark, drop2, index_dir, tmp_path / "ckpt2")
    full = union.unionByName(more)

    before = compact_recommended(spark, index_dir, table="bands")["files"]
    want_rows = _bands_set(spark, index_dir)
    rewritten = compact_table(spark, index_dir, "bands", part_col="band")
    assert rewritten
    assert compact_recommended(spark, index_dir, table="bands")[
        "files"
    ] < before
    assert _bands_set(spark, index_dir) == want_rows

    # 7. query parity with from-scratch over the full corpus
    scratch2 = str(tmp_path / "scratch2")
    write_minhash_index(spark, full, scratch2)
    queries = docs.where("doc_id < 50")
    got = {
        tuple(r)
        for r in query_minhash_index(
            spark, queries, full, read_minhash_index(spark, index_dir)
        ).collect()
    }
    want = {
        tuple(r)
        for r in query_minhash_index(
            spark, queries, full, read_minhash_index(spark, scratch2)
        ).collect()
    }
    assert got == want and got


def test_cli_index_minhash_kind(spark, sf_dir, tmp_path, capsys):
    """`index --kind minhash` drives the dedup-plane index through
    the same lifecycle verbs: build (band-partitioned postings),
    maintain (streaming sign-and-append with the dup-rate drift
    summary + compact signal), compact."""
    from mahjong_etl_spark.cli import main

    docs = _load_docs(spark, sf_dir)
    cut = int(docs.count() * 0.8)
    base = str(tmp_path / "base_docs")
    docs.where(F.col("doc_id") < cut).write.parquet(base)
    index_dir = str(tmp_path / "mh")

    rc = main(["index", "--kind", "minhash", "-I", index_dir, "-V", base])
    assert rc == 0
    assert "built MINHASH index" in capsys.readouterr().out
    assert glob.glob(f"{index_dir}/bands/band=*")

    drop = tmp_path / "drop"
    drop.mkdir()
    _stage(
        docs.where(F.col("doc_id") >= cut), tmp_path, drop, "arrival", 1_000
    )
    rc = main(
        [
            "index", "--kind", "minhash", "-I", index_dir,
            "-M", str(drop),
            "-C", str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    from mahjong_etl_spark.operators.dedup import BANDS

    assert f"{docs.count() * BANDS} bands" in out
    assert "rebuild recommended: False" in out
    assert "compact recommended" in out

    rc = main(["index", "--kind", "minhash", "-I", index_dir, "--compact"])
    assert rc == 0
    assert "compacted" in capsys.readouterr().out
    assert read_minhash_index(spark, index_dir).count() == docs.count() * BANDS


def test_query_collapse_matches_direct_path(spark, tmp_path, monkeypatch):
    """The adaptive query-side collapse (copy-heavy batches probe as
    distinct-text reps, matches expand back) must emit EXACTLY the
    direct path's rows when no bucket caps bind: 6 texts x 50 copies
    (294 copies >= BUCKET_CAP) trips the collapse organically; the
    direct shape is forced by stubbing the deciding aggregate."""
    from mahjong_etl_spark.operators import dedup as D
    from mahjong_etl_spark.operators import minhash_index as M

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu",
        "one two three four five six seven eight nine ten eleven twelve",
        "one two three four five six seven eight nine ten eleven thirteen",
        "totally unrelated text about mahjong tiles and parquet files here",
        "another completely different document mentioning spark and arrow",
    ]
    docs = spark.createDataFrame(
        [(i * 1000 + c, t) for i, t in enumerate(texts) for c in range(50)],
        "doc_id long, text string",
    )
    index_dir = str(tmp_path / "mh")
    write_minhash_index(spark, docs, index_dir)
    postings = read_minhash_index(spark, index_dir)

    collapsed = {
        tuple(r)
        for r in query_minhash_index(
            spark, docs, docs, postings
        ).collect()
    }

    class R:
        n_docs = 300
        n_texts = 300  # forces the direct (no-collapse) shape

    monkeypatch.setattr(M, "_dup_stats", None, raising=False)
    monkeypatch.setattr(D, "_dup_stats", lambda df: R)
    direct = {
        tuple(r)
        for r in query_minhash_index(
            spark, docs, docs, postings
        ).collect()
    }
    assert collapsed == direct and collapsed
    # every copy finds its 49 siblings at jaccard exactly 1.0
    sib = [m for q, m, j in collapsed if q == 0 and j == 1.0]
    assert len([m for m in sib if m // 1000 == 0]) == 49


def test_neardup_admission_routes_and_self_maintains(spark, sf_dir, tmp_path):
    """The admission gate over a persisted index: exact copies of
    indexed docs are flagged (all 16 bands hit), fresh texts admit
    and their bands JOIN THE INDEX, within-batch copies collapse to
    their rep, and — the self-maintenance proof — a copy of a doc
    admitted in batch 1 is flagged in batch 2 with no rebuild."""
    from mahjong_etl_spark.operators.dedup import BANDS
    from mahjong_etl_spark.streaming.ann_index_stream import (
        run_neardup_admission_stream,
    )

    docs = _load_docs(spark, sf_dir)
    index_dir = str(tmp_path / "mh")
    write_minhash_index(spark, docs, index_dir)
    base_bands = _bands_set(spark, index_dir)

    fresh_a = "a genuinely new document about spark admission gates"
    fresh_b = "another brand new text that matches nothing indexed yet"
    (copy_row,) = docs.where("doc_id = 7").collect()

    # batch 1: fresh rep + its in-batch copy, an exact corpus copy,
    # a second fresh text
    b1 = spark.createDataFrame(
        [
            (10_001, fresh_a),
            (10_002, fresh_a),          # in-batch copy -> rep 10_001
            (10_003, copy_row.text),    # exact copy of indexed doc 7
            (10_004, fresh_b),
        ],
        DOC_SCHEMA,
    )
    # batch 2: a copy of batch-1-admitted fresh_a (self-maintenance)
    b2 = spark.createDataFrame([(20_001, fresh_a)], DOC_SCHEMA)

    drop = tmp_path / "drop"
    drop.mkdir()
    _stage(b1, tmp_path, drop, "b1", 1_000)
    _stage(b2, tmp_path, drop, "b2", 2_000)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    q = run_neardup_admission_stream(
        spark, stream, index_dir, str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(180)
    q.stop()
    time.sleep(0.2)

    adm = {
        r.doc_id: r
        for r in spark.read.parquet(f"{index_dir}/admissions").collect()
    }
    assert set(adm) == {10_001, 10_002, 10_003, 10_004, 20_001}
    assert adm[10_001].admitted and adm[10_001].n_band_hits == 0
    assert adm[10_004].admitted
    # in-batch copy: collapsed to its rep at jaccard exactly 1.0
    assert not adm[10_002].admitted
    assert adm[10_002].matched_id == 10_001
    assert adm[10_002].jaccard == 1.0
    # exact copy of an indexed doc: every band collides
    assert not adm[10_003].admitted
    assert adm[10_003].n_band_hits == BANDS
    assert adm[10_003].matched_id == 7
    # self-maintenance: batch 2's copy of the batch-1 admit flags
    assert not adm[20_001].admitted
    assert adm[20_001].n_band_hits == BANDS
    assert adm[20_001].matched_id == 10_001

    # only the admitted reps' bands joined the index
    now = _bands_set(spark, index_dir)
    added_ids = {d for _, _, d in now - base_bands}
    assert added_ids == {10_001, 10_004}
    assert len(now - base_bands) == 2 * BANDS

    # the gate= partitioning lets the quarantine reader prune
    import glob as g

    assert g.glob(f"{index_dir}/admissions/gate=quarantine/*")
    assert g.glob(f"{index_dir}/admissions/gate=admit/*")


def test_neardup_admission_replay_lands_same_tables(spark, sf_dir, tmp_path):
    """Crash-window replay of an admission batch (both markers + the
    checkpoint commit wiped): the re-drain re-derives identical
    decisions and the same final band set — the two-marker publish
    replays each table idempotently."""
    import glob as g

    from mahjong_etl_spark.streaming.ann_index_stream import (
        run_neardup_admission_stream,
    )

    docs = _load_docs(spark, sf_dir)
    index_dir = str(tmp_path / "mh")
    write_minhash_index(spark, docs, index_dir)

    (copy_row,) = docs.where("doc_id = 3").collect()
    b1 = spark.createDataFrame(
        [
            (10_001, "one fresh admission replay probe text here"),
            (10_002, copy_row.text),
        ],
        DOC_SCHEMA,
    )
    drop = tmp_path / "drop"
    drop.mkdir()
    _stage(b1, tmp_path, drop, "b1", 1_000)
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(drop))
        )
        q = run_neardup_admission_stream(spark, stream, index_dir, ckpt)
        assert q.awaitTermination(180)
        q.stop()
        time.sleep(0.2)

    drain()
    want_bands = _bands_set(spark, index_dir)
    want_adm = {
        tuple(r)
        for r in spark.read.parquet(f"{index_dir}/admissions").collect()
    }

    for marker in g.glob(f"{index_dir}/_batch_commits/*-0-bands") + g.glob(
        f"{index_dir}/_batch_commits/*-0-adm"
    ):
        os.remove(marker)
    os.remove(os.path.join(ckpt, "commits", "0"))
    crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    drain()

    assert _bands_set(spark, index_dir) == want_bands
    got_adm = {
        tuple(r)
        for r in spark.read.parquet(f"{index_dir}/admissions").collect()
    }
    assert got_adm == want_adm


def test_neardup_admission_verify_mode_is_exact(spark, sf_dir, tmp_path):
    """With verify_docs, band hits only NOMINATE: a planted near-dup
    of an indexed text flags with its exact Jaccard in the decision
    row; an unrelated text that would never clear the verify admits."""
    from mahjong_etl_spark.streaming.ann_index_stream import (
        run_neardup_admission_stream,
    )

    docs = _load_docs(spark, sf_dir)
    index_dir = str(tmp_path / "mh")
    write_minhash_index(spark, docs, index_dir)

    (row,) = docs.where("doc_id = 11").collect()
    toks = row.text.split(" ")
    toks[-1] = "zzzneardupzzz"  # one-token edit: high-Jaccard near-dup
    near = " ".join(toks)

    b1 = spark.createDataFrame(
        [
            (10_001, near),
            (10_002, "wholly unrelated admission text with no match"),
        ],
        DOC_SCHEMA,
    )
    drop = tmp_path / "drop"
    drop.mkdir()
    _stage(b1, tmp_path, drop, "b1", 1_000)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    q = run_neardup_admission_stream(
        spark,
        stream,
        index_dir,
        str(tmp_path / "ckpt"),
        verify_docs=docs,
        threshold=0.5,
    )
    assert q.awaitTermination(180)
    q.stop()
    time.sleep(0.2)

    adm = {
        r.doc_id: r
        for r in spark.read.parquet(f"{index_dir}/admissions").collect()
    }
    assert not adm[10_001].admitted
    assert adm[10_001].matched_id == 11
    assert adm[10_001].jaccard is not None and adm[10_001].jaccard >= 0.5
    assert adm[10_002].admitted and adm[10_002].jaccard is None


def test_query_collapse_novel_copy_group_matches_nothing(
    spark, tmp_path, monkeypatch
):
    """r13 review finding: a batch of >= BUCKET_CAP copies of a
    brand-NEW text probed against an index that does NOT contain it
    must return zero matches for that group — the collapse path's
    (member, rep) self-links are gated on the rep being INDEXED, so
    fellow arrivals are never fabricated as matches.  Copies of an
    indexed text in the same batch still match normally, and the
    collapsed output equals the forced direct shape row-for-row."""
    from mahjong_etl_spark.operators import dedup as D
    from mahjong_etl_spark.operators import minhash_index as M

    indexed_text = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    )
    novel_text = (
        "completely novel arrival text never seen by this band index"
    )
    corpus = spark.createDataFrame(
        [(0, indexed_text)], "doc_id long, text string"
    )
    index_dir = str(tmp_path / "mh")
    write_minhash_index(spark, corpus, index_dir)
    postings = read_minhash_index(spark, index_dir)

    queries = spark.createDataFrame(
        [(1000 + i, novel_text) for i in range(300)]
        + [(5000 + i, indexed_text) for i in range(10)],
        "doc_id long, text string",
    )
    # 299 + 9 copies >= BUCKET_CAP -> the collapse path organically
    collapsed = {
        tuple(r)
        for r in query_minhash_index(
            spark, queries, corpus, postings
        ).collect()
    }
    # no novel-group row anywhere: the rep is not indexed
    assert not any(q >= 1000 and q < 5000 for q, _, _ in collapsed)
    assert not any(m >= 1000 and m < 5000 for _, m, _ in collapsed)
    # every indexed-text copy matches doc 0 at exactly 1.0
    assert {(q, m, j) for q, m, j in collapsed} == {
        (5000 + i, 0, 1.0) for i in range(10)
    }

    class R:
        n_docs = 310
        n_texts = 310  # force the direct shape

    monkeypatch.setattr(D, "_dup_stats", lambda df: R)
    direct = {
        tuple(r)
        for r in query_minhash_index(
            spark, queries, corpus, postings
        ).collect()
    }
    assert collapsed == direct


def test_nondefault_geometry_recorded_and_honored(spark, tmp_path):
    """r13 review finding: an index built with non-default banding
    geometry must be probed and MAINTAINED with that geometry — the
    build records it, the maintenance stream reads it, and a query
    passing it finds the planted match (hardcoded defaults would
    silently match nothing: different band slice hashes)."""
    from mahjong_etl_spark.operators.minhash_index import (
        read_minhash_geometry,
    )

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
    ]
    corpus = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    index_dir = str(tmp_path / "mh")
    write_minhash_index(
        spark, corpus, index_dir, bands=8, rows_per_band=2
    )
    geo = read_minhash_geometry(spark, index_dir)
    assert geo == {"n": 3, "bands": 8, "rows_per_band": 2}
    # postings carry 8 bands per doc, not the default 16
    assert read_minhash_index(spark, index_dir).count() == 2 * 8

    # the maintenance stream bands arrivals with the INDEX's geometry
    arrival = spark.createDataFrame(
        [(100, "a third document with its own words entirely here")],
        DOC_SCHEMA,
    )
    drop = tmp_path / "drop"
    drop.mkdir()
    _stage(arrival, tmp_path, drop, "a0", 1_000)
    _drain(spark, drop, index_dir, tmp_path / "ckpt")
    assert read_minhash_index(spark, index_dir).count() == 3 * 8

    # a query passing the recorded geometry finds an exact copy
    probe = spark.createDataFrame(
        [(500, texts[0])], "doc_id long, text string"
    )
    got = query_minhash_index(
        spark,
        probe,
        corpus.unionByName(arrival),
        read_minhash_index(spark, index_dir),
        n=geo["n"],
        bands=geo["bands"],
        rows_per_band=geo["rows_per_band"],
    ).collect()
    assert [(r.doc_id, r.match_id, r.jaccard) for r in got] == [
        (500, 0, 1.0)
    ]
