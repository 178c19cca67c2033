"""Streaming semantic admission gate
(streaming/ann_index_stream.py::run_semantic_admission_stream) over a
persisted IVFADC index — the embedding-plane twin of the minhash
near-dup gate: ADC nomination, exact-cosine verification against the
persisted vector relation (self-maintained), within-batch mode,
exactly-once replay, trailing-self-baseline drift."""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import functions as F

from mahjong_etl_spark.operators.similarity import (
    read_ivfpq_vectors,
    write_ivfpq_index,
)
from mahjong_etl_spark.streaming.ann_index_stream import (
    run_semantic_admission_stream,
)

VEC_SCHEMA = "vec_id long, embedding array<double>"


def _vecs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x AS double))").alias(
            "embedding"
        ),
    )



def _prebuilt_ivfpq(index_cache, spark, sf_dir, dst, bare=False):
    """Pristine full-corpus with_vectors IVFADC index, trained ONCE
    per session (conftest.index_cache) and copied per test; ``bare``
    strips the vectors relation from the copy — equivalent to a
    with_vectors=False build (the gate detects vectors by directory
    existence only)."""
    return index_cache.fresh(
        "semadm_ivfpq_vec",
        lambda d: write_ivfpq_index(
            spark, _vecs(spark, sf_dir), d, with_vectors=True
        ),
        dst,
        strip=("vectors",) if bare else (),
    )

def _stage(df, tmp_path, drop, name, mtime):
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / f"stage_{name}")
    )
    (src,) = glob.glob(str(tmp_path / f"stage_{name}" / "part-*.parquet"))
    dst = drop / f"{name}.parquet"
    os.rename(src, dst)
    os.utime(dst, (mtime, mtime))


def _drain(spark, drop, index_dir, ckpt, **kw):
    stream = (
        spark.readStream.schema(VEC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    q = run_semantic_admission_stream(
        spark, stream, index_dir, str(ckpt), **kw
    )
    assert q.awaitTermination(240), "semantic admission did not drain"
    q.stop()
    time.sleep(0.2)


def _adm(spark, index_dir):
    return {
        r.vec_id: r
        for r in spark.read.parquet(f"{index_dir}/admissions").collect()
    }


def _ids(spark, index_dir, table):
    return {
        r.vec_id
        for r in spark.read.parquet(f"{index_dir}/{table}")
        .select("vec_id")
        .collect()
    }


def _emb(row):
    return [float(x) for x in row.embedding]


def test_semantic_gate_routes_and_self_maintains(spark, sf_dir, tmp_path, index_cache):
    """Exact copy of an indexed vector quarantines with cosine 1.0,
    a fresh (negated) vector admits and its codes AND raw vector join
    the index, and a batch-2 copy of the batch-1 admit is flagged via
    the SELF-maintained verify relation — no rebuild."""
    vecs = _vecs(spark, sf_dir)
    index_dir = str(tmp_path / "ivfpq")
    _prebuilt_ivfpq(index_cache, spark, sf_dir, index_dir)
    base_codes = _ids(spark, index_dir, "codes")

    (v7,) = vecs.where("vec_id = 7").collect()
    fresh = [-x for x in _emb(v7)]
    b1 = spark.createDataFrame(
        [
            (10_001, _emb(v7)),   # exact copy of indexed vec 7
            (10_002, fresh),      # novel direction
        ],
        VEC_SCHEMA,
    )
    b2 = spark.createDataFrame([(20_001, fresh)], VEC_SCHEMA)
    drop = tmp_path / "drop"
    drop.mkdir()
    _stage(b1, tmp_path, drop, "b1", 1_000)
    _stage(b2, tmp_path, drop, "b2", 2_000)
    _drain(spark, drop, index_dir, tmp_path / "ckpt")

    adm = _adm(spark, index_dir)
    assert set(adm) == {10_001, 10_002, 20_001}
    assert not adm[10_001].admitted
    assert adm[10_001].matched_id == 7
    assert adm[10_001].cosine == 1.0  # verified, not just ADC
    assert adm[10_002].admitted and adm[10_002].matched_id is None
    # self-maintenance through the persisted verify relation
    assert not adm[20_001].admitted
    assert adm[20_001].matched_id == 10_002
    assert adm[20_001].cosine == 1.0
    # only the admitted rep's rows joined the index (codes + vectors)
    assert _ids(spark, index_dir, "codes") - base_codes == {10_002}
    assert 10_002 in _ids(spark, index_dir, "vectors")
    assert 10_001 not in _ids(spark, index_dir, "vectors")
    # decisions partitioned by gate
    assert glob.glob(f"{index_dir}/admissions/gate=quarantine/*")
    assert glob.glob(f"{index_dir}/admissions/gate=admit/*")


def test_semantic_gate_requires_exact_source_or_calibrated_bar(
    spark, sf_dir, tmp_path, index_cache
):
    """ADC nomination cannot DECIDE (an exact copy's quantized score
    is far below any cosine bar — the measured 0.37-0.75 range): a
    vectors-less index with no verify_vecs refuses loudly, and a
    caller-calibrated adc_bar makes the same index flag the copy on
    the quantized score with cosine null in the decision."""
    import pytest

    vecs = _vecs(spark, sf_dir)
    index_dir = str(tmp_path / "ivfpq")
    _prebuilt_ivfpq(index_cache, spark, sf_dir, index_dir, bare=True)

    drop = tmp_path / "drop"
    drop.mkdir()
    stream = (
        spark.readStream.schema(VEC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    with pytest.raises(ValueError, match="no persisted vector relation"):
        run_semantic_admission_stream(
            spark, stream, index_dir, str(tmp_path / "ckpt0")
        )

    (v3,) = vecs.where("vec_id = 3").collect()
    b1 = spark.createDataFrame(
        [(10_001, _emb(v3)), (10_002, [-x for x in _emb(v3)])], VEC_SCHEMA
    )
    _stage(b1, tmp_path, drop, "b1", 1_000)
    # 0.3 sits between the measured self-copy ADC floor (~0.37) and
    # the non-match shortlist p95 (~0.26) on this corpus
    _drain(spark, drop, index_dir, tmp_path / "ckpt", adc_bar=0.3)

    adm = _adm(spark, index_dir)
    assert not adm[10_001].admitted
    assert adm[10_001].matched_id == 3
    assert adm[10_001].cosine is None  # unverifiable: the bar decided
    assert adm[10_001].adc is not None and adm[10_001].adc >= 0.3
    assert adm[10_002].admitted


def test_semantic_gate_within_batch(spark, sf_dir, tmp_path):
    """Two non-identical near-identical vectors in ONE batch: default
    admits both (the documented hole); within_batch=True quarantines
    the second against the first with its exact cosine."""
    vecs = _vecs(spark, sf_dir)
    (v5,) = vecs.where("vec_id = 5").collect()
    a = _emb(v5)
    b = list(a)
    b[0] += 0.01 * (abs(b[0]) + 1.0)  # tiny perturbation: cosine ~1-eps
    batch = spark.createDataFrame(
        [(10_001, a), (10_002, b)], VEC_SCHEMA
    )

    for mode, flagged in ((False, False), (True, True)):
        index_dir = str(tmp_path / f"ivfpq{int(mode)}")
        # index over OTHER vectors so neither arrival matches it
        write_ivfpq_index(
            spark,
            vecs.where("vec_id >= 100"),
            index_dir,
            with_vectors=True,
        )
        drop = tmp_path / f"drop{int(mode)}"
        drop.mkdir()
        _stage(batch, tmp_path, drop, "b1", 1_000)
        _drain(
            spark,
            drop,
            index_dir,
            tmp_path / f"ckpt{int(mode)}",
            within_batch=mode,
        )
        adm = _adm(spark, index_dir)
        assert adm[10_001].admitted
        assert adm[10_002].admitted is (not flagged)
        if flagged:
            assert adm[10_002].matched_id == 10_001
            assert adm[10_002].cosine is not None
            assert adm[10_002].cosine >= 0.92


def test_semantic_gate_replay_lands_same_tables(spark, sf_dir, tmp_path, index_cache):
    """Crash-window replay (all three markers + checkpoint commit
    wiped) re-derives identical decisions, codes and vectors."""
    vecs = _vecs(spark, sf_dir)
    index_dir = str(tmp_path / "ivfpq")
    _prebuilt_ivfpq(index_cache, spark, sf_dir, index_dir)

    (v9,) = vecs.where("vec_id = 9").collect()
    b1 = spark.createDataFrame(
        [(10_001, _emb(v9)), (10_002, [-x for x in _emb(v9)])], VEC_SCHEMA
    )
    drop = tmp_path / "drop"
    drop.mkdir()
    _stage(b1, tmp_path, drop, "b1", 1_000)
    ckpt = str(tmp_path / "ckpt")

    _drain(spark, drop, index_dir, ckpt)

    def snap():
        return (
            _ids(spark, index_dir, "codes"),
            _ids(spark, index_dir, "vectors"),
            {
                tuple(r)
                for r in spark.read.parquet(
                    f"{index_dir}/admissions"
                ).collect()
            },
        )

    want = snap()
    for pat in ("*-0-codes", "*-0-vec", "*-0-adm"):
        for marker in glob.glob(f"{index_dir}/_batch_commits/{pat}"):
            os.remove(marker)
    os.remove(os.path.join(ckpt, "commits", "0"))
    crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    _drain(spark, drop, index_dir, ckpt)
    assert snap() == want


def test_semantic_drift_trailing_self_baseline(spark, sf_dir, tmp_path, index_cache):
    """The drift row learns its own rate: steady ~50%-dup batches
    flag only during the 3-row warmup (no build-time baseline
    exists), then go quiet; a surge doubling the trailing median
    flags again."""
    from mahjong_etl_spark.streaming.ann_index_stream import read_drift

    vecs = _vecs(spark, sf_dir)
    index_dir = str(tmp_path / "ivfpq")
    _prebuilt_ivfpq(index_cache, spark, sf_dir, index_dir)

    rows = vecs.where("vec_id < 200").collect()
    dim = len(rows[0].embedding)

    def fresh_vec(i, j):
        # batch-decorrelated novel direction: an (i, j)-seeded
        # gaussian (max |cos| ~0.5 across all fresh-fresh and
        # fresh-corpus pairs at d=64, measured offline), so nothing
        # re-matches an earlier batch's admit.  Two earlier cuts of
        # this constructor failed instructively: one mask per j made
        # the self-maintaining gate correctly quarantine every
        # "fresh" repeat, and a linear per-component hash made every
        # pair of vectors constant-shifts of each other (cos ~1.0) —
        # the gate was right both times, the test was wrong
        import numpy as np

        rng = np.random.default_rng(1_000_003 * i + j)
        return [float(x) for x in rng.standard_normal(dim)]

    def batch(i, n_dup, n_fresh):
        dup = [
            (100_000 * (i + 1) + j, _emb(rows[j])) for j in range(n_dup)
        ]
        fresh = [
            (100_000 * (i + 1) + 50_000 + j, fresh_vec(i, j))
            for j in range(n_fresh)
        ]
        return spark.createDataFrame(dup + fresh, VEC_SCHEMA)

    drop = tmp_path / "drop"
    drop.mkdir()
    # four steady 25%-dup batches, then a ~94%-dup surge (the steady
    # rate must sit under half the surge rate or the 2x ratio bar
    # can never fire — rate is bounded by 1)
    for i in range(4):
        _stage(batch(i, 16, 48), tmp_path, drop, f"s{i}", 1_000 + i)
    _stage(batch(4, 60, 4), tmp_path, drop, "surge", 2_000)
    _drain(spark, drop, index_dir, tmp_path / "ckpt")

    drift = sorted(
        read_drift(spark, index_dir).collect(), key=lambda r: r.batch_id
    )
    assert len(drift) == 5
    steady = drift[:4]
    # warmup rows have no baseline and may flag on the absolute bar
    assert all(r.baseline_residual is None for r in steady[:3])
    # once 3 rows exist, the trailing median IS the rate -> ratio ~1,
    # no flag despite rate far above the absolute bar
    assert steady[3].baseline_residual is not None
    assert 0.8 <= steady[3].residual_ratio <= 1.25
    assert not steady[3].rebuild_recommended
    surge = drift[4]
    assert surge.residual_ratio is not None and surge.residual_ratio > 1.5
    assert surge.rebuild_recommended


def test_ivfpq_maintained_vectors_match_rebuild(spark, sf_dir, tmp_path):
    """The maintenance stream appends the raw-vector relation beside
    the codes: after a drain, {index}/vectors equals a from-scratch
    with_vectors build over the union corpus."""
    from mahjong_etl_spark.streaming.ann_index_stream import (
        run_ivfpq_maintenance_stream,
    )

    vecs = _vecs(spark, sf_dir)
    cut = 400
    index_dir = str(tmp_path / "ivfpq")
    write_ivfpq_index(
        spark,
        vecs.where(F.col("vec_id") < cut),
        index_dir,
        with_vectors=True,
    )
    drop = tmp_path / "drop"
    drop.mkdir()
    _stage(
        vecs.where(F.col("vec_id") >= cut), tmp_path, drop, "arr", 1_000
    )
    stream = (
        spark.readStream.schema(VEC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    q = run_ivfpq_maintenance_stream(
        spark, stream, index_dir, str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(240)
    q.stop()
    time.sleep(0.2)
    assert _ids(spark, index_dir, "vectors") == {
        r.vec_id for r in vecs.collect()
    }
    assert read_ivfpq_vectors(spark, index_dir).count() == vecs.count()
    # a bands-free default build has no relation
    bare = str(tmp_path / "bare")
    write_ivfpq_index(spark, vecs, bare)
    assert read_ivfpq_vectors(spark, bare) is None


def test_batch_twin_decisions_agree_with_brute_force(spark, sf_dir):
    """similarity_semantic_admission (the registry batch twin, ADC-
    nominated + exact-verified) against the brute-force verdict: at
    the default test sf the ADC shortlist recalls every >=bar
    neighbor, so admitted flags must be IDENTICAL; at larger sfs
    recall < 1 is the documented ANN trade (measured 21/25 at sf0.1)
    and the bar is >= 0.8 agreement.  Every quarantine row's cosine
    must be the exact cosine of (arrival, matched) regardless — the
    golden oracle pins bytes, this pins decision quality (the
    regen-ann-goldens contract: a regenerated golden cannot hide a
    recall break)."""
    import numpy as np

    from mahjong_etl_spark.operators.similarity import (
        N_ARRIVALS,
        SEM_ADMIT_T,
        similarity_semantic_admission,
    )

    got = {
        r.vec_id: r
        for r in similarity_semantic_admission(spark, sf_dir).collect()
    }
    rows = sorted(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect(),
        key=lambda r: r.vec_id,
    )
    ids = np.array([r.vec_id for r in rows])
    E = np.array([[float(x) for x in r.embedding] for r in rows])
    U = E / np.linalg.norm(E, axis=1, keepdims=True)
    A, C = U[ids < N_ARRIVALS], U[ids >= N_ARRIVALS]
    cids = ids[ids >= N_ARRIVALS]
    cos = A @ C.T
    assert set(got) == set(ids[ids < N_ARRIVALS].tolist())
    n_q = agree = 0
    for i, vid in enumerate(ids[ids < N_ARRIVALS]):
        r = got[int(vid)]
        want_admit = bool(cos[i].max() < SEM_ADMIT_T)
        agree += r.admitted == want_admit
        # a quarantine can only ever be a TRUE >=bar pair (exact
        # verify), recall losses only ever admit
        if not r.admitted:
            n_q += 1
            j = int(np.where(cids == r.matched_id)[0][0])
            assert abs(r.cosine - cos[i, j]) < 1e-5
            assert r.cosine >= SEM_ADMIT_T
    n = len(A)
    if sf_dir.rstrip("/").endswith("sf0.001"):
        assert agree == n, f"{agree}/{n}"
    else:
        assert agree >= 0.8 * n, f"{agree}/{n}"
    assert n_q > 0  # both decisions occur at every committed sf


def test_cli_ivfpq_with_vectors_build_and_compact(
    spark, sf_dir, tmp_path, capsys
):
    """`index --kind ivfpq --with-vectors` builds the verify relation,
    and `--compact` folds the per-batch vector/admission files beside
    the codes; the flag on a non-ivfpq kind refuses."""
    from mahjong_etl_spark.cli import main

    base = str(tmp_path / "base_vecs")
    _vecs(spark, sf_dir).write.parquet(base)
    index_dir = str(tmp_path / "pq")

    rc = main(
        ["index", "--kind", "minhash", "-I", index_dir, "-V", base,
         "--with-vectors"]
    )
    assert rc == 2
    assert "only to --kind ivfpq" in capsys.readouterr().err

    rc = main(
        ["index", "--kind", "ivfpq", "-I", index_dir, "-V", base,
         "--with-vectors"]
    )
    assert rc == 0
    assert "built IVFPQ index" in capsys.readouterr().out
    n_base = spark.read.parquet(f"{index_dir}/vectors").count()
    assert n_base == spark.read.parquet(base).count()

    # gate a batch through so vectors/admissions accumulate batch files
    vecs = _vecs(spark, sf_dir)
    (v4,) = vecs.where("vec_id = 4").collect()
    b1 = spark.createDataFrame(
        [(10_001, _emb(v4)), (10_002, [-x for x in _emb(v4)])], VEC_SCHEMA
    )
    drop = tmp_path / "drop"
    drop.mkdir()
    _stage(b1, tmp_path, drop, "b1", 1_000)
    _drain(spark, drop, index_dir, tmp_path / "ckpt")
    n_vec = spark.read.parquet(f"{index_dir}/vectors").count()
    n_adm = spark.read.parquet(f"{index_dir}/admissions").count()
    assert n_vec == n_base + 1 and n_adm == 2

    rc = main(["index", "--kind", "ivfpq", "-I", index_dir, "--compact"])
    assert rc == 0
    out = capsys.readouterr().out
    assert f"{n_vec} vectors" in out
    assert f"{n_adm} admissions" in out
    assert spark.read.parquet(f"{index_dir}/vectors").count() == n_vec
    assert spark.read.parquet(f"{index_dir}/admissions").count() == n_adm
    adm = _adm(spark, index_dir)
    assert adm[10_001].admitted is False and adm[10_002].admitted is True


def test_cli_gate_verb_both_kinds(spark, sf_dir, tmp_path, capsys, index_cache):
    """`gate --kind semantic|minhash` drains an arrival drop through
    the matching admission stream and prints the decision + drift
    summary; --adc-bar on minhash refuses; an unverifiable semantic
    config surfaces the gate's ValueError as exit 2."""
    from mahjong_etl_spark.cli import main
    from mahjong_etl_spark.operators.minhash_index import (
        write_minhash_index,
    )

    vecs = _vecs(spark, sf_dir)
    sidx = str(tmp_path / "pq")
    _prebuilt_ivfpq(index_cache, spark, sf_dir, sidx)
    (v6,) = vecs.where("vec_id = 6").collect()
    sdrop = tmp_path / "sdrop"
    sdrop.mkdir()
    _stage(
        spark.createDataFrame(
            [(10_001, _emb(v6)), (10_002, [-x for x in _emb(v6)])],
            VEC_SCHEMA,
        ),
        tmp_path, sdrop, "b1", 1_000,
    )
    rc = main(
        ["gate", "--kind", "minhash", "-I", sidx, "-A", str(sdrop),
         "-C", str(tmp_path / "ck0"), "--adc-bar", "0.3"]
    )
    assert rc == 2
    assert "only to --kind semantic" in capsys.readouterr().err

    rc = main(
        ["gate", "--kind", "semantic", "-I", sidx, "-A", str(sdrop),
         "-C", str(tmp_path / "ck1")]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "2 decisions on record, 1 quarantined (50.0%)" in out
    assert "rebuild recommended:" in out
    adm = _adm(spark, sidx)
    assert not adm[10_001].admitted and adm[10_002].admitted

    # a vectors-less index with neither threshold nor adc_bar refuses
    bare = str(tmp_path / "bare")
    _prebuilt_ivfpq(index_cache, spark, sf_dir, bare, bare=True)
    rc = main(
        ["gate", "--kind", "semantic", "-I", bare, "-A", str(sdrop),
         "-C", str(tmp_path / "ck2")]
    )
    assert rc == 2
    assert "no persisted vector relation" in capsys.readouterr().err

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    midx = str(tmp_path / "mh")
    index_cache.fresh(
        "semadm_minhash",
        lambda d: write_minhash_index(spark, docs, d),
        midx,
    )
    (d0,) = docs.where("doc_id = 0").collect()
    mdrop = tmp_path / "mdrop"
    mdrop.mkdir()
    _stage(
        spark.createDataFrame(
            [(900_001, d0.text), (900_002, "a genuinely novel text " * 8)],
            "doc_id long, text string",
        ),
        tmp_path, mdrop, "b1", 1_000,
    )
    rc = main(
        ["gate", "--kind", "minhash", "-I", midx, "-A", str(mdrop),
         "-C", str(tmp_path / "ck3")]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "2 decisions on record, 1 quarantined (50.0%)" in out
    madm = {
        r.doc_id: r
        for r in spark.read.parquet(f"{midx}/admissions").collect()
    }
    assert not madm[900_001].admitted and madm[900_001].matched_id == 0
    assert madm[900_002].admitted


def test_forget_reaches_semantic_gate_tables(spark, sf_dir, tmp_path, index_cache):
    """forget_from_index on an ivfpq index with the verify relation
    and admissions scrubs codes + vectors + the doc's own admission
    rows."""
    from mahjong_etl_spark.streaming.ann_index_stream import (
        forget_from_index,
    )

    vecs = _vecs(spark, sf_dir)
    index_dir = str(tmp_path / "ivfpq")
    _prebuilt_ivfpq(index_cache, spark, sf_dir, index_dir)

    (v2,) = vecs.where("vec_id = 2").collect()
    b1 = spark.createDataFrame([(10_001, _emb(v2))], VEC_SCHEMA)
    drop = tmp_path / "drop"
    drop.mkdir()
    _stage(b1, tmp_path, drop, "b1", 1_000)
    _drain(spark, drop, index_dir, tmp_path / "ckpt")

    rep = forget_from_index(spark, index_dir, [2, 10_001])
    assert rep["kind"] == "ivfpq"
    assert not rep["skipped_in_flight"]
    assert rep["tables"]["codes"]["rows_deleted"] == 1  # vec 2
    assert rep["tables"]["vectors"]["rows_deleted"] == 1
    assert rep["tables"]["admissions"]["rows_deleted"] == 1  # 10_001
    assert 2 not in _ids(spark, index_dir, "codes")
    assert 2 not in _ids(spark, index_dir, "vectors")
    assert 10_001 not in _adm(spark, index_dir)
