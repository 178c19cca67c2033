"""Round-8 extension operators: semantic contracts the sf-corpus
oracles can't exercise (hand-computed formulas, edge inputs, the
zero-relevant nDCG edge) — oracle parity itself rides the strict
sweep, as for the r7 batch."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_iso, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [(e, t, u, ty, v, "{}") for e, t, u, ty, v in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.to_timestamp("ts").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


# ---------------------------------------------------------------------------
# session path mining
# ---------------------------------------------------------------------------


def test_session_paths_gap_split_and_prefix_cap(spark, tmp_path):
    """Two sessions split by the 30-min gap; a >8-event session's path
    is the FIRST-8 prefix while n_events counts all of it."""
    from mahjong_etl_spark.plans.queries import events_session_paths

    rows = [
        # user 1: A,B close together, then C 31 min later (new session)
        (1, "2024-01-01 10:00:00", 1, "A", 1.0),
        (2, "2024-01-01 10:05:00", 1, "B", 1.0),
        (3, "2024-01-01 10:36:00", 1, "C", 1.0),
        # user 2: 10 events, one session -> 8-type path prefix, n=10
        *[
            (10 + i, f"2024-01-01 12:{i:02d}:00", 2, f"T{i}", 1.0)
            for i in range(10)
        ],
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.path: (r.n_sessions, r.n_events)
        for r in events_session_paths(spark, sf).collect()
    }
    assert got["A>B"] == (1, 2)
    assert got["C"] == (1, 1)
    long_path = ">".join(f"T{i}" for i in range(8))
    assert got[long_path] == (1, 10)  # prefix capped at 8, count is 10
    assert len(got) == 3


def test_session_paths_orders_within_session_by_time(spark, tmp_path):
    """Path order is event-time order, not arrival/row order."""
    from mahjong_etl_spark.plans.queries import events_session_paths

    rows = [  # deliberately listed out of time order
        (2, "2024-01-01 10:10:00", 1, "LATER", 1.0),
        (1, "2024-01-01 10:00:00", 1, "FIRST", 1.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    paths = [r.path for r in events_session_paths(spark, sf).collect()]
    assert paths == ["FIRST>LATER"]


# ---------------------------------------------------------------------------
# median/MAD robust anomaly screen
# ---------------------------------------------------------------------------


def test_anomaly_mad_hand_computed_z_and_masking_resistance(spark, tmp_path):
    """One extreme value among stable ones: robust z must equal the
    hand formula 0.6745*(x-median)/MAD — and the extreme value must
    NOT mask itself (the failure mode of the stddev-based screen,
    where one outlier inflates sigma until nothing flags)."""
    from mahjong_etl_spark.plans.queries import events_anomaly_mad

    vals = [10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 10.3, 9.7, 10.0, 1000.0]
    rows = [
        (i, f"2024-01-01 10:{i:02d}:00", 1, "buy", v)
        for i, v in enumerate(vals)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.event_id: r for r in events_anomaly_mad(spark, sf).collect()}
    # hand computation in milli-units
    xm = sorted(round(v * 1000) for v in vals)
    med = (xm[4] + xm[5]) / 2
    mad = sorted(abs(x - med) for x in (round(v * 1000) for v in vals))
    madv = (mad[4] + mad[5]) / 2
    z = 0.6745 * (round(1000.0 * 1000) - med) / madv
    assert list(got) == [9]  # only the extreme event flags
    assert got[9].value == 1000.0
    assert abs(got[9].robust_z - round(z, 6)) < 1e-9


def test_anomaly_mad_zero_mad_group_never_flags(spark, tmp_path):
    """A constant-valued group has MAD 0 — it must be skipped, not
    divide by zero."""
    from mahjong_etl_spark.plans.queries import events_anomaly_mad

    rows = [
        (i, f"2024-01-01 10:{i:02d}:00", 1, "ping", 5.0) for i in range(6)
    ]
    sf = _write_events(spark, tmp_path, rows)
    assert events_anomaly_mad(spark, sf).collect() == []


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------


def test_pmi_hand_formula_and_min_count(spark, tmp_path):
    """PMI of a pair that always co-occurs must equal
    ln(cab*N/(ca*cb)) computed by hand; pairs under the min count are
    cut."""
    from mahjong_etl_spark.operators.text_analysis import (
        PMI_MIN_PAIR,
        text_pmi_collocations,
    )

    # 6 docs "alpha beta", 4 docs "gamma delta" (below min count)
    docs = [(i, "alpha beta", "en", "s", 10) for i in range(6)]
    docs += [(100 + i, "gamma delta", "en", "s", 11) for i in range(4)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = text_pmi_collocations(spark, str(tmp_path)).collect()
    assert [(r.w1, r.w2, r.cab) for r in out] == [("alpha", "beta", 6)]
    # N=10 bigrams total, cab=6, ca(alpha as w1)=6, cb(beta as w2)=6
    want = round(math.log(6) + math.log(10) - math.log(6) - math.log(6), 6)
    assert abs(out[0].pmi - want) < 1e-9
    assert 4 < PMI_MIN_PAIR <= 6  # the gamma-delta cut relies on this


# ---------------------------------------------------------------------------
# script profile
# ---------------------------------------------------------------------------


def test_script_profile_exact_fractions(spark, tmp_path):
    from mahjong_etl_spark.operators.text_analysis import text_script_profile

    # 4 latin + 1 space + 3 digits + 2 CJK = 10 chars
    text = "abcd 123中文"
    spark.createDataFrame(
        [(1, text, "zh", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    (r,) = text_script_profile(spark, str(tmp_path)).collect()
    assert (r.lang, r.n_docs, r.n_chars) == ("zh", 1, 10)
    assert (r.frac_latin, r.frac_digit, r.frac_space, r.frac_cjk, r.frac_other) == (
        0.4, 0.3, 0.1, 0.2, 0.0
    )


# ---------------------------------------------------------------------------
# nDCG retrieval eval
# ---------------------------------------------------------------------------


def _write_embeddings(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


def test_ndcg_perfect_ranking_is_one_and_zero_relevant_drops(spark, tmp_path):
    """All-relevant top-k => nDCG exactly 1.0; a query whose label has
    no other corpus member is dropped (ideal ranking empty), matching
    the oracle's empty-series behavior."""
    from mahjong_etl_spark.operators.similarity import similarity_ndcg_eval

    rows = [(0, [1.0, 0.0], 7), (1, [0.0, 1.0], 99)]  # queries (vec_id < 5)
    # corpus: 12 label-7 vectors at distinct small angles to [1, 0]
    rows += [
        (10 + i, [1.0, 0.01 * (i + 1)], 7) for i in range(12)
    ]
    sf = _write_embeddings(spark, tmp_path, rows)
    got = {r.q_id: r for r in similarity_ndcg_eval(spark, sf).collect()}
    assert list(got) == [0]  # query 1 (label 99, no peers) dropped
    r = got[0]
    assert (r.total_rel, r.rel_at_k) == (12, 10)
    assert r.ndcg == 1.0


def test_ndcg_partial_relevance_hand_computed(spark, tmp_path):
    """Relevant docs at known ranks: nDCG must equal the hand formula
    over the same nano-snapped discounts."""
    from mahjong_etl_spark.operators.similarity import (
        NDCG_K,
        similarity_ndcg_eval,
    )

    rows = [(0, [1.0, 0.0], 7)]
    # ranks by descending cosine: label 7 at ranks 1 and 3, label 8 else
    cos = [0.99, 0.98, 0.97, 0.96, 0.95, 0.94, 0.93, 0.92, 0.91, 0.90, 0.89]
    labels = [7, 8, 7, 8, 8, 8, 8, 8, 8, 8, 8]
    import math as m

    for i, (c, lab) in enumerate(zip(cos, labels)):
        s = m.sqrt(1 - c * c)
        rows.append((10 + i, [c, s], lab))
    sf = _write_embeddings(spark, tmp_path, rows)
    (r,) = similarity_ndcg_eval(spark, sf).collect()
    nano = lambda k: round(1e9 / m.log2(k + 1))  # noqa: E731
    dcg = nano(1) + nano(3)
    idcg = nano(1) + nano(2)  # total_rel = 2 -> ideal = ranks 1, 2
    assert (r.total_rel, r.rel_at_k) == (2, 2)
    assert r.ndcg == round(dcg / idcg, 6)
    assert NDCG_K == 10


# ---------------------------------------------------------------------------
# vocabulary overlap
# ---------------------------------------------------------------------------


def test_vocab_overlap_jaccard_and_min_count(spark, tmp_path):
    """Hand-built vocabularies: Jaccard must match exactly and terms
    under the per-source min count stay out of the vocabulary."""
    from mahjong_etl_spark.operators.corpus import (
        VOCAB_MIN_COUNT,
        corpus_vocab_overlap,
    )

    assert VOCAB_MIN_COUNT == 3
    mk = lambda words, n: " ".join(words * n)  # noqa: E731
    docs = [
        # source A vocab: {x, y, z}; 'rare' appears only twice -> out
        (1, mk(["x", "y", "z"], 3) + " rare rare", "en", "A", 1),
        # source B vocab: {x, y, w}
        (2, mk(["x", "y", "w"], 3), "en", "B", 1),
        # source C vocab: {q} — disjoint from A and B
        (3, mk(["q"], 3), "en", "C", 1),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        (r.source_a, r.source_b): r
        for r in corpus_vocab_overlap(spark, str(tmp_path)).collect()
    }
    ab = out[("A", "B")]
    assert (ab.vocab_a, ab.vocab_b, ab.n_shared) == (3, 3, 2)
    assert ab.jaccard == round(2 / 4, 6)
    # fully disjoint pairs produce NO row (inner intersection join) —
    # the absence IS the signal, mirrored by the oracle's inner join
    assert ("A", "C") not in out and ("B", "C") not in out


# ---------------------------------------------------------------------------
# FFT spectral features
# ---------------------------------------------------------------------------


def test_spectral_features_recover_synthesized_tone(spark, tmp_path):
    """The dominant DFT bin must equal the bin the tone was planted
    on, for a spread of doc_ids across the bin range."""
    from mahjong_etl_spark.operators.multimodal import (
        SPEC_N,
        SPEC_RATE,
        multimodal_spectral_features,
    )

    ids = [0, 1, 37, 99, 100, 123]
    spark.createDataFrame(
        [(d, "x", "en", "s", 1) for d in ids],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.doc_id: r
        for r in multimodal_spectral_features(spark, str(tmp_path)).collect()
    }
    for d in ids:
        want_bin = 5 + d % 100
        assert got[d].dominant_bin == want_bin, d
        assert got[d].dominant_hz == round(want_bin * SPEC_RATE / SPEC_N, 6)
        # centroid is pulled toward the tone but the noise floor keeps
        # it strictly inside the band
        assert 0 < got[d].spectral_centroid_hz < SPEC_RATE / 2


def test_spectral_parseval_identity():
    """Parseval: sum |X|^2 / n == sum v^2 for the synthesized clip —
    pins the FFT scaling convention the features rely on."""
    import numpy as np

    from mahjong_etl_spark.operators.multimodal import SPEC_N, synth_tone_clip

    clip, _ = synth_tone_clip(42)
    v = clip.astype(np.float64)
    spec = np.fft.rfft(v)
    # rfft halves the spectrum: double the non-DC/non-Nyquist bins
    power = (
        np.abs(spec[0]) ** 2
        + np.abs(spec[-1]) ** 2
        + 2 * (np.abs(spec[1:-1]) ** 2).sum()
    ) / SPEC_N
    assert abs(power - (v * v).sum()) / (v * v).sum() < 1e-12


def test_spectral_clip_survives_wav_roundtrip():
    """The DSP path reads DECODED bytes: the RIFF roundtrip must be
    bit-exact for the synthesized int16 clips."""
    import numpy as np

    from mahjong_etl_spark.operators.multimodal import (
        SPEC_RATE,
        decode_wav_samples,
        encode_wav,
        synth_tone_clip,
    )

    clip, _ = synth_tone_clip(7)
    back, rate, ch = decode_wav_samples(encode_wav(clip, SPEC_RATE))
    assert rate == SPEC_RATE and ch == 1
    assert np.array_equal(back, clip)


# ---------------------------------------------------------------------------
# perceptual-hash image dedup
# ---------------------------------------------------------------------------


def test_phash_invariant_to_noise_and_separates_groups():
    """The pHash LAW: per-document high-frequency noise never changes
    the hash (intra-group hamming 0), while distinct base patterns
    stay far apart (inter-group hamming >= 16 of 64 bits)."""
    import itertools

    from mahjong_etl_spark.operators.multimodal import (
        PHASH_GROUPS,
        phash64,
        synth_image,
    )

    reps = {g: phash64(synth_image(g)) for g in range(PHASH_GROUPS)}
    for g in range(0, PHASH_GROUPS, 3):
        for k in (1, 5, 11):
            assert phash64(synth_image(g + PHASH_GROUPS * k)) == reps[g]
    for a, b in itertools.combinations(range(PHASH_GROUPS), 2):
        assert bin(reps[a] ^ reps[b]).count("1") >= 16, (a, b)


def test_phash_dedup_groups_match_planted_structure(spark, tmp_path):
    """Over a corpus of doc_ids spanning every group several times,
    exact-hash grouping must recover EXACTLY the planted groups: one
    hash per group, correct member counts, never a cross-group
    collision (n_groups_sharing always 1)."""
    from mahjong_etl_spark.operators.multimodal import (
        PHASH_GROUPS,
        multimodal_phash_dedup,
    )

    ids = list(range(3 * PHASH_GROUPS)) + [7, 47]  # group 7 twice more
    spark.createDataFrame(
        [(d, "x", "en", "s", 1) for d in set(ids)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = multimodal_phash_dedup(spark, str(tmp_path)).collect()
    assert len(out) == PHASH_GROUPS  # one cluster per planted group
    assert all(r.n_groups_sharing == 1 for r in out)
    by_min = {r.min_doc_id: r.n_docs for r in out}
    assert by_min[7] == 3  # docs 7, 47, 87
    assert sum(by_min.values()) == len(set(ids))


def test_phash_dct_is_orthonormal():
    """The DCT basis must be orthonormal (C @ C.T = I): the transform
    preserves energy, so planted coefficients come back exactly."""
    import numpy as np

    from mahjong_etl_spark.operators.multimodal import PHASH_SIDE, _dct_matrix

    c = _dct_matrix(PHASH_SIDE)
    assert np.allclose(c @ c.T, np.eye(PHASH_SIDE), atol=1e-12)
