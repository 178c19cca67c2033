"""Cross-checks for the approximate (rows-only) extension operators
against their exact baselines — the local gate the driver can't run.
"""

from __future__ import annotations

from mahjong_etl_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
)
from mahjong_etl_spark.operators.similarity import (
    similarity_ann_lsh,
    similarity_topk_bruteforce,
)


def test_minhash_lsh_matches_exact_jaccard(spark, sf_dir):
    """LSH candidates are verified with exact Jaccard, so output must
    be a subset of the exact pairs; the planted dups (J >= 0.88) sit
    far above the LSH S-curve, so recall must be total here."""
    exact = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b, r.jaccard) for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert lsh == exact
    assert len(exact) > 0, "expected planted near-duplicate pairs in testdata"


def test_simhash_finds_planted_dups(spark, sf_dir):
    """Planted near-identical docs differ in a handful of words, so
    their simhashes should collide within hamming<=3 for most pairs."""
    exact_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
        if r.jaccard >= 0.95
    }
    sim_pairs = {(r.doc_a, r.doc_b) for r in dedup_simhash(spark, sf_dir).collect()}
    assert len(sim_pairs & exact_pairs) >= len(exact_pairs) * 0.7
    # hamming<=3 on 64 bits is a strong condition: no pair explosion
    assert len(sim_pairs) < 200


def test_ann_lsh_recall(spark, sf_dir):
    """ANN top-5 must recover >= 60% of the exact top-5 per query
    (random-hyperplane LSH with 4 tables x 8 bits at this tiny scale)."""
    exact = {
        (r.q_id, r.neighbor_id) for r in similarity_topk_bruteforce(spark, sf_dir).collect()
    }
    ann = {(r.q_id, r.neighbor_id) for r in similarity_ann_lsh(spark, sf_dir).collect()}
    assert len(exact) > 0
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.6, f"ANN recall too low: {recall}"


def test_ann_ivf_recall(spark, sf_dir):
    """IVF ANN (16 clusters, nprobe=6) must recover >= 60% of the
    exact top-5, same contract as the LSH variant."""
    from mahjong_etl_spark.operators.similarity import similarity_ann_ivf

    exact = {
        (r.q_id, r.neighbor_id) for r in similarity_topk_bruteforce(spark, sf_dir).collect()
    }
    ann = {(r.q_id, r.neighbor_id) for r in similarity_ann_ivf(spark, sf_dir).collect()}
    assert len(exact) > 0
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_ivf_centroids_deterministic(spark, sf_dir):
    """The coarse quantizer must be identical across runs (seedless
    hash sampling + fixed Lloyd rounds)."""
    import numpy as np

    from mahjong_etl_spark.operators.similarity import train_ivf_centroids, with_norm
    from mahjong_etl_spark.sources.tables import load_spread

    c = with_norm(load_spread(spark, sf_dir, "embeddings"))
    c1 = train_ivf_centroids(c, 8, iters=1)
    c2 = train_ivf_centroids(c, 8, iters=1)
    assert np.allclose(c1, c2)
