"""Distributed BPE training vs a pure-Python reference (operators/bpe.py).

The committed goldens pin the bytes; this file pins the SEMANTICS: the
distributed trainer must agree merge-for-merge with an independent
single-node BPE implemented here from the algorithm definition
(Sennrich et al. 2016): count adjacent symbol pairs weighted by word
frequency, merge the most frequent pair (lexicographic tie-break),
repeat.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mahjong_etl_spark.operators.bpe import (
    MIN_PAIR_FREQ,
    N_MERGES,
    train_bpe,
    word_counts,
)
from mahjong_etl_spark.sources.tables import load


def ref_bpe(freqs: dict[str, int], n_merges: int, min_pair_freq: int):
    """Reference BPE: dict-of-tuples, no Spark."""
    words = {w: tuple(w) for w in freqs}
    merges = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freqs[w]
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_freq:
            break
        merges.append((rank, a, b, a + b, cnt))
        for w, syms in words.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            words[w] = tuple(out)
    return merges, words


@pytest.fixture(scope="module")
def corpus_freqs(spark, sf_dir):
    wc = word_counts(load(spark, sf_dir, "documents"))
    return {r.word: r.freq for r in wc.collect()}


def test_merges_match_reference(spark, sf_dir, corpus_freqs):
    ref_merges, ref_words = ref_bpe(corpus_freqs, N_MERGES, MIN_PAIR_FREQ)
    wc = word_counts(load(spark, sf_dir, "documents"))
    got_merges, got_w = train_bpe(wc)
    assert got_merges == ref_merges
    got_words = {r.word: tuple(r.syms) for r in got_w.collect()}
    assert got_words == ref_words


def test_planted_overlap_semantics(spark):
    # "aaab"x2 + "aab"x1: pair (a,a) counts 2*2+1=5 > (a,b) 3.
    # Greedy left-to-right on "aaab" gives [aa, a, b] (no overlap reuse).
    wc = spark.createDataFrame([("aaab", 2), ("aab", 1)], ["word", "freq"])
    merges, words = train_bpe(wc, n_merges=2, min_pair_freq=2)
    assert merges[0][1:4] == ("a", "a", "aa")
    syms = {r.word: list(r.syms) for r in words.collect()}
    # after merge 1: aaab -> [aa, a, b]; aab -> [aa, b]
    # round 2 pairs: (aa,a):2, (a,b):2, (aa,b):1 -> tie on count,
    # lexicographic: ("a","b") < ("aa","a") -> merge (a,b)
    assert merges[1][1:4] == ("a", "b", "ab")
    assert syms["aaab"] == ["aa", "ab"]
    assert syms["aab"] == ["aa", "b"]


def test_token_conservation(spark, sf_dir):
    # Every word's symbols must concatenate back to the word exactly.
    wc = word_counts(load(spark, sf_dir, "documents"))
    _, words = train_bpe(wc)
    bad = words.where(
        F.concat_ws("", F.col("syms")) != F.col("word")
    ).count()
    assert bad == 0


def ref_encode(word: str, merges) -> list[str]:
    syms = list(word)
    for _, a, b, m, _cnt in merges:
        out: list[str] = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = m
            else:
                out.append(x)
        syms = out
    return syms


def test_oov_encoding_matches_reference_and_training(spark, sf_dir):
    from mahjong_etl_spark.operators.bpe import corpus_bpe, encode_words_expr

    merges, words = corpus_bpe(spark, sf_dir)
    enc = encode_words_expr(merges)
    # 1) re-encoding every TRAINING word reproduces the trained symbols
    re_enc = words.select("word", "syms", enc.alias("enc"))
    assert re_enc.where(F.col("syms") != F.col("enc")).count() == 0
    # 2) UNSEEN words (not in the corpus vocabulary) encode exactly as
    # the single-node reference application of the learned merges
    vocab = {r.word for r in words.select("word").collect()}
    oov = ["tablescan", "sparkly", "quickbrown", "zzz", "ab"]
    assert not (set(oov) & vocab)
    df = spark.createDataFrame([(w,) for w in oov], ["word"])
    got = {r.word: list(r.enc) for r in df.select("word", enc.alias("enc")).collect()}
    assert got == {w: ref_encode(w, merges) for w in oov}
