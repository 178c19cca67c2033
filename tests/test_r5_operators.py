"""Round-5 operators: duplicate-span dedup, balanced shard manifest,
and the generalized exact distributed row_number they build on."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mahjong_etl_spark.functions.ranks import with_global_row_number
from mahjong_etl_spark.operators.corpus import N_SHARDS, corpus_shard_manifest
from mahjong_etl_spark.operators.dedup import SPAN_K, duplicate_span_stats


# ---------------------------------------------------------------------------
# duplicate spans
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_shared_span_found_with_exact_bounds(spark):
    # an 8-word passage shared by docs 1 and 2, surrounded by unique noise
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    d = _docs(
        spark,
        [
            (1, f"u1a u1b u1c {shared} u1d u1e"),
            (2, f"v1a {shared} v1b v1c v1d v1e v1f"),
            (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
        ],
    )
    out = {r.doc_id: r for r in duplicate_span_stats(d).collect()}
    assert set(out) == {1, 2}
    # doc 1: shared words occupy positions 3..10 (0-based), so the
    # K-gram run starts at 3 and ends at 10-K+1; coverage = 8 words
    for doc in (1, 2):
        assert out[doc].n_spans == 1
        assert out[doc].dup_words == 8
        assert out[doc].max_span_words == 8


def test_self_repetition_within_one_doc_counts(spark):
    # the SAME doc repeating its own phrase is a duplicated span too
    phrase = "p1 p2 p3 p4 p5"
    d = _docs(spark, [(7, f"{phrase} x1 x2 x3 {phrase}"), (8, "q1 q2 q3 q4 q5 q6")])
    out = {r.doc_id: r for r in duplicate_span_stats(d).collect()}
    assert set(out) == {7}
    assert out[7].n_spans == 2  # two disjoint occurrences, gap > K-1
    assert out[7].dup_words == 10


def test_overlapping_windows_merge_into_one_span(spark):
    # two docs sharing a 7-word passage: K-gram positions 0,1,2 in the
    # passage all duplicate, gap 1 <= K-1 so they merge — coverage is
    # the UNION (7 words), not 3 windows * K
    shared = "m1 m2 m3 m4 m5 m6 m7"
    d = _docs(spark, [(1, f"{shared} a b c"), (2, f"z {shared} y x")])
    out = {r.doc_id: r for r in duplicate_span_stats(d).collect()}
    assert out[1].n_spans == 1 and out[1].dup_words == 7


def test_short_docs_and_no_dup_docs_emit_nothing(spark):
    d = _docs(spark, [(1, "a b"), (2, "c d e f g h i j"), (3, "k l m n o p q r")])
    assert duplicate_span_stats(d).count() == 0


def test_span_stats_partitioning_invariant(spark, sf_dir):
    from mahjong_etl_spark.operators.dedup import dedup_duplicate_spans

    default = spark.conf.get("spark.sql.shuffle.partitions")
    base = sorted(map(tuple, dedup_duplicate_spans(spark, sf_dir).collect()))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = sorted(map(tuple, dedup_duplicate_spans(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    assert base == alt


# ---------------------------------------------------------------------------
# global row_number + shard manifest
# ---------------------------------------------------------------------------


def test_global_row_number_matches_single_window(spark):
    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") * 2654435761 % 997).alias("k")
    )
    got = with_global_row_number(
        df, [F.col("k").desc(), F.col("id").asc()], out_col="rn"
    )
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("k").desc(), F.col("id")))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_global_row_number_empty_and_singleton(spark):
    empty = spark.range(0).select(F.col("id"))
    assert with_global_row_number(empty, [F.col("id")]).count() == 0
    one = with_global_row_number(
        spark.range(1).select("id"), [F.col("id")]
    ).collect()
    assert one[0].rn == 1


def test_shard_manifest_balance_bound(spark, sf_dir):
    rows = corpus_shard_manifest(spark, sf_dir).collect()
    assert len(rows) == N_SHARDS
    totals = [r.shard_tokens for r in rows]
    max_doc = max(r.max_doc_tokens for r in rows)
    # round-robin over the size-DESC order: spread bounded by the
    # largest document (LPT-style balance)
    assert max(totals) - min(totals) <= max_doc
    n_docs = sum(r.n_docs for r in rows)
    assert abs(max(r.n_docs for r in rows) - min(r.n_docs for r in rows)) <= 1
    assert n_docs > 0
