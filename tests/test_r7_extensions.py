"""Round-7 extension operators: semantic contracts the sf-corpus
oracles can't exercise (edge inputs, formula identities, interval
boundary law) — the oracle parity itself rides the strict sweep."""

from __future__ import annotations

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# RRF fusion
# ---------------------------------------------------------------------------


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "q_id long, neighbor_id long, rnk long")


def test_rrf_formula_and_tie_break(spark):
    """Units must equal Σ 10^12 div (60 + rank); score ties break by
    ascending neighbor id; top-k cut respects the fused order."""
    from mahjong_etl_spark.operators.similarity import RRF_UNIT, rrf_fuse

    a = _ranking(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    b = _ranking(spark, [(1, 11, 1), (1, 10, 2), (1, 13, 3)])
    got = {
        r.neighbor_id: (r.rrf_units, r.n_sources, r.rnk)
        for r in rrf_fuse([a, b], k=4).collect()
    }
    u = lambda r: RRF_UNIT // (60 + r)  # noqa: E731
    # 10 and 11 fuse symmetrically (ranks {1,2} each) -> exact tie ->
    # neighbor 10 wins rank 1 by id
    assert got[10] == (u(1) + u(2), 2, 1)
    assert got[11] == (u(1) + u(2), 2, 2)
    assert got[12] == (u(3), 1, 3)  # 12 vs 13 tie on units -> id order
    assert got[13] == (u(3), 1, 4)


def test_rrf_single_source_survivors_and_k_cut(spark):
    from mahjong_etl_spark.operators.similarity import rrf_fuse

    a = _ranking(spark, [(7, i, i) for i in range(1, 6)])
    out = rrf_fuse([a], k=3).collect()
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rnk)] == [1, 2, 3]
    assert all(r.n_sources == 1 for r in out)


def test_rrf_ensemble_members_come_from_inputs(spark, sf_dir):
    """Every fused (q, neighbor) must exist in at least one input
    ranking with consistent n_sources — the ensemble can't invent
    candidates."""
    from mahjong_etl_spark.operators.similarity import (
        TOPK,
        N_QUERIES_PRED,
        ann_lsh_topk,
        corpus_embeddings,
        rrf_fuse,
    )

    e = corpus_embeddings(spark, sf_dir)
    q = e.where(N_QUERIES_PRED)
    lsh = ann_lsh_topk(spark, q, e, TOPK)
    fused = rrf_fuse([lsh, lsh, lsh], TOPK)
    rows = fused.collect()
    assert rows and all(r.n_sources == 3 for r in rows)
    base = {(r.q_id, r.neighbor_id, r.rnk) for r in lsh.collect()}
    # triple-fusing one ranking is a no-op on the order
    assert {(r.q_id, r.neighbor_id, r.rnk) for r in rows} == base


# ---------------------------------------------------------------------------
# Gopher rules
# ---------------------------------------------------------------------------


def test_gopher_rules_edge_inputs(spark, monkeypatch, sf_dir):
    """Rule flags on constructed edge documents: symbol-heavy,
    stopword-free, short, and a passing one."""
    import mahjong_etl_spark.operators.text_analysis as ta

    passing = "the quick brown fox jumps with energy and that verve " * 6
    docs = spark.createDataFrame(
        [
            (1, passing.strip()),                       # passes all rules
            (2, "the of and " + "# " * 60),             # symbol ratio fails
            (3, "zz yy xx ww vv " * 12),                # no stopwords
            (4, "the of short text"),                   # too few words
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(ta, "load_spread", lambda *_a, **_k: docs)
    got = {r.doc_id: r for r in ta.text_gopher_rules(spark, sf_dir).collect()}
    assert got[1].passes == 1
    assert got[2].passes == 0 and got[2].n_symbols >= 60
    assert got[3].passes == 0 and got[3].n_stopwords == 0
    assert got[4].passes == 0 and got[4].n_words < 50
    # display ratios agree with the integer rule columns
    r1 = got[1]
    assert abs(r1.mean_word_len * r1.n_words
               - round(r1.mean_word_len * r1.n_words)) < 1e-6
    assert 3.0 <= r1.mean_word_len <= 10.0


# ---------------------------------------------------------------------------
# LM quality buckets
# ---------------------------------------------------------------------------


def test_lm_buckets_partition_all_docs(spark, sf_dir):
    from mahjong_etl_spark.operators.text_analysis import (
        text_bigram_lm_scores,
        text_lm_quality_buckets,
    )

    b = text_lm_quality_buckets(spark, sf_dir).collect()
    n_docs = text_bigram_lm_scores(spark, sf_dir).count()
    assert sorted(r.bucket for r in b) == [1, 2, 3]
    assert sum(r.n_docs for r in b) == n_docs
    assert max(r.n_docs for r in b) - min(r.n_docs for r in b) <= 1
    # terciles are ordered: head (low entropy) -> tail (high)
    by = {r.bucket: r for r in b}
    assert by[1].avg_xent_bits <= by[2].avg_xent_bits <= by[3].avg_xent_bits
    assert by[1].max_xent_bits <= by[2].min_xent_bits + 1e-9
    assert by[2].max_xent_bits <= by[3].min_xent_bits + 1e-9


# ---------------------------------------------------------------------------
# SCD2 point-in-time
# ---------------------------------------------------------------------------


def test_scd2_as_of_interval_law(spark):
    """Exactly one row per key valid at any probe version >= the key's
    first version; keys born later are absent; the open interval wins
    at the frontier."""
    from mahjong_etl_spark.operators.cdc import scd2_as_of, scd2_history

    versioned = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 25, "x")],
        "k long, version long, payload string",
    )
    hist = scd2_history(versioned, "k", "version")
    for probe, want in [
        (9, {}),                      # before anything existed
        (10, {1: "a"}),               # inclusive valid_from
        (19, {1: "a"}),
        (20, {1: "b"}),               # successor takes over AT its version
        (26, {1: "b", 2: "x"}),
        (1000, {1: "c", 2: "x"}),     # open intervals valid forever
    ]:
        got = {
            r.k: r.payload
            for r in scd2_as_of(hist, F.lit(probe)).collect()
        }
        assert got == want, f"probe {probe}: {got} != {want}"


def test_scd2_point_in_time_one_row_per_existing_key(spark, sf_dir):
    from mahjong_etl_spark.operators.cdc import cdc_scd2_point_in_time

    rows = cdc_scd2_point_in_time(spark, sf_dir).collect()
    keys = [r.o_custkey for r in rows]
    assert len(keys) == len(set(keys)) > 0  # at most one version per key


# ---------------------------------------------------------------------------
# kNN classification
# ---------------------------------------------------------------------------


def test_knn_classify_majority_and_tie_law(spark):
    """Hand-built geometry: a query nearest three label-1 vectors and
    two label-2 vectors must vote 1; an exact 1-1 vote ties to the
    SMALLER label."""
    from mahjong_etl_spark.operators.similarity import knn_classify, with_norm

    def vec(x, y):
        return [float(x), float(y)] + [0.0] * 6

    corpus = spark.createDataFrame(
        [
            (10, vec(1.00, 0.00), 1),
            (11, vec(0.99, 0.10), 1),
            (12, vec(0.98, 0.15), 1),
            (13, vec(0.00, 1.00), 2),
            (14, vec(0.10, 0.99), 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    q = spark.createDataFrame(
        [(99, vec(1.0, 0.05), 0)],
        "vec_id long, embedding array<float>, label int",
    )
    out = knn_classify(with_norm(q), with_norm(corpus), k=5).collect()
    assert len(out) == 1 and out[0].predicted_label == 1 and out[0].votes == 3
    # tie: one neighbor of each label at equal distance -> label 1 wins
    out2 = knn_classify(with_norm(q), with_norm(corpus), k=2).collect()
    assert out2[0].predicted_label == 1  # rank 1+2 are both label 1 here
    tie_corpus = spark.createDataFrame(
        [(20, vec(0.5, 0.5), 7), (21, vec(0.5, 0.5), 3)],
        "vec_id long, embedding array<float>, label int",
    )
    out3 = knn_classify(with_norm(q), with_norm(tie_corpus), k=2).collect()
    assert out3[0].predicted_label == 3 and out3[0].votes == 1


# ---------------------------------------------------------------------------
# Inverted index
# ---------------------------------------------------------------------------


def test_inverted_index_stats_law(spark, monkeypatch, sf_dir):
    """df/cf/top-posting on a constructed corpus, including the
    tf-tie-to-smaller-doc rule."""
    import mahjong_etl_spark.operators.text_analysis as ta

    docs = spark.createDataFrame(
        [
            (1, "apple apple pear"),
            (2, "apple pear pear"),
            (3, "apple banana"),
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(ta, "load_spread", lambda *_a, **_k: docs)
    got = {r.term: r for r in ta.text_inverted_index(spark, sf_dir).collect()}
    assert got["apple"].df == 3 and got["apple"].cf == 4
    assert got["apple"].top_doc_id == 1 and got["apple"].max_tf == 2
    # pear: tf 1 in doc1, tf 2 in doc2 -> doc2 wins on tf
    assert got["pear"].top_doc_id == 2 and got["pear"].max_tf == 2
    assert got["banana"].df == 1 and got["banana"].top_doc_id == 3
    # head ordering: df desc, term asc
    assert list(got) and max(r.df for r in got.values()) == got["apple"].df


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_ordering_and_hit_law(spark, monkeypatch, sf_dir):
    """On a constructed corpus where the df-rank-10..12 terms are
    known, BM25 must (a) count term hits per doc, (b) rank a short
    doc with tf=2 above a long doc with tf=1 for the same term, and
    (c) never return a doc containing no query term."""
    import mahjong_etl_spark.operators.text_analysis as ta

    # 9 filler terms each in 4 docs (df 4, ranks 1-9); the three query
    # terms q1/q2/q3 each in 3 docs (ranks 10-12); noise terms df 1
    filler = " ".join(f"f{i}" for i in range(9))
    docs = spark.createDataFrame(
        [
            (1, f"{filler} q1 q1"),                  # short, tf(q1)=2
            (2, f"{filler} q1 " + "pad " * 40),      # long, tf(q1)=1
            (3, f"{filler} q1 q2 q3"),               # hits all three
            (4, f"{filler} q2 q3"),
            (5, f"{filler} q2 q3"),
            (6, filler),                             # no query terms
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(ta, "load_spread", lambda *_a, **_k: docs)
    rows = ta.text_bm25_search(spark, sf_dir).collect()
    got = {r.doc_id: r for r in rows}
    assert 6 not in got  # (c)
    assert got[3].n_terms_hit == 3 and got[1].n_terms_hit == 1
    assert got[1].bm25 > got[2].bm25  # (b): tf and length norm both favor 1
    # every score positive (Lucene +1 idf form)
    assert all(r.bm25 > 0 for r in rows)


# ---------------------------------------------------------------------------
# Association rules
# ---------------------------------------------------------------------------


def test_association_rules_formula_law(spark, monkeypatch, sf_dir):
    """Hand-built baskets: {1,2} together in 2 of 4 baskets, item 1 in
    3, item 2 in 2 -> conf(1->2)=2/3, conf(2->1)=1, lift=4*2/(3*2)."""
    import mahjong_etl_spark.plans.queries as Q

    items = spark.createDataFrame(
        [
            (100, 1), (100, 2),
            (200, 1), (200, 2),
            (300, 1),
            (400, 3),
        ],
        "l_orderkey long, l_partkey long",
    )
    real_load = Q.load

    def fake_load(spark_, sf, table):
        return items if table == "lineitem" else real_load(spark_, sf, table)

    monkeypatch.setattr(Q, "load", fake_load)
    got = {
        (r.part_a, r.part_b): r
        for r in Q.orders_association_rules(spark, sf_dir).collect()
    }
    r = got[(1, 2)]
    assert r.support == 2
    assert abs(r.conf_a_to_b - round(2 / 3, 6)) < 1e-9
    assert abs(r.conf_b_to_a - 1.0) < 1e-9
    assert abs(r.lift - round(4 * 2 / (3 * 2), 6)) < 1e-9
    assert (1, 3) not in got and (2, 3) not in got  # never co-occur


# ---------------------------------------------------------------------------
# Skyline
# ---------------------------------------------------------------------------


def test_skyline_dominance_law(spark, monkeypatch, sf_dir):
    """Constructed frontier: dominated rows drop, equal-(price, size)
    twins both survive, same-price-smaller-size drops, and the result
    equals the naive quadratic dominance definition."""
    import mahjong_etl_spark.plans.queries as Q

    rows = [
        (1, 1.00, 5),   # frontier (cheapest)
        (2, 2.00, 9),   # frontier (bigger than everything cheaper)
        (3, 2.00, 9),   # twin of 2 -> survives
        (4, 2.00, 7),   # same price, smaller -> dominated by 2
        (5, 3.00, 8),   # pricier and smaller than 2 -> dominated
        (6, 4.00, 12),  # frontier
    ]
    parts = spark.createDataFrame(
        rows, "p_partkey long, p_retailprice double, p_size int"
    )
    real_load = Q.load

    def fake_load(spark_, sf, table):
        return parts if table == "part" else real_load(spark_, sf, table)

    monkeypatch.setattr(Q, "load", fake_load)
    got = sorted(r.p_partkey for r in Q.part_skyline(spark, sf_dir).collect())
    assert got == [1, 2, 3, 6]
    # cross-check against the naive O(n^2) dominance definition
    naive = [
        k for k, pr, sz in rows
        if not any(
            (pr2 <= pr and sz2 >= sz and (pr2 < pr or sz2 > sz))
            for _, pr2, sz2 in rows
        )
    ]
    assert got == sorted(naive)


# ---------------------------------------------------------------------------
# KMV overlap sketches
# ---------------------------------------------------------------------------


def _fake_events(spark, pairs):
    rows = [(t, u) for t, users in pairs for u in users]
    return spark.createDataFrame(
        [(i, t, u) for i, (t, u) in enumerate(rows)],
        "event_id long, event_type string, user_id long",
    )


def test_kmv_exact_below_sketch_size(spark, monkeypatch, sf_dir):
    """When every segment fits the sketch (n < k), KMV is EXACT by
    construction: estimates must equal the exact counts."""
    import mahjong_etl_spark.plans.queries as Q

    ev = _fake_events(
        spark,
        [("a", range(1, 101)), ("b", range(51, 181))],  # overlap 50, union 180
    )
    real_load = Q.load
    monkeypatch.setattr(
        Q, "load",
        lambda s, sf, t: ev if t == "events" else real_load(s, sf, t),
    )
    r = Q.events_kmv_segment_overlap(spark, sf_dir).collect()[0]
    assert (r.exact_a, r.exact_b, r.exact_overlap) == (100, 130, 50)
    assert r.kmv_union_est == 180.0 and r.kmv_overlap_est == 50.0


def test_kmv_estimator_accuracy_partial_overlap(spark, monkeypatch, sf_dir):
    """Above the sketch size the estimator engages: k=256 gives
    ~1/sqrt(k) ≈ 6% standard error on the union, compounding through
    the Jaccard — assert generous but meaningful bounds on a
    2000/3000-user partial overlap."""
    import mahjong_etl_spark.plans.queries as Q

    ev = _fake_events(
        spark,
        [("a", range(1, 2001)), ("b", range(1001, 4001))],
        # exact: |a|=2000, |b|=3000, overlap=1000, union=4000
    )
    real_load = Q.load
    monkeypatch.setattr(
        Q, "load",
        lambda s, sf, t: ev if t == "events" else real_load(s, sf, t),
    )
    r = Q.events_kmv_segment_overlap(spark, sf_dir).collect()[0]
    assert (r.exact_a, r.exact_b, r.exact_overlap) == (2000, 3000, 1000)
    assert abs(r.kmv_union_est - 4000) / 4000 < 0.15
    assert abs(r.kmv_overlap_est - 1000) / 1000 < 0.30
    # determinism: re-running yields byte-identical estimates (seedless
    # hash sketch — the golden-oracle prerequisite)
    r2 = Q.events_kmv_segment_overlap(spark, sf_dir).collect()[0]
    assert (r.kmv_union_est, r.kmv_overlap_est) == (
        r2.kmv_union_est, r2.kmv_overlap_est
    )


# ---------------------------------------------------------------------------
# DSIR importance selection
# ---------------------------------------------------------------------------


def test_dsir_weight_formula_law(spark, monkeypatch, sf_dir):
    """Hand-built corpus: weights must equal the add-one-smoothed
    unigram log-ratio sum (nano-snapped), and the doc richest in
    target-distinctive tokens must rank first."""
    import math

    import mahjong_etl_spark.operators.corpus as C

    docs = spark.createDataFrame(
        [
            (0, "en", "apple apple banana"),
            (1, "en", "apple cherry"),
            (2, "de", "banana banana cherry"),
            (3, "de", "cherry cherry"),
        ],
        "doc_id long, lang string, text string",
    )
    real = C.load_spread

    def fake(spark_, sf, table):
        return docs if table == "documents" else real(spark_, sf, table)

    monkeypatch.setattr(C, "load_spread", fake)
    got = {r.doc_id: r for r in C.corpus_dsir_selection(spark, sf_dir).collect()}

    # vocab: apple (c_s=3, c_t=3), banana (3, 1), cherry (4, 1)
    # S=10, T=5, V=3
    def lr_nano(c_t, c_s):
        return round(math.log(((c_t + 1) * 13.0) / ((c_s + 1) * 8.0)) * 1e9)

    a, b, c = lr_nano(3, 3), lr_nano(1, 3), lr_nano(1, 4)
    expect = {0: 2 * a + b, 1: a + c, 2: 2 * b + c, 3: 2 * c}
    for doc_id, w_nano in expect.items():
        assert got[doc_id].log_weight == round(w_nano / 1e9, 6)
    assert got[0].n_tokens == 3 and got[3].n_tokens == 2
    # d1 (all-but-one target-distinctive tokens) outranks the de docs;
    # ordering of the returned cut follows the exact-int weights
    ws = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [doc_id for doc_id, _ in ws][:2] == [0, 1]
    assert got[2].log_weight < got[1].log_weight


def test_dsir_target_tokens_up_weighted(spark, sf_dir):
    """On the real corpus the mean log-weight of lang='en' docs must
    exceed the mean of the rest — by construction the target
    distribution is the en slice."""
    import mahjong_etl_spark.operators.corpus as C

    rows = C.corpus_dsir_selection(spark, sf_dir).collect()
    # the top-k cut should be dominated by target-language docs
    en = [r for r in rows if r.lang == "en"]
    assert len(en) >= len(rows) * 0.6


# ---------------------------------------------------------------------------
# Least-squares linear trend
# ---------------------------------------------------------------------------


def test_linear_trend_recovers_planted_line(spark, monkeypatch, sf_dir):
    """Events lying exactly on value = 10 + 1.5/hour must yield
    slope_per_day = 36.0 and intercept_value = 10.0 (origin
    2024-01-01); a flat series yields slope 0."""
    from datetime import datetime, timedelta

    import mahjong_etl_spark.plans.queries as Q

    t0 = datetime(2024, 1, 1)
    rows = [
        ("lin", t0 + timedelta(hours=h), 10.0 + 1.5 * h) for h in range(6)
    ] + [("flat", t0 + timedelta(hours=h), 7.25) for h in range(4)]
    events = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    real_load = Q.load

    def fake_load(spark_, sf, table):
        return events if table == "events" else real_load(spark_, sf, table)

    monkeypatch.setattr(Q, "load", fake_load)
    got = {r.event_type: r for r in Q.events_linear_trend(spark, sf_dir).collect()}
    assert got["lin"].n_events == 6
    assert abs(got["lin"].slope_per_day - 36.0) < 1e-6
    assert abs(got["lin"].intercept_value - 10.0) < 1e-3
    assert abs(got["flat"].slope_per_day) < 1e-9
    assert abs(got["flat"].intercept_value - 7.25) < 1e-3


# ---------------------------------------------------------------------------
# Z-order layout audit
# ---------------------------------------------------------------------------


def test_zorder_tile_locality_law(spark, monkeypatch, sf_dir):
    """Over the full 16x16 key grid: z-buckets are exact 2x2 tiles
    (both spans <= 1, 4 rows each) while row-major buckets degenerate
    to full-span slices of the minor dimension."""
    import mahjong_etl_spark.plans.queries as Q

    grid = spark.createDataFrame(
        [(p, s) for p in range(16) for s in range(16)],
        "l_partkey long, l_suppkey long",
    )
    real_load = Q.load

    def fake_load(spark_, sf, table):
        return grid if table == "lineitem" else real_load(spark_, sf, table)

    monkeypatch.setattr(Q, "load", fake_load)
    rows = Q.lineitem_zorder_layout(spark, sf_dir).collect()
    z = [r for r in rows if r.strategy == "zorder"]
    rm = [r for r in rows if r.strategy == "rowmajor"]
    assert len(z) == 64 and len(rm) == 64
    assert all(r.n_rows == 4 for r in rows)
    # z-order: every 4-value bucket is a 2x2 hypercube
    assert all(r.part_span <= 1 and r.supp_span <= 1 for r in z)
    # row-major: locality only in the minor dimension
    assert all(r.part_span == 0 and r.supp_span == 3 for r in rm)
