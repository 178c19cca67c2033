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


def test_bucket_cap_bounds_mega_cluster(spark):
    """A boilerplate page duplicated 5000x lands every copy in the same
    LSH bucket.  With BUCKET_CAP the job must (a) complete with bounded
    per-bucket expansion — cap²/2 + (k − cap) pairs, NOT k²/2 ≈ 12.5M —
    and (b) still report the cluster fully connected through the
    bucket representative."""
    from mahjong_etl_spark.operators.dedup import (
        BUCKET_CAP,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    k = 5000
    docs = spark.range(k).selectExpr(
        "id AS doc_id",
        "'the quick brown fox jumps over the lazy dog again and again "
        "and then some more boilerplate text repeated verbatim' AS text",
    )

    pairs = minhash_lsh_pairs(docs)
    n_pairs = pairs.count()
    # bounded: far below the uncapped k²/2, at least the rep-links
    assert n_pairs >= k - 1, "cluster must stay connected via representative"
    assert n_pairs <= BANDS_UPPER_BOUND(k), f"pair expansion not bounded: {n_pairs}"

    # connectivity: union-find over the emitted pairs recovers ONE
    # cluster containing every doc
    parent = list(range(k))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.collect():
        ra, rb = find(int(r.doc_a)), find(int(r.doc_b))
        if ra != rb:
            parent[ra] = rb
    roots = {find(i) for i in range(k)}
    assert len(roots) == 1, f"cluster fragmented into {len(roots)} components"

    sim = simhash_pairs(docs)
    n_sim = sim.count()
    assert k - 1 <= n_sim <= BANDS_UPPER_BOUND(k)


def BANDS_UPPER_BOUND(k):
    # per bucket: cap²/2 in-bucket + (k-cap) rep links; 16 bands (or 4
    # simhash chunks) can each contribute, but pairs are distinct —
    # the loose bound below is still ~100x under the uncapped k²/2.
    from mahjong_etl_spark.operators.dedup import BUCKET_CAP

    return BUCKET_CAP * BUCKET_CAP // 2 + (k - BUCKET_CAP) + BUCKET_CAP * BUCKET_CAP


def test_hot_shingle_cap_drops_stop_shingle(spark):
    """Two docs whose ONLY shared shingle exceeds max_shingle_df must
    not pair through it — the documented exactness trade-off."""
    from mahjong_etl_spark.operators.dedup import ngram_jaccard_pairs

    # 30 docs all containing the hot shingle "aaa bbb ccc"; docs 0/1
    # share ONLY that shingle (rest of their text differs completely)
    rows = [(i, f"aaa bbb ccc unique{i} filler{i} words{i}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ngram_jaccard_pairs(docs, threshold=0.01, max_shingle_df=10)
    uncapped = ngram_jaccard_pairs(docs, threshold=0.01, max_shingle_df=None)
    assert capped.count() == 0, "hot shingle should be dropped by the df cap"
    assert uncapped.count() > 0, "without the cap the hot shingle pairs everything"


def test_decontaminate_flags_planted_overlap(spark):
    from mahjong_etl_spark.operators.corpus import decontaminate_pairs
    from mahjong_etl_spark.operators.dedup import shingle_sets

    eval_text = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (100, eval_text),  # the benchmark document
            # 4 shared trigrams (full prefix overlap)
            (1, "alpha beta gamma delta epsilon other words here"),
            # exactly 1 shared trigram -> below min_overlap=3
            (2, "alpha beta gamma unrelated tokens follow now"),
            # nothing shared
            (3, "totally different content with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    sh = shingle_sets(docs)
    got = {
        r.doc_id: r.n_overlap
        for r in decontaminate_pairs(
            sh.where("doc_id < 100"), sh.where("doc_id = 100"), min_overlap=3
        ).collect()
    }
    assert set(got) == {1} and got[1] == 3  # trigrams: a-b-g, b-g-d, g-d-e


def test_global_shuffle_is_stable_permutation(spark, sf_dir):
    from mahjong_etl_spark.operators.corpus import corpus_global_shuffle

    a = corpus_global_shuffle(spark, sf_dir).collect()
    b = corpus_global_shuffle(spark, sf_dir).collect()
    assert a == b  # deterministic across runs
    assert [r.shuffle_pos for r in a] == list(range(1, len(a) + 1))
    keys = [r.skey for r in a]
    assert keys == sorted(keys) and len(set(r.doc_id for r in a)) == len(a)


def test_repetition_fractions_hand_case(spark):
    from mahjong_etl_spark.operators import text_analysis

    docs = spark.createDataFrame(
        [
            (1, "x y x y x y"),  # 6 words, 2 distinct; 4 trigrams, 2 distinct
            (2, "a b"),  # shorter than a trigram
        ],
        "doc_id long, text string",
    )
    orig = text_analysis.load
    text_analysis.load = lambda *_a, **_k: docs
    try:
        got = {
            r.doc_id: r
            for r in text_analysis.text_repetition(spark, "ignored").collect()
        }
    finally:
        text_analysis.load = orig
    assert got[1].n_words == 6
    assert abs(got[1].word_dup_frac - (1 - 2 / 6)) < 1e-6
    assert abs(got[1].tri_dup_frac - (1 - 2 / 4)) < 1e-6
    assert got[2].tri_dup_frac == 0.0


def test_scrub_redacts_all_matches(spark):
    from mahjong_etl_spark.operators.text_analysis import PII_PATTERNS, scrub_col
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("call 555 1234 or mail a.b@c.de now",)], "t string"
    )
    row = df.select(
        scrub_col(F.col("t"), PII_PATTERNS["num"]).alias("num"),
        scrub_col(F.col("t"), PII_PATTERNS["email"], "<MAIL>").alias("mail"),
    ).first()
    assert row.num == "call <X> <X> or mail a.b@c.de now"
    assert row.mail == "call 555 1234 or mail <MAIL> now"


def test_text_ops_edge_cases(spark):
    """Empty / single-word / sub-trigram documents must not crash any
    shingle-based operator and must produce the documented degenerate
    values (empty shingle set, zero repetition)."""
    from mahjong_etl_spark.operators import text_analysis
    from mahjong_etl_spark.operators.dedup import shingle_sets

    docs = spark.createDataFrame(
        [(1, ""), (2, "word"), (3, "two words"), (4, "a b c")],
        "doc_id long, text string",
    )
    sh = {r.doc_id: r.shingles for r in shingle_sets(docs).collect()}
    assert sh[1] == [] and sh[2] == [] and sh[3] == []
    assert sh[4] == ["a b c"]

    orig = text_analysis.load
    text_analysis.load = lambda *_a, **_k: docs
    try:
        rep = {
            r.doc_id: r
            for r in text_analysis.text_repetition(spark, "ignored").collect()
        }
    finally:
        text_analysis.load = orig
    assert rep[1].tri_dup_frac == 0.0 and rep[2].tri_dup_frac == 0.0
    assert rep[4].word_dup_frac == 0.0


def test_session_caches_keyed_by_corpus(spark):
    """The session-scoped shingle/pairs/embedding caches are keyed by
    sf_dir: two corpora served in one session must not cross-serve."""
    from mahjong_etl_spark.operators.dedup import corpus_shingle_sets
    from mahjong_etl_spark.operators.similarity import corpus_embeddings

    # NB: documents.parquet happens to hold 500 rows at BOTH sf0.001
    # and sf0.01, so distinct cached OBJECTS (not row counts) prove the
    # keying.
    a = corpus_shingle_sets(spark, "/root/testdata/sf0.001")
    b = corpus_shingle_sets(spark, "/root/testdata/sf0.01")
    assert a is not b
    assert corpus_shingle_sets(spark, "/root/testdata/sf0.001") is a  # hit
    ea = corpus_embeddings(spark, "/root/testdata/sf0.001")
    eb = corpus_embeddings(spark, "/root/testdata/sf0.01")
    assert ea is not eb
    assert corpus_embeddings(spark, "/root/testdata/sf0.01") is eb  # hit


def test_rolling_mau_approx_tracks_exact(spark, sf_dir):
    """The HLL fallback must stay within 5% of the exact rolling
    distinct count on every observed day (default rsd is ~2.3%)."""
    from pyspark.sql import functions as F

    from mahjong_etl_spark.plans.registry import registry
    from mahjong_etl_spark.sources.tables import load

    approx = {
        r.day: r.mau_approx
        for r in registry()["events_rolling_mau_approx"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    e = load(spark, sf_dir, "events")
    user_days = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    observed = user_days.select(F.col("d").alias("anchor")).distinct()
    exact = {
        r.day: r.mau
        for r in user_days.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(29))).alias("o"),
            "d",
        )
        .select("user_id", F.date_add("d", F.col("o")).alias("anchor"))
        .join(observed, "anchor", "left_semi")
        .groupBy("anchor")
        .agg(F.countDistinct("user_id").alias("mau"))
        .select(F.date_format("anchor", "yyyy-MM-dd").alias("day"), "mau")
        .collect()
    }
    assert set(approx) == set(exact) and len(exact) > 0
    for day, est in approx.items():
        assert abs(est - exact[day]) / exact[day] <= 0.05, (day, est, exact[day])


def test_ann_ivf_int8_recall_and_agreement_with_float(spark, sf_dir):
    """The int8-rerank IVF path must (a) keep the same >=60% recall
    contract vs brute force and (b) agree with the float IVF result on
    >=80% of neighbor picks — int8 rounding error is far below the
    neighbor-separation margin at 64 dims."""
    from mahjong_etl_spark.operators.similarity import (
        similarity_ann_ivf,
        similarity_ann_ivf_int8,
    )

    exact = {
        (r.q_id, r.neighbor_id)
        for r in similarity_topk_bruteforce(spark, sf_dir).collect()
    }
    q8 = {
        (r.q_id, r.neighbor_id)
        for r in similarity_ann_ivf_int8(spark, sf_dir).collect()
    }
    fl = {
        (r.q_id, r.neighbor_id)
        for r in similarity_ann_ivf(spark, sf_dir).collect()
    }
    assert len(exact) > 0
    recall = len(q8 & exact) / len(exact)
    assert recall >= 0.6, f"int8 IVF recall too low: {recall}"
    agreement = len(q8 & fl) / len(fl)
    assert agreement >= 0.8, f"int8 vs float IVF agreement too low: {agreement}"


def test_semantic_dedup_precision_and_recall(spark, sf_dir):
    """SemDeDup contract: (a) perfect precision — every pair the op
    merges into one sem_group is connected through edges with exact
    cosine >= tau (verified transitively: each component member pairs
    with its representative via the exact O(n²) pair list's transitive
    closure — here checked as: all merged PAIRS appear in the exact
    closure); (b) bounded recall — pairs straddling a k-means cell
    boundary may be missed, but at test scale most planted dups
    co-cluster, so >= 50% of exact pairs must be merged; (c) exactly
    one keep=1 per sem_group."""
    from mahjong_etl_spark.operators.dedup import (
        dedup_embedding_cosine,
        dedup_semantic,
    )

    exact_pairs = {
        (r.vec_a, r.vec_b) for r in dedup_embedding_cosine(spark, sf_dir).collect()
    }
    rows = dedup_semantic(spark, sf_dir).collect()
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r.sem_group, []).append(r)

    # (c) one representative per group, and it is the smallest member
    for g, members in by_group.items():
        keeps = [r for r in members if r.keep == 1]
        assert len(keeps) == 1, f"group {g}: {len(keeps)} representatives"
        assert keeps[0].vec_id == min(r.vec_id for r in members) == g

    # transitive closure of the exact pair list, per component
    import itertools

    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in exact_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    closure_group = {}
    for a, b in exact_pairs:
        closure_group[a] = find(a)
        closure_group[b] = find(b)

    # (a) precision: merged pairs must lie inside one exact component
    merged_pairs = set()
    for g, members in by_group.items():
        ids = sorted(r.vec_id for r in members)
        merged_pairs.update(itertools.combinations(ids, 2))
    non_trivial = {p for p in merged_pairs}
    for a, b in non_trivial:
        assert closure_group.get(a) is not None and closure_group.get(a) == closure_group.get(b), (
            f"semantic dedup merged ({a},{b}) not connected in exact closure"
        )

    # (b) recall against the exact pair list
    assert len(exact_pairs) > 0
    merged = sum(1 for p in exact_pairs if p in merged_pairs)
    recall = merged / len(exact_pairs)
    assert recall >= 0.5, f"semantic dedup recall too low: {recall}"


def test_semantic_dedup_persisted_is_bit_identical(spark, sf_dir):
    """The persisted-quantizer variant must return EXACTLY the rows of
    the in-session variant: centroids are trained on the int64
    fixed-point grid and the chunked-binary parquet round-trip is the
    identity on float64 bytes, so any divergence is a persistence-layer
    bug, not float noise.  (This bit-exactness is also why both share
    one committed golden oracle.)"""
    from mahjong_etl_spark.operators.dedup import (
        dedup_semantic,
        dedup_semantic_persisted,
    )

    live = {tuple(r) for r in dedup_semantic(spark, sf_dir).collect()}
    persisted = {
        tuple(r) for r in dedup_semantic_persisted(spark, sf_dir).collect()
    }
    assert live == persisted and len(live) > 0


def test_embedding_pca_matches_exact_numpy(spark, sf_dir):
    """The distributed scatter-matrix PCA must reproduce the exact
    single-node spectrum: same eigenvalues (to float tolerance — the
    distributed partial sums reorder additions), monotone cum_evr, and
    the trace identity sum(evr) over ALL dims = 1 (checked on the
    top-k prefix as cum_evr[-1] <= 1 and equals sum of its evr)."""
    import numpy as np

    from mahjong_etl_spark.operators.similarity import (
        PCA_TOPK,
        embedding_pca,
    )

    rows = embedding_pca(spark, sf_dir).orderBy("component").collect()
    assert len(rows) == PCA_TOPK

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    mat = np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in emb])
    cov = np.cov(mat, rowvar=False, bias=True)  # population, as the op
    exact = np.linalg.eigvalsh(cov)[::-1]
    total = exact.sum()

    got = np.asarray([r.eigenvalue for r in rows])
    np.testing.assert_allclose(got, exact[:PCA_TOPK], rtol=1e-6, atol=1e-9)

    evr = np.asarray([r.evr for r in rows])
    cum = np.asarray([r.cum_evr for r in rows])
    np.testing.assert_allclose(evr, exact[:PCA_TOPK] / total, rtol=1e-6, atol=1e-9)
    assert np.all(np.diff(cum) >= -1e-12) and cum[-1] <= 1 + 1e-9
    np.testing.assert_allclose(cum[-1], evr.sum(), rtol=1e-6, atol=1e-9)


def test_ensemble_members_match_standalone_strategies(spark, sf_dir):
    """Every pair the ensemble attributes to a strategy must be exactly
    that standalone strategy's pair list (and vice versa) — the
    provenance column is a claim about the members, so pin it against
    them directly."""
    from mahjong_etl_spark.operators.dedup import (
        dedup_embedding_cosine,
        dedup_ensemble,
        dedup_ngram_jaccard,
        dedup_minhash_lsh,
        dedup_simhash,
    )

    rows = dedup_ensemble(spark, sf_dir).collect()
    by_src: dict[str, set] = {}
    for r in rows:
        assert r.n_strategies == len(r.strategies.split(","))
        for s in r.strategies.split(","):
            by_src.setdefault(s, set()).add((r.doc_a, r.doc_b))

    want = {
        "jaccard": {
            (r.doc_a, r.doc_b)
            for r in dedup_ngram_jaccard(spark, sf_dir).collect()
        },
        "minhash": {
            (r.doc_a, r.doc_b)
            for r in dedup_minhash_lsh(spark, sf_dir).collect()
        },
        "simhash": {
            (r.doc_a, r.doc_b) for r in dedup_simhash(spark, sf_dir).collect()
        },
        "embedding": {
            (r.vec_a, r.vec_b)
            for r in dedup_embedding_cosine(spark, sf_dir).collect()
        },
    }
    # exact member: derive the md5-identical pair set independently
    # (the synthetic corpora plant NEAR-dups, so this is usually empty
    # — the pin is set equality, not non-emptiness)
    import hashlib
    from collections import defaultdict

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    groups = defaultdict(list)
    for r in docs:
        groups[hashlib.md5(r.text.encode()).hexdigest()].append(r.doc_id)
    want["exact"] = {
        (a, b)
        for ids in groups.values()
        for i, a in enumerate(sorted(ids))
        for b in sorted(ids)[i + 1 :]
    }
    for src, pairs in want.items():
        assert by_src.get(src, set()) == pairs, f"{src} provenance mismatch"


def test_topic_clusters_conservation_and_determinism(spark, sf_dir):
    """Cluster profile invariants: every document with an embedding is
    counted exactly once (Σ n_docs = |docs ⋈ embeddings|), the dominant
    source count never exceeds the cell count, and two runs agree
    row-for-row (deterministic quantizer + deterministic tie-breaks)."""
    from mahjong_etl_spark.operators.similarity import corpus_topic_clusters

    a = {r.cluster: r for r in corpus_topic_clusters(spark, sf_dir).collect()}
    b = {r.cluster: r for r in corpus_topic_clusters(spark, sf_dir).collect()}
    assert a.keys() == b.keys() and all(a[k] == b[k] for k in a)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id")
    n = docs.join(emb, docs.doc_id == emb.vec_id).count()
    assert sum(r.n_docs for r in a.values()) == n
    for r in a.values():
        assert 0 < r.top_source_docs <= r.n_docs
        assert r.mean_chars > 0


def test_containment_catches_subset_jaccard_misses(spark):
    """A short passage quoted inside a much longer page: containment
    from the passage side ~1, Jaccard tiny.  The containment operator
    must flag the pair; the Jaccard operator at its 0.5 threshold must
    not — the asymmetric detector exists precisely for this case."""
    from mahjong_etl_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    passage = " ".join(f"tok{i}" for i in range(60))
    page = passage + " " + " ".join(f"fill{i}" for i in range(600))
    docs = spark.createDataFrame(
        [(1, passage), (2, page), (3, "totally unrelated words only here")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): (r.contain_a, r.contain_b)
        for r in containment_pairs(docs).collect()
    }
    assert set(got) == {(1, 2)}
    c_a, c_b = got[(1, 2)]
    assert c_a == 1.0 and c_b < 0.2
    jac = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs).collect()}
    assert (1, 2) not in jac


def test_ann_pq_recall(spark, sf_dir):
    """PQ-ADC + exact rerank must recover most of the brute-force
    top-k (same recall contract as the LSH/IVF variants), and the
    codes must be valid 4-bit indices."""
    from mahjong_etl_spark.operators.similarity import (
        N_QUERIES_PRED,
        PQ_KSUB,
        TOPK,
        corpus_embeddings,
        cosine_topk,
        pq_encode,
        similarity_ann_pq,
        train_pq_codebooks,
        with_norm,
    )

    e = corpus_embeddings(spark, sf_dir)
    exact = {
        (r.q_id, r.neighbor_id)
        for r in cosine_topk(e.where(N_QUERIES_PRED), e, TOPK).collect()
    }
    ann = {
        (r.q_id, r.neighbor_id)
        for r in similarity_ann_pq(spark, sf_dir).collect()
    }
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.6, f"PQ recall too low: {recall}"

    books = train_pq_codebooks(with_norm(e))
    codes = pq_encode(with_norm(e), books).collect()
    assert all(0 <= x < PQ_KSUB for r in codes for x in r.code)
    assert len(codes) == e.count()
