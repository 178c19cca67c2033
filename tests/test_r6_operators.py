"""Round-6 operator tests: degree-oriented triangle counting."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mahjong_etl_spark.plans.queries import orient_edges_by_degree


def _undirected_triangle_counts(spark, edges):
    """Reference per-node triangle counts via the naive a<b<c
    three-way self-join (the pre-r6 formulation)."""
    e1 = edges.select(F.col("a").alias("a"), F.col("b").alias("b"))
    e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("a"), F.col("b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return {
        r.node: r.n
        for r in nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def _oriented_triangle_counts(spark, edges):
    """Per-node counts via the degree-oriented wedge enumeration,
    mirroring graph_triangle_counts' production plan."""
    o = orient_edges_by_degree(edges)
    w1 = o.select("src", F.col("dst").alias("v"), F.col("rk_dst").alias("rk_v"))
    w2 = o.select("src", F.col("dst").alias("w"), F.col("rk_dst").alias("rk_w"))
    wedges = w1.join(w2, "src").where(F.col("rk_v") < F.col("rk_w"))
    closure = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closure, ["v", "w"])
    nodes = (
        tri.select(F.col("src").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
    )
    return {
        r.node: r.n
        for r in nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_orientation_is_total_and_low_to_high(spark):
    """Every oriented edge must run lower-(degree, id) -> higher:
    the property that bounds out-degree at O(sqrt(E)) and makes the
    wedge join survive hub-skewed graphs."""
    rng = random.Random(7)
    raw = {tuple(sorted(rng.sample(range(1, 40), 2))) for _ in range(150)}
    edges = spark.createDataFrame(sorted(raw), "a long, b long")
    deg: dict[int, int] = {}
    for a, b in raw:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    rows = orient_edges_by_degree(edges).collect()
    assert len(rows) == len(raw)  # orientation is a bijection on edges
    for r in rows:
        assert (deg[r.src], r.src) < (deg[r.dst], r.dst)
        # struct rank, not a packed long: packing overflows/collides
        # at large node-id/degree scales (r6 review finding)
        assert (r.rk_dst.deg, r.rk_dst.node) == (deg[r.dst], r.dst)


def test_oriented_counts_match_naive_formulation(spark):
    """Per-node triangle counts are orientation-invariant: the
    degree-oriented plan must reproduce the naive three-way join's
    answer exactly, including on a hub-skewed graph (star + cliques)
    where the orientations differ most."""
    rng = random.Random(21)
    raw = {tuple(sorted(rng.sample(range(1, 30), 2))) for _ in range(120)}
    # plant a hub: node 0 connected to everything (max skew)
    raw |= {(0, v) for v in range(1, 30)}
    edges = spark.createDataFrame(sorted(raw), "a long, b long")
    assert _oriented_triangle_counts(spark, edges) == _undirected_triangle_counts(
        spark, edges
    )


def test_triangle_query_runs_on_sf0001(spark):
    from mahjong_etl_spark.plans.queries import graph_triangle_counts

    rows = graph_triangle_counts(spark, "/root/testdata/sf0.001").collect()
    assert all(r.n_triangles >= 1 for r in rows)


def test_ivf_index_roundtrip_bit_exact(spark, tmp_path):
    """write_ivf_index -> read_ivf_index must reproduce the trained
    centroid matrix bit-for-bit (the property that lets the persisted
    query share the fresh query's golden oracle) and postings must
    cover every corpus vector exactly once."""
    import numpy as np

    from mahjong_etl_spark.operators.similarity import (
        IVF_CLUSTERS,
        IVF_LLOYD_ITERS,
        corpus_centroids,
        corpus_embeddings,
        read_ivf_index,
        write_ivf_index,
    )

    sf = "/root/testdata/sf0.001"
    e = corpus_embeddings(spark, sf)
    cents = corpus_centroids(spark, sf, IVF_CLUSTERS, IVF_LLOYD_ITERS)
    path = str(tmp_path / "ivf")
    write_ivf_index(spark, e, path, centroids=cents)
    got, postings = read_ivf_index(spark, path)
    assert got.shape == cents.shape
    assert np.array_equal(got, cents)  # bit-exact, not allclose
    n = e.count()
    assert postings.count() == n
    assert postings.select("vec_id").distinct().count() == n
    k = postings.select("cluster").distinct().count()
    assert 1 <= k <= IVF_CLUSTERS


def test_pq_index_roundtrip_bit_exact(spark, tmp_path):
    import numpy as np

    from mahjong_etl_spark.operators.similarity import (
        corpus_embeddings,
        read_pq_index,
        train_pq_codebooks,
        write_pq_index,
    )

    sf = "/root/testdata/sf0.001"
    e = corpus_embeddings(spark, sf)
    books = train_pq_codebooks(e)
    path = str(tmp_path / "pq")
    write_pq_index(spark, e, path, books=books)
    got, codes = read_pq_index(spark, path)
    assert got.shape == books.shape
    assert np.array_equal(got, books)  # bit-exact
    n = e.count()
    assert codes.count() == n
    m = books.shape[0]
    lens = {len(r.code) for r in codes.limit(20).collect()}
    assert lens == {m}


# ---------------------------------------------------------------------------
# dq_column_profile: whole-table column profiler
# ---------------------------------------------------------------------------


def test_column_profile_single_scan_with_expand(spark):
    """The profiler must stay a ONE-scan plan: every per-column
    statistic (nulls, length min/max/sum) plus the five exact
    count(DISTINCT)s ride a single documents scan via Spark's expand
    rewrite — a refactor that profiles column-by-column (N scans)
    must fail here."""
    from mahjong_etl_spark.plans.registry import registry

    df = registry()["dq_column_profile"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") + plan.count("FileScan") <= 2, plan
    assert "Expand" in plan, "distinct stats should use the expand rewrite"


def test_column_profile_counts_nulls_and_all_null_columns(spark, tmp_path):
    """Null floods and even an all-NULL column must profile cleanly:
    n_nulls counts them, length stats and avg_len go NULL (never a
    crash or a zero-division Infinity)."""
    import pandas as pd

    from mahjong_etl_spark.plans.registry import registry

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["ab", None, "cdef", None],
            "lang": pd.array([None, None, None, None], dtype="string"),
            "source": ["s1", "s1", "s2", "s2"],
            "n_chars": [2, 0, 4, 0],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {
        r.col_name: r
        for r in registry()["dq_column_profile"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert rows["text"].n_nulls == 2
    assert rows["text"].n_distinct == 2
    assert (rows["text"].min_len, rows["text"].max_len) == (2, 4)
    assert rows["text"].avg_len == 3.0
    lang = rows["lang"]
    assert lang.n_nulls == 4 and lang.n_distinct == 0
    assert lang.min_len is None and lang.max_len is None
    assert lang.avg_len is None
    assert rows["doc_id"].n_rows == 4 and rows["doc_id"].n_nulls == 0


# ---------------------------------------------------------------------------
# Plan pins for the round-6 SQL-surface queries
# ---------------------------------------------------------------------------


def test_bigram_lm_has_no_window_node(spark):
    """Bigram pairing must stay a shuffle-free array transform inside
    the row (Generate/explode), never a per-doc window sort — a
    refactor to lead()-over-window reintroduces a full shuffle+sort of
    the token stream and must fail here."""
    from mahjong_etl_spark.plans.registry import registry

    plan = (
        registry()["text_bigram_lm_scores"]
        .spark_fn(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "Generate" in plan  # the explode of the transform()


def test_bom_recursion_runs_in_engine(spark):
    """WITH RECURSIVE must lower to the engine's iterative union
    operator (UnionLoop), not to driver-side iteration; and the rollup
    must agree with a hand-unrolled chain walk."""
    from mahjong_etl_spark.plans.registry import registry

    df = registry()["part_bom_recursive"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "UnionLoop" in plan
    rows = {r.start_pk: r for r in df.collect()}
    assert rows, "no chains found"
    # hand-unroll one chain: start -> start//4 -> ... -> <4
    start = max(rows)
    chain = [start]
    while chain[-1] >= 4:
        chain.append(chain[-1] // 4)
    assert rows[start].n_nodes == len(chain)
    assert rows[start].levels == len(chain) - 1
