"""Round-4 additions: negative sampling + triangle counting semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from mahjong_etl_spark.operators.corpus import NEG_K, corpus_negative_samples
from mahjong_etl_spark.plans.queries import graph_triangle_counts
from mahjong_etl_spark.sources.tables import load


def test_negative_samples_shape_and_ring(spark, sf_dir):
    docs_n = load(spark, sf_dir, "documents").count()
    negs = corpus_negative_samples(spark, sf_dir)
    rows = negs.collect()
    # exactly K negatives per anchor, never self, always in-range
    assert len(rows) == docs_n * NEG_K
    assert all(r.neg_doc_id != r.doc_id for r in rows)
    assert all(0 <= r.neg_doc_id < docs_n for r in rows)
    per_anchor = (
        negs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("k")).collect()
    )
    assert all(r.k == NEG_K for r in per_anchor)
    # deterministic across runs and partitioning
    again = {
        (r.doc_id, r.neg_rank, r.neg_doc_id)
        for r in corpus_negative_samples(spark, sf_dir).collect()
    }
    assert {(r.doc_id, r.neg_rank, r.neg_doc_id) for r in rows} == again


def test_triangle_counts_planted(spark, monkeypatch):
    # K4 on {1,2,3,4} (all 6 edges, each in 2 baskets to clear the
    # support threshold) plus a pendant edge (4,5): every K4 node sits
    # in C(3,2)=3 triangles; node 5 in none.
    import mahjong_etl_spark.plans.queries as Q

    baskets = []
    oid = 0
    for _ in range(2):  # support 2 per edge
        for x in range(1, 5):
            for y in range(x + 1, 5):
                baskets += [(oid, x), (oid, y)]
                oid += 1
        baskets += [(oid, 4), (oid, 5)]
        oid += 1
    li = spark.createDataFrame(baskets, ["l_orderkey", "l_partkey"])
    monkeypatch.setattr(Q, "load", lambda s, d, t: li)
    got = {(r.node, r.n_triangles) for r in graph_triangle_counts(spark, "x").collect()}
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}


def test_forget_cascade_audit(spark, sf_dir):
    from mahjong_etl_spark.operators.governance import (
        forget_keys,
        governance_forget_cascade,
    )

    rows = {r.tbl: r for r in governance_forget_cascade(spark, sf_dir).collect()}
    assert set(rows) == {"customer", "orders", "lineitem", "events"}
    # non-vacuous: the md5 bucket actually selects someone
    assert rows["customer"].n_deleted > 0
    # no orphans may survive the cascade, and the audit must have
    # actually computed them (orders/lineitem legs are real joins)
    assert all(r.n_orphans_after == 0 for r in rows.values())
    # independent recomputation of the orders leg
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    dk = {r.c_custkey for r in forget_keys(cust).collect()}
    n_del_orders = orders.where(F.col("o_custkey").isin(dk)).count()
    assert rows["orders"].n_deleted == n_del_orders
    assert rows["orders"].n_before == orders.count()


def test_sql_udf_dora_matches_python_codec(spark):
    from mahjong_etl_spark.functions.codec import next_dora
    from mahjong_etl_spark.plans.mahjong_queries import _NEXT_DORA_SQL_UDF

    spark.sql(_NEXT_DORA_SQL_UDF)
    got = spark.sql(
        "SELECT collect_list(next_dora(CAST(id AS BIGINT))) AS d "
        "FROM range(136)"
    ).collect()[0].d
    assert got == [next_dora(i) for i in range(136)]


def test_sql_udf_dora_query_full_agreement_and_jvm_plan(spark, sf_dir):
    from mahjong_etl_spark.plans.mahjong_queries import mahjong_sql_udf_dora

    df = mahjong_sql_udf_dora(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = df.collect()
    assert rows and all(r.n_match == r.n_indicators for r in rows)


def test_chunk_windows_cover_and_overlap(spark, sf_dir):
    from mahjong_etl_spark.operators.corpus import (
        WIN_O,
        WIN_W,
        corpus_chunk_windows,
    )

    docs = {r.doc_id: r.text.split(" ") for r in
            load(spark, sf_dir, "documents").collect()}
    chunks = corpus_chunk_windows(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    s = WIN_W - WIN_O
    for doc_id, rs in by_doc.items():
        toks = docs[doc_id]
        rs.sort(key=lambda r: r.chunk_id)
        # chunk text is exactly the claimed token span
        for r in rs:
            assert r.chunk_text.split(" ") == toks[r.start_tok : r.start_tok + r.n_toks]
        # stride and coverage: last chunk reaches the end of the doc
        assert rs[0].start_tok == 0
        assert all(b.start_tok - a.start_tok == s for a, b in zip(rs, rs[1:]))
        assert rs[-1].start_tok + rs[-1].n_toks == len(toks)
        # consecutive full chunks share exactly O tokens
        for a, b in zip(rs, rs[1:]):
            assert a.start_tok + a.n_toks - b.start_tok in (WIN_O, a.n_toks - s)
