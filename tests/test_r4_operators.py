"""Semantics pins for the round-4 operators: sub-document chunk
dedup, unigram entropy, int8 quantization, JSONL round-trip, and the
Q12/Q21 adaptations.  The strict_sweep/driver oracle proves engine
parity; these tests pin the MEANING on hand-built inputs where the
right answer is knowable by inspection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# corpus_chunk_dedup
# ---------------------------------------------------------------------------


def _chunk_dedup_on(spark, rows):
    """Run the chunk-dedup pipeline body on an in-memory documents df."""
    from mahjong_etl_spark.operators import corpus as C

    df = spark.createDataFrame(rows, "doc_id long, text string")
    w = C.CHUNK_W
    chunk_arr = F.expr(
        f"""
        transform(
            sequence(0, cast(ceil(size(split(text, ' ')) / {w}.0) as int) - 1),
            i -> concat_ws(' ', slice(split(text, ' '), i * {w} + 1, {w})))
        """
    )
    chunks = df.select("doc_id", F.posexplode(chunk_arr).alias("ci", "chunk"))
    hot = (
        chunks.groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("chunk")
    )
    kept = chunks.join(hot, "chunk", "left_anti")
    return {
        (r.doc_id, r.ci): r.chunk
        for r in kept.collect()
    }


def test_chunk_dedup_drops_cross_doc_boilerplate_keeps_unique(spark):
    boiler = " ".join(f"b{i}" for i in range(10))  # exactly one chunk
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"c{i}" for i in range(10))
    rows = [
        (1, boiler + " " + uniq_a),
        (2, boiler + " " + uniq_b),
        (3, uniq_a),  # same text as doc 1's tail -> also cross-doc hot
    ]
    kept = _chunk_dedup_on(spark, rows)
    texts = set(kept.values())
    # the shared boilerplate chunk is gone everywhere
    assert boiler not in texts
    # uniq_a appears in docs 1 and 3 -> cross-document -> dropped too
    assert uniq_a not in texts
    # uniq_b survives, in doc 2 at chunk index 1
    assert kept == {(2, 1): uniq_b}


def test_chunk_dedup_within_doc_repeat_is_not_dropped(spark):
    """Repetition INSIDE one document is text_repetition's signal, not
    chunk dedup's: hotness requires >= 2 distinct documents."""
    chunk = " ".join(f"x{i}" for i in range(10))
    rows = [(1, chunk + " " + chunk)]
    kept = _chunk_dedup_on(spark, rows)
    assert kept == {(1, 0): chunk, (1, 1): chunk}


def test_chunk_dedup_registry_query_reassembly_is_exact(spark, sf_dir):
    """cleaned_md5 over the sf0.001 corpus matches a driver-side
    recomputation from first principles (token slice -> filter -> join)."""
    from mahjong_etl_spark.operators.corpus import CHUNK_W, corpus_chunk_dedup
    from mahjong_etl_spark.sources.tables import load
    import hashlib
    from collections import Counter

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load(spark, sf_dir, "documents").collect()
    }
    chunks = {
        d: [
            " ".join(t[i : i + CHUNK_W])
            for i in range(0, len(t), CHUNK_W)
        ]
        for d, t in docs.items()
    }
    in_docs = Counter()
    for d, cs in chunks.items():
        for c in set(cs):
            in_docs[c] += 1
    expected = {}
    for d, cs in chunks.items():
        keptc = [c for c in cs if in_docs[c] < 2]
        if keptc:
            expected[d] = (
                len(cs),
                len(keptc),
                hashlib.md5(" ".join(keptc).encode()).hexdigest(),
            )
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.cleaned_md5)
        for r in corpus_chunk_dedup(spark, sf_dir).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# text_unigram_entropy
# ---------------------------------------------------------------------------


def test_unigram_entropy_hand_case(spark, tmp_path):
    """'a a b b' -> H = 1 bit; 'a a a a' -> 0 bits; 'a b c d' -> 2."""
    import pandas as pd

    p = str(tmp_path / "documents.parquet")
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a a b b", "a a a a", "a b c d"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [7, 7, 7],
        }
    ).to_parquet(p)
    from mahjong_etl_spark.operators.text_analysis import text_unigram_entropy

    out = {
        r.doc_id: (r.n_tokens, r.n_types, r.ttr, r.entropy_bits)
        for r in text_unigram_entropy(spark, str(tmp_path)).collect()
    }
    assert out[1] == (4, 2, 0.5, 1.0)
    assert out[2] == (4, 1, 0.25, 0.0)
    assert out[3] == (4, 4, 1.0, 2.0)


def test_unigram_entropy_bounds(spark, sf_dir):
    """0 <= H <= log2(n_tokens), and H <= log2(n_types) exactly."""
    from mahjong_etl_spark.operators.text_analysis import text_unigram_entropy

    for r in text_unigram_entropy(spark, sf_dir).collect():
        assert 0.0 <= r.entropy_bits <= math.log2(r.n_types) + 1e-6
        assert r.n_types <= r.n_tokens


# ---------------------------------------------------------------------------
# embedding_quantize_int8
# ---------------------------------------------------------------------------


def test_quantize_int8_error_bounds_and_scale(spark, sf_dir):
    """Reconstruction error of symmetric round-to-nearest is bounded by
    scale/2 per dimension — verify through the fixed-point outputs."""
    from mahjong_etl_spark.operators.similarity import embedding_quantize_int8

    rows = embedding_quantize_int8(spark, sf_dir).collect()
    assert rows
    for r in rows:
        scale = r.scale_nano / 1e9
        # per-dim |err| <= scale/2 (+ fixed-point rounding slack)
        assert r.max_err_nano <= scale / 2 * 1e9 + 1
        # mean squared error can't beat the best-case uniform bound by
        # orders of magnitude or exceed the worst case
        assert 0 <= r.sse_pico <= r.n_dims * ((scale / 2) ** 2) * 1e12 + r.n_dims


def test_quantize_int8_hand_case(spark, tmp_path):
    import pandas as pd

    p = str(tmp_path / "embeddings.parquet")
    pd.DataFrame(
        {
            "vec_id": [1],
            "embedding": [[127.0, -127.0, 63.5]],
            "label": [0],
        }
    ).to_parquet(p)
    from mahjong_etl_spark.operators.similarity import embedding_quantize_int8

    r = embedding_quantize_int8(spark, str(tmp_path)).collect()[0]
    # scale = 127/127 = 1.0; q = [127, -127, 64]; err = [0, 0, -0.5]
    assert r.scale_nano == 1_000_000_000
    assert r.n_dims == 3
    assert r.sse_pico == int(0.25 * 1e12)
    assert r.max_err_nano == int(0.5 * 1e9)


# ---------------------------------------------------------------------------
# jsonl round-trip
# ---------------------------------------------------------------------------


def test_jsonl_roundtrip_matches_direct_aggregate(spark, sf_dir):
    """The JSONL write->read->aggregate equals aggregating the parquet
    directly — value-exactness of the sink/source pair."""
    from mahjong_etl_spark.plans.queries import jsonl_roundtrip_stats
    from mahjong_etl_spark.sources.tables import load

    via_json = {
        r.day: (r.n_purchases, r.total_value)
        for r in jsonl_roundtrip_stats(spark, sf_dir).collect()
    }
    direct = {
        r.day: (r.n, r.tv)
        for r in (
            load(spark, sf_dir, "events")
            .where(F.col("event_type") == "purchase")
            .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                (
                    F.sum(F.round(F.col("value") * 1000).cast("long")).cast(
                        "double"
                    )
                    / F.lit(1000.0)
                ).alias("tv"),
            )
            .collect()
        )
    }
    assert via_json == direct


# ---------------------------------------------------------------------------
# Q12 / Q21 adaptations
# ---------------------------------------------------------------------------


def test_q21_aggregate_rewrite_equals_literal_exists(spark, sf_dir):
    """The Spark-side single-aggregation rewrite must equal the literal
    correlated EXISTS/NOT-EXISTS formulation computed naively."""
    from mahjong_etl_spark.plans.queries import q21_waiting_suppliers
    from mahjong_etl_spark.sources.tables import load

    got = {(r.s_name, r.numwait) for r in q21_waiting_suppliers(spark, sf_dir).collect()}

    l = load(spark, sf_dir, "lineitem").collect()
    o = {
        r.o_orderkey: r.o_orderdate
        for r in load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .collect()
    }
    s_name = {
        r.s_suppkey: r.s_name for r in load(spark, sf_dir, "supplier").collect()
    }
    import datetime
    from collections import defaultdict

    by_order = defaultdict(list)
    for r in l:
        if r.l_orderkey in o:
            late = r.l_shipdate.date() > (
                o[r.l_orderkey].date() + datetime.timedelta(days=60)
            )
            by_order[r.l_orderkey].append((r.l_suppkey, late))
    numwait = defaultdict(int)
    for ok, lines in by_order.items():
        supps = {s for s, _ in lines}
        late_supps = {s for s, late in lines if late}
        for supp, late in lines:
            if (
                late
                and len(supps - {supp}) > 0
                and not (late_supps - {supp})
            ):
                numwait[s_name[supp]] += 1
    expected = set(
        sorted(numwait.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    )
    assert got == expected


# ---------------------------------------------------------------------------
# text_perplexity_proxy
# ---------------------------------------------------------------------------


def test_perplexity_proxy_hand_case(spark, tmp_path):
    """Corpus 'a a a b' (one doc) -> tf(a)=3, tf(b)=1, T=4.
    H = log2(4) - (3*log2(3) + 1*log2(1))/4 = 2 - 3*1.5849625007/4."""
    import pandas as pd

    p = str(tmp_path / "documents.parquet")
    pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["a a a b"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [7],
        }
    ).to_parquet(p)
    from mahjong_etl_spark.operators.text_analysis import text_perplexity_proxy

    r = text_perplexity_proxy(spark, str(tmp_path)).collect()[0]
    expected = round(2.0 - 3 * math.log2(3) / 4, 6)
    assert r.n_tokens == 4
    assert abs(r.cross_entropy_bits - expected) < 1e-9


def test_perplexity_global_vs_local_entropy(spark, sf_dir):
    """Cross-entropy under the global LM >= the doc's own entropy
    (Gibbs' inequality), up to rounding slack."""
    from mahjong_etl_spark.operators.text_analysis import (
        text_perplexity_proxy,
        text_unigram_entropy,
    )

    xent = {
        r.doc_id: r.cross_entropy_bits
        for r in text_perplexity_proxy(spark, sf_dir).collect()
    }
    ent = {
        r.doc_id: r.entropy_bits
        for r in text_unigram_entropy(spark, sf_dir).collect()
    }
    assert set(xent) == set(ent)
    for d in xent:
        assert xent[d] >= ent[d] - 1e-4


# ---------------------------------------------------------------------------
# corpus_source_quota
# ---------------------------------------------------------------------------


def test_source_quota_caps_and_determinism(spark, sf_dir):
    from mahjong_etl_spark.operators.corpus import (
        QUOTA_PER_SOURCE,
        corpus_source_quota,
    )
    from mahjong_etl_spark.sources.tables import load

    out1 = {r.source: (r.n_kept, r.kept_chars, r.first_doc_id)
            for r in corpus_source_quota(spark, sf_dir).collect()}
    out2 = {r.source: (r.n_kept, r.kept_chars, r.first_doc_id)
            for r in corpus_source_quota(spark, sf_dir).collect()}
    assert out1 == out2  # lottery is deterministic
    totals = {
        r.source: r.n
        for r in load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for src, (kept, _, _) in out1.items():
        assert kept == min(QUOTA_PER_SOURCE, totals[src])


def test_source_quota_growth_stable(spark, tmp_path):
    """Adding documents must not change which EXISTING docs win while
    the quota is not exceeded (the salted-hash order is global)."""
    import pandas as pd
    from mahjong_etl_spark.operators.corpus import corpus_source_quota

    base = pd.DataFrame(
        {
            "doc_id": range(10),
            "text": ["x"] * 10,
            "lang": ["en"] * 10,
            "source": ["s"] * 10,
            "n_chars": [1] * 10,
        }
    )
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir()
    d2.mkdir()
    base.to_parquet(str(d1 / "documents.parquet"))
    pd.concat(
        [base, base.assign(doc_id=lambda f: f.doc_id + 1000)]
    ).to_parquet(str(d2 / "documents.parquet"))
    r1 = corpus_source_quota(spark, str(d1)).collect()
    r2 = corpus_source_quota(spark, str(d2)).collect()
    # 20 docs < quota 40: everything kept in both runs; the rank-1
    # winner among the original 10 can only change if a NEW doc wins
    k1 = {r.source: r.first_doc_id for r in r1}
    k2 = {r.source: r.first_doc_id for r in r2}
    for src in k1:
        assert k2[src] == k1[src] or k2[src] >= 1000


# ---------------------------------------------------------------------------
# dedup_incremental
# ---------------------------------------------------------------------------


def test_dedup_incremental_labels(spark, tmp_path):
    import pandas as pd
    from mahjong_etl_spark.operators.corpus import (
        INCR_SPLIT_ID,
        dedup_incremental,
    )

    s = INCR_SPLIT_ID
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, s + 0, s + 1, s + 2, s + 3],
            "text": [
                "old text one",
                "old text two",
                "OLD TEXT ONE  ",   # normalized dup of corpus doc 1
                "brand new",
                "brand new",        # dup within batch (keeps s+1)
                "also new",
            ],
            "lang": ["en"] * 6,
            "source": ["s"] * 6,
            "n_chars": [1] * 6,
        }
    )
    rows.to_parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r.status
        for r in dedup_incremental(spark, str(tmp_path)).collect()
    }
    assert out == {
        s + 0: "dup_of_corpus",
        s + 1: "new",
        s + 2: "dup_in_batch",
        s + 3: "new",
    }


# ---------------------------------------------------------------------------
# events_hourly_gapfill
# ---------------------------------------------------------------------------


def test_gapfill_emits_zero_rows_for_missing_hours(spark, tmp_path):
    """Three events at hours {0, 3} -> spine 0..3, hours 1-2 emitted
    as explicit zeros flagged is_gap=1.  (The sf0.01 corpus is dense,
    so the oracle hash-match there pins spine==rollup equivalence but
    never exercises an actual hole — this does.)"""
    import pandas as pd

    pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 00:10:00", "2024-01-01 00:50:00",
                 "2024-01-01 03:30:00"]
            ).astype("datetime64[us]"),
            "user_id": [1, 2, 1],
            "event_type": ["view"] * 3,
            "value": [1.5, 2.25, 3.0],
            "props": ["{}"] * 3,
        }
    ).to_parquet(str(tmp_path / "events.parquet"))
    from mahjong_etl_spark.plans.queries import events_hourly_gapfill

    rows = {
        r.hour: (r.n_events, r.total_value, r.is_gap)
        for r in events_hourly_gapfill(spark, str(tmp_path)).collect()
    }
    assert rows == {
        "2024-01-01 00:00": (2, 3.75, 0),
        "2024-01-01 01:00": (0, 0.0, 1),
        "2024-01-01 02:00": (0, 0.0, 1),
        "2024-01-01 03:00": (1, 3.0, 0),
    }


# ---------------------------------------------------------------------------
# sketch probes: CMS heavy hitters, HLL distinct merge
# ---------------------------------------------------------------------------


def test_cms_one_sided_error_contract(spark, sf_dir):
    """Count-min never underestimates, and overestimates by at most
    eps * N with the configured confidence."""
    from mahjong_etl_spark.plans.queries import (
        CMS_EPS,
        events_heavy_hitters_cms,
    )
    from mahjong_etl_spark.sources.tables import load

    n_total = load(spark, sf_dir, "events").count()
    rows = events_heavy_hitters_cms(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.cms_estimate >= r.exact
        assert r.cms_estimate <= r.exact + CMS_EPS * n_total + 1


def test_hll_sketch_merge_accuracy_and_naive_sum_overcount(spark, sf_dir):
    from mahjong_etl_spark.plans.queries import events_distinct_sketch_merge

    r = events_distinct_sketch_merge(spark, sf_dir).collect()[0]
    assert abs(r.sketch_distinct - r.exact_distinct) <= 0.05 * r.exact_distinct
    # the naive per-day sum must overcount (repeat users across days),
    # otherwise this corpus wouldn't demonstrate why sketches exist
    assert r.sum_daily_exact > r.exact_distinct


# ---------------------------------------------------------------------------
# schema evolution (load_evolving)
# ---------------------------------------------------------------------------


def test_load_evolving_added_column_null_fills_old_files(spark, tmp_path):
    """A column added in a later batch reads as NULL for earlier
    files, and queries over the union stay total."""
    import pandas as pd
    from pyspark.sql import functions as F
    from mahjong_etl_spark.sources.tables import load_evolving

    v1 = str(tmp_path / "batch1")
    v2 = str(tmp_path / "batch2")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"]})
    ).write.parquet(v1)
    spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [3], "text": ["c"], "quality_score": [0.9]}
        )
    ).write.parquet(v2)

    df = load_evolving(spark, v1, v2)
    assert set(df.columns) == {"doc_id", "text", "quality_score"}
    rows = {r.doc_id: r.quality_score for r in df.collect()}
    assert rows[1] is None and rows[2] is None and rows[3] == 0.9
    # aggregates stay total: null-aware avg sees only the new batch
    avg = df.agg(F.avg("quality_score")).collect()[0][0]
    assert abs(avg - 0.9) < 1e-9


def test_load_evolving_prunes_added_column_for_old_queries(spark, tmp_path):
    """A query touching only v1 columns must not read the added column
    (ReadSchema stays pruned)."""
    import pandas as pd
    from mahjong_etl_spark.sources.tables import load_evolving

    v1 = str(tmp_path / "b1")
    v2 = str(tmp_path / "b2")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a"]})
    ).write.parquet(v1)
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [2], "text": ["b"], "extra": [1.0]})
    ).write.parquet(v2)
    df = load_evolving(spark, v1, v2).select("doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    read = plan.split("ReadSchema")[-1]
    assert "extra" not in read and "text" not in read
