"""Plan-shape pins for the round-4 operators (same contract as
tests/test_plans.py: shape regressions fail CI, not benchmarks)."""

from __future__ import annotations

import pytest

from mahjong_etl_spark.plans.registry import registry

from .test_plans import plan_of


@pytest.fixture(scope="module")
def reg():
    return registry()


def _run(reg, name, spark, sf_dir):
    return reg[name].spark_fn(spark, sf_dir)


def test_er_pairs_verify_inside_join_no_cartesian(reg, spark, sf_dir):
    plan = plan_of(_run(reg, "er_fuzzy_name_pairs", spark, sf_dir))
    # candidate generation is an equi-join on the block key; the
    # levenshtein verify must NOT appear as a post-join Filter of a
    # cartesian/nested-loop product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan.lower()
    # distinct-name collapse is a two-phase aggregate
    assert "partial_" in plan


def test_bloom_prune_is_mapside_before_join(reg, spark, sf_dir):
    plan = plan_of(_run(reg, "bloom_pruned_revenue", spark, sf_dir))
    # the membership test is an Arrow-batched eval, never row-at-a-time
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
    # pruning happens on the scan side: the python eval must sit below
    # the join in the plan tree (appears after the join operator line
    # in top-down toString output)
    join_pos = min(
        p for p in (plan.find("Join"), len(plan)) if p >= 0
    )
    assert plan.find("ArrowEvalPython") > join_pos
    # lineitem scan reads only the two referenced columns
    tail = plan.split("ReadSchema")[-1]
    assert "l_comment" not in tail and "l_shipdate" not in tail


def test_classifier_eval_is_jvm_side(reg, spark, sf_dir):
    plan = plan_of(_run(reg, "classifier_train_eval", spark, sf_dir))
    # scoring with quantized weights is pure JVM expression work — the
    # Python training loop must leave no Python eval in the SCORING plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_negative_samples_single_hydration_shuffle(reg, spark, sf_dir):
    plan = plan_of(_run(reg, "corpus_negative_samples", spark, sf_dir))
    # the md5 ring is per-row expression work; no Python anywhere
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_triangles_all_equijoins(reg, spark, sf_dir):
    plan = plan_of(_run(reg, "graph_triangle_counts", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # top-k must not globally sort
    assert "TakeOrderedAndProject" in plan


def test_bpe_doc_tokens_join_not_fold(reg, spark, sf_dir):
    plan = plan_of(_run(reg, "text_bpe_doc_tokens", spark, sf_dir))
    # corpus tokenization is a word-table JOIN; the per-word merge fold
    # ran inside training and must not appear in this corpus-scale plan
    assert "aggregate(syms" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2
