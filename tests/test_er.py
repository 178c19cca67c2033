"""Entity-resolution semantics on planted names (operators/er.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mahjong_etl_spark.operators.er import (
    LEV_T,
    er_resolve_entities,
    fuzzy_name_pairs,
)


@pytest.fixture(scope="module")
def planted_names(spark):
    # (p_name, n_parts, name_key, block) — hand-picked distances:
    #   "cold bolt" ~ "old bolt"  -> dist 1  (match)
    #   "blue bolt" ~ "old bolt"  -> dist 3  (match, at threshold)
    #   "blue bolt" ~ "cold bolt" -> dist 4  (NO match; linked only
    #                                 transitively through "old bolt")
    #   "small ring" vs bolts     -> different block, never a candidate
    rows = [
        ("cold bolt", 3, 10, "bolt"),
        ("old bolt", 2, 20, "bolt"),
        ("blue bolt", 5, 30, "bolt"),
        ("small ring", 4, 40, "ring"),
        ("smell ring", 1, 50, "ring"),
    ]
    return spark.createDataFrame(
        rows, ["p_name", "n_parts", "name_key", "block"]
    )


def test_fuzzy_pairs_planted(planted_names):
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_name_pairs(planted_names).collect()
    }
    assert got == {
        ("cold bolt", "old bolt", 1),
        ("blue bolt", "old bolt", 3),
        ("small ring", "smell ring", 1),
    }


def test_blocking_is_exact_candidate_cut(planted_names):
    # "hot bolt" / "cold bolt" at dist 4 > LEV_T: excluded by verify,
    # not by blocking; cross-block names never even become candidates.
    pairs = fuzzy_name_pairs(planted_names)
    assert pairs.where(F.col("dist") > LEV_T).count() == 0
    cross = pairs.where(
        (F.col("name_a").contains("ring")) != (F.col("name_b").contains("ring"))
    )
    assert cross.count() == 0


def test_resolve_entities_transitive(spark, sf_dir):
    # On the real corpus: every entity has >= 2 names (singletons are
    # implicitly kept out, as documented), ids are min member keys,
    # and record counts are positive.
    ents = er_resolve_entities(spark, sf_dir)
    rows = ents.collect()
    assert all(r.n_names >= 2 for r in rows)
    assert all(r.n_records >= r.n_names for r in rows)
    # deterministic across runs
    again = {tuple(r) for r in er_resolve_entities(spark, sf_dir).collect()}
    assert {tuple(r) for r in rows} == again
