"""SCD1/SCD2 CDC operator semantics (operators/cdc.py)."""

from __future__ import annotations

from mahjong_etl_spark.operators.cdc import apply_changes, scd2_history


def test_apply_changes_upsert_delete_untouched(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "name", "v"]
    )
    changes = spark.createDataFrame(
        [(2, "upsert", "b2", 99), (3, "delete", None, None)],
        ["k", "op", "name", "v"],
    )
    out = {r.k: (r.name, r.v) for r in apply_changes(base, changes, "k").collect()}
    assert out == {1: ("a", 10), 2: ("b2", 99)}  # 3 deleted, 2 replaced, 1 kept


def test_apply_changes_insert_new_key(spark):
    base = spark.createDataFrame([(1, "a")], ["k", "name"])
    changes = spark.createDataFrame([(7, "upsert", "new")], ["k", "op", "name"])
    out = sorted(
        (r.k, r.name) for r in apply_changes(base, changes, "k").collect()
    )
    assert out == [(1, "a"), (7, "new")]


def test_scd2_history_intervals(spark):
    versioned = spark.createDataFrame(
        [(1, 1, "x"), (1, 5, "y"), (1, 9, "z"), (2, 3, "only")],
        ["k", "ver", "attr"],
    )
    rows = {
        (r.k, r.ver): (r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(versioned, "k", "ver").collect()
    }
    assert rows[(1, 1)] == (1, 5, 0)
    assert rows[(1, 5)] == (5, 9, 0)
    assert rows[(1, 9)] == (9, None, 1)
    assert rows[(2, 3)] == (3, None, 1)


def test_scd2_exactly_one_current_per_key(spark, sf_dir):
    from mahjong_etl_spark.plans.registry import registry

    df = registry()["cdc_orders_scd2"].spark_fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_current == 1
        assert r.n_closed == r.n_versions - 1


def test_apply_changes_plan_single_pass(spark, sf_dir):
    """Merge plan shape: anti join + union — no cartesian, no extra
    scans of the base beyond the two branches."""
    from mahjong_etl_spark.plans.registry import registry

    df = registry()["cdc_customer_upsert"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert "LeftAnti" in plan
