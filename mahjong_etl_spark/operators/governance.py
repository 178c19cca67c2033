"""Data-governance operators: right-to-be-forgotten delete cascade.

A 100 TB training-data platform must honor deletion requests (GDPR
art. 17 / CCPA): removing a user means removing their customer row,
their orders, those orders' line items, and their event stream —
atomically enough that no orphan survives for the next training run.
The reference delegates storage to partitioned parquet on object
storage (SURVEY §1.4); there, forget-requests are implemented exactly
like this: anti-join each table against the delete-key list and
rewrite.

Plan shape: the delete list is a key list (bounded by the request
queue, ≪ fact scale) — every deletion is a broadcast-capable
LEFT ANTI join, every audit count a one-pass aggregate, and the
orphan checks re-verify referential integrity on the POST state (the
same key-list-vs-key-list discipline as dq_constraint_suite — never
fact × fact).  At cluster scale the per-table rewrite rides the
partitioned sink (plans/etl.py) / compaction (plans/compaction.py)
machinery; this operator is the pure computation + audit layer.

The delete list itself is md5-bucketed (engine-portable, deterministic
— the same idiom as deterministic_split), standing in for an external
request queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load

FORGET_HEX_CUTOFF = "08"  # first 2 md5 hex chars < '08' => ~3.1% of users


def forget_keys(customer: DataFrame) -> DataFrame:
    """The deterministic delete-request list (c_custkey rows)."""
    bucket = F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 2)
    return customer.where(bucket < FORGET_HEX_CUTOFF).select("c_custkey")


@query(
    "governance_forget_cascade",
    oracle=f"""
    WITH del AS (
        SELECT c_custkey FROM customer
        WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 2)
              < '{FORGET_HEX_CUTOFF}'
    ),
    del_orders AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM del)
    )
    SELECT 'customer' AS tbl,
           (SELECT count(*) FROM customer) AS n_before,
           (SELECT count(*) FROM del) AS n_deleted,
           CAST(0 AS BIGINT) AS n_orphans_after
    UNION ALL
    SELECT 'orders',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM del_orders),
           (SELECT count(*) FROM orders
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del_orders)
              AND o_custkey IN (SELECT c_custkey FROM del))
    UNION ALL
    SELECT 'lineitem',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)),
           -- dangling-FK audit: remaining line items whose order no
           -- longer exists in the post-delete orders table
           (SELECT count(*) FROM lineitem
            WHERE l_orderkey NOT IN (SELECT o_orderkey FROM del_orders)
              AND l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                     WHERE o_orderkey NOT IN
                                           (SELECT o_orderkey FROM del_orders)))
    UNION ALL
    SELECT 'events',
           (SELECT count(*) FROM events),
           (SELECT count(*) FROM events
            WHERE user_id IN (SELECT c_custkey FROM del)),
           CAST(0 AS BIGINT)
    """,
)
def governance_forget_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit of the full forget cascade: per table, rows before, rows
    the cascade deletes, and orphans REMAINING after the cascade
    (referential-integrity proof — always 0, computed, not assumed).
    The events leg deletes on user_id (the event stream's subject key,
    a subset of the customer key space in this corpus)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    events = load(spark, sf_dir, "events")

    del_keys = forget_keys(customer)
    del_orders = orders.join(
        del_keys, orders.o_custkey == del_keys.c_custkey, "left_semi"
    ).select("o_orderkey")

    post_orders = orders.join(
        del_orders, "o_orderkey", "left_anti"
    )
    orders_orphans = post_orders.join(
        del_keys, post_orders.o_custkey == del_keys.c_custkey, "left_semi"
    )
    li_deleted = lineitem.join(del_orders, lineitem.l_orderkey == del_orders.o_orderkey, "left_semi")
    post_li = lineitem.join(
        del_orders, lineitem.l_orderkey == del_orders.o_orderkey, "left_anti"
    )
    # dangling-FK audit: remaining line items with no surviving order
    li_orphans = post_li.join(
        post_orders.select("o_orderkey"),
        post_li.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    )
    ev_deleted = events.join(
        del_keys, events.user_id == del_keys.c_custkey, "left_semi"
    )

    def row(tbl, before_df, deleted_df, orphans_df):
        b = before_df.agg(F.count(F.lit(1)).alias("n_before"))
        d = deleted_df.agg(F.count(F.lit(1)).alias("n_deleted"))
        if orphans_df is None:
            o = spark.range(1).select(F.lit(0).cast("long").alias("n_orphans_after"))
        else:
            o = orphans_df.agg(F.count(F.lit(1)).alias("n_orphans_after"))
        return (
            b.crossJoin(d)
            .crossJoin(o)
            .select(
                F.lit(tbl).alias("tbl"),
                "n_before",
                "n_deleted",
                "n_orphans_after",
            )
        )

    return (
        row("customer", customer, del_keys, None)
        .unionByName(row("orders", orders, del_orders, orders_orphans))
        .unionByName(row("lineitem", lineitem, li_deleted, li_orphans))
        .unionByName(row("events", events, ev_deleted, None))
    )
