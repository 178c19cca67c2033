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

    # r14 single-pass rewrite (guide "aggregate before you shuffle" /
    # one scan per fact table): the before-plan ran every semi/anti
    # audit as its own subtree — 12 one-row aggregates, customer
    # scanned twice, orders four times, lineitem three times (plans/
    # r14/governance_forget_cascade_before.txt).  Each delete/orphan
    # membership is now a LEFT join against the (unique-keyed) delete
    # list that marks rows instead of filtering them, and each table's
    # three counters come out of ONE whole-row aggregate.  The marker
    # joins are the same joins the cascade's rewrite pass performs, so
    # the orphan audits stay COMPUTED (through the same two relations
    # as before: the delete-key list and the deleted-order list) —
    # they are not folded to constants.  The two delete lists are
    # key-only and request-bounded, so they materialize once
    # (localCheckpoint) and broadcast into every marker join.
    del_keys = forget_keys(customer).localCheckpoint()
    del_orders = (
        orders.join(
            del_keys, orders.o_custkey == del_keys.c_custkey, "left_semi"
        )
        .select("o_orderkey")
        .localCheckpoint()
    )
    dk = F.broadcast(del_keys.withColumn("f_dc", F.lit(1)))
    do = F.broadcast(del_orders.withColumn("f_do", F.lit(1)))

    cust_row = (
        customer.join(dk, "c_custkey", "left")
        .agg(
            F.lit("customer").alias("tbl"),
            F.count(F.lit(1)).alias("n_before"),
            F.count(F.when(F.col("f_dc").isNotNull(), 1)).alias("n_deleted"),
        )
        .withColumn("n_orphans_after", F.lit(0).cast("long"))
    )
    orders_row = (
        orders.join(do, "o_orderkey", "left")
        .join(dk, orders.o_custkey == F.col("c_custkey"), "left")
        .agg(
            F.lit("orders").alias("tbl"),
            F.count(F.lit(1)).alias("n_before"),
            F.count(F.when(F.col("f_do").isNotNull(), 1)).alias("n_deleted"),
            # orphan: survives the order delete yet belongs to a
            # deleted customer — same two relations as the r13 shape
            F.count(
                F.when(F.col("f_do").isNull() & F.col("f_dc").isNotNull(), 1)
            ).alias("n_orphans_after"),
        )
    )
    # one key+flag relation carries both lineitem audits: membership
    # in the deleted-order list, and (dangling-FK check) whether ANY
    # parent order exists at all — absent parent == survives neither
    # the delete list nor the post-delete orders table
    ok = orders.select("o_orderkey").join(do, "o_orderkey", "left")
    li_row = (
        lineitem.select("l_orderkey")
        .join(ok, lineitem.l_orderkey == F.col("o_orderkey"), "left")
        .agg(
            F.lit("lineitem").alias("tbl"),
            F.count(F.lit(1)).alias("n_before"),
            F.count(F.when(F.col("f_do").isNotNull(), 1)).alias("n_deleted"),
            F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias(
                "n_orphans_after"
            ),
        )
    )
    ev_row = (
        events.select("user_id")
        .join(dk, events.user_id == F.col("c_custkey"), "left")
        .agg(
            F.lit("events").alias("tbl"),
            F.count(F.lit(1)).alias("n_before"),
            F.count(F.when(F.col("f_dc").isNotNull(), 1)).alias("n_deleted"),
        )
        .withColumn("n_orphans_after", F.lit(0).cast("long"))
    )
    return (
        cust_row.unionByName(orders_row)
        .unionByName(li_row)
        .unionByName(ev_row)
    )
