"""Change-data-capture application: SCD1 upsert/delete merge and SCD2
history tracking — the reprocessing plane of a long-lived corpus.

A 100 TB training corpus is not write-once: documents get re-crawled
(upsert), DMCA'd or opted out (delete), and re-scored (versioned).
The reference is append-only (its daily archives never mutate), so
this plane has no reference counterpart; it is the operator class a
production deployment adds first.

- ``apply_changes`` (SCD1): latest-wins merge of a change feed into a
  base snapshot.  One left-anti join on the key (drops every keyed-out
  base row) plus a union of the surviving upserts — the minimal
  MERGE INTO without a transaction log.  Both sides shuffle once on
  the key; at 100 TB with a small change feed, AQE broadcasts the
  key set and the base never exchanges.  Deletes are rows whose
  ``op`` column says so; they simply contribute no replacement row.

- ``scd2_history`` (SCD2): given versioned rows (key, version, attrs),
  produce the interval form (valid_from, valid_to, is_current) via one
  per-key window ``lead`` — the standard dimension-history shape.  One
  shuffle on the key; interval columns derive from the NEXT version's
  start, so no self-join.

Exposed on the query surface as ``cdc_customer_upsert`` and
``cdc_orders_scd2`` with full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load

OP_COL = "op"
OP_UPSERT = "upsert"
OP_DELETE = "delete"


def apply_changes(base: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """SCD1 merge: ``changes`` rows carry ``op`` ('upsert'|'delete');
    the result is base-minus-changed-keys plus the upsert payloads.

    Precondition: at most one change row per key (a real feed compacts
    to latest-per-key first — one ``row_number`` window; see
    ``cdc_customer_upsert`` for the composed form).
    """
    changed_keys = changes.select(key)
    upserts = changes.where(F.col(OP_COL) == OP_UPSERT).drop(OP_COL)
    return base.join(changed_keys, key, "left_anti").unionByName(upserts)


def scd2_history(
    versioned: DataFrame, key: str, version_col: str
) -> DataFrame:
    """Interval-ize versioned rows: each key's versions ordered by
    ``version_col`` get (valid_from = own version, valid_to = next
    version or NULL, is_current)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(version_col)
    nxt = F.lead(version_col).over(w)
    return versioned.select(
        "*",
        F.col(version_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().cast("int").alias("is_current"),
    )


@query(
    "cdc_customer_upsert",
    oracle="""
    WITH changes AS (
        SELECT o_custkey AS c_custkey,
               CASE WHEN count(*) >= 8 THEN 'delete' ELSE 'upsert' END AS op,
               CAST(round(max(o_totalprice) * 100) AS BIGINT) AS new_bal_cents
        FROM orders GROUP BY o_custkey
    ),
    merged AS (
        SELECT c.c_custkey, c.c_mktsegment,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer c
        LEFT JOIN changes ch ON c.c_custkey = ch.c_custkey
        WHERE ch.c_custkey IS NULL
        UNION ALL
        SELECT ch.c_custkey, c.c_mktsegment, ch.new_bal_cents
        FROM changes ch JOIN customer c ON ch.c_custkey = c.c_custkey
        WHERE ch.op = 'upsert'
    )
    SELECT c_mktsegment,
           count(*) AS n_customers,
           CAST(sum(bal_cents) AS DOUBLE) / 100.0 AS total_balance
    FROM merged GROUP BY c_mktsegment
    """,
)
def cdc_customer_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 CDC merge driven end-to-end: a change feed derived from
    orders (customers with >=8 orders are 'deleted', the rest upsert a
    new balance = their max order price), applied onto the customer
    snapshot with ``apply_changes``, then audited per market segment.

    The oracle mirrors the merge relationally (anti join as
    LEFT JOIN ... IS NULL + union), so the driver hash pins the full
    upsert/delete semantics, not just row counts.  Balances ride as
    integer cents until the single final double division
    (registry.py output-type rule)."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    changes = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.when(F.count(F.lit(1)) >= 8, F.lit(OP_DELETE))
            .otherwise(F.lit(OP_UPSERT))
            .alias(OP_COL),
            F.round(F.max("o_totalprice") * 100)
            .cast("long")
            .alias("new_bal_cents"),
        )
    )
    # upsert payload needs the full row shape: pull the unchanged
    # attributes from the base (a MERGE's UPDATE SET semantics)
    upsert_rows = changes.join(c.select("c_custkey", "c_mktsegment"), "c_custkey")
    merged = apply_changes(
        c,
        upsert_rows.select(
            "c_custkey",
            OP_COL,
            "c_mktsegment",
            F.col("new_bal_cents").alias("bal_cents"),
        ),
        "c_custkey",
    )
    return merged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("bal_cents").cast("double") / F.lit(100.0)).alias("total_balance"),
    )


@query(
    "cdc_orders_scd2",
    oracle="""
    WITH versioned AS (
        SELECT o_custkey,
               o_orderkey AS version,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders WHERE o_custkey <= 200
    ),
    hist AS (
        SELECT o_custkey, version, price_cents,
               version AS valid_from,
               lead(version) OVER (PARTITION BY o_custkey
                                   ORDER BY version) AS valid_to,
               CAST(lead(version) OVER (PARTITION BY o_custkey
                                        ORDER BY version) IS NULL AS INT)
                   AS is_current
        FROM versioned
    )
    SELECT o_custkey,
           count(*) AS n_versions,
           CAST(sum(is_current) AS BIGINT) AS n_current,
           CAST(max(CASE WHEN is_current = 1 THEN price_cents END) AS BIGINT)
               AS current_price_cents,
           CAST(sum(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_closed
    FROM hist GROUP BY o_custkey
    """,
)
def cdc_orders_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval history over a versioned feed (orders per
    customer, orderkey as the monotone version), summarized per key:
    exactly one open (is_current) interval per key, every other
    version closed by its successor.  The history itself is one
    ``lead`` window — no self-join — and the summary pins open/closed
    interval bookkeeping into the driver hash."""
    versioned = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_custkey") <= 200)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("version"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        )
    )
    hist = scd2_history(versioned, "o_custkey", "version")
    return hist.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum("is_current").cast("long").alias("n_current"),
        F.max(F.when(F.col("is_current") == 1, F.col("price_cents")))
        .cast("long")
        .alias("current_price_cents"),
        F.sum(F.when(F.col("valid_to").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_closed"),
    )


def scd2_as_of(hist: DataFrame, version) -> DataFrame:
    """Point-in-time (time-travel) read over an SCD2 interval table:
    the row valid AT ``version`` is the one with
    valid_from <= v < valid_to (open intervals valid forever).  Pure
    filter — at 100 TB it rides partition pruning on valid_from and
    returns at most one row per key, no window, no join."""
    return hist.where(
        (F.col("valid_from") <= version)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > version))
    )


@query(
    "cdc_scd2_point_in_time",
    oracle="""
    WITH versioned AS (
        SELECT o_custkey,
               o_orderkey AS version,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders WHERE o_custkey <= 200
    ),
    hist AS (
        SELECT o_custkey, version, price_cents,
               version AS valid_from,
               lead(version) OVER (PARTITION BY o_custkey
                                   ORDER BY version) AS valid_to
        FROM versioned
    ),
    pit AS (
        SELECT CAST(floor(avg(version)) AS BIGINT) AS v FROM versioned
    )
    SELECT h.o_custkey,
           CAST(h.version AS BIGINT) AS version_at_asof,
           h.price_cents AS price_cents_at_asof,
           CAST(h.valid_to IS NULL AS INT) AS still_current
    FROM hist h CROSS JOIN pit
    WHERE h.valid_from <= pit.v
      AND (h.valid_to IS NULL OR h.valid_to > pit.v)
    """,
)
def cdc_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel read over the SCD2 history (the AS OF query every
    lakehouse table format sells, expressed against the plain interval
    table cdc_orders_scd2 builds): reconstruct each key's row as it
    was at a past version — here the corpus-median-ish point,
    floor(avg(version)), computed as a 1-row broadcast scalar so the
    probe works at any scale factor.  Exactly one row per key that
    existed at the as-of point; keys whose first version is later
    are absent (as they should be).  The as-of filter is a pure
    predicate (scd2_as_of) — no window, no join beyond the broadcast
    scalar — so at 100 TB it prunes on valid_from and never shuffles
    the history."""
    versioned = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_custkey") <= 200)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("version"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        )
    )
    hist = scd2_history(versioned, "o_custkey", "version")
    asof = versioned.agg(
        F.floor(F.avg("version")).cast("long").alias("v")
    )
    pit = scd2_as_of(
        hist.crossJoin(F.broadcast(asof)), F.col("v")
    )
    return pit.select(
        "o_custkey",
        F.col("version").cast("long").alias("version_at_asof"),
        F.col("price_cents").alias("price_cents_at_asof"),
        F.col("valid_to").isNull().cast("int").alias("still_current"),
    )


# ---------------------------------------------------------------------------
# snapshot diff — dataset versioning audit
# ---------------------------------------------------------------------------


def snapshot_diff(v1: DataFrame, v2: DataFrame, key: str, payload: str) -> DataFrame:
    """Content-level diff of two corpus snapshots: one row per key with
    status added / removed / changed / unchanged.

    The payload is fingerprinted BEFORE the join, so the full-outer
    join shuffles (key, 16-byte digest) only — never document bodies.
    At 100 TB that makes the version diff an O(n) fingerprint shuffle,
    the same discipline as exact dedup.
    """
    a = v1.select(F.col(key), F.md5(F.col(payload)).alias("h1"))
    b = v2.select(F.col(key), F.md5(F.col(payload)).alias("h2"))
    j = a.join(b, key, "full_outer")
    return j.select(
        F.col(key),
        F.when(F.col("h1").isNull(), F.lit("added"))
        .when(F.col("h2").isNull(), F.lit("removed"))
        .when(F.col("h1") != F.col("h2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


@query(
    "corpus_version_diff",
    oracle="""
    WITH v1 AS (
      SELECT doc_id, md5(text) AS h1 FROM documents WHERE doc_id % 11 <> 3
    ), v2 AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 5 = 1 THEN text || ' v2-rescore'
                      ELSE text END) AS h2
      FROM documents WHERE doc_id % 7 <> 2
    ), j AS (
      SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
             CASE WHEN v1.doc_id IS NULL THEN 'added'
                  WHEN v2.doc_id IS NULL THEN 'removed'
                  WHEN h1 <> h2 THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    )
    SELECT status, count(*) AS n_docs,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM j GROUP BY status
    """,
)
def corpus_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-versioning audit: two deterministic snapshots of the
    documents corpus (v2 drops some docs, adds others, and re-scores a
    stripe of texts) are diffed by content hash and rolled up per
    status — the release-gate report ("what changed between corpus
    v1 and v2?") every re-crawl/reprocess cycle needs."""
    d = load(spark, sf_dir, "documents")
    v1 = d.where(F.col("doc_id") % 11 != 3).select("doc_id", "text")
    v2 = (
        d.where(F.col("doc_id") % 7 != 2)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 1,
                F.concat(F.col("text"), F.lit(" v2-rescore")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    diff = snapshot_diff(v1, v2, "doc_id", "text")
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
