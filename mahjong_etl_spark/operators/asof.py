"""As-of (temporal) join — a custom operator Spark lacks natively.

``asof_join(left, right, ...)`` attaches to each left row the nearest
right row within the same key — backward (most recent at-or-before,
the classic "state as of event time" join: quotes→trades, config→
event, last-view→click) or forward (earliest at-or-after:
view→conversion), with an optional merge_asof-style tolerance bound.

Implementation is the union-and-carry-forward pattern, NOT a range
join: tag both sides, union them, and run one ``last(right, ignore-
nulls)`` window ordered by (ts, side) per key, then keep the left
rows.  Cost is a single shuffle on the key — the same partitioning a
groupBy on the key would need — versus a range-join's per-key
quadratic blowup.  At 100 TB this is the only shape that survives:
state carries forward within a partition in one ordered pass, so
skewed keys degrade to a big sort, never to a cross product.

The DuckDB oracle uses its native ``ASOF JOIN`` so the semantics are
pinned exactly (ties: a right row at exactly the left ts matches;
lefts with no prior right keep NULLs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import query
from ..sources.tables import load


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Each left row + the nearest right row on the same ``on`` key:
    the latest with ``right.ts <= left.ts`` (``direction="backward"``,
    default) or the earliest with ``right.ts >= left.ts``
    (``direction="forward"``) — pandas ``merge_asof`` surface, but as
    one distributed shuffle.  ``tolerance_seconds`` nulls the payload
    when the matched row is further than the bound (inclusive), like
    merge_asof's ``tolerance``.  Right payload columns come back
    suffixed; lefts with no match get NULLs.

    Tie semantics: a right row at exactly the left ts matches in both
    directions.  Among MULTIPLE right rows sharing (key, ts) the
    carried one is arbitrary — supply a strictly-ordered ts (or
    pre-dedupe the right side) when that matters, exactly as with
    DuckDB/kdb asof joins.

    Implementation: the right ts rides inside the payload struct
    (field ``__rts``) so the tolerance check needs no second join; the
    backward pass carries with last(ignorenulls) over the preceding
    frame with rights sorting BEFORE lefts at equal ts, the forward
    pass with first(ignorenulls) over the following frame with rights
    sorting AFTER lefts — one shuffle on the key either way."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rcols = right_cols or [c for c in right.columns if c not in (on, ts)]
    lt = left.withColumn("__side", F.lit(1))
    rside = 0 if direction == "backward" else 2
    rt = right.select(
        on,
        ts,
        F.struct(
            F.col(ts).alias("__rts"), *[F.col(c) for c in rcols]
        ).alias("__payload"),
    ).withColumn("__side", F.lit(rside))
    unioned = lt.unionByName(rt.withColumns({c: F.lit(None) for c in lt.columns if c not in rt.columns}), allowMissingColumns=True)
    base = Window.partitionBy(on).orderBy(ts, "__side")
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, 0)
        carry = F.last("__payload", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(0, Window.unboundedFollowing)
        carry = F.first("__payload", ignorenulls=True).over(w)
    carried = unioned.withColumn("__carry", carry)
    out = carried.where(F.col("__side") == 1).drop("__side", "__payload")
    if tolerance_seconds is not None:
        if direction == "backward":
            dist = F.timestamp_diff("MICROSECOND", F.col("__carry.__rts"), F.col(ts))
        else:
            dist = F.timestamp_diff("MICROSECOND", F.col(ts), F.col("__carry.__rts"))
        out = out.withColumn(
            "__carry",
            F.when(
                dist <= int(tolerance_seconds * 1_000_000), F.col("__carry")
            ),
        )
    for c in rcols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"__carry.{c}"))
    return out.drop("__carry")


@query(
    "events_asof_last_view",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click'
    ),
    views AS (
        SELECT user_id, ts AS view_ts, event_id AS view_event_id
        FROM events WHERE event_type = 'view'
    )
    SELECT c.user_id, c.event_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S')                    AS click_ts,
           v.view_event_id                                        AS view_event_id_asof,
           CASE WHEN v.view_ts IS NULL THEN NULL
                ELSE round(date_diff('microsecond', v.view_ts, c.ts) / 1000000.0, 3)
           END                                                    AS sec_since_view
    FROM clicks c
    ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND v.view_ts <= c.ts
    """,
)
def events_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the most recent view at-or-before it by the
    same user — exact parity with DuckDB's native ASOF JOIN."""
    e = load(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    # the payload carries a COPY of the view timestamp so the latency
    # metric falls out of the carry directly — no second join
    views = e.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
    )
    joined = asof_join(
        clicks,
        views,
        on="user_id",
        ts="ts",
        right_cols=["view_event_id", "view_ts"],
        suffix="_asof",
    )
    sec = F.when(
        F.col("view_ts_asof").isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.round(
            F.timestamp_diff("MICROSECOND", F.col("view_ts_asof"), F.col("ts"))
            / 1_000_000.0,
            3,
        )
    )
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("view_event_id_asof"),
        sec.alias("sec_since_view"),
    )


ASOF_FWD_TOLERANCE_SEC = 600


@query(
    "events_asof_next_purchase",
    oracle=f"""
    WITH views AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'
    ),
    purchases AS (
        SELECT user_id, ts AS p_ts, event_id AS p_id, value AS p_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT v.user_id, v.event_id,
           CASE WHEN p.p_ts IS NULL
                  OR date_diff('microsecond', v.ts, p.p_ts)
                     > {ASOF_FWD_TOLERANCE_SEC} * 1000000
                THEN NULL ELSE p.p_id END                       AS purchase_id_asof,
           CASE WHEN p.p_ts IS NULL
                  OR date_diff('microsecond', v.ts, p.p_ts)
                     > {ASOF_FWD_TOLERANCE_SEC} * 1000000
                THEN NULL
                ELSE round(date_diff('microsecond', v.ts, p.p_ts) / 1000000.0, 3)
           END                                                  AS sec_to_purchase,
           CASE WHEN p.p_ts IS NULL
                  OR date_diff('microsecond', v.ts, p.p_ts)
                     > {ASOF_FWD_TOLERANCE_SEC} * 1000000
                THEN NULL ELSE round(p.p_value, 3) END          AS purchase_value
    FROM views v
    ASOF LEFT JOIN purchases p
      ON v.user_id = p.user_id AND p.p_ts >= v.ts
    """,
)
def events_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: for every view, the NEXT purchase
    by the same user, nulled when it is more than
    ``ASOF_FWD_TOLERANCE_SEC`` away — the conversion-attribution twin
    of ``events_asof_last_view`` and the merge_asof(direction=
    'forward', tolerance=...) surface.  The oracle is DuckDB's native
    forward ASOF JOIN (``p_ts >= v.ts``) with the same tolerance
    applied, so direction AND bound semantics are both pinned."""
    e = load(spark, sf_dir, "events")
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    # a COPY of the purchase ts rides in the payload (the last_view
    # idiom) so the latency metric falls out of the carry directly
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("p_id"),
        F.col("value").alias("p_value"),
        F.col("ts").alias("p_ts"),
    )
    joined = asof_join(
        views,
        purchases,
        on="user_id",
        ts="ts",
        right_cols=["p_id", "p_value", "p_ts"],
        suffix="_next",
        direction="forward",
        tolerance_seconds=ASOF_FWD_TOLERANCE_SEC,
    )
    sec = F.when(
        F.col("p_ts_next").isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.round(
            F.timestamp_diff("MICROSECOND", F.col("ts"), F.col("p_ts_next"))
            / 1_000_000.0,
            3,
        )
    )
    return joined.select(
        "user_id",
        "event_id",
        F.col("p_id_next").alias("purchase_id_asof"),
        sec.alias("sec_to_purchase"),
        F.round(F.col("p_value_next"), 3).alias("purchase_value"),
    )
