"""As-of (temporal) join — a custom operator Spark lacks natively.

``asof_join(left, right, ...)`` attaches to each left row the most
recent right row at-or-before its timestamp within the same key —
the classic "state as of event time" join (quotes→trades, config→
event, last-view→click).

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
) -> DataFrame:
    """Each left row + the latest right row with ``right.ts <= left.ts``
    on the same ``on`` key.  Right payload columns come back suffixed;
    lefts with no prior right get NULLs.

    Tie semantics: a right row at exactly the left ts matches (right
    sorts before left at equal ts).  Among MULTIPLE right rows sharing
    (key, ts) the carried one is arbitrary — supply a strictly-ordered
    ts (or pre-dedupe the right side) when that matters, exactly as
    with DuckDB/kdb asof joins."""
    rcols = right_cols or [c for c in right.columns if c not in (on, ts)]
    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        on, ts, F.struct(*[F.col(c) for c in rcols]).alias("__payload")
    ).withColumn("__side", F.lit(0))
    unioned = lt.unionByName(rt.withColumns({c: F.lit(None) for c in lt.columns if c not in rt.columns}), allowMissingColumns=True)
    # right rows sort before left rows at the same ts (side 0 < 1), so
    # an exactly-simultaneous right row is visible to the left row
    w = (
        Window.partitionBy(on)
        .orderBy(ts, "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__carry", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("__side") == 1).drop("__side", "__payload")
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
