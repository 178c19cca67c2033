"""Range / time-window join via bin bucketing.

Spark has no native range-join optimization (Photon/Databricks adds
one); a naive ``a.ts BETWEEN b.lo AND b.hi`` join plans as a
broadcast-nested-loop — O(n·m) and driver-bound.  The scalable
formulation buckets both sides into fixed-width bins so the planner
sees a plain equi-join on (key, bin), then applies the exact range
predicate as a residual filter:

- point side: one row per (point, its bin);
- interval side: one row per (interval, each covered bin) — for a
  window of width W and bin width W, that is <= 2 bins per interval.

Shuffle cost is therefore ~2x the inputs, candidates are bounded by
true per-(key, bin) co-occurrence, and skew on a hot key is handled by
AQE like any other join.  This is the standard binned range-join
pattern (cf. Spark SQL's own ``spark.sql.join.preferSortMergeJoin``
docs and the interval-join design of Flink's DataStream API — both
public).

The reference has no range joins (SURVEY.md §2.3 "not present
anywhere"); this operator is part of the §7-step-6 extension plane —
the attribution/correlation idiom a training-data pipeline needs over
event streams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load

WINDOW_SECONDS = 3600


def time_window_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int = WINDOW_SECONDS,
    how: str = "inner",
    condition: Column | None = None,
) -> DataFrame:
    """Pairs (left row, right row) sharing ``keys`` with
    ``left_ts - window_seconds < right_ts <= left_ts``.

    Both sides are bucketed into ``window_seconds``-wide bins; the left
    side probes its own bin and the previous one (a window that long
    can only span two bins), so the join is a pure equi-join on
    (keys..., bin) with the exact inequality as a residual filter.
    Column names of both inputs are preserved (prefix them before
    calling if they collide).

    CONTRACT BY JOIN TYPE (r7 review): ``how="inner"`` returns exact
    (left, right) pairs.  ``how="left"`` returns PER-PROBE rows — the
    two-bin explode means an unmatched left row surfaces as TWO
    all-null-right rows, and a left row whose matches all land in one
    probed bin still emits a null row for the other — so outer results
    MUST be consumed through null-tolerant aggregation keyed on the
    left row (``count(right_col)`` / ``sum`` — see
    events_attribution_window below), never as row-level pairs.
    Collapsing the per-probe nulls generically would need a surrogate
    left-row id, which is its own retry-safety trap for a utility
    this low-level."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"time_window_join supports how='inner'|'left', got {how!r}"
        )
    # Binning must be a pure shift-invariant function of the timestamp:
    # a DST-discontinuous mapping could tear two in-window rows more
    # than one bin apart and silently drop the pair.  For TIMESTAMP
    # that is epoch seconds (unix_timestamp); for TIMESTAMP_NTZ it is
    # seconds from a fixed NTZ epoch via timestamp_diff
    # (unix_timestamp on NTZ would route through the session zone).
    from pyspark.sql.types import TimestampNTZType

    def _bin(df: DataFrame, col: str) -> Column:
        if isinstance(df.schema[col].dataType, TimestampNTZType):
            sec = F.timestamp_diff(
                "SECOND",
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
                F.col(col),
            )
        else:
            sec = F.unix_timestamp(F.col(col))
        return F.floor(sec / window_seconds)

    lbin = _bin(left, left_ts)
    rbin = _bin(right, right_ts)
    l_binned = left.withColumn("_bin", F.explode(F.array(lbin, lbin - 1)))
    # Join keys are renamed on the right so the residual predicate can
    # be part of the join condition — required for outer joins, where a
    # post-join filter would silently drop the unmatched (all-null)
    # rows and turn "left" back into "inner".
    r_binned = right.withColumn("_bin_r", rbin)
    for k in keys:
        r_binned = r_binned.withColumnRenamed(k, f"_r_{k}")
    in_window = (
        F.col(right_ts) > F.col(left_ts) - F.expr(f"INTERVAL {window_seconds} SECONDS")
    ) & (F.col(right_ts) <= F.col(left_ts))
    if condition is not None:
        in_window = in_window & condition
    cond = F.col("_bin") == F.col("_bin_r")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_r_{k}"))
    return l_binned.join(r_binned, cond & in_window, how).drop(
        "_bin", "_bin_r", *[f"_r_{k}" for k in keys]
    )


@query(
    "events_attribution_window",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           count(v.event_id)                   AS n_views_1h,
           round(coalesce(sum(v.value), 0), 3) AS viewed_value
    FROM events p
    LEFT JOIN events v
      ON v.user_id = p.user_id
     AND v.event_type = 'view'
     AND v.ts > p.ts - INTERVAL 1 HOUR
     AND v.ts <= p.ts
     AND v.event_id != p.event_id
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def events_attribution_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution: views within the hour before each purchase.

    The binned time-window join keeps this an equi-join on
    (user_id, hour-bin) — the naive BETWEEN formulation would be a
    nested-loop over every (purchase, view) pair of a user.
    """
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("v_value"),
    )
    joined = time_window_join(
        purchases,
        views,
        keys=["user_id"],
        left_ts="p_ts",
        right_ts="v_ts",
        how="left",
        condition=F.col("view_id") != F.col("purchase_id"),
    )
    # The left explode probes two bins, so unmatched purchases surface
    # twice (one null row per bin) and matched rows are per-bin exact;
    # aggregate over the union of both probes.
    return joined.groupBy("purchase_id").agg(
        F.count("view_id").alias("n_views_1h"),
        F.round(F.coalesce(F.sum("v_value"), F.lit(0.0)), 3).alias("viewed_value"),
    )
