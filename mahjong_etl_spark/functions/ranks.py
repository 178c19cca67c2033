"""Exact distributed global ranking.

``percent_rank() OVER (ORDER BY x)`` with no PARTITION BY collapses
the whole relation into ONE window task — the measured 100×-probe cost
of the naive quantile binner was exactly that single-task sort.  This
module computes the SAME exact percent_rank distributed:

  1. ``repartitionByRange`` on the key — the range partitioner
     colocates equal keys (every value compares to the boundaries the
     same way), so no tie group ever spans partitions;
  2. per-partition ``rank()`` windows (ties share the min rank, the
     SQL-standard semantics) run in parallel;
  3. per-partition row counts (one tiny collect: n_partitions longs)
     become cumulative offsets broadcast back as a literal map, and
     global_rank = offset[pid] + local_rank.

Exactness argument: within a partition, rank() is exact by the window
semantics; across partitions, range partitioning guarantees every row
in partition p sorts strictly after all rows of partitions < p OR ties
only within p, so adding the preceding-row offset reproduces the
global rank() bit-for-bit.  percent_rank = (rank-1)/(n-1) is then one
exact integer-derived division.  The result is deterministic and
partitioning-invariant (tests pin equality against the single-window
form).

Cost: one range shuffle + parallel windows instead of a single-task
global sort — the standard exact-rank shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_percent_rank(
    df: DataFrame, col: str, out_col: str = "pr", num_partitions: int | None = None
) -> DataFrame:
    """Return ``df`` with an exact global percent_rank over ``col``.

    Output rows keep all input columns; ``out_col`` holds the same
    double the single-window ``percent_rank() OVER (ORDER BY col)``
    would produce.
    """
    parts = (
        df.repartitionByRange(num_partitions, F.col(col))
        if num_partitions
        else df.repartitionByRange(F.col(col))
    ).withColumn("_pid", F.spark_partition_id())
    # Materialize ONCE before the counts collect: repartitionByRange
    # samples boundaries with an RDD-id-derived seed and AQE may
    # coalesce shuffle partitions, so two executions of the same plan
    # can assign different partition ids — offset[pid] + local_rank
    # would then silently mix two different partitionings.  The eager
    # localCheckpoint pins one physical partitioning that BOTH the
    # counts job and the ranking job read.
    parts = parts.localCheckpoint(eager=True)
    counts = {
        r._pid: r.n
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(counts.values())  # one action covers sizing AND total
    if n_total <= 1:
        return df.withColumn(out_col, F.lit(0.0))
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr: Column = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy(col)
    g_rank = off_expr + F.rank().over(w)
    return parts.withColumn(
        out_col,
        (g_rank - F.lit(1)).cast("double") / F.lit(float(n_total - 1)),
    ).drop("_pid")


def with_value_percent_rank(
    vc: DataFrame,
    col: str,
    cnt_col: str,
    out_col: str = "pr",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact percent_rank over a VALUE-COUNT relation.

    ``vc`` holds one row per distinct value of ``col`` with its row
    count in ``cnt_col``; ``out_col`` receives the percent_rank every
    underlying row of that value would get from
    ``percent_rank() OVER (ORDER BY col)`` on the un-aggregated
    relation.  Ties share the min rank, so every row of a value group
    has rank 1 + (number of strictly smaller rows) and
    pr = (rank − 1)/(n − 1) = (rows strictly below)/(n − 1) — both
    terms exact int64 sums here.

    Why this shape exists (r14, guide §2.3 "aggregate before you
    shuffle"): the row-level :func:`with_percent_rank` range-shuffles
    and checkpoints EVERY row, but a rank consumer that only needs
    per-value (or binned) output can aggregate first — the range
    shuffle then moves one row per distinct value, value-DOMAIN-bounded
    at any corpus scale, while the groupBy feeding it partial-aggregates
    map-side.  Same range-partition + per-partition-window + offset
    construction, same localCheckpoint pinning (see with_percent_rank),
    with the per-partition counts summing ``cnt_col`` instead of
    counting rows.
    """
    parts = (
        vc.repartitionByRange(num_partitions, F.col(col))
        if num_partitions
        else vc.repartitionByRange(F.col(col))
    ).withColumn("_pid", F.spark_partition_id())
    parts = parts.localCheckpoint(eager=True)
    counts = {
        r._pid: r.n
        for r in parts.groupBy("_pid").agg(F.sum(cnt_col).alias("n")).collect()
    }
    n_total = sum(counts.values())
    if n_total <= 1:
        return vc.withColumn(out_col, F.lit(0.0))
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr: Column = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("_pid"),
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    below = off_expr + F.sum(cnt_col).over(w) - F.col(cnt_col)
    return parts.withColumn(
        out_col,
        below.cast("double") / F.lit(float(n_total - 1)),
    ).drop("_pid")


def with_global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact distributed ``row_number() OVER (ORDER BY ...)``.

    Same range-partition + per-partition-window + offset construction
    as :func:`with_percent_rank`, but for an arbitrary (possibly
    descending) total ordering.  The caller must make the ordering
    TOTAL (include a unique tiebreak column) or the numbering within a
    tie group is partition-local choice.

    The eager localCheckpoint pins ONE physical partitioning for both
    the counts collect and the numbering job — see with_percent_rank.
    """
    parts = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    ).withColumn("_pid", F.spark_partition_id())
    parts = parts.localCheckpoint(eager=True)
    counts = {
        r._pid: r.n
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    off_expr: Column = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return parts.withColumn(
        out_col, (off_expr + F.row_number().over(w)).cast("long")
    ).drop("_pid")
