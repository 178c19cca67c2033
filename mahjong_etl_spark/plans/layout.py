"""Data-layout control: sorted writes for parquet row-group skipping.

At 100 TB the cheapest predicate is the one that never touches a row:
parquet stores min/max statistics per row group, and a reader skips
any group whose range cannot match the filter.  Those statistics only
HELP if the writer clustered the data — an unsorted write leaves every
row group spanning nearly the full value range, so nothing skips.

``write_sorted`` produces the skip-friendly layout:

- ``repartitionByRange`` on the sort keys — a range shuffle, so each
  output FILE owns a disjoint key range (file-level skipping for
  planners that read footers first, and naturally size-balanced files
  via the range partitioner's sampling);
- ``sortWithinPartitions`` — inside each file, row groups cover
  narrow, monotonically advancing ranges (row-group-level skipping).

Cost model: one extra range shuffle at write time buys every future
scan's pruning — the classic write-once/read-many trade.  This is the
single-column ordering path; for multi-dimensional predicates the same
entry point accepts several keys (lexicographic clustering), which
covers the dominant time-plus-entity access pattern without Z-order
interleaving.

``tests/test_layout.py`` verifies the contract on the actual parquet
footers (pyarrow metadata): sorted row-group min/max ranges must be
near-disjoint while an unsorted write's ranges all overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` range-clustered and sorted on ``sort_cols``."""
    cols = [df[c] for c in sort_cols]
    part = (
        df.repartitionByRange(num_files, *cols)
        if num_files
        else df.repartitionByRange(*cols)
    )
    part.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16):
    """Z-value (Morton code) column for ``cols`` (numeric/temporal).

    Each key is min-max normalized to ``bits`` buckets (the min/max
    come from one tiny pre-aggregate — at 100 TB, table stats the
    catalog already holds), then the bucket bits are interleaved into
    one BIGINT.  All JVM bit arithmetic — no UDFs.

    Rationale: lexicographic ``write_sorted(a, b)`` clusters perfectly
    on ``a`` but leaves ``b`` spanning the full range inside every
    ``a`` run — a reader filtering ONLY on ``b`` skips nothing.  The
    Morton curve interleaves the dimensions so row groups become
    near-rectangles in (a, b) space: ranges on EITHER column tighten
    by ~2^(bits_per_dim) and both predicates skip.  The trade is that
    neither column is as tight as its own single-column sort —
    Z-order is the layout for tables with more than one dominant
    access dimension (the events table's user_id + time is the
    canonical case).
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[
            f(F.col(c).cast("double")).alias(f"{agg}_{c}")
            for c in cols
            for agg, f in (("min", F.min), ("max", F.max))
        ]
    ).collect()[0]
    parts = []
    ndim = len(cols)
    for d, c in enumerate(cols):
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        span = (hi - lo) or 1.0
        bucket = (
            f"cast(least((cast({c} as double) - {lo!r}) / {span!r}"
            f" * {(1 << bits) - 1}, {(1 << bits) - 1}) as bigint)"
        )
        # spread bucket bit i of dimension d to position i*ndim + d
        parts.append(
            f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint),"
            f" (acc, i) -> acc + shiftleft(shiftright({bucket}, i) & 1,"
            f" i * {ndim} + {d}))"
        )
    return F.expr(" + ".join(parts))


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
    bits: int = 16,
) -> None:
    """Write ``df`` clustered along the Morton curve of ``cols`` —
    multi-dimensional row-group skipping (see ``zorder_value``).  Same
    write topology as ``write_sorted``: range-shuffle on the z-value
    so files own disjoint curve segments, sort within partitions so
    row groups cover short curve runs, then drop the helper column."""
    z = df.withColumn("_z", zorder_value(df, cols, bits))
    part = (
        z.repartitionByRange(num_files, "_z")
        if num_files
        else z.repartitionByRange("_z")
    )
    (
        part.sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
