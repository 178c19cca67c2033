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
