"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact⋈fact join (e.g. orders⋈lineitem
on the order key, or kyokus⋈actions on kyoku_id) is shuffling both
sides.  If the tables are WRITTEN bucketed (and sorted) by the join
key, Spark's scan reports a compatible output partitioning and the
sort-merge join runs with ZERO exchanges — the shuffle is paid once
at write time and amortized over every subsequent join/aggregation on
that key.

``write_bucketed`` registers the data as a catalog table because
bucket metadata lives in the catalog, not in parquet itself (a plain
``.parquet(path)`` roundtrip loses the bucket spec).  The bucket
count is a layout contract: both join sides must use the same count,
and at scale it should be sized so one bucket of the biggest table
fits an executor core's working set (e.g. 100 TB / 8192 buckets ≈
12 GB per bucket per table).

``verify_colocated`` is the guardrail used by tests: it asserts the
join plan contains no Exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: str | list[str],
    num_buckets: int = 32,
    sorted_by: str | list[str] | None = None,
) -> None:
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *cols)
    sort_cols = sorted_by if sorted_by is not None else cols
    sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)


def verify_colocated(df: DataFrame) -> None:
    """Raise if the (executed) plan shuffles — the proof the bucket
    layout was actually exploited."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(f"bucketed join still shuffles:\n{plan}")
