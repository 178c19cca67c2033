"""Sorted-write layout contract, verified on real parquet footers."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from mahjong_etl_spark.plans.layout import write_sorted
from mahjong_etl_spark.sources.tables import load


def _rowgroup_ranges(path_glob: str, col: str):
    """(min, max) of ``col`` for every row group across the files."""
    ranges = []
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            ranges.append((st.min, st.max))
    return ranges


def _overlap_fraction(ranges) -> float:
    """Fraction of row-group pairs whose value ranges overlap."""
    n, overlapping = 0, 0
    for i in range(len(ranges)):
        for j in range(i + 1, len(ranges)):
            n += 1
            lo = max(ranges[i][0], ranges[j][0])
            hi = min(ranges[i][1], ranges[j][1])
            if lo <= hi:
                overlapping += 1
    return overlapping / max(n, 1)


def test_sorted_write_tightens_rowgroup_stats(spark, sf_dir, tmp_path):
    events = load(spark, sf_dir, "events")

    sorted_dir = str(tmp_path / "sorted")
    unsorted_dir = str(tmp_path / "unsorted")
    write_sorted(events, sorted_dir, ["ts"], num_files=8)
    # worst-case layout: hash-shuffled on an unrelated key first
    events.repartition(8, "user_id").write.parquet(unsorted_dir)

    sorted_ranges = _rowgroup_ranges(f"{sorted_dir}/*.parquet", "ts")
    unsorted_ranges = _rowgroup_ranges(f"{unsorted_dir}/*.parquet", "ts")
    # AQE may coalesce a near-empty partition; just need enough groups
    # for the overlap statistic to mean something
    assert len(sorted_ranges) >= 4 and len(unsorted_ranges) >= 4

    # sorted: file/row-group ranges are (near-)disjoint -> a time
    # filter skips most groups.  unsorted: every group spans ~the full
    # time range -> nothing skips.
    assert _overlap_fraction(sorted_ranges) < 0.2
    assert _overlap_fraction(unsorted_ranges) > 0.8


def test_sorted_write_roundtrips_rows(spark, sf_dir, tmp_path):
    events = load(spark, sf_dir, "events")
    out = str(tmp_path / "rt")
    write_sorted(events, out, ["ts"], num_files=4)
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    assert sorted(back.columns) == sorted(events.columns)


def _avg_norm_width(ranges) -> float:
    """Average row-group (max-min) width, normalized by the global
    span — 1.0 means every group spans the whole domain (no skipping),
    ~1/k means a point predicate touches ~1/k of the groups."""
    lo = min(r[0] for r in ranges)
    hi = max(r[1] for r in ranges)
    span = (hi - lo) or 1
    return sum((r[1] - r[0]) / span for r in ranges) / len(ranges)


def test_zorder_write_tightens_both_dimensions(spark, sf_dir, tmp_path):
    """Morton layout: BOTH columns' row-group ranges tighten, where
    lexicographic sort only tightens the leading column and a hash
    layout tightens neither."""
    from mahjong_etl_spark.plans.layout import write_zorder

    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    zdir = str(tmp_path / "z")
    lexdir = str(tmp_path / "lex")
    hashdir = str(tmp_path / "h")
    write_zorder(events, zdir, ["user_id", "value"], num_files=16)
    write_sorted(events, lexdir, ["user_id", "value"], num_files=16)
    events.repartition(16, "event_id").write.parquet(hashdir)

    def widths(d, col):
        return _avg_norm_width(_rowgroup_ranges(f"{d}/*.parquet", col))

    # hash layout: nothing skips on either dimension (value has a
    # long tail, so its sampled max varies — bound loosely)
    assert widths(hashdir, "user_id") > 0.8
    assert widths(hashdir, "value") > 0.5
    # lexicographic: leading column tight, trailing column no better
    # than the hash layout
    assert widths(lexdir, "user_id") < 0.3
    assert widths(lexdir, "value") > 0.9 * widths(hashdir, "value")
    # z-order: BOTH dimensions materially tighter than the hash
    # baseline (the lexicographic layout only manages one)
    assert widths(zdir, "user_id") < 0.6 * widths(hashdir, "user_id")
    assert widths(zdir, "value") < 0.6 * widths(hashdir, "value")


def test_zorder_roundtrips_rows(spark, sf_dir, tmp_path):
    from mahjong_etl_spark.plans.layout import write_zorder

    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    out = str(tmp_path / "zrt")
    write_zorder(events, out, ["user_id", "value"], num_files=4)
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    assert sorted(back.columns) == ["event_id", "user_id", "value"]
    # the helper z column must not leak into the written schema
    assert "_z" not in back.columns
