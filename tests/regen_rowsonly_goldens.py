"""Regenerate the committed goldens for the former rows-only probes.

These ten operators (sketches, k-means planes, iterative fixpoints,
libm-keyed sampling) have no DuckDB-SQL twin but are byte-deterministic
(see functions/goldens.py for the verification protocol), so each
oracle is the query's own committed output keyed by the COMBINED corpus
signature.  Run after any change to their logic or to ANY test corpus:

    python tests/regen_rowsonly_goldens.py [sf_dir ...] [--names a,b]

(--names regenerates ONLY the listed goldens — use it when adding a
new golden query so the other committed files keep byte-identical
diffs.)  Writes tests/fixtures/golden_<name>.parquet; commit the
results.
Quality contracts (recall bounds, error bounds, numpy parity) live in
pytest and are unaffected by regeneration.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

NAMES = [
    "events_heavy_hitters_cms",
    "events_distinct_sketch_merge",
    "events_approx_quantiles",
    "events_rolling_mau_approx",
    "dedup_semantic",
    "corpus_weighted_sample",
    "graph_pagerank",
    "similarity_ann_ivf_int8",
    "embedding_pca",
    "corpus_topic_clusters",
    "multimodal_jpeg_roundtrip",
    "multimodal_video_frames",
    "events_kmv_segment_overlap",
    "multimodal_spectral_features",
    "multimodal_phash_dedup",
    "events_anomaly_mad_approx",
]


def main(argv: list[str]) -> None:
    from mahjong_etl_spark.functions.goldens import combined_sig
    from mahjong_etl_spark.plans.registry import registry
    from mahjong_etl_spark.session import get_spark

    names = list(NAMES)
    sf_dirs = []
    it = iter(argv)
    for a in it:
        if a == "--names":
            names = [n for n in next(it).split(",") if n]
        else:
            sf_dirs.append(a)
    sf_dirs = sf_dirs or DEFAULT_SF_DIRS
    unknown = set(names) - set(NAMES)
    if unknown:
        raise SystemExit(f"--names not in NAMES: {sorted(unknown)}")

    spark = get_spark("regen-rowsonly-goldens")
    reg = registry()
    frames: dict[str, list] = {n: [] for n in names}
    for sf_dir in sf_dirs:
        sig = combined_sig(spark, sf_dir)
        for n in names:
            pdf = reg[n].spark_fn(spark, sf_dir).toPandas()
            pdf["corpus_sig"] = sig
            frames[n].append(pdf)
            print(f"{sf_dir} {n}: {len(pdf)} rows (corpus_sig={sig})")
    for n, fs in frames.items():
        pd.concat(fs, ignore_index=True).to_parquet(
            os.path.join(FIXTURES, f"golden_{n}.parquet"), index=False
        )
    print(f"wrote {len(names)} golden files")


if __name__ == "__main__":
    main(sys.argv[1:])
