"""Regenerate the committed goldens for the three ANN probe oracles.

The LSH / IVF / PQ top-k queries are approximate in RECALL but exact
in BYTES: hyperplanes derive from a fixed seed, codebook/centroid
training rides the int64 fixed-point partial-sum grid (bit-identical
under any partitioning or core count — verified across local[8]/32
and shuffle-partitions 7/32), and every top-k cut breaks ties on
neighbor id.  Their oracle is therefore this committed golden of each
query's own output, corpus_sig-keyed like the minhash/simhash/BPE
goldens.  Semantic quality is pinned independently by the recall
tests in tests/test_extensions.py, so a regenerated golden cannot
hide a quality break.

Run after any change to hashing, seeding, training, probe widths, or
the corpora:

    python tests/regen_ann_goldens.py [sf_dir ...]

Writes tests/fixtures/ann_{lsh,ivf,pq,ivfpq}_golden.parquet; commit them.
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


def main(sf_dirs: list[str]) -> None:
    from mahjong_etl_spark.operators.classifier import corpus_sig
    from mahjong_etl_spark.operators.similarity import (
        similarity_ann_ivf,
        similarity_ann_ivfpq,
        similarity_ann_lsh,
        similarity_ann_pq,
    )
    from mahjong_etl_spark.session import get_spark

    spark = get_spark("regen-ann-goldens")
    out = {"lsh": [], "ivf": [], "pq": [], "ivfpq": []}
    fns = {
        "lsh": similarity_ann_lsh,
        "ivf": similarity_ann_ivf,
        "pq": similarity_ann_pq,
        "ivfpq": similarity_ann_ivfpq,
    }
    for sf_dir in sf_dirs:
        sig = corpus_sig(spark, sf_dir)
        for key, fn in fns.items():
            pdf = fn(spark, sf_dir).toPandas()
            pdf["corpus_sig"] = sig
            out[key].append(pdf)
            print(f"{sf_dir} {key}: {len(pdf)} rows (corpus_sig={sig})")
    for key, frames in out.items():
        pd.concat(frames, ignore_index=True).to_parquet(
            os.path.join(FIXTURES, f"ann_{key}_golden.parquet"), index=False
        )
    print("wrote ann_{lsh,ivf,pq}_golden.parquet")


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_SF_DIRS)
