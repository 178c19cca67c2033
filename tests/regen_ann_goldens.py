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

Writes tests/fixtures/ann_{lsh,ivf,pq,ivfpq}_golden.parquet plus
semantic_admission_golden.parquet (the ADC-nominated admission batch
twin — same exact-in-bytes argument; its decision agreement vs the
brute-force verdict is pinned in tests/test_semantic_admission.py);
commit them.
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
        similarity_semantic_admission,
    )
    from mahjong_etl_spark.session import get_spark

    spark = get_spark("regen-ann-goldens")
    out = {"lsh": [], "ivf": [], "pq": [], "ivfpq": [], "semadm": []}
    fns = {
        "lsh": similarity_ann_lsh,
        "ivf": similarity_ann_ivf,
        "pq": similarity_ann_pq,
        "ivfpq": similarity_ann_ivfpq,
        "semadm": similarity_semantic_admission,
    }
    files = {
        key: f"ann_{key}_golden.parquet"
        for key in ("lsh", "ivf", "pq", "ivfpq")
    }
    files["semadm"] = "semantic_admission_golden.parquet"
    for sf_dir in sf_dirs:
        sig = corpus_sig(spark, sf_dir)
        for key, fn in fns.items():
            pdf = fn(spark, sf_dir).toPandas()
            if key == "semadm":
                # admitted rows carry NULL matched_id; pandas widens
                # nullable int64 to float64, which would stringify
                # '137.0' against Spark's '137' in the driver's
                # canon hash — keep the parquet type BIGINT
                pdf["matched_id"] = pdf["matched_id"].astype("Int64")
            pdf["corpus_sig"] = sig
            out[key].append(pdf)
            print(f"{sf_dir} {key}: {len(pdf)} rows (corpus_sig={sig})")
    for key, frames in out.items():
        pd.concat(frames, ignore_index=True).to_parquet(
            os.path.join(FIXTURES, files[key]), index=False
        )
    print("wrote " + ", ".join(sorted(files.values())))


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_SF_DIRS)
