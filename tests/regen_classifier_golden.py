"""Regenerate the golden weights for the classifier-training oracle.

Distributed logistic-regression training (operators/classifier.py) is
bit-reproducible (exact int64 fixed-point gradient aggregation) but
iterative, so its oracle is this committed golden: the quantized
learned weights per test corpus, keyed by corpus_sig — same pattern as
the BPE/minhash goldens.  dim 0 is the bias; dims 1..64 match DuckDB's
1-based array subscripts.

Run after any change to the training loop, epochs, learning rate,
scales, or the corpora:

    python tests/regen_classifier_golden.py [sf_dir ...]

Writes tests/fixtures/classifier_weights_golden.parquet; commit it.
Training semantics are pinned independently by tests/test_classifier.py
(exact parity with a single-node numpy implementation of the same
fixed-point loop), so a regenerated golden cannot hide a semantics
break.
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
    from mahjong_etl_spark.operators.classifier import (
        corpus_classifier,
        corpus_sig,
        quantized_weights,
    )
    from mahjong_etl_spark.session import get_spark

    spark = get_spark("regen-classifier-golden")
    frames = []
    for sf_dir in sf_dirs:
        sig = corpus_sig(spark, sf_dir)
        w = quantized_weights(corpus_classifier(spark, sf_dir))
        # bias last in the array -> dim 0 in the golden
        dims = list(range(1, len(w))) + [0]
        frames.append(
            pd.DataFrame(
                {"dim": dims, "w_int": list(w), "corpus_sig": sig}
            ).astype({"dim": "int64", "w_int": "int64", "corpus_sig": "int64"})
        )
        print(f"{sf_dir}: {len(w)} weights (corpus_sig={sig})")
    pd.concat(frames, ignore_index=True).to_parquet(
        os.path.join(FIXTURES, "classifier_weights_golden.parquet"), index=False
    )
    print("wrote classifier_weights_golden.parquet")


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_SF_DIRS)
