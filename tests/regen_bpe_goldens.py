"""Regenerate the committed golden files for the BPE-training oracles.

Distributed BPE training (operators/bpe.py) is fully deterministic
(exact integer pair counts, lexicographic tie-break) but iterative, so
it has no DuckDB-SQL equivalent; its oracle is this golden parquet
pair, one row-set per test corpus tagged by ``corpus_sig`` (total text
length) — same pattern as tests/regen_dedup_goldens.py.  A corpus with
no golden rows FAILS (rowcount mismatch) rather than silently passing.

Run after any change to word counting, pair counting, tie-breaking,
the merge fold, N_MERGES/MIN_PAIR_FREQ, or the corpora themselves:

    python tests/regen_bpe_goldens.py [sf_dir ...]

defaults to sf0.001, sf0.01 and sf0.1.  Writes
tests/fixtures/bpe_merges_golden.parquet and
tests/fixtures/bpe_word_tokens_golden.parquet; commit the results.
Merge semantics are pinned independently of these bytes by
tests/test_bpe.py (exact agreement with a pure-Python reference BPE),
so a regenerated golden cannot hide a semantics break.
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
    import pyspark.sql.functions as F

    from mahjong_etl_spark.operators.bpe import corpus_bpe
    from mahjong_etl_spark.session import get_spark
    from mahjong_etl_spark.sources.tables import load

    spark = get_spark("regen-bpe-goldens")
    merge_frames, token_frames = [], []
    for sf_dir in sf_dirs:
        sig = (
            load(spark, sf_dir, "documents")
            .agg(F.sum(F.length("text")).cast("long"))
            .collect()[0][0]
        )
        merges, words = corpus_bpe(spark, sf_dir)
        mdf = pd.DataFrame(
            merges,
            columns=["merge_rank", "left_sym", "right_sym", "merged", "pair_freq"],
        )
        mdf["merge_rank"] = mdf["merge_rank"].astype("int32")
        mdf["corpus_sig"] = sig
        merge_frames.append(mdf)
        tdf = (
            words.select("word", F.size("syms").cast("long").alias("n_tokens"))
            .toPandas()
        )
        tdf["corpus_sig"] = sig
        token_frames.append(tdf)
        print(f"{sf_dir}: {len(mdf)} merges, {len(tdf)} words (corpus_sig={sig})")
    pd.concat(merge_frames, ignore_index=True).to_parquet(
        os.path.join(FIXTURES, "bpe_merges_golden.parquet"), index=False
    )
    pd.concat(token_frames, ignore_index=True).to_parquet(
        os.path.join(FIXTURES, "bpe_word_tokens_golden.parquet"), index=False
    )
    print("wrote bpe_merges_golden.parquet / bpe_word_tokens_golden.parquet")


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_SF_DIRS)
