"""Regenerate the committed golden files for the two signature-based
dedup oracles (MinHash-LSH, SimHash).

The queries are fully deterministic but their xxhash64/SipHash
signatures have no DuckDB equivalent, so their oracle is this golden
parquet: one row-set per test corpus, tagged by ``corpus_sig`` (total
text length), which the oracle SQL matches against whatever corpus the
harness hands it.  A corpus with no golden rows FAILS (rowcount
mismatch) rather than silently passing.

Run after any change to shingling, banding, bucket caps, or the
corpora themselves:

    python tests/regen_dedup_goldens.py [sf_dir ...]

defaults to sf0.001, sf0.01 and sf0.1.  Output is written to
tests/fixtures/dedup_{minhash,simhash}_golden.parquet; commit the
result.  Semantic accuracy is pinned independently of these bytes by
tests/test_extensions.py (agreement with exact Jaccard on planted
duplicates), so a regenerated golden cannot hide a semantics break.
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
    from mahjong_etl_spark.operators.dedup import dedup_minhash_lsh, dedup_simhash
    from mahjong_etl_spark.session import get_spark
    from mahjong_etl_spark.sources.tables import load

    import pyspark.sql.functions as F

    spark = get_spark("regen-dedup-goldens")
    out = {"minhash": [], "simhash": []}
    for sf_dir in sf_dirs:
        sig = (
            load(spark, sf_dir, "documents")
            .agg(F.sum(F.length("text")).cast("long"))
            .collect()[0][0]
        )
        for key, fn in (("minhash", dedup_minhash_lsh), ("simhash", dedup_simhash)):
            pdf = fn(spark, sf_dir).toPandas()
            pdf["corpus_sig"] = sig
            out[key].append(pdf)
            print(f"{sf_dir} {key}: {len(pdf)} pairs (corpus_sig={sig})")
    for key, name in (("minhash", "dedup_minhash_golden.parquet"),
                      ("simhash", "dedup_simhash_golden.parquet")):
        merged = pd.concat(out[key], ignore_index=True)
        merged.to_parquet(os.path.join(FIXTURES, name), index=False)
        print(f"wrote {name}: {len(merged)} rows")


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_SF_DIRS)
