"""Shared machinery for committed-golden oracles.

Some operators have no DuckDB-SQL twin (sketches, k-means, iterative
fixpoints, libm-dependent keys) but ARE byte-deterministic: their
hashing is seeded, their distributed float aggregation rides the int64
fixed-point grid or commutative integer/register merges, and their
emitted floats are rounded far above any residual noise — verified by
dumping each query's output from separate local[8]/local[32] sessions
at different shuffle widths and comparing reprs bit-for-bit
(tests/test_determinism.py generalizes the same property).

For those, the oracle is the query's OWN committed output, keyed by a
corpus signature so a regenerated test corpus fails loudly (rowcount
mismatch) instead of silently passing.  The signature covers every
base table family the probes read — documents text, events, lineitem,
and the embedding bytes — so any corpus regeneration invalidates all
goldens at once:

    sig = sum(length(documents.text))
        + count(events) + CAST(round(sum(events.value) * 100) AS int)
        + count(lineitem)
        + count(embeddings) + sum(round(embeddings.embedding[1] * 1e6))

Semantic QUALITY stays pinned in pytest (recall bounds, error
contracts, numpy parity) — a regenerated golden can never hide a
quality break.  Regenerate with tests/regen_rowsonly_goldens.py.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
)

COMBINED_SIG_SQL = """(
    (SELECT CAST(sum(length(text)) AS BIGINT) FROM documents)
  + (SELECT count(*) FROM events)
  + (SELECT CAST(round(sum(value) * 100) AS BIGINT) FROM events)
  + (SELECT count(*) FROM lineitem)
  + (SELECT count(*) FROM embeddings)
  + (SELECT CAST(sum(CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000)
                          AS BIGINT)) AS BIGINT)
     FROM embeddings)
)"""
# ^ the DOUBLE cast on the embedding term is load-bearing (r14, same
# fix as classifier._SIG_SQL): Spark promotes float*int to double,
# DuckDB multiplied in float32, and a handful of sf0.1 values round
# apart across that precision line.  Spark-side combined_sig is
# untouched — committed goldens keep their keys.


def combined_sig(spark: SparkSession, sf_dir: str) -> int:
    """Spark twin of COMBINED_SIG_SQL (element_at is 1-based in both
    engines; round-then-int keeps every term exact)."""
    from ..sources.tables import load

    docs = load(spark, sf_dir, "documents").agg(
        F.sum(F.length("text")).cast("long")
    ).collect()[0][0]
    ev = load(spark, sf_dir, "events").agg(
        F.count(F.lit(1)) + F.round(F.sum("value") * 100).cast("long")
    ).collect()[0][0]
    li = load(spark, sf_dir, "lineitem").count()
    emb = load(spark, sf_dir, "embeddings").agg(
        F.count(F.lit(1))
        + F.sum(
            F.expr("CAST(round(element_at(embedding, 1) * 1000000) AS BIGINT)")
        )
    ).collect()[0][0]
    return int(docs + ev + li + emb)


def golden_oracle(name: str, cols: str) -> str:
    """Oracle SQL reading the committed golden for ``name``."""
    return f"""
    SELECT {cols}
    FROM read_parquet('{GOLDEN_DIR}/golden_{name}.parquet')
    WHERE corpus_sig = {COMBINED_SIG_SQL}
    """
