"""Similarity search over an embedding column (array<float>).

Two paths:
- ``cosine_topk`` — brute-force exact top-k: the correctness baseline.
  Cosine is computed JVM-side with zip_with/aggregate higher-order
  functions (no Python UDF in the hot path).
- ``ann_lsh_topk`` — random-hyperplane LSH: the 100 TB path.
  Candidates come from equi-joins on sign-pattern buckets (cost ∝
  docs × tables, never n²), then exact cosine reranks candidates.

Scale notes:
- Brute force is O(|queries| × |corpus|); it is only ever used with a
  broadcast query set (the query side must fit in memory — true for
  "find neighbors of these k items", never for all-pairs).
- The LSH variant trades recall for a ~|corpus|-linear plan.  Tables
  and bits are tunable; tests/test_similarity.py pins recall >= 0.8
  against the brute-force baseline at test scale.
- Hyperplane weights are derived from xxhash64(table, plane, dim) —
  deterministic, seedless, reproducible across runs and cluster sizes,
  and generated distributedly (no driver-side randomness to ship).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load

TOPK = 5
N_QUERIES_PRED = "vec_id < 5"
LSH_TABLES = 8
LSH_BITS = 4
MULTIPROBE_RADIUS = 1


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add double-precision vector + L2 norm columns (computed once)."""
    emb_d = F.expr(f"transform({vec_col}, x -> cast(x AS double))")
    df = df.withColumn("emb_d", emb_d)
    sq = F.aggregate(
        F.col("emb_d"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return df.withColumn("norm", F.sqrt(sq))


def cosine_expr(a: str, b: str):
    """Cosine between two ``with_norm``-prepared sides (alias names)."""
    dot = F.aggregate(
        F.zip_with(F.col(f"{a}.emb_d"), F.col(f"{b}.emb_d"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (F.col(f"{a}.norm") * F.col(f"{b}.norm"))


def cosine_topk(
    queries_df: DataFrame, corpus_df: DataFrame, k: int = TOPK
) -> DataFrame:
    """Exact top-k neighbors of each query vector by cosine.

    The query side is broadcast; the corpus streams through map-side.
    Ranking uses (rounded cosine DESC, vec_id ASC) so the cut is
    deterministic.
    """
    from pyspark.sql.window import Window

    q = with_norm(queries_df).select(
        F.col("vec_id").alias("q_id"), "emb_d", "norm"
    )
    c = with_norm(corpus_df).select(
        F.col("vec_id").alias("neighbor_id"), "emb_d", "norm"
    )
    qa, ca = q.alias("q"), c.alias("c")
    cos = F.round(cosine_expr("q", "c"), 6)
    scored = (
        ca.join(F.broadcast(qa), F.col("q.q_id") != F.col("c.neighbor_id"))
        .select("q_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "neighbor_id", "cosine", "rnk")
    )


@query(
    "similarity_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe FROM embeddings
               WHERE {N_QUERIES_PRED}),
         scored AS (
            SELECT q_id, c.vec_id AS neighbor_id,
                   round(list_cosine_similarity(qe, c.embedding::DOUBLE[]), 6) AS cosine
            FROM q JOIN embeddings c ON c.vec_id != q_id
         ),
         ranked AS (
            SELECT q_id, neighbor_id, cosine,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, neighbor_id) AS rnk
            FROM scored
         )
    SELECT q_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= {TOPK}
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for the first five vectors (baseline ANN truth)."""
    e = load(spark, sf_dir, "embeddings")
    return cosine_topk(e.where(N_QUERIES_PRED), e, TOPK)


# ---------------------------------------------------------------------------
# ANN: random-hyperplane LSH
# ---------------------------------------------------------------------------


def _hyperplanes(spark: SparkSession, dim: int) -> DataFrame:
    """(table, plane, dim, w) rows with w in {-1, +1}, derived from
    xxhash64 so every executor regenerates the same planes."""
    return (
        spark.range(LSH_TABLES * LSH_BITS * dim)
        .select(
            (F.col("id") / (LSH_BITS * dim)).cast("int").alias("t"),
            ((F.col("id") / dim) % LSH_BITS).cast("int").alias("p"),
            (F.col("id") % dim).cast("int").alias("d"),
            (
                F.shiftright(F.xxhash64("id"), 7).bitwiseAND(F.lit(1)) * 2 - 1
            ).cast("double").alias("w"),
        )
    )


def lsh_buckets(spark: SparkSession, vecs: DataFrame) -> DataFrame:
    """(vec_id, t, bucket) — one sign-pattern bucket per LSH table.

    posexplode(vector) ⋈ broadcast(planes) → per-(vec, table, plane)
    dot products → sign bits packed into an int bucket id.  All
    aggregates are partial map-side; shuffle is |vecs| × tables rows.
    """
    dim_rows = vecs.select("vec_id", F.posexplode("emb_d").alias("d", "x"))
    planes = _hyperplanes(spark, 64)
    dots = (
        dim_rows.join(F.broadcast(planes), "d")
        .groupBy("vec_id", "t", "p")
        .agg(F.sum(F.col("x") * F.col("w")).alias("dot"))
    )
    bit = F.when(F.col("dot") > 0, F.lit(1)).otherwise(F.lit(0))
    bitval = bit.cast("long") * F.pow(F.lit(2.0), F.col("p").cast("double")).cast("long")
    return (
        dots.withColumn("bitval", bitval)
        .groupBy("vec_id", "t")
        .agg(F.sum("bitval").alias("bucket"))
    )


def ann_lsh_topk(
    spark: SparkSession,
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = TOPK,
) -> DataFrame:
    """Approximate top-k: LSH-bucket candidate join + exact rerank.

    Query buckets are expanded with radius-1 multiprobe (the bucket
    plus each single-bit flip) — for weakly-similar corpora this lifts
    recall from the bare S-curve at the cost of ``1 + bits`` probe
    rows per (query, table), which is negligible against corpus size.
    """
    from pyspark.sql.window import Window

    q = with_norm(queries_df)
    c = with_norm(corpus_df)
    probes = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(LSH_BITS)]
    )
    qb = (
        lsh_buckets(spark, q)
        .withColumnRenamed("vec_id", "q_id")
        .select("q_id", "t", F.explode(probes).alias("bucket"))
    )
    cb = lsh_buckets(spark, c).withColumnRenamed("vec_id", "neighbor_id")
    cand = (
        qb.join(cb, ["t", "bucket"])
        .where(F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "neighbor_id")
        .distinct()
    )
    qv = q.select(F.col("vec_id").alias("q_id"), "emb_d", "norm").alias("q")
    cv = c.select(F.col("vec_id").alias("neighbor_id"), "emb_d", "norm").alias("c")
    cos = F.round(cosine_expr("q", "c"), 6)
    scored = (
        cand.join(F.broadcast(qv), "q_id")
        .join(cv, "neighbor_id")
        .select("q_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "neighbor_id", "cosine", "rnk")
    )


@query("similarity_ann_lsh", oracle=None)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN top-5 (approximate — no SQL oracle;
    tests/test_similarity.py pins recall vs the brute-force baseline)."""
    e = load(spark, sf_dir, "embeddings")
    return ann_lsh_topk(spark, e.where(N_QUERIES_PRED), e, TOPK)
