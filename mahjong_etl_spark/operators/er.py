"""Entity resolution: blocked fuzzy-match join + entity clustering.

The record-linkage pipeline a catalog/dedup system runs over dirty
entity names (reference parity: the reference has no ER surface — this
is part of the §7-step-6 LLM-data-pipeline extension plane; training
corpora carry author/site/product entities that must be resolved
before per-entity quota capping or decontamination):

  1. collapse records to DISTINCT names (exact-dedup stage — ER
     operates on the name domain, not the record stream),
  2. BLOCK on a cheap deterministic key (here the head noun of the
     name) so candidate generation is an equi-join, never all-pairs,
  3. VERIFY candidates with an edit-distance predicate evaluated
     JVM-side (``F.levenshtein`` — whole-stage codegen, no UDF),
  4. CLUSTER verified pairs with connected components and elect a
     canonical representative per entity.

100 TB design: the distinct-name table is bounded by the *name
domain* (≪ record count; the groupBy that builds it is the only
record-scale shuffle).  Candidate pairs are produced by a self
equi-join on the block key, so cost is Σ block_size², controlled by
block-key choice exactly like the shingle-postings dedup path
(operators/dedup.py) — a hot block is a data-quality signal surfaced
by events_key_skew_profile's pattern, and AQE's skew-join split
handles residual imbalance.  The verify predicate lives in the join
condition, so Catalyst keeps it inside the same exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import query
from ..sources.tables import load
from .corpus import connected_components

# max edit distance for two names to be the same entity (mirrored in
# the oracle SQL — DuckDB's levenshtein is the same unit-cost
# insert/delete/substitute distance as Spark's)
LEV_T = 3


def distinct_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per distinct part name: block key (head noun), record
    count, and the min part key as the stable name id."""
    p = load(spark, sf_dir, "part")
    return p.groupBy("p_name").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_partkey").alias("name_key"),
    ).withColumn("block", F.substring_index("p_name", " ", -1))


def fuzzy_name_pairs(names: DataFrame) -> DataFrame:
    """Verified candidate pairs: same block, levenshtein <= LEV_T.

    The distance predicate sits in the join condition so it is
    evaluated during the sort-merge/hash join probe — no intermediate
    all-pairs materialization.  r14 (guide §1.2 per-task work): the
    predicate uses the THRESHOLD form ``levenshtein(a, b, LEV_T)``
    (banded O(n·k) DP with early exit, -1 past the bound) instead of
    the full O(n·m) distance — the block join compares Σ block_size²
    candidate pairs and nearly all of them are far apart, so the
    banded form does a small fraction of the cell work.  Equivalent by
    construction: banded ≥ 0 ⇔ full ≤ LEV_T, and for every surviving
    pair the banded value IS the exact distance (only values ≤ the
    bound are emitted)."""
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("name_key").alias("key_a"),
        F.col("n_parts").alias("parts_a"),
        "block",
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("name_key").alias("key_b"),
        F.col("n_parts").alias("parts_b"),
        F.col("block").alias("block_b"),
    )
    return a.join(
        b,
        (F.col("block") == F.col("block_b"))
        & (F.col("name_a") < F.col("name_b"))
        & (F.levenshtein("name_a", "name_b", LEV_T) >= 0),
    ).select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b", LEV_T).alias("dist"),
        "key_a",
        "key_b",
        "parts_a",
        "parts_b",
    )


_ER_NAMES_CTE = """
    WITH RECURSIVE names AS (
        SELECT p_name,
               split_part(p_name, ' ', -1) AS block,
               count(*) AS n_parts,
               min(p_partkey) AS name_key
        FROM part GROUP BY 1, 2
    )
"""


@query(
    "er_fuzzy_name_pairs",
    oracle=f"""{_ER_NAMES_CTE}
    SELECT a.p_name AS name_a,
           b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist,
           a.name_key AS key_a,
           b.name_key AS key_b,
           a.n_parts AS parts_a,
           b.n_parts AS parts_b
    FROM names a JOIN names b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {LEV_T}
    """,
)
def er_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy-match join: every pair of distinct part names in
    the same head-noun block within edit distance {LEV_T}."""
    return fuzzy_name_pairs(distinct_names(spark, sf_dir))


@query(
    "er_resolve_entities",
    oracle=f"""{_ER_NAMES_CTE},
    pairs AS (
        SELECT a.name_key AS ka, b.name_key AS kb
        FROM names a JOIN names b
          ON a.block = b.block AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= {LEV_T}
    ),
    edges AS (
        SELECT ka AS a, kb AS b FROM pairs
        UNION SELECT kb, ka FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach AS (
        SELECT id, id AS label FROM nodes
        UNION
        SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id
    ),
    comp AS (SELECT id, min(label) AS entity_id FROM reach GROUP BY id),
    m AS (
        SELECT c.entity_id, n.p_name, n.n_parts
        FROM comp c JOIN names n ON n.name_key = c.id
    ),
    ranked AS (
        SELECT entity_id, p_name, n_parts,
               row_number() OVER (
                   PARTITION BY entity_id
                   ORDER BY n_parts DESC, p_name ASC
               ) AS rn,
               count(*) OVER (PARTITION BY entity_id) AS n_names,
               sum(n_parts) OVER (PARTITION BY entity_id) AS tot
        FROM m
    )
    SELECT entity_id,
           p_name AS canonical_name,
           CAST(n_names AS BIGINT) AS n_names,
           CAST(tot AS BIGINT) AS n_records
    FROM ranked WHERE rn = 1
    """,
)
def er_resolve_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy pairs resolved into entities: connected components over
    the verified name graph, one canonical name per entity (most
    records wins, lexicographic tie-break), with name/record counts.
    The oracle recomputes the clustering as a recursive-CTE transitive
    closure, so the full block→verify→cluster→elect path is
    hash-checked end-to-end.  Only names that matched something appear
    (singletons are implicitly their own entity, as in the dedup
    chain's corpus_canonical_docs)."""
    names = distinct_names(spark, sf_dir)
    edges = fuzzy_name_pairs(names).select("key_a", "key_b")
    comp = connected_components(edges, a_col="key_a", b_col="key_b")
    m = comp.join(names, comp.id == names.name_key).select(
        F.col("cluster_id").alias("entity_id"), "p_name", "n_parts"
    )
    w = Window.partitionBy("entity_id")
    ranked = m.select(
        "entity_id",
        "p_name",
        F.row_number()
        .over(w.orderBy(F.desc("n_parts"), F.asc("p_name")))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_names"),
        F.sum("n_parts").over(w).alias("tot"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "entity_id",
        F.col("p_name").alias("canonical_name"),
        F.col("n_names").cast("long").alias("n_names"),
        F.col("tot").cast("long").alias("n_records"),
    )
