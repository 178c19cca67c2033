"""Streaming IVF index maintenance: keep a persisted ANN index's
inverted lists current as new vectors arrive.

Closes the index lifecycle the batch plane opened
(operators/similarity.py): ``write_ivf_index`` trains the coarse
quantizer and materializes (centroids, postings) once per corpus
snapshot; THIS stream keeps the postings current between snapshot
rebuilds — the production shape for a growing embedding corpus, where
re-assigning the full corpus per arrival batch (or worse, retraining)
is exactly the cost an inverted-file index exists to avoid.

Per micro-batch of (vec_id, embedding) rows:

- assign each vector to its nearest persisted centroid — the SAME
  one-matmul-per-Arrow-batch pass the batch plane uses
  (``_assign_clusters``), against the SAME centroids (read once per
  (session, index) and cached, so a standing stream pays the
  centroid read exactly once);
- append the (cluster, vec_id) rows into ``{index}/postings`` through
  the repo's batch-keyed staged publish (``_publish_table_df``,
  partitioned by ``cluster`` instead of ``dt``) plus a
  ``_batch_commits`` marker — the identical effective-exactly-once
  delivery contract as the streaming ETL: a replayed batch erases its
  own leftovers before re-moving files in, a committed batch
  short-circuits, and a crash at any point replays into the same
  final file set (same erase-before-republish argument as
  streaming/etl_stream.py).

Because the centroids are FROZEN between rebuilds, assignment is
deterministic and the maintained index is BIT-IDENTICAL to a batch
``write_ivf_index`` over the union corpus with the same centroids —
pinned by tests/test_ann_index_stream.py, which serves queries from
the maintained index and from a from-scratch rebuild and demands
identical rows.  Drift is the documented operational limit: a frozen
quantizer's cells grow as the corpus distribution shifts, so a real
deployment retrains on a cadence (the snapshot rebuild) while this
stream carries the hours between — the FAISS ``add`` vs ``train``
split, expressed as Spark streaming.

Scale shape: per batch, one mapInPandas matmul over the batch's rows
(no corpus scan, no shuffle — the cluster id IS the partition key of
the write), file count bounded by clusters-touched per batch, state
NONE (the index directory is the state).  At 100 TB the postings
table is fact-scale but the stream only ever appends batch-sized
slices; small posting files accumulate at one-per-(batch, cluster)
until the next snapshot rebuild, which IS the compaction (a rebuild
rewrites postings from scratch with fresh centroids — the moment the
drift limit forces anyway).  plans/compaction.py itself is dt-scoped
and does not apply here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .etl_stream import _lineage_id, _meta_fs, _publish_table_df

# (applicationId, index_dir) -> centroid ndarray; landed index
# snapshots are immutable (a rebuild writes a NEW index dir), so the
# cache never staleness-checks.  Keyed by applicationId, not id(sc)
# (ids reuse after stop).
_CENTROID_CACHE: dict[tuple, object] = {}


def _index_centroids(spark: SparkSession, index_dir: str):
    from ..operators.similarity import _read_ndarray

    key = (spark.sparkContext.applicationId, index_dir)
    hit = _CENTROID_CACHE.get(key)
    if hit is None:
        hit = _read_ndarray(spark, f"{index_dir}/centroids")
        _CENTROID_CACHE[key] = hit
    return hit


def assign_batch(
    spark: SparkSession, vectors: DataFrame, index_dir: str
) -> DataFrame:
    """(cluster, vec_id) for a batch of (vec_id, embedding) rows,
    assigned against the persisted index's frozen centroids."""
    from ..operators.similarity import _assign_clusters, with_norm

    cents = _index_centroids(spark, index_dir)
    return _assign_clusters(with_norm(vectors), cents).select(
        "cluster", "vec_id"
    )


def run_ivf_maintenance_stream(
    spark: SparkSession,
    vectors_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and return) the standing index-maintenance query.

    ``vectors_stream`` must carry ``vec_id`` and ``embedding``
    (array<float/double>) — the same columns the batch index builder
    reads."""
    lineage = _lineage_id(spark, checkpoint_dir)

    def maintain(batch_df: DataFrame, batch_id: int) -> None:
        session = batch_df.sparkSession
        fs = _meta_fs(session, index_dir)
        key = f"{lineage}-{batch_id}"
        marker = f"{fs.root}/_batch_commits/{key}"
        if fs.kind(marker) is not None:
            return  # committed before a crash: replay is a no-op
        assigned = assign_batch(session, batch_df, index_dir)
        _publish_table_df(
            assigned, "postings", index_dir, key, fs, part_col="cluster"
        )
        bdir = f"{fs.root}/_staging/batch-{key}"
        if fs.kind(bdir) is not None:
            fs.delete_dir(bdir)
        fs.mkdirs(f"{fs.root}/_batch_commits")
        fs.write_bytes(marker, b"")

    writer = (
        vectors_stream.writeStream.foreachBatch(maintain)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
