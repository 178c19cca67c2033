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
  the SAME ``publish_batch`` the streaming ETL and the binaryFile
  ingest use (partitioned by ``cluster`` instead of ``dt``) — one
  copy of the effective-exactly-once delivery contract: a replayed
  batch erases its own leftovers before re-moving files in, a
  committed batch short-circuits on its marker, and a crash at any
  point replays into the same final file set (the
  erase-before-republish argument of streaming/etl_stream.py).

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

from .etl_stream import _lineage_id, publish_batch

# (applicationId, index_dir) -> centroid ndarray.  Keyed by
# applicationId, not id(sc) (ids reuse after stop).  Landed index
# snapshots are treated as immutable, and the one sanctioned way to
# retrain in place — operators/similarity.py::write_ivf_index —
# invalidates this cache for its path (invalidate_centroids below),
# so a same-application rebuild is never assigned against stale
# centroids.  An out-of-band overwrite from ANOTHER process remains
# invisible (rebuild to a new directory in that deployment shape).
_CENTROID_CACHE: dict[tuple, object] = {}


def invalidate_centroids(index_dir: str) -> None:
    """Drop every cached centroid matrix for ``index_dir`` (called by
    write_ivf_index on rewrite, any application)."""
    for key in [k for k in _CENTROID_CACHE if k[1] == index_dir]:
        del _CENTROID_CACHE[key]


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
        assigned = assign_batch(session, batch_df, index_dir)
        # the shared replay-idempotent publish (marker short-circuit,
        # staged erase-before-republish, marker-after-all-tables) —
        # one copy of the exactly-once contract for ETL, ingest and
        # this stream
        publish_batch(
            session,
            index_dir,
            f"{lineage}-{batch_id}",
            {"postings": assigned},
            part_col="cluster",
        )

    writer = (
        vectors_stream.writeStream.foreachBatch(maintain)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
