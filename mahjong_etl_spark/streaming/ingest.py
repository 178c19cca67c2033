"""Continuous ingest: the reference's daily batch loop as a stream.

The reference re-runs `main.py` per downloaded date directory
(reference run_scraper.sh, main.py:18-33).  Production shape here:
a ``binaryFile`` readStream watches the log root; each micro-batch of
newly-landed XML files runs through the SAME parse + fanout code as
the batch pipeline (plans/etl.py) inside ``foreachBatch``, appending
to the same ``{table}/dt=.../`` layout.  Exactly-once per file comes
from the file-source checkpoint.

Id minting difference vs batch (documented divergence): the batch
pipeline numbers kyokus densely 0..n-1 per date by game_id — a stream
cannot, because later files must not renumber earlier ones.  Streamed
kyoku ids are content-derived instead:

    kyoku_id = (xxhash64(game_id) >>> 17) * 100 + kyoku_local

— deterministic per game (reprocessing a file mints the same ids),
unique up to a ~2⁻³³ birthday collision across a billion games, and
independent of batch boundaries.  They occupy a disjoint range from
batch ids (hash*100 ≥ 2^40 ≫ days*100000) so the two minting schemes
can coexist in one table; a nightly compaction can rewrite streamed
ids to the dense batch numbering when exact parity matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.etl import PARSED_GAME_SCHEMA, _parse_batches, table_df
from ..schemas import TABLE_SCHEMAS


_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_logs(spark: SparkSession, log_dir: str) -> DataFrame:
    """binaryFile readStream over the log tree (same scan contract as
    sources/xml_source.scan_logs, streaming flavor).  Streaming sources
    cannot infer schemas; binaryFile's is fixed."""
    raw = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", "*.xml")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1000)
        .load(log_dir)
    )
    dt_raw = F.regexp_extract(F.col("path"), r"/(\d{8})/[^/]*$", 1)
    game_id = F.regexp_extract(F.col("path"), r"/([^/]+)\.xml$", 1)
    return raw.select(
        "content", dt_raw.alias("dt_raw"), game_id.alias("game_id")
    ).where(F.col("dt_raw") != "")


def start_ingest(
    spark: SparkSession,
    log_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    compat: bool = True,
    available_now: bool = False,
):
    """Start the continuous ETL; returns the StreamingQuery."""
    from ..shipping import ensure_shipped

    ensure_shipped(spark)
    parse = _parse_batches(compat)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        parsed = (
            batch_df.mapInPandas(parse, schema=PARSED_GAME_SCHEMA)
            .where(F.col("error").isNull())
            .persist()
        )
        try:
            # table_df mints days*100000 + kyoku_offset + local; solve
            # for the hash-based id by folding the date term into the
            # per-game offset (see module docstring)
            hash_base = F.shiftrightunsigned(F.xxhash64("game_id"), 17) * 100
            offsets = parsed.select("dt", "game_id", "days", "n_kyokus").withColumn(
                "kyoku_offset", hash_base - F.col("days") * 100000
            )
            for table in TABLE_SCHEMAS:
                table_df(parsed, offsets, table).write.mode("append").partitionBy(
                    "dt"
                ).parquet(f"{out_dir}/{table}")
        finally:
            parsed.unpersist()

    writer = (
        stream_logs(spark, log_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
