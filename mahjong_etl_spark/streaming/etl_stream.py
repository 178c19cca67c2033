"""Streaming ETL: the reference's daily batch loop as a live pipeline.

The reference ingests by re-running the whole batch job per date
(run_scraper.sh: cp logs, parse, rsync).  With the tenhou streaming
source this becomes a standing query: new log files are parsed
exactly once per micro-batch — ONE parse per game via the ``_parsed``
pseudo-table (nine per-table streams would parse the same XML nine
times) — and ``foreachBatch`` fans each batch out to the same nine
partitioned parquet sinks the batch ETL writes, with the same minted
kyoku ids (the stream reader rebuilds per-date offsets, so ids are
identical no matter how arrivals chop into batches; pinned by
tests/test_etl_stream.py against plans/etl.py::run_etl output).

Delivery contract: offsets commit AFTER the foreachBatch body, so a
crash mid-fan-out replays the batch — at-least-once into append-mode
parquet (possible duplicate rows for the interrupted batch only).
The batch ETL's dynamic-partition-overwrite backfill
(plans/etl.py::run_etl with date_prefix) is the replay/repair path,
same as any lambda-architecture pairing; an idempotent sink (Delta /
Iceberg MERGE on the minted keys) would upgrade this to effective
exactly-once without touching the source.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..schemas import TABLE_SCHEMAS
from ..sources.tenhou_datasource import PARSED_TABLE, register_tenhou_source


def run_etl_stream(
    spark: SparkSession,
    log_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    compat: bool = True,
    available_now: bool = True,
):
    """Start (and return) the streaming ETL query.

    ``available_now=True`` drains everything currently in ``log_dir``
    and stops — the incremental-daily-run shape; ``False`` leaves a
    standing micro-batch query watching for new files.
    """
    register_tenhou_source(spark)
    parsed = (
        spark.readStream.format("tenhou")
        .option("table", PARSED_TABLE)
        .option("compat", str(compat).lower())
        .load(log_dir)
    )

    def fan_out(batch_df, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            for t in TABLE_SCHEMAS:
                (
                    batch_df.select("dt", F.explode(t).alias("r"))
                    .select("dt", "r.*")
                    .write.mode("append")
                    .partitionBy("dt")
                    .parquet(f"{out_dir}/{t}")
                )
        finally:
            batch_df.unpersist()

    writer = (
        parsed.writeStream.foreachBatch(fan_out)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
