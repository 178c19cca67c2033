#!/usr/bin/env python
"""r15: phase-level profile of the mahjong ETL plane (guide §1).

Replays bench.py's mahjong_etl_1k probe (same synthetic 1k-game
corpus, same untimed warm-up run) but times each phase of run_etl
separately by mirroring its body with timers:

  parse+persist+bookkeeping | offsets materialize | each of the 9
  sinks (serial timing of the concurrent pool is reported as the pool
  wall) | retire-stale partition drops

Also reports end-to-end run_etl seconds (the bench's number) for N
repetitions so the phase split can be sanity-checked against it.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from mahjong_etl_spark.plans import etl
    from mahjong_etl_spark.session import get_spark
    from mahjong_etl_spark.sources.synth_games import generate_corpus

    spark = get_spark("profile-etl-r15")
    spark.sparkContext.setLogLevel("ERROR")

    log_dir = generate_corpus("/tmp/spark_graft_synth_corpus", n_games=1000)
    out_dir = tempfile.mkdtemp(prefix="etl_profile_")

    try:
        # untimed warm-up, same as bench.py
        etl.run_etl(spark, log_dir, out_dir)

        # end-to-end repetitions (the bench's timed quantity)
        for i in range(n_runs):
            shutil.rmtree(out_dir, ignore_errors=True)
            t0 = time.perf_counter()
            etl.run_etl(spark, log_dir, out_dir)
            print(f"run_etl end-to-end [{i}]: "
                  f"{time.perf_counter() - t0:.3f}s")

        # phase-split run (mirrors run_etl's body)
        import pyspark.sql.functions as F

        shutil.rmtree(out_dir, ignore_errors=True)
        TABLE_SCHEMAS = __import__(
            "mahjong_etl_spark.schemas", fromlist=["TABLE_SCHEMAS"]
        ).TABLE_SCHEMAS
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        t0 = time.perf_counter()
        parsed = etl.parse_logs(spark, log_dir, True, None).persist()
        per_dt = parsed.groupBy("dt").agg(
            F.sum(
                F.when(F.col("error").isNotNull(), 1).otherwise(0)
            ).alias("_n_err"),
            *[
                F.coalesce(
                    F.sum(F.when(F.col("error").isNull(), F.size(t))),
                    F.lit(0),
                ).alias(t)
                for t in TABLE_SCHEMAS
            ],
        ).collect()
        t_parse = time.perf_counter() - t0

        t0 = time.perf_counter()
        good = parsed.where(F.col("error").isNull())
        offsets = etl._with_offsets(good).persist()
        offsets.count()
        t_offsets = time.perf_counter() - t0

        sizes = {t: sum(int(r[t]) for r in per_dt) for t in TABLE_SCHEMAS}
        tiny_tables = {
            t for t, n in sizes.items() if n <= etl.SMALL_SINK_ROWS
        }
        print(f"tiny tables: {sorted(tiny_tables)}; sizes: {sizes}")

        sink_secs = {}

        def write_one(table: str) -> None:
            t0 = time.perf_counter()
            df = etl.table_df(good, offsets, table)
            if table in tiny_tables:
                df = df.coalesce(
                    max(1, -(-sizes[table] // etl.SINK_ROWS_PER_TASK))
                )
            else:
                df = df.hint("rebalance", "dt")
            df.write.mode("overwrite").partitionBy("dt").parquet(
                f"{out_dir}/{table}"
            )
            sink_secs[table] = time.perf_counter() - t0

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=len(TABLE_SCHEMAS)) as pool:
            futs = [pool.submit(write_one, t) for t in TABLE_SCHEMAS]
            for f in futs:
                f.result()
        t_sinks_pool = time.perf_counter() - t0

        # serial sink timing (isolates per-sink cost without overlap)
        shutil.rmtree(out_dir, ignore_errors=True)
        sink_serial = {}
        t0 = time.perf_counter()
        for t in TABLE_SCHEMAS:
            s0 = time.perf_counter()
            write_one(t)
            sink_serial[t] = round(time.perf_counter() - s0, 3)
        t_sinks_serial = time.perf_counter() - t0

        parsed.unpersist()
        offsets.unpersist()

        print(f"parse+persist+bookkeeping: {t_parse:.3f}s")
        print(f"offsets materialize:       {t_offsets:.3f}s")
        print(f"9 sinks (concurrent pool): {t_sinks_pool:.3f}s")
        print(f"9 sinks (serial):          {t_sinks_serial:.3f}s")
        print(f"per-sink serial: {sink_serial}")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
