"""Empirical scaling probe: do the headline plans scale LINEARLY?

SCALE.md argues every operator's plan survives a 100x scale-up; this
probe measures the first decade of that claim instead of asserting it.
It synthesizes an sf1-equivalent corpus by unioning 10 key-shifted
copies of the sf0.1 tables (ids offset so joins/groupings fan out
rather than collapse onto the originals), writes it once to a scratch
directory shaped exactly like a driver sf_dir, and times a
representative query per plan family at 1x and 10x.

A healthy (shuffle-bound or scan-bound) plan shows time ratio ~= data
ratio (plus fixed overhead, so ratios BELOW 10 are expected at these
sizes); a plan with a hidden quadratic term (all-pairs join, driver
collect, unpartitioned window) blows past it.  Run manually:

    python tests/scale_probe.py [base_sf_dir] [out_json] [copies] [probe ...]

``copies`` (default 10) sets the scale multiple — 100 gives the second
measured decade (sf10-equivalent, ~60M lineitem rows) for the cheaper
families.  Not part of the pytest suite — it takes minutes by design.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


PROBES = [
    # one per plan family: scan-agg, fact-dim join, window, hash dedup,
    # explode-agg, dense-expansion distinct, minhash banding
    "q1_pricing_summary",
    "q3_shipping_priority",
    "events_sessionized",
    "dedup_exact",
    "text_token_stats",
    "events_rolling_wau",
    "dedup_minhash_lsh",
    # SemDeDup: k is capped (dedup.SEM_K_CAP) and centroids are
    # broadcast, not closure-captured, so the thing to watch here is
    # BOTH the time ratio and driver_rss_delta_mb staying ~flat as n
    # grows 10x (r5 verdict item 2).
    "dedup_semantic",
    # media plane: pure-Python codec inside Arrow batches — per-doc
    # CPU cost is constant, so the ratio must track the doc count
    "multimodal_jpeg_roundtrip",
    # LM scoring: count-table joins; vocabulary grows sublinearly so
    # the join stays vocabulary-bounded
    "text_bigram_lm_scores",
]

# table -> (id columns to shift, rows-per-sf0.1 offset stride)
SHIFTS = {
    "events": {"event_id": 10_000_000, "user_id": 100_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000},
}
COPY_ONLY = ["region", "nation", "customer", "supplier", "part"]


def synthesize(spark, base: str, out: str, copies: int = 10) -> None:
    from pyspark.sql import functions as F

    from mahjong_etl_spark.sources.tables import load

    os.makedirs(out, exist_ok=True)
    for t in COPY_ONLY:
        shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    for t, shifts in SHIFTS.items():
        df = load(spark, base, t)
        parts = []
        for i in range(copies):
            part = df
            for col, stride in shifts.items():
                part = part.withColumn(col, F.col(col) + F.lit(i * stride))
            parts.append(part)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        # one flat parquet dir per table, mirroring the driver layout
        u.repartition(32).write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def _driver_rss_mb() -> float:
    """Driver-process resident set in MB (linux /proc, no psutil)."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def time_query(reg, name, spark, sf_dir) -> tuple[float, float]:
    rss0 = _driver_rss_mb()
    t0 = time.time()
    # count() forces full execution without driver-side materialization
    reg[name].spark_fn(spark, sf_dir).count()
    return time.time() - t0, _driver_rss_mb() - rss0


def main(base: str, out_json: str, copies: int = 10, probes=None) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mahjong_etl_spark.session import get_spark

    from mahjong_etl_spark.plans.registry import registry

    # r13: probe under the PRODUCTION session config (get_spark: AQE,
    # 64 MiB broadcast threshold, Arrow), not a bespoke one — the
    # bespoke local[16]/no-AQE session this script used through r12
    # measured plans the shipped engine never produces (e.g. the
    # minhash sliver joins fell from AQE-broadcast to sort-merge,
    # inflating the sf0.1 row ~40%).  Cores come from
    # SPARK_GRAFT_CPUS (default all), driver heap from
    # SPARK_DRIVER_MEM — export SPARK_DRIVER_MEM=48g for 100x runs.
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark("scale-probe")
    reg = registry()
    scratch = f"/tmp/scale_probe_{copies}x"
    if not os.path.exists(f"{scratch}/lineitem.parquet"):
        print(f"synthesizing {copies}x corpus ...", flush=True)
        synthesize(spark, base, scratch, copies)

    # self-certifying measurements (r12 verdict item 2): record host
    # load around the run, same convention as bench.py, so a probe
    # number carries its own weather and a quiet-host claim is
    # checkable from the artifact alone.
    results = {"load_run_start": [round(x, 2) for x in os.getloadavg()]}
    if probes and probes == ["pq_qcount"]:
        # Query-COUNT scaling for the PQ ANN path (r6 verdict item 8):
        # same corpus, 10x the query set.  Expected sublinear-in-nq
        # wall time at small nq (the coded-corpus scan dominates) and
        # ~linear once the chunked score matmul dominates; memory is
        # bounded by PQ_Q_BLOCK/PQ_Q_CHUNK regardless of nq.
        from mahjong_etl_spark.operators import similarity as S

        def pq_at(nq: int) -> float:
            e = S.corpus_embeddings(spark, base)
            t0 = time.time()
            S.ann_pq_topk(spark, e.where(f"vec_id < {nq}"), e, S.TOPK).count()
            return time.time() - t0

        pq_at(10)  # warm
        for nq in (100, 1000):
            a, b = pq_at(nq), pq_at(nq)
            results[f"similarity_ann_pq_nq{nq}"] = {"t_sec": round(min(a, b), 3)}
            print(f"pq nq={nq}: {min(a, b):.3f}s", flush=True)
        r10 = (
            results["similarity_ann_pq_nq1000"]["t_sec"]
            / max(results["similarity_ann_pq_nq100"]["t_sec"], 1e-9)
        )
        results["similarity_ann_pq_qcount_ratio_10x"] = {"ratio": round(r10, 2)}
        results["load_run_end"] = [round(x, 2) for x in os.getloadavg()]
        with open(out_json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"\nquery-count 10x ratio: {r10:.2f}")
        return 1 if r10 > 20 else 0

    if probes and probes == ["neardup_gate"]:
        # Admission-gate drain throughput (r13 verdict item 5): the
        # gate is the newest load-bearing streaming path — drain ~10k
        # arrivals (half fresh, half exact copies of indexed docs)
        # against a {copies}x-sized persisted index in all three
        # flagging modes.  The work to watch: band-hit probe cost is
        # batch-linear + matched-bucket shuffle (corpus-size-
        # independent), within_batch adds one batch-sized self-join,
        # and verify mode prices the candidate join against the
        # PERSISTED shingle relation (pre-computed arrays — the r14
        # change; pre-r14 it re-shingled the corpus text per batch).
        import shutil as _shutil

        from pyspark.sql import functions as F

        from mahjong_etl_spark.operators.minhash_index import (
            write_minhash_index,
        )
        from mahjong_etl_spark.sources.tables import load
        from mahjong_etl_spark.streaming.ann_index_stream import (
            run_neardup_admission_stream,
        )

        dscratch = f"/tmp/scale_probe_docs_{copies}x"
        if not os.path.exists(f"{dscratch}/documents.parquet"):
            os.makedirs(dscratch, exist_ok=True)
            df = load(spark, base, "documents")
            parts = [
                df.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * 1_000_000)
                )
                for i in range(copies)
            ]
            u = parts[0]
            for p in parts[1:]:
                u = u.unionAll(p)
            u.repartition(32).write.mode("overwrite").parquet(
                f"{dscratch}/documents.parquet"
            )
        docs = spark.read.parquet(f"{dscratch}/documents.parquet").select(
            "doc_id", "text"
        )
        n_docs = docs.count()
        index0 = f"{dscratch}/mh_index"
        t0 = time.time()
        if not os.path.exists(f"{index0}/bands"):
            write_minhash_index(spark, docs, index0)
            results["neardup_index_build"] = {
                "n_docs": n_docs,
                "t_sec": round(time.time() - t0, 3),
            }
        n_arr = 10_000
        drop = f"{dscratch}/arrivals"
        if not os.path.exists(drop):
            fresh = spark.range(n_arr // 2).select(
                (F.col("id") + 900_000_000).alias("doc_id"),
                F.concat_ws(
                    " ",
                    *[
                        F.concat(F.lit(f"fr{j}x"), F.col("id"))
                        for j in range(8)
                    ],
                ).alias("text"),
            )
            dup = (
                docs.orderBy("doc_id")
                .limit(n_arr // 2)
                .select(
                    (F.col("doc_id") + 800_000_000).alias("doc_id"), "text"
                )
            )
            # 4 files -> 4 micro-batches of ~2500 arrivals each
            fresh.unionByName(dup).repartition(4).write.mode(
                "overwrite"
            ).parquet(drop)

        def drain(mode_kw: dict, tag: str) -> None:
            idx = f"{dscratch}/mh_{tag}"
            if os.path.exists(idx):
                _shutil.rmtree(idx)
            _shutil.copytree(index0, idx)
            ckpt = f"{dscratch}/ckpt_{tag}"
            if os.path.exists(ckpt):
                _shutil.rmtree(ckpt)
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(drop)
            )
            t0 = time.time()
            q = run_neardup_admission_stream(
                spark, stream, idx, ckpt, **mode_kw
            )
            ok = q.awaitTermination(1800)
            q.stop()
            wall = time.time() - t0
            adm = spark.read.parquet(f"{idx}/admissions")
            na = adm.count()
            nq = adm.where("NOT admitted").count()
            results[f"neardup_gate_{tag}"] = {
                "n_docs_index": n_docs,
                "n_arrivals": na,
                "n_batches": 4,
                "wall_sec": round(wall, 3),
                "arrivals_per_sec": round(na / wall, 1),
                "flag_rate": round(nq / na, 4) if na else None,
                "drained": bool(ok),
            }
            print(
                f"neardup_gate_{tag:12} {na} arrivals vs {n_docs}-doc "
                f"index: {wall:7.2f}s  {na / wall:7.1f}/s  "
                f"flag_rate={nq / max(na, 1):.3f}",
                flush=True,
            )

        drain({}, "bandhit")
        drain({"within_batch": True}, "withinbatch")
        drain({"threshold": 0.5}, "verify")
        results["load_run_end"] = [round(x, 2) for x in os.getloadavg()]
        with open(out_json, "w") as f:
            json.dump(results, f, indent=2)
        return 0

    if probes and probes == ["semantic_gate"]:
        # Semantic-gate drain throughput (r14): the embedding-plane
        # admission gate against a {copies}x-sized IVFADC index —
        # same shape as the neardup_gate probe (10k arrivals, half
        # fresh seeded gaussians / half exact copies of indexed
        # vectors, 4 AvailableNow micro-batches).  The work to watch:
        # per batch, the ADC nomination scans the codes table once
        # (corpus-linear scan, batch-bounded driver tables) and the
        # exact verify joins <= rerank candidates/query against the
        # persisted vector relation's matched shards — no term grows
        # faster than the index itself.  Modes: persisted-vector
        # verify (the default decision path), + within_batch
        # self-pairs, and adc_bar over a vectors-less copy of the
        # same index (the calibrated-bar escape hatch: nomination
        # scan only, no verify join).
        import shutil as _shutil

        import numpy as _np
        from pyspark.sql import functions as F

        from mahjong_etl_spark.operators.similarity import (
            write_ivfpq_index,
        )
        from mahjong_etl_spark.streaming.ann_index_stream import (
            run_semantic_admission_stream,
        )

        escratch = f"/tmp/scale_probe_embs_{copies}x"
        if not os.path.exists(f"{escratch}/embeddings.parquet"):
            os.makedirs(escratch, exist_ok=True)
            e = spark.read.parquet(f"{base}/embeddings.parquet").select(
                "vec_id",
                F.expr(
                    "transform(embedding, x -> cast(x AS double))"
                ).alias("embedding"),
            )
            parts = [
                e.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(i * 1_000_000)
                )
                for i in range(copies)
            ]
            u = parts[0]
            for p in parts[1:]:
                u = u.unionAll(p)
            u.repartition(32).write.mode("overwrite").parquet(
                f"{escratch}/embeddings.parquet"
            )
        vecs = spark.read.parquet(f"{escratch}/embeddings.parquet")
        n_vecs = vecs.count()
        index0 = f"{escratch}/pq_index"
        t0 = time.time()
        if not os.path.exists(f"{index0}/codes"):
            write_ivfpq_index(spark, vecs, index0, with_vectors=True)
            results["semantic_index_build"] = {
                "n_vecs": n_vecs,
                "t_sec": round(time.time() - t0, 3),
            }
        n_arr = 10_000
        drop = f"{escratch}/arrivals"
        if not os.path.exists(drop):
            dim = len(vecs.select("embedding").first().embedding)
            rng = _np.random.default_rng(7)
            fresh_rows = [
                (
                    int(900_000_000 + i),
                    [float(x) for x in rng.standard_normal(dim)],
                )
                for i in range(n_arr // 2)
            ]
            fresh = spark.createDataFrame(
                fresh_rows, "vec_id long, embedding array<double>"
            )
            dup = (
                vecs.orderBy("vec_id")
                .limit(n_arr // 2)
                .select(
                    (F.col("vec_id") + 800_000_000).alias("vec_id"),
                    "embedding",
                )
            )
            fresh.unionByName(dup).repartition(4).write.mode(
                "overwrite"
            ).parquet(drop)

        drop1 = f"{escratch}/arrivals_1file"
        if not os.path.exists(drop1):
            spark.read.parquet(drop).repartition(1).write.mode(
                "overwrite"
            ).parquet(drop1)

        def sdrain(
            mode_kw: dict, tag: str, strip_vectors=False, src=None
        ) -> None:
            idx = f"{escratch}/pq_{tag}"
            if os.path.exists(idx):
                _shutil.rmtree(idx)
            _shutil.copytree(index0, idx)
            if strip_vectors:
                _shutil.rmtree(f"{idx}/vectors")
            ckpt = f"{escratch}/ckpt_{tag}"
            if os.path.exists(ckpt):
                _shutil.rmtree(ckpt)
            stream = (
                spark.readStream.schema(
                    "vec_id long, embedding array<double>"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(src or drop)
            )
            t0 = time.time()
            q = run_semantic_admission_stream(
                spark, stream, idx, ckpt, **mode_kw
            )
            ok = q.awaitTermination(1800)
            q.stop()
            wall = time.time() - t0
            adm = spark.read.parquet(f"{idx}/admissions")
            na = adm.count()
            nq = adm.where("NOT admitted").count()
            results[f"semantic_gate_{tag}"] = {
                "n_vecs_index": n_vecs,
                "n_arrivals": na,
                "n_batches": 1 if src else 4,
                "wall_sec": round(wall, 3),
                "arrivals_per_sec": round(na / wall, 1),
                "flag_rate": round(nq / na, 4) if na else None,
                "drained": bool(ok),
            }
            print(
                f"semantic_gate_{tag:12} {na} arrivals vs {n_vecs}-vec "
                f"index: {wall:7.2f}s  {na / wall:7.1f}/s  "
                f"flag_rate={nq / max(na, 1):.3f}",
                flush=True,
            )

        sdrain({}, "verify")
        sdrain({"within_batch": True}, "withinbatch")
        sdrain({"adc_bar": 0.3}, "adcbar", strip_vectors=True)
        # amortization check: per-batch cost is scan-dominated (one
        # codes pass + publishes), so one 10k-arrival batch should
        # beat 4x 2.5k batches on arrivals/s
        sdrain({}, "verify_1batch", src=drop1)
        results["load_run_end"] = [round(x, 2) for x in os.getloadavg()]
        with open(out_json, "w") as f:
            json.dump(results, f, indent=2)
        return 0

    for name in probes or PROBES:
        # warm both paths once (JIT/IO cache), then measure
        t1, rss1 = time_query(reg, name, spark, base)
        t10, rss10 = time_query(reg, name, spark, scratch)
        t1b, _ = time_query(reg, name, spark, base)
        t10b, _ = time_query(reg, name, spark, scratch)
        r = {
            "t_1x_sec": round(min(t1, t1b), 3),
            f"t_{copies}x_sec": round(min(t10, t10b), 3),
            "ratio": round(min(t10, t10b) / max(min(t1, t1b), 1e-9), 2),
            # first-run (cold) driver RSS growth at each scale: a plan
            # that collects O(n) state shows rss growing with copies
            "driver_rss_delta_mb_1x": round(rss1, 1),
            f"driver_rss_delta_mb_{copies}x": round(rss10, 1),
        }
        results[name] = r
        print(f"{name:28} 1x={r['t_1x_sec']:7.3f}s  {copies}x="
              f"{r[f't_{copies}x_sec']:7.3f}s  ratio={r['ratio']}", flush=True)
    results["load_run_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    bad = [
        n
        for n, r in results.items()
        if isinstance(r, dict) and r.get("ratio", 0) > 2 * copies
    ]
    print(f"\nsuper-linear (>{2*copies}x) plans: {bad or 'none'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
            sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe_results.json",
            int(sys.argv[3]) if len(sys.argv) > 3 else 10,
            sys.argv[4:] or None,
        )
    )
