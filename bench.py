#!/usr/bin/env python
"""Benchmark harness: run the headline query set and print ONE JSON
line ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": scale}``.

Inputs come from ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1)
on ``local[$SPARK_GRAFT_CPUS]``.  Each query is executed to completion
(collect) once after a session warm-up; timings are wall-clock
per-query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # host weather at run boundaries (1/5/15-min loadavg): BENCH rows
    # are only comparable round-over-round when the ambient regime is
    # visible in the artifact itself (r11 verdict item 2)
    load_run_start = [round(x, 2) for x in os.getloadavg()]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from mahjong_etl_spark.plans.registry import registry
    from mahjong_etl_spark.session import get_spark

    spark = get_spark("mahjong-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    reg = {n: q for n, q in registry().items() if q.bench}

    # r15 (r14 verdict item 1): everything the bench does before the
    # timed loop is CLOCKED and reported as warmup_sec in the JSON
    # line, so untimed warm-up work is visible in the artifact instead
    # of silently absorbed.
    t_warm0 = time.perf_counter()

    # warm-up: JVM + parquet footer caches, one tiny job, and the
    # Python worker fleet (first Arrow-UDF stage otherwise pays ~32
    # concurrent interpreter+numpy imports — a once-per-executor cost
    # that a long-lived cluster amortizes away, as the session does
    # here via spark.python.worker.reuse)
    spark.range(1000).selectExpr("sum(id)").collect()

    def _noop(it):
        import numpy  # noqa: F401 — preload into the reused workers

        yield from it

    spark.range(64).repartition(32).mapInPandas(_noop, "id long").collect()

    # first local-rows -> Arrow conversion of the session costs ~0.4s
    # (conversion-path init); warm it here so it doesn't land on the
    # first result-shaping query (r8: it was the text_bpe_vocab "1s")
    from mahjong_etl_spark.session import local_rows_df

    local_rows_df(spark, [(0,)], "i int").collect()

    # Warm the SHARED family caches during the untimed warm-up (r10
    # verdict item 2): the session-cached quantizers (the k=16 IVF
    # centroids and the SemDeDup k) are trained by whichever consumer
    # runs FIRST, so without this their Lloyd training landed on the
    # alphabetically-first family member — corpus_topic_clusters swung
    # 0.90 -> 2.40 s across rounds on an unchanged pinned plan purely
    # from cache position vs the outlier re-time bar.  Training is a
    # once-per-corpus-snapshot cost by design (the persisted-quantizer
    # lifecycle), so the steady-state number is the right one for
    # every consumer; a BENCH row must never depend on sort order.
    try:
        from mahjong_etl_spark.operators.dedup import _sem_centroids
        from mahjong_etl_spark.operators.similarity import (
            IVF_CLUSTERS,
            IVF_LLOYD_ITERS,
            corpus_centroids,
            corpus_embeddings,
            corpus_pq_codebooks,
        )

        _emb = corpus_embeddings(spark, sf_dir)
        corpus_centroids(spark, sf_dir, IVF_CLUSTERS, IVF_LLOYD_ITERS)
        _sem_centroids(spark, sf_dir, _emb)
        corpus_pq_codebooks(spark, sf_dir)
        # the IVFADC family cache (r12): unit-space centroids +
        # residual codebooks + persisted coded corpus — without this
        # the whole build lands on similarity_ann_ivfpq's first run
        from mahjong_etl_spark.operators.similarity import corpus_ivfpq

        corpus_ivfpq(spark, sf_dir)[2].count()
        # the adaptive-minhash deciding aggregate (r12): cached per
        # (applicationId, plan semanticHash), so one untimed warm
        # here serves dedup_minhash_lsh AND dedup_ensemble — the
        # once-per-corpus-snapshot policy, same as the quantizers
        from mahjong_etl_spark.operators.dedup import _dup_stats
        from mahjong_etl_spark.sources.tables import load_spread

        _dup_stats(load_spread(spark, sf_dir, "documents"))
    except Exception as exc:  # a missing embeddings table must not
        # kill the whole bench — the queries themselves will report it
        print(f"warm-up: quantizer prewarm skipped: {exc}", file=sys.stderr)
    warmup_sec = time.perf_counter() - t_warm0

    # The text-dedup family's shared relations (shingle sets + the
    # r14 pre-threshold co-occurrence counts + verified Jaccard
    # pairs): persisted lazily, so force the materialization here —
    # but as a NAMED TIMED LINE, not inside the untimed warm-up
    # (r14 verdict item 1: batch 4 moved the shingle pipeline's cache
    # one level earlier, so this fill had silently absorbed work that
    # was timed inside dedup_containment through r13; the fill is a
    # once-per-corpus-snapshot cost by design, and charging it to its
    # own line keeps BOTH it and the steady-state family numbers
    # honest).  Runs before the loop so no family consumer's number
    # depends on alphabetical position, exactly like the quantizers.
    dedup_fill_sec = None
    try:
        from mahjong_etl_spark.operators.dedup import corpus_jaccard_pairs

        t0 = time.perf_counter()
        corpus_jaccard_pairs(spark, sf_dir).count()
        dedup_fill_sec = time.perf_counter() - t0
    except Exception as exc:
        print(f"dedup family cache fill skipped: {exc}", file=sys.stderr)

    def run_one(name: str) -> float:
        t0 = time.perf_counter()
        reg[name].spark_fn(spark, sf_dir).collect()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name in sorted(reg):
        timings[name] = run_one(name)

    # The host is shared: a run occasionally eats a multi-second
    # scheduling stall that lands on one arbitrary query.  Re-time the
    # outliers (>= 3x the set median, floor 2.0s) once and keep the
    # min — steady-state latency, not the stall, is the number that
    # scales.  The FIRST query of the loop is always re-timed: it
    # absorbs one-off whole-session costs no later query pays (first
    # codegen, first broadcast exchange, scan-cache fill — measured
    # ~1.8s landing on alphabetically-first bloom_pruned_revenue in
    # r6, the 1.13->2.71s "regression" that turned out to be position,
    # not plan).  Floor lowered 2.5 -> 2.0 in r11: the r10 topic-
    # clusters artifact landed at 2.30 — just under the old bar — so
    # the training-inclusive first pass stuck; with the quantizer
    # prewarm above that cost is gone from the loop entirely, and the
    # lower floor is the backstop for any shared cost the prewarm
    # doesn't know about yet.
    med = sorted(timings.values())[len(timings) // 2]
    first = sorted(timings)[0]
    n_retimed = 0
    for name, t in list(timings.items()):
        if name == first or t >= max(2.0, 3 * med):
            timings[name] = min(t, run_one(name))
            n_retimed += 1

    # the family-cache fill joins the per-query map AFTER the outlier
    # pass: it is a one-off cache fill, so a "re-time and keep the
    # min" would deliberately measure the warm cache instead (r14
    # verdict item 2 — the re-time rule must not erase fill costs)
    if dedup_fill_sec is not None:
        timings["dedup_family_cache_fill"] = dedup_fill_sec

    # --- mahjong plane throughput (SURVEY §6 "games parsed/sec") ----
    # A deterministic synthetic 1k-game corpus (generation untimed,
    # cached across runs) through the full scan→parse→mint→sink
    # pipeline, then one analytical query over the written star schema.
    #
    # Head-to-head protocol (r10, replacing min-of-each-side): the
    # reference's single-thread parser and the Spark ETL run as
    # INTERLEAVED PAIRS — (ref, etl) × 3 after one untimed ETL warm-up
    # — and the headline speedup is the MEDIAN of the per-pair ratios.
    # Rationale: both sides swing ±25-60% with shared-host load, and a
    # min-of-2 numerator over a min-of-1 denominator does not cancel a
    # ratio's noise (r8/r9: 1.73-2.41 across runs of identical code,
    # the gate undecidable).  A pair samples the same load regime on
    # both sides, so its ratio cancels the common mode; the median of
    # three pairs shrugs off one stalled pair; the spread is reported
    # so a noisy run is VISIBLE instead of silently trusted.  The
    # warm-up absorbs the one-off Python-worker spin-up + codegen for
    # the mapInPandas parse (~1-1.5 s here, amortized to zero on any
    # real corpus).
    import shutil
    import tempfile

    from mahjong_etl_spark.plans.catalog import register_tables
    from mahjong_etl_spark.plans.etl import run_etl
    from mahjong_etl_spark.sources.synth_games import generate_corpus

    n_games = int(os.environ.get("SPARK_GRAFT_SYNTH_GAMES", "1000"))
    log_dir = generate_corpus(
        "/tmp/spark_graft_synth_corpus", n_games=n_games
    )

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

    def _ref_parse_sec() -> float | None:
        """One timed pass of the reference's own parser over the same
        corpus (parse only — no key minting, no parquet writes — so
        the comparison flatters the reference).  None if the reference
        tree is absent."""
        try:
            import glob as _glob
            from collections import defaultdict

            from reference_oracle import run_reference_date

            by_date = defaultdict(list)
            for f in sorted(_glob.glob(os.path.join(log_dir, "*", "*.xml"))):
                dt = os.path.basename(os.path.dirname(f))
                by_date[dt].append(
                    (os.path.splitext(os.path.basename(f))[0], f)
                )
            t0 = time.perf_counter()
            for dt, pairs in sorted(by_date.items()):
                run_reference_date(pairs, dt)
            return time.perf_counter() - t0
        except Exception:
            return None

    etl_times: list[float] = []
    ref_times: list[float] = []
    pair_ratios: list[float] = []
    pair_loads: list[float] = []
    etl_out = tempfile.mkdtemp(prefix="mahjong_bench_etl_")
    try:
        run_etl(spark, log_dir, etl_out)  # untimed warm-up pass

        def _one_pair() -> None:
            # weather report (r11 verdict item 2): the host is shared,
            # and a pair's ratio cancels common-mode load but the raw
            # seconds do not — sample the 1-min loadavg per pair so a
            # round-over-round wall regression is adjudicable from the
            # artifact alone (r11's 1.95->1.55 "regression" took a
            # controlled two-tree re-run to prove ambient)
            pair_loads.append(round(os.getloadavg()[0], 2))
            r = _ref_parse_sec()
            shutil.rmtree(etl_out, ignore_errors=True)
            t0 = time.perf_counter()
            run_etl(spark, log_dir, etl_out)
            e = time.perf_counter() - t0
            etl_times.append(e)
            if r is not None:
                ref_times.append(r)
                pair_ratios.append(r / e)

        for _ in range(3):
            _one_pair()
        # With only 3 pairs a single stalled pair consumes the whole
        # robustness budget of the median (driver's r10 run: pairs
        # [1.90, 2.91, 1.95], spread 1.0).  When the spread is wide,
        # buy two more pairs so the median rests on a majority of
        # clean samples instead of luck (r10 verdict item 2).
        if pair_ratios and max(pair_ratios) - min(pair_ratios) > 0.4:
            for _ in range(2):
                _one_pair()
        timings["mahjong_etl_1k"] = min(etl_times)
        register_tables(spark, etl_out)
        t0 = time.perf_counter()
        spark.sql(
            """
            SELECT y.name, count(*) AS n, avg(a.score) AS avg_score
            FROM agaris a LATERAL VIEW explode(yaku) AS y
            GROUP BY y.name ORDER BY n DESC
            """
        ).collect()
        timings["mahjong_query_1k"] = time.perf_counter() - t0
        # The Python DataSource path over the SAME corpus: actions is
        # the widest table, so this prices the per-row tuple yield
        # against the ETL's Arrow-batched mapInPandas (the documented
        # bulk-ingest route) — the number that justifies that routing.
        from mahjong_etl_spark.sources.tenhou_datasource import (
            register_tenhou_source,
        )

        register_tenhou_source(spark)
        # Twice, keep min — the same steady-state policy as the ETL
        # probe above: the first read through a Python DataSource pays
        # a once-per-session worker/plan spin-up (~4s measured r8, the
        # whole r7 2.88->6.13 "regression"); the second read is the
        # per-corpus cost that scales.
        tenhou_source_sec = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            spark.read.format("tenhou").option("table", "actions").load(
                log_dir
            ).count()
            # informational, like the reference baseline: kept OUT of
            # the headline sum (it re-reads the same corpus the ETL
            # already timed; adding it would double-count that work)
            tenhou_source_sec = round(
                min(tenhou_source_sec, time.perf_counter() - t0), 3
            )
    finally:
        shutil.rmtree(etl_out, ignore_errors=True)

    timings = {k: round(v, 3) for k, v in timings.items()}

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    out = {
        "metric": "headline_query_set_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # the weather report: run-boundary 1/5/15-min loadavg plus one
    # 1-min sample per (ref, etl) pair — a wall regression whose load
    # fields moved with it is ambient, not code (r11 verdict item 2)
    out["load_run_start"] = load_run_start
    out["load_run_end"] = [round(x, 2) for x in os.getloadavg()]
    out["load_pairs"] = pair_loads
    # r15 additions (r14 verdict items 1-2), additive-only: the
    # untimed pre-loop work and the outlier re-time count are part of
    # the artifact, so what the warm-up absorbs is adjudicable from
    # the line itself.
    out["warmup_sec"] = round(warmup_sec, 3)
    out["n_retimed"] = n_retimed
    # mechanical filter for round comparisons (r12 verdict item 7):
    # a run that STARTED on a loaded host (1-min loadavg > 4 before
    # any Spark work of its own) is flagged so driver-side
    # round-over-round diffs can exclude it without eyeballing the
    # triples.  Start load is the ambient signal — end/pair loads
    # include this run's own executors.
    out["host_loaded"] = load_run_start[0] > 4.0
    out["tenhou_source_actions_1k_sec"] = tenhou_source_sec
    if pair_ratios:
        from statistics import median  # even-length lists average the
        # middle pair (a failed ref pass leaves 2 ratios; the naive
        # sorted()[n//2] would silently pick the LARGER one)

        med = median(pair_ratios)
        out["baseline_ref_parse_1k_sec"] = round(median(ref_times), 3)
        # headline = median of interleaved paired ratios (see the
        # protocol comment above); the per-pair vector and spread make
        # a noisy run visible instead of silently trusted.  The value
        # is emitted under BOTH names deliberately: etl_vs_ref_speedup
        # keeps the round-over-round comparison key alive, _median
        # states the r10 estimator in the name.
        out["etl_vs_ref_speedup"] = round(med, 2)
        out["etl_vs_ref_speedup_median"] = round(med, 2)
        out["etl_vs_ref_speedup_pairs"] = [round(r, 2) for r in pair_ratios]
        out["etl_vs_ref_speedup_spread"] = round(
            max(pair_ratios) - min(pair_ratios), 2
        )
        # raw per-pair seconds (detail artifact only): with the
        # per-pair load samples these let a reader attribute a ratio
        # move to the ref side, the etl side, or the host
        out["etl_vs_ref_pairs_raw"] = [
            [round(r, 3), round(e, 3)]
            for r, e in zip(ref_times, etl_times)
        ]

    # Full per-query detail always lands on disk next to this script —
    # the committed round-over-round record.  BENCH_r{N}.json (written
    # by the driver from the printed line) may hold only the compact
    # family view, so ALSO keep a per-round full-detail copy: the
    # driver writes BENCH_r{N}.json after this run, so the current
    # round is 1 + the highest round file already on disk (r5 verdict
    # item 5: BENCH_r04's per-query map was lost to the driver's
    # stdout window, making round-over-round comparison partial).
    # The per-round file is the ONLY detail artifact (r9 verdict item
    # 7: the old unversioned BENCH_DETAIL.json duplicated it and
    # dirtied git status every run); "latest" = highest-numbered
    # BENCH_DETAIL_r*.json, see README.
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    this_round = max(rounds, default=0) + 1
    detail_name = f"BENCH_DETAIL_r{this_round:02d}.json"
    with open(os.path.join(here, detail_name), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    # The driver captures only the LAST ~2000 chars of stdout and
    # json-parses the final line (BENCH_r04 was `parsed: null` because
    # the per-query dict outgrew that window).  The full name->time
    # map can NEVER fit that window (155+ names alone are ~3 kB;
    # zlib+base64 of the map measures 2.3 kB), so the compact line
    # carries the COMPLETE per-query timing vector in a form that does
    # fit (r6 item 6 + r7 item 5):
    #   qvals       every per-query time, 2dp, in sorted(name) order
    #   qorder      the name-vector contract, stated IN the line:
    #               "sorted(bench registry names + mahjong_*_1k
    #               probes)" — BENCH_r{N}.json + the same commit's
    #               registry reconstructs the full name->time map
    #               (tests/test_bench_contract.py pins the equality)
    #   qnames_sha1 sha1 prefix of ",".join(sorted(names)) — detects
    #               drift between the line and the reconstruction
    #   queries     the K SLOWEST queries by NAME (K sized to the
    #               budget, never truncated mid-structure) — the r7
    #               prefix-family dict popitem()'d arbitrary families
    #               when the line ran long
    # BENCH_DETAIL_r{N}.json (committed, above) duplicates the full
    # friendly map.
    line = json.dumps(out)
    if len(line) > 1500:
        import hashlib

        names = sorted(timings)
        out_c = dict(out)
        # the raw pair vectors stay in the DETAIL file only — the
        # spread summarizes them, and their chars are better spent on
        # named slowest-queries entries inside the line budget.  The
        # load triplets compress to their 1-min components (the full
        # 1/5/15 vectors live in the detail file): the weather report
        # stays in the line at ~45 chars instead of ~110
        out_c.pop("etl_vs_ref_speedup_pairs", None)
        out_c.pop("etl_vs_ref_pairs_raw", None)
        out_c.pop("load_run_start", None)
        out_c.pop("load_run_end", None)
        out_c.pop("load_pairs", None)
        out_c["load1m"] = {
            "s": out["load_run_start"][0],
            "e": out["load_run_end"][0],
            "p": out["load_pairs"],
        }
        out_c["n_queries"] = len(timings)
        out_c["qvals"] = [round(timings[n], 2) for n in names]
        out_c["qorder"] = "sorted(bench-names+mahjong_*_1k+cache-fill)"
        out_c["qnames_sha1"] = hashlib.sha1(
            ",".join(names).encode()
        ).hexdigest()[:12]
        out_c["detail"] = detail_name
        # budget 1600 (was 1500): the driver's stdout window is ~2000
        # chars, and the r12 load fields squeezed the named slowest
        # list to zero at the old bar — 1600 keeps >=300 chars margin
        slowest = sorted(timings, key=timings.get, reverse=True)
        for k in range(12, -1, -1):
            out_c["queries"] = {n: timings[n] for n in slowest[:k]}
            line = json.dumps(out_c)
            if len(line) <= 1600:
                break
    print(line)


if __name__ == "__main__":
    main()
