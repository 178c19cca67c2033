"""Command-line surface — parity with the reference's three CLIs.

reference               -> here
--------------------------------------------------------------------
python extractor.py ... -> python -m mahjong_etl_spark extract ...
python main.py ...      -> python -m mahjong_etl_spark etl ...
python random_pailist.py-> python -m mahjong_etl_spark walls ...
upload.sh / run_scraper -> python -m mahjong_etl_spark sync ...
(Athena, external)      -> python -m mahjong_etl_spark sql ...

Flag names mirror the reference where one exists (reference
extractor.py:70-78, main.py:10-15, random_pailist.py:19-26); the
``sql`` subcommand replaces the reference's out-of-repo Athena step
with an in-engine Spark SQL runner over the written tables.
"""

from __future__ import annotations

import argparse
import datetime
import sys


def _spark(app: str):
    from .session import get_spark

    return get_spark(app)


def cmd_extract(args: argparse.Namespace) -> int:
    from .sources.extractor import (
        daily_log_ids,
        fetch_logs,
        filter_archives_by_date,
        scan_archive_index,
    )

    names = scan_archive_index(include_old=args.old)
    names = filter_archives_by_date(names, args.date)
    ids = daily_log_ids(names)
    n = fetch_logs(ids, args.output_dir)
    print(f"wrote {n} logs across {len(ids)} dates under {args.output_dir}")
    return 0


def cmd_etl(args: argparse.Namespace) -> int:
    from .plans.etl import run_etl

    spark = _spark("mahjong-etl")
    counts = run_etl(
        spark,
        args.log_dir,
        args.output_dir,
        compat=not args.no_compat,
        date_prefix=args.date,
    )
    for table, n in counts.items():
        print(f"{table}: {n} rows")
    return 0


def cmd_walls(args: argparse.Namespace) -> int:
    from .sources.paiyama import write_walls

    spark = _spark("mahjong-walls")
    dt = datetime.datetime.strptime(args.date, "%Y%m%d").date()
    write_walls(spark, args.num, dt, args.output_dir, seed=args.seed)
    print(f"wrote {args.num} walls for dt={dt.isoformat()} under {args.output_dir}")
    return 0


def cmd_stream(args: argparse.Namespace) -> int:
    from .streaming.etl_stream import run_etl_stream

    spark = _spark("mahjong-etl-stream")
    q = run_etl_stream(
        spark,
        args.log_dir,
        args.output_dir,
        args.checkpoint,
        compat=not args.no_compat,
        available_now=not args.follow,
    )
    if args.follow:
        print("streaming ETL running; ctrl-c to stop")
        q.awaitTermination()
    else:
        q.awaitTermination()
        q.stop()
        print(f"drained available logs into {args.output_dir}")
    return 0


def cmd_cdc(args: argparse.Namespace) -> int:
    from pyspark.sql.types import StructType

    from .streaming.cdc_stream import read_current, run_scd1_stream, run_scd2_stream

    spark = _spark("mahjong-cdc")
    schema = StructType.fromDDL(args.schema)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", args.max_files_per_trigger)
        .json(args.changes_dir)
    )
    runner = run_scd2_stream if args.scd2 else run_scd1_stream
    q = runner(
        spark,
        stream,
        args.output_dir,
        args.checkpoint,
        args.key,
        keep_versions=args.keep_versions,
        available_now=not args.follow,
    )
    if args.follow:
        print("CDC merge stream running; ctrl-c to stop")
        q.awaitTermination()
        return 0
    q.awaitTermination()
    q.stop()
    cur = read_current(spark, args.output_dir)
    n = cur.count() if cur is not None else 0
    shape = "SCD2 history rows" if args.scd2 else "current keys"
    print(f"merged change feed into {args.output_dir}: {n} {shape}")
    return 0


def cmd_index(args: argparse.Namespace) -> int:
    """Build a persisted IVF index from a vector parquet, maintain an
    existing one from a parquet drop directory of arriving vectors, or
    compact a maintained index's accumulated posting files — the CLI
    face of the train / maintain / compact / rebuild lifecycle
    (operators/similarity.py::write_ivf_index +
    streaming/ann_index_stream.py)."""
    modes = [args.vectors is not None, args.maintain is not None,
             args.compact, args.forget is not None]
    if sum(modes) != 1:
        print(
            "index: exactly one of --vectors (build), --maintain "
            "(stream), --compact or --forget is required",
            file=sys.stderr,
        )
        return 2
    if args.maintain is not None and args.checkpoint is None:
        print("index: --maintain requires --checkpoint", file=sys.stderr)
        return 2
    # (rows table, partition col, matrix dir) per index family — the
    # lifecycle verbs below are family-agnostic
    rows_tbl, rows_part, matrix = {
        "ivf": ("postings", "cluster", "centroids"),
        "pq": ("codes", "shard", "codebooks"),
        "ivfpq": ("codes", "cluster", "centroids"),
        # the dedup plane's band index: no trained matrix — the
        # postings table itself is the build artifact the maintain
        # precheck looks for
        "minhash": ("bands", "band", "bands"),
    }[args.kind]
    spark = _spark("mahjong-index")
    if args.forget is not None:
        from .streaming.ann_index_stream import forget_from_index

        ids = spark.read.parquet(args.forget)
        rep = forget_from_index(
            spark, args.index_dir, ids.select(ids.columns[0]),
            kind=args.kind,
        )
        parts = sum(
            len(t["partitions_rewritten"]) for t in rep["tables"].values()
        )
        print(
            f"forgot {rep['rows_deleted']} rows across "
            f"{len(rep['tables'])} tables ({parts} partitions "
            f"rewritten) at {args.index_dir}"
        )
        if rep["skipped_in_flight"]:
            print(
                f"WARNING: partitions holding in-flight streaming "
                f"batches were skipped and still hold the ids — "
                f"drain the maintenance stream and re-run: "
                f"{rep['skipped_in_flight']}",
                file=sys.stderr,
            )
            return 3
        return 0
    if args.compact:
        from .plans.compaction import compact_table
        from .streaming.etl_stream import _meta_fs

        rewritten = compact_table(
            spark, args.index_dir, rows_tbl, part_col=rows_part
        )
        n = spark.read.parquet(f"{args.index_dir}/{rows_tbl}").count()
        print(
            f"compacted {len(rewritten)} {rows_part} partitions at "
            f"{args.index_dir}: {n} {rows_tbl}"
        )
        # the verify relations (minhash shingles, ivfpq raw vectors)
        # and the admission gates' decision tables accumulate
        # per-batch files exactly like the postings — fold whichever
        # exist in the same pass (r14)
        cfs = _meta_fs(spark, args.index_dir)
        aux = {
            "minhash": [("shingles", "shard"), ("admissions", "gate")],
            "ivfpq": [("vectors", "shard"), ("admissions", "gate")],
        }.get(args.kind, [])
        for aux_tbl, aux_part in aux:
            if cfs.kind(f"{cfs.root}/{aux_tbl}") != "dir":
                continue
            aux_rewritten = compact_table(
                spark, args.index_dir, aux_tbl, part_col=aux_part
            )
            n_aux = spark.read.parquet(
                f"{args.index_dir}/{aux_tbl}"
            ).count()
            print(
                f"compacted {len(aux_rewritten)} {aux_part} partitions "
                f"at {args.index_dir}: {n_aux} {aux_tbl}"
            )
        return 0
    if args.maintain is None:
        from .operators.similarity import (
            write_ivf_index,
            write_ivfpq_index,
            write_pq_index,
        )

        if args.with_vectors and args.kind != "ivfpq":
            print(
                "index: --with-vectors applies only to --kind ivfpq",
                file=sys.stderr,
            )
            return 2
        vecs = spark.read.parquet(args.vectors)
        if args.kind == "pq":
            write_pq_index(spark, vecs, args.index_dir)
        elif args.kind == "ivfpq":
            write_ivfpq_index(
                spark, vecs, args.index_dir,
                with_vectors=args.with_vectors,
            )
        elif args.kind == "minhash":
            from .operators.minhash_index import write_minhash_index

            write_minhash_index(spark, vecs, args.index_dir)
        else:
            write_ivf_index(
                spark, vecs, args.index_dir, n_clusters=args.clusters
            )
        n = spark.read.parquet(f"{args.index_dir}/{rows_tbl}").count()
        print(
            f"built {args.kind.upper()} index at {args.index_dir}: "
            f"{n} {rows_tbl}"
        )
        return 0
    from .streaming.ann_index_stream import (
        run_ivf_maintenance_stream,
        run_ivfpq_maintenance_stream,
        run_pq_maintenance_stream,
    )
    from .streaming.etl_stream import _meta_fs

    _ifs = _meta_fs(spark, args.index_dir)
    if _ifs.kind(f"{_ifs.root}/{matrix}") is None:
        print(
            f"index: {args.index_dir} has no {matrix} — build it "
            f"first with --vectors",
            file=sys.stderr,
        )
        return 2
    if args.schema is not None:
        schema = args.schema
    else:
        # infer from files already in the drop dir (float vs double
        # embeddings, extra payload columns) — a stream needs an
        # explicit schema, but hardcoding one breaks the first
        # double-typed drop
        try:
            schema = spark.read.parquet(args.maintain).schema
        except Exception:
            print(
                f"index: cannot infer a schema from {args.maintain} "
                f"(empty?) — pass --schema "
                f"'vec_id long, embedding array<double>'",
                file=sys.stderr,
            )
            return 2
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", args.max_files_per_trigger)
        .parquet(args.maintain)
    )
    from .streaming.ann_index_stream import run_minhash_maintenance_stream

    run_stream = {
        "ivf": run_ivf_maintenance_stream,
        "pq": run_pq_maintenance_stream,
        "ivfpq": run_ivfpq_maintenance_stream,
        "minhash": run_minhash_maintenance_stream,
    }[args.kind]
    q = run_stream(
        spark,
        stream,
        args.index_dir,
        args.checkpoint,
        available_now=not args.follow,
    )
    if args.follow:
        print("index maintenance stream running; ctrl-c to stop")
        q.awaitTermination()
        return 0
    q.awaitTermination()
    q.stop()
    n = spark.read.parquet(f"{args.index_dir}/{rows_tbl}").count()
    print(
        f"maintained {args.kind.upper()} index at {args.index_dir}: "
        f"{n} {rows_tbl}"
    )
    # surface the data-driven retrain signal (drift ledger, r11): the
    # frozen quantizer's operational limit, as a number instead of a
    # calendar habit
    from .streaming.ann_index_stream import (
        compact_recommended,
        rebuild_recommended,
    )

    drift = rebuild_recommended(spark, args.index_dir)
    last = drift.get("last") or {}
    print(
        f"drift: {drift['flagged']}/{drift['batches']} batches flagged; "
        f"last batch residual_ratio={last.get('residual_ratio')} "
        f"top_cell_share={last.get('top_cell_share')} -> "
        f"rebuild recommended: {drift['rebuild_recommended']}"
    )
    # ... and the small-file signal (r12): both maintenance actions —
    # retrain and compact — read off one command
    comp = compact_recommended(spark, args.index_dir, table=rows_tbl)
    print(
        f"{rows_tbl}: {comp['files']} files across {comp['partitions']} "
        f"{rows_part} partitions (max {comp['max_partition_files']}/part, "
        f"knee {comp['knee']}) -> "
        f"compact recommended: {comp['compact_recommended']}"
    )
    return 0


def cmd_gate(args: argparse.Namespace) -> int:
    """Run a streaming admission gate over a persisted index — the
    CLI face of the admission family (r13/r14): ``--kind minhash``
    routes (doc_id, text) arrivals through the near-dup gate against
    a band index; ``--kind semantic`` routes (vec_id, embedding)
    arrivals through the semantic gate against an IVFADC index built
    ``--with-vectors`` (or pass --adc-bar for a calibrated
    quantized-score decision on a vectors-less index).  Decisions
    land in {index}/admissions partitioned by gate=admit/quarantine;
    clean arrivals' bands/codes (and vectors) join the index, so the
    gate is self-maintaining."""
    if args.adc_bar is not None and args.kind != "semantic":
        print("gate: --adc-bar applies only to --kind semantic",
              file=sys.stderr)
        return 2
    from .streaming.ann_index_stream import (
        run_neardup_admission_stream,
        run_semantic_admission_stream,
    )

    spark = _spark("mahjong-gate")
    if args.schema is not None:
        schema = args.schema
    else:
        try:
            schema = spark.read.parquet(args.arrivals).schema
        except Exception:
            print(
                f"gate: cannot infer a schema from {args.arrivals} "
                f"(empty?) — pass --schema",
                file=sys.stderr,
            )
            return 2
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", args.max_files_per_trigger)
        .parquet(args.arrivals)
    )
    kw: dict = {"within_batch": args.within_batch}
    if args.threshold is not None:
        kw["threshold"] = args.threshold
    if args.adc_bar is not None:
        kw["adc_bar"] = args.adc_bar
    runner = (
        run_neardup_admission_stream
        if args.kind == "minhash"
        else run_semantic_admission_stream
    )
    try:
        q = runner(
            spark, stream, args.index_dir, args.checkpoint,
            available_now=not args.follow, **kw,
        )
    except ValueError as e:
        print(f"gate: {e}", file=sys.stderr)
        return 2
    if args.follow:
        print("admission gate running; ctrl-c to stop")
        q.awaitTermination()
        return 0
    q.awaitTermination()
    q.stop()
    adm = spark.read.parquet(f"{args.index_dir}/admissions")
    n = adm.count()
    nq = adm.where("NOT admitted").count()
    print(
        f"gated arrivals at {args.index_dir}: {n} decisions on record, "
        f"{nq} quarantined ({nq / max(n, 1):.1%})"
    )
    from .streaming.ann_index_stream import rebuild_recommended

    drift = rebuild_recommended(spark, args.index_dir)
    last = drift.get("last") or {}
    print(
        f"drift: {drift['flagged']}/{drift['batches']} batches flagged; "
        f"last batch flag-rate ratio={last.get('residual_ratio')} -> "
        f"rebuild recommended: {drift['rebuild_recommended']}"
    )
    return 0


def cmd_sync(args: argparse.Namespace) -> int:
    from .sources.sync import DEFAULT_EXCLUDE, run_sync

    spark = _spark("mahjong-sync")
    summary = run_sync(
        spark,
        args.src,
        args.dst,
        exclude=args.exclude if args.exclude is not None else DEFAULT_EXCLUDE,
        delete=args.delete,
        dry_run=args.dry_run,
    )
    verb = "would copy" if args.dry_run else "copied"
    print(
        f"{verb} {summary['n_copied']} files ({summary['bytes_copied']} bytes), "
        f"deleted {summary['n_deleted']}"
    )
    if args.dry_run:
        for op, rel in summary["actions"]:
            print(f"  {op} {rel}")
    return 0


def cmd_sql(args: argparse.Namespace) -> int:
    from .plans.catalog import register_tables

    spark = _spark("mahjong-sql")
    registered = register_tables(spark, args.data_dir)
    if not registered:
        print(f"no tables found under {args.data_dir}", file=sys.stderr)
        return 1
    sql = args.query or sys.stdin.read()
    df = spark.sql(sql)
    df.show(args.limit, truncate=False)
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    from .plans.compaction import (
        CompactionLeaseHeld,
        compact_table,
        repair_compaction,
    )

    if not args.repair_only and not args.table:
        print("compact: -t/--table is required unless --repair-only",
              file=sys.stderr)
        return 2
    spark = _spark("mahjong-compact")
    try:
        if args.repair_only:
            out = repair_compaction(spark, args.data_dir)
            for key, action in sorted(out.items()):
                print(f"repaired {key}: rolled {action}")
            if not out:
                print("nothing to repair")
            return 0
        from .plans.compaction import DEFAULT_TARGET_BYTES

        rewritten = compact_table(
            spark,
            args.data_dir,
            args.table,
            target_file_bytes=args.target_file_bytes or DEFAULT_TARGET_BYTES,
            min_files_to_compact=args.min_files,
        )
        for dt, n in sorted(rewritten.items()):
            print(f"{args.table}/dt={dt}: {n} file(s)")
        if not rewritten:
            print("nothing to compact")
        return 0
    except CompactionLeaseHeld as e:
        print(f"refused: {e}", file=sys.stderr)
        return 1


def cmd_progress(args: argparse.Namespace) -> int:
    from .streaming.metrics import read_progress

    spark = _spark("mahjong-progress")
    df = read_progress(spark, args.ledger)
    df.createOrReplaceTempView("stream_progress")
    if args.summary:
        spark.sql(
            """
            SELECT name,
                   count(*)                          AS batches,
                   sum(num_input_rows)               AS rows_in,
                   round(percentile(trigger_ms, 0.5))  AS p50_trigger_ms,
                   round(percentile(trigger_ms, 0.95)) AS p95_trigger_ms,
                   max(state_rows)                   AS max_state_rows
            FROM stream_progress GROUP BY name ORDER BY name
            """
        ).show(truncate=False)
        return 0
    df.orderBy("ts").show(args.limit, truncate=False)
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    from .plans.registry import registry

    reg = registry()
    if args.list or args.name is None:
        for name, q in reg.items():
            tag = "oracle" if q.oracle else "rows-only"
            print(f"{name:36} [{tag}] {q.doc.strip().splitlines()[0] if q.doc else ''}")
        return 0
    if args.name not in reg:
        print(f"unknown query: {args.name} (use --list)", file=sys.stderr)
        return 1
    spark = _spark("mahjong-query")
    df = reg[args.name].spark_fn(spark, args.data_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mahjong_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="fetch Tenhou logs (S1-S4)")
    ex.add_argument("--old", action="store_true", help="include the ?old archive index")
    ex.add_argument("-O", "--output-dir", required=True)
    ex.add_argument(
        "-d",
        "--date",
        default=None,
        help="date prefix filter: YYYYMMDD (one day), YYYYMM (month), YYYY (year)",
    )
    ex.set_defaults(fn=cmd_extract)

    et = sub.add_parser("etl", help="XML logs -> 9 partitioned parquet tables")
    et.add_argument("-L", "--log-dir", required=True)
    et.add_argument("-O", "--output-dir", required=True)
    et.add_argument(
        "--no-compat",
        action="store_true",
        help="fix the reference's discard/meld-id bugs instead of reproducing them",
    )
    et.add_argument(
        "-d",
        "--date",
        default=None,
        help="incremental run: only log dirs matching this date prefix "
        "(YYYYMMDD / YYYYMM / YYYY); other dt= partitions stay untouched",
    )
    et.set_defaults(fn=cmd_etl)

    wa = sub.add_parser("walls", help="synthetic paiyama generator")
    wa.add_argument("-n", "--num", type=int, required=True)
    wa.add_argument("-O", "--output-dir", required=True)
    wa.add_argument("-d", "--date", required=True, help="YYYYMMDD")
    wa.add_argument("--seed", type=int, default=0)
    wa.set_defaults(fn=cmd_walls)

    st = sub.add_parser(
        "stream",
        help="streaming ETL: watch a log dir, fan out to the 9 sinks per micro-batch",
    )
    st.add_argument("-L", "--log-dir", required=True)
    st.add_argument("-O", "--output-dir", required=True)
    st.add_argument("-C", "--checkpoint", required=True)
    st.add_argument("--no-compat", action="store_true")
    st.add_argument(
        "--follow",
        action="store_true",
        help="keep watching for new files (default: drain available and exit)",
    )
    st.set_defaults(fn=cmd_stream)

    sy = sub.add_parser(
        "sync",
        help="incremental dir sync (upload.sh / run_scraper.sh parity; "
        "any Hadoop-FS scheme)",
    )
    sy.add_argument("src")
    sy.add_argument("dst")
    sy.add_argument(
        "-x",
        "--exclude",
        default=None,
        help=r"exclude regex on relative paths (default: .*\.DS_Store)",
    )
    sy.add_argument(
        "--delete", action="store_true", help="remove dst files absent from src"
    )
    sy.add_argument("--dry-run", action="store_true")
    sy.set_defaults(fn=cmd_sync)

    cd = sub.add_parser(
        "cdc",
        help="merge a JSONL change feed (key, op, change_seq, payload...) "
        "into a versioned dimension snapshot (SCD1) or interval "
        "history (--scd2), exactly-once",
    )
    cd.add_argument("-L", "--changes-dir", required=True)
    cd.add_argument("-O", "--output-dir", required=True)
    cd.add_argument("-C", "--checkpoint", required=True)
    cd.add_argument("-k", "--key", required=True, help="merge key column")
    cd.add_argument(
        "-s",
        "--schema",
        required=True,
        help="change-feed DDL, e.g. 'k long, op string, change_seq long, "
        "name string'",
    )
    cd.add_argument("--scd2", action="store_true", help="keep full interval history")
    cd.add_argument("--keep-versions", type=int, default=1)
    cd.add_argument("--max-files-per-trigger", type=int, default=1000)
    cd.add_argument("--follow", action="store_true")
    cd.set_defaults(fn=cmd_cdc)

    co = sub.add_parser(
        "compact", help="rewrite small-file partitions (snapshot swap)"
    )
    co.add_argument("-D", "--data-dir", required=True, help="table root")
    co.add_argument("-t", "--table", default=None, help="table name")
    co.add_argument(
        "--target-file-bytes",
        type=int,
        default=None,
        help="defaults to the library's DEFAULT_TARGET_BYTES",
    )
    co.add_argument("--min-files", type=int, default=2)
    co.add_argument(
        "--repair-only",
        action="store_true",
        help="only converge interrupted swaps, compact nothing",
    )
    co.set_defaults(fn=cmd_compact)

    pg = sub.add_parser(
        "progress", help="query a streaming progress ledger (metrics.py)"
    )
    pg.add_argument("ledger", help="ledger path (rotated segments included)")
    pg.add_argument("--limit", type=int, default=50)
    pg.add_argument(
        "--summary",
        action="store_true",
        help="per-query batch counts and trigger-latency percentiles",
    )
    pg.set_defaults(fn=cmd_progress)

    ix = sub.add_parser(
        "index",
        help="build a persisted IVF index, or maintain one from a "
        "vector drop directory (streaming)",
    )
    ix.add_argument("-I", "--index-dir", required=True)
    ix.add_argument(
        "-V", "--vectors", default=None,
        help="parquet to BUILD from: (vec_id, embedding) for the ANN "
        "kinds, (doc_id, text) for --kind minhash",
    )
    ix.add_argument(
        "-M", "--maintain", default=None,
        help="parquet drop dir to MAINTAIN from (streaming append)",
    )
    ix.add_argument("-C", "--checkpoint", default=None)
    ix.add_argument(
        "-s", "--schema", default=None,
        help="drop-file schema DDL (default: inferred from files "
        "already in the drop dir)",
    )
    ix.add_argument(
        "--compact", action="store_true",
        help="compact accumulated maintenance posting files "
        "(snapshot-file swap; safe beside a live stream)",
    )
    ix.add_argument(
        "--forget", default=None, metavar="IDS_PARQUET",
        help="delete the ids in this parquet's first column from the "
        "index's maintained tables (bands/shingles/admissions for "
        "minhash, postings/codes for the ANN kinds) without a "
        "rebuild — the derived-store half of the governance forget "
        "cascade; exits 3 if in-flight streaming partitions had to "
        "be skipped (drain and re-run)",
    )
    ix.add_argument(
        "--with-vectors", action="store_true",
        help="(--kind ivfpq builds only) also persist the raw "
        "{index}/vectors relation — the exact-verify side of the "
        "semantic admission gate; costs raw corpus storage, off by "
        "default",
    )
    ix.add_argument("--clusters", type=int, default=16)
    ix.add_argument(
        "--kind", choices=["ivf", "pq", "ivfpq", "minhash"],
        default="ivf",
        help="index family: ivf (centroids + cluster-partitioned "
        "postings), pq (codebooks + shard-partitioned codes), "
        "ivfpq (IVFADC: centroids + codebooks + cluster-partitioned "
        "residual codes), or minhash (the dedup plane's "
        "band-partitioned LSH postings over documents); "
        "build/maintain/compact and the drift/compaction signals "
        "work identically on all four",
    )
    ix.add_argument("--max-files-per-trigger", type=int, default=16)
    ix.add_argument(
        "--follow", action="store_true",
        help="keep maintaining as new files land (default: drain once)",
    )
    ix.set_defaults(fn=cmd_index)

    ga = sub.add_parser(
        "gate",
        help="run a streaming admission gate (near-dup or semantic) "
        "over a persisted index",
    )
    ga.add_argument("-I", "--index-dir", required=True)
    ga.add_argument(
        "-A", "--arrivals", required=True,
        help="parquet drop dir of arrivals: (doc_id, text) for "
        "--kind minhash, (vec_id, embedding) for --kind semantic",
    )
    ga.add_argument("-C", "--checkpoint", required=True)
    ga.add_argument(
        "--kind", choices=["minhash", "semantic"], default="minhash",
    )
    ga.add_argument(
        "-s", "--schema", default=None,
        help="drop-file schema DDL (default: inferred from files "
        "already in the drop dir)",
    )
    ga.add_argument(
        "--threshold", type=float, default=None,
        help="exact-similarity bar (Jaccard for minhash — needs the "
        "index's persisted shingle relation; cosine for semantic, "
        "default 0.92)",
    )
    ga.add_argument(
        "--within-batch", action="store_true",
        help="also flag near-dups arriving in the SAME micro-batch "
        "(first occurrence admits)",
    )
    ga.add_argument(
        "--adc-bar", type=float, default=None,
        help="(--kind semantic) calibrated quantized-score bar for "
        "candidates no vector source can verify",
    )
    ga.add_argument("--max-files-per-trigger", type=int, default=16)
    ga.add_argument(
        "--follow", action="store_true",
        help="keep gating as new files land (default: drain once)",
    )
    ga.set_defaults(fn=cmd_gate)

    sq = sub.add_parser("sql", help="Spark SQL over the written tables")
    sq.add_argument("-D", "--data-dir", required=True)
    sq.add_argument("-q", "--query", default=None, help="SQL (default: stdin)")
    sq.add_argument("--limit", type=int, default=100)
    sq.set_defaults(fn=cmd_sql)

    qu = sub.add_parser(
        "query", help="run a named query from the declared registry surface"
    )
    qu.add_argument("name", nargs="?", default=None, help="registry query name")
    qu.add_argument(
        "-D", "--data-dir", default="/root/testdata/sf0.01", help="star-schema dir"
    )
    qu.add_argument("--limit", type=int, default=50)
    qu.add_argument("--list", action="store_true", help="list available queries")
    qu.add_argument(
        "--explain", action="store_true", help="print the formatted physical plan"
    )
    qu.set_defaults(fn=cmd_query)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
