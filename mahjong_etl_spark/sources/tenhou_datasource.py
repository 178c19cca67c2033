"""Tenhou mjloggm as a first-class Spark data source (Spark 4 Python
DataSource API): ``spark.read.format("tenhou")``.

The reference treats its log format as a pre-ETL artifact — you must
run the whole pipeline (reference main.py) before anything is
queryable.  This module makes the raw format itself queryable: after
``register_tenhou_source(spark)``,

    spark.read.format("tenhou")
         .option("table", "agaris")      # any of the 9 tables
         .load("/data/logs")             # logs/YYYYMMDD/{game_id}.xml

yields the SAME rows the ETL would write for that table — minted
kyoku ids included — without materializing the other eight.  Ad-hoc
exploration of a new log drop, schema-on-read for one table, or
feeding a single-table consumer no longer costs a full 9-sink run.

Semantics contract (pinned by tests/test_tenhou_datasource.py against
the written-parquet output of plans/etl.py::run_etl):

- **Partition = date directory.**  The reference scopes all key
  minting to the date (plans/etl.py::_with_offsets partitions by dt),
  so a per-date partition can mint exact kyoku ids with zero
  cross-partition coordination: within the partition, games are
  processed in game_id order and the running hand-count offset
  reproduces the window the ETL computes.  This is the natural unit
  of parallelism at scale too — one task per date dir, horizontal
  across years of history.
- **Listing via pyarrow.fs** (baked into every PySpark install), so
  local, HDFS and object-store URIs all resolve; the ``date`` option
  prunes date directories BEFORE any file listing, mirroring the
  CLI's ``-d`` prefix semantics (sources/xml_source.py).
- **compat flag** threads through to the parser exactly as in the
  ETL; ``on_error=skip`` reproduces the quarantine behavior (a bad
  log contributes no rows and no offset), ``fail`` (default) raises.

Row production (r9/r10): flat-table reads — batch AND stream — yield
Arrow RecordBatches (``ARROW_BATCH_ROWS`` rows per batch — one Arrow
buffer on the worker<->JVM socket instead of one pickled tuple per
row; the stream path matters exactly when a stream drains a backlog);
only the ``_parsed`` nested envelope keeps plain-tuple yields
(micro-batch-sized by construction).  All productions are pinned
byte-equivalent to the ETL's written parquet by
tests/test_tenhou_datasource.py.
"""

from __future__ import annotations

import datetime
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StringType, StructField, StructType

from ..plans.etl import _EPOCH, _KYOKU_KEYED
from ..schemas import TABLE_SCHEMAS


def _minted_tuple(r: dict, fields, key: str | None, days: int, offset: int):
    """One parsed row dict -> output tuple in schema order, minting
    the final kyoku id exactly as plans/etl.py::table_df does."""
    vals = []
    for fld in fields:
        if key is not None and fld.name == key:
            local = r["kyoku_local"]
            vals.append(0 if local is None else days * 100000 + offset + local)
        else:
            vals.append(r[fld.name])
    return tuple(vals)


# Pseudo-table exposing one row per GAME with every table's rows as a
# minted struct array — the single-parse feed for the streaming ETL
# (streaming/etl_stream.py): nine per-table streams would parse the
# same XML nine times; this parses once and lets foreachBatch fan out.
PARSED_TABLE = "_parsed"

# rows per pyarrow.RecordBatch on the batch-read fast path: big
# enough to amortize the Arrow framing, small enough that a batch
# (widest table `actions`, ~60 B/row) stays well under a megabyte
ARROW_BATCH_ROWS = 8_192
# envelope rows are whole games (~a few KB each across nine nested
# columns) — same under-a-few-MB target, far fewer rows per batch
PARSED_ARROW_ROWS = 256


def parsed_stream_schema() -> StructType:
    from pyspark.sql.types import ArrayType

    return StructType(
        [
            StructField("dt", StringType(), True),
            StructField("game_id", StringType(), True),
            *[
                StructField(t, ArrayType(TABLE_SCHEMAS[t]), True)
                for t in TABLE_SCHEMAS
            ],
        ]
    )


class TenhouDatePartition(InputPartition):
    def __init__(
        self,
        dt_raw: str,
        files: list[tuple[str, str]],
        prior_files: list[str] | None = None,
    ):
        self.dt_raw = dt_raw  # YYYYMMDD directory name
        self.files = files  # [(game_id, full_path)] — this partition's slice
        # same-date files that precede this slice in game_id order;
        # their <INIT> counts rebuild the kyoku-minting offset so a
        # date dir can split across partitions (see partitions())
        self.prior_files = prior_files or []


def _fs_and_path(path: str):
    import pyarrow.fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


class TenhouReader(DataSourceReader):
    def __init__(self, options: dict, table: str):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tenhou source requires a path: .load(log_dir)")
        self.table = table
        self.compat = options.get("compat", "true").lower() != "false"
        self.date_prefix = options.get("date")
        self.on_error = options.get("on_error", "fail")
        if self.on_error not in ("fail", "skip"):
            raise ValueError(f"on_error must be fail|skip, got {self.on_error}")
        # max files per partition: a hot date directory (the common
        # case — one dir holds a whole day) splits into multiple
        # tasks instead of serializing on one core.  Later slices
        # rebuild their minting offset from the cheap <INIT> byte
        # scan over the preceding slice's files (~2x byte reads for
        # the date in the worst case, bounded, cached per worker).
        self.split = int(options.get("split", "256"))
        if self.split < 1:
            raise ValueError("split must be >= 1")

    def partitions(self):
        import pyarrow.fs as pafs

        fs, root = _fs_and_path(self.path)
        sel = pafs.FileSelector(root, recursive=False)
        date_dirs = [
            f.base_name
            for f in fs.get_file_info(sel)
            if f.type == pafs.FileType.Directory
            and re.fullmatch(r"\d{8}", f.base_name)
            and (self.date_prefix is None or f.base_name.startswith(self.date_prefix))
        ]
        if self.date_prefix is not None and not date_dirs:
            # same loud-failure contract as sources/xml_source.py — a
            # typo'd date must not succeed as an empty run
            raise FileNotFoundError(
                f"no date directory matches {self.date_prefix!r} under {root}"
            )
        parts = []
        for d in sorted(date_dirs):
            files = sorted(
                (f.base_name[:-4], f.path)
                for f in fs.get_file_info(pafs.FileSelector(f"{root}/{d}"))
                if f.type == pafs.FileType.File and f.base_name.endswith(".xml")
            )
            for lo in range(0, len(files), self.split):
                parts.append(
                    TenhouDatePartition(
                        d,
                        files[lo : lo + self.split],
                        prior_files=[p for _, p in files[:lo]],
                    )
                )
        return parts

    def read(self, partition: TenhouDatePartition):
        fs, _ = _fs_and_path(self.path)
        offset = _prior_offset(
            self, fs, partition.dt_raw, partition.prior_files
        )
        rows = _read_files(
            self,
            partition.dt_raw,
            sorted(partition.files),
            prior_offset=offset,
            fs=fs,
        )
        # every table — the flat scans AND the nested _parsed envelope
        # (r11) — yields Arrow RecordBatches, never pickled row tuples
        yield from _arrow_batches(self.table, rows)


def _arrow_batches(table: str, rows):
    """Arrow fast path shared by the batch reader and the stream
    reader (r10: the stream's backlog-replay path paid per-row
    pickling): the Python DataSource API accepts pyarrow.RecordBatch
    yields, replacing one pickled tuple per ROW on the worker<->JVM
    socket with one Arrow buffer per batch — the same economics as the
    ETL's mapInPandas parse.  The arrow schema is derived from the
    declared Spark schema (decimal/date/array fields included), so
    both paths stay byte-equivalent to the row-tuple production
    (parity pinned in tests/test_tenhou_datasource.py).

    The ``_parsed`` envelope (one row per GAME, every table's rows as
    a minted array<struct> column) rides the same path since r11 — it
    was the repo's last per-row-pickled production; pyarrow converts
    the nested tuple rows against the arrow struct types directly.
    Envelope rows are whole games (a few KB each), so the batch is
    capped at PARSED_ARROW_ROWS instead of ARROW_BATCH_ROWS."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    if table == PARSED_TABLE:
        spark_schema = parsed_stream_schema()
        batch_rows = PARSED_ARROW_ROWS
    else:
        spark_schema = StructType(
            [
                StructField("dt", StringType(), True),
                *TABLE_SCHEMAS[table].fields,
            ]
        )
        batch_rows = ARROW_BATCH_ROWS
    aschema = to_arrow_schema(spark_schema)

    def to_batch(buf: list) -> pa.RecordBatch:
        cols = list(zip(*buf))
        return pa.RecordBatch.from_arrays(
            [
                pa.array(c, type=f.type)
                for c, f in zip(cols, aschema)
            ],
            schema=aschema,
        )

    buf: list = []
    for r in rows:
        buf.append(r)
        if len(buf) >= batch_rows:
            yield to_batch(buf)
            buf = []
    if buf:
        yield to_batch(buf)


def _read_files(b: TenhouReader, dt_raw, files, prior_offset: int, fs=None):
    """Parse ``files`` (sorted (game_id, path)) of one date dir and
    yield output tuples for b.table — or whole-game _parsed rows —
    starting the kyoku-minting offset at ``prior_offset``."""
    from ..operators.mahjong_parse import parse_game

    if fs is None:
        fs, _ = _fs_and_path(b.path)
    d = datetime.datetime.strptime(dt_raw, "%Y%m%d").date()
    dt_iso = d.isoformat()
    days = (d - _EPOCH).days
    parsed_mode = b.table == PARSED_TABLE
    key = None if parsed_mode else _KYOKU_KEYED.get(b.table)
    fields = None if parsed_mode else TABLE_SCHEMAS[b.table].fields
    offset = prior_offset
    # game_id order is the minting order (plans/etl.py::_with_offsets)
    for game_id, full_path in files:
        with fs.open_input_stream(full_path) as f:
            content = f.read()
        try:
            tables = parse_game(content, game_id, d, compat=b.compat)
        except Exception:
            if b.on_error == "skip":
                continue  # quarantined: no rows, no offset
            raise
        if parsed_mode:
            yield (
                dt_iso,
                game_id,
                *[
                    [
                        _minted_tuple(
                            r,
                            TABLE_SCHEMAS[t].fields,
                            _KYOKU_KEYED.get(t),
                            days,
                            offset,
                        )
                        for r in tables[t]
                    ]
                    for t in TABLE_SCHEMAS
                ],
            )
        else:
            for r in tables[b.table]:
                yield (dt_iso, *_minted_tuple(r, fields, key, days, offset))
        offset += len(tables["kyokus"])


class TenhouDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tenhou"

    def _table(self) -> str:
        table = self.options.get("table", "games")
        if table != PARSED_TABLE and table not in TABLE_SCHEMAS:
            raise ValueError(
                f"unknown table {table!r}; expected one of "
                f"{sorted(TABLE_SCHEMAS)} or {PARSED_TABLE!r}"
            )
        return table

    def schema(self) -> StructType:
        table = self._table()
        if table == PARSED_TABLE:
            return parsed_stream_schema()
        return StructType(
            [StructField("dt", StringType(), True), *TABLE_SCHEMAS[table].fields]
        )

    def reader(self, schema: StructType) -> TenhouReader:
        return TenhouReader(self.options, self._table())

    def streamReader(self, schema: StructType) -> "TenhouStreamReader":
        return TenhouStreamReader(TenhouReader(self.options, self._table()))


def register_tenhou_source(spark) -> None:
    """Idempotent registration: ``spark.read.format("tenhou")`` works
    afterwards for the session's lifetime."""
    spark.dataSource.register(TenhouDataSource)


# ---------------------------------------------------------------------------
# Streaming: watch a live log drop, parse incrementally
# ---------------------------------------------------------------------------

_INIT_RE = re.compile(rb"<INIT[ />]")

# executor-side (worker-process) cache: path -> <INIT> count.  Safe
# because landed log files are immutable; bounded by the watched
# dates' file count; best-effort (a fresh worker re-scans once).
_INIT_COUNT_CACHE: dict = {}


def _count_kyokus(content: bytes) -> int:
    """Hand count without a full XML parse: the parser emits exactly
    one kyokus row per <INIT> tag (operators/mahjong_parse.py:144-151),
    so a byte scan reconstructs a file's contribution to the date's
    minting offset at listing cost, not parse cost."""
    return len(_INIT_RE.findall(content))


def _prior_offset(b, fs, dt_raw: str, paths: list) -> int:
    """Kyoku-minting offset contributed by a date's files preceding
    this slice/batch — shared by the batch split path and the stream
    reader (one copy: r7 review).  Under the default ``on_error=fail``
    a corrupt prior file kills the job when ITS slice reads, so the
    cheap <INIT> byte scan is exact for every job that completes.
    Under ``skip`` a quarantined file contributes no rows AND no
    offset, so the rebuild must match: each prior file is
    parse-validated and an unparseable one counts 0 — otherwise every
    id minted after it would shift vs the batch ETL (r7 review; the
    old byte-scan-only rebuild had exactly that divergence).  Counts
    are cached per (path, mode) in the reused Python worker — log
    files are immutable once landed."""
    skip_mode = b.on_error == "skip"
    d = datetime.datetime.strptime(dt_raw, "%Y%m%d").date()
    total = 0
    for path in paths:
        key = (path, skip_mode)
        n = _INIT_COUNT_CACHE.get(key)
        if n is None:
            with fs.open_input_stream(path) as f:
                content = f.read()
            if skip_mode:
                from ..operators.mahjong_parse import parse_game

                try:
                    parse_game(content, "offset-probe", d, compat=b.compat)
                    n = _count_kyokus(content)
                except Exception:
                    n = 0  # quarantined: no rows, no offset
            else:
                n = _count_kyokus(content)
            _INIT_COUNT_CACHE[key] = n
        total += n
    return total


class TenhouStreamPartition(InputPartition):
    def __init__(
        self,
        dt_raw: str,
        new_files: list[tuple[str, str]],
        prior_files: list[str],
    ):
        self.dt_raw = dt_raw
        self.new_files = new_files  # this micro-batch, (game_id, path)
        self.prior_files = prior_files  # same date, earlier batches


class TenhouStreamReader(DataSourceStreamReader):
    """Micro-batch reader over a Tenhou log tree.

    Offset = {"v": 2, "dates": {dt: [committed game ids]}} — the full
    per-date committed SET, not a sorted-prefix count: Tenhou file
    names encode a game's START time but files land when the game
    ENDS, so a long game can arrive after a later-started short one
    was already committed.  A prefix-count offset mis-slices exactly
    there (the first r6 cut did: the late file was treated as already
    processed — skipped forever — while the file at its slot was
    re-emitted as a duplicate with a shifted kyoku offset).  Set
    difference has no such failure mode: every listed-but-uncommitted
    file is processed exactly once, whenever it arrives.

    Each micro-batch partition carries its date's committed files so
    the executor can rebuild the kyoku-minting offset with the cheap
    <INIT> byte scan above.  For in-order arrivals minted ids equal a
    batch read of the same tree (the parity test pins it); a LATE
    arrival gets the next free ordinal in commit order — internally
    consistent, but a batch re-run would renumber the date, so the
    batch ETL's dynamic-partition-overwrite backfill is the repair
    path for out-of-order days (streaming/etl_stream.py docstring).
    With ``on_error=skip`` prior files are parse-validated during the
    rebuild (``_prior_offset``) so a quarantined file contributes no
    offset — matching the batch path, which excludes corrupt games;
    the default ``fail`` keeps the cheap byte scan (a corrupt file
    kills the job before its offset could matter).

    Offset size is one entry per committed file, and each batch
    re-reads its date's committed files for the offset rebuild — both
    bounded by the files of the WATCHED dates, so scope standing
    streams with the ``date`` option (e.g. the current day's dir, the
    reference's own ingestion grain); archive-scale backfill belongs
    to the batch ETL."""

    def __init__(self, batch: TenhouReader):
        self._b = batch

    def _listing(self) -> dict[str, dict[str, str]]:
        """{dt_raw: {game_id: path}} of everything currently on disk."""
        try:
            parts = self._b.partitions()
        except FileNotFoundError:
            import pyarrow.fs as pafs

            fs, root = _fs_and_path(self._b.path)
            if fs.get_file_info(root).type == pafs.FileType.NotFound:
                # a missing ROOT is a typo'd log_dir, not a pending
                # date — a silently forever-empty stream would hide it
                # (r7 review); keep the batch reader's loud contract
                raise
            # a watched date directory that has not arrived yet is a
            # NORMAL streaming state (batch keeps the loud-typo
            # contract; a stream waits for data instead of dying)
            return {}
        out: dict[str, dict[str, str]] = {}
        for p in parts:
            out.setdefault(p.dt_raw, {}).update(dict(p.files))
        return out

    def initialOffset(self) -> dict:
        return {"v": 2, "dates": {}}

    def latestOffset(self) -> dict:
        return {
            "v": 2,
            "dates": {
                dt: sorted(files) for dt, files in self._listing().items() if files
            },
        }

    def partitions(self, start: dict, end: dict):
        listing = self._listing()
        committed = {dt: set(ids) for dt, ids in start.get("dates", {}).items()}
        out = []
        # union of START and END dates: a fully-committed date whose
        # whole DIRECTORY vanished is absent from the current listing
        # (and so from end) — iterating end alone would skip the
        # vanish check for exactly the case where everything vanished
        # (r7 review)
        end_dates = end.get("dates", {})
        for dt in sorted(set(end_dates) | set(committed)):
            target_ids = end_dates.get(dt, [])
            done = committed.get(dt, set())
            files = listing.get(dt, {})
            # Every game id in the offset log (start OR end) refers to
            # a file that was on disk when the offset was taken, and
            # landed logs are contractually immutable — a committed id
            # absent from the current listing is ALWAYS an anomaly
            # (deletion, truncated object-store listing page).
            # Silently skipping it would shrink the rebuilt
            # kyoku-minting offset and shift every id minted for this
            # date afterwards — corrupted join keys with no error — so
            # fail loudly instead (r6 advice).
            missing = sorted(
                (set(done) | set(target_ids)) - set(files)
            )
            if missing:
                raise RuntimeError(
                    f"tenhou stream: committed log files vanished from "
                    f"{dt}: {missing} — landed logs are immutable; a "
                    f"missing committed file means deleted data or a "
                    f"bad listing, and proceeding would silently "
                    f"renumber every kyoku id minted after it"
                )
            new = [(gid, files[gid]) for gid in target_ids if gid not in done]
            if not new:
                continue
            prior = [files[gid] for gid in sorted(done)]
            out.append(TenhouStreamPartition(dt, new, prior))
        return out

    def read(self, partition: TenhouStreamPartition):
        b = self._b
        fs, _ = _fs_and_path(b.path)
        offset = _prior_offset(b, fs, partition.dt_raw, partition.prior_files)
        rows = _read_files(
            b,
            partition.dt_raw,
            sorted(partition.new_files),
            prior_offset=offset,
            fs=fs,
        )
        # every table rides the shared Arrow RecordBatch production
        # (flat tables r10, the _parsed envelope r11): a stream
        # draining a BACKLOG (first start against a populated date
        # dir, or catch-up after downtime) is a batch-sized read in
        # streaming clothes, and per-row pickling was exactly the
        # cost the r9 batch fix removed — parity with the tuple path
        # pinned in tests/test_tenhou_datasource.py
        yield from _arrow_batches(b.table, rows)

    def commit(self, end: dict) -> None:
        pass  # offsets are pure file positions; nothing to release
