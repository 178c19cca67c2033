"""Ingestion plane: Tenhou archive-index → daily index → per-log XML.

Spark-first rebuild of the reference's scraper (reference
extractor.py:14-67 — SURVEY §2.1 S1-S4):

- S1 archive-index scan:   parse_archive_index()
- S2 date-prefix filter:   filter_archives_by_date()
- S3 gz index → log ids:   extract_log_ids()
- S4 per-log fetch + sink: fetch_logs() / fetch_logs_distributed()

Network I/O is injected (``fetcher: Callable[[str], bytes]``) so the
pipeline is testable hermetically and polite-by-construction: the
*driver* decides concurrency.  The index steps (S1-S3) stay
driver-side on purpose — they are a handful of small HTTP requests
against one host, and distributing them buys nothing but rate-limit
risk (SURVEY §3 E1).  Only the per-log fan-out (S4, thousands of
~2 KB files per day) is worth distributing, and then only when the
target is a shared filesystem / object store every executor can write
(``fetch_logs_distributed``).

URL shapes (reference extractor.py:16, 35, 64):
  index:  https://tenhou.net/sc/raw/list.cgi        (current ~7 days)
          https://tenhou.net/sc/raw/list.cgi?old    (older archive)
  daily:  https://tenhou.net/sc/raw/dat/{name}      (scc*.html.gz)
  log:    https://tenhou.net/0/log/?{log_id}
"""

from __future__ import annotations

import gzip
import os
import re
import urllib.parse
from collections.abc import Callable, Iterable

from pyspark.sql import SparkSession

INDEX_URL = "https://tenhou.net/sc/raw/list.cgi"
DAILY_URL = "https://tenhou.net/sc/raw/dat/{name}"
LOG_URL = "https://tenhou.net/0/log/?{log_id}"

Fetcher = Callable[[str], bytes]

# reference extractor.py:26: file:'NAME' (optionally quoted), size:N
_FILE_RE = re.compile(r"file:\s*'?([^',}]+)'?")
# reference extractor.py:33: the daily-archive stem carries YYYYMMDD
_DATE_RE = re.compile(r"(\d{8})")
# reference extractor.py:51-56: one <a href=...> per line of the daily
# index; the log id is the href's query string (log=ID)
_HREF_RE = re.compile(r'href="([^"]+)"')


def default_fetcher(url: str, timeout: float = 30.0) -> bytes:
    """stdlib HTTP GET — swap in anything with the same signature.
    The timeout keeps one stalled connection from hanging the driver
    ingest loop (or an executor task, which has no speculative retry
    configured) forever."""
    from urllib.request import urlopen

    with urlopen(url, timeout=timeout) as resp:  # noqa: S310 — host fixed by callers
        return resp.read()


# ---------------------------------------------------------------------------
# S1: archive index
# ---------------------------------------------------------------------------


def parse_archive_index(text: str) -> list[str]:
    """Archive file names out of list.cgi's JS-ish payload.

    The body is ``list([{file:'scc20240101.html.gz',size:123}, ...]);``
    (reference extractor.py:21-27).  A tolerant regex scan beats
    replicating the reference's wrapper-strip + split-on-",\\r\\n"
    exactly, and accepts both quoted and bare file values.
    """
    return _FILE_RE.findall(text)


def scan_archive_index(
    fetcher: Fetcher = default_fetcher, include_old: bool = True
) -> list[str]:
    """S1 end-to-end: fetch the index (current + optionally ?old) and
    return archive file names.  Driver-side by design (2 requests)."""
    urls = [INDEX_URL] + ([INDEX_URL + "?old"] if include_old else [])
    names: list[str] = []
    for url in urls:
        names.extend(parse_archive_index(fetcher(url).decode("utf-8", "replace")))
    return names


# ---------------------------------------------------------------------------
# S2: date-prefix filter
# ---------------------------------------------------------------------------


def filter_archives_by_date(names: Iterable[str], date: str | None) -> list[str]:
    """Keep daily archives whose embedded YYYYMMDD starts with ``date``
    (None keeps everything) — reference extractor.py:33-40, which uses
    ``startswith`` so a prefix like '202401' selects a whole month.
    This is the listing-time analogue of partition pruning: prune
    BEFORE any per-archive fetch."""
    out = []
    for n in names:
        m = _DATE_RE.search(os.path.basename(n))
        if m is None:
            continue
        if date is None or m.group(1).startswith(date):
            out.append(n)
    return out


# ---------------------------------------------------------------------------
# S3: daily index → log ids
# ---------------------------------------------------------------------------


def extract_log_ids(gz_payload: bytes) -> list[str]:
    """Log ids from one gzipped daily html index.

    Decompress, regex the hrefs, take each href's ``log=`` query param
    (reference extractor.py:43-57).  Order-preserving and duplicate-
    preserving to mirror the reference's line scan.
    """
    html = gzip.decompress(gz_payload).decode("utf-8", "replace")
    ids = []
    for href in _HREF_RE.findall(html):
        q = urllib.parse.urlparse(href).query
        params = urllib.parse.parse_qs(q)
        if "log" in params:
            ids.extend(params["log"])
    return ids


def daily_log_ids(
    archive_names: Iterable[str], fetcher: Fetcher = default_fetcher
) -> dict[str, list[str]]:
    """S3 over a set of daily archives: {YYYYMMDD: [log_id, ...]}."""
    out: dict[str, list[str]] = {}
    for name in archive_names:
        m = _DATE_RE.search(os.path.basename(name))
        if m is None:
            continue
        ids = extract_log_ids(fetcher(DAILY_URL.format(name=name)))
        out.setdefault(m.group(1), []).extend(ids)
    return out


# ---------------------------------------------------------------------------
# S4: per-log fetch + file sink
# ---------------------------------------------------------------------------


def fetch_logs(
    date_ids: dict[str, list[str]],
    out_dir: str,
    fetcher: Fetcher = default_fetcher,
    skip_existing: bool = True,
) -> int:
    """Driver-side S4: fetch each log and write
    ``{out_dir}/{YYYYMMDD}/{log_id}.xml`` (reference extractor.py:58-67
    layout — exactly what ``xml_source.scan_logs`` consumes).  Returns
    the number of files written."""
    written = 0
    for date, ids in date_ids.items():
        day_dir = os.path.join(out_dir, date)
        os.makedirs(day_dir, exist_ok=True)
        for log_id in ids:
            path = os.path.join(day_dir, f"{log_id}.xml")
            if skip_existing and os.path.exists(path):
                continue
            payload = fetcher(LOG_URL.format(log_id=log_id))
            # write-to-temp + rename: a crash mid-write must not leave
            # a truncated .xml that skip_existing treats as done
            tmp = f"{path}.inprogress-{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)
            written += 1
    return written


def fetch_logs_distributed(
    spark: SparkSession,
    date_ids: dict[str, list[str]],
    out_dir: str,
    fetcher: Fetcher = default_fetcher,
    num_partitions: int = 8,
    skip_existing: bool = True,
) -> int:
    """Distributed S4 for backfills: parallelize (date, log_id) pairs
    and fetch from executors via ``foreachPartition`` — one connection
    context per partition, ``num_partitions`` concurrent fetchers
    total (keep SMALL: the remote is one politeness-sensitive host;
    this exists for backfill throughput against a mirror/bucket, not
    to hammer the origin).  ``out_dir`` must be writable from every
    executor (shared FS or object-store mount) — single-JVM local mode
    trivially satisfies this.  ``skip_existing=False`` forces a
    re-fetch (repair path, mirroring ``fetch_logs``).  Returns the
    number of files written.
    """
    from ..shipping import ensure_shipped

    ensure_shipped(spark)
    pairs = [(d, i) for d, ids in date_ids.items() for i in ids]
    if not pairs:
        return 0
    sc = spark.sparkContext
    counts = (
        sc.parallelize(pairs, min(num_partitions, len(pairs)))
        .mapPartitions(
            lambda it: [_fetch_partition(it, out_dir, fetcher, skip_existing)]
        )
        .sum()
    )
    return int(counts)


def _fetch_partition(
    pairs: Iterable[tuple[str, str]],
    out_dir: str,
    fetcher: Fetcher,
    skip_existing: bool = True,
) -> int:
    written = 0
    for date, log_id in pairs:
        day_dir = os.path.join(out_dir, date)
        os.makedirs(day_dir, exist_ok=True)
        path = os.path.join(day_dir, f"{log_id}.xml")
        if skip_existing and os.path.exists(path):
            continue
        # fetch BEFORE creating the file, and publish via rename: a
        # fetcher failure mid-task must not leave a truncated .xml
        # that the exists-check would treat as done on task retry
        payload = fetcher(LOG_URL.format(log_id=log_id))
        tmp = f"{path}.inprogress-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        written += 1
    return written
