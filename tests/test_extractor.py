"""Ingestion-plane tests (SURVEY §2.1 S1-S4) — hermetic: the fetcher
is a dict lookup, no network."""

from __future__ import annotations

import gzip
import os

from mahjong_etl_spark.sources.extractor import (
    DAILY_URL,
    INDEX_URL,
    LOG_URL,
    daily_log_ids,
    extract_log_ids,
    fetch_logs,
    fetch_logs_distributed,
    filter_archives_by_date,
    parse_archive_index,
    scan_archive_index,
)

INDEX_BODY = (
    "list([\r\n"
    "{file:'scc20240102.html.gz',size:1111},\r\n"
    "{file:'scc20240103.html.gz',size:2222},\r\n"
    "{file:'sca20240102.log.gz',size:3333}\r\n"
    "]);"
)

DAILY_HTML = (
    "<html><body>\n"
    '<a href="/0/?log=2024010211gm-0001">a</a><br>\n'
    '<a href="/0/?log=2024010212gm-0002&extra=1">b</a><br>\n'
    '<a href="/static/no-log-param.css">c</a>\n'
    "</body></html>"
)


def _gz(text: str) -> bytes:
    return gzip.compress(text.encode())


def make_fetcher(xml_payload: bytes = b"<mjloggm ver='2.3'/>"):
    responses = {
        INDEX_URL: INDEX_BODY.encode(),
        INDEX_URL + "?old": b"list([{file:'scc20231231.html.gz',size:9}]);",
        DAILY_URL.format(name="scc20240102.html.gz"): _gz(DAILY_HTML),
    }

    def fetch(url: str) -> bytes:
        if url in responses:
            return responses[url]
        if url.startswith("https://tenhou.net/0/log/?"):
            return xml_payload
        raise AssertionError(f"unexpected fetch: {url}")

    return fetch


def test_parse_archive_index():
    assert parse_archive_index(INDEX_BODY) == [
        "scc20240102.html.gz",
        "scc20240103.html.gz",
        "sca20240102.log.gz",
    ]


def test_scan_archive_index_includes_old():
    names = scan_archive_index(make_fetcher(), include_old=True)
    assert "scc20231231.html.gz" in names and "scc20240102.html.gz" in names


def test_filter_archives_by_date():
    names = parse_archive_index(INDEX_BODY)
    assert filter_archives_by_date(names, "20240102") == [
        "scc20240102.html.gz",
        "sca20240102.log.gz",
    ]
    assert filter_archives_by_date(names, None) == names
    assert filter_archives_by_date(["nodate.html.gz"], None) == []


def test_filter_archives_by_date_prefix():
    # Reference extractor.py:38 uses startswith: a YYYYMM prefix
    # selects the whole month, a YYYY prefix the whole year.
    names = parse_archive_index(INDEX_BODY)
    month = filter_archives_by_date(names, "202401")
    assert month == [n for n in names if "202401" in n]
    assert len(month) >= 2
    assert filter_archives_by_date(names, "2023") == [
        n for n in names if "2023123" in n
    ]


def test_extract_log_ids():
    assert extract_log_ids(_gz(DAILY_HTML)) == [
        "2024010211gm-0001",
        "2024010212gm-0002",
    ]


def test_daily_log_ids_groups_by_date():
    out = daily_log_ids(["scc20240102.html.gz"], make_fetcher())
    assert out == {"20240102": ["2024010211gm-0001", "2024010212gm-0002"]}


def test_fetch_logs_layout_and_skip(tmp_path):
    ids = {"20240102": ["2024010211gm-0001", "2024010212gm-0002"]}
    n = fetch_logs(ids, str(tmp_path), make_fetcher(b"<mjloggm/>"))
    assert n == 2
    p = tmp_path / "20240102" / "2024010211gm-0001.xml"
    assert p.read_bytes() == b"<mjloggm/>"
    # idempotent re-run writes nothing
    assert fetch_logs(ids, str(tmp_path), make_fetcher()) == 0


def test_fetch_logs_distributed_feeds_scan_logs(spark, tmp_path):
    """S4 distributed sink produces exactly the layout S5's binaryFile
    scan consumes."""
    from mahjong_etl_spark.sources.xml_source import scan_logs

    ids = {
        "20240102": ["2024010211gm-0001"],
        "20240103": ["2024010311gm-0009"],
    }
    n = fetch_logs_distributed(
        spark, ids, str(tmp_path), make_fetcher(), num_partitions=2
    )
    assert n == 2
    scanned = scan_logs(spark, str(tmp_path)).select("dt_raw", "game_id").collect()
    assert {(r.dt_raw, r.game_id) for r in scanned} == {
        ("20240102", "2024010211gm-0001"),
        ("20240103", "2024010311gm-0009"),
    }
    assert fetch_logs_distributed(spark, {}, str(tmp_path)) == 0
