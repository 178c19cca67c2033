"""bench.py's compact-line contract: the printed line must carry the
COMPLETE per-query timing vector inside the driver's ~2000-char stdout
window.  Names don't fit (141+ of them are ~3 kB; even zlib+base64 of
the full map measures 2.3 kB), so the line ships ``qvals`` in
sorted(name) order plus a sha1 pin of the name vector — and THIS test
pins that the name vector is exactly reconstructable from the registry
of the same commit, so any BENCH_r{N}.json + its repo checkout yields
the full name->time map without the BENCH_DETAIL side file."""

from __future__ import annotations

import hashlib
import json
import os


def _expected_names() -> list[str]:
    from mahjong_etl_spark.plans.registry import registry

    benched = [n for n, q in registry().items() if q.bench]
    # the two mahjong ETL probes plus the r15 named cache-fill line
    # (the shared shingle/co-occurrence materialization, moved out of
    # the untimed warm-up per the r14 verdict) are bench-only keys
    return sorted(
        benched
        + ["mahjong_etl_1k", "mahjong_query_1k", "dedup_family_cache_fill"]
    )


def test_qnames_reconstruction_matches_committed_detail():
    """The newest committed BENCH_DETAIL must agree with the
    reconstruction rule — names = sorted(bench registry names + the
    two mahjong ETL probes) — up to queries added/removed SINCE that
    detail file's round (the sha1 in the line catches drift at read
    time; this test catches a broken RULE, i.e. a timing key that is
    neither a registry bench query nor a known probe)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    details = sorted(
        f for f in os.listdir(root) if f.startswith("BENCH_DETAIL_r")
    )
    assert details, "no committed BENCH_DETAIL_r*.json"
    with open(os.path.join(root, details[-1])) as f:
        got = set(json.load(f)["queries"])
    expected = set(_expected_names())
    stray = got - expected
    assert not stray, (
        f"timing keys outside the reconstruction rule (registry bench "
        f"names + mahjong_*_1k): {sorted(stray)}"
    )


def test_compact_line_shape_and_size():
    """Build the compact line exactly as bench.py would from the
    newest committed detail: it must fit the 1500-char budget and its
    qvals/qnames_sha1 must round-trip the full map."""
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    details = sorted(
        f for f in os.listdir(root) if f.startswith("BENCH_DETAIL_r")
    )
    with open(os.path.join(root, details[-1])) as f:
        out = json.load(f)
    timings = out["queries"]

    names = sorted(timings)
    out_c = dict(out)
    # mirrors bench.py: the raw pair vectors and full 1/5/15 load
    # triplets live in the detail file only; the compact line keeps
    # median + spread + the 1-min load components
    out_c.pop("etl_vs_ref_speedup_pairs", None)
    out_c.pop("etl_vs_ref_pairs_raw", None)
    out_c.pop("load_run_start", None)
    out_c.pop("load_run_end", None)
    out_c.pop("load_pairs", None)
    if "load_run_start" in out:  # r12+ detail files carry the weather
        out_c["load1m"] = {
            "s": out["load_run_start"][0],
            "e": out["load_run_end"][0],
            "p": out["load_pairs"],
        }
    out_c["n_queries"] = len(timings)
    out_c["qvals"] = [round(timings[n], 2) for n in names]
    out_c["qorder"] = "sorted(bench-names+mahjong_*_1k+cache-fill)"
    out_c["qnames_sha1"] = hashlib.sha1(",".join(names).encode()).hexdigest()[:12]
    out_c["detail"] = details[-1]
    slowest = sorted(timings, key=timings.get, reverse=True)
    for k in range(12, -1, -1):
        out_c["queries"] = {n: timings[n] for n in slowest[:k]}
        line = json.dumps(out_c)
        if len(line) <= 1600:
            break

    assert len(line) <= 1600, f"compact line still {len(line)} chars"
    parsed = json.loads(line)
    assert len(parsed["qvals"]) == parsed["n_queries"] == len(timings)
    # the slowest-queries dict survives whole with REAL query names
    assert parsed["queries"] and set(parsed["queries"]) <= set(timings)
    assert parsed["qorder"] == "sorted(bench-names+mahjong_*_1k+cache-fill)"
    # the sha1 pin + sorted order reconstructs the full map
    rec = dict(zip(names, parsed["qvals"]))
    assert hashlib.sha1(
        ",".join(sorted(rec)).encode()
    ).hexdigest()[:12] == parsed["qnames_sha1"]
    for n, v in rec.items():
        assert abs(v - timings[n]) <= 0.005 + 1e-9
