"""Check-window rotation report: what should lead the NEXT round's
driver correctness window?

The driver hash-checks the first 50 registry entries each round
(r1-r6 evidence).  The r5 post-mortem showed the failure mode of
managing that prefix by hand: a query can sit "checked" on a
rows-only record forever.  This tool derives the rotation facts
directly from the committed CORRECTNESS_r*.json history so the next
round's head can be assembled mechanically:

    python tests/window_tool.py

Report sections:
  1. NEVER hash-verified oracle queries  -> MUST head the next window
  2. stalest hash-green (oldest last-green round first) -> rotation
     queue for the remaining head slots
  3. current placement violations (should be none — the same rules
     are enforced by tests/test_registry_contract.py)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def history() -> dict[str, int]:
    """query -> latest round with a hash_match=true row."""
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match") is True:
                    last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green


def main() -> int:
    from mahjong_etl_spark.plans.registry import registry

    reg = registry()
    names = list(reg)
    window = set(names[:50])
    green = history()

    oracle_qs = [n for n, q in reg.items() if q.oracle is not None]
    never = [n for n in oracle_qs if n not in green]
    print(f"registry: {len(reg)} queries, {len(oracle_qs)} oracle-backed")
    print(f"hash-green ever: {len([n for n in oracle_qs if n in green])}")
    print()
    print(f"1. NEVER hash-verified ({len(never)}) — must lead next head:")
    for n in never:
        mark = "in window" if n in window else "OUTSIDE WINDOW"
        print(f"   {n}  [{mark}]")
    print()
    by_staleness = sorted(
        (n for n in oracle_qs if n in green), key=lambda n: (green[n], n)
    )
    print("2. stalest hash-green (rotation queue head):")
    for n in by_staleness[:20]:
        print(f"   r{green[n]}  {n}")
    print()
    out = [n for n in never if n not in window]
    print(
        f"3. violations: {len(out)} never-verified outside window"
        + (f": {out}" if out else " (clean)")
    )
    return 1 if out else 0


if __name__ == "__main__":
    raise SystemExit(main())
