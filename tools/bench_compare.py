#!/usr/bin/env python
"""Compare two bench detail JSONs (pre/post optimization) and print a
markdown table of the movers plus set-level stats.

Usage: python tools/bench_compare.py BEFORE.json AFTER.json [top_n]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    before = json.load(open(sys.argv[1]))
    after = json.load(open(sys.argv[2]))
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    qb, qa = before["queries"], after["queries"]
    shared = sorted(set(qb) & set(qa))
    ratios = {n: qa[n] / qb[n] for n in shared if qb[n] > 0}
    print(f"before wall {before['value']:.1f}s ({len(qb)} q, "
          f"host_loaded={before.get('host_loaded')}, "
          f"load_start={before.get('load_run_start')})")
    print(f"after  wall {after['value']:.1f}s ({len(qa)} q, "
          f"host_loaded={after.get('host_loaded')}, "
          f"load_start={after.get('load_run_start')})")
    if not ratios:
        print("no shared queries with before-time > 0 — nothing to compare")
        return
    med = statistics.median(ratios.values())
    print(f"median per-query ratio {med:.3f} over {len(ratios)} shared")
    movers = sorted(shared, key=lambda n: qb[n] - qa[n], reverse=True)
    print("\n| query | before s | after s | ratio |")
    print("|---|---|---|---|")
    for n in movers[:top_n]:
        r = ratios.get(n, float("nan"))
        print(f"| {n} | {qb[n]:.3f} | {qa[n]:.3f} | {r:.2f} |")
    regress = [n for n in shared if qb[n] > 0.2 and ratios.get(n, 0) > 1.5]
    print(f"\nregressions >1.5x (before>0.2s): {regress or 'none'}")


if __name__ == "__main__":
    main()
