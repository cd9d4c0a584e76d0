"""Compare two bench payload JSON files query by query.

Usage: python tools/bench_diff.py BEFORE.json AFTER.json [min_sec]
Prints per-query before -> after with ratio, sorted by absolute saving;
suppresses rows where both sides are below min_sec (default 0.5 s).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    before = json.load(open(sys.argv[1]))
    after = json.load(open(sys.argv[2]))
    min_sec = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    qb, qa = before["queries"], after["queries"]
    common = sorted(set(qb) & set(qa))
    rows = []
    for q in common:
        b, a = qb[q], qa[q]
        if max(b, a) < min_sec:
            continue
        rows.append((b - a, b, a, q))
    rows.sort(reverse=True)
    print(f"{'before':>8} {'after':>8} {'ratio':>6}  query")
    for d, b, a, q in rows:
        print(f"{b:8.3f} {a:8.3f} {b / a if a else 0:6.2f}  {q}")
    tb = sum(qb[q] for q in common)
    ta = sum(qa[q] for q in common)
    print(f"\ncommon-query totals: {tb:.1f} -> {ta:.1f} s "
          f"({tb / ta if ta else 0:.2f}x); payload totals "
          f"{before['value']} -> {after['value']}")
    for k in ("canary_sha256_sec", "canary_spark_noop_sec", "load1_before",
              "idle_at_start", "sched_latency_p90_us"):
        print(f"  {k}: {before.get(k)} -> {after.get(k)}")


if __name__ == "__main__":
    main()
