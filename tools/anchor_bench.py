"""SCALE §19 anchor-build timing, idle protocol (r13 verdict item 5).

The r13 crossover table (driver-side ``ivf_anchors`` loop vs
executor-side ``ivf_anchors_distributed``) was measured under a
co-running span-fuzz load (load1 ≈ 5.8) — honest for RATIOS, not
absolutes, and the 8–16k-cell crossover rule is load-sensitive at
exactly the magnitudes where it flips.  This tool re-pins the
absolutes with the bench discipline: refuse to stamp "idle" unless
load1 < 1.0 at start, one DISCARDED distributed warm-up per cell
count (the first Spark job on a cold JVM pays context start-up the
production rule never sees), then min-of-3 per path.

Prints one JSON line per cell count plus a summary line for the
SCALE.md §19 table.

Usage: python tools/anchor_bench.py [cells_csv=4096,16384,65536]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sched_latency_p90_us() -> int:
    """Host scheduling-latency stamp: p90 of time.sleep(1 ms)
    overshoot over 200 reps.  The r14 adjudication found the host can
    enter a multi-ms-wakeup regime (p90 4.2 ms vs the healthy
    ~100 us) that inflates tiny-task Spark jobs 2-4x while leaving
    pure-python loops (the driver anchor path) untouched — exactly
    the asymmetry that would silently shift the §19 crossover, so
    every run records it."""
    over = []
    for _ in range(200):
        t0 = time.monotonic()
        time.sleep(0.001)
        over.append((time.monotonic() - t0 - 0.001) * 1e6)
    return round(sorted(over)[180])


def main() -> int:
    cells_list = [
        int(c)
        for c in (sys.argv[1] if len(sys.argv) > 1
                  else "4096,16384,65536").split(",")
    ]
    from tabular_to_parquet_spark.operators.similarity import (
        ivf_anchors,
        ivf_anchors_distributed,
    )
    from tabular_to_parquet_spark.session import get_spark

    load1 = os.getloadavg()[0]
    idle = load1 < 1.0
    lat_us = _sched_latency_p90_us()
    spark = get_spark("anchor-bench")
    # one throwaway job so the JVM/scheduler cold start is not charged
    # to the first measured cell count
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def min3(fn) -> float:
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            fn()
            runs.append(time.monotonic() - t0)
        return round(min(runs), 3)

    rows = []
    for cells in cells_list:
        # discarded warm-up on the distributed path (cold-plan cost)
        ivf_anchors_distributed(spark, cells)
        driver = min3(lambda: ivf_anchors(cells))
        dist = min3(lambda: ivf_anchors_distributed(spark, cells))
        row = {
            "cells": cells,
            "driver_loop_sec": driver,
            "distributed_sec": dist,
            "ratio_driver_over_dist": round(driver / dist, 2),
            "load1": round(os.getloadavg()[0], 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(
        json.dumps(
            {
                "idle_at_start": idle,
                "load1_before": round(load1, 2),
                "sched_latency_p90_us": lat_us,
                "protocol": "warmup_discarded_min3",
                "rows": rows,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
