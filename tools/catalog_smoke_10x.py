"""Whole-catalog execution smoke at replica scale: run EVERY declared
query against a 10x key-shifted replica of sf0.1 (built by
tools/scale_experiment.py) with a noop sink, and report crashes.

No oracle compare — correctness is pinned at sf0.01 by check_parity;
this gate answers a different question: does every plan still EXECUTE
when the data is 60x the certification scale? Spark 4 runs ANSI mode,
so latent arithmetic overflow (the pr11 class: products of aggregates
growing quadratically in n) fails loudly HERE instead of at 100 TB.

Queries that build their own fixtures from the sf dir scale with it
automatically; the RAW catalog builders are used (no total-order
wrapper) so the measured work is the operator, and big outputs don't
pay a driver-facing global sort.

Usage: python tools/catalog_smoke_10x.py <replica_dir> [name_regex]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__  # noqa: F401  (registers the catalog)
from tabular_to_parquet_spark.parity.catalog import CATALOG
from tabular_to_parquet_spark.session import get_spark


def main() -> int:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    sf_dir = sys.argv[1]
    name_regex = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark("catalog-smoke-10x")
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    n = 0
    for name, qd in CATALOG.items():
        if name_regex and not re.search(name_regex, name):
            continue
        n += 1
        t0 = time.monotonic()
        try:
            qd.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            print(f"ok   {name} ({time.monotonic() - t0:.1f}s)", flush=True)
        except Exception as exc:
            failures.append(name)
            msg = str(exc).splitlines()[0][:160] if str(exc) else type(exc).__name__
            print(f"FAIL {name}: {msg}", flush=True)
    print(f"\n{n - len(failures)}/{n} queries execute at replica scale")
    if failures:
        print("failures:", ", ".join(failures))
    if n == 0:
        print("FAIL: name filter matched no queries")
        return 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
