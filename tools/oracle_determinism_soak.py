"""Determinism soak over every declared DuckDB oracle: run each oracle
N times on a fresh multithreaded connection and flag any query whose
full-output hash varies across runs.

Motivation (r14): the d23/d25 interval-merge oracles were computed
intermittently WRONG by DuckDB 1.0.0's parallel window operator
(~1/3 of multithreaded runs; threads=1 stable) — a latent flake in
the correctness gate that has nothing to do with the Spark engine.
This sweep catches any other oracle with run-to-run instability.

Usage: python tools/oracle_determinism_soak.py [sf_dir] [reps] [name_filter]
Exit 1 if any oracle is unstable.
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    name_filter = sys.argv[3] if len(sys.argv) > 3 else ""

    oracles = entry_mod.oracle_sql()
    unstable: list[str] = []
    n = 0
    for name, sql in oracles.items():
        if sql is None:
            continue
        if name_filter and not re.search(name_filter, name):
            continue
        n += 1
        hashes = set()        # raw (row-order-sensitive) hashes
        value_hashes = set()  # canonical row-sorted hashes — the finding
        t0 = time.monotonic()
        err = None
        for _ in range(reps):
            con = duckdb.connect()
            try:
                for t in TABLES:
                    con.sql(
                        f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
                    )
                df = con.sql(sql).df()
                hashes.add(hashlib.md5(df.to_csv().encode()).hexdigest())
                # VALUE instability is the bug class this tool hunts;
                # an oracle without a total ORDER BY may legitimately
                # reorder rows run to run (r14 ADVICE) — hash the
                # sorted line set so order-only drift is reported
                # separately instead of flagged UNSTABLE
                lines = sorted(df.to_csv(index=False).splitlines())
                value_hashes.add(
                    hashlib.md5("\n".join(lines).encode()).hexdigest()
                )
            except Exception as exc:  # noqa: BLE001 - fixture-dependent oracles
                err = f"{type(exc).__name__}: {exc}"
                break
            finally:
                con.close()
        dt = time.monotonic() - t0
        if err is not None:
            # fixture-dependent oracles (temp-table queries etc.) cannot
            # run standalone — not a determinism finding
            print(f"skip {name}: {err[:100]} ({dt:.1f}s)", flush=True)
        elif len(value_hashes) > 1:
            unstable.append(name)
            print(f"UNSTABLE {name}: {len(value_hashes)} distinct sorted "
                  f"outputs over {reps} runs ({dt:.1f}s)", flush=True)
        elif len(hashes) > 1:
            print(f"ok   {name} (ORDER-only instability: values stable "
                  f"sorted, {len(hashes)} row orders; {dt:.1f}s)", flush=True)
        else:
            print(f"ok   {name} ({dt:.1f}s)", flush=True)
    print(f"\n{n - len(unstable)}/{n} oracles stable over {reps} runs; "
          f"unstable: {unstable}")
    return 1 if unstable else 0


if __name__ == "__main__":
    raise SystemExit(main())
