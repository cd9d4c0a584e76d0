"""Measure the write_ipc knob curve (r9 verdict item 6): zstd level ×
rows-per-batch against write wall, container bytes, and read-back wall,
on a real table (lineitem at the given sf_dir; 6M rows at sf0.1).

Usage: python tools/ipc_writer_curve.py [sf_dir] [parts]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tabular_to_parquet_spark.session import get_spark
from tabular_to_parquet_spark.sources.columnar import read_ipc_python, write_ipc
from tabular_to_parquet_spark.sources.tables import load_table


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    spark = get_spark("ipc-writer-curve")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, sf_dir, "lineitem").repartition(parts)
    li.persist()
    n = li.count()
    print(f"lineitem rows={n:,} parts={parts} load1={os.getloadavg()[0]:.2f}")
    print(f"{'level':>6s} {'rows/batch':>10s} {'write_s':>8s} {'MiB':>8s} {'read_s':>8s}")

    for level in (None, 1, 5, 9):
        for rpb in (None, 65536, 262144):
            out = tempfile.mkdtemp(prefix="ipc_curve_")
            shutil.rmtree(out)
            t0 = time.monotonic()
            write_ipc(li, out, compression="zstd",
                      compression_level=level, rows_per_batch=rpb)
            tw = time.monotonic() - t0
            size = sum(
                os.path.getsize(os.path.join(out, f))
                for f in os.listdir(out)
            )
            t0 = time.monotonic()
            got = read_ipc_python(spark, out).count()
            tr = time.monotonic() - t0
            assert got == n, (got, n)
            print(
                f"{str(level):>6s} {str(rpb):>10s} {tw:8.1f} "
                f"{size / 1048576:8.1f} {tr:8.1f}",
                flush=True,
            )
            shutil.rmtree(out)
    li.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
