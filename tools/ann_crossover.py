"""Measure the brute-vs-IVF wall-time crossover corpus size.

Usage:
    python tools/ann_crossover.py [sf_dir] [k] [query_modulus]

At sf0.1 (2k x 64-d) brute force WINS wall time: the IVF plan pays
2-3 extra stages of fixed overhead to prune a corpus that already
fits in one task (SCALE.md §3). This tool finds where that flips:
the corpus is grown by key-shifted replication (1x, 4x, 16x, 64x)
against a FIXED query set (``vec_id % query_modulus = 0``, default
10 -> 200 queries), and brute / IVF warm latency (min of 2) is timed
at each size. Cells scale with the corpus via ``suggest_cells`` with
a task-sized target, as they would at 100 TB. The driver is total
dot-product work |Q|*|C| vs the IVF candidate fraction probes/cells
— report both axes when quoting a crossover.

The printed crossover feeds the knn_ivf docstring so sf0.1 bench
numbers are never mistaken for the scale story.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tabular_to_parquet_spark.operators import similarity as sim
from tabular_to_parquet_spark.session import get_spark
from tabular_to_parquet_spark.sources.tables import load_table


def replicate(emb, copies: int):
    """Key-shifted union: distinct vec_ids, identical vector geometry
    (PERF input only — duplicate vectors are fine for timing)."""
    n = emb.count()
    parts = [emb]
    for i in range(1, copies):
        parts.append(emb.select(
            (F.col("vec_id") + i * n).alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        ))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.repartition(32).cache()


def warm_sec(build) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        build().count()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ann_crossover")
    spark.sparkContext.setLogLevel("ERROR")
    qmod = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.expr(f"vec_id % {qmod} = 0")).cache()
    n_q = queries.count()

    print(f"queries={n_q} k={k}")
    print("| corpus | Mdots | cells | brute warm s | ivf warm s | ratio |")
    print("|---|---|---|---|---|---|")
    for copies in (1, 4, 16, 64):
        corpus = replicate(emb, copies)
        n = corpus.count()
        cells = sim.suggest_cells(n, target_rows_per_cell=1 << 13)
        t_brute = warm_sec(lambda: sim.knn_bruteforce(corpus, queries, k=k))
        t_ivf = warm_sec(
            lambda: sim.knn_ivf(
                corpus, queries, k=k,
                anchors=sim.ivf_anchors(cells), probes=max(2, cells // 8),
            )
        )
        print(f"| {n} | {n_q * n / 1e6:.1f} | {cells} | {t_brute:.2f} | "
              f"{t_ivf:.2f} | {t_brute / t_ivf:.2f}x |", flush=True)
        corpus.unpersist()


if __name__ == "__main__":
    main()
