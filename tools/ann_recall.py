"""Measure ANN recall@k against brute-force ground truth at bench scale.

Usage:
    python tools/ann_recall.py [sf_dir] [k]

Prints a markdown table (pasted into SCALE.md §3) comparing
knn_lsh / knn_ivf (md5 anchors) / knn_ivf (kmeans anchors) recall,
candidate-set cost, and warm latency (min of 2 full executions) at the
default cells/probes, over the same query set bench.py uses
(vec_id % 50 = 0) — the recall/latency trade-off curve in numbers.
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


def pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def timed_pairs(build):
    """(pairs, warm_sec): run the plan twice, keep min wall time."""
    t0 = time.monotonic()
    got = pairs(build())
    t1 = time.monotonic()
    pairs(build())
    sec = min(t1 - t0, time.monotonic() - t1)
    return got, sec


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ann_recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.expr("vec_id % 50 = 0"))
    n_corpus = emb.count()
    n_q = queries.count()
    exact, t_exact = timed_pairs(lambda: sim.knn_bruteforce(emb, queries, k=k))

    rows = [("knn_bruteforce", exact, t_exact)]
    got, t = timed_pairs(lambda: sim.knn_lsh(emb, queries, k=k))
    rows.append(("knn_lsh", got, t))
    got, t = timed_pairs(lambda: sim.knn_ivf(emb, queries, k=k))
    rows.append(("knn_ivf (md5 anchors)", got, t))
    centers = sim.kmeans_anchors(emb)
    for probes in (sim.IVF_PROBES, 8, 12):
        got, t = timed_pairs(
            lambda p=probes: sim.knn_ivf(emb, queries, k=k, anchors=centers, probes=p)
        )
        rows.append((f"knn_ivf (kmeans, probes={probes})", got, t))

    print(f"sf_dir={sf_dir} corpus={n_corpus} queries={n_q} k={k}")
    print(f"cells={sim.IVF_CELLS} probes={sim.IVF_PROBES} "
          f"lsh_bits={sim.LSH_BITS} lsh_bands={sim.LSH_BANDS}")
    print()
    print("| method | recall@%d | found pairs | warm sec |" % k)
    print("|---|---|---|---|")
    for name, got, sec in rows:
        recall = len(exact & got) / len(exact) if exact else 1.0
        print(f"| {name} | {recall:.3f} | {len(got)} | {sec:.2f} |")

    print()
    for slo in (0.8, 0.9):
        p, r = sim.tune_probes(emb, queries, k=k, recall_slo=slo, anchors=centers)
        print(f"tune_probes(slo={slo}, kmeans anchors) -> probes={p} recall={r:.3f}")


if __name__ == "__main__":
    main()
