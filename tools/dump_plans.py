"""Regenerate the physical-plan audit behind SCALE.md.

Prints `explain`-style plans for each headline operator so the claims
(pushdown, broadcast, exchange counts, WindowGroupLimit, partial
aggregation) can be re-checked after any change:

    python tools/dump_plans.py [sf_dir] > PLANS.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tabular_to_parquet_spark.operators import dedup, similarity
from tabular_to_parquet_spark.operators import text_analysis as ta
from tabular_to_parquet_spark.session import get_spark
from tabular_to_parquet_spark.sources.tables import load_table
from tabular_to_parquet_spark.streaming.streams import (
    sessionize_frame,
    windowed_event_stats_frame,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("dump-plans")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    events = load_table(spark, sf_dir, "events")
    queries = emb.filter(F.expr("vec_id % 50 = 0"))

    plans = {
        "dedup_exact": dedup.dedup_exact(docs),
        "minhash_pairs": dedup.minhash_pairs(docs),
        "simhash_pairs": dedup.simhash_pairs(docs),
        "knn_bruteforce": similarity.knn_bruteforce(emb, queries, k=5),
        "knn_lsh": similarity.knn_lsh(emb, queries, k=5),
        "knn_ivf": similarity.knn_ivf(emb, queries, k=5),
        "quality": ta.quality(docs),
        "winnow_fingerprints": ta.winnow_fingerprints(docs),
        "event_window_stats": windowed_event_stats_frame(events),
        "sessionize": sessionize_frame(events),
    }
    for name, df in plans.items():
        print(f"\n{'=' * 72}\n== {name}\n{'=' * 72}")
        df.explain("formatted")


if __name__ == "__main__":
    main()
