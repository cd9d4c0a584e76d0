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


def _asof_plan(spark, events):
    from tabular_to_parquet_spark.operators.joins import asof_join

    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.sum(F.floor(F.col("value") * 100)).alias("cents"))
    )
    return asof_join(clicks, purchases, on="ts", by="user_id")


def _range_plan(spark, events):
    from tabular_to_parquet_spark.operators.joins import range_join_binned

    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.unix_micros("ts").alias("t_us")
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.unix_micros("ts").alias("lo_us"),
        (F.unix_micros("ts") + 1_800_000_000).alias("hi_us"),
    )
    return range_join_binned(errors, signups, "t_us", "lo_us", "hi_us", 1_800_000_000)


def _salted_plan(spark, events):
    from tabular_to_parquet_spark.operators.skew import salted_agg

    return salted_agg(
        events, ["event_type"], {"value_cents": F.floor(F.col("value") * 100)}
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
        "asof_join": _asof_plan(spark, events),
        "range_join_binned": _range_plan(spark, events),
        "salted_agg": _salted_plan(spark, events),
        "quality": ta.quality(docs),
        "winnow_fingerprints": ta.winnow_fingerprints(docs),
        "event_window_stats": windowed_event_stats_frame(events),
        "sessionize": sessionize_frame(events),
        "top_tokens": __import__("__spark_entry__").queries()["x09_top_tokens"](
            spark, sf_dir
        ),
    }
    # round-5 additions, by catalog name (same entry-point the driver uses)
    _qs = __import__("__spark_entry__").queries()
    for qname in (
        "h03_shipping_priority",
        "h05_local_supplier_volume",
        "h21_waiting_suppliers",
        "x17_bm25_topk",
        "g01_pagerank_copurchase",
        "pl15_merge_upsert",
        "pl16_snapshot_diff",
        "pl19_temperature_mixture",
        "pl21_prepare_training_run",
        "a23_rolling_1h_features",
        # round-5 session-3 additions
        "d12_edit_distance_pairs",
        "x25_countmin_heavy_hitters",
        "a24_event_transitions",
        "pl23_context_target_pairs",
        "pl24_negative_samples",
        "x26_bigram_lm_counts",
        "a25_cusum_alerts",
    ):
        plans[qname] = _qs[qname](spark, sf_dir)
    for name, df in plans.items():
        print(f"\n{'=' * 72}\n== {name}\n{'=' * 72}")
        df.explain("formatted")


if __name__ == "__main__":
    main()
