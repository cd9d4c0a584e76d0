"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (the reference's whole product
surface: delimited text → inference → lenient-cast projection →
Parquet → typed DataFrame; cf. reference conversion.rs:28-120).
``queries``/``oracle_sql`` expose the full parity catalog — reference
operators (tabular_to_parquet_spark/parity/catalog.py) plus the
training-data extensions (parity/extensions.py).

Determinism: the driver's value-hash compare must see identical row
sets; Spark output order is nondeterministic across partitions
(SURVEY.md §4.3), so every query is wrapped in a total ORDER BY over
all columns (positional) on the Spark side and ``ORDER BY ALL NULLS
FIRST`` (same positional order, same nulls-first ordering as Spark's
default asc_nulls_first) on the DuckDB side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tabular_to_parquet_spark.parity import extensions as _extensions  # noqa: F401  (registers)
from tabular_to_parquet_spark.parity import pipeline_queries as _pipeline_queries  # noqa: F401  (registers)
from tabular_to_parquet_spark.parity import profiling_queries as _profiling_queries  # noqa: F401  (registers)
from tabular_to_parquet_spark.parity import tpch_queries as _tpch_queries  # noqa: F401  (registers)
from tabular_to_parquet_spark.parity.catalog import CATALOG


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CATALOG["s6_conversion_roundtrip"].spark(spark, "/root/testdata/sf0.001")


def _ordered(fn: Callable[[SparkSession, str], DataFrame]):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from tabular_to_parquet_spark.sources.tables import _ensure_session_confs

        _ensure_session_confs(spark)  # driver sessions: UTC + ns-parquet
        df = fn(spark, sf_dir)
        return df.orderBy(*[df[c] for c in df.columns])

    return wrapped


# Priority order for the capped (~50-row) driver sweep. Round 6: the
# 74 catalog queries that have never had a CORRECTNESS_r* driver row
# (union of r1-r5) go first, in catalog registration order, so the r6
# sweep certifies ~50 of them and r7 finishes the tail. Everything
# already driver-green follows in registration order (via _catalog_ordered).
_PRIORITY = [
    "h20_red_part_shippers",
    "h21_waiting_suppliers",
    "h22_sales_opportunity",
    "x17_bm25_topk",
    "x18_tfidf_top_terms",
    "pl15_merge_upsert",
    "a20_cohort_retention",
    "st4_stream_click_purchase_join",
    "pr06_value_outliers",
    "pl16_snapshot_diff",
    "a21_scd2_intervals",
    "xml1_typed_roundtrip",
    "a22_recursive_hierarchy",
    "g01_pagerank_copurchase",
    "x19_copurchase_top_pairs",
    "pr07_quality_expectations",
    "a23_rolling_1h_features",
    "x20_variant_props_stats",
    "pl17_incremental_agg",
    "st5_stream_dedup_within_watermark",
    "pl18_schema_evolution",
    "ev07_hopping_window_stats",
    "pl19_temperature_mixture",
    "pl20_budget_selection",
    "x21_termfreq_udtf",
    "pl21_prepare_training_run",
    "x22_string_functions",
    "pl22_zorder_clusters",
    "s04_label_centroids",
    "s05_nearest_centroid_confusion",
    "x23_array_functions",
    "ev08_session_window_dynamic_gap",
    "x24_source_lang_gini",
    "d12_edit_distance_pairs",
    "x25_countmin_heavy_hitters",
    "a24_event_transitions",
    "pl23_context_target_pairs",
    "pr08_approx_distinct_users",
    "st6_stream_static_enrich",
    "x26_bigram_lm_counts",
    "ev09_hopping_window_streaming",
    "x27_ascii_profile",
    "pl24_negative_samples",
    "avro3_python_datasource",
    "a25_cusum_alerts",
    "x28_grouped_agg_udaf",
    "st7_python_stream_source",
    "st8_python_stream_source_parallel",
    "pr09_approx_event_percentiles",
    "avro4_writer_roundtrip",
    "st9_python_stream_sink",
    "g02_triangle_count",
    "pl25_curriculum_phases",
    "x29_kwic",
    "x30_duplicate_passages",
    "x31_langid_confusion",
    "pl26_epoch_shuffle",
    "sql1_sqlite_roundtrip",
    "m12_gif_decode_features",
    "pl27_boilerplate_strip",
    "a26_spend_growth",
    "a27_window_function_zoo",
    "a28_relational_division",
    "pr10_benford_digits",
    "m13_gif_resize_features",
    "pr11_ols_sufficient_stats",
    "x32_association_rules",
    "s8_gzip_conversion",
    "d13_minhash_verified_pairs",
    "a29_asof_forward",
    "pl29_pack_bpe_budget",
    "x33_postings",
    "pr12_fd_audit",
    "d14_sorted_neighborhood_pairs",
]


def _catalog_ordered():
    rest = [n for n in CATALOG if n not in _PRIORITY]
    for name in [*_PRIORITY, *rest]:
        if name in CATALOG:
            yield name, CATALOG[name]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _ordered(qd.spark) for name, qd in _catalog_ordered()}


def oracle_sql() -> dict[str, str]:
    return {
        name: f"SELECT * FROM (\n{qd.oracle}\n) AS _q ORDER BY ALL NULLS FIRST"
        for name, qd in _catalog_ordered()
        if qd.oracle is not None
    }
