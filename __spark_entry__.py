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


# Queries with no CORRECTNESS_r03 driver row (the r3 run stopped at 50
# entries; these 33 last ran in round 2) run FIRST so a capped round-4
# sweep re-confirms them — notably x09's post-fix plan and the
# cache_signatures refactor of d04/d06; everything else follows in
# registration order. New round-4 queries come right after the stale
# set so they land inside the ~50-row cap too.
_PRIORITY = [
    "x02_fingerprint",
    "x03_quality",
    "x04_lang_id",
    "x05_source_stats",
    "x07_winnow_fingerprints",
    "x09_top_tokens",
    "d01_exact_groups",
    "d02_dedup_exact",
    "d03_minhash_signature",
    "d04_minhash_pairs",
    "d05_simhash",
    "d06_simhash_pairs",
    "d07_jaccard_pairs",
    "d08_embedding_dup_pairs",
    "s01_knn_bruteforce",
    "s02_knn_lsh",
    "s03_knn_ivf",
    "ev01_event_window_stats",
    "ev02_event_window_stats_streaming",
    "ev03_sessionize",
    "ev04_sessionize_streaming",
    "ev05_session_window_builtin",
    "st1_stream_convert_roundtrip",
    "p13_ragged_row_repair",
    "p14_strict_unparseable_drop",
    "a1_pricing_summary",
    "a2_orders_by_nation",
    "a3_top_users_per_event_type",
    "a4_customers_without_orders",
    "a5_segment_set_ops",
    "a6_rollup_order_counts",
    "a7_moving_sum_frame",
    "a8_asof_join",
    # new in round 5 — no prior driver row by construction
    "x11_bpe_token_counts",
    "pl09_dedup_against_bucketed",
    "pl10_dedup_near_against",
    "st2_stream_dedup_ingest",
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
