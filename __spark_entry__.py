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


# Queries with no CORRECTNESS_r02 driver row (the r2 run stopped at 50
# entries) run FIRST so a capped round-3 sweep still lands the hard
# signal for them; everything else follows in registration order.
_PRIORITY = [
    "s4_delimiter_sniff_tsv",
    "j1_json_source_roundtrip",
    "orc1_typed_roundtrip",
    "orc2_string_inference",
    "m01_media_features",
    "m02_media_sample_frames",
    "m03_media_resize",
    "m04_bmp_decode_features",
    "m05_bmp_resize_features",
    "m06_wav_decode_features",
    "m07_png_decode_features",
    "m08_avi_decode_features",
    "a9_range_join_binned",
    "a10_cube_order_counts",
    "a11_salted_agg",
    "a12_salted_join",
    "a13_star_join_revenue",
    "x08_props_json_extract",
    # new in round 3 — no prior driver row by construction
    "avro1_typed_roundtrip",
    "avro2_string_inference",
    "x10_winnow_rolling",
    "m09_mjpeg_decode_features",
    "pl01_hash_split_stats",
    "pl02_mixture_sample",
    "pl03_stratified_sample",
    "pl04_redact_pii",
    "pl05_pack_stats",
    "pl06_shard_checksum",
    "pl07_dedup_against",
    "pl08_prepare_corpus",
    "pr01_profile_orders",
    "pr02_value_histogram",
    "pr03_event_percentiles",
]


def _catalog_ordered():
    rest = [n for n in CATALOG if n not in _PRIORITY]
    for name in [*_PRIORITY, *rest]:
        yield name, CATALOG[name]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _ordered(qd.spark) for name, qd in _catalog_ordered()}


def oracle_sql() -> dict[str, str]:
    return {
        name: f"SELECT * FROM (\n{qd.oracle}\n) AS _q ORDER BY ALL NULLS FIRST"
        for name, qd in _catalog_ordered()
        if qd.oracle is not None
    }
