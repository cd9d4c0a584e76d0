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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _ordered(qd.spark) for name, qd in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: f"SELECT * FROM (\n{qd.oracle}\n) AS _q ORDER BY ALL NULLS FIRST"
        for name, qd in CATALOG.items()
        if qd.oracle is not None
    }
