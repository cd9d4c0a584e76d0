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

from tabular_to_parquet_spark.parity import curation_queries as _curation_queries  # noqa: F401  (registers)
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


# Priority order for the capped (~50-row) driver sweep, computed from
# the committed CORRECTNESS_r*.json rows at import time: every catalog
# query that has never had a *passing* driver row goes first, in
# registration order, so each round's sweep certifies the oldest
# unverified slice and the rotation never needs a manual edit. A row
# counts as passing only if err is unset and no recorded match flag is
# false (rows-only queries record null hash/schema flags — null is not
# a failure); errored or mismatched rows re-queue automatically at the
# sweep head (r6: x29_kwic's only row was a canonicalizer error, and
# "any row == verified" would have dropped it past the cap forever).
# Already-verified queries follow in registration order (via
# _catalog_ordered). Robust to a missing/corrupt file (no rows).


def _never_driver_verified() -> list[str]:
    import glob as _glob
    import json as _json
    import os as _os

    here = _os.path.dirname(_os.path.abspath(__file__))
    seen: set[str] = set()
    for path in sorted(_glob.glob(_os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = _json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # The driver records rows-only (no-oracle) queries with
            # err='no_oracle' and a non-null spark_rows — that IS the
            # documented weaker pass, not a failure (r7 verdict item 2).
            # But it only counts while the catalog still declares no
            # oracle: a query that GAINED an oracle since (r10:
            # pr08/pr09) must re-queue so the sweep upgrades its
            # certification from rows-only to value-hash.
            if row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                q = CATALOG.get(name)
                if q is None or q.oracle is None:
                    seen.add(name)
                continue
            if row.get("err") is not None:
                continue
            flags = [row.get(k) for k in ("rows_match", "schema_match", "hash_match")]
            if any(f is False for f in flags):
                continue
            # rows-only queries (no oracle) may record null match flags;
            # a recorded non-null spark row count with no error is the
            # weaker pass the driver documents for them
            if all(f is None for f in flags) and row.get("spark_rows") is None:
                continue  # no evidence at all — not a pass
            seen.add(name)
    return [name for name in CATALOG if name not in seen]


_PRIORITY = _never_driver_verified()


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
