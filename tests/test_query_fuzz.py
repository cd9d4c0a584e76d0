"""Cross-engine query fuzz (tools/query_fuzz): seeded random SQL in
the deterministic dialect intersection, identical text on Spark and
DuckDB, exact compare.  CI runs a fixed seed window; deeper sweeps
via `python tools/query_fuzz.py N`."""

from __future__ import annotations

import os

import duckdb
import pytest

from tools.query_fuzz import gen_query, run_fuzz

SF_DIR = "/root/testdata/sf0.001"


def test_generator_is_deterministic():
    assert gen_query(7) == gen_query(7)
    assert gen_query(7) != gen_query(8)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_fuzz_window_matches(spark):
    from tabular_to_parquet_spark.sources.tables import TABLE_NAMES, create_views

    create_views(spark, SF_DIR)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    failures = run_fuzz(spark, con, n_queries=30, seed0=1000)
    assert not failures, failures[:3]
