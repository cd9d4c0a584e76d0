"""Global-order recovery (operators/ordering.py): exact positions
without a single-partition sort, arithmetic ntile, and the a16 decile
scale twin."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tabular_to_parquet_spark.operators.ordering import (
    decile_stats_scale,
    ntile_expr,
    with_global_position,
)

SF = "/root/testdata/sf0.001"


def test_with_global_position_matches_global_row_number(spark):
    rows = [(i, f"k{i % 7}{i:04d}") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, key string")
    got = {
        r["id"]: r["pos"]
        for r in with_global_position(
            df, ["key", "id"], F.substring("key", 1, 2)
        ).collect()
    }
    exp = {
        r["id"]: r["rn"]
        for r in df.select(
            "id", F.row_number().over(W.orderBy("key", "id")).cast("long").alias("rn")
        ).collect()
    }
    assert got == exp


def test_with_global_position_null_block_sorts_first(spark):
    """A NULL block (NULL leading sort key) must not be dropped: its
    rows take positions 1..k, matching the window form's default
    asc_nulls_first ordering."""
    rows = [(i, None if i % 5 == 0 else f"k{i % 7}{i:04d}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, key string")
    got = {
        r["id"]: r["pos"]
        for r in with_global_position(
            df, [F.col("key").asc_nulls_first(), "id"], F.substring("key", 1, 2)
        ).collect()
    }
    exp = {
        r["id"]: r["rn"]
        for r in df.select(
            "id",
            F.row_number()
            .over(W.orderBy(F.col("key").asc_nulls_first(), "id"))
            .cast("long")
            .alias("rn"),
        ).collect()
    }
    assert got == exp
    assert len(got) == 200  # no rows silently dropped


@pytest.mark.parametrize("total", [1, 3, 9, 10, 11, 19, 100, 12345])
def test_ntile_expr_matches_builtin(spark, total):
    df = spark.range(1, total + 1).select(F.col("id").alias("pos"))
    got = {
        r["pos"]: r["b"]
        for r in df.select(
            "pos", ntile_expr(F.col("pos"), F.lit(total).cast("long"), 10).alias("b")
        ).collect()
    }
    exp = {
        r["id"]: r["b"]
        for r in spark.range(1, total + 1)
        .select("id", F.ntile(10).over(W.orderBy("id")).alias("b"))
        .collect()
    }
    assert got == exp


def test_decile_scale_twin_matches_window_form(spark):
    """decile_stats_scale must equal the a16 catalog query exactly
    (global ntile + lag gaps), with no global window in its plan."""
    from tabular_to_parquet_spark.parity import extensions as _ext  # noqa: F401
    from tabular_to_parquet_spark.parity.catalog import CATALOG
    from tabular_to_parquet_spark.sources.tables import load_table

    orders = load_table(spark, SF, "orders")
    twin = sorted(tuple(r) for r in decile_stats_scale(orders).collect())
    cat = sorted(
        tuple(r) for r in CATALOG["a16_decile_stats"].spark(spark, SF).collect()
    )
    assert twin == cat and len(twin) == 10

    plan = (
        decile_stats_scale(orders)._jdf.queryExecution().executedPlan().toString()
    )
    lines = plan.splitlines()
    hits = [i for i, l in enumerate(lines) if "Exchange SinglePartition" in l]
    for i in hits:  # only the bounded per-block/total aggregates
        assert "HashAggregate" in lines[i + 1], lines[i : i + 2]
