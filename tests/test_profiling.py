"""Unit tests for the profiling operators (operators/profiling.py).
Cross-engine value parity is covered by the pr01–pr03 oracle gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tabular_to_parquet_spark.operators import profiling as pr


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (i, None if i % 10 == 0 else f"s{i % 7}", float(i) / 2) for i in range(100)
    ]
    return spark.createDataFrame(rows, "id long, s string, v double")


def test_profile_table_stats(spark, table):
    got = {r["column"]: r for r in pr.profile_table(table).collect()}
    assert got["id"]["n_values"] == 100 and got["id"]["n_nulls"] == 0
    assert got["id"]["n_distinct"] == 100
    assert got["id"]["min_value"] == "0" and got["id"]["max_value"] == "99"
    assert got["s"]["n_nulls"] == 10 and got["s"]["n_values"] == 90
    assert got["s"]["n_distinct"] == 7
    # approx mode still produces one row per column with sane counts
    ap = {r["column"]: r for r in pr.profile_table(table, approx=True).collect()}
    assert ap["id"]["n_values"] == 100 and ap["id"]["n_distinct"] > 80


def test_profile_single_job(spark, table):
    # exact mode: one aggregate (with Expand for the distincts), no join
    plan = pr.profile_table(table)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_histogram_bins_and_clamps(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (4.9,), (5.0,), (19.9,), (25.0,), (None,)], "v double"
    )
    got = {r["bin"]: r["n"] for r in pr.histogram(df, "v", 0.0, 20.0, 4).collect()}
    assert got == {-1: 1, 0: 2, 1: 1, 3: 1, 4: 1}  # null dropped


def test_group_percentiles_exact_and_approx(spark):
    rows = [("a", i) for i in range(1, 102)] + [("b", 10), ("b", 20)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in pr.group_percentiles(df, "v", "g").collect()}
    assert got["a"]["p25"] == 26.0 and got["a"]["p50"] == 51.0 and got["a"]["p75"] == 76.0
    assert got["b"]["p50"] == 15.0  # interpolated midpoint
    assert got["a"]["n"] == 101 and got["a"]["min_value"] == 1
    ap = {r["g"]: r for r in pr.group_percentiles(df, "v", "g", approx=True).collect()}
    assert abs(ap["a"]["p50"] - 51) <= 2


def test_profile_approx_plan_has_no_expand(spark, table):
    """The 100 TB claim in the docstring, plan-gated: exact distinct
    counts multiply input via Expand; approx=True (HLL) must not."""
    exact = pr.profile_table(table)._jdf.queryExecution().executedPlan().toString()
    approx = pr.profile_table(table, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact, exact
    assert "Expand" not in approx, approx


def test_group_percentiles_approx_plan_uses_tdigest(spark):
    """approx=True must plan approx_percentile (mergeable, constant
    memory) — not the exact per-group value buffer."""
    df = spark.createDataFrame(
        [("a", i) for i in range(10)], "g string, v long"
    )
    exact = (
        pr.group_percentiles(df, "v", "g")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    approx = (
        pr.group_percentiles(df, "v", "g", approx=True)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "approx_percentile" not in exact, exact
    assert "approx_percentile" in approx, approx


def test_zscore_outliers_flags_the_planted_point(spark):
    import tabular_to_parquet_spark.operators.profiling as prof

    rows = [(i, "g", 10.0 + (i % 3) * 0.02) for i in range(50)] + [(99, "g", 500.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = prof.zscore_outliers(df, "value", ["event_type"], threshold=3.0).collect()
    assert [r["event_id"] for r in out] == [99]
    assert out[0]["z"] > 3.0


def test_zscore_outliers_skips_degenerate_groups(spark):
    import tabular_to_parquet_spark.operators.profiling as prof

    df = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", 5.0)], "event_id long, event_type string, value double"
    )
    assert prof.zscore_outliers(df, "value", ["event_type"]).count() == 0


def test_expectation_report_single_pass_counts(spark):
    import tabular_to_parquet_spark.operators.profiling as prof
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None), (4, 100.0)], "k long, v double"
    )
    out = {r["check"]: (r["n_violations"], r["n_rows"]) for r in prof.expectation_report(
        df,
        {
            "v_nonneg": F.col("v") >= 0,          # -1 fails; NULL pred → no count
            "v_present": F.col("v").isNotNull(),  # one null
        },
    ).collect()}
    assert out["v_present"] == (1, 4)
    # NULL predicate rows are not violations (SQL three-valued when):
    # only the -1 row counts
    assert out["v_nonneg"] == (1, 4)


def test_approx_percentiles_near_exact(spark):
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    cents = F.floor(F.col("value") * 100).cast("long")
    both = (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx(cents, 0.9, 10000).alias("approx"),
            F.expr(
                "percentile(CAST(floor(value * 100) AS BIGINT), 0.9)"
            ).alias("exact"),
        )
        .collect()
    )
    assert both
    for r in both:
        # accuracy=10000 → rank error <= n/10000; generous 2% value gate
        rel = abs(r["approx"] - r["exact"]) / max(abs(r["exact"]), 1)
        assert rel < 0.02, (r["event_type"], r["approx"], r["exact"])
