"""Plan-shape tests for the adapted TPC-H suite (parity/tpch_queries).

Correctness is driver/oracle-gated (h02–h22 each have a DuckDB oracle
row); these tests pin the PHYSICAL plans — the properties that decide
whether the same query survives a 100 TB scale-up:

- fixed-size dims (nation/region) broadcast, never shuffled;
- top-N queries plan TakeOrderedAndProject, not a global Sort;
- scan-level predicate pushdown on the fact table;
- no CartesianProduct anywhere except the intentional 1-row scalar
  broadcasts (h11/h14/h15/h22), which must be BroadcastNestedLoopJoin
  over a single-row aggregate.
"""

from __future__ import annotations

import pytest

from tabular_to_parquet_spark.parity import tpch_queries as _tpch  # noqa: F401  (registers)
from tabular_to_parquet_spark.parity.catalog import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_h05_broadcasts_dims(spark):
    plan = _plan(spark, "h05_local_supplier_volume")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_h03_top10_is_take_ordered(spark):
    plan = _plan(spark, "h03_shipping_priority")
    assert "TakeOrderedAndProject" in plan, plan


def test_h10_top20_is_take_ordered(spark):
    plan = _plan(spark, "h10_returned_items")
    assert "TakeOrderedAndProject" in plan, plan


def test_h18_top100_is_take_ordered(spark):
    plan = _plan(spark, "h18_large_volume_customers")
    assert "TakeOrderedAndProject" in plan, plan


def test_h06_filters_pushed_to_scan(spark):
    plan = _plan(spark, "h06_forecast_revenue")
    # the shipdate/discount/quantity predicates must reach the parquet
    # scan (DataFilters on the FileScan node), and column pruning must
    # reduce the read schema to exactly the four referenced columns
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "DataFilters: [isnotnull(l_shipdate" in scan, scan
    assert (
        "[l_quantity#" in scan and "l_extendedprice#" in scan
        and "l_discount#" in scan and "l_shipdate#" in scan
    ), scan
    assert "l_orderkey" not in scan, scan  # pruned


def test_h04_semi_join_for_exists(spark):
    plan = _plan(spark, "h04_priority_late_orders")
    assert "LeftSemi" in plan, plan


def test_h22_anti_join_for_not_exists(spark):
    plan = _plan(spark, "h22_sales_opportunity")
    assert "LeftAnti" in plan, plan


@pytest.mark.parametrize(
    "name",
    [n for n in CATALOG if n.startswith("h")],
)
def test_no_cartesian_product(spark, name):
    # scalar broadcasts are BroadcastNestedLoopJoin over 1-row aggs —
    # a CartesianProduct would mean a real unkeyed cross join
    assert "CartesianProduct" not in _plan(spark, name)


def test_runtime_bloom_filter_injects_on_selective_dim(spark):
    """Runtime bloom-filter join pruning — the 100 TB shuffle-join
    optimization: a selective dim filter seeds a bloom filter applied
    on the fact side BEFORE its shuffle.  Defaults gate on a 10 GB
    application-side scan, so the test lowers the threshold to prove
    the engine path on toy data (production-size scans trigger it
    untouched)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        part = spark.read.parquet(f"{SF_DIR}/part.parquet").filter(
            F.col("p_type") == "PROMO"
        )
        j = li.join(part, li.l_partkey == part.p_partkey).groupBy("p_brand").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower(), plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
