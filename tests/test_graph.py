"""Graph operator tests (operators/graph): PageRank fixed-point
semantics on hand-built graphs.  Exact large-scale values are
oracle-gated (g01)."""

from __future__ import annotations

from tabular_to_parquet_spark.operators import graph


def test_pagerank_symmetric_pair_is_equal(spark):
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    out = {r["node"]: r["rank"] for r in graph.pagerank_fixed(edges, n_iter=3).collect()}
    # symmetric 2-cycle: both nodes keep the full scale (minus the
    # integer-division dust)
    assert out[1] == out[2]
    assert abs(out[1] - graph.PR_SCALE) < 10


def test_pagerank_sink_hub_ordering(spark):
    # star: 1..4 all point at 5; 5 points back at 1
    edges = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 5), (4, 5), (5, 1)], "src long, dst long"
    )
    out = {r["node"]: r["rank"] for r in graph.pagerank_fixed(edges, n_iter=5).collect()}
    assert out[5] > out[1] > out[2]  # hub > its only in-link source > leaves
    assert out[2] == out[3] == out[4]


def test_pagerank_one_plan_no_driver_loops(spark):
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    df = graph.pagerank_fixed(edges, n_iter=3)
    # the unrolled iterations are one lazily-planned DataFrame — no
    # collect happened during construction, and the plan contains the
    # three aggregation levels
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") >= 3


def test_copurchase_edges_symmetric_distinct(spark):
    li = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 2), (11, 3)], "l_orderkey long, l_partkey long"
    )
    out = {(r["src"], r["dst"]) for r in graph.copurchase_edges(li).collect()}
    assert out == {(1, 2), (2, 1)}


def test_triangle_count_manual_fixture(spark):
    from pyspark.sql import functions as F

    from tabular_to_parquet_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles) plus a pendant edge 4-5 (0 new)
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(4, 5)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    row = triangle_count(e).collect()[0]
    assert row["n_edges"] == 7
    assert row["n_triangles"] == 4
