"""Round-15 optimization pins: s07's shared corpus frame is
bit-identical to the per-leg build, and the round's exchange-reuse
plan shapes are asserted, not just dumped (r14 verdict item 4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tabular_to_parquet_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(embeddings):
    return embeddings.filter(F.col("vec_id") % 100 == 0)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_knn_bruteforce_corpus_param_bit_identical(embeddings, queries):
    # the shared-corpus path must not change a single bit: same cosine
    # expression tree, the frame only adds one id-keyed exchange
    base = sim.knn_bruteforce(embeddings, queries, k=5)
    shared = sim.shared_corpus_frame(embeddings)
    via = sim.knn_bruteforce(embeddings, queries, k=5, corpus=shared)
    assert _rows(base) == _rows(via)


def test_knn_ivf_corpus_param_bit_identical(embeddings, queries):
    base = sim.knn_ivf(embeddings, queries, k=5)
    shared = sim.shared_corpus_frame(embeddings)
    via = sim.knn_ivf(embeddings, queries, k=5, corpus=shared)
    assert _rows(base) == _rows(via)


def test_s07_shared_corpus_exchange_reused_at_runtime(spark):
    # executed-plan pin for the r15 s07 restructure: ONE corpus-frame
    # exchange feeds both the exact and the ANN leg (ReusedExchange),
    # i.e. the corpus scan + norm fold run once — and the audit's
    # single-pass aggregate leaves no second brute-force subtree
    from tabular_to_parquet_spark.parity import extensions  # noqa: F401
    from tabular_to_parquet_spark.parity.catalog import CATALOG

    # a cached embeddings frame from another test substitutes
    # InMemoryTableScan for the parquet scans and hides the shape this
    # test pins — assert against the uncached plan
    spark.catalog.clearCache()
    df = CATALOG["s07_ann_recall_audit"].spark(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final
    # corpus scan exactly once in the final adaptive plan: every other
    # embeddings scan is a bounded query-side projection (vec_id % 50)
    corpus_scans = [
        line
        for line in final.splitlines()
        if "Scan parquet" in line and "% 50" not in line and "%50" not in line
    ]
    assert len(corpus_scans) == 1, corpus_scans
