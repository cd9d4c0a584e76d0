"""Behavior + plan tests for lexical retrieval (operators/retrieval).

Exact values are oracle-gated (x17/x18); here: ranking sanity on a
hand-built corpus and the broadcast-probe plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from tabular_to_parquet_spark.operators import retrieval


def _corpus(spark):
    rows = [
        (1, "apple banana cherry"),
        (2, "apple apple apple"),
        (3, "dog cat mouse"),
        (4, "banana dog apple"),
        (5, "unrelated words entirely"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_self_retrieval_and_ranking(spark):
    docs = _corpus(spark)
    queries = spark.createDataFrame(
        [(100, "apple banana")], "query_id long, text string"
    )
    out = retrieval.bm25_topk(docs, queries, top_k=5).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # docs 1/2/4 contain query terms; 3 and 5 must not appear
    assert set(ranked) <= {1, 2, 4}
    assert len(ranked) == 3
    # doc 1 and 4 match both terms; tf-saturated doc 2 matches one
    assert ranked[-1] == 2
    assert all(r["score_micro"] > 0 for r in out)


def test_bm25_rank_is_dense_per_query(spark):
    docs = _corpus(spark)
    queries = spark.createDataFrame(
        [(1, "apple"), (2, "dog")], "query_id long, text string"
    )
    out = retrieval.bm25_topk(docs, queries, top_k=10).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)


def test_tfidf_prefers_rare_terms(spark):
    docs = _corpus(spark)
    out = retrieval.tfidf_top_terms(docs, top_t=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'cherry' is unique to doc 1 → beats the common 'apple'/'banana'
    assert top[1] == "cherry"
    # every doc gets exactly one top term
    assert sorted(top) == [1, 2, 3, 4, 5]


def test_bm25_probe_is_broadcast(spark):
    docs = _corpus(spark)
    queries = spark.createDataFrame([(1, "apple")], "query_id long, text string")
    plan = (
        retrieval.bm25_topk(docs, queries)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # query terms, df stats, and scalars all broadcast — the corpus tf
    # stream is probed, never shuffled on the term key
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
