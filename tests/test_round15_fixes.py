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


def test_oracle_rewrite_requeues_query_at_sweep_head():
    # r14 verdict item 3: d23/d25's oracles were rewritten window-free
    # in r14; their pre-rewrite green rows (r12/r13) must not count as
    # passes, so both re-queue at the sweep head until a driver row
    # lands on the new oracle SQL
    import __spark_entry__ as entry_mod

    assert entry_mod._ORACLE_REWRITTEN_AT == {
        "d23_dup_char_fraction": 14,
        "d25_self_repeat_fraction": 14,
    }
    # no post-rewrite driver row exists yet -> treated as never-passed
    assert "d23_dup_char_fraction" not in entry_mod._LAST_PASS
    assert "d25_self_repeat_fraction" not in entry_mod._LAST_PASS
    ordered = [n for n, _ in entry_mod._catalog_ordered()]
    assert ordered.index("d23_dup_char_fraction") < 50
    assert ordered.index("d25_self_repeat_fraction") < 50
    # once a round >= 14 row lands, the requeue self-retires: the rule
    # compares the row's round against the rewrite round, nothing else


def test_bench_stamps_effective_cpus_and_runs_scale_probe():
    # r14 verdict item 2: the payload must stamp the core count
    # get_spark actually used (SPARK_GRAFT_CPUS), not os.cpu_count() —
    # the driver's 8-core run printing "cpus": 32 is what voided its
    # scaling comparison — and the scaling probe entry must run and be
    # force-included in the stdout summary at any rank
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_CPUS="4",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"),
         "--only", "^(dedup_exact|scaleprobe_minhash_sig_32x)$"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["cpus"] == 4
    assert payload["cpus_host"] == os.cpu_count()
    assert payload["queries"]["scaleprobe_minhash_sig_32x"] > 0
    assert payload["queries"]["dedup_exact"] > 0


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
