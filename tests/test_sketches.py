"""Count-min sketch (operators/sketches.py): estimate bounds, grid
size, broadcast probe plan, and the edit-distance blocked join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tabular_to_parquet_spark.operators import sketches as sk
from tabular_to_parquet_spark.operators.dedup import edit_distance_pairs


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "the cat sat on the mat"),
        (4, "a completely different document about spark"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_cms_estimate_upper_bounds_truth(spark, docs):
    counts = sk.token_counts(docs)
    sketch = sk.cms_build(counts)
    est = sk.cms_estimate(sketch, counts.select("token"))
    joined = {
        r["token"]: (r["n"], r["n_est"])
        for r in counts.join(est, "token").collect()
    }
    assert joined  # non-empty
    for tok, (n, n_est) in joined.items():
        assert n_est >= n, tok  # CMS never underestimates
    # 'the' appears 6 times across docs
    assert joined["the"][0] == 6


def test_cms_estimate_absent_probe_is_zero(spark, docs):
    """A probe token absent from the corpus hits empty cells, which a
    true CMS counts as 0 — the probe must survive (not be dropped by
    the grid join) with n_est = 0, never an inflated min."""
    sketch = sk.cms_build(sk.token_counts(docs))
    probes = spark.createDataFrame(
        [("zzz_not_in_corpus",), ("the",)], ["token"]
    )
    got = {r["token"]: r["n_est"] for r in sk.cms_estimate(sketch, probes).collect()}
    assert got["zzz_not_in_corpus"] == 0
    assert got["the"] >= 6  # present probes keep the upper-bound property


def test_cms_grid_is_bounded(spark, docs):
    sketch = sk.cms_build(sk.token_counts(docs), depth=2, width=16)
    rows = sketch.collect()
    assert len(rows) <= 2 * 16
    assert {r["j"] for r in rows} <= {0, 1}
    assert all(0 <= r["bucket"] < 16 for r in rows)
    # total mass per row j equals total token count
    per_row = {r["j"]: 0 for r in rows}
    for r in rows:
        per_row[r["j"]] += r["cnt"]
    n_tokens = sum(r["n"] for r in sk.token_counts(docs).collect())
    assert all(v == n_tokens for v in per_row.values())


def test_cms_probe_broadcasts_sketch(spark, docs):
    counts = sk.token_counts(docs)
    sketch = sk.cms_build(counts)
    est = sk.cms_estimate(sketch, counts.select("token"))
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_edit_distance_pairs_finds_near_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in edit_distance_pairs(docs).collect()
    }
    # docs 1 and 3 identical (dist 0); 1/2 differ by 6 edits (> max 2)
    assert pairs[(1, 3)] == 0
    assert (1, 2) not in pairs
    # the unrelated doc 4 never pairs (different length bucket or dist)
    assert not any(4 in p for p in pairs)


def test_edit_distance_join_is_equi_not_cross(spark, docs):
    pairs = edit_distance_pairs(docs)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_edit_distance_verifier_mode(spark, docs):
    cands = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
    out = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in edit_distance_pairs(docs, candidates=cands).collect()
    }
    assert out == {(1, 3): 0}  # (1,2) is 6 edits away, filtered


def test_hll_approx_distinct_within_rsd(spark):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        rel = abs(r["approx"] - r["exact"]) / max(r["exact"], 1)
        assert rel < 0.10, (r["event_type"], r["approx"], r["exact"])


def test_bigram_topk_plans_takeordered(spark):
    from tabular_to_parquet_spark.parity import extensions as _ext  # noqa: F401 (registers)
    from tabular_to_parquet_spark.parity.catalog import CATALOG

    df = CATALOG["x26_bigram_lm_counts"].spark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_stream_static_enrich_broadcasts_dim(spark):
    from tabular_to_parquet_spark.sources.tables import load_table
    from tabular_to_parquet_spark.streaming.streams import (
        stream_static_enrich_frame,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    dim = load_table(spark, "/root/testdata/sf0.001", "customer")
    plan = (
        stream_static_enrich_frame(ev, dim)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_context_target_matches_manual(spark):
    rows = [
        (1, 10, 1, "a"), (1, 20, 2, "b"), (1, 30, 3, "c"), (1, 40, 4, "d"),
        (2, 10, 5, "x"), (2, 20, 6, "y"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    from tabular_to_parquet_spark.operators.pipeline import context_target_pairs

    out = {
        (r["user_id"], r["event_id"]): (r["context"], r["target"])
        for r in context_target_pairs(ev, context_len=3).collect()
    }
    # only user 1's 4th event has a full 3-context
    assert out == {(1, 4): (["a", "b", "c"], "d")}


def test_cusum_matches_clamped_recursion(spark):
    """The prefix-minus-running-min identity must equal the direct
    S_i = max(0, S_{i-1} + (x_i - k)) recursion."""
    import datetime

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    xs = [10, -3, -9, 15, 2, -30, 8, 9]  # drifts around 0
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base + datetime.timedelta(minutes=i), i, float(x))
        for i, x in enumerate(xs)
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "d"])
    w = (
        W.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    p = F.sum(F.col("d").cast("long")).over(w)
    got = [
        r["cusum"]
        for r in ev.select(
            "event_id",
            (p - F.least(F.lit(0).cast("long"),
                         F.min(p).over(w))).alias("cusum"),
        ).orderBy("event_id").collect()
    ]
    s, want = 0, []
    for x in xs:
        s = max(0, s + x)
        want.append(s)
    assert got == want
