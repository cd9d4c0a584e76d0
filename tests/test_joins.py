"""asof_join / range_join_binned edge-case tests (operators/joins.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tabular_to_parquet_spark.operators.joins import asof_join, range_join_binned


def test_asof_backward_match_and_ties(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 300), (4, 20, 50)],
        "id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        [(10, 100, "at"), (10, 200, "before"), (10, 301, "after"), (20, 60, "late")],
        "user_id long, ts long, tag string",
    )
    out = {r.id: r for r in asof_join(left, right, on="ts", by="user_id").collect()}
    assert out[1].matched.tag == "at"        # equal ts matches (<=)
    assert out[2].matched.tag == "before"    # latest prior wins
    assert out[3].matched.tag == "before"    # 301 is after 300 -> not visible
    assert out[4].matched is None            # no prior right row


def test_asof_preserves_left_rowcount(spark):
    left = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("user_id"), (F.col("id") * 3).alias("ts")
    )
    right = spark.range(10).select(
        (F.col("id") % 7).alias("user_id"), (F.col("id") * 11).alias("ts"),
        F.col("id").alias("rid"),
    )
    assert asof_join(left, right, on="ts", by="user_id").count() == 100


def test_range_join_binned_boundaries(spark):
    points = spark.createDataFrame([(1, 10), (2, 20), (3, 29), (4, 30)], "pid long, v long")
    ivals = spark.createDataFrame([(7, 10, 30)], "iid long, lo long, hi long")
    got = {r.pid for r in range_join_binned(points, ivals, "v", "lo", "hi", 8).collect()}
    assert got == {1, 2, 3}  # closed='left': lo <= v < hi
    got_b = {r.pid
             for r in range_join_binned(points, ivals, "v", "lo", "hi", 8,
                                        closed="both").collect()}
    assert got_b == {1, 2, 3, 4}


def test_range_join_binned_multi_bin_interval_no_dupes(spark):
    # interval spans many bins; each matching point must appear ONCE
    points = spark.createDataFrame([(i, i * 10) for i in range(20)], "pid long, v long")
    ivals = spark.createDataFrame([(1, 0, 150), (2, 140, 200)], "iid long, lo long, hi long")
    rows = range_join_binned(points, ivals, "v", "lo", "hi", 16).collect()
    pairs = [(r.pid, r.iid) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == {(i, 1) for i in range(15)} | {(i, 2) for i in range(14, 20)}


def test_range_join_rejects_bad_closed(spark):
    points = spark.createDataFrame([(1, 1)], "pid long, v long")
    with pytest.raises(ValueError, match="closed"):
        range_join_binned(points, points, "v", "v", "v", 10, closed="right")


def test_asof_rejects_colliding_matched_col(spark):
    left = spark.createDataFrame([(1, 10, "x")], "user_id long, ts long, matched string")
    right = spark.createDataFrame([(1, 5)], "user_id long, ts long")
    with pytest.raises(ValueError, match="matched_col"):
        asof_join(left, right, on="ts", by="user_id")
    # reserved internal prefix is rejected too
    left2 = spark.createDataFrame([(1, 10)], "user_id long, __on long")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left2.withColumnRenamed("__on", "__x").withColumn("ts", F.lit(1)),
                  right, on="ts", by="user_id")


def test_interval_overlap_join_exactness(spark):
    from tabular_to_parquet_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0, 100), (2, 500, 900), (3, 1000, 2500)],
        "a_id long, a_lo long, a_hi long",
    )
    right = spark.createDataFrame(
        [
            (10, 50, 60),     # inside interval 1
            (11, 100, 200),   # touches 1's end: NOT an overlap (half-open)
            (12, 450, 505),   # overlaps 2's start
            (13, 2400, 3000), # overlaps 3; both spans cross a bin edge
        ],
        "b_id long, b_lo long, b_hi long",
    )
    out = interval_overlap_join(
        left, right, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=1000
    )
    pairs = sorted((r["a_id"], r["b_id"]) for r in out.collect())
    assert pairs == [(1, 10), (2, 12), (3, 13)]
    # multi-bin intervals emit each pair exactly once, with no
    # dropDuplicates in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Deduplicate" not in plan


def test_join_strategy_hints_are_honored(spark):
    """The three join-strategy hints each produce their physical
    operator — the knobs a 100 TB plan tuner actually turns when
    Catalyst's size estimates mislead it."""
    from pyspark.sql import functions as F

    big = spark.range(50_000).select(F.col("id").alias("k"), F.col("id").alias("v"))
    small = spark.range(500).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    assert "BroadcastHashJoin" in plan_of(big.join(small.hint("broadcast"), "k"))
    assert "SortMergeJoin" in plan_of(big.join(small.hint("merge"), "k"))
    assert "ShuffledHashJoin" in plan_of(big.join(small.hint("shuffle_hash"), "k"))
