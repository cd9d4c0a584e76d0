"""Salting operators (operators/skew.py): equality with unsalted plans
and actual key-spreading in the heavy stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from tabular_to_parquet_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_matches_plain_groupby(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 3).cast("string").alias("k"), (F.col("id") % 97).alias("v")
    )
    got = {
        r.k: (r.n_rows, r.v_sum)
        for r in salted_agg(df, ["k"], {"v_sum": F.col("v")}, buckets=8).collect()
    }
    want = {
        r.k: (r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want


def test_salted_agg_spreads_hot_key(spark):
    # one single hot key: the partial stage must produce many groups
    df = spark.range(5_000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    staged = df.select(
        "k",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(16)).alias("_salt"),
    )
    n_partials = staged.groupBy("k", "_salt").count().count()
    assert n_partials > 8  # hot key spread over most salt buckets


def test_salted_join_matches_plain_join(spark):
    fact = spark.range(2_000).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("k")
    )
    dim = spark.createDataFrame(
        [("0", 10), ("1", 20), ("2", 30)], "k string, w long"
    )
    got = sorted(
        (r.id, r.k, r.w) for r in salted_join(fact, dim, on="k", buckets=8).collect()
    )
    want = sorted((r.id, r.k, r.w) for r in fact.join(dim, "k").select("id", "k", "w").collect())
    assert got == want  # inner-join semantics incl. dropped key "3"


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's skew-join handling (enabled in session.py) must actually
    fire: a join with one dominant key, thresholds lowered to toy
    scale, ends with `skew=true` on the SortMergeJoin in the final
    adaptive plan — the runtime re-plan that replaces manual salting
    at 100 TB."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(200_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(1))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(2_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.join(right, "k")
        # an action on THIS DataFrame finalizes its adaptive plan (a
        # noop write runs a separate QueryExecution, whose final plan
        # this handle would not see)
        assert len(joined.collect()) == 198_020
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
