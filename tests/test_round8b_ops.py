"""Round-8 second-wave operators: BFS hop distances
(operators/graph.bfs_hops), the shuffle-key skew audit and winsorized
stats (operators/profiling), and the a35 gap-fill shape.

Exact large-scale values are oracle-gated (g04, pr19, pr20, a35);
these tests pin the semantics on hand-built inputs plus the g04
oracle's hop-bound safety margin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tabular_to_parquet_spark.operators import graph
from tabular_to_parquet_spark.operators.profiling import (
    key_skew_audit,
    winsorized_stats,
)


def _sym(pairs):
    return [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]


def test_bfs_hops_path_graph(spark):
    # 1-2-3-4 path plus isolated 9-10 edge: from seed 1, hops are
    # 0/1/2/3 and the 9-10 component is unreachable
    edges = spark.createDataFrame(
        _sym([(1, 2), (2, 3), (3, 4), (9, 10)]), "src long, dst long"
    )
    out = {r["node"]: r["hop"] for r in graph.bfs_hops(edges, seed=1).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_hops_default_seed_is_min_src(spark):
    edges = spark.createDataFrame(_sym([(5, 7), (7, 9)]), "src long, dst long")
    out = {r["node"]: r["hop"] for r in graph.bfs_hops(edges).collect()}
    assert out == {5: 0, 7: 1, 9: 2}


def test_bfs_hops_truncates_at_max_hops(spark):
    edges = spark.createDataFrame(
        _sym([(1, 2), (2, 3), (3, 4)]), "src long, dst long"
    )
    out = {r["node"]: r["hop"] for r in graph.bfs_hops(edges, seed=1, max_hops=2).collect()}
    assert out == {1: 0, 2: 1, 3: 2}  # node 4 (hop 3) beyond the bound


def test_bfs_hops_takes_shortest_of_multiple_paths(spark):
    # 1-2-3-4 chain plus a 1-4 shortcut: hop(4) must be 1, not 3
    edges = spark.createDataFrame(
        _sym([(1, 2), (2, 3), (3, 4), (1, 4)]), "src long, dst long"
    )
    out = {r["node"]: r["hop"] for r in graph.bfs_hops(edges, seed=1).collect()}
    assert out[4] == 1 and out[3] == 2


def test_bfs_hops_empty_edges_raises(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError):
        graph.bfs_hops(edges)


def test_g04_oracle_hop_bound_has_margin():
    """The g04 oracle walks 12 hops; equality with the Spark side holds
    at ANY shared bound, but the result only reads as 'the shortest
    paths' if BFS CONVERGED inside it — pin that 11 and 12 hops give
    identical results at the certified scale (diameter margin >= 1)."""
    import duckdb

    from tabular_to_parquet_spark.parity.extensions import _bfs_oracle

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW lineitem AS "
        "SELECT * FROM '/root/testdata/sf0.01/lineitem.parquet'"
    )
    r11 = con.sql(_bfs_oracle(11) + " ORDER BY node").fetchall()
    r12 = con.sql(_bfs_oracle(12) + " ORDER BY node").fetchall()
    assert r11 == r12
    assert len(r12) > 0


def test_key_skew_audit_distribution_and_null_keys(spark):
    # key 1 x4, key 2 x1, key 3 x1, plus two NULL keys (excluded):
    # n_rows 6, n_keys 3, max 4, median 1.0, skew_num 4*3=12
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (1,), (2,), (3,), (None,), (None,)], "k long"
    )
    row = key_skew_audit([("t.k", df, F.col("k"))]).collect()[0]
    assert (row["n_rows"], row["n_keys"], row["max_cnt"]) == (6, 3, 4)
    assert row["median_cnt"] == 1.0
    assert row["skew_num"] == "12"


def test_key_skew_audit_empty_spec_rejected(spark):
    with pytest.raises(ValueError):
        key_skew_audit([])


def test_winsorized_stats_clamps_tails(spark):
    # 9 values 0..800 in one group: lo = p1/8 = 100, hi = p7/8 = 700;
    # one value clamps low, one high; sum8x/8 = 100+100..700+700
    df = spark.createDataFrame([("g", i * 100) for i in range(9)], "g string, v long")
    row = winsorized_stats(df, F.col("v"), "g").collect()[0]
    assert (row["n"], row["n_low"], row["n_high"]) == (9, 1, 1)
    assert (row["lo"], row["hi"]) == (100.0, 700.0)
    # clamped: 100,100,200,...,600,700,700 -> sum 3600, x8
    assert row["sum8x"] == 3600 * 8
    assert row["event_type" if "event_type" in row.asDict() else "g"] == "g"


def test_winsorized_stats_fractional_edges_exact(spark):
    # 4 values: p1/8 position = 3*0.125 = 0.375 -> 10 + .375*10 = 13.75
    # (k/8 dyadic); sum8x stays integer-exact
    df = spark.createDataFrame([("g", v) for v in (10, 20, 30, 40)], "g string, v long")
    row = winsorized_stats(df, F.col("v"), "g").collect()[0]
    assert row["lo"] == 13.75 and row["hi"] == 36.25
    # clamped: 13.75, 20, 30, 36.25 -> x8 = 110+160+240+290 = 800
    assert row["sum8x"] == 800


def test_winsorized_stats_rejects_non_dyadic_fraction(spark):
    df = spark.createDataFrame([("g", 1)], "g string, v long")
    with pytest.raises(ValueError):
        winsorized_stats(df, F.col("v"), "g", q=0.1)
    with pytest.raises(ValueError):
        winsorized_stats(df, F.col("v"), "g", q=0.6)


def test_scene_cut_flags_real_jump(spark):
    """Hand-built AVI with a genuine scene cut: three near-identical
    frames then a full black->white jump — only that transition is
    flagged."""
    import pandas as pd

    from tabular_to_parquet_spark.operators.codecs import encode_avi
    from tabular_to_parquet_spark.operators.multimodal import scene_cut_frames

    w, h = 4, 3
    quiet = bytes([10] * (w * h * 3))
    quiet2 = bytes([11] * (w * h * 3))
    white = bytes([255] * (w * h * 3))
    payload = encode_avi(w, h, [quiet, quiet2, quiet, white])
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [payload], "media_type": ["video/avi"]})
    )
    rows = {r["frame"]: r for r in scene_cut_frames(df).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["diff_sum"] == w * h * 3 and not rows[1]["is_cut"]
    assert rows[3]["diff_sum"] == (255 - 10) * w * h * 3 and rows[3]["is_cut"]


def test_scene_cut_single_frame_and_bad_payload(spark):
    import pandas as pd

    from tabular_to_parquet_spark.operators.codecs import encode_avi
    from tabular_to_parquet_spark.operators.multimodal import scene_cut_frames

    one = encode_avi(2, 2, [bytes([0] * 12)])
    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1, 2], "payload": [one, b"not an avi"],
             "media_type": ["video/avi"] * 2}
        )
    )
    assert scene_cut_frames(df).count() == 0


def test_weighted_median_crossing(spark):
    # values 1 (w=1), 2 (w=2), 10 (w=1): total 4, half 2 -> cumw at
    # v=2 is 3 >= 2, so weighted median 2 (plain median of values is 2
    # too, but the weight placement is what's under test: shift the
    # heavy weight to 10 and the median must follow)
    from tabular_to_parquet_spark.operators.profiling import weighted_median

    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 2), ("g", 10, 1)], "g string, v long, w long"
    )
    row = weighted_median(df, F.col("v"), F.col("w"), "g").collect()[0]
    assert (row["wmedian"], row["total_weight"]) == (2, 4)

    heavy = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 10, 6)], "g string, v long, w long"
    )
    row = weighted_median(heavy, F.col("v"), F.col("w"), "g").collect()[0]
    assert (row["wmedian"], row["total_weight"]) == (10, 8)


def test_weighted_median_exact_half_takes_lower(spark):
    # cumw at v=5 is exactly half (2*2 >= 4): lower weighted median
    from tabular_to_parquet_spark.operators.profiling import weighted_median

    df = spark.createDataFrame(
        [("g", 5, 2), ("g", 9, 2)], "g string, v long, w long"
    )
    row = weighted_median(df, F.col("v"), F.col("w"), "g").collect()[0]
    assert row["wmedian"] == 5


def test_ev12_tie_rule_counts_touching_sessions_as_overlap(spark, tmp_path):
    """Two sessions touching at one instant (A ends exactly when B
    starts): the (ts, delta DESC) tie rule processes the start first,
    so concurrency peaks at 2 — touching counts as overlap."""
    import datetime as dt

    import pandas as pd

    from tabular_to_parquet_spark.parity.catalog import CATALOG

    t0 = dt.datetime(2024, 1, 1)
    hour = dt.timedelta(hours=1)
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": [t0, t0 + hour, t0 + hour, t0 + 2 * hour],
            "user_id": [1, 1, 2, 2],
            "event_type": ["a"] * 4,
            "value": [1.0] * 4,
            "props": [""] * 4,
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    rows = (
        CATALOG["ev12_session_concurrency"]
        .spark(spark, str(tmp_path))
        .orderBy("ts_us", F.col("delta").desc(), "concurrency")
        .collect()
    )
    assert [r["concurrency"] for r in rows] == [1, 2, 1, 0]
    assert [r["delta"] for r in rows] == [1, 1, -1, -1]


def test_with_running_max_matches_global_window(spark):
    """Block-decomposed running max == the global-window form, at every
    block granularity (correctness must not depend on block choice)."""
    from pyspark.sql import Window as W

    from tabular_to_parquet_spark.operators.ordering import with_running_max

    rows = [(i, v) for i, v in enumerate([5, 3, 9, 1, 9, 2, 12, 0, 7, 11])]
    df = spark.createDataFrame(rows, "i long, v long")
    expect = [
        (r["i"], r["rm"])
        for r in df.select(
            "i",
            F.max("v")
            .over(W.orderBy("i").rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("rm"),
        ).collect()
    ]
    for width in (1, 3, 100):
        got = [
            (r["i"], r["run_max"])
            for r in with_running_max(
                df, "i", "v", (F.col("i") / F.lit(width)).cast("long")
            )
            .orderBy("i")
            .collect()
        ]
        assert sorted(got) == sorted(expect), f"block width {width}"


def test_g05_excludes_existing_edges_and_scores_jaccard(spark):
    """Square 1-2-3-4-1: the two diagonals are the only missing edges,
    each with 2 common neighbors and degree-2 endpoints -> jaccard 1.0.
    No existing edge may appear as a candidate."""
    from tabular_to_parquet_spark.parity.catalog import CATALOG  # noqa: F401
    from tabular_to_parquet_spark.operators import graph as g

    edges = spark.createDataFrame(
        _sym([(1, 2), (2, 3), (3, 4), (1, 4)]), "src long, dst long"
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    e2 = edges.select(F.col("src").alias("c"), F.col("dst").alias("b"))
    common = (
        e1.join(e2, "c")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= 2)
    )
    cand = common.join(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    ).collect()
    got = {(r["a"], r["b"]): r["common"] for r in cand}
    assert got == {(1, 3): 2, (2, 4): 2}


def test_knn_graph_structure_on_testdata(spark):
    """Every source vector gets dense ranks 1..k, never itself, and
    the per-source cosine sequence is non-increasing."""
    from tabular_to_parquet_spark.operators.similarity import knn_graph
    from tabular_to_parquet_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = knn_graph(emb, k=3).collect()
    by_src = {}
    for r in rows:
        assert r["src_id"] != r["neighbor_id"]
        by_src.setdefault(r["src_id"], []).append((r["rank"], r["cosine"]))
    assert by_src
    for src, rr in by_src.items():
        rr.sort()
        assert [x[0] for x in rr] == list(range(1, len(rr) + 1))
        cosines = [x[1] for x in rr]
        assert cosines == sorted(cosines, reverse=True)


def test_pl31_ladder_edges(spark):
    """Bucket ladder boundaries: exactly 16 tokens -> bucket 16,
    17 -> 32, 600 -> overflow 1024; waste is bucket - ntok."""
    from tabular_to_parquet_spark.parity.catalog import CATALOG
    import pandas as pd

    for n, bucket in ((16, 16), (17, 32), (600, 1024)):
        pdf = pd.DataFrame(
            {
                "doc_id": [1],
                "text": ["w " * n],
                "lang": ["en"],
                "source": ["s"],
                "n_chars": [2 * n],
            }
        )
        import tempfile, os

        d = tempfile.mkdtemp(prefix="pl31_")
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        row = CATALOG["pl31_length_buckets"].spark(spark, d).collect()[0]
        assert (row["bucket_len"], row["padding_waste"]) == (bucket, bucket - n)
