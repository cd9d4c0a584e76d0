"""Round-8 fourth-wave operators: cross-split leakage (pl32), the
quality-filter funnel (pl33), seasonal anomaly (pr22), degree
assortativity (g06), sentence stats (x39), and the in-engine ANN
recall audit (s07).

Exact large-scale values are oracle-gated; these tests pin the
semantics on hand-built inputs."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pandas as pd
import pyspark.sql.functions as F

from tabular_to_parquet_spark.parity import extensions as _ext  # noqa: F401  (registers)
from tabular_to_parquet_spark.parity.catalog import CATALOG


def _write_docs(spark, rows):
    d = tempfile.mkdtemp(prefix="r8d_docs_")
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": ["s" for _ in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


# ---------------------------------------------------------------------------
# pl32 — cross-split leakage


def test_pl32_identical_docs_leak_across_splits(spark):
    """30 ids sharing ONE text: every pair is a certain near-dup
    (est_jaccard 1.0), so each val doc must report exactly the train
    docs as leaks, with min_train_doc_id the smallest train id. The
    split itself is the deterministic hash_split the query uses; the
    test pins the leak JOIN/agg semantics on top of it."""
    from tabular_to_parquet_spark.operators import pipeline as pl
    from tabular_to_parquet_spark.parity.extensions import _LEAK_WEIGHTS

    text = " ".join(f"tok{i}" for i in range(40))
    ids = list(range(1, 31))
    d = _write_docs(spark, [(i, text, "en") for i in ids])

    split_rows = (
        pl.hash_split(
            spark.createDataFrame(pd.DataFrame({"doc_id": ids})),
            "doc_id",
            _LEAK_WEIGHTS,
        )
        .collect()
    )
    by_split: dict[str, set] = {}
    for r in split_rows:
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    train, val = by_split.get("train", set()), by_split.get("val", set())
    assert train and val, "fixture must hash into both splits"

    out = {
        r["val_doc_id"]: r
        for r in CATALOG["pl32_cross_split_leakage"].spark(spark, d).collect()
    }
    assert set(out) == val
    for vid, r in out.items():
        assert r["n_train_dups"] == len(train)
        assert r["min_train_doc_id"] == min(train)
        assert abs(r["max_est_jaccard"] - 1.0) < 1e-12


def test_pl32_unique_docs_produce_no_leak(spark):
    """Docs with disjoint vocabularies share no shingles: no candidate
    pairs, no leak rows — regardless of how the split lands."""
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(30)), "en") for i in range(1, 21)
    ]
    d = _write_docs(spark, rows)
    assert CATALOG["pl32_cross_split_leakage"].spark(spark, d).count() == 0


# ---------------------------------------------------------------------------
# pl33 — quality-filter funnel


def test_pl33_funnel_hand_counts(spark):
    """Six docs, one failure per stage: 5-token doc fails length,
    'de' doc fails lang, 2-char-token doc fails mean token length,
    and one of an identical pair fails the near-dup rep stage."""
    tok5 = lambda p, n: " ".join(f"{p}{j:03d}x"[:5].ljust(5, "q") for j in range(n))  # noqa: E731
    dup = " ".join(f"dup{j:02d}" for j in range(30))  # 30 tokens, len 5
    rows = [
        (1, " ".join(f"aa{j:03d}" for j in range(30)), "en"),  # passes all
        (2, "one two three four five5", "en"),  # 5 tokens -> fails length
        (3, " ".join(f"bb{j:03d}" for j in range(30)), "de"),  # fails lang
        (4, " ".join(["zz"] * 30), "en"),  # mean len 2 -> fails tok_len
        (5, dup, "en"),  # rep of the pair
        (6, dup, "es"),  # duplicate -> fails near_dup
    ]
    d = _write_docs(spark, rows)
    got = {
        r["stage_name"]: (r["stage"], r["n_docs"], r["n_tokens"])
        for r in CATALOG["pl33_filter_funnel"].spark(spark, d).collect()
    }
    total = 30 + 5 + 30 + 30 + 30 + 30
    assert got["raw"] == (0, 6, total)
    assert got["length"] == (1, 5, total - 5)
    assert got["lang"] == (2, 4, total - 5 - 30)
    assert got["tok_len"] == (3, 3, total - 5 - 30 - 30)
    assert got["near_dup"] == (4, 2, 60)


def test_pl33_funnel_is_monotone_on_testdata(spark):
    rows = sorted(
        CATALOG["pl33_filter_funnel"].spark(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["stage"],
    )
    assert [r["stage_name"] for r in rows] == [
        "raw", "length", "lang", "tok_len", "near_dup",
    ]
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs"] <= a["n_docs"]
        assert b["n_tokens"] <= a["n_tokens"]


# ---------------------------------------------------------------------------
# pr22 — seasonal anomaly


def _write_events(spark, d, ts_counts):
    rows = []
    eid = 0
    for ts, n in ts_counts:
        for _ in range(n):
            eid += 1
            rows.append((eid, ts))
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [1] * len(rows),
            "event_type": ["a"] * len(rows),
            "value": [1.0] * len(rows),
            "props": [""] * len(rows),
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )


def test_pr22_spike_flagged_against_own_weekday(spark):
    """21 days of 1 event/day except one day with 5: that day's weekday
    has counts (1, 1, 5) -> low median 1, and 5 > 2*1 flags it; every
    other day stays unflagged. The spike is invisible to a global
    z-score at this size but obvious against its own weekday."""
    d = tempfile.mkdtemp(prefix="r8d_ev_")
    t0 = dt.datetime(2024, 1, 1)
    spike_day = 10
    ts_counts = [
        (t0 + dt.timedelta(days=i, hours=3), 5 if i == spike_day else 1)
        for i in range(21)
    ]
    _write_events(spark, d, ts_counts)
    rows = CATALOG["pr22_seasonal_anomaly"].spark(spark, d).collect()
    assert len(rows) == 21
    spike_epoch = int((t0 + dt.timedelta(days=spike_day)).timestamp() // 86400)
    for r in rows:
        if r["epoch_day"] == spike_epoch:
            assert (r["n_events"], r["dow_median"], r["anomaly"]) == (5, 1, 1)
        else:
            assert r["anomaly"] == 0
            assert r["dow_median"] == 1


def test_pr22_median_is_low_median(spark):
    """Even count of days per weekday uses position (n+1) div 2 — the
    LOWER middle: counts (1, 3) -> median 1, so 3 > 2 is an anomaly."""
    d = tempfile.mkdtemp(prefix="r8d_ev2_")
    t0 = dt.datetime(2024, 3, 4)
    _write_events(
        spark,
        d,
        [(t0 + dt.timedelta(hours=1), 1), (t0 + dt.timedelta(days=7, hours=1), 3)],
    )
    rows = sorted(
        CATALOG["pr22_seasonal_anomaly"].spark(spark, d).collect(),
        key=lambda r: r["epoch_day"],
    )
    assert [(r["n_events"], r["dow_median"], r["anomaly"]) for r in rows] == [
        (1, 1, 0),
        (3, 1, 1),
    ]


# ---------------------------------------------------------------------------
# g06 — degree assortativity sufficient statistics


def test_g06_hand_graph(spark, tmp_path):
    """Orders {1,2},{1,2},{1,3},{1,3}: edges 1-2 and 1-3 (support 2
    each), degrees 1:2, 2:1, 3:1. Over the 4 directed edges:
    sum_deg = 2+1+2+1 = 6, sum_deg_sq = 4+1+4+1 = 10,
    sum_deg_prod = 2+2+2+2 = 8."""
    pdf = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 2, 3, 3, 4, 4],
            "l_partkey": [1, 2, 1, 2, 1, 3, 1, 3],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    r = CATALOG["g06_degree_assortativity"].spark(spark, str(tmp_path)).collect()[0]
    assert (r["n_edges"], r["sum_deg"]) == (4, 6)
    assert (r["sum_deg_sq"], r["sum_deg_prod"]) == ("10", "8")


def test_g06_symmetry_invariants(spark):
    """On real data: the edge list is symmetric, so n_edges is even and
    sum_deg equals the sum of squared vertex degrees (each src appears
    deg(src) times)."""
    from tabular_to_parquet_spark.operators import graph as g
    from tabular_to_parquet_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    r = CATALOG["g06_degree_assortativity"].spark(spark, sf).collect()[0]
    assert r["n_edges"] % 2 == 0
    deg = (
        g.copurchase_edges_threshold(load_table(spark, sf, "lineitem"), min_orders=2)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .agg(F.sum(F.col("deg") * F.col("deg")).alias("s"))
        .collect()[0]["s"]
    )
    assert r["sum_deg"] == deg


# ---------------------------------------------------------------------------
# x39 — sentence stats


def test_x39_hand_counts(spark):
    d = _write_docs(
        spark,
        [
            (1, "Hello world. Bye!", "en"),
            (2, "no punct here", "en"),
            (3, "", "en"),
            (4, "What?! Really... yes. ", "en"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_sentences"], r["sum_sentence_chars"], r["max_sentence_chars"])
        for r in CATALOG["x39_sentence_stats"].spark(spark, d).collect()
    }
    assert got[1] == (2, 14, 11)  # "Hello world" (11) + "Bye" (3)
    assert got[2] == (1, 13, 13)  # unterminated text is one sentence
    assert got[3] == (0, 0, 0)
    assert got[4] == (3, 13, 6)  # "What" (4), "Really" (6), "yes" (3)


# ---------------------------------------------------------------------------
# s07 — ANN recall audit


def test_s07_recall_bounds_and_ratio(spark):
    rows = CATALOG["s07_ann_recall_audit"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["n_true"] == 5
        assert 0 <= r["n_hits"] <= r["n_true"]
        assert abs(r["recall"] - r["n_hits"] / r["n_true"]) < 1e-12
