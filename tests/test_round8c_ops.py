"""Round-8 fourth-wave operators: dedup-weighted corpus accounting
(d19) and the Zipf rank table (x38).

Exact large-scale values are oracle-gated; these tests pin the
semantics on hand-built inputs."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from tabular_to_parquet_spark.parity import extensions as _ext  # noqa: F401  (registers)
from tabular_to_parquet_spark.parity.catalog import CATALOG


def _write_docs(spark, rows):
    d = tempfile.mkdtemp(prefix="r8c_docs_")
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


def test_d19_discounts_exact_duplicates(spark):
    """Two identical long docs + one unique doc, same lang: the dup
    pair collapses to one representative (the min doc_id), so unique
    counts drop by exactly one copy's worth of docs and tokens."""
    long = " ".join(f"tok{i}" for i in range(40))
    other = " ".join(f"zzz{i}" for i in range(30))
    d = _write_docs(spark, [(1, long, "en"), (2, long, "en"), (3, other, "en")])
    row = CATALOG["d19_effective_data_size"].spark(spark, d).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["n_docs"], r["n_unique_docs"]) == (3, 2)
    assert r["n_tokens"] == 40 + 40 + 30
    assert r["n_unique_tokens"] == 40 + 30
    assert abs(r["unique_ratio"] - 70 / 110) < 1e-12


def test_d19_unique_never_exceeds_total(spark):
    out = CATALOG["d19_effective_data_size"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out
    for r in out:
        assert 0 < r["n_unique_docs"] <= r["n_docs"]
        assert 0 < r["n_unique_tokens"] <= r["n_tokens"]
        assert 0.0 < r["unique_ratio"] <= 1.0


def test_x38_zipf_table_hand_counts(spark):
    """'a a a b b c' -> ranks a/b/c with counts 3/2/1, cumulative
    3/5/6 over total 6; ties (none here) break lexically."""
    d = _write_docs(spark, [(1, "a a a b b c", "en")])
    rows = CATALOG["x38_zipf_rank_table"].spark(spark, d).collect()
    got = [(r["rank"], r["tok"], r["n"], r["cum_n"], r["total_n"]) for r in rows]
    assert got == [(1, "a", 3, 3, 6), (2, "b", 2, 5, 6), (3, "c", 1, 6, 6)]
    assert [round(r["coverage"], 10) for r in rows] == [
        round(3 / 6, 10),
        round(5 / 6, 10),
        round(6 / 6, 10),
    ]


def test_x38_tie_break_is_lexical(spark):
    d = _write_docs(spark, [(1, "b a b a", "en")])
    rows = CATALOG["x38_zipf_rank_table"].spark(spark, d).collect()
    assert [(r["rank"], r["tok"]) for r in rows] == [(1, "a"), (2, "b")]
