"""d21 banding calibration semantics: planted-corpus construction
(prefix-keep + salted tail), grade recovery from the variant id, and
the confusion-table invariants."""

from __future__ import annotations

import pyspark.sql.functions as F

from tabular_to_parquet_spark.operators import dedup


def _mk_docs(spark, n_docs=8, n_tok=40):
    rows = [
        (i * 7, " ".join(f"w{i}t{j}" for j in range(n_tok)))
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_variant_text_keeps_prefix_and_salts_tail(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(f"t{j}" for j in range(20)))], "doc_id long, text string"
    )
    corpus = dedup.planted_neardup_corpus(docs, grades=(50,), sample_mod=7)
    rows = {r["doc_id"]: r["text"] for r in corpus.collect()}
    assert set(rows) == {0, -50}  # base + one variant (-(0*1000+50))
    toks = rows[-50].split(" ")
    assert len(toks) == 20
    # ceil(20*50/100) = 10 kept, 10 salted
    assert toks[:10] == [f"t{j}" for j in range(10)]
    assert toks[10:] == [f"zz0x50x{i}" for i in range(11, 21)]


def test_planted_short_docs_are_excluded(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (7, " ".join(f"t{j}" for j in range(25)))],
        "doc_id long, text string",
    )
    corpus = dedup.planted_neardup_corpus(docs, grades=(30, 90), sample_mod=7)
    ids = sorted(r["doc_id"] for r in corpus.collect())
    # doc 0 has only 3 tokens -> excluded entirely; doc 7 -> base + 2 variants
    assert ids == [-(7 * 1000 + 90), -(7 * 1000 + 30), 7]


def test_grade_recovery_from_variant_id():
    for base, g in [(0, 30), (42, 95), (123456, 50)]:
        vid = -(base * 1000 + g)
        assert (-vid) // 1000 == base and (-vid) % 1000 == g


def test_calibration_confusion_invariants(spark):
    out = dedup.banding_calibration(_mk_docs(spark, n_docs=10), sample_mod=7)
    rows = {r["grade"]: r for r in out.collect()}
    assert set(rows) == set(dedup.CALIBRATION_GRADES)
    for g, r in rows.items():
        assert r["n_planted"] == 10
        assert 0 <= r["n_est_ge_05"] <= r["n_candidates"] <= r["n_planted"]
        assert 0 < r["sum_inter"] <= r["sum_union"]
        assert 0.0 < r["min_true_jaccard"] <= r["max_true_jaccard"] <= 1.0
    # true Jaccard mass is monotone in the grade (more prefix kept ->
    # more shared shingles) and the banding recall must be ~1 at the
    # top grade while the bottom grade sits below it on any non-trivial
    # corpus (S-curve midpoint for 4x4 banding is j ~ 0.57)
    grades = sorted(rows)
    mass = [rows[g]["sum_inter"] / rows[g]["sum_union"] for g in grades]
    assert mass == sorted(mass)
    # 40-token docs at grade 95 sit at true Jaccard ~0.83 -> S-curve
    # ~0.92, so demand high-but-not-perfect recall at the top grade
    assert rows[95]["n_candidates"] >= 8
    assert rows[30]["n_candidates"] <= rows[95]["n_candidates"]


def test_calibration_recall_tracks_s_curve(spark):
    """With many planted pairs, measured recall per grade should agree
    with the 1-(1-j^4)^4 S-curve evaluated at the grade's mean true
    Jaccard to within a generous tolerance (it's a random variable —
    the salted shingles make signatures effectively random)."""
    out = dedup.banding_calibration(_mk_docs(spark, n_docs=40), sample_mod=7)
    for r in out.collect():
        j = r["sum_inter"] / r["sum_union"]
        expected = 1.0 - (1.0 - j**4) ** 4
        recall = r["n_candidates"] / r["n_planted"]
        assert abs(recall - expected) < 0.35
