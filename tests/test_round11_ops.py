"""Hand-computed semantics for the round-11 operators:
substring_duplicate_spans (seed k-grams + gaps-and-islands exact LCS,
df-capped seeds) and gd_linear_regressor (exact fixed-point batch
gradient descent vs an integer numpy twin)."""

from __future__ import annotations

import numpy as np
import pytest

from tabular_to_parquet_spark.operators.dedup import substring_duplicate_spans
from tabular_to_parquet_spark.operators.pipeline import (
    GD_LR_SHIFT,
    GD_RESID_SHIFT,
    GD_W_SCALE,
    gd_linear_regressor,
)

# ---------------------------------------------------------------------------
# substring_duplicate_spans


def _spans(spark, docs, k=8, max_df=6):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = substring_duplicate_spans(df, k=k, max_df=max_df)
    return {
        (r["doc_a"], r["doc_b"]): (r["lcs_len"], r["n_seed_hits"])
        for r in out.collect()
    }


def test_substring_basic_span(spark):
    # one shared 20-char run inside doc-unique filler (single repeated
    # chars, all distinct across docs AND from the run, so boundary
    # chars can't extend the true span) -> lcs exactly 20
    s = "ABCDEFGHIJKLMNOPQRST"
    got = _spans(
        spark,
        [(1, "q" * 30 + s + "r" * 30), (2, "u" * 10 + s + "v" * 50)],
        k=8,
    )
    assert got == {(1, 2): (20, 13)}  # 20-8+1 = 13 seed windows


def test_substring_exact_k_window(spark):
    # share exactly k chars -> lcs == k, one seed hit
    s = "WXYZ0123"
    got = _spans(spark, [(1, "e" * 20 + s), (2, s + "f" * 20)], k=8)
    assert got == {(1, 2): (8, 1)}


def test_substring_below_k_invisible(spark):
    # a 7-char shared run can never seed a k=8 window
    s = "QRSTUVW"
    got = _spans(
        spark,
        [(1, "e" * 20 + s + "f" * 8), (2, "g" * 20 + s + "h" * 8)],
        k=8,
    )
    assert got == {}


def test_substring_two_islands_max_wins(spark):
    # two disjoint shared runs (10 and 16 chars) -> lcs is the longer;
    # hits count BOTH islands' windows (3 + 9)
    s1, s2 = "abcdefghij", "KLMNOPQRSTUVWXYZ"
    got = _spans(
        spark,
        [(1, s1 + "w" * 20 + s2), (2, s2 + "y" * 20 + s1)],
        k=8,
    )
    assert got == {(1, 2): (16, 12)}


def test_substring_df_cap_drops_ubiquitous(spark):
    # the shared run appears in 7 docs; with max_df=6 every window in
    # it is capped away -> no pairs at all.  Pre/post filler chars are
    # distinct per doc so no other k-gram is shared.
    s = "0123456789*#$%=+"
    docs = [
        (i, chr(97 + i) * 12 + s + chr(110 + i) * 12) for i in range(7)
    ]
    assert _spans(spark, docs, k=8, max_df=6) == {}
    # raising the cap to 7 admits them: 21 pairs
    got = _spans(spark, docs, k=8, max_df=7)
    assert len(got) == 21 and all(v[0] == 16 for v in got.values())


def test_substring_repeat_within_doc(spark):
    # the run occurs twice in doc_b at different offsets -> two
    # alignment islands, lcs still the run length, hits doubled
    s = "ZYXWVUTSRQ"  # 10 chars, k=8 -> 3 windows per occurrence
    got = _spans(
        spark,
        [(1, "k" * 15 + s), (2, s + "m" * 15 + s)],
        k=8,
    )
    assert got == {(1, 2): (10, 6)}


def test_substring_short_docs_skipped(spark):
    got = _spans(spark, [(1, "tiny"), (2, "tiny")], k=8)
    assert got == {}


# ---------------------------------------------------------------------------
# gd_linear_regressor


def _np_gd(X: np.ndarray, y: np.ndarray, rounds: int):
    n = len(X)
    S, R, L = GD_W_SCALE, GD_RESID_SHIFT, GD_LR_SHIFT
    W = np.zeros(X.shape[1], dtype=np.int64)
    rows = []
    for t in range(1, rounds + 1):
        resid = X @ W - (y << S)
        rs = np.floor_divide(resid, 1 << R)
        grad = X.T @ rs
        loss = int(np.floor_divide(np.abs(resid), 1 << S).sum())
        W = W - np.floor_divide(np.floor_divide(grad, n), 1 << L)
        rows.append((t, *W.tolist(), loss))
    return rows


def _spark_gd(spark, X, y, rounds):
    cols = [f"x{j}" for j in range(X.shape[1])]
    data = [tuple(int(v) for v in row) + (int(lbl),) for row, lbl in zip(X, y)]
    df = spark.createDataFrame(
        data, ", ".join(f"{c} long" for c in cols) + ", y long"
    )
    out = gd_linear_regressor(df, cols, rounds=rounds)
    return [
        (r["round"], *[r[f"w{j}"] for j in range(X.shape[1])],
         r["sum_abs_resid_scaled"])
        for r in sorted(out.collect(), key=lambda r: r["round"])
    ]


def test_gd_matches_integer_twin(spark):
    rng = np.random.default_rng(7)
    X = np.column_stack(
        [
            np.ones(40, dtype=np.int64),
            rng.integers(50, 600, 40),
            rng.integers(0, 2, 40),
            rng.integers(5, 120, 40),
        ]
    ).astype(np.int64)
    y = 3 * X[:, 1] - 2 * X[:, 3] + 17 * X[:, 2] + rng.integers(0, 10, 40)
    want = _np_gd(X, y, rounds=3)
    got = _spark_gd(spark, X, y, rounds=3)
    assert got == want


def test_gd_loss_decreases_on_linear_label(spark):
    rng = np.random.default_rng(11)
    X = np.column_stack(
        [np.ones(60, dtype=np.int64), rng.integers(10, 400, 60)]
    ).astype(np.int64)
    y = 2 * X[:, 1] + 5
    got = _spark_gd(spark, X, y, rounds=4)
    losses = [r[-1] for r in got]
    assert losses[0] > losses[-1]
    assert losses == [r[-1] for r in _np_gd(X, y, 4)]


def test_gd_negative_labels_floor_division(spark):
    # negative residuals exercise the pmod floor (vs truncation) path
    X = np.array([[1, 3], [1, 5], [1, 9]], dtype=np.int64)
    y = np.array([-7, -11, -23], dtype=np.int64)
    assert _spark_gd(spark, X, y, 3) == _np_gd(X, y, 3)


def test_gd_all_zero_label(spark):
    X = np.array([[1, 2], [1, 4]], dtype=np.int64)
    y = np.zeros(2, dtype=np.int64)
    got = _spark_gd(spark, X, y, 2)
    assert got == _np_gd(X, y, 2)
    assert all(r[-1] == 0 for r in got)  # already converged
