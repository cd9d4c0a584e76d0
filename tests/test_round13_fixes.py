"""Round-13 fixes: the GD per-round overflow sentinel (r12 ADVICE
medium — the pre-flight guard bounds only round 1; divergent
trajectories breach 2^53 later where the fdiv double division is
silently inexact), plus its freeze-on-poison carry semantics."""

from __future__ import annotations

import pytest

from tabular_to_parquet_spark.operators.pipeline import (
    GD_LR_SHIFT,
    GD_RESID_SHIFT,
    GD_W_SCALE,
    gd_linear_regressor,
)
from tabular_to_parquet_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-round13")


def _ref_gd_with_breach(rows, rounds):
    """Exact-python GD twin that also reports the first round whose
    actual max|resid| reaches 2^53 or any |grad_j| reaches 2^53 - n
    (the fdiv exactness envelope).  Mirrors tools/gd_fuzz.py's
    reference with arbitrary-precision ints — no numpy wrap."""
    n = len(rows)
    m = len(rows[0]) - 1
    W = [0] * m
    out, breach = [], None
    for t in range(1, rounds + 1):
        rs, mr, loss = [], 0, 0
        for r in rows:
            resid = sum(W[j] * r[j] for j in range(m)) - (
                r[m] << GD_W_SCALE
            )
            mr = max(mr, abs(resid))
            rs.append(resid // (1 << GD_RESID_SHIFT))  # python // = floor
            loss += abs(resid) // (1 << GD_W_SCALE)
        grads = [
            sum(r[j] * rs[i] for i, r in enumerate(rows)) for j in range(m)
        ]
        if breach is None and (
            # grad bound 2^53 - n mirrors the r14-tightened sentinel:
            # the /n fdiv numerator can exceed |grad| by up to n - 1
            mr >= (1 << 53)
            or any(abs(g) >= (1 << 53) - n for g in grads)
        ):
            breach = t
        if breach is None:
            W = [
                W[j] - ((grads[j] // n) // (1 << GD_LR_SHIFT))
                for j in range(m)
            ]
            out.append((t, *W, loss))
        else:
            out.append((t, *([None] * m), None))
    return out, breach


def test_gd_sentinel_poisons_divergent_trajectory(spark):
    # x=1024 makes the residual multiply by (1 - x^2/2^17) = -7 each
    # round; y=1.8e9 starts it at ~1.9e15, so round 1 passes the
    # pre-flight guard (bound 1.89e15 < 2^53/4 = 2.25e15) and round 2
    # breaches 2^53 while staying under 2^63 (the poisoned plan
    # executes without an ANSI raise).  rounds stays at 4: the nested
    # static plan's analysis cost grows steeply with rounds (the
    # gd_fuzz cap rationale).
    rows = [(1024, 1_800_000_000)]
    rounds = 4
    expected, breach = _ref_gd_with_breach(rows, rounds)
    assert breach is not None and 2 <= breach <= rounds, (
        "fixture must breach after round 1; got " + str(breach)
    )
    df = spark.createDataFrame(rows, "x0 long, y long")
    got = [
        (r["round"], r["w0"], r["sum_abs_resid_scaled"])
        for r in gd_linear_regressor(df, ["x0"], rounds=rounds)
        .orderBy("round")
        .collect()
    ]
    assert got == expected
    # explicit shape: exact pre-breach, all-NULL from the breach on
    assert all(g[1] is not None for g in got[: breach - 1])
    assert all(g[1] is None and g[2] is None for g in got[breach - 1:])


def test_gd_sentinel_quiet_on_convergent_trajectory(spark):
    # the documented envelope: no poison, values exact vs python ref
    rows = [(3, -1, 7), (5, 2, 11), (-4, 1, -9), (2, 2, 4)]
    expected, breach = _ref_gd_with_breach(rows, 6)
    assert breach is None
    df = spark.createDataFrame(rows, "x0 long, x1 long, y long")
    got = [
        (r["round"], r["w0"], r["w1"], r["sum_abs_resid_scaled"])
        for r in gd_linear_regressor(df, ["x0", "x1"], rounds=6)
        .orderBy("round")
        .collect()
    ]
    assert got == expected


def test_self_repeat_fraction_planted(spark):
    # d25: a doc with one planted self-repeated span, one clean doc,
    # one degenerate run above the occurrence cap (scores 0), one
    # sub-k-period tandem repeat (overlapping island copies)
    from tabular_to_parquet_spark.operators.dedup import (
        self_repeated_char_fraction,
    )

    k = 6
    span = "xqzwvu"  # unique 6-gram span, repeated in doc 0
    d0 = "abcdef" + span + "ghijkl" + span + "mnopqr"
    d1 = "abcdefghijklmnopqrstuvwx"  # clean: no repeated 6-gram
    d2 = "a" * 30  # single gram at 25 occurrences > max_occ -> 0
    d3 = "abcd" * 5  # period 4 < k: overlapping copies
    df = spark.createDataFrame(
        [(0, d0), (1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_chars"], r["self_dup_chars"],
                      r["self_dup_permille"])
        for r in self_repeated_char_fraction(df, k=k, max_occ=8).collect()
    }
    # positional reference (the span_fuzz ref, inlined)
    def ref(t):
        occ = {}
        for p in range(len(t) - k + 1):
            occ.setdefault(t[p : p + k], []).append(p + 1)
        cov = set()
        for ps in occ.values():
            if 2 <= len(ps) <= 8:
                for i, pa in enumerate(ps):
                    for pb in ps[i + 1 :]:
                        cov.update(range(pa, pa + k))
                        cov.update(range(pb, pb + k))
        return (len(t), len(cov), (1000 * len(cov)) // len(t))

    assert got == {i: ref(t) for i, t in enumerate((d0, d1, d2, d3))}
    assert got[0][1] == 2 * k  # exactly the two planted span copies
    assert got[1][1] == 0 and got[2][1] == 0
    assert got[3][1] == len(d3)  # tandem repeat: fully covered


def test_chunked_windows_spread_across_partitions(spark):
    # the macro-chunk repartition must spread a single huge document's
    # windows across many tasks — without it the df-cap groupBy's
    # partial agg funnels through ONE task (the r13 hugedoc stall).
    # Pins the behavior against any future AQE coalescing of the
    # explicit round-robin exchange.
    from pyspark.sql import functions as F

    from tabular_to_parquet_spark.operators.dedup import (
        _char_windows_chunked,
    )

    one_huge = spark.createDataFrame(
        [(1, "ab" * 300_000)], "doc_id long, text string"
    ).coalesce(1)
    n_parts = (
        _char_windows_chunked(one_huge, "text", "doc_id", 24, 4096,
                              macro_chars=65536)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert n_parts >= 8, f"huge doc's windows in only {n_parts} partitions"


def test_ivf_anchors_distributed_bit_identical(spark):
    # r12 verdict item 4: the executor-side generator must reproduce
    # the driver-side md5 construction exactly — downstream plans
    # embed these as literals, so any drift changes cell assignments
    from tabular_to_parquet_spark.operators.similarity import (
        ivf_anchors,
        ivf_anchors_distributed,
    )

    for cells, dim in ((16, 64), (64, 8)):
        assert ivf_anchors_distributed(spark, cells, dim) == ivf_anchors(
            cells, dim
        )


def test_gd_sentinel_freezes_weights_not_resurrects(spark):
    # once poisoned, every later round is NULL (the carried ok flag
    # can never flip back true even though frozen weights would keep
    # later rounds inside the envelope)
    rows = [(1024, 1_800_000_000)]
    expected, breach = _ref_gd_with_breach(rows, 5)
    got = (
        gd_linear_regressor(
            spark.createDataFrame(rows, "x0 long, y long"), ["x0"], rounds=5
        )
        .orderBy("round")
        .collect()
    )
    nulls = [r["round"] for r in got if r["w0"] is None]
    assert nulls == list(range(breach, 6))
