"""Differential fuzz for the in-plan fixed-point GD trainer
(r11 verdict item 5, second half).

pl37's `gd_linear_regressor` is oracle-gated at the documents fixture
only.  This fuzzer drives the SAME production function over random
integer corpora and checks every round's (weights, loss) row against
an INDEPENDENT integer-numpy reference (the twin discipline of
tests/test_round11_ops.py, re-implemented here so the tool stands
alone): int64 residuals, numpy floor_divide for every floor division,
exact X^T @ rs gradients.

Corpus regimes stress the corners the fixture never hits: negative
features and labels (the pmod floor path), all-zero labels (instant
convergence), constant/duplicate rows, single-row corpora, 1..5
features, 1..6 rounds, magnitudes up to the 2^53/4 pre-flight
envelope boundary (seeds that would breach it are regenerated — the
guard itself has dedicated tests).

Usage: python tools/gd_fuzz.py [n_seeds] [seed0]
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W_SCALE = 20
RESID_SHIFT = 10
LR_SHIFT = 7


# ---------------------------------------------------------------------------
# integer-numpy reference (independent: no Spark, no SQL)


def ref_gd(X: np.ndarray, y: np.ndarray, rounds: int):
    n = len(X)
    W = np.zeros(X.shape[1], dtype=np.int64)
    rows = []
    for t in range(1, rounds + 1):
        resid = X @ W - (y << W_SCALE)
        rs = np.floor_divide(resid, 1 << RESID_SHIFT)
        grad = X.T @ rs
        loss = int(np.floor_divide(np.abs(resid), 1 << W_SCALE).sum())
        W = W - np.floor_divide(np.floor_divide(grad, n), 1 << LR_SHIFT)
        rows.append((t, *W.tolist(), loss))
    return rows


def traj_in_envelope(X: np.ndarray, y: np.ndarray, rounds: int) -> bool:
    """Exact arbitrary-precision trajectory check: every residual and
    gradient of every round stays below 2^53.  The production
    pre-flight guard bounds only the ROUND-1 gradient (with 4x
    headroom); a divergent trajectory (small n, large |x|, the
    effective learning rate overshooting) can still breach int64 in
    later rounds — by contract that is out-of-envelope (Spark's ANSI
    mode raises, numpy wraps), so the fuzzer only certifies
    trajectories that stay inside."""
    n, m = X.shape
    W = [0] * m
    for _ in range(rounds):
        rs = []
        for i in range(n):
            pred = sum(W[j] * int(X[i, j]) for j in range(m))
            r = pred - int(y[i]) * (1 << W_SCALE)
            if abs(r) >= (1 << 53):
                return False
            rs.append(r // (1 << RESID_SHIFT))
        new_w = []
        for j in range(m):
            d = sum(int(X[i, j]) * rs[i] for i in range(n))
            if abs(d) >= (1 << 53):
                return False
            new_w.append(W[j] - (d // n) // (1 << LR_SHIFT))
        W = new_w
    return True


def gen_problem(rng: random.Random):
    """Random (X, y, rounds) inside the 2^53/4 pre-flight envelope
    whose full trajectory also stays exact (see traj_in_envelope)."""
    while True:
        n = rng.choice([1, 2, 3, rng.randint(4, 60)])
        nf = rng.randint(1, 5)
        rounds = rng.randint(1, 6)
        regime = rng.random()
        if regime < 0.15:
            # large-magnitude corner: push toward the envelope bound
            xmax, ymax = 10_000, 50_000
        elif regime < 0.3:
            xmax, ymax = 3, 5  # tiny values, heavy ties/zeros
        else:
            xmax, ymax = 600, 2200  # the documented envelope
        cols = []
        for j in range(nf):
            kind = rng.random()
            if kind < 0.2:
                cols.append(np.ones(n, dtype=np.int64))  # bias/constant
            elif kind < 0.4:
                cols.append(
                    np.array([rng.randint(-xmax, xmax)] * n, dtype=np.int64)
                )  # constant non-unit (degenerate gradient direction)
            else:
                cols.append(
                    np.array(
                        [rng.randint(-xmax, xmax) for _ in range(n)],
                        dtype=np.int64,
                    )
                )
        X = np.column_stack(cols)
        lkind = rng.random()
        if lkind < 0.1:
            y = np.zeros(n, dtype=np.int64)
        elif lkind < 0.5:
            # planted linear + noise (the convergent regime)
            coef = [rng.randint(-5, 5) for _ in range(nf)]
            y = sum(c * X[:, j] for j, c in enumerate(coef)) + np.array(
                [rng.randint(-9, 9) for _ in range(n)], dtype=np.int64
            )
            y = y.astype(np.int64)
        else:
            y = np.array(
                [rng.randint(-ymax, ymax) for _ in range(n)], dtype=np.int64
            )
        mx = max(int(np.abs(X).max()), 1)
        my = max(int(np.abs(y).max()), 1)
        bound = n * mx * ((my << (W_SCALE - RESID_SHIFT)) + 1)
        if bound < (1 << 53) // 4 and traj_in_envelope(X, y, rounds):
            return X, y, rounds


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    n_threads = int(os.environ.get("GD_FUZZ_THREADS", "12"))

    from concurrent.futures import ThreadPoolExecutor

    from tabular_to_parquet_spark.operators.pipeline import (
        gd_linear_regressor,
    )
    from tabular_to_parquet_spark.session import get_spark

    spark = get_spark(
        "gd-fuzz",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    # novel tiny plan per seed: codegen + AQE are pure overhead here;
    # the codegen path stays covered by the pl37 catalog oracle.
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    failures: list[tuple[int, str]] = []
    done = [0]

    def run_seed(seed: int):
        rng = random.Random(seed)
        X, y, rounds = gen_problem(rng)
        expected = ref_gd(X, y, rounds)
        cols = [f"x{j}" for j in range(X.shape[1])]
        rows = [
            tuple(int(v) for v in r) + (int(lbl),) for r, lbl in zip(X, y)
        ]
        df = spark.createDataFrame(
            rows, ", ".join(f"{c} long" for c in cols) + ", y long"
        ).coalesce(rng.randint(1, 4))
        out = gd_linear_regressor(df, cols, rounds=rounds)
        got = [
            (r["round"], *[r[f"w{j}"] for j in range(X.shape[1])],
             r["sum_abs_resid_scaled"])
            for r in sorted(out.collect(), key=lambda r: r["round"])
        ]
        if got != expected:
            bad = [
                (g, e) for g, e in zip(got, expected) if g != e
            ][:2]
            return (
                f"n={len(X)} nf={X.shape[1]} rounds={rounds} diff={bad}"
            )
        return None

    def wrapped(seed: int):
        try:
            r = run_seed(seed)
        except Exception as e:  # noqa: BLE001
            r = f"exception {e!r}"[:300]
        done[0] += 1
        if done[0] % 100 == 0:
            print(f"  {done[0]}/{n_seeds} seeds, {len(failures)} failures",
                  flush=True)
        if r is not None:
            failures.append((seed, r))

    with ThreadPoolExecutor(max_workers=n_threads) as ex:
        list(ex.map(wrapped, range(seed0, seed0 + n_seeds)))

    print(f"gd_fuzz: {n_seeds} seeds ({seed0}..{seed0 + n_seeds - 1}), "
          f"{len(failures)} failures")
    for seed, detail in failures[:20]:
        print(f"  FAIL seed={seed}: {detail}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
