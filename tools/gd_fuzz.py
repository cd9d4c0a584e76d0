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

RANGES (r13 verdict item 8 — campaigns use disjoint fresh
intervals; every 4th seed runs the divergent out-of-envelope regime
since r13 unless GD_FUZZ_DIVERGENT=0):

  ======================  ==========================================
  seed interval           campaign
  ======================  ==========================================
  [0, 204999]             r11–r12 envelope-only campaigns (~5,048)
  [205000, 206199]        r13 on pre-sentinel code, 1,200 seeds
  [206200, 207399]        r13 sentinel code + divergent regime, 1,200
  [208000, 208002]        r13 judge spot-seeds
  [220000, 220063]        r14 smoke on the tightened 2^53 - n bound
  [221000, ...)           r14+: reserved next interval
  ======================  ==========================================

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
            # grad bound mirrors the engine sentinel: 2^53 - n, since
            # the /n fdiv numerator d - pm can exceed |d| by up to
            # n - 1 for negative d (r13 ADVICE)
            if abs(d) >= (1 << 53) - n:
                return False
            new_w.append(W[j] - (d // n) // (1 << LR_SHIFT))
        W = new_w
    return True


def ref_gd_poisoned(X: np.ndarray, y: np.ndarray, rounds: int):
    """Exact-python (arbitrary precision, no numpy wrap) GD twin with
    the production sentinel's poison semantics: from the first round
    whose actual max|resid| reaches 2^53 or any |grad_j| reaches
    2^53 - n, every emitted (w.., loss) is None and the carried
    weights freeze.
    Returns (rows, breach_round_or_None, safe) where ``safe`` is True
    iff the Spark plan is guaranteed raise-free under ANSI: every
    exact pre-breach value stays < 2^59 and the breach-round garbage
    gradient bound n*mx*(max|resid|//2^10 + 4) stays < 2^62 (frozen
    weights make every post-breach round identical to the breach
    round, so bounding that one round bounds them all)."""
    n, m = X.shape
    mx = max(int(np.abs(X).max()), 1)
    W = [0] * m
    rows, breach = [], None
    safe = True
    lim = 1 << 59
    for t in range(1, rounds + 1):
        resids = [
            sum(W[j] * int(X[i, j]) for j in range(m))
            - (int(y[i]) << W_SCALE)
            for i in range(n)
        ]
        mr = max(abs(r) for r in resids)
        rs = [r // (1 << RESID_SHIFT) for r in resids]
        grads = [
            sum(int(X[i, j]) * rs[i] for i in range(n)) for j in range(m)
        ]
        loss = sum(abs(r) // (1 << W_SCALE) for r in resids)
        if breach is None and (
            # grad bound 2^53 - n mirrors the engine sentinel (r13
            # ADVICE): the /n fdiv numerator can exceed |grad| by n-1
            mr >= (1 << 53)
            or any(abs(g) >= (1 << 53) - n for g in grads)
        ):
            breach = t
            # the only round computing garbage (weights freeze after)
            if mr >= lim or n * mx * (mr // (1 << RESID_SHIFT) + 4) >= (
                1 << 62
            ):
                safe = False
        if breach is None:
            if mr >= lim or any(abs(g) >= lim for g in grads):
                safe = False
            W = [
                W[j] - ((grads[j] // n) // (1 << LR_SHIFT))
                for j in range(m)
            ]
            rows.append((t, *W, loss))
        else:
            rows.append((t, *([None] * m), None))
    return rows, breach, safe


def gen_divergent(rng: random.Random):
    """Random (X, y, rounds, expected_rows) whose trajectory PASSES
    the round-1 pre-flight guard but breaches the 2^53 fdiv envelope
    in a round >= 2 — the silently-inexact window the per-round
    sentinel poisons (r12 ADVICE medium).  A dominant feature with
    |x| > 512 makes the residual multiply by (1 - x^2/2^17) each
    round; acceptance requires an exact breach round within the run
    and raise-free magnitudes (ref_gd_poisoned's ``safe``).  rounds
    stays <= 4 (the gd_fuzz plan-analysis cap), so the labels sit
    near the pre-flight boundary (1e7..5e8: resid_1 ~ y*2^20 up to
    ~5e14) and one to three amplification rounds cross 2^53."""
    while True:
        n = rng.randint(1, 2)
        rounds = rng.randint(2, 4)
        x0 = rng.choice([-1, 1]) * rng.randint(700, 1400)
        nf = rng.randint(1, 2)
        cols = [np.array([x0] * n, dtype=np.int64)]
        if nf == 2:
            cols.append(
                np.array(
                    [rng.randint(-3, 3) for _ in range(n)], dtype=np.int64
                )
            )
        X = np.column_stack(cols)
        y = np.array(
            [
                rng.choice([-1, 1]) * rng.randint(10_000_000, 500_000_000)
                for _ in range(n)
            ],
            dtype=np.int64,
        )
        # must pass the production pre-flight (round-1 bound)
        mx = max(int(np.abs(X).max()), 1)
        my = max(int(np.abs(y).max()), 1)
        if n * mx * ((my << (W_SCALE - RESID_SHIFT)) + 1) >= (1 << 53) // 4:
            continue
        rows, breach, safe = ref_gd_poisoned(X, y, rounds)
        if breach is not None and breach >= 2 and safe:
            return X, y, rounds, rows


def gen_problem(rng: random.Random):
    """Random (X, y, rounds) inside the 2^53/4 pre-flight envelope
    whose full trajectory also stays exact (see traj_in_envelope)."""
    while True:
        n = rng.choice([1, 2, 3, rng.randint(4, 60)])
        nf = rng.randint(1, 5)
        # rounds capped at 4: the static plan nests each round's
        # aggregate inside the next, so driver-side analysis cost is
        # ~quadratic in rounds while the arithmetic paths under test
        # (pmod floor-div, gradient sums, loss) are exercised fully
        # every round — seeds/hour triples with no coverage loss
        # (seeds 200000-200199 ran the 1..6 variant, clean)
        rounds = rng.randint(1, 4)
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

    # per-seed cost is dominated by tiny-JOB overhead (each round's
    # broadcast exchanges are separate Spark jobs), so seeds are
    # UNIONED — BATCH problems pad their weight columns to 5, tag
    # rows with the seed, and collect as ONE action whose jobs the
    # scheduler overlaps. The production function is untouched; its
    # pre-flight aggregate still runs per seed at build time.
    BATCH = int(os.environ.get("GD_FUZZ_BATCH", "8"))
    MAXF = 5

    def run_batch(seeds: list[int]):
        from pyspark.sql import functions as F

        expected: dict[int, list[tuple]] = {}
        parts = []
        for seed in seeds:
            rng = random.Random(seed)
            if seed % 4 == 3 and os.environ.get("GD_FUZZ_DIVERGENT", "1") == "1":
                # out-of-envelope regime (r12 ADVICE): breach rounds
                # >= 2 must poison, not silently lose fdiv bits
                X, y, rounds, exp = gen_divergent(rng)
                expected[seed] = exp
            else:
                X, y, rounds = gen_problem(rng)
                expected[seed] = ref_gd(X, y, rounds)
            nf = X.shape[1]
            cols = [f"x{j}" for j in range(nf)]
            rows = [
                tuple(int(v) for v in r) + (int(lbl),)
                for r, lbl in zip(X, y)
            ]
            df = spark.createDataFrame(
                rows, ", ".join(f"{c} long" for c in cols) + ", y long"
            ).coalesce(rng.randint(1, 4))
            out = gd_linear_regressor(df, cols, rounds=rounds)
            parts.append(
                out.select(
                    F.lit(seed).alias("sd"),
                    "round",
                    *[
                        (F.col(f"w{j}") if j < nf
                         else F.lit(None).cast("long")).alias(f"pw{j}")
                        for j in range(MAXF)
                    ],
                    "sum_abs_resid_scaled",
                )
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        by_seed: dict[int, list] = {s: [] for s in seeds}
        for r in u.collect():
            by_seed[r["sd"]].append(r)
        bad: list[tuple[int, str]] = []
        for seed in seeds:
            nf = len(expected[seed][0]) - 2  # (round, w.., loss)
            got = [
                (r["round"], *[r[f"pw{j}"] for j in range(nf)],
                 r["sum_abs_resid_scaled"])
                for r in sorted(by_seed[seed], key=lambda r: r["round"])
            ]
            if got != expected[seed]:
                diff = [
                    (g, e) for g, e in zip(got, expected[seed]) if g != e
                ][:2]
                bad.append((seed, f"nf={nf} diff={diff}"))
        return bad

    def wrapped(seeds: list[int]):
        try:
            bad = run_batch(seeds)
        except Exception as e:  # noqa: BLE001
            bad = [(seeds[0], f"batch exception {e!r}"[:300])]
        done[0] += len(seeds)
        if done[0] % 96 < BATCH:
            print(f"  {done[0]}/{n_seeds} seeds, {len(failures)} failures",
                  flush=True)
        failures.extend(bad)

    batches = [
        list(range(s, min(s + BATCH, seed0 + n_seeds)))
        for s in range(seed0, seed0 + n_seeds, BATCH)
    ]
    with ThreadPoolExecutor(max_workers=n_threads) as ex:
        list(ex.map(wrapped, batches))

    print(f"gd_fuzz: {n_seeds} seeds ({seed0}..{seed0 + n_seeds - 1}), "
          f"{len(failures)} failures")
    for seed, detail in failures[:20]:
        print(f"  FAIL seed={seed}: {detail}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
