"""Differential fuzz for the mapInArrow scale twins (s05/s08/s10).

The `_fast` twins (operators/similarity.py: nearest_centroid_confusion_fast,
kmeans_fixed_fast, gram_matrix_fast) claim BIT-EXACT equality with their
explode/join expression forms at any corpus size — that claim is
oracle-gated on the fixed test tables, but the failure modes live in the
corners the fixtures don't hit: odd dims, tiny corpora (fewer vectors
than k), duplicate/identical vectors (cluster collapse, argmin ties),
empty clusters, single-partition vs many-partition splits (the partial
→ merge path), zero vectors, and negative / large-magnitude coordinates.

Each seed synthesizes a random corpus (vector count, dim, partition
split, label pattern, duplicate/degenerate-vector mixture all drawn
from the seed), runs BOTH catalog entries of each pair through the
production code paths (extensions._emb is monkeypatched to serve the
in-memory corpus — no parquet round-trip, same query bodies the driver
certifies), and asserts exact frame equality.

Usage: python tools/twin_fuzz.py [n_seeds] [seed0]
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAIRS = [
    ("s10_gram_matrix", "s10_gram_matrix_fast"),
    ("s05_nearest_centroid_confusion", "s05_nearest_centroid_confusion_fast"),
    ("s08_kmeans_fixed", "s08_kmeans_fixed_fast"),
]


def gen_corpus(seed: int) -> pd.DataFrame:
    rng = random.Random(seed)
    n = rng.randint(3, 90)
    dim = rng.choice([2, 3, 5, 8, 16, 31, 64])
    n_labels = rng.randint(1, 5)
    style = rng.random()

    vecs = []
    base_pool = [
        np.round(
            np.array([rng.uniform(-1.5, 1.5) for _ in range(dim)]),
            rng.choice([1, 3, 6]),
        )
        for _ in range(max(1, rng.randint(1, max(1, n // 4))))
    ]
    for _ in range(n):
        r = rng.random()
        if style < 0.2 and r < 0.6:
            # heavy-duplicate regime: clusters collapse, argmin ties
            v = base_pool[rng.randrange(len(base_pool))].copy()
        elif r < 0.08:
            v = np.zeros(dim)
        elif r < 0.12:
            # large magnitudes stress the fixed-point int64 headroom
            v = np.array([rng.uniform(-8.0, 8.0) for _ in range(dim)])
        else:
            v = np.array([rng.uniform(-1.0, 1.0) for _ in range(dim)])
        vecs.append(v.astype(np.float32))

    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.tolist() for v in vecs],
            "label": np.array(
                [rng.randrange(n_labels) for _ in range(n)], dtype=np.int32
            ),
        }
    ), rng.randint(1, 8)


def frame_key(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(r) for r in df.itertuples(index=False)]
    return sorted(rows, key=repr)


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    n_threads = int(os.environ.get("TWIN_FUZZ_THREADS", "8"))

    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import types as T

    from tabular_to_parquet_spark.parity import extensions
    from tabular_to_parquet_spark.parity.catalog import CATALOG
    from tabular_to_parquet_spark.session import get_spark

    spark = get_spark("twin-fuzz")
    # tiny corpora: big shuffle fan-out is pure overhead here
    spark.conf.set("spark.sql.shuffle.partitions", "4")

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )

    # seeds run concurrently (the per-seed jobs are tiny — scheduling
    # latency, not CPU, dominates), so the _emb hook must be race-free:
    # patch it ONCE with a registry lookup keyed by the fake sf_dir.
    corpora: dict[str, object] = {}
    extensions._emb = lambda _spark, sf_dir: corpora[sf_dir]

    failures: list[tuple[int, str, str]] = []
    done = [0]

    def run_seed(seed: int):
        key = f"<mem:{seed}>"
        pdf, parts = gen_corpus(seed)
        df = spark.createDataFrame(pdf, schema=schema).repartition(parts)
        df.persist()
        corpora[key] = df
        try:
            for slow_name, fast_name in PAIRS:
                try:
                    slow = frame_key(
                        CATALOG[slow_name].spark(spark, key).toPandas()
                    )
                    fast = frame_key(
                        CATALOG[fast_name].spark(spark, key).toPandas()
                    )
                except Exception as exc:  # noqa: BLE001
                    failures.append(
                        (seed, slow_name, f"error: {str(exc).splitlines()[0][:160]}")
                    )
                    continue
                if slow != fast:
                    diff = [
                        (a, b) for a, b in zip(slow, fast) if a != b
                    ][:3]
                    failures.append(
                        (seed, slow_name,
                         f"mismatch rows={len(slow)}/{len(fast)} first={diff}")
                    )
        finally:
            corpora.pop(key, None)
            df.unpersist()
        done[0] += 1
        if done[0] % 100 == 0:
            print(
                f"[{done[0]}/{n_seeds}] ({len(failures)} failures)",
                flush=True,
            )

    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        list(pool.map(run_seed, range(seed0, seed0 + n_seeds)))

    for seed, name, reason in failures:
        print(f"FAIL seed={seed} {name}: {reason}")
    print(f"{n_seeds - len(set(f[0] for f in failures))}/{n_seeds} twin seeds match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
