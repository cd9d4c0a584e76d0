"""Skew-handling operators: salting for hot keys (SCALE.md §1/§2).

At 100 TB a groupBy/join on a low-cardinality or Zipf-distributed key
sends whole key-populations to single reducers. AQE's skew-join split
handles many cases at runtime; salting is the explicit, always-works
form, expressed here as reusable compositions:

- ``salted_agg`` — two-stage aggregation: rows of one key are spread
  over ``buckets`` salt partitions, partially aggregated, then merged.
  Works for any decomposable aggregate (count/sum/min/max); the merge
  is sum-of-partials here.
- ``salted_join`` — the fact side gets a per-row salt, the small
  dimension side is exploded ×``buckets`` so every (key, salt) pair
  exists; the join key becomes (key, salt) which hash-distributes a
  hot key across ``buckets`` reducers. Row multiplication only on the
  SMALL side.

Salts derive from ``monotonically_increasing_id`` — deterministic
within a run, uniform across partitions, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(buckets: int) -> Column:
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, Column] | None = None,
    buckets: int = 32,
) -> DataFrame:
    """Per-key ``n_rows`` plus a sum per entry of ``sums``
    (name → row-level Column), computed skew-safely in two stages.

    Equivalent to ``df.groupBy(keys).agg(count, sum...)`` — verified by
    the a11 oracle — but no reducer ever sees more than ~1/buckets of a
    hot key's rows in the first (heavy) stage; the second stage merges
    ``buckets`` partial rows per key.
    """
    sums = sums or {}
    staged = df.select(
        *[F.col(k) for k in keys],
        _salt(buckets).alias("_salt"),
        *[e.alias(f"_v_{n}") for n, e in sums.items()],
    )
    partial = staged.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(f"_v_{n}").alias(f"_s_{n}") for n in sums],
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n_rows"),
        *[F.sum(f"_s_{n}").alias(n) for n in sums],
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    buckets: int = 32,
) -> DataFrame:
    """Equi-join a skewed fact table to a small dimension on ``on``,
    spreading each hot key over ``buckets`` reducers.

    Same rows as ``fact.join(dim, on)`` (inner) — verified by the a12
    oracle. The dimension is exploded ×buckets (small side only), so
    the shuffle key (on, salt) has buckets× the cardinality.
    """
    f = fact.withColumn("_salt", _salt(buckets))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return f.join(d, [on, "_salt"]).drop("_salt")
