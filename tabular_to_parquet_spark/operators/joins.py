"""Join operators Spark's API lacks as built-ins (SURVEY.md §2.8 lists
the whole join family as absent from the reference; these are the two
shapes a training-data pipeline actually needs beyond equi-joins),
expressed as scalable compositions of DataFrame primitives — no UDFs,
no driver loops.

- ``asof_join`` — for every left row, the latest right row at-or-before
  it (per key). The classic distributed plan: union both sides, one
  window pass per key carrying the last-seen right payload, filter back
  to left rows. ONE shuffle on the key; state per row is one struct.
  (A sort-merge "MERGE_ASOF" would need a custom physical operator;
  the union+window form gets the same one-shuffle cost from Catalyst.)

- ``range_join_binned`` — point-in-interval joins without an equi key.
  Spark plans a bare inequality join as a broadcast nested loop —
  quadratic and undistributable. Binning converts it to an equi-join:
  points land in exactly one bin, intervals explode into the bins they
  overlap, the join key is the bin id, and the original predicate is
  re-applied as a post-filter. Each (point, interval) pair meets at
  most once (the point's single bin), so no dedup is needed. Bin width
  tunes fan-out vs selectivity; at 100 TB pick ~the median interval
  width so intervals explode into O(1) bins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    matched_col: str = "matched",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left columns + ``matched_col`` struct holding the
    nearest right row for the same ``by`` key — ``backward`` (default)
    takes the greatest ``on`` ≤ the left row's ``on``; ``forward``
    the smallest ``on`` ≥ it (NULL when no such row exists). The
    forward variant is the same one-union-one-window plan with the
    sort reversed.

    Tie rule: a right row AT the left row's timestamp matches (≤, like
    DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``). If the right side can
    carry duplicate (by, on) pairs, pre-aggregate it — "latest of
    several simultaneous rows" is otherwise ambiguous on any engine.

    ``matched_col`` must not collide with a left column (the output is
    ``left.* + matched_col``); ``__``-prefixed names are reserved for
    the operator's internal union columns.
    """
    if matched_col in left.columns:
        raise ValueError(
            f"matched_col {matched_col!r} collides with a left column; "
            "pass a different matched_col"
        )
    for frame, side in ((left, "left"), (right, "right")):
        bad = [c for c in frame.columns if c.startswith("__")]
        if bad:
            raise ValueError(
                f"{side} columns {bad} use the reserved '__' prefix"
            )
    rpay = F.struct(*[right[c] for c in right.columns])
    rtype = right.select(rpay.alias("x")).schema["x"].dataType
    lpay = F.struct(*[left[c] for c in left.columns])

    l2 = left.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(1).alias("__is_left"),
        lpay.alias("__l"),
        F.lit(None).cast(rtype).alias("__r"),
    )
    ltype = l2.schema["__l"].dataType
    r2 = right.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(ltype).alias("__l"),
        rpay.alias("__r"),
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # right sorts before left at equal timestamps → visible to the match
    on_key = F.col("__on") if direction == "backward" else F.col("__on").desc()
    w = (
        W.partitionBy("__by")
        .orderBy(on_key, "__is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = l2.unionByName(r2).withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    )
    return matched.filter(F.col("__is_left") == 1).select(
        "__l.*", F.col("__m").alias(matched_col)
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    closed: str = "left",
) -> DataFrame:
    """Join every point row to every interval row with
    ``lo ≤ point < hi`` (``closed='left'``; ``'both'`` → ``≤ hi``), via
    bin bucketing: equi-join on the bin id + exact post-filter.

    All three columns must be integer-valued (cast timestamps with
    ``unix_micros`` first). Output: all point columns + all interval
    columns (caller disambiguates names beforehand).
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    p = points.withColumn("__bin", F.floor(F.col(point_col) / bin_width))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width),
                F.floor(F.col(hi_col) / bin_width),
            )
        ),
    )
    upper: Column = (
        F.col(point_col) < F.col(hi_col)
        if closed == "left"
        else F.col(point_col) <= F.col(hi_col)
    )
    return (
        p.join(iv, "__bin")
        .filter((F.col(point_col) >= F.col(lo_col)) & upper)
        .drop("__bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: int,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Join interval rows that OVERLAP: ``l_lo < r_hi AND r_lo < l_hi``
    (half-open intervals), the interval×interval sibling of
    :func:`range_join_binned`.

    Scale shape: both sides explode to the integer bins their interval
    covers, equi-join on (bin [+ extra_keys]), then keep only the pair
    whose overlap STARTS in the joined bin — the standard
    dedup-by-construction trick, so no ``dropDuplicates`` shuffle is
    needed. Candidate volume is bounded by bins-per-interval ×
    rows-per-bin; pick ``bin_width`` near the typical interval length.
    All bound columns must be integer-valued (``unix_micros`` first).
    """
    extra_keys = extra_keys or []
    lb = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(left_lo) / bin_width),
                F.floor(F.col(left_hi) / bin_width),
            )
        ),
    )
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bin_width),
                F.floor(F.col(right_hi) / bin_width),
            )
        ),
    )
    overlap_start = F.greatest(F.col(left_lo), F.col(right_lo))
    return (
        lb.join(rb, ["__bin", *extra_keys])
        .filter(
            (F.col(left_lo) < F.col(right_hi))
            & (F.col(right_lo) < F.col(left_hi))
            # emit the pair only from the bin where its overlap starts:
            # exactly one joined bin satisfies this, so the pair appears
            # exactly once without any dedup shuffle
            & (F.floor(overlap_start / bin_width) == F.col("__bin"))
        )
        .drop("__bin")
    )
