"""Global-order recovery without a global sort.

Spark window functions with ``ORDER BY`` and no ``PARTITION BY`` move
every row to ONE partition (WindowExec warns, and
tools/scale_experiment.py measured 27.5x wall at 10x data for the
sorted-neighborhood query) — the single pattern in this codebase that
cannot survive 100 TB. This module factors out the fix used by
``dedup.sorted_neighborhood_pairs`` so ANY global-window query can be
rewritten on it:

1. partition the data by a COARSE BLOCK that is monotone in the sort
   key (a string prefix, a value-range bucket) — blocks are contiguous
   runs of the global order;
2. ``row_number`` within blocks (partitioned window, parallel);
3. block offsets = running count over the sorted DISTINCT block list —
   a single-partition window over a BOUNDED relation (one row per
   block), broadcast back;
4. global position = offset + in-block row number.

With exact 1-based positions, the global-window vocabulary becomes
plain relational algebra: ``lag(c, k)`` is an equi-join on
``pos - k``, ``lead`` on ``pos + k``, ``ntile(n)`` is integer
arithmetic on (pos, N). Results are EXACT (not approximate) for every
block granularity; block choice only affects balance. At 100 TB pick
blocks from approx-quantile boundaries so they're even; correctness
never depends on it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def with_global_position(
    df: DataFrame,
    order_cols: list[str | Column],
    block: Column,
    pos_col: str = "pos",
) -> DataFrame:
    """Add the exact 1-based global sort position over ``order_cols``.

    ``block`` must be monotone non-decreasing in the leading sort key
    (equal-block rows contiguous in the global order): a prefix of a
    string key, ``floor(key / width)`` of a numeric key. A NULL block
    is allowed iff the rows it covers are exactly the NULL-leading-key
    rows: NULLs form their own block, positioned FIRST — matching the
    window form's default ``asc_nulls_first`` ordering (the offset
    window and the groupBy both sort/group NULL first, and the join
    back is null-safe). ``order_cols`` must be a total order (include
    a unique tiebreak) or positions are nondeterministic within ties.
    """
    local = df.withColumn("_blk", block).withColumn(
        "_rn",
        F.row_number()
        .over(W.partitionBy("_blk").orderBy(*order_cols))
        .cast("long"),
    )
    counts = local.groupBy("_blk").agg(F.count(F.lit(1)).alias("_n"))
    # bounded single-partition window: ONE ROW PER DISTINCT BLOCK
    off = F.coalesce(
        F.sum("_n").over(W.orderBy("_blk").rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    )
    offsets = counts.select(F.col("_blk").alias("_blk_r"), off.cast("long").alias("_off"))
    return (
        # eqNullSafe: a NULL block must still find its offset row —
        # a plain equi-join would silently drop NULL-key rows instead
        # of positioning them nulls-first like the window form does.
        local.join(
            F.broadcast(offsets), F.col("_blk").eqNullSafe(F.col("_blk_r"))
        )
        .withColumn(pos_col, F.col("_off") + F.col("_rn"))
        .drop("_blk", "_blk_r", "_rn", "_off")
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer division for non-negative integral columns: the
    numerator is made exactly divisible before the double-precision
    divide, so the quotient is integral and IEEE division is exact
    (never rounds across an integer boundary)."""
    return ((a - (a % b)) / b).cast("long")


def ntile_expr(pos: Column, total: Column, n: int) -> Column:
    """Exact ``ntile(n) OVER (ORDER BY ...)`` from (position, total).

    ANSI ntile: with N rows, s = N div n and r = N mod n, the first r
    buckets hold s+1 rows, the rest s. Pure integer arithmetic — no
    window, no shuffle.
    """
    size = _idiv(total, F.lit(n))
    rem = total % n
    head = rem * (size + 1)
    return (
        F.when(pos <= head, _idiv(pos - 1, size + 1) + 1)
        .otherwise(rem + _idiv(pos - head - 1, F.greatest(size, F.lit(1))) + 1)
        .cast("long")
    )


def decile_stats_scale(orders: DataFrame, n_tiles: int = 10) -> DataFrame:
    """Scale twin of the a16 catalog query (global ntile(10) + lag
    gaps over (cents, o_orderkey)) — result-identical, but the global
    window is replaced by ``with_global_position`` + arithmetic ntile
    + a ``pos - 1`` equi-join for the lag. Every data shuffle is a
    hash exchange; the only single-partition work is one row per
    value-range block.

    Block = ``cents div 2^20`` (~$10k-wide value buckets): monotone in
    the sort key, bounded by the PRICE RANGE, not the row count. At
    real scale derive block edges from approx quantiles instead for
    even sizing — exactness does not depend on it.
    """
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    base = orders.select(cents.alias("cents"), "o_orderkey")
    pos = with_global_position(
        base,
        [F.col("cents").asc(), F.col("o_orderkey").asc()],
        (F.col("cents") / F.lit(1 << 20)).cast("long"),
    )
    total = pos.agg(F.count(F.lit(1)).cast("long").alias("_total"))
    staged = pos.crossJoin(F.broadcast(total)).select(
        "cents",
        "pos",
        ntile_expr(F.col("pos"), F.col("_total"), n_tiles).alias("decile"),
    )
    prev = staged.select(
        (F.col("pos") + 1).alias("pos"), F.col("cents").alias("prev_cents")
    )
    gapped = staged.join(prev, "pos", "left").withColumn(
        "gap", F.col("cents") - F.col("prev_cents")
    )
    return (
        gapped.groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("gap").alias("sum_gaps"),
        )
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n").cast("long").alias("n"),
            "sum_cents",
            "min_cents",
            "max_cents",
            "sum_gaps",
        )
    )


def with_running_max(
    df: DataFrame,
    order_col: str | Column,
    value: str | Column,
    block: Column,
    out_col: str = "run_max",
) -> DataFrame:
    """Add the exact running maximum of ``value`` over the GLOBAL
    order of ``order_col`` — without a global window: the
    :func:`with_global_position` block decomposition applied to MAX
    instead of COUNT. Per-block running max is a partitioned
    (parallel) window; block maxima — one row per block — take a
    bounded single-partition prefix-max and broadcast back; the global
    running max is ``greatest(in-block, prefix)``.

    ``block`` must be monotone non-decreasing in ``order_col`` and
    ``order_col`` must be a total order (running max at a row is
    order-dependent when keys tie). Any monotone associative fold
    (min, sum) decomposes identically — this is the generic shape for
    "running X over arrival order" at 100 TB."""
    local = df.withColumn("_blk", block).withColumn(
        "_rm",
        F.max(value).over(
            W.partitionBy("_blk")
            .orderBy(order_col)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    bmax = local.groupBy("_blk").agg(F.max(value).alias("_bm"))
    # bounded single-partition window: ONE ROW PER DISTINCT BLOCK
    prefix = F.max("_bm").over(W.orderBy("_blk").rowsBetween(W.unboundedPreceding, -1))
    offsets = bmax.select(F.col("_blk").alias("_blk_r"), prefix.alias("_pm"))
    return (
        local.join(F.broadcast(offsets), F.col("_blk") == F.col("_blk_r"))
        .withColumn(out_col, F.greatest("_rm", "_pm"))
        .drop("_blk", "_blk_r", "_rm", "_pm")
    )


def _skyline_pass(
    df: DataFrame, x_col: str, y_col: str, part: list[Column] | None
) -> DataFrame:
    """One dominance-elimination pass for :func:`pareto_frontier_2d`.

    A row (x, y) is dominated iff some other row has x' <= x, y' >= y
    with at least one strict.  Split by the x-relation: rows at
    strictly smaller x dominate iff their y >= this y; rows at equal
    x dominate iff their y is strictly larger (the per-x max).
    "Strictly smaller x" is expressed as a RANGE frame ending at -1
    over ``dense_rank(x)`` — NOT over x itself, where a frame bound
    of -1 would skip rows with x' in (x-1, x) for fractional x (r10
    ADVICE) — so strictness holds exactly for ANY ordered x type.
    Keep = (prefix-max-y < y) AND (y == per-x-max-y); exact ties on
    (x, y) survive together."""
    base = W.partitionBy(*part) if part else W
    w_rk = base.orderBy(x_col)
    w_lt = base.orderBy("_xrk").rangeBetween(W.unboundedPreceding, -1)
    w_eq = W.partitionBy(*(part or []), x_col)
    out = (
        df.withColumn("_xrk", F.dense_rank().over(w_rk))
        .withColumn("_mlt", F.max(y_col).over(w_lt))
        .withColumn("_meq", F.max(y_col).over(w_eq))
    )
    keep = (F.col("_mlt").isNull() | (F.col("_mlt") < F.col(y_col))) & (
        F.col(y_col) == F.col("_meq")
    )
    return out.filter(keep).drop("_xrk", "_mlt", "_meq")


def pareto_frontier_2d(
    df: DataFrame, x_col: str, y_col: str, bucket: Column
) -> DataFrame:
    """Exact 2-D Pareto frontier (skyline): rows not dominated under
    (minimize ``x_col``, maximize ``y_col``).

    The scale shape is local-then-global dominance elimination: the
    skyline of a union equals the skyline of the per-subset skylines,
    so pass 1 prunes inside arbitrary deterministic ``bucket`` groups
    with PARTITIONED windows (parallel over the corpus), and pass 2
    re-runs the identical two windows over the survivors only.  The
    single-partition window therefore touches at most
    Sigma per-bucket-skyline rows — for any real metric pair orders of
    magnitude below the corpus — never the input.  Correctness never
    depends on the bucket choice; only the survivor count does."""
    local = _skyline_pass(df.withColumn("_skb", bucket), x_col, y_col, [F.col("_skb")])
    return _skyline_pass(local, x_col, y_col, None).drop("_skb")
