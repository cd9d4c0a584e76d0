"""Data-profiling operators: per-column stats, histograms, exact
group percentiles.

The profiling pass a pipeline runs right after conversion (and the
reference's `analyse` pass runs *during* inference — cf.
/root/reference/src/analyse.rs counters, already mirrored by
plans/inference.py): what does this table actually contain, column by
column, before anything downstream trusts it.

Scale notes:

- **profile_table** is ONE aggregation pass. Exact per-column
  distinct counts make Catalyst plan an Expand (input multiplied by
  the number of profiled columns) — acceptable to a few dozen
  columns; pass ``approx=True`` to use HyperLogLog distinct counts
  (one pass, no Expand, ±2% error) for wide tables at 100 TB.
- **histogram** is a projection (closed-form bin arithmetic, no
  width_bucket dependency) plus one hash-agg on (group, bin) —
  map-side combined, skew-free because bins are bounded.
- **group_percentiles** uses Spark's exact ``percentile`` aggregate:
  per-group value buffers on the reducers, so it's for
  bounded-cardinality groups (event types, languages, sources). The
  100 TB path for high-cardinality groups is ``approx_percentile``
  (t-digest, mergeable, constant memory) — same call shape, not
  oracle-exact. Quantiles at q ∈ {.25, .5, .75} over integer-cents
  inputs interpolate exactly in binary floating point, which is what
  lets the DuckDB oracle (quantile_cont) hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """One row per column: non-null count, null count, distinct count,
    min/max (as strings, so mixed-type tables profile into one frame).

    The wide aggregate computes every column's stats in a single job;
    the melt to long form is a driver-side column rearrangement of one
    aggregated row (constant size), not a data operation.
    """
    cols = cols or df.columns
    aggs: list[Column] = []
    for c in cols:
        col = F.col(c)
        distinct = (
            F.approx_count_distinct(col) if approx else F.count_distinct(col)
        )
        aggs += [
            F.count(col).alias(f"{c}__n"),
            F.count(F.when(col.isNull(), 1)).alias(f"{c}__nulls"),
            distinct.alias(f"{c}__distinct"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.stack(
            F.lit(len(cols)),
            *[
                e
                for c in cols
                for e in (
                    F.lit(c),
                    F.col(f"{c}__n"),
                    F.col(f"{c}__nulls"),
                    F.col(f"{c}__distinct"),
                    F.col(f"{c}__min"),
                    F.col(f"{c}__max"),
                )
            ],
        ).alias("column", "n_values", "n_nulls", "n_distinct", "min_value", "max_value")
    )
    return stacked


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-width histogram of ``value_col`` over [lo, hi).

    Bin index = ``floor((v - lo) / width)`` clamped into
    [-1, nbins]: -1 collects underflow, ``nbins`` collects overflow,
    nulls are dropped. Closed-form arithmetic (no SQL width_bucket),
    so any engine reproduces the exact bin edges.
    """
    width = (hi - lo) / nbins
    v = F.col(value_col)
    raw = F.floor((v - F.lit(lo)) / F.lit(width))
    bin_id = (
        F.when(v < lo, F.lit(-1))
        .when(v >= hi, F.lit(nbins))
        .otherwise(raw)
        .cast("long")
    )
    keys = [F.col(c) for c in (group_cols or [])]
    return (
        df.where(v.isNotNull())
        .groupBy(*keys, bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def group_percentiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    approx: bool = False,
) -> DataFrame:
    """Exact (or t-digest approximate) per-group quantiles.

    Exact mode buffers each group's values on its reducer — right for
    bounded-cardinality groups; ``approx=True`` switches to
    ``approx_percentile`` for the constant-memory mergeable path.
    """
    fn = "approx_percentile" if approx else "percentile"
    aggs = [
        F.expr(f"{fn}({value_col}, {q})").alias(f"p{int(q * 100)}")
        for q in quantiles
    ]
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"), F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"), *aggs
    )


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score outliers in two passes over one shuffle key:
    a grouped aggregate of exact-integer sufficient statistics (sum of
    cents, sum of squared cents — both BIGINT, order-independent),
    broadcast back onto the rows, then a pure projection computes
    ``z = (x - mean) / stddev`` and filters ``|z| > threshold``.

    Cross-engine determinism: mean/var derive from exact integers via
    single divisions (``sumsq/n - (sum/n)^2``); sqrt is IEEE-correctly
    rounded on both engines; the z expression is one identical tree.
    Degenerate groups (stddev = 0) emit nothing.

    At 100 TB the stats aggregate map-side combines to |groups| rows
    (broadcast-sized for any real group key), so the fact table is
    scanned twice but never shuffled."""
    cents = F.floor(F.col(value_col) * 100).cast("long")
    stats = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(cents).alias("_sum_c"),
        F.sum(cents * cents).alias("_sumsq_c"),
    )
    mean = F.col("_sum_c").cast("double") / F.col("_n")
    var = F.col("_sumsq_c").cast("double") / F.col("_n") - mean * mean
    joined = df.join(F.broadcast(stats), group_cols)
    z = (cents.cast("double") - mean) / F.sqrt(var)
    return (
        joined.select(*group_cols, *[c for c in df.columns if c not in group_cols],
                      z.alias("z"))
        .filter(F.sqrt(var) > 0)
        .filter(F.abs(F.col("z")) > threshold)
    )


def expectation_report(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Data-quality expectations in ONE pass: each check is a boolean
    Column (True = row passes); the report is one conditional-sum
    aggregate per check in a single scan, unpivoted to
    (check, n_violations, n_rows) rows.

    At 100 TB this is exactly one map-side-combined aggregate over the
    table — adding a check adds a column to the agg, not a pass.
    Cross-table checks (FK integrity) don't fit a single-pass scan;
    compose them with a LEFT ANTI join count unioned onto this report
    (see the pr07 query)."""
    agg_cols = [
        F.sum(F.when(~pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in checks.items()
    ]
    row = df.agg(F.count(F.lit(1)).cast("long").alias("_n"), *agg_cols)
    names = list(checks)
    stack_expr = "stack({n}, {args}) as (check, n_violations)".format(
        n=len(names), args=", ".join(f"'{c}', {c}" for c in names)
    )
    return row.select(F.expr(stack_expr), F.col("_n").alias("n_rows"))


def fk_orphan_audit(
    specs: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit: for each (fk_name, fact, fk_col,
    dim, pk_col) spec, count fact rows whose non-null FK value has no
    matching dimension key — the star-schema data-quality check the
    expectation report (``expectation_report``) doesn't cover.

    NULL FKs are NOT violations (SQL FK semantics) and are excluded
    from both counts. Scale shape: the fact side is first reduced to
    (key, row_count) by a map-side-combinable groupBy, so the join
    input is distinct keys, not rows; the dim side is reduced to its
    distinct key set. Both sides shuffle on the key (AQE broadcasts
    the dim side when it is small); per-FK results are single rows,
    unioned driver-free into one frame."""
    from functools import reduce

    if not specs:
        raise ValueError("fk_orphan_audit needs at least one FK spec")
    out = []
    for fk_name, fact, fk_col, dim, pk_col in specs:
        keys = (
            fact.where(F.col(fk_col).isNotNull())
            .groupBy(F.col(fk_col).cast("long").alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        dim_keys = (
            dim.select(F.col(pk_col).cast("long").alias("k"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        joined = keys.join(dim_keys, "k", "left")
        out.append(
            joined.agg(
                F.lit(fk_name).alias("fk_name"),
                F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("_hit").isNull(), F.col("n")).otherwise(F.lit(0)))
                , F.lit(0)).cast("long").alias("n_orphans"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), out)


def equi_depth_histogram(
    df: DataFrame,
    value: Column,
    n_bins: int = 8,
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram from EXACT quantile
    edges: one ``percentile`` aggregate computes the n_bins-1 interior
    edges, broadcast as a scalar row; bin assignment is then a pure
    comparison projection (no global sort, no ntile) and the stats one
    hash-agg on the bounded bin key — the pl25 broadcast-quantile
    shape applied to profiling.

    ``n_bins`` must be a power of two so every quantile q = i/n_bins
    is an exact dyadic fraction: the (n-1)*q position and the
    lo + (hi-lo)*frac interpolation over integer inputs are then exact
    in binary floating point on BOTH engines (the pr03/pl25-proven
    argument), which is what makes the edges — and therefore the bin
    populations — bit-reproducible. Ties across an edge all fall on
    one deterministic side (``>`` comparisons), so equal-frequency is
    approximate in the presence of heavy ties, as for any equi-depth
    histogram. The 100 TB path swaps ``percentile`` for
    ``approx_percentile`` (t-digest, mergeable) — same shape, not
    oracle-exact."""
    if n_bins < 1 or n_bins & (n_bins - 1) != 0:
        raise ValueError(f"n_bins must be a power of two, got {n_bins}")
    v = value.alias("v")
    base = df.select(v).where(F.col("v").isNotNull())
    qs = ", ".join(f"{i}D / {n_bins}D" for i in range(1, n_bins))
    edges = base.agg(F.expr(f"percentile(v, array({qs}))").alias("es"))
    binned = base.crossJoin(F.broadcast(edges)).select(
        "v",
        sum(
            [(F.col("v") > F.col("es")[i]).cast("int") for i in range(n_bins - 1)],
            F.lit(1),
        ).cast("long").alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("v").cast("long").alias("min_value"),
        F.max("v").cast("long").alias("max_value"),
        F.sum("v").cast("long").alias("sum_value"),
    )


def key_uniqueness_audit(
    specs: list[tuple[str, DataFrame, Column]],
) -> DataFrame:
    """Key-uniqueness audit: for each (key_name, df, key_expr) spec,
    report row count, distinct-key count, number of duplicated key
    values and the worst multiplicity — the "is this column really a
    key" check that completes :func:`fk_orphan_audit` (FKs can only be
    trusted against verified-unique PKs).

    One map-side-combinable groupBy per table reduces rows to (key,
    count) before the single-row summary agg; NULL keys group like any
    value (a null 'key' shows up as multiplicity, which is the point
    of an audit). Per-key results union driver-free."""
    from functools import reduce

    if not specs:
        raise ValueError("key_uniqueness_audit needs at least one key spec")
    out = []
    for key_name, df, key in specs:
        per_key = df.groupBy(key.alias("k")).agg(
            F.count(F.lit(1)).alias("n")
        )
        out.append(
            per_key.agg(
                F.lit(key_name).alias("key_name"),
                F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.coalesce(
                    F.sum(F.when(F.col("n") > 1, 1).otherwise(0)), F.lit(0)
                ).cast("long").alias("n_dup_keys"),
                F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("max_multiplicity"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), out)


def profile_table_grouped(
    df: DataFrame,
    group_col: str,
    cols: list[str],
) -> DataFrame:
    """Per-GROUP column profile — :func:`profile_table` segmented by a
    grouping column (per-source / per-tenant / per-day data health,
    the dbt-style segmented audit). One map-side-combinable
    aggregation per profiled column (each with its own exact distinct
    count — no multi-column Expand), unioned driver-free; group
    cardinality bounds the output, not the input."""
    from functools import reduce

    if not cols:
        raise ValueError("profile_table_grouped needs at least one column")
    out = []
    for c in cols:
        out.append(
            df.groupBy(F.col(group_col).alias("group_key")).agg(
                F.lit(c).alias("col_name"),
                F.count(c).cast("long").alias("n_values"),
                F.sum(F.col(c).isNull().cast("int")).cast("long").alias("n_nulls"),
                F.countDistinct(c).cast("long").alias("n_distinct"),
                F.min(c).cast("string").alias("min_value"),
                F.max(c).cast("string").alias("max_value"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), out)


def mad_outliers(
    df: DataFrame,
    value: Column,
    group_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust outlier stats per group: median / MAD (median absolute
    deviation) and the count of values beyond ``k * MAD`` — the
    breakdown-point-0.5 twin of :func:`zscore_outliers` (one wild
    value shifts a mean and explodes a stddev; it moves a median not
    at all). Two bounded-key aggregations (median, then median of
    |x - median|) plus one broadcast-joined filter pass; exact
    ``percentile`` is safe for bounded group cardinality and q=0.5
    interpolation over integers is exact dyadic on both engines (the
    pr03 argument). The 100 TB / high-cardinality path swaps in
    approx_percentile — same shape, not oracle-exact."""
    base = df.select(F.col(group_col).alias("g"), value.alias("v")).where(
        F.col("v").isNotNull()
    )
    med = base.groupBy("g").agg(F.expr("percentile(v, 0.5D)").alias("med"))
    dev = base.join(med, "g").select(
        "g", "v", "med", F.abs(F.col("v") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("g").agg(
        F.first("med").alias("med"),
        F.expr("percentile(ad, 0.5D)").alias("mad"),
    )
    flagged = dev.drop("med").join(mad, "g")
    return (
        flagged.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum(
                (F.col("ad") > F.lit(k) * F.col("mad")).cast("int")
            ).cast("long").alias("n_outliers"),
        )
        .withColumnRenamed("g", group_col)
    )


def key_skew_audit(
    specs: list[tuple[str, DataFrame, Column]],
) -> DataFrame:
    """Join/shuffle-key skew audit: for each (key_name, df, key_expr)
    spec, summarize the per-key row-count DISTRIBUTION — the
    measurement that decides whether a key needs salting
    (operators/skew.py) or an AQE skew-join split BEFORE the shuffle
    melts down, instead of after. Per key column: row/key counts, the
    hottest key's count, the exact dyadic median per-key count, and
    the skew factor's exact integer numerator ``max_cnt * n_keys``
    (divide by n_rows once at the consumer for max/mean — emitted as
    a DECIMAL(38,0) digit string per the agg-product overflow rule,
    since both factors grow with data volume).

    Scale shape: each spec costs ONE map-side-combined groupBy down
    to (key, count) — the audit never shuffles more than the distinct
    keys it is judging — plus a single-row summary; exact
    ``percentile`` over per-key counts is safe because the summary
    input is already one row per key (at 100 TB swap for
    approx_percentile if distinct keys themselves are huge)."""
    from functools import reduce

    if not specs:
        raise ValueError("key_skew_audit needs at least one key spec")
    out = []
    for key_name, df, key in specs:
        per_key = (
            df.where(key.isNotNull())
            .groupBy(key.alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        d = "decimal(19,0)"
        out.append(
            per_key.agg(
                F.lit(key_name).alias("key_name"),
                F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("max_cnt"),
                F.expr("percentile(n, 0.5D)").alias("median_cnt"),
                (
                    F.coalesce(F.max("n"), F.lit(0)).cast(d)
                    * F.count(F.lit(1)).cast(d)
                )
                .cast("decimal(38,0)")
                .cast("string")
                .alias("skew_num"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), out)


def winsorized_stats(
    df: DataFrame,
    value: Column,
    group_col: str,
    q: float = 0.125,
) -> DataFrame:
    """Winsorized descriptive stats per group: clamp values into the
    exact [q, 1-q] quantile band, then aggregate — the
    tail-contamination-proof mean that completes the robust family
    (pr06 z-scores break on wild tails, pr17's MAD flags them; this
    SUMMARIZES despite them, the trimmed-estimator shape).

    Determinism: q must be dyadic (default 1/8) so the interpolated
    edges are exact k/8 values on both engines (the pr14/pl25
    argument), and the clamped sum ships as ``sum8x`` = Σ(8·clamped)
    — an exact BIGINT because every clamped value has at most three
    fractional bits; the consumer divides by 8·n once. One bounded-key
    percentile aggregate broadcast back onto one scan."""
    if not (0.0 < q < 0.5):
        raise ValueError(f"winsorize fraction must be in (0, 0.5), got {q}")
    if (q * 8) != int(q * 8):
        raise ValueError(f"winsorize fraction must be dyadic (k/8), got {q}")
    base = df.select(F.col(group_col).alias("g"), value.alias("v")).where(
        F.col("v").isNotNull()
    )
    edges = base.groupBy("g").agg(
        F.expr(f"percentile(v, {q}D)").alias("lo"),
        F.expr(f"percentile(v, {1.0 - q}D)").alias("hi"),
    )
    j = base.join(edges, "g")
    clamped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("v").cast("double")))
    return (
        j.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
            F.sum((F.col("v") < F.col("lo")).cast("int")).cast("long").alias("n_low"),
            F.sum((F.col("v") > F.col("hi")).cast("int")).cast("long").alias("n_high"),
            F.sum((clamped * 8).cast("long")).cast("long").alias("sum8x"),
        )
        .withColumnRenamed("g", group_col)
    )


def weighted_median(
    df: DataFrame,
    value: Column,
    weight: Column,
    group_col: str,
) -> DataFrame:
    """Weighted (lower) median per group: the smallest value whose
    cumulative weight reaches half the total — ``2·cumw >= totw``
    compared in exact integers, so the order statistic needs no
    percentile builtin and no division (the weighted twin the
    unweighted ``percentile`` family can't express; value and weight
    should be integral for cross-engine exactness).

    Shape: one (group, value) pre-aggregation collapses rows to
    DISTINCT values per group, then a group-PARTITIONED ordered cumsum
    (parallel across groups; the window input is the bounded
    distinct-value set, never raw rows) and a min over the crossing
    suffix. If distinct values per group are themselves huge at 100 TB,
    rebucket values first (floor(v / width) blocks) and recurse into
    the one crossing bucket — same crossing rule, logarithmic rounds."""
    from pyspark.sql import Window as W

    pv = df.groupBy(F.col(group_col).alias("g"), value.alias("v")).agg(
        F.sum(weight).alias("wv")
    )
    cw = F.sum("wv").over(
        W.partitionBy("g").orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tw = F.sum("wv").over(W.partitionBy("g"))
    c = pv.select("g", "v", cw.alias("cw"), tw.alias("tw"))
    return (
        c.where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("g")
        .agg(
            F.min("v").cast("long").alias("wmedian"),
            F.min("tw").cast("long").alias("total_weight"),
        )
        .withColumnRenamed("g", group_col)
    )


def chi2_contingency(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Chi-square independence-audit sufficient statistics for two
    categorical columns: per contingency cell, the observed count and
    the EXACT integer deviation numerator n*O - R*C (the chi-square
    term is dev^2 / (n*R*C); pr11/g06/pr24 discipline — emit exact
    sufficient statistics, leave the float ops to the caller).

    Plan: one hash-agg to the contingency table, then three window
    sums over that BOUNDED relation (|a| x |b| cells — category
    cardinalities, never the corpus), including one single-partition
    total over the same bounded rows.  Products of two corpus-scale
    counts exceed int64 at 100 TB, so dev ships as a DECIMAL(38,0)
    digit string (the r7 overflow rule)."""
    from pyspark.sql import Window as W

    d19 = "decimal(19,0)"
    cells = df.groupBy(a_col, b_col).agg(
        F.count(F.lit(1)).cast("long").alias("observed")
    )
    totals = cells.select(
        a_col,
        b_col,
        "observed",
        F.sum("observed").over(W.partitionBy(a_col)).cast("long").alias("row_total"),
        F.sum("observed").over(W.partitionBy(b_col)).cast("long").alias("col_total"),
        F.sum("observed").over(W.partitionBy()).cast("long").alias("grand_total"),
    )
    dev = (
        F.col("grand_total").cast(d19) * F.col("observed").cast(d19)
        - F.col("row_total").cast(d19) * F.col("col_total").cast(d19)
    )
    return totals.withColumn(
        "dev_no_minus_rc", dev.cast("decimal(38,0)").cast("string")
    )


def null_pattern_audit(
    df: DataFrame, probes: dict[str, str], example_col: str
) -> DataFrame:
    """Missingness-pattern profile: group rows by WHICH of the probe
    columns are null — the joint null-indicator distribution that
    per-column null counts can't see (after a star-schema left join
    the patterns ARE the orphan combinations; cf. fk_orphan_audit,
    which counts each edge separately).

    ``probes`` maps output flag name -> column to null-test.  One
    hash-agg on at most 2^k patterns; ``example_col``'s min is the
    reproducible witness row for each pattern."""
    flags = [F.col(c).isNull().cast("long").alias(name) for name, c in probes.items()]
    proj = df.select(*flags, F.col(example_col).alias("_ex"))
    return proj.groupBy(*probes.keys()).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("_ex").alias("example_key"),
    )
