"""Parity catalog for the data-profiling operators
(operators/profiling.py).

The profile oracle re-derives each column's stats as an explicit
UNION ALL; the histogram oracle repeats the closed-form bin
arithmetic; the percentile oracle leans on the fact that
quantile_cont at q ∈ {.25,.5,.75} over integer cents interpolates
exactly in binary floating point, so Spark's ``percentile`` and
DuckDB's ``quantile_cont`` agree bit-for-bit.

The profile gate sticks to integer/varchar columns: cross-engine
*string rendering* of doubles/timestamps differs (1e7 vs 10000000.0),
which is a formatting concern, not a stats one — the operator itself
profiles any type.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tabular_to_parquet_spark.operators import profiling as pr
from tabular_to_parquet_spark.parity.catalog import register
from tabular_to_parquet_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# pr01 — per-column table profile

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def _profile_arm(c: str) -> str:
    return f"""
SELECT '{c}' AS col_name,
       CAST(COUNT({c}) AS BIGINT) AS n_values,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       MIN({c})::VARCHAR AS min_value,
       MAX({c})::VARCHAR AS max_value
FROM orders"""


@register(
    "pr01_profile_orders",
    "\nUNION ALL\n".join(_profile_arm(c) for c in _PROFILE_COLS),
)
def _q_profile(spark, sf_dir):
    """Column profile of the orders table — one aggregation job for
    all columns (the exact-distinct Expand is bounded by 4 columns
    here; approx=True is the wide-table path)."""
    orders = load_table(spark, sf_dir, "orders")
    out = pr.profile_table(orders, _PROFILE_COLS)
    return out.withColumnRenamed("column", "col_name")


# ---------------------------------------------------------------------------
# pr02 — grouped fixed-width histogram

_H_LO, _H_HI, _H_BINS = 0.0, 500.0, 25


@register(
    "pr02_value_histogram",
    f"""
SELECT event_type,
       CAST(CASE WHEN value < {_H_LO} THEN -1
                 WHEN value >= {_H_HI} THEN {_H_BINS}
                 ELSE floor((value - {_H_LO}) / {(_H_HI - _H_LO) / _H_BINS})
            END AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events WHERE value IS NOT NULL
GROUP BY 1, 2
""",
)
def _q_histogram(spark, sf_dir):
    """25-bin histogram of event values per event type: closed-form
    bin arithmetic (identical doubles on both engines) + one
    map-side-combined hash agg on (type, bin)."""
    events = load_table(spark, sf_dir, "events")
    return pr.histogram(
        events, "value", _H_LO, _H_HI, _H_BINS, group_cols=["event_type"]
    )


# ---------------------------------------------------------------------------
# pr03 — exact per-group percentiles

@register(
    "pr03_event_percentiles",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(cents) AS BIGINT) AS min_value,
       CAST(MAX(cents) AS BIGINT) AS max_value,
       quantile_cont(cents, 0.25) AS p25,
       quantile_cont(cents, 0.5) AS p50,
       quantile_cont(cents, 0.75) AS p75
FROM (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL)
GROUP BY event_type
""",
)
def _q_percentiles(spark, sf_dir):
    """Exact quartiles of integer event cents per event type.
    Bounded group cardinality -> exact percentile is safe; the
    100 TB/high-cardinality path is approx_percentile (documented,
    not oracle-exact)."""
    events = load_table(spark, sf_dir, "events")
    cents = events.where(F.col("value").isNotNull()).select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    return pr.group_percentiles(cents, "cents", "event_type")


# ---------------------------------------------------------------------------
# pr04 — embedding-norm histogram (vector profiling)

from tabular_to_parquet_spark.parity.extensions import _dot


@register(
    "pr04_embedding_norm_histogram",
    f"""
SELECT CAST(floor(sqrt({_dot('embedding', 'embedding')}) * 10) AS BIGINT)
           AS norm_bin,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(vec_id) AS BIGINT) AS id_checksum
FROM embeddings GROUP BY 1
""",
)
def _q_norm_histogram(spark, sf_dir):
    """Vector-column profiling: histogram of embedding L2 norms in
    0.1-wide bins. floor(norm*10) is computed PER ROW (one fold + one
    sqrt + one multiply — deterministic, no cross-row float
    accumulation), so the group keys are exact integers and the
    hash-agg is oracle-stable. The id checksum pins the exact
    row→bin assignment. One map-side-combined shuffle on ≤ a few
    dozen bins."""
    from tabular_to_parquet_spark.operators.dedup import dot_product

    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(dot_product(F.col("embedding"), F.col("embedding")))
    return (
        emb.select(
            F.floor(norm * 10).cast("long").alias("norm_bin"), "vec_id"
        )
        .groupBy("norm_bin")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum("vec_id").alias("id_checksum"),
        )
    )


# ---------------------------------------------------------------------------
# pr05 — exact-sum Pearson correlation (statistical profiling)


@register(
    "pr05_price_qty_correlation",
    """
WITH t AS (
    SELECT CAST(l_quantity AS BIGINT) AS x,
           CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
    FROM lineitem),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           SUM(x * x)::HUGEINT AS sxx,
           SUM(y * y)::HUGEINT AS syy
    FROM t)
SELECT n, sx, sy, sxy,
       (n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE
       / (sqrt((n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE)
          * sqrt((n::HUGEINT * syy - sy::HUGEINT * sy)::DOUBLE))
           AS pearson_r
FROM s
""",
)
def _q_correlation(spark, sf_dir):
    """Pearson correlation with a deterministic float story: Spark's
    ``corr()`` accumulates doubles in partition order (unverifiable),
    so the engine computes the sufficient statistics as EXACT integer
    sums and forms r in one fixed-order double expression —
    bit-identical on both engines, one map-side-combined agg to a
    single row.

    Overflow discipline (10× smoke, round 7): Σy² with y in cents
    grows past i64 at ~6M rows (per-row y² ≈ 3·10¹³), so the square
    sums accumulate in DECIMAL(38,0) here / HUGEINT in the oracle —
    both exact — and never surface as output columns. The emitted
    BIGINT sums (Σx, Σy, Σxy) are linear-to-near-linear and hold to
    ~10¹⁰ rows at these magnitudes; Spark ANSI fails loudly past
    that. n·Σy² ≈ 3·10³⁷ at 10¹² rows — still inside both wide
    types."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.floor(F.col("l_extendedprice") * 100).cast("long")
    dec = "decimal(38,0)"
    s = li.select(x.alias("x"), y.alias("y")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast(dec).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).cast(dec).alias("syy"),
    )
    # products exceed i64 (n·Σy² ≈ 10^23 at sf0.1): exact wide integers
    # — DECIMAL(38,0) here, HUGEINT in the oracle — converted to double
    # exactly once (same round-to-nearest on both engines)
    d = lambda c: F.col(c).cast("decimal(38,0)")
    num = (d("n") * d("sxy") - d("sx") * d("sy")).cast("double")
    den = F.sqrt((d("n") * d("sxx") - d("sx") * d("sx")).cast("double")) * F.sqrt(
        (d("n") * d("syy") - d("sy") * d("sy")).cast("double")
    )
    return s.select("n", "sx", "sy", "sxy", (num / den).alias("pearson_r"))


@register(
    "pr06_value_outliers",
    """
WITH c AS (SELECT event_id, event_type,
                  CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
stats AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS s,
                 CAST(SUM(cents * cents) AS BIGINT) AS sq
          FROM c GROUP BY event_type)
SELECT event_id, event_type,
       (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / n)
           / sqrt(CAST(sq AS DOUBLE) / n
                  - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS z
FROM c JOIN stats USING (event_type)
WHERE sqrt(CAST(sq AS DOUBLE) / n
           - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) > 0
  AND abs((CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / n)
          / sqrt(CAST(sq AS DOUBLE) / n
                 - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))) > 3.0
""",
)
def _q_outliers(spark, sf_dir):
    """Per-event-type z-score outliers (|z| > 3) from exact-integer
    sufficient statistics — profiling.zscore_outliers."""
    ev = load_table(spark, sf_dir, "events")
    return pr.zscore_outliers(
        ev, value_col="value", group_cols=["event_type"], threshold=3.0
    ).select("event_id", "event_type", "z")


@register(
    "pr07_quality_expectations",
    """
WITH single AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN NOT (o_totalprice >= 0) THEN 1 ELSE 0 END) AS BIGINT)
               AS v_price,
           CAST(SUM(CASE WHEN NOT (o_orderstatus IN ('F','O','P')) THEN 1 ELSE 0 END) AS BIGINT)
               AS v_status,
           CAST(SUM(CASE WHEN NOT (o_orderdate >= TIMESTAMP '1990-01-01 00:00:00'
                              AND o_orderdate < TIMESTAMP '2005-01-01 00:00:00')
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_date
    FROM orders
),
dup AS (
    SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v,
           CAST(COUNT(*) AS BIGINT) AS n FROM orders
),
fk AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS v,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
)
SELECT 'totalprice_nonneg' AS check, v_price AS n_violations, n_rows FROM single
UNION ALL
SELECT 'status_domain', v_status, n_rows FROM single
UNION ALL
SELECT 'orderdate_range', v_date, n_rows FROM single
UNION ALL
SELECT 'orderkey_unique', v, n FROM dup
UNION ALL
SELECT 'custkey_fk', v, n FROM fk
""",
)
def _q_quality_expectations(spark, sf_dir):
    """Expectation audit of orders: three single-pass predicate checks
    (profiling.expectation_report — one aggregate, one scan), plus a
    uniqueness check and an FK-integrity anti-join, unioned into one
    report."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    report = pr.expectation_report(
        orders,
        {
            "totalprice_nonneg": F.col("o_totalprice") >= 0,
            "status_domain": F.col("o_orderstatus").isin("F", "O", "P"),
            "orderdate_range": (
                (F.col("o_orderdate") >= F.lit("1990-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2005-01-01").cast("timestamp"))
            ),
        },
    )
    n = orders.count()
    dup = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).cast("long").alias("n_violations")
    ).select(F.lit("orderkey_unique").alias("check"), "n_violations",
             F.lit(n).cast("long").alias("n_rows"))
    fk = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .select(F.lit("custkey_fk").alias("check"), "n_violations",
                F.lit(n).cast("long").alias("n_rows"))
    )
    return report.unionByName(dup).unionByName(fk)


# ---------------------------------------------------------------------------
# pr08 — HLL approximate distinct counts. Spark's HyperLogLog++ and
# DuckDB's HLL produce different ESTIMATES by construction, so the
# estimate itself can't be value-hashed — instead the query emits the
# exact counterpart (computed alongside, same scan) plus a
# within-3·rsd flag, which DuckDB reproduces by computing the exact
# side and asserting the flag. A sketch that drifts out of its
# accuracy contract flips the flag and fails the hash gate — the
# rows-only asterisk is gone.


@register(
    "pr08_approx_distinct_users",
    """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd_users_exact,
       CAST(1 AS BIGINT) AS hll_within_3rsd
FROM events GROUP BY event_type
""",
)
def _q_approx_distinct(spark, sf_dir):
    """Per-event-type approximate distinct users via HyperLogLog++
    (approx_count_distinct, rsd=0.05). The 100 TB point: exact
    COUNT(DISTINCT) shuffles every (event_type, user_id) pair; the
    HLL sketch is a fixed few-KB register set per group, merged
    map-side — the only shuffle payload is the sketch itself. The
    exact count here exists to GATE the sketch (|approx-exact| ≤
    3·rsd·exact, a ~99.7 % bound that HLL++ meets deterministically
    on identical input); at 100 TB you'd ship the sketch alone."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.05).alias("nd_approx"),
        F.countDistinct("user_id").alias("nd_exact"),
    )
    return agg.select(
        "event_type",
        F.col("nd_exact").cast("long").alias("nd_users_exact"),
        (
            F.abs(F.col("nd_approx") - F.col("nd_exact"))
            <= F.lit(0.15) * F.col("nd_exact")
        ).cast("long").alias("hll_within_3rsd"),
    )


# ---------------------------------------------------------------------------
# pr09 — approx_percentile sketch. Spark's quantile summary and
# DuckDB's approx_quantile use different sketches, so the estimates
# can't be hashed across engines — instead the query certifies the
# sketch IN-ENGINE: it computes the exact percentiles (hashable,
# DuckDB quantile_cont twin) AND, for each approx value, its exact
# rank window in the group (count <, count ≤ via one broadcast join
# back onto the rows), emitting a rank-error-within-ε flag per
# quantile. A sketch outside its documented ε = 1/accuracy rank
# bound flips the flag and fails the hash gate.


@register(
    "pr09_approx_event_percentiles",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       quantile_cont(cents, 0.5) AS p50_exact,
       quantile_cont(cents, 0.9) AS p90_exact,
       quantile_cont(cents, 0.99) AS p99_exact,
       CAST(1 AS BIGINT) AS p50_rank_ok,
       CAST(1 AS BIGINT) AS p90_rank_ok,
       CAST(1 AS BIGINT) AS p99_rank_ok
FROM (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL)
GROUP BY event_type
""",
)
def _q_approx_percentiles(spark, sf_dir):
    """Per-event-type approximate p50/p90/p99 of value cents via
    approx_percentile(accuracy=10000), certified against the exact
    side in one query. The 100 TB story: the exact percentile needs a
    per-group sort (or a full collect_list); the sketch is a
    fixed-size mergeable summary built map-side, so the shuffle
    carries kilobytes per group instead of the group's rows. The
    rank check joins the per-group approx values (a few rows,
    broadcast) back onto the events scan and counts, exactly, how
    many values fall strictly below / at-or-below each approx value;
    the sketch's contract is that the approx value's rank window
    overlaps [⌈(q-ε)·n⌉, ⌈(q+ε)·n⌉] with ε = 1/accuracy (±1 row of
    floor/ceil slack). pr03 documents the exact path for bounded
    groups; this is the unbounded-cardinality path."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cents_df = ev.select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    eps = 1.0 / 10000
    appr = cents_df.groupBy("event_type").agg(
        F.percentile_approx("cents", [0.5, 0.9, 0.99], 10000).alias("p")
    ).select(
        "event_type",
        F.col("p")[0].alias("a50"),
        F.col("p")[1].alias("a90"),
        F.col("p")[2].alias("a99"),
    )
    j = cents_df.join(F.broadcast(appr), "event_type")
    ranked = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            agg
            for q in (50, 90, 99)
            for agg in (
                F.sum((F.col("cents") < F.col(f"a{q}")).cast("long")).alias(f"lt{q}"),
                F.sum((F.col("cents") <= F.col(f"a{q}")).cast("long")).alias(f"le{q}"),
            )
        ],
    )

    def rank_ok(q: float, tag: int):
        lo = F.floor((F.lit(q) - F.lit(eps)) * F.col("n")) - F.lit(1)
        hi = F.ceil((F.lit(q) + F.lit(eps)) * F.col("n")) + F.lit(1)
        return (
            (F.col(f"le{tag}") >= lo) & (F.col(f"lt{tag}") <= hi)
        ).cast("long").alias(f"p{tag}_rank_ok")

    exact = cents_df.groupBy("event_type").agg(
        *[
            F.expr(f"percentile(cents, {q})").alias(f"p{int(q * 100)}_exact")
            for q in (0.5, 0.9, 0.99)
        ]
    )
    return (
        ranked.join(exact, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            "p50_exact",
            "p90_exact",
            "p99_exact",
            rank_ok(0.5, 50),
            rank_ok(0.9, 90),
            rank_ok(0.99, 99),
        )
    )


# ---------------------------------------------------------------------------
# pr11 — OLS sufficient statistics (exact-integer linear regression)


@register(
    "pr11_ols_sufficient_stats",
    """
WITH s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
           CAST(SUM(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
           CAST(SUM(CAST(floor(l_quantity) AS BIGINT)
                    * CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy,
           CAST(SUM(CAST(floor(l_quantity) AS BIGINT)
                    * CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sxx
    FROM lineitem
)
SELECT n, sx, sy, sxy, sxx,
       CAST(CAST(n AS DECIMAL(19,0)) * CAST(sxy AS DECIMAL(19,0))
            - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
            AS VARCHAR) AS slope_num,
       CAST(CAST(n AS DECIMAL(19,0)) * CAST(sxx AS DECIMAL(19,0))
            - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
            AS VARCHAR) AS slope_den
FROM s
""",
)
def _q_ols_stats(spark, sf_dir):
    """Distributed least squares the way it actually scales: the model
    is a RATIO OF SUMS, so one map-side-combined aggregate over
    (n, Σx, Σy, Σxy, Σx²) IS the fit — no iterations, no driver data.
    Slope ships as an exact integer numerator/denominator pair
    (n·Σxy − ΣxΣy) / (n·Σx² − (Σx)²): the single float division is
    the caller's, keeping the oracle bit-exact. Same pattern extends
    to any GLM sufficient statistic.

    Overflow discipline (found by the 10× scale sweep, round 7: the
    BIGINT product n·Σxy overflowed at 6M rows): the derived num/den
    grow ~quadratically in n, so they are computed in DECIMAL(38,0)
    — exact to 10³⁸, map-side math unchanged — and emitted as DIGIT
    STRINGS, because decimal(38) survives neither engine's pandas
    bridge exactly (DuckDB renders every decimal as float64; 2⁵³
    truncation would corrupt the driver hash). The five BIGINT sums
    themselves are linear in n and hold to ~10¹² rows at these value
    magnitudes; past that Spark's ANSI sum fails loudly, and the fix
    is lifting the per-row products to decimal too."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.floor(F.col("l_quantity")).cast("long")
    y = F.floor(F.col("l_extendedprice")).cast("long")
    s = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x * y).cast("long").alias("sxy"),
        F.sum(x * x).cast("long").alias("sxx"),
    )
    d = "decimal(19,0)"

    def _dec(c):
        return F.col(c).cast(d)

    return s.select(
        "n", "sx", "sy", "sxy", "sxx",
        (_dec("n") * _dec("sxy") - _dec("sx") * _dec("sy"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("slope_num"),
        (_dec("n") * _dec("sxx") - _dec("sx") * _dec("sx"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("slope_den"),
    )


# ---------------------------------------------------------------------------
# pr13 — referential-integrity / FK-orphan audit across the star schema

#: (fk_name, fact table, fk column, dim table, pk column)
_FK_SPECS = [
    ("lineitem.l_orderkey -> orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey -> part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey -> supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey -> customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey -> nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey -> nation.n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey -> region.r_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
    ("events.user_id -> customer.c_custkey", "events", "user_id", "customer", "c_custkey"),
]


def _fk_arm(fk_name: str, fact: str, fk: str, dim: str, pk: str) -> str:
    return f"""
SELECT '{fk_name}' AS fk_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(CASE WHEN d.k IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_orphans
FROM (SELECT CAST({fk} AS BIGINT) AS k FROM {fact} WHERE {fk} IS NOT NULL) f
LEFT JOIN (SELECT DISTINCT CAST({pk} AS BIGINT) AS k FROM {dim}) d USING (k)"""


@register(
    "pr13_fk_orphans",
    "\nUNION ALL\n".join(_fk_arm(*s) for s in _FK_SPECS),
)
def _q_fk_orphans(spark, sf_dir):
    """Referential-integrity audit over every FK edge of the star
    schema (profiling.fk_orphan_audit): per edge, how many non-null
    fact keys have no dimension match — the data-quality shape the
    pr07 expectation report doesn't cover (it validates values in
    isolation; this validates RELATIONSHIPS). Fact sides are reduced
    to distinct (key, count) before the join, so at 100 TB each edge
    costs one map-side-combined agg plus a key-join AQE can broadcast
    (every dim here is small); no row-level join anywhere."""
    from tabular_to_parquet_spark.operators.profiling import fk_orphan_audit

    t = {name: load_table(spark, sf_dir, name)
         for name in ("lineitem", "orders", "part", "supplier",
                      "customer", "nation", "region", "events")}
    specs = [(n, t[fact], fk, t[dim], pk) for n, fact, fk, dim, pk in _FK_SPECS]
    return fk_orphan_audit(specs)


# ---------------------------------------------------------------------------
# pr14 — equi-depth histogram from exact octile edges

_ED_BINS = 8


@register(
    "pr14_equi_depth_histogram",
    f"""
WITH t AS (
    SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v FROM orders
    WHERE o_totalprice IS NOT NULL
),
b AS (
    SELECT {", ".join(f"quantile_cont(v, {i}.0/{_ED_BINS}) AS e{i}" for i in range(1, _ED_BINS))}
    FROM t
)
SELECT CAST(1 + {" + ".join(f"(v > e{i})::INT" for i in range(1, _ED_BINS))} AS BIGINT)
           AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(v) AS BIGINT) AS min_value,
       CAST(MAX(v) AS BIGINT) AS max_value,
       CAST(SUM(v) AS BIGINT) AS sum_value
FROM t, b
GROUP BY 1
""",
)
def _q_equi_depth(spark, sf_dir):
    """8-bin equi-depth histogram of order totals in integer cents
    (profiling.equi_depth_histogram): exact octile edges from ONE
    percentile aggregate broadcast as a scalar row, bin assignment a
    pure comparison projection, stats one bounded-key hash agg — the
    equal-frequency companion to pr02's fixed-width histogram, with
    no global sort or ntile anywhere. Dyadic q = i/8 keeps the
    interpolated edges bit-identical across engines (the pl25
    argument); at 100 TB swap percentile for approx_percentile."""
    from tabular_to_parquet_spark.operators.profiling import equi_depth_histogram

    orders = load_table(spark, sf_dir, "orders")
    return equi_depth_histogram(
        orders, F.floor(F.col("o_totalprice") * 100).cast("long"), _ED_BINS
    )


# ---------------------------------------------------------------------------
# pr15 — key-uniqueness audit (the PK half of pr13's FK audit)

#: (key_name, table, key expression — dialect-shared SQL text)
_UK_SPECS = [
    ("orders.o_orderkey", "orders", "o_orderkey"),
    ("customer.c_custkey", "customer", "c_custkey"),
    ("part.p_partkey", "part", "p_partkey"),
    ("supplier.s_suppkey", "supplier", "s_suppkey"),
    ("nation.n_nationkey", "nation", "n_nationkey"),
    ("region.r_regionkey", "region", "r_regionkey"),
    ("events.event_id", "events", "event_id"),
    ("documents.doc_id", "documents", "doc_id"),
    ("embeddings.vec_id", "embeddings", "vec_id"),
    # lineitem has NO unique key in the synthetic data (TESTDATA /
    # harness note) — auditing its usual candidate makes the report
    # value-rich: n_dup_keys > 0 is a real finding, not a fixture
    ("lineitem.(l_orderkey,l_linenumber)", "lineitem",
     "l_orderkey * 10 + l_linenumber"),
]


def _uk_arm(key_name: str, table: str, key: str) -> str:
    return f"""
SELECT '{key_name}' AS key_name,
       CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(COALESCE(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_dup_keys,
       CAST(COALESCE(MAX(n), 0) AS BIGINT) AS max_multiplicity
FROM (SELECT CAST({key} AS BIGINT) AS k, COUNT(*) AS n
      FROM {table} GROUP BY 1) g"""


@register(
    "pr15_key_uniqueness",
    "\nUNION ALL\n".join(_uk_arm(*s) for s in _UK_SPECS),
)
def _q_key_uniqueness(spark, sf_dir):
    """Key-uniqueness audit over every declared key of the star
    schema plus lineitem's (orderkey, linenumber) candidate — which
    is NOT unique in the synthetic data, so the report demonstrates a
    real dup finding. Per table: one map-side-combined groupBy to
    (key, count), then a single-row summary — at 100 TB each audit
    costs one shuffle of distinct keys, nothing row-level."""
    from tabular_to_parquet_spark.operators.profiling import key_uniqueness_audit

    tables = {t for _, t, _ in _UK_SPECS}
    loaded = {t: load_table(spark, sf_dir, t) for t in tables}
    specs = []
    for key_name, table, key in _UK_SPECS:
        specs.append((key_name, loaded[table], F.expr(key).cast("long")))
    return key_uniqueness_audit(specs)


# ---------------------------------------------------------------------------
# pr16 — per-group column profile (segmented data health)

_GP_COLS = ["user_id", "props"]


def _gp_arm(c: str) -> str:
    return f"""
SELECT event_type AS group_key, '{c}' AS col_name,
       CAST(COUNT({c}) AS BIGINT) AS n_values,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       MIN({c})::VARCHAR AS min_value,
       MAX({c})::VARCHAR AS max_value
FROM events GROUP BY event_type"""


@register(
    "pr16_grouped_profile",
    "\nUNION ALL\n".join(_gp_arm(c) for c in _GP_COLS),
)
def _q_grouped_profile(spark, sf_dir):
    """pr01's column profile segmented per event type
    (profiling.profile_table_grouped): the per-source data-health
    matrix a pipeline dashboards — every (group, column) row carries
    value/null/distinct counts and min/max. Integer/varchar columns
    only in the gate (double min/max STRING rendering differs across
    engines — the pr01 rule); the operator itself profiles any
    type."""
    from tabular_to_parquet_spark.operators.profiling import profile_table_grouped

    events = load_table(spark, sf_dir, "events")
    return profile_table_grouped(events, "event_type", _GP_COLS)


# ---------------------------------------------------------------------------
# pr17 — MAD robust outliers (the breakdown-resistant twin of pr06)


@register(
    "pr17_mad_outliers",
    """
WITH t AS (
    SELECT event_type AS g, CAST(floor(value * 100) AS BIGINT) AS v
    FROM events WHERE value IS NOT NULL
),
med AS (SELECT g, quantile_cont(v, 0.5) AS med FROM t GROUP BY g),
dev AS (SELECT t.g, t.v, med.med, ABS(t.v - med.med) AS ad
        FROM t JOIN med ON t.g = med.g),
mad AS (SELECT g, ANY_VALUE(med) AS med, quantile_cont(ad, 0.5) AS mad
        FROM dev GROUP BY g)
SELECT dev.g AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ANY_VALUE(mad.med) AS med,
       ANY_VALUE(mad.mad) AS mad,
       CAST(SUM(CASE WHEN dev.ad > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
FROM dev JOIN mad ON dev.g = mad.g
GROUP BY dev.g
""",
)
def _q_mad_outliers(spark, sf_dir):
    """Median/MAD robust outlier audit of event cents per type
    (profiling.mad_outliers): the pr06 z-score audit breaks down when
    the contamination it hunts moves the mean — MAD's 50% breakdown
    point doesn't. q=0.5 interpolation over integer cents is exact
    dyadic (.0/.5 values), |x−med| and the 3·MAD comparison stay
    dyadic-exact, so every count and both statistics hash-match."""
    from tabular_to_parquet_spark.operators.profiling import mad_outliers

    events = load_table(spark, sf_dir, "events")
    return mad_outliers(
        events, F.floor(F.col("value") * 100).cast("long"), "event_type"
    ).withColumnRenamed("g", "event_type")


# ---------------------------------------------------------------------------
# pr18 — two-sample distribution drift (log-free PSI twin)

_DRIFT_SPLIT = "2024-01-15"


@register(
    "pr18_distribution_drift",
    f"""
WITH t AS (
    SELECT event_type,
           CAST(CASE WHEN value < 0 THEN -1
                     WHEN value >= 500 THEN 25
                     ELSE floor(value / 20.0)
                END AS BIGINT) AS bin,
           CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 0 ELSE 1 END AS late
    FROM events WHERE value IS NOT NULL
),
b AS (
    SELECT event_type, bin,
           CAST(SUM(1 - late) AS BIGINT) AS n_early,
           CAST(SUM(late) AS BIGINT) AS n_late
    FROM t GROUP BY 1, 2
),
tot AS (
    SELECT event_type,
           SUM(n_early) AS t_early, SUM(n_late) AS t_late
    FROM b GROUP BY 1
)
SELECT b.event_type, b.bin, b.n_early, b.n_late,
       CAST(ABS(b.n_early * tot.t_late - b.n_late * tot.t_early) AS BIGINT)
           AS l1_num
FROM b JOIN tot ON b.event_type = tot.event_type
""",
)
def _q_distribution_drift(spark, sf_dir):
    """Two-sample distribution drift per event type: the value
    histogram before vs after a fixed split date, with the exact
    integer L1-drift numerator |n_e·T_l − n_l·T_e| per bin (divide by
    T_e·T_l once at the consumer for the rate-difference — log-free,
    unlike PSI, so it stays in the deterministic cross-engine
    intersection). One scan, one (type, bin) hash agg, one bounded
    per-type totals join (AQE broadcasts it). At 100 TB the products
    follow the r7 agg×agg rule: lift to DECIMAL(38,0)/digit strings
    once counts can exceed ~3·10⁹."""
    events = load_table(spark, sf_dir, "events")
    late = (F.col("ts") >= F.lit(_DRIFT_SPLIT).cast("timestamp")).cast("int")
    t = events.where(F.col("value").isNotNull()).select(
        "event_type",
        F.when(F.col("value") < 0, F.lit(-1))
        .when(F.col("value") >= 500, F.lit(25))
        .otherwise(F.floor(F.col("value") / 20.0))
        .cast("long")
        .alias("bin"),
        late.alias("late"),
    )
    b = t.groupBy("event_type", "bin").agg(
        F.sum(F.lit(1) - F.col("late")).cast("long").alias("n_early"),
        F.sum("late").cast("long").alias("n_late"),
    )
    tot = b.groupBy("event_type").agg(
        F.sum("n_early").alias("t_early"), F.sum("n_late").alias("t_late")
    )
    return (
        b.join(tot, "event_type")
        .select(
            "event_type", "bin", "n_early", "n_late",
            F.abs(
                F.col("n_early") * F.col("t_late")
                - F.col("n_late") * F.col("t_early")
            ).cast("long").alias("l1_num"),
        )
    )


# ---------------------------------------------------------------------------
# pr19 — shuffle/join-key skew audit (the pre-salting measurement)

#: (key_name, table, key column) — the shuffle keys the engine's own
#: joins and aggregations hash on, so the audit reads as a shuffle plan
_SKEW_SPECS = [
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("events.user_id", "events", "user_id"),
    ("events.event_type", "events", "event_type"),
]


def _skew_arm(key_name: str, table: str, key: str) -> str:
    return f"""
SELECT '{key_name}' AS key_name,
       CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(COALESCE(MAX(n), 0) AS BIGINT) AS max_cnt,
       quantile_cont(n, 0.5) AS median_cnt,
       CAST(CAST(COALESCE(MAX(n), 0) AS DECIMAL(19,0))
            * CAST(COUNT(*) AS DECIMAL(19,0)) AS VARCHAR) AS skew_num
FROM (SELECT {key} AS k, COUNT(*) AS n FROM {table}
      WHERE {key} IS NOT NULL GROUP BY 1) g"""


@register(
    "pr19_key_skew_audit",
    "\nUNION ALL\n".join(_skew_arm(*s) for s in _SKEW_SPECS),
)
def _q_key_skew(spark, sf_dir):
    """Shuffle-key skew audit over the engine's own join/agg keys
    (profiling.key_skew_audit): per key column, the per-key count
    distribution — n_rows/n_keys/max_cnt, the exact dyadic median
    count, and the skew factor max·n_keys as an exact digit string
    (÷ n_rows at the consumer = hottest-key-to-mean ratio). This is
    the measurement that justifies salting (operators/skew.py) or an
    AQE skew split BEFORE a 100 TB shuffle stalls on one reducer;
    each arm costs one map-side-combined groupBy of the distinct
    keys, nothing row-level leaves the scan."""
    tables = {t for _, t, _ in _SKEW_SPECS}
    loaded = {t: load_table(spark, sf_dir, t) for t in tables}
    specs = [(n, loaded[t], F.col(k)) for n, t, k in _SKEW_SPECS]
    return pr.key_skew_audit(specs)


# ---------------------------------------------------------------------------
# pr20 — winsorized stats (the trimmed-estimator robust summary)


@register(
    "pr20_winsorized_stats",
    """
WITH t AS (
    SELECT event_type AS g, CAST(floor(value * 100) AS BIGINT) AS v
    FROM events WHERE value IS NOT NULL
),
e AS (
    SELECT g, quantile_cont(v, 0.125) AS lo, quantile_cont(v, 0.875) AS hi
    FROM t GROUP BY g
)
SELECT t.g AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ANY_VALUE(e.lo) AS lo,
       ANY_VALUE(e.hi) AS hi,
       CAST(SUM(CASE WHEN t.v < e.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN t.v > e.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       CAST(SUM(CAST(GREATEST(e.lo, LEAST(e.hi, t.v::DOUBLE)) * 8
                     AS BIGINT)) AS BIGINT) AS sum8x
FROM t JOIN e ON t.g = e.g
GROUP BY t.g
""",
)
def _q_winsorized(spark, sf_dir):
    """Winsorized event-cents summary per type
    (profiling.winsorized_stats): values clamped into the exact
    [1/8, 7/8] quantile band before aggregating — the trimmed
    estimator that SUMMARIZES tail-contaminated data (pr06 flags
    tails, pr17 resists them, this reports through them). Dyadic
    edges are bit-identical across engines; the clamped sum ships as
    Σ(8·clamped) in BIGINT (≤3 fractional bits, exact), one division
    by 8n at the consumer. One percentile agg over bounded keys
    broadcast onto one scan."""
    events = load_table(spark, sf_dir, "events")
    return pr.winsorized_stats(
        events, F.floor(F.col("value") * 100).cast("long"), "event_type"
    )


# ---------------------------------------------------------------------------
# pr21 — correlation matrix from ONE scan of sufficient statistics


@register(
    "pr21_corr_matrix",
    """
WITH s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(p) AS BIGINT) AS sp,
           CAST(SUM(d) AS BIGINT) AS sd,
           CAST(SUM(q * q) AS BIGINT) AS sqq,
           CAST(SUM(p * p) AS BIGINT) AS spp,
           CAST(SUM(d * d) AS BIGINT) AS sdd,
           CAST(SUM(q * p) AS BIGINT) AS sqp,
           CAST(SUM(q * d) AS BIGINT) AS sqd,
           CAST(SUM(p * d) AS BIGINT) AS spd
    FROM (SELECT CAST(floor(l_quantity) AS BIGINT) AS q,
                 CAST(floor(l_extendedprice) AS BIGINT) AS p,
                 CAST(floor(l_discount * 100) AS BIGINT) AS d
          FROM lineitem)
)
SELECT 'quantity' AS x_name, 'extendedprice' AS y_name, n,
       sq AS sx, sp AS sy,
       CAST(CAST(n AS DECIMAL(19,0)) * CAST(sqp AS DECIMAL(19,0))
            - CAST(sq AS DECIMAL(19,0)) * CAST(sp AS DECIMAL(19,0))
            AS VARCHAR) AS cov_num,
       CAST(CAST(n AS DECIMAL(19,0)) * CAST(sqq AS DECIMAL(19,0))
            - CAST(sq AS DECIMAL(19,0)) * CAST(sq AS DECIMAL(19,0))
            AS VARCHAR) AS varx_num,
       CAST(CAST(n AS DECIMAL(19,0)) * CAST(spp AS DECIMAL(19,0))
            - CAST(sp AS DECIMAL(19,0)) * CAST(sp AS DECIMAL(19,0))
            AS VARCHAR) AS vary_num
FROM s
UNION ALL
SELECT 'quantity', 'discount', n, sq, sd,
       CAST(CAST(n AS DECIMAL(19,0)) * CAST(sqd AS DECIMAL(19,0))
            - CAST(sq AS DECIMAL(19,0)) * CAST(sd AS DECIMAL(19,0))
            AS VARCHAR),
       CAST(CAST(n AS DECIMAL(19,0)) * CAST(sqq AS DECIMAL(19,0))
            - CAST(sq AS DECIMAL(19,0)) * CAST(sq AS DECIMAL(19,0))
            AS VARCHAR),
       CAST(CAST(n AS DECIMAL(19,0)) * CAST(sdd AS DECIMAL(19,0))
            - CAST(sd AS DECIMAL(19,0)) * CAST(sd AS DECIMAL(19,0))
            AS VARCHAR)
FROM s
UNION ALL
SELECT 'extendedprice', 'discount', n, sp, sd,
       CAST(CAST(n AS DECIMAL(19,0)) * CAST(spd AS DECIMAL(19,0))
            - CAST(sp AS DECIMAL(19,0)) * CAST(sd AS DECIMAL(19,0))
            AS VARCHAR),
       CAST(CAST(n AS DECIMAL(19,0)) * CAST(spp AS DECIMAL(19,0))
            - CAST(sp AS DECIMAL(19,0)) * CAST(sp AS DECIMAL(19,0))
            AS VARCHAR),
       CAST(CAST(n AS DECIMAL(19,0)) * CAST(sdd AS DECIMAL(19,0))
            - CAST(sd AS DECIMAL(19,0)) * CAST(sd AS DECIMAL(19,0))
            AS VARCHAR)
FROM s
""",
)
def _q_corr_matrix(spark, sf_dir):
    """Full pairwise correlation structure of three lineitem measures
    from ONE scan: a single map-side-combined aggregate collects every
    sufficient statistic (n, the three sums, three square-sums, three
    cross-sums), then each pair's covariance and variance NUMERATORS
    (n·Σxy − ΣxΣy, n·Σx² − (Σx)²) come from the one-row frame — the
    matrix generalization of pr11's single fit: k columns cost k(k+1)/2
    sums in the same pass, never k² scans. corr = cov/√(varx·vary) is
    the consumer's; the numerators ship as exact DECIMAL(38,0) digit
    strings per the agg×agg overflow rule. Integer units as in pr11
    (whole quantity/price, discount cents)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.floor(F.col("l_quantity")).cast("long")
    p = F.floor(F.col("l_extendedprice")).cast("long")
    dd = F.floor(F.col("l_discount") * 100).cast("long")
    s = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(q).cast("long").alias("sq"),
        F.sum(p).cast("long").alias("sp"),
        F.sum(dd).cast("long").alias("sd"),
        F.sum(q * q).cast("long").alias("sqq"),
        F.sum(p * p).cast("long").alias("spp"),
        F.sum(dd * dd).cast("long").alias("sdd"),
        F.sum(q * p).cast("long").alias("sqp"),
        F.sum(q * dd).cast("long").alias("sqd"),
        F.sum(p * dd).cast("long").alias("spd"),
    )
    d19 = "decimal(19,0)"

    def _num(cn, cxy, cx, cy):
        return (
            (F.col(cn).cast(d19) * F.col(cxy).cast(d19)
             - F.col(cx).cast(d19) * F.col(cy).cast(d19))
            .cast("decimal(38,0)")
            .cast("string")
        )

    def _arm(xn, yn, sx, sy, sxy, sxx, syy):
        return s.select(
            F.lit(xn).alias("x_name"), F.lit(yn).alias("y_name"), "n",
            F.col(sx).alias("sx"), F.col(sy).alias("sy"),
            _num("n", sxy, sx, sy).alias("cov_num"),
            _num("n", sxx, sx, sx).alias("varx_num"),
            _num("n", syy, sy, sy).alias("vary_num"),
        )

    return (
        _arm("quantity", "extendedprice", "sq", "sp", "sqp", "sqq", "spp")
        .unionByName(_arm("quantity", "discount", "sq", "sd", "sqd", "sqq", "sdd"))
        .unionByName(_arm("extendedprice", "discount", "sp", "sd", "spd", "spp", "sdd"))
    )
