"""Adapted TPC-H analytics suite (h02–h22) over the driver's
TPC-H-ish tables.

The testdata schema is a subset of real TPC-H (TESTDATA.md): there is
no ``partsupp`` table and no ``l_commitdate``/``l_receiptdate``/
``l_shipmode``/``c_phone``/comment columns, so every query whose
reference formulation touches those is ADAPTED — same join/aggregate
shape and intent, substitute predicates on the columns that exist
(lateness = ``l_shipdate`` vs ``o_orderdate``; cost proxies from
``p_retailprice`` / observed unit prices; country codes from
``c_nationkey``).  Q1 is already covered by ``a1_pricing_summary``.

Cross-engine determinism (catalog.py design rules):

- Money aggregates sum per-row integer cents
  (``floor(expr * 100) → BIGINT``) — order-independent.  The per-row
  float expression is written with the same association on both
  engines, so its one double result is bit-identical.
- ``l_quantity`` is integral in the data (checked) → summed as BIGINT.
- Every LIMIT is preceded by a total order with a unique-key
  tiebreak, so both engines pick the same rows.
- Ratios are a single double division of two exact integers (one
  IEEE rounding).

Scale notes (100 TB): ``nation``/``region`` are fixed-size (25/5
rows) and always broadcast.  ``supplier``/``part``/``customer`` grow
with SF, so they join shuffled unless a filter makes them small — AQE
converts those at runtime; the plans below only hard-code broadcasts
that are size-bounded by the schema.  Fact-side filters are plain
column predicates that reach the parquet scan (PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from tabular_to_parquet_spark.parity.catalog import register
from tabular_to_parquet_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# shared fragments

#: per-row revenue cents — identical association on both engines:
#: ((l_extendedprice * (1 - l_discount)) * 100), floor, int64
_REV_SQL = "CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


def _rev_cents() -> F.Column:
    return F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100.0)
    ).cast("long")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# h02 — min-cost supplier (Q2 adapted: no partsupp; "cost" is the
# minimum observed unit sell price from lineitem)


def _q_h02(spark, sf_dir):
    """For STANDARD-type parts, the EUROPE supplier with the lowest
    observed unit price (min over lineitem of extendedprice/quantity).

    Plan: lineitem ⨝ filtered part ⨝ supplier ⨝ broadcast(nation ⨝
    region).  MIN of per-row integer cents is order-independent; the
    arg-min supplier is picked by a per-part window with s_suppkey
    tiebreak (row_number, partition = p_partkey — bounded by the
    supplier count per part, never a global sort)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    unit_cents = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * F.lit(100.0)
    ).cast("long")
    per_ps = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(euro_supp, li.l_suppkey == euro_supp.s_suppkey)
        .groupBy("p_partkey", "s_suppkey", "s_name")
        .agg(F.min(unit_cents).alias("cost_cents"))
    )
    w = W.partitionBy("p_partkey").orderBy("cost_cents", "s_suppkey")
    return (
        per_ps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "s_name", "cost_cents")
    )


register("h02_min_cost_supplier", f"""
WITH per_ps AS (
    SELECT p_partkey, s_suppkey, s_name,
           MIN(CAST(floor(l_extendedprice / l_quantity * 100) AS BIGINT))
               AS cost_cents
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
    GROUP BY p_partkey, s_suppkey, s_name
)
SELECT p_partkey, s_name, cost_cents
FROM (SELECT *, row_number() OVER (PARTITION BY p_partkey
                                   ORDER BY cost_cents, s_suppkey) AS rn
      FROM per_ps)
WHERE rn = 1
""")(_q_h02)


# ---------------------------------------------------------------------------
# h03 — shipping priority (Q3: top unshipped-revenue orders)


def _q_h03(spark, sf_dir):
    """Top-10 BUILDING-segment orders by open revenue at 1998-03-15.

    customer is filtered 1/5 before the join; the final top-10 plans
    as TakeOrderedAndProject (no global sort materialization) with a
    unique l_orderkey tiebreak so the boundary is deterministic."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _ts("1998-03-15"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _ts("1998-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey"), orders.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), "l_orderkey")
        .limit(10)
    )


register("h03_shipping_priority", f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
WHERE l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
""")(_q_h03)


# ---------------------------------------------------------------------------
# h04 — order priority checking (Q4 adapted: lateness from shipdate)


def _q_h04(spark, sf_dir):
    """Orders in 1997Q3 with at least one line shipped >60 days after
    the order date, counted per priority.  EXISTS → LEFT SEMI join on
    the order key with the lateness predicate in the join condition
    (one shuffle on the key; the semi join short-circuits per key)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-07-01"))
        & (F.col("o_orderdate") < _ts("1997-10-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )


register("h04_priority_late_orders", """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""")(_q_h04)


# ---------------------------------------------------------------------------
# h05 — local supplier volume (Q5)


def _q_h05(spark, sf_dir):
    """1997 revenue in ASIA where the supplier and customer share a
    nation.  nation/region broadcast (fixed 25/5 rows at any SF);
    customer⨝supplier equality rides the same row so it is a filter,
    not an extra shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
    )


register("h05_local_supplier_volume", f"""
SELECT n_name, CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""")(_q_h05)


# ---------------------------------------------------------------------------
# h06 — forecast revenue change (Q6)


def _q_h06(spark, sf_dir):
    """Pure scan-aggregate: all three predicates push to the parquet
    scan; the aggregate is a one-row partial+final combine.  The
    discount bounds compare doubles both engines read from the same
    parquet bits."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    disc_cents = F.floor(
        F.col("l_extendedprice") * F.col("l_discount") * F.lit(100.0)
    ).cast("long")
    return li.agg(
        F.coalesce(F.sum(disc_cents), F.lit(0)).cast("long").alias("revenue_cents"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


register("h06_forecast_revenue", """
SELECT CAST(COALESCE(SUM(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)), 0) AS BIGINT)
           AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""")(_q_h06)


# ---------------------------------------------------------------------------
# h07 — volume shipping between two nations (Q7)


def _q_h07(spark, sf_dir):
    """Bilateral NATION_1↔NATION_2 trade by ship year.  The nation
    names resolve through two broadcast copies of the 25-row nation
    table; the (supp, cust) pair filter keeps only the two cross
    directions."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("cn_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(F.sum(_rev_cents()).alias("revenue_cents"))


register("h07_bilateral_volume", f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cents
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           l_extendedprice, l_discount
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
""")(_q_h07)


# ---------------------------------------------------------------------------
# h08 — national market share (Q8)


def _q_h08(spark, sf_dir):
    """NATION_3's share of ECONOMY-part revenue sold into EUROPE per
    order year.  Share = one double division of two exact integer
    cent sums (conditional sum for the numerator — no second join
    pass)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nat_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    nat_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    j = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat_c), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(reg), F.col("cn_region") == reg.r_regionkey)
        .join(F.broadcast(nat_s), supp.s_nationkey == F.col("sn_key"))
    )
    rev = _rev_cents()
    agg = j.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0)))
        .cast("long")
        .alias("nation_cents"),
        F.sum(rev).cast("long").alias("total_cents"),
    )
    return agg.select(
        "o_year",
        "nation_cents",
        "total_cents",
        (F.col("nation_cents").cast("double") / F.col("total_cents")).alias("mkt_share"),
    )


register("h08_market_share", f"""
SELECT o_year, nation_cents, total_cents,
       CAST(nation_cents AS DOUBLE) / total_cents AS mkt_share
FROM (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN n1.n_name = 'NATION_3' THEN {_REV_SQL} ELSE 0 END) AS BIGINT)
               AS nation_cents,
           CAST(SUM({_REV_SQL}) AS BIGINT) AS total_cents
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'EUROPE'
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    GROUP BY 1
)
""")(_q_h08)


# ---------------------------------------------------------------------------
# h09 — product type profit (Q9 adapted: cost proxy from retail price)


def _q_h09(spark, sf_dir):
    """Profit per supplier nation per year for widget parts, with
    supply cost proxied as 10% of retail price per unit (no partsupp
    in the schema).  The per-row profit double is one expression tree
    evaluated identically on both engines, floored to cents before
    the order-independent integer sum."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nat = _t(spark, sf_dir, "nation")
    profit_cents = F.floor(
        (
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            - F.col("p_retailprice") * F.lit(0.1) * F.col("l_quantity")
        )
        * F.lit(100.0)
    ).cast("long")
    return (
        li.join(part.select("p_partkey", "p_retailprice"), li.l_partkey == F.col("p_partkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit_cents).alias("profit_cents"))
    )


register("h09_product_profit", """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount)
                            - p_retailprice * 0.1 * l_quantity) * 100) AS BIGINT)) AS BIGINT)
           AS profit_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
""")(_q_h09)


# ---------------------------------------------------------------------------
# h10 — returned item reporting (Q10)


def _q_h10(spark, sf_dir):
    """Top-20 customers by revenue lost to returns in 1997Q4.
    Aggregation key is the full customer tuple (same cardinality as
    c_custkey — no extra shuffle); top-20 is TakeOrderedAndProject
    with the unique custkey tiebreak."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-10-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), "c_custkey")
        .limit(20)
    )


register("h10_returned_items", f"""
SELECT c_custkey, c_name, n_name,
       CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
""")(_q_h10)


# ---------------------------------------------------------------------------
# h11 — important part value (Q11 adapted: shipped value, no partsupp)


def _q_h11(spark, sf_dir):
    """Parts whose NATION_7-supplied shipped value exceeds 0.1% of the
    total.  The scalar total is a one-row aggregate broadcast into the
    HAVING filter (crossJoin of a 1-row frame — no driver collect, no
    second scan of the grouped data)."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    j = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
    )
    per_part = j.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("value_cents")
    )
    total = per_part.agg(F.sum("value_cents").alias("_total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents").cast("double") > F.col("_total") * 0.001)
        .select("l_partkey", "value_cents")
    )


register("h11_important_parts", """
WITH per_part AS (
    SELECT l_partkey,
           CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
    GROUP BY l_partkey
)
SELECT l_partkey, value_cents
FROM per_part
WHERE CAST(value_cents AS DOUBLE) > (SELECT SUM(value_cents) FROM per_part) * 0.001
""")(_q_h11)


# ---------------------------------------------------------------------------
# h12 — shipping lateness vs priority (Q12 adapted: no shipmode)


def _q_h12(spark, sf_dir):
    """1997 lines bucketed by lateness (shipped >90 days after the
    order), counting critical- vs normal-priority orders — Q12's
    shape with lateness standing in for ship mode."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    bucket = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.lit("late"),
    ).otherwise(F.lit("ontime"))
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(bucket.alias("ship_bucket")).agg(
        F.sum(F.when(crit, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(~crit, 1).otherwise(0)).cast("long").alias("low_line_count"),
    )


register("h12_lateness_priority", """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
            THEN 'late' ELSE 'ontime' END AS ship_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
""")(_q_h12)


# ---------------------------------------------------------------------------
# h13 — customer order-count distribution (Q13)


def _q_h13(spark, sf_dir):
    """Two-level aggregate: orders per customer (left join keeps
    zero-order customers, non-'P' orders only), then customers per
    order count.  Second aggregate's key domain is tiny (≤ max order
    count) so the second shuffle is trivial."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


register("h13_order_count_distribution", """
WITH per_cust AS (
    SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'P'
    GROUP BY c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
""")(_q_h13)


# ---------------------------------------------------------------------------
# h14 — promotion effect (Q14)


def _q_h14(spark, sf_dir):
    """PROMO-part revenue share for one ship month: conditional sum in
    a single pass; the share is one double division of two exact
    integers."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    part = _t(spark, sf_dir, "part")
    rev = _rev_cents()
    agg = li.join(part.select("p_partkey", "p_type"), li.l_partkey == F.col("p_partkey")).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
        .cast("long")
        .alias("promo_cents"),
        F.sum(rev).cast("long").alias("total_cents"),
    )
    return agg.select(
        "promo_cents",
        "total_cents",
        (F.lit(100.0) * F.col("promo_cents") / F.col("total_cents")).alias("promo_share"),
    )


register("h14_promo_effect", f"""
SELECT promo_cents, total_cents,
       100.0 * promo_cents / total_cents AS promo_share
FROM (
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END) AS BIGINT)
               AS promo_cents,
           CAST(SUM({_REV_SQL}) AS BIGINT) AS total_cents
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
)
""")(_q_h14)


# ---------------------------------------------------------------------------
# h15 — top supplier (Q15)


def _q_h15(spark, sf_dir):
    """Supplier(s) with the maximum 1997Q1 revenue.  The max is a
    one-row aggregate of the per-supplier totals, broadcast back into
    the filter (no single-partition global window, no driver
    round-trip); exact integer compare keeps ties honest."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    supp = _t(spark, sf_dir, "supplier")
    per_supp = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.sum(_rev_cents()).alias("total_cents"))
    )
    top = per_supp.agg(F.max("total_cents").alias("_max"))
    return (
        per_supp.join(F.broadcast(top))
        .filter(F.col("total_cents") == F.col("_max"))
        .select("s_suppkey", "s_name", "total_cents")
    )


register("h15_top_supplier", f"""
WITH per_supp AS (
    SELECT s_suppkey, s_name, CAST(SUM({_REV_SQL}) AS BIGINT) AS total_cents
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY s_suppkey, s_name
)
SELECT s_suppkey, s_name, total_cents
FROM per_supp
WHERE total_cents = (SELECT MAX(total_cents) FROM per_supp)
""")(_q_h15)


# ---------------------------------------------------------------------------
# h16 — parts/supplier relationship (Q16 adapted: suppliers observed
# in lineitem instead of partsupp)


def _q_h16(spark, sf_dir):
    """Distinct shipping suppliers per (brand, type, size) for
    non-Brand#5 parts in eight size classes.  countDistinct plans as
    a two-phase partial-distinct aggregate — no row explosion."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_size").isin(1, 5, 9, 15, 20, 25, 30, 50))
    )
    return (
        li.join(
            part.select("p_partkey", "p_brand", "p_type", "p_size"),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


register("h16_brand_supplier_count", """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 5, 9, 15, 20, 25, 30, 50)
GROUP BY p_brand, p_type, p_size
""")(_q_h16)


# ---------------------------------------------------------------------------
# h17 — small-quantity-order revenue (Q17)


def _q_h17(spark, sf_dir):
    """Brand#3 lines with quantity below 20% of the part's average
    quantity.  The correlated scalar subquery is decorrelated into a
    per-part aggregate joined back (one extra shuffle on l_partkey —
    the textbook Spark plan).  avg = exact BIGINT sum / count, one
    double division, same on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li_b3 = li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li_b3.join(per_part, li_b3.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.coalesce(
                F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")), F.lit(0)
            )
            .cast("long")
            .alias("total_cents"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


register("h17_small_qty_revenue", """
SELECT CAST(COALESCE(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)), 0) AS BIGINT)
           AS total_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem li
JOIN part ON li.l_partkey = p_partkey AND p_brand = 'Brand#3'
JOIN (SELECT l_partkey AS _pk,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey) pp
  ON li.l_partkey = pp._pk
WHERE li.l_quantity < 0.2 * pp.avg_qty
""")(_q_h17)


# ---------------------------------------------------------------------------
# h18 — large-volume customers (Q18)


def _q_h18(spark, sf_dir):
    """Orders totalling >150 units, with their customers, top-100 by
    quantity.  The HAVING prunes before the customer join (tiny right
    side post-filter), and the top-100 is TakeOrderedAndProject on a
    unique orderkey tiebreak."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "l_orderkey",
            "o_orderdate",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("totalprice_cents"),
            "sum_qty",
        )
        .orderBy(F.col("sum_qty").desc(), "l_orderkey")
        .limit(100)
    )


register("h18_large_volume_customers", """
SELECT c_custkey, c_name, l_orderkey, o_orderdate,
       CAST(floor(o_totalprice * 100) AS BIGINT) AS totalprice_cents, sum_qty
FROM (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 150) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY sum_qty DESC, l_orderkey
LIMIT 100
""")(_q_h18)


# ---------------------------------------------------------------------------
# h19 — discounted revenue, OR-of-ANDs predicate (Q19 adapted: size
# classes stand in for containers)


def _q_h19(spark, sf_dir):
    """Three (brand, size-range, quantity-range) branches OR'd — the
    disjunction sits above an equi-join on partkey, so Catalyst still
    plans a hash join and evaluates the branch predicate post-join;
    common sub-predicates (join key) are pushed."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(
        part.select("p_partkey", "p_brand", "p_size"),
        li.l_partkey == F.col("p_partkey"),
    )
    b = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(b).agg(
        F.coalesce(F.sum(_rev_cents()), F.lit(0)).cast("long").alias("revenue_cents"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


register("h19_branch_discount_revenue", f"""
SELECT CAST(COALESCE(SUM({_REV_SQL}), 0) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""")(_q_h19)


# ---------------------------------------------------------------------------
# h20 — significant shippers of red parts (Q20 adapted: shipped
# volume stands in for available stock)


def _q_h20(spark, sf_dir):
    """NATION_3 suppliers who shipped >50 units of red parts in 1997.
    The qualifying-supplier set is a grouped semi-join input; the
    final supplier list joins it LEFT SEMI so each supplier row passes
    at most once."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    qualifying = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("red_qty"))
        .filter(F.col("red_qty") > 50)
    )
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


register("h20_red_part_shippers", """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS BIGINT)) > 50
)
""")(_q_h20)


# ---------------------------------------------------------------------------
# h21 — slowest shipper on multi-supplier orders (Q21 adapted:
# shipdate ordering stands in for receipt-vs-commit lateness)


def _q_h21(spark, sf_dir):
    """For finished ('F') orders with ≥2 suppliers and a non-degenerate
    ship span, count per supplier the orders where that supplier's
    last ship date IS the order's last ship date (they held the order
    up).  One grouped pass per level — order stats then per-(order,
    supplier) stats joined on the order key; no window over the fact
    table, no self-join on inequality."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem").join(
        orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    )
    order_stats = li.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.max("l_shipdate").alias("max_ship"),
        F.min("l_shipdate").alias("min_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    ).filter((F.col("n_supp") >= 2) & (F.col("max_ship") > F.col("min_ship")))
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_max_ship")
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        per_os.join(order_stats, per_os.l_orderkey == F.col("_ok"))
        .filter(F.col("supp_max_ship") == F.col("max_ship"))
        .join(supp, per_os.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


register("h21_waiting_suppliers", """
WITH fo AS (
    SELECT l_orderkey, l_suppkey, l_shipdate
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
),
order_stats AS (
    SELECT l_orderkey AS _ok, MAX(l_shipdate) AS max_ship,
           MIN(l_shipdate) AS min_ship,
           COUNT(DISTINCT l_suppkey) AS n_supp
    FROM fo GROUP BY l_orderkey
    HAVING COUNT(DISTINCT l_suppkey) >= 2 AND MAX(l_shipdate) > MIN(l_shipdate)
),
per_os AS (
    SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_max_ship
    FROM fo GROUP BY l_orderkey, l_suppkey
)
SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_os
JOIN order_stats ON l_orderkey = _ok AND supp_max_ship = max_ship
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
""")(_q_h21)


# ---------------------------------------------------------------------------
# h22 — global sales opportunity (Q22 adapted: nationkey parity
# stands in for phone country codes)


def _q_h22(spark, sf_dir):
    """Rich (above-average balance) customers in even-coded nations
    with no RECENT orders (none since 1999 — every customer in the
    testdata has some order, so "lapsed" replaces Q22's "never
    ordered"): scalar average from exact cents, anti-join on the
    order key, grouped by the derived code.  The anti-join is the
    only fact-side shuffle."""
    cust = _t(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_nationkey") % 5).cast("long")
    )
    cust = cust.filter(F.col("cntrycode").isin(0, 2, 4))
    bal_cents = F.floor(F.col("c_acctbal") * 100).cast("long")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(bal_cents).cast("double") / F.count(F.lit(1))).alias("_avg_cents")
        )
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("1999-01-01")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(bal_cents.cast("double") > F.col("_avg_cents"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(bal_cents).cast("long").alias("total_bal_cents"),
        )
    )


register("h22_sales_opportunity", """
WITH coded AS (
    SELECT c_custkey, c_acctbal,
           CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
           CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM customer
    WHERE CAST(c_nationkey % 5 AS BIGINT) IN (0, 2, 4)
)
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(bal_cents) AS BIGINT) AS total_bal_cents
FROM coded
WHERE CAST(bal_cents AS DOUBLE) > (
        SELECT CAST(SUM(bal_cents) AS DOUBLE) / COUNT(*)
        FROM coded WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY cntrycode
""")(_q_h22)
