"""Differential QUERY fuzzing: seeded random SQL over the star schema,
the SAME text executed by Spark SQL (through the engine's views) and
DuckDB, results compared exactly (row count, columns, values).

This is the sqllogictest idea applied cross-engine: the fixed parity
catalog pins 140+ curated queries; the fuzzer samples the long tail
of filter/join/group/having combinations around them.  The grammar
stays inside the deterministic Spark∩DuckDB intersection:

- aggregates over exact integers only (COUNT, SUM/MIN/MAX of BIGINT
  expressions, COUNT(DISTINCT intcol)) — order-independent;
- money enters as per-row integer cents (floor(x*100));
- predicates on integers, low-cardinality strings, and TIMESTAMP
  literals;
- every query ends ORDER BY ALL via the caller's wrapper.

Usage: python tools/query_fuzz.py [n_queries] [sf_dir] [seed0]
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (table, [(col, kind)], joins: {dim: (fk, pk)})
META = {
    "orders": {
        "ints": ["o_orderkey", "o_custkey"],
        "money": ["o_totalprice"],
        "lowcard": {
            "o_orderstatus": ["F", "O", "P"],
            "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM",
                                "4-NOT SPECIFIED", "5-LOW"],
        },
        "ts": [("o_orderdate", 1995, 2001)],
        "joins": {"customer": ("o_custkey", "c_custkey")},
    },
    "lineitem": {
        "ints": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "money": ["l_extendedprice", "l_quantity"],
        "lowcard": {
            "l_returnflag": ["A", "N", "R"],
            "l_linestatus": ["F", "O"],
        },
        "ts": [("l_shipdate", 1995, 2001)],
        "joins": {
            "part": ("l_partkey", "p_partkey"),
            "supplier": ("l_suppkey", "s_suppkey"),
            "orders": ("l_orderkey", "o_orderkey"),
        },
    },
    "customer": {
        "ints": ["c_custkey", "c_nationkey"],
        "money": ["c_acctbal"],
        "lowcard": {
            "c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE",
                             "HOUSEHOLD", "MACHINERY"],
        },
        "ts": [],
        "joins": {"nation": ("c_nationkey", "n_nationkey")},
    },
}

DIM_LOWCARD = {
    "part": {"p_brand": ["Brand#1", "Brand#2", "Brand#3"],
             "p_type": ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]},
    "supplier": {},
    "orders": {"o_orderstatus": ["F", "O", "P"]},
    "customer": {"c_mktsegment": ["AUTOMOBILE", "BUILDING"]},
    "nation": {},
}


def gen_query(seed: int) -> str:
    rng = random.Random(seed)
    fact = rng.choice(list(META))
    m = META[fact]

    join_sql = ""
    group_pool = dict(m["lowcard"])
    if m["joins"] and rng.random() < 0.5:
        dim = rng.choice(list(m["joins"]))
        fk, pk = m["joins"][dim]
        # LEFT JOIN sometimes — with a join-side filter folded into the
        # ON clause so unmatched rows survive (deterministic either way)
        if rng.random() < 0.3:
            extra = ""
            dim_lc = DIM_LOWCARD.get(dim, {})
            if dim_lc and rng.random() < 0.5:
                c, vals = rng.choice(list(dim_lc.items()))
                extra = f" AND {c} = '{vals[0]}'"
            join_sql = f" LEFT JOIN {dim} ON {fk} = {pk}{extra}"
        else:
            join_sql = f" JOIN {dim} ON {fk} = {pk}"
        group_pool.update(DIM_LOWCARD.get(dim, {}))

    preds = []
    for _ in range(rng.randint(0, 2)):
        kind = rng.choice(["int", "str", "ts"] if m["ts"] else ["int", "str"])
        if kind == "int":
            col = rng.choice(m["ints"])
            op = rng.choice([">=", "<", "%"])
            if op == "%":
                preds.append(f"{col} % {rng.randint(2, 9)} = {rng.randint(0, 1)}")
            else:
                preds.append(f"{col} {op} {rng.randint(1, 5000)}")
        elif kind == "str":
            col, vals = rng.choice(list(m["lowcard"].items()))
            chosen = rng.sample(vals, rng.randint(1, min(2, len(vals))))
            quoted = ", ".join(f"'{v}'" for v in chosen)
            preds.append(f"{col} IN ({quoted})")
        else:
            col, y0, y1 = rng.choice(m["ts"])
            y = rng.randint(y0, y1)
            op = rng.choice([">=", "<"])
            preds.append(f"{col} {op} TIMESTAMP '{y}-0{rng.randint(1, 9)}-01 00:00:00'")
    where_sql = (" WHERE " + " AND ".join(preds)) if preds else ""

    n_groups = rng.randint(0, min(2, len(group_pool)))
    groups = rng.sample(list(group_pool), n_groups)

    aggs = ["CAST(COUNT(*) AS BIGINT) AS n"]
    money = rng.choice(m["money"])
    aggs.append(
        f"CAST(SUM(CAST(floor({money} * 100) AS BIGINT)) AS BIGINT) AS s_cents"
    )
    icol = rng.choice(m["ints"])
    aggs.append(f"CAST(MIN({icol}) AS BIGINT) AS mn")
    aggs.append(f"CAST(MAX({icol}) AS BIGINT) AS mx")
    if rng.random() < 0.4:
        aggs.append(f"CAST(COUNT(DISTINCT {rng.choice(m['ints'])}) AS BIGINT) AS nd")

    # CASE-expression aggregate (conditional sum over a low-card flag)
    if m["lowcard"] and rng.random() < 0.35:
        ccol, cvals = rng.choice(list(m["lowcard"].items()))
        aggs.append(
            f"CAST(SUM(CASE WHEN {ccol} = '{cvals[0]}' THEN 1 ELSE 0 END) AS BIGINT) AS flag_n"
        )

    sel = ", ".join(groups + aggs)
    sql = f"SELECT {sel} FROM {fact}{join_sql}{where_sql}"
    if groups:
        sql += " GROUP BY " + ", ".join(groups)
        if rng.random() < 0.3:
            sql += " HAVING COUNT(*) > 1"
    return sql


def gen_window_query(seed: int) -> str:
    """Window-function variant: top-n per group by integer cents with
    row_number (unique-key tiebreak), or a running integer sum with a
    frame — both deterministic in the dialect intersection."""
    rng = random.Random(seed)
    # orders/customer only: their first int column is a UNIQUE key, the
    # tiebreak both engines resolve identically.  lineitem has no unique
    # key in the synthetic data (even (l_orderkey, l_linenumber) repeats
    # — measured), so window/limit boundaries there are nondeterministic.
    fact = rng.choice(["orders", "customer"])
    m = META[fact]
    part_col, _vals = rng.choice(list(m["lowcard"].items()))
    money = rng.choice(m["money"])
    key = m["ints"][0]
    cents = f"CAST(floor({money} * 100) AS BIGINT)"
    if rng.random() < 0.5:
        n = rng.randint(1, 5)
        return (
            f"SELECT {part_col}, k, cents, rn FROM ("
            f"SELECT {part_col}, {key} AS k, {cents} AS cents, "
            f"CAST(row_number() OVER (PARTITION BY {part_col} "
            f"ORDER BY {cents} DESC, {key}) AS BIGINT) AS rn "
            f"FROM {fact}) t WHERE rn <= {n}"
        )
    lim = rng.randint(50, 200)
    return (
        f"SELECT {part_col}, k, CAST(SUM(cents) OVER (PARTITION BY {part_col} "
        f"ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        f"AS running FROM ("
        f"SELECT {part_col}, {key} AS k, {cents} AS cents FROM {fact} "
        f"ORDER BY k LIMIT {lim}) t"
    )


# Dimension metadata for subquery generation: pk + optional low-card
# filter columns (unqualified correlation works because TPC-H column
# names are table-prefixed, hence globally unique).
DIM_META = {
    "part": ("p_partkey", {"p_brand": ["Brand#1", "Brand#2", "Brand#3"]}),
    "supplier": ("s_suppkey", {}),
    "customer": ("c_custkey", {"c_mktsegment": ["AUTOMOBILE", "BUILDING"]}),
    "orders": ("o_orderkey", {"o_orderstatus": ["F", "O", "P"]}),
}


def _dim_filter(rng: random.Random, dim: str, pk: str, lowcard: dict) -> str:
    if lowcard and rng.random() < 0.6:
        c, vals = rng.choice(list(lowcard.items()))
        chosen = rng.sample(vals, rng.randint(1, min(2, len(vals))))
        return f"{c} IN ({', '.join(repr(v) for v in chosen)})"
    return f"{pk} % {rng.randint(2, 7)} = {rng.randint(0, 1)}"


def gen_subquery_query(seed: int) -> str:
    """Nested-subquery variant: IN / NOT IN-safe EXISTS / scalar-MAX
    subqueries, all on exact-integer keys (deterministic both engines)."""
    rng = random.Random(seed)
    fact = rng.choice(list(META))
    m = META[fact]
    kind = rng.choice(["in", "exists", "not_exists", "scalar"])

    if kind == "scalar":
        # integer scalar subquery bound: key <= (SELECT MAX(pk) ...)
        dim = rng.choice(list(m["joins"])) if m["joins"] else "customer"
        fk, pk = m["joins"].get(dim, ("o_custkey", "c_custkey")) if m["joins"] else ("o_custkey", "c_custkey")
        lc = DIM_META.get(dim, (pk, {}))[1]
        pred = f"{fk} <= (SELECT MAX({pk}) FROM {dim} WHERE {_dim_filter(rng, dim, pk, lc)})"
    else:
        if not m["joins"]:
            return gen_query(seed)
        dim = rng.choice(list(m["joins"]))
        fk, pk = m["joins"][dim]
        lc = DIM_META.get(dim, (pk, {}))[1]
        inner_filter = _dim_filter(rng, dim, pk, lc)
        if kind == "in":
            pred = f"{fk} IN (SELECT {pk} FROM {dim} WHERE {inner_filter})"
        else:
            neg = "NOT " if kind == "not_exists" else ""
            pred = (f"{neg}EXISTS (SELECT 1 FROM {dim} "
                    f"WHERE {pk} = {fk} AND {inner_filter})")

    groups = rng.sample(list(m["lowcard"]), rng.randint(0, min(1, len(m["lowcard"]))))
    money = rng.choice(m["money"])
    aggs = [
        "CAST(COUNT(*) AS BIGINT) AS n",
        f"CAST(SUM(CAST(floor({money} * 100) AS BIGINT)) AS BIGINT) AS s_cents",
        f"CAST(MAX({m['ints'][0]}) AS BIGINT) AS mx",
    ]
    sql = f"SELECT {', '.join(groups + aggs)} FROM {fact} WHERE {pred}"
    if groups:
        sql += " GROUP BY " + ", ".join(groups)
    return sql


def gen_setop_query(seed: int) -> str:
    """Set-operation variant: two grouped-count branches over the same
    fact combined with UNION [ALL] / INTERSECT / EXCEPT (all DISTINCT
    semantics agree across engines; counts are exact BIGINT)."""
    rng = random.Random(seed)
    fact = rng.choice([f for f in META if META[f]["lowcard"]])
    m = META[fact]
    gcol = rng.choice(list(m["lowcard"]))
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])

    def branch():
        icol = rng.choice(m["ints"])
        k, r = rng.randint(2, 5), rng.randint(0, 1)
        return (f"SELECT {gcol} AS g, CAST(COUNT(*) AS BIGINT) AS n "
                f"FROM {fact} WHERE {icol} % {k} = {r} GROUP BY {gcol}")

    return f"SELECT g, n FROM ({branch()} {op} {branch()}) u"


def gen_groupingsets_query(seed: int) -> str:
    """GROUPING SETS / ROLLUP / CUBE variant over two low-card dims,
    with GROUPING() to disambiguate real NULLs from subtotal rows —
    both engines implement the ANSI semantics identically."""
    rng = random.Random(seed)
    fact = rng.choice([f for f in META if len(META[f]["lowcard"]) >= 2])
    m = META[fact]
    g1, g2 = rng.sample(list(m["lowcard"]), 2)
    money = rng.choice(m["money"])
    clause = rng.choice([
        f"GROUPING SETS (({g1}, {g2}), ({g1}), ())",
        f"ROLLUP ({g1}, {g2})",
        f"CUBE ({g1}, {g2})",
    ])
    icol = rng.choice(m["ints"])
    where = ""
    if rng.random() < 0.5:
        where = f" WHERE {icol} % {rng.randint(2, 5)} = {rng.randint(0, 1)}"
    return (
        f"SELECT {g1}, {g2}, "
        f"CAST(GROUPING({g1}) AS BIGINT) AS is_total_1, "
        f"CAST(GROUPING({g2}) AS BIGINT) AS is_total_2, "
        f"CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(CAST(floor({money} * 100) AS BIGINT)) AS BIGINT) AS s_cents "
        f"FROM {fact}{where} GROUP BY {clause}"
    )


def gen_combined_query(seed: int) -> str:
    """Combined-clause variant: dim join + subquery predicate +
    ROLLUP grouping in ONE query — the interaction coverage the
    single-feature generators can't reach."""
    rng = random.Random(seed)
    fact = rng.choice(["orders", "lineitem"])
    m = META[fact]
    dim = rng.choice(list(m["joins"]))
    fk, pk = m["joins"][dim]
    # subquery on a SECOND dim (or the same one) — IN or scalar bound
    sq_dim = rng.choice(list(m["joins"]))
    sq_fk, sq_pk = m["joins"][sq_dim]
    lc = DIM_META.get(sq_dim, (sq_pk, {}))[1]
    if rng.random() < 0.5:
        pred = f"{sq_fk} IN (SELECT {sq_pk} FROM {sq_dim} WHERE {_dim_filter(rng, sq_dim, sq_pk, lc)})"
    else:
        pred = f"{sq_fk} <= (SELECT MAX({sq_pk}) FROM {sq_dim} WHERE {_dim_filter(rng, sq_dim, sq_pk, lc)})"
    group_pool = dict(m["lowcard"])
    group_pool.update(DIM_LOWCARD.get(dim, {}))
    if len(group_pool) < 2:
        return gen_query(seed)
    g1, g2 = rng.sample(list(group_pool), 2)
    money = rng.choice(m["money"])
    return (
        f"SELECT {g1}, {g2}, "
        f"CAST(GROUPING({g1}) AS BIGINT) AS t1, "
        f"CAST(GROUPING({g2}) AS BIGINT) AS t2, "
        f"CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(CAST(floor({money} * 100) AS BIGINT)) AS BIGINT) AS s_cents "
        f"FROM {fact} JOIN {dim} ON {fk} = {pk} WHERE {pred} "
        f"GROUP BY ROLLUP ({g1}, {g2})"
    )


def gen_correlated_select_query(seed: int) -> str:
    """Correlated scalar subquery in the SELECT list (equality
    correlation — the decorrelation both engines implement):
    per-parent COUNT/MAX from a child table, aggregated in the outer
    query as exact integers."""
    rng = random.Random(seed)
    parent, child, pk, fk = rng.choice([
        ("orders", "lineitem", "o_orderkey", "l_orderkey"),
        ("customer", "orders", "c_custkey", "o_custkey"),
    ])
    m = META[parent]
    if rng.random() < 0.5:
        sub = (f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {child} "
               f"WHERE {fk} = {pk})")
    else:
        cm = META[child]["money"][0]
        sub = (f"(SELECT COALESCE(CAST(MAX(CAST(floor({cm} * 100) AS BIGINT)) "
               f"AS BIGINT), 0) FROM {child} WHERE {fk} = {pk})")
    gcol = rng.choice(list(m["lowcard"]))
    icol = rng.choice(m["ints"])
    where = ""
    if rng.random() < 0.5:
        where = f" WHERE {icol} % {rng.randint(2, 5)} = {rng.randint(0, 1)}"
    return (
        f"SELECT {gcol}, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(sub) AS BIGINT) AS s, CAST(MAX(sub) AS BIGINT) AS mx "
        f"FROM (SELECT {gcol}, {sub} AS sub FROM {parent}{where}) t "
        f"GROUP BY {gcol}"
    )


def gen_fullouter_query(seed: int) -> str:
    """FULL OUTER JOIN of two keyed aggregates — exercises outer-join
    null handling with exact-integer payloads on both engines."""
    rng = random.Random(seed)
    k1, r1 = rng.randint(2, 5), rng.randint(0, 1)
    k2, r2 = rng.randint(2, 5), rng.randint(0, 1)
    a = (f"SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS na, "
         f"CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sa "
         f"FROM orders WHERE o_orderkey % {k1} = {r1} GROUP BY o_custkey")
    b = (f"SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS nb "
         f"FROM customer WHERE c_custkey % {k2} = {r2} GROUP BY c_custkey")
    return (f"SELECT COALESCE(a.k, b.k) AS k, a.na, a.sa, b.nb "
            f"FROM ({a}) a FULL JOIN ({b}) b ON a.k = b.k")


def gen_outer_setop_query(seed: int) -> str:
    """Outer join COMBINED with a set op: two outer-joined keyed
    aggregates merged by UNION [ALL] / INTERSECT / EXCEPT. Exercises
    null-safe set-op grouping over outer-join nulls — both engines
    implement ANSI IS NOT DISTINCT grouping for set ops."""
    rng = random.Random(seed)
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])

    def branch():
        k1, r1 = rng.randint(2, 5), rng.randint(0, 1)
        k2, r2 = rng.randint(2, 5), rng.randint(0, 1)
        jt = rng.choice(["LEFT", "FULL"])
        a = (f"SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS na "
             f"FROM orders WHERE o_orderkey % {k1} = {r1} GROUP BY o_custkey")
        b = (f"SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS nb "
             f"FROM customer WHERE c_custkey % {k2} = {r2} GROUP BY c_custkey")
        return (f"SELECT COALESCE(a.k, b.k) AS k, a.na, b.nb "
                f"FROM ({a}) a {jt} JOIN ({b}) b ON a.k = b.k")

    return f"SELECT k, na, nb FROM ({branch()} {op} {branch()}) u"


def gen_nested_in_query(seed: int) -> str:
    """Multi-level nesting: a two-deep IN chain walking the FK graph
    (fact → dim → dim2), with exact-integer filters at every level."""
    rng = random.Random(seed)
    chain = rng.choice([
        # (fact, fk, dim, pk, dim_fk, dim2, dim2_pk)
        ("lineitem", "l_orderkey", "orders", "o_orderkey",
         "o_custkey", "customer", "c_custkey"),
        ("orders", "o_custkey", "customer", "c_custkey",
         "c_nationkey", "nation", "n_nationkey"),
    ])
    fact, fk, dim, pk, dim_fk, dim2, dim2_pk = chain
    m = META[fact]
    k2, r2 = rng.randint(2, 5), rng.randint(0, 1)
    inner = f"SELECT {dim2_pk} FROM {dim2} WHERE {dim2_pk} % {k2} = {r2}"
    mid_extra = ""
    mid_lc = DIM_META.get(dim, (pk, {}))[1]
    if mid_lc and rng.random() < 0.5:
        c, vals = rng.choice(list(mid_lc.items()))
        mid_extra = f" AND {c} IN ({', '.join(repr(v) for v in rng.sample(vals, rng.randint(1, min(2, len(vals)))))})"
    mid = f"SELECT {pk} FROM {dim} WHERE {dim_fk} IN ({inner}){mid_extra}"
    neg = "NOT " if rng.random() < 0.3 else ""
    money = rng.choice(m["money"])
    groups = rng.sample(list(m["lowcard"]), rng.randint(0, min(1, len(m["lowcard"]))))
    aggs = [
        "CAST(COUNT(*) AS BIGINT) AS n",
        f"CAST(SUM(CAST(floor({money} * 100) AS BIGINT)) AS BIGINT) AS s_cents",
        f"CAST(MIN({m['ints'][0]}) AS BIGINT) AS mn",
    ]
    sql = (f"SELECT {', '.join(groups + aggs)} FROM {fact} "
           f"WHERE {fk} {neg}IN ({mid})")
    if groups:
        sql += " GROUP BY " + ", ".join(groups)
    return sql


def gen_agg_of_agg_query(seed: int) -> str:
    """Multi-level derived tables: aggregate OF an aggregate (per-key
    counts re-aggregated per group), three SELECT levels deep."""
    rng = random.Random(seed)
    fact, key, gsrc = rng.choice([
        ("orders", "o_custkey", "o_orderstatus"),
        ("lineitem", "l_suppkey", "l_returnflag"),
        ("lineitem", "l_partkey", "l_linestatus"),
    ])
    m = META[fact]
    money = rng.choice(m["money"])
    where = ""
    if rng.random() < 0.5:
        icol = rng.choice(m["ints"])
        where = f" WHERE {icol} % {rng.randint(2, 5)} = {rng.randint(0, 1)}"
    inner = (f"SELECT {gsrc} AS g, {key} AS k, CAST(COUNT(*) AS BIGINT) AS n, "
             f"CAST(SUM(CAST(floor({money} * 100) AS BIGINT)) AS BIGINT) AS cents "
             f"FROM {fact}{where} GROUP BY {gsrc}, {key}")
    mid_pred = f"n >= {rng.randint(1, 3)}" if rng.random() < 0.5 else f"k % {rng.randint(2, 4)} = 0"
    return (
        f"SELECT g, CAST(COUNT(*) AS BIGINT) AS nkeys, "
        f"CAST(SUM(n) AS BIGINT) AS nrows, CAST(MAX(cents) AS BIGINT) AS mx, "
        f"CAST(MIN(k) AS BIGINT) AS mnk "
        f"FROM (SELECT * FROM ({inner}) i WHERE {mid_pred}) t GROUP BY g"
    )


def gen_window_over_join_query(seed: int) -> str:
    """Window functions over a JOINED relation — the combination the
    single-feature generators never reach: rank per group computed
    after a dim join, with the dim column as the partition key."""
    rng = random.Random(seed)
    fact, key, dim, fk, pk, dim_col, money = rng.choice([
        ("orders", "o_orderkey", "customer", "o_custkey", "c_custkey",
         "c_mktsegment", "o_totalprice"),
        ("customer", "c_custkey", "nation", "c_nationkey", "n_nationkey",
         "n_name", "c_acctbal"),
    ])
    cents = f"CAST(floor({money} * 100) AS BIGINT)"
    n = rng.randint(1, 4)
    k_mod, r_mod = rng.randint(2, 6), rng.randint(0, 1)
    inner = (
        f"SELECT {dim_col} AS g, {key} AS k, {cents} AS cents, "
        f"CAST(row_number() OVER (PARTITION BY {dim_col} "
        f"ORDER BY {cents} DESC, {key}) AS BIGINT) AS rn "
        f"FROM {fact} JOIN {dim} ON {fk} = {pk} "
        f"WHERE {key} % {k_mod} = {r_mod}"
    )
    if rng.random() < 0.5:
        return f"SELECT g, k, cents, rn FROM ({inner}) t WHERE rn <= {n}"
    # aggregate the ranked rows instead: per-group stats of the top-n
    return (
        f"SELECT g, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(cents) AS BIGINT) AS s, CAST(MIN(k) AS BIGINT) AS mn "
        f"FROM ({inner}) t WHERE rn <= {n} GROUP BY g"
    )


def gen_scalar_expr_query(seed: int) -> str:
    """Scalar-function parity: per-row computed columns over the
    string/integer/timestamp intersection (substr, upper/lower,
    length, replace, ||, CASE chains, EXTRACT(YEAR/MONTH)) — the
    axis every other generator holds constant. Row-level output with
    the unique key, so every computed value is compared, not an
    aggregate of it."""
    rng = random.Random(seed)
    fact, key, scol, ts = rng.choice([
        ("orders", "o_orderkey", "o_orderpriority", "o_orderdate"),
        ("customer", "c_custkey", "c_mktsegment", None),
    ])
    cols = [f"CAST({key} AS BIGINT) AS k"]
    s = scol
    for _ in range(rng.randint(1, 3)):
        fn = rng.choice(["upper", "lower", "sub", "rep", "cat"])
        if fn == "sub":
            s = f"substr({s}, {rng.randint(1, 3)}, {rng.randint(1, 6)})"
        elif fn == "rep":
            s = f"replace({s}, '{rng.choice('AEIOU-')}', '{rng.choice('xz_')}')"
        elif fn == "cat":
            s = f"({s} || '_' || CAST({key} % {rng.randint(2, 9)} AS STRING))"
        else:
            s = f"{fn}({s})"
    cols.append(f"{s} AS sval")
    cols.append(f"CAST(length({s}) AS BIGINT) AS slen")
    if ts and rng.random() < 0.6:
        part = rng.choice(["YEAR", "MONTH"])
        cols.append(f"CAST(EXTRACT({part} FROM {ts}) AS BIGINT) AS tpart")
    if rng.random() < 0.5:
        v = rng.randint(2, 7)
        cols.append(
            f"CASE WHEN {key} % {v} = 0 THEN 'z' "
            f"WHEN {key} % {v} = 1 THEN upper({scol}) "
            f"ELSE substr({scol}, 1, 2) END AS branched"
        )
    k_mod, r_mod = rng.randint(2, 11), rng.randint(0, 1)
    return (
        f"SELECT {', '.join(cols)} FROM {fact} "
        f"WHERE {key} % {k_mod} = {r_mod}"
    )


def gen_cte_chain_query(seed: int) -> str:
    """Multi-CTE chains with REUSE: b is defined over a, and the
    final query joins a to b — exercising CTE inlining/reuse planning
    paths that single-reference derived tables never hit."""
    rng = random.Random(seed)
    fact, key, grp, money = rng.choice([
        ("orders", "o_orderkey", "o_orderstatus", "o_totalprice"),
        ("customer", "c_custkey", "c_mktsegment", "c_acctbal"),
        ("lineitem", "l_suppkey", "l_returnflag", "l_extendedprice"),
    ])
    cents = f"CAST(floor({money} * 100) AS BIGINT)"
    k_mod, r_mod = rng.randint(2, 7), rng.randint(0, 1)
    a = (
        f"SELECT {grp} AS g, {key} % {rng.randint(3, 9)} AS bucket, "
        f"CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM({cents}) AS BIGINT) AS cents "
        f"FROM {fact} WHERE {key} % {k_mod} = {r_mod} GROUP BY 1, 2"
    )
    b = (
        "SELECT g, CAST(SUM(cents) AS BIGINT) AS g_cents, "
        "CAST(SUM(n) AS BIGINT) AS g_n FROM a GROUP BY g"
    )
    if rng.random() < 0.5:
        final = (
            "SELECT a.g, a.bucket, a.n, a.cents, b.g_cents "
            "FROM a JOIN b ON a.g = b.g"
        )
        if rng.random() < 0.5:
            final += " WHERE a.cents * 3 > b.g_cents"
    else:
        final = (
            "SELECT a.g, CAST(COUNT(*) AS BIGINT) AS n_buckets, "
            "CAST(MIN(b.g_n) AS BIGINT) AS g_n "
            "FROM a JOIN b ON a.g = b.g GROUP BY a.g"
        )
    return f"WITH a AS ({a}), b AS ({b}) {final}"


def gen_island_query(seed: int) -> str:
    """Gaps-and-islands window chains — the machinery behind
    sessionization (ev03), SCD2 interval builds (a21), and rising
    streaks (a38): a lag-based break flag, a running-sum island id,
    and a per-island aggregate, all in dialect-common SQL (integer
    keys only — no timestamp functions). Variants cover break
    predicates (non-increase / modulus / gap-in-key), an optional
    longest-island pick via row_number, and both named-WINDOW and
    inline window syntax paths."""
    rng = random.Random(seed)
    # key must be UNIQUE within the fact or the window order isn't
    # total and lag() is nondeterministic — seed 112284 caught bare
    # l_orderkey, and lineitem is out entirely because the synthetic
    # data duplicates (l_orderkey, l_linenumber) with DIFFERENT prices
    # (pr15_key_uniqueness's live finding), so no lineitem key is safe
    fact, key, grp, money = rng.choice([
        ("orders", "o_orderkey", "o_orderstatus", "o_totalprice"),
        ("customer", "c_custkey", "c_mktsegment", "c_acctbal"),
        ("part", "p_partkey", "p_brand", "p_retailprice"),
    ])
    k_mod, r_mod = rng.randint(2, 5), rng.randint(0, 1)
    v = f"CAST(floor({money} * 100) AS BIGINT)"
    brk = rng.choice([
        "v <= lag(v) OVER w",
        "v < lag(v) OVER w",
        f"v % {rng.randint(2, 7)} = 0",
        f"k - lag(k) OVER w > {rng.randint(1, 3) * k_mod}",
    ])
    d = (
        f"SELECT {grp} AS g, CAST({key} AS BIGINT) AS k, {v} AS v "
        f"FROM {fact} WHERE {key} % {k_mod} = {r_mod}"
    )
    flags = (
        "SELECT g, k, v, CASE WHEN lag(v) OVER w IS NULL OR "
        + brk
        + " THEN 1 ELSE 0 END AS brk FROM d "
        "WINDOW w AS (PARTITION BY g ORDER BY k)"
    )
    isl = (
        "SELECT g, k, v, SUM(brk) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island "
        "FROM flags"
    )
    runs = (
        "SELECT g, island, CAST(COUNT(*) AS BIGINT) AS len, "
        "CAST(MIN(k) AS BIGINT) AS start_k, CAST(MAX(v) AS BIGINT) AS peak "
        "FROM isl GROUP BY g, island"
    )
    if rng.random() < 0.4:
        final = (
            "SELECT g, len, start_k, peak FROM ("
            "SELECT g, len, start_k, peak, row_number() OVER ("
            "PARTITION BY g ORDER BY len DESC, start_k) AS rn FROM runs"
            ") WHERE rn = 1"
        )
    else:
        final = (
            "SELECT g, CAST(COUNT(*) AS BIGINT) AS n_islands, "
            "CAST(MAX(len) AS BIGINT) AS longest, "
            "CAST(SUM(peak) AS BIGINT) AS sum_peaks FROM runs GROUP BY g"
        )
    return (
        f"WITH d AS ({d}), flags AS ({flags}), isl AS ({isl}), "
        f"runs AS ({runs}) {final}"
    )


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def gen_agg_product_query(seed: int) -> str:
    """Products OF aggregates (agg x agg in one SELECT) — the round-7
    overflow class: n*Sxy-style BIGINT products overflow int64 once
    row counts hit millions, so the durable rule (SCALE.md §12) is
    agg-product math in DECIMAL(38,0) emitted as DIGIT STRINGS (wide
    decimals don't survive either engine's pandas bridge exactly).
    This generator fuzz-enforces that rule: the linear sums stay
    BIGINT, every product is decimal-lifted and stringified."""
    rng = random.Random(seed)
    fact, g = rng.choice([
        ("orders", "o_orderstatus"),
        ("orders", "o_orderpriority"),
        ("lineitem", "l_returnflag"),
        ("lineitem", "l_linestatus"),
        ("customer", "c_mktsegment"),
    ])
    m = META[fact]
    money = rng.choice(m["money"])
    icol = rng.choice(m["ints"])
    where = ""
    if rng.random() < 0.5:
        where = f" WHERE {rng.choice(m['ints'])} % {rng.randint(2, 5)} = {rng.randint(0, 1)}"
    x = f"CAST(floor({money} * 100) AS BIGINT)"
    y = f"CAST({icol} AS BIGINT)"
    d = "DECIMAL(19,0)"
    n_d = f"CAST(COUNT(*) AS {d})"
    sx_d = f"CAST(SUM({x}) AS {d})"
    sy_d = f"CAST(SUM({y}) AS {d})"
    sxy_d = f"CAST(SUM({x} * {y}) AS {d})"
    products = rng.sample([
        f"CAST(CAST({n_d} * {sxy_d} - {sx_d} * {sy_d} AS DECIMAL(38,0)) AS STRING) AS cov_num",
        f"CAST(CAST({sx_d} * {sy_d} AS DECIMAL(38,0)) AS STRING) AS sxsy",
        f"CAST(CAST({n_d} * {sx_d} AS DECIMAL(38,0)) AS STRING) AS nsx",
        f"CAST(CAST({sx_d} * {sx_d} AS DECIMAL(38,0)) AS STRING) AS sx2",
    ], k=rng.randint(1, 3))
    return (
        f"SELECT {g} AS g, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM({x}) AS BIGINT) AS sx, "
        + ", ".join(products)
        + f" FROM {fact}{where} GROUP BY {g}"
    )


def gen_skyline_query(seed: int) -> str:
    """Anti-dominance (skyline) queries — the a40 class: keep rows for
    which NO other row is at-least-as-good on both of two integer
    metrics and strictly better on one.  Exercises NOT EXISTS
    anti-join planning with compound correlated predicates — a shape
    no other generator emits.  Metrics are exact ints (counts / cents
    sums) over a keyed aggregate, so dominance is decided identically
    on both engines; the optimization direction per metric is fuzzed
    (min/max), and half the seeds add a dominance tie-window LIMIT
    behind the total order."""
    rng = random.Random(seed)
    fact, key = rng.choice([
        ("orders", "o_custkey"),
        ("lineitem", "l_suppkey"),
        ("lineitem", "l_partkey"),
        ("customer", "c_nationkey"),
    ])
    m = META[fact]
    money = rng.choice(m["money"])
    x = "CAST(COUNT(*) AS BIGINT)"
    y = f"CAST(SUM(CAST(floor({money} * 100) AS BIGINT)) AS BIGINT)"
    where = ""
    if rng.random() < 0.5:
        icol = rng.choice(m["ints"])
        where = f" WHERE {icol} % {rng.randint(2, 5)} = {rng.randint(0, 1)}"
    dx = rng.choice(["<", ">"])
    dy = rng.choice(["<", ">"])
    le_x = "<=" if dx == "<" else ">="
    le_y = "<=" if dy == "<" else ">="
    sql = (
        f"WITH base AS (SELECT {key} AS k, {x} AS mx, {y} AS my"
        f" FROM {fact}{where} GROUP BY {key}) "
        f"SELECT d.k, d.mx, d.my FROM base d WHERE NOT EXISTS ("
        f"SELECT 1 FROM base o WHERE o.mx {le_x} d.mx AND o.my {le_y} d.my"
        f" AND (o.mx {dx} d.mx OR o.my {dy} d.my))"
    )
    if rng.random() < 0.5:
        sql += f" ORDER BY d.k LIMIT {rng.randint(3, 40)}"
    return sql


def run_fuzz(spark, con, n_queries: int, seed0: int = 0) -> list[tuple[int, str, str]]:
    """Returns a list of (seed, sql, reason) failures (empty = all match)."""
    failures = []
    gens = [gen_query, gen_query, gen_window_query, gen_subquery_query,
            gen_setop_query, gen_fullouter_query, gen_groupingsets_query,
            gen_combined_query, gen_correlated_select_query,
            gen_outer_setop_query, gen_nested_in_query, gen_agg_of_agg_query,
            gen_window_over_join_query, gen_scalar_expr_query,
            gen_cte_chain_query, gen_agg_product_query, gen_island_query,
            gen_skyline_query]
    for seed in range(seed0, seed0 + n_queries):
        sql = gens[seed % len(gens)](seed)
        try:
            sp = spark.sql(sql).toPandas()
            dk = con.sql(sql).df()
        except Exception as e:  # dialect slip — a fuzz bug, count it
            failures.append((seed, sql, f"exec error: {e}"))
            continue
        sp, dk = _normalize(sp), _normalize(dk)
        if list(sp.columns) != list(dk.columns):
            failures.append((seed, sql, f"columns {list(sp.columns)} vs {list(dk.columns)}"))
        elif len(sp) != len(dk):
            failures.append((seed, sql, f"rows {len(sp)} vs {len(dk)}"))
        elif not sp.equals(dk.astype(sp.dtypes.to_dict())):
            failures.append((seed, sql, "value mismatch"))
    return failures


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    seed0 = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    from tabular_to_parquet_spark.session import get_spark
    from tabular_to_parquet_spark.sources.tables import TABLE_NAMES, create_views

    spark = get_spark("query-fuzz")
    create_views(spark, sf_dir)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = run_fuzz(spark, con, n, seed0)
    for seed, sql, reason in failures:
        print(f"FAIL seed={seed}: {reason}\n  {sql}")
    print(f"{n - len(failures)}/{n} fuzz queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
