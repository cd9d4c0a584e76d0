"""Graph operators over edge frames: integer fixed-point PageRank.

Extension surface (the reference has no joins at all, SURVEY.md §2.8
— graphs are strictly beyond it); complements the dup-cluster family
(`operators/dedup.py:dup_clusters`) which covers connected
components.

Cross-engine determinism: textbook PageRank is float — per-node sums
of ``0.85 * rank/deg`` contributions whose addition order varies with
partitioning.  Here every iteration stays in scaled integers::

    rank_0    = SCALE                       (per node)
    contrib   = rank_i // outdeg            (integer division)
    rank_i+1  = (15 * SCALE) // 100 + (85 * sum(contrib)) // 100

Integer sums are order-independent, so any partitioning, any engine,
any iteration count gives bit-identical ranks.  Dangling nodes (no
out-edges) leak their mass — the standard simplification, identical
on both engines.

Scale shape: one shuffle per iteration (the contribution aggregation
keyed by dst).  Edges are re-used across iterations — on a cluster,
persist or bucket the edge table by ``src`` so each iteration's join
co-locates; ranks are |V|-sized, typically broadcastable after the
first aggregation.  Iteration count is fixed (plan-unrolled): the
whole computation is ONE Catalyst plan with no driver round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for ranks
PR_SCALE = 1_000_000


def pagerank_fixed(
    edges: DataFrame,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Integer fixed-point PageRank after ``n_iter`` unrolled
    iterations.  ``edges`` is a distinct (src, dst) frame; the node
    set is the union of endpoints.  Returns (node, rank) with rank in
    SCALE-units."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(src).agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    ranks = nodes.withColumn("rank", F.lit(PR_SCALE).cast("long"))
    base = (15 * PR_SCALE) // 100
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks, edges[src] == ranks["node"])
            .join(outdeg, src)
            .select(
                F.col(dst).alias("node"),
                # `div` = true integer division on both engines (`//` in
                # DuckDB); a float division + cast would diverge (Spark
                # truncates, DuckDB rounds)
                F.expr("rank div outdeg").cast("long").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr("(85 * coalesce(s, 0L)) div 100")
            )
            .cast("long")
            .alias("rank"),
        )
    return ranks


def _basket_pairs(lineitem: DataFrame) -> DataFrame:
    """Shared basket self-join: all ordered (src, dst) part pairs that
    co-occur in an order (src != dst) with the order key — the one
    place the basket-join shape lives for both edge builders."""
    a = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src")
    )
    b = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst")
    )
    return a.join(b, "ok").filter(F.col("src") != F.col("dst"))


def copurchase_edges(lineitem: DataFrame, max_lines_per_order: int = 20) -> DataFrame:
    """Distinct co-purchase part pairs (both directions) from orders:
    a self-join on the order key, bounded per order by the line count
    (the standard market-basket edge build — quadratic only in the
    per-order basket size, never across orders)."""
    return (
        _basket_pairs(lineitem)
        .select("src", "dst")
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over an undirected graph given as
    CANONICAL edges (src < dst, distinct).

    The a<b<c orientation is the compact-forward algorithm's trick:
    each triangle is generated exactly once, and every join is an
    equi-join on a vertex id — no squaring of the edge list beyond
    the true wedge count. At 100 TB scale the refinement is
    degree-ordering (orient edges from low- to high-degree endpoint)
    so hub vertices never fan out; id-ordering approximates it here
    since part ids carry no degree skew in the fixture. Returns one
    row (n_edges, n_triangles)."""
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
    )
    n_tri = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    n_edge = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return n_edge.crossJoin(n_tri)


def copurchase_edges_threshold(lineitem: DataFrame, min_orders: int = 2) -> DataFrame:
    """Co-purchase edges kept only when the pair co-occurs in at least
    ``min_orders`` distinct orders — the support-thresholded (and far
    sparser) variant of :func:`copurchase_edges`. Symmetric by
    construction (the distinct-order count is identical for (a,b) and
    (b,a)). One groupBy on the pair key; the distinct-count is a
    map-side-combinable exact agg over bounded per-order baskets."""
    return (
        _basket_pairs(lineitem)
        .groupBy("src", "dst")
        .agg(F.countDistinct("ok").alias("n_orders"))
        .filter(F.col("n_orders") >= min_orders)
        .select("src", "dst")
    )


def kcore(edges: DataFrame, k: int = 3, max_iters: int = 40) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every vertex keeps degree >= k, by iterative peel (remove all
    vertices of degree < k, recompute, repeat to fixpoint).

    ``edges`` must be SYMMETRIC distinct (src, dst) pairs, so a
    vertex's degree is its src-side edge count. The driver loop runs
    one count per round (the d11 fixpoint-CC shape): each round is a
    degree aggregation plus two semi-joins of the edge list against
    the surviving vertex set — all equi-joins on vertex ids, no
    cross products; ``localCheckpoint`` truncates per-round lineage.
    Rounds are O(peel depth), data-dependent but small in practice
    (11 at sf0.01 for the thresholded co-purchase graph); at 100 TB
    the survivor set shrinks monotonically so rounds get cheaper as
    they proceed. Returns (node, core_degree) for core members, with
    core_degree the degree INSIDE the core (>= k by definition)."""
    e = edges.select("src", "dst").localCheckpoint()
    prev = -1
    for _ in range(max_iters):
        # checkpoint the (small) survivor set once per round: the lazy
        # form recomputed this degree aggregation three times per round
        # (the convergence count plus both semi-join sides) — r14,
        # guide §1.2 "don't compute things you throw away"; the count
        # over the checkpointed frame is then nearly free
        core = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
            .localCheckpoint()
        )
        n = core.count()
        if n == prev:
            break
        prev = n
        e = (
            e.join(core, "src")
            .join(core.select(F.col("src").alias("dst")), "dst")
            .select("src", "dst")
            .localCheckpoint()
        )
    else:
        # exhausting the bound would silently return a subgraph whose
        # vertices may still have degree < k — never ship that as "the
        # k-core" (a path of 2*max_iters+ vertices peels one endpoint
        # pair per round and needs more rounds than the default bound)
        raise RuntimeError(
            f"kcore did not converge within max_iters={max_iters}; "
            "raise max_iters for this graph"
        )
    return (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
        .select(F.col("src").alias("node"), "core_degree")
    )


def bfs_hops(edges: DataFrame, seed: int | None = None, max_hops: int = 12) -> DataFrame:
    """BFS distances from ``seed`` over an undirected graph given as
    SYMMETRIC distinct (src, dst) pairs: (node, hop) for every vertex
    reachable within ``max_hops``, hop = exact shortest-path length —
    the reachability/radius primitive the one-shot g01/g02 metrics and
    the g03 peel don't give.

    Level-synchronous frontier expansion, the Pregel shape flattened
    into DataFrame ops: each round is ONE equi-join of the (shrinking)
    frontier against the edge list plus an anti-join against the
    visited set — never a cross product, never a driver-side
    traversal; ``localCheckpoint`` truncates per-round lineage and the
    driver pays one count per level (O(diameter), like kcore's
    O(peel-depth)). At 100 TB the frontier join is the textbook BSP
    BFS: cost per level ∝ edges touched by that level, monotonically
    bounded by the true edge count. ``seed=None`` picks MIN(src) —
    one O(1) scalar aggregate, deterministic."""
    e = edges.select("src", "dst").localCheckpoint()
    if seed is None:
        seed = e.agg(F.min("src")).collect()[0][0]
        if seed is None:
            raise ValueError("bfs_hops on an empty edge set")
    spark = e.sparkSession
    dist = spark.range(1).select(
        F.lit(seed).cast("long").alias("node"), F.lit(0).cast("long").alias("hop")
    )
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .localCheckpoint()
        )
        if nxt.count() == 0:
            break
        # no checkpoint on dist: it is a union of already-checkpointed
        # per-level frontiers (depth <= max_hops, each node
        # materialized), so re-checkpointing it only added one extra
        # materialization job per level (r14; results identical)
        dist = dist.union(
            nxt.select("node", F.lit(h).cast("long").alias("hop"))
        )
        frontier = nxt.select("node")
    return dist


def local_clustering(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient over
    a SYMMETRIC distinct (src, dst) edge list.

    Triangles are enumerated ONCE on the a<b<c orientation (exactly
    :func:`triangle_count`'s compact-forward shape — every join an
    equi-join on a vertex id, wedge fan-out bounded by oriented
    degree), then exploded to their three corners for the per-node
    attribution: one narrow explode (3 rows per triangle) + one
    hash-agg. Degree is the src-side count of the symmetric list.
    All counts are exact BIGINTs; the coefficient 2T/(d(d-1)) is the
    single float division at the end (0.0 for degree-1 nodes, which
    close no wedges). Complements the GLOBAL g02 count with the
    node-level structure (hub neighborhoods vs cliquish tails)."""
    canon = edges.filter(F.col("src") < F.col("dst"))
    e1, e2, e3 = canon.alias("e1"), canon.alias("e2"), canon.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    tcnt = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    t = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
    return deg.join(tcnt, "node", "left").select(
        "node",
        "deg",
        t.alias("n_triangles"),
        F.when(
            F.col("deg") >= 2,
            F.lit(2.0) * t / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("local_cc"),
    )
