"""Dedup operator tests (exact, minhash-LSH, simhash, Jaccard, embedding)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tabular_to_parquet_spark.operators import dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_groups_and_dedup(spark, docs):
    groups = dedup.exact_groups(docs)
    n_distinct = groups.count()
    total = groups.agg(F.sum("n_members")).collect()[0][0]
    assert total == 500
    deduped = dedup.dedup_exact(docs)
    assert deduped.count() == n_distinct
    # keeper is the min doc_id of its group
    assert deduped.count() <= 500


def test_exact_dedup_synthetic(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same  TEXT "), (3, "different")],
        "doc_id long, text string",
    )
    # normalization: case + whitespace collapse → 1 and 2 are the same
    out = dedup.dedup_exact(df).collect()
    assert sorted(r.doc_id for r in out) == [1, 3]


def test_minhash_identical_docs_full_agreement(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "totally unrelated words here now friend")],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_pairs(df, threshold=0.9).collect()
    assert len(pairs) == 1
    assert (pairs[0].id_a, pairs[0].id_b) == (1, 2)
    assert pairs[0].est_jaccard == 1.0


def test_minhash_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, "completely different content with other words")],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in
             dedup.minhash_pairs(df, threshold=0.2).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_deterministic_and_near(spark):
    df = spark.createDataFrame(
        [(1, "shared words one two three four five six seven"),
         (2, "shared words one two three four five six seven"),  # identical
         (3, "zz yy xx ww vv uu tt ss rr qq")],
        "doc_id long, text string",
    )
    sims = {r.doc_id: r.simhash for r in dedup.simhash_frame(df).collect()}
    assert all(0 <= v < 2**32 for v in sims.values())
    assert sims[1] == sims[2] and sims[1] != sims[3]
    # identical input → identical hash (run twice)
    sims2 = {r.doc_id: r.simhash for r in dedup.simhash_frame(df).collect()}
    assert sims == sims2
    # banding guarantee: any pair within hamming ≤ 3 IS found
    pairs = dedup.simhash_pairs(df, max_hamming=3).collect()
    found = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert found.get((1, 2)) == 0
    assert (1, 3) not in found


def test_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [(1, "en", "a b c d e f g h"),
         (2, "en", "a b c d e f g x"),
         (3, "en", "p q r s t u v w"),
         (4, "fr", "a b c d e f g h")],  # other block: never paired with 1
        "doc_id long, lang string, text string",
    )
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             dedup.jaccard_pairs(df, threshold=0.1).collect()}
    assert (1, 2) in pairs and 0.4 < pairs[(1, 2)] < 1.0
    assert (1, 4) not in pairs
    assert (1, 3) not in pairs


def test_embedding_dup_pairs(spark, embeddings):
    pairs = dedup.embedding_dup_pairs(embeddings, threshold=0.99).collect()
    for r in pairs:
        assert r.id_a < r.id_b
        assert r.cosine >= 0.99
    # sanity: a vector duplicated exactly must appear at cosine ~1
    two = embeddings.limit(1).collect()[0]
    df = embeddings.sparkSession.createDataFrame(
        [(9001, two.embedding, two.label), (9002, two.embedding, two.label)],
        embeddings.schema,
    )
    got = dedup.embedding_dup_pairs(df, threshold=0.999).collect()
    assert len(got) == 1 and abs(got[0].cosine - 1.0) < 1e-12


def test_minhash_fast_mode(spark, docs):
    # xxhash64 base: different signature values, same statistics and
    # determinism; identical docs still agree on every component
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "totally unrelated words here now friend")],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_pairs(df, threshold=0.9, fast=True).collect()
    assert [(p.id_a, p.id_b, p.est_jaccard) for p in pairs] == [(1, 2, 1.0)]
    s1 = {r.doc_id: r.sig for r in dedup.minhash_frame(docs, fast=True).collect()}
    s2 = {r.doc_id: r.sig for r in dedup.minhash_frame(docs, fast=True).collect()}
    assert s1 == s2
    slow = {r.doc_id: r.sig for r in dedup.minhash_frame(docs).collect()}
    assert s1 != slow  # different hash family, by design


def _persisted_ids(spark):
    """Persistent RDD id set — compared as SETS OF IDS, not counts:
    checkpointed RDDs leaked by earlier tests get unpersisted
    asynchronously by the ContextCleaner, so a raw count can drift
    mid-test; new-id tracking pins exactly the claim under test."""
    jsc = spark.sparkContext._jsc
    return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}


def test_pair_queries_leave_no_persisted_blocks(spark, docs):
    """VERDICT r2 #4: the default (one-shot) pair queries must not pin
    storage; cache_signatures=True is the opt-in iterative path and is
    released via unpersist_cache."""
    base = _persisted_ids(spark)
    dedup.minhash_pairs(docs).count()
    dedup.simhash_pairs(docs).count()
    assert _persisted_ids(spark) - base == set()

    cached = dedup.minhash_pairs(docs, cache_signatures=True)
    n1 = cached.count()
    assert len(_persisted_ids(spark) - base) == 1
    assert cached.count() == n1  # second materialization hits the cache
    dedup.unpersist_cache(cached)
    assert _persisted_ids(spark) - base == set()
    dedup.unpersist_cache(dedup.minhash_pairs(docs))  # no-op path


def test_warm_codegen_runs_tiny_slice_plans(spark, docs):
    """warm_codegen executes plans built over a tiny input slice through
    the noop sink (populating the Janino class cache) and leaves no
    side effects: no persisted blocks, results unchanged."""
    from tabular_to_parquet_spark.session import warm_codegen

    base = _persisted_ids(spark)
    secs = warm_codegen(
        dedup.minhash_pairs(docs.limit(50)),
        dedup.simhash_pairs(docs.limit(50)),
    )
    assert secs > 0
    assert _persisted_ids(spark) - base == set()
    # the real (full-input) plan still returns the same pairs after warm
    n = dedup.minhash_pairs(docs).count()
    assert n == dedup.minhash_pairs(docs).count()


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup)


def _unit(i: int, dim: int = 64) -> list[float]:
    v = [0.0] * dim
    v[i % dim] = 1.0
    return v


def test_semantic_dup_pairs_finds_planted_dup(spark):
    # vectors 1 and 2 are identical (cosine 1.0) — must land in the
    # same cell and be reported; vector 3 is orthogonal to both
    emb = spark.createDataFrame(
        [(1, _unit(0)), (2, _unit(0)), (3, _unit(17))],
        "vec_id long, embedding array<float>",
    )
    pairs = dedup.semantic_dup_pairs(emb, threshold=0.99).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert abs(pairs[0]["cosine"] - 1.0) < 1e-12

    kept = dedup.semantic_dedup(emb, threshold=0.99)
    assert sorted(r["vec_id"] for r in kept.collect()) == [1, 3]


def test_semantic_pairs_join_is_cell_blocked(spark):
    emb = spark.createDataFrame(
        [(i, _unit(i)) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    plan = (
        dedup.semantic_dup_pairs(emb, threshold=0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # blocked by the cell equi-key — never a cartesian/BNL product
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan


# ---------------------------------------------------------------------------
# dup cluster assignment (min-label propagation)


def test_dup_clusters_bounded_and_fixpoint(spark):
    # components: {1,2,3} (star via 1), chain {10-11-12-13}, singleton 99
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (10, 11), (11, 12), (12, 13)],
        "id_a long, id_b long",
    )
    ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 12, 13, 99)],
                                "doc_id long")
    two_hop = {r["doc_id"]: r["cluster_id"]
               for r in dedup.dup_clusters(pairs, ids, hops=2).collect()}
    assert two_hop[1] == two_hop[2] == two_hop[3] == 1
    assert two_hop[99] == 99
    # the 4-chain needs 3 hops to pull 13 down to 10; 2 hops reaches 11
    assert two_hop[10] == 10 and two_hop[13] == 11

    fix = {r["doc_id"]: r["cluster_id"]
           for r in dedup.dup_clusters_fixpoint(pairs, ids).collect()}
    assert fix == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10, 99: 99}


# ---------------------------------------------------------------------------
# sorted-neighborhood: scale twin == global-window form


def test_sorted_neighborhood_scale_twin_matches_window_form(spark):
    """The equi-join scale path must reproduce the d14 catalog query
    (lead() over a global ORDER BY window) exactly, including pairs
    that cross coarse-block boundaries."""
    from tabular_to_parquet_spark.parity import extensions as _ext  # noqa: F401  (registers d14)
    from tabular_to_parquet_spark.parity.catalog import CATALOG
    from tabular_to_parquet_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    scale = {tuple(r) for r in dedup.sorted_neighborhood_pairs(docs).collect()}
    window = {
        tuple(r)
        for r in CATALOG["d14_sorted_neighborhood_pairs"].spark(spark, sf).collect()
    }
    assert scale == window and scale
    # force boundary crossings: 1-char blocks make nearly every
    # neighbor pair span a block edge — results must still match
    fine = {
        tuple(r)
        for r in dedup.sorted_neighborhood_pairs(docs, block_chars=1).collect()
    }
    assert fine == window


def test_sorted_neighborhood_scale_twin_has_no_data_single_partition(spark):
    """Every Exchange SinglePartition in the plan must sit over the
    per-block COUNT aggregate (one row per distinct block — bounded),
    never over the document rows: that's the difference between this
    path and the global-window form (measured 27.5x at 10x data)."""
    from tabular_to_parquet_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        dedup.sorted_neighborhood_pairs(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    lines = plan.splitlines()
    hits = [i for i, l in enumerate(lines) if "Exchange SinglePartition" in l]
    assert hits, "expected the bounded block-offset exchange"
    for i in hits:
        assert "HashAggregate" in lines[i + 1], lines[i : i + 2]
