"""Real-BPE tests: learning determinism, the replace-chain apply vs a
classic min-rank-first reference encoder, and packing compatibility."""

from __future__ import annotations

from pyspark.sql import functions as F

from tabular_to_parquet_spark.functions import bpe


def _ref_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Classic BPE encoding: repeatedly merge the lowest-rank adjacent
    pair (the textbook loop the replace chain must reproduce)."""
    ranks = {p: i for i, p in enumerate(merges)}
    out: list[str] = []
    for tok in bpe._PY_BPE_RE.findall(text):
        syms = list(tok)
        while len(syms) > 1:
            cand = [
                (ranks.get((a, b), 1 << 30), i)
                for i, (a, b) in enumerate(zip(syms, syms[1:]))
            ]
            r, _ = min(cand)
            if r == 1 << 30:
                break
            x, y = merges[r]
            ns: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    ns.append(x + y)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            syms = ns
        out.extend(syms)
    return out


def test_learn_merges_deterministic_and_ranked():
    texts = ["low lower lowest", "low low slowest", "newer newest"] * 3
    m1 = bpe.learn_bpe_merges(texts, 8)
    m2 = bpe.learn_bpe_merges(list(texts), 8)
    assert m1 == m2 and len(m1) == 8
    # rank consistency: a merge's parts exist (chars or earlier merges)
    known = {x + y for x, y in m1}
    for i, (x, y) in enumerate(m1):
        for part in (x, y):
            assert len(part) == 1 or part in {a + b for a, b in m1[:i]}, (i, part)


def test_learn_merges_first_is_most_frequent_pair():
    merges = bpe.learn_bpe_merges(["aaab aaab aaab"], 2)
    assert merges[0] == ("a", "a")


def test_replace_chain_equals_reference_encoder(spark):
    texts = [
        "low lower lowest newest",
        "the fast key order sort table",
        "it's a test, isn't it? 1234 c3po",
        "aaaa aaa aa a",
        "",
        "   ",
        "x",
    ]
    merges = bpe.learn_bpe_merges(texts, 24)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {
        r["id"]: (r["toks"], r["n"])
        for r in df.select(
            "id",
            bpe.bpe_encode(F.col("text"), merges).alias("toks"),
            bpe.bpe_token_count(F.col("text"), merges).alias("n"),
        ).collect()
    }
    for i, t in enumerate(texts):
        expect = _ref_encode(t, merges)
        assert got[i][0] == expect, (t, got[i][0], expect)
        assert got[i][1] == len(expect), (t, got[i][1], len(expect))


def test_embedded_merges_nonempty_and_applied(spark):
    assert len(bpe.BPE_MERGES) == 64
    df = spark.createDataFrame([(1, "the sort order of the fast table")], "id long, text string")
    row = df.select(
        bpe.bpe_token_count(F.col("text"), bpe.BPE_MERGES).alias("n"),
    ).collect()[0]
    # merges strictly compress vs the per-char count
    assert 0 < row["n"] < len("thesortorderofthefasttable")


def test_null_text_counts_zero(spark):
    df = spark.createDataFrame([(1, None)], "id long, text string")
    assert (
        df.select(bpe.bpe_token_count(F.col("text"), bpe.BPE_MERGES).alias("n"))
        .collect()[0]["n"]
        == 0
    )


def test_duckdb_oracle_matches_spark(spark):
    import duckdb

    from tabular_to_parquet_spark.operators.text_analysis import BPE_TOKEN_RE

    texts = ["low lower lowest", "it's fast, isn't it? 99 bottles", "aaa aa a"]
    merges = bpe.learn_bpe_merges(texts, 12)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", bpe.bpe_token_count(F.col("text"), merges).alias("n")
        ).collect()
    }
    re_sql = BPE_TOKEN_RE.replace("'", "''")
    cnt = bpe.bpe_token_count_sql("t", merges, re_sql)
    con = duckdb.connect()
    for i, t in enumerate(texts):
        (n,) = con.execute(f"SELECT {cnt} FROM (SELECT ? AS t)", [t]).fetchone()
        assert n == got[i], (t, n, got[i])


def test_pack_sequences_consumes_bpe_counts(spark):
    """pl05 packing over the real-BPE token column: same window plan,
    the count column is just stricter."""
    from tabular_to_parquet_spark.operators import pipeline as pl

    df = spark.createDataFrame(
        [(i, f"doc number {i} with some filler words here") for i in range(20)],
        "doc_id long, text string",
    )
    staged = df.select(
        "doc_id",
        (F.col("doc_id") % 2).cast("int").alias("shard"),
        bpe.bpe_token_count(F.col("text"), bpe.BPE_MERGES).alias("tok"),
    )
    packed = pl.pack_sequences(staged, "tok", budget=30, order_col="doc_id", shard_col="shard")
    rows = packed.collect()
    assert len(rows) == 20
    # pack_start is the per-shard running sum minus own tokens
    by_shard: dict[int, int] = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        assert r["pack_start"] == by_shard.get(r["shard"], 0)
        by_shard[r["shard"]] = r["pack_start"] + r["tok"]
