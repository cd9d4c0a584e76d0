"""Training-data pipeline operators: split / sample / mix / redact /
pack / shard (SURVEY.md §7.4 extension surface).

These are the corpus-preparation steps an LLM training pipeline runs
between "deduplicated documents" and "tokenized shards". Everything is
deterministic — no ``rand()`` anywhere — so runs are reproducible,
resumable, and independently checkable by the DuckDB oracle:

- **hash_split**: train/val/test assignment from a 60-bit md5 of the
  document id. Pure projection — no shuffle, no state, stable under
  re-partitioning and re-runs (a document never migrates between
  splits when the corpus grows).
- **mixture_sample**: per-source sampling rates (the "data mixture" of
  a training run) via the same hash-bucket trick. Pure projection +
  filter; at 100 TB this is a scan with the filter pushed to the
  parquet row-group level where possible.
- **stratified_sample**: exactly-k-per-stratum, deterministic: rank by
  a seeded hash within each stratum and keep the k smallest. One
  shuffle on the stratum key; the window is PARTITIONED (no global
  single-reducer sort — cf. the x09 lesson, VERDICT r2).
- **redact_pii**: email/phone/SSN/IPv4 masking with patterns written
  in the Java-regex ∩ RE2 subset so Spark and the DuckDB oracle
  replace byte-identically. Pure projection, codegen'd.
- **pack_sequences**: concat-then-chunk packing — documents are laid
  head-to-tail per shard in deterministic order and a pack boundary
  falls every ``budget`` tokens; a document joins the pack where it
  STARTS (so packs can overrun by at most one document's tokens —
  the standard closed-form approximation of greedy packing, and the
  rule is window-expressible on both engines). One shuffle on the
  shard key; cumulative sums are per-shard windows, never global.
- **shard_assign**: training-shard assignment by id hash — round-robin
  in expectation, deterministic in fact. Pure projection; feeds
  ``DataFrameWriter.partitionBy("shard")`` for the physical write.

No reference counterpart (the reference is a converter only); these
compose on top of the converted Parquet tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from tabular_to_parquet_spark.functions.hashing import md5_i64, md5_i64_sql

#: resolution of the hash buckets used for split/mixture decisions —
#: rates are exact multiples of 1/10000
BUCKETS = 10_000


def _bucket(id_col: Column, seed: str) -> Column:
    """Deterministic bucket in [0, BUCKETS) from a 60-bit md5 hash."""
    return F.pmod(md5_i64(id_col.cast("string"), seed=seed), F.lit(BUCKETS))


def _bucket_sql(expr: str, seed: str) -> str:
    """DuckDB SQL computing the same bucket (md5_i64 is non-negative,
    so plain ``%`` matches Spark's pmod)."""
    return f"({md5_i64_sql(f'({expr})::VARCHAR', seed=seed)} % {BUCKETS})"


# ---------------------------------------------------------------------------
# hash_split

def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named fraction.

    ``weights`` maps split name → fraction (must sum to ≤ 1.0; any
    remainder falls into the LAST split). Assignment is a pure
    projection on ``md5(id) % 10000`` — adding data later never moves
    an existing id between splits, which is the property that keeps a
    held-out set held out across corpus refreshes.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    b = _bucket(F.col(id_col), seed)
    names = list(weights)
    edges: list[int] = []
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        edges.append(int(round(acc * BUCKETS)))
    expr: Column = F.lit(names[-1])
    for name, edge in zip(reversed(names[:-1]), reversed(edges)):
        expr = F.when(b < edge, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def hash_split_case_sql(
    id_expr: str, weights: dict[str, float] | None = None, seed: str = "split"
) -> str:
    """DuckDB CASE expression mirroring :func:`hash_split`."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    names = list(weights)
    b = _bucket_sql(id_expr, seed)
    acc = 0.0
    arms = []
    for name in names[:-1]:
        acc += weights[name]
        arms.append(f"WHEN {b} < {int(round(acc * BUCKETS))} THEN '{name}'")
    return "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END"


# ---------------------------------------------------------------------------
# mixture_sample

def mixture_sample(
    df: DataFrame,
    source_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 0.0,
    seed: str = "mix",
) -> DataFrame:
    """Keep each row with its source's sampling rate, deterministically.

    ``rates`` is the training mixture: source name → keep fraction.
    A row survives iff ``md5(id) % 10000 < rate*10000`` — no rand(),
    so the sampled corpus is reproducible and monotone in the rate
    (raising a rate strictly grows the sample; lowering it shrinks).
    Pure projection + filter: zero shuffles at any scale.
    """
    b = _bucket(F.col(id_col), seed)
    thr: Column = F.lit(int(round(default_rate * BUCKETS)))
    for name, rate in rates.items():
        thr = F.when(
            F.col(source_col) == name, F.lit(int(round(rate * BUCKETS)))
        ).otherwise(thr)
    return df.where(b < thr)


def mixture_threshold_sql(
    source_expr: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> str:
    """DuckDB CASE expression for the per-source bucket threshold."""
    arms = " ".join(
        f"WHEN {source_expr} = '{name}' THEN {int(round(rate * BUCKETS))}"
        for name, rate in rates.items()
    )
    return f"CASE {arms} ELSE {int(round(default_rate * BUCKETS))} END"


# ---------------------------------------------------------------------------
# stratified_sample

def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str,
    seed: str = "strat",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, deterministically.

    Rank rows within each stratum by a seeded hash of the id (total
    order — ties broken by the id itself) and keep the k smallest.
    One shuffle on the stratum key; the ranking window is partitioned
    by stratum, so no single task ever sees more than one stratum
    (skewed strata are bounded by stratum size, not corpus size — for
    a pathologically hot stratum, pre-filter with an approximate
    per-stratum rate first, then exact-rank the survivors).
    """
    h = md5_i64(F.col(id_col).cast("string"), seed=seed)
    w = W.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


# ---------------------------------------------------------------------------
# redact_pii

#: (pattern, replacement) — Java-regex ∩ RE2 subset (no lookaround, no
#: backreferences); order matters: SSN's 3-2-4 shape must run before
#: the generic phone pass would never match it, but email must run
#: before phone so the digits inside an address aren't re-masked.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(df: DataFrame, text_col: str, out_col: str | None = None) -> DataFrame:
    """Mask emails / SSNs / phone numbers / IPv4s in ``text_col``.

    A chain of built-in ``regexp_replace`` calls — JVM-side, codegen'd,
    shuffle-free. The patterns avoid every construct where Java regex
    and RE2 disagree, so the DuckDB oracle (``regexp_replace(..., 'g')``)
    reproduces the output byte-for-byte; :data:`PII_PATTERNS` is the
    single source of truth for both engines.
    """
    out = out_col or text_col
    c: Column = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return df.withColumn(out, c)


def redact_pii_sql(expr: str) -> str:
    """DuckDB expression applying the same replacement chain."""
    for pat, repl in PII_PATTERNS:
        # single-quote the pattern; none of the patterns contain quotes
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


# ---------------------------------------------------------------------------
# pack_sequences

def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str,
    shard_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget packs (concat-then-chunk).

    Documents are laid head-to-tail in ``order_col`` order (within
    ``shard_col`` when given) and a pack boundary falls every
    ``budget`` tokens; a document belongs to the pack containing its
    START offset, so every pack holds whole documents and overruns the
    budget by strictly less than one document. This is the closed-form
    window formulation of sequence packing: exact greedy first-fit
    needs sequential state, but start-offset chunking is one
    ``sum() OVER (...)`` — and at 100 TB that difference is a
    partitioned window versus a non-parallelizable scan.

    Without ``shard_col`` the window is global — correct but
    single-reducer; always pass a shard column at scale (pack quality
    is unaffected: packs never span shards by construction). The
    global mode warns, loudly — it is the x09-class plan shape that
    cannot survive 100× (same guard style as the uint64 lowering
    warning in functions/parsers.py).

    Adds ``pack_start`` (token offset of the document's head) and
    ``pack_id`` (= ``shard * 2^32 + floor(pack_start / budget)`` when
    sharded, else the plain chunk index).
    """
    if shard_col is None:
        import warnings

        warnings.warn(
            "pack_sequences without shard_col plans a GLOBAL window — "
            "one reducer sorts the whole corpus. Pass shard_col (e.g. "
            "from shard_assign) for the partitioned, scale-safe plan.",
            stacklevel=2,
        )
    part = [F.col(shard_col)] if shard_col else []
    w = (
        W.partitionBy(*part)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).alias("pack_start")
    out = df.withColumn("pack_start", start)
    chunk = F.floor(F.col("pack_start") / budget)
    if shard_col:
        pack = F.col(shard_col).cast("long") * F.lit(1 << 32) + chunk
    else:
        pack = chunk
    return out.withColumn("pack_id", pack.cast("long"))


# ---------------------------------------------------------------------------
# shard_assign

def shard_assign(
    df: DataFrame, id_col: str, n_shards: int, seed: str = "shard"
) -> DataFrame:
    """Add a ``shard`` column in [0, n_shards) from the id hash.

    Deterministic round-robin-in-expectation sharding for training
    output. Pure projection; the physical write co-partitions with
    ``df.write.partitionBy("shard")`` (or ``repartition("shard")``
    first to get exactly one file per shard when n_shards is the
    file-level fan-out target).
    """
    return df.withColumn(
        "shard",
        F.pmod(md5_i64(F.col(id_col).cast("string"), seed=seed), F.lit(n_shards))
        .cast("int"),
    )


def shard_sql(id_expr: str, n_shards: int, seed: str = "shard") -> str:
    """DuckDB expression mirroring :func:`shard_assign`."""
    return f"({md5_i64_sql(f'({id_expr})::VARCHAR', seed=seed)} % {n_shards})"


# ---------------------------------------------------------------------------
# dedup_against — incremental corpus refresh

def dedup_against(
    new: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup an incoming batch against an existing corpus.

    Two stages, both exact:

    1. in-batch: keep the min-id row per distinct normalized content
       (:func:`~tabular_to_parquet_spark.operators.dedup.dedup_exact`);
    2. cross-corpus: drop batch rows whose content fingerprint already
       exists in ``corpus`` (left-anti join on the md5 fingerprint).

    The corpus side collapses to DISTINCT fingerprints with a map-side
    combined aggregate before the anti-join, so the shuffle carries one
    short row per distinct document — never the corpus text. On a real
    deployment, persist the fingerprint set as a table bucketed by
    ``fp``: every nightly refresh then anti-joins co-located, with no
    corpus-side shuffle at all (same trick as the bucketed IVF index).
    """
    from tabular_to_parquet_spark.operators.dedup import dedup_exact
    from tabular_to_parquet_spark.operators.text_analysis import normalized_text

    fp = F.md5(normalized_text(F.col(text_col)))
    batch = dedup_exact(new, text_col, id_col)
    corpus_fps = corpus.select(fp.alias("_fp")).distinct()
    return (
        batch.withColumn("_fp", fp)
        .join(corpus_fps, on="_fp", how="left_anti")
        .drop("_fp")
    )


def corpus_checksum(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row content checksum of a corpus: doc count plus an
    ORDER-INDEPENDENT sum of per-document 60-bit content hashes
    (md5 of id + normalized text), all exact integer math — the same
    value from any partitioning, any engine. The primitive for "did
    this refresh/migration change anything": compare two checksums
    instead of two full corpora. One map-side-combined agg to a
    single row; at 100 TB the shuffle is one row per partition."""
    from tabular_to_parquet_spark.operators.text_analysis import normalized_text

    h = md5_i64(
        F.concat(
            F.col(id_col).cast("string"), F.lit("#"), normalized_text(F.col(text_col))
        )
    )
    # mod a prime before summing: 500+ raw 60-bit hashes overflow i64;
    # residues keep the running sum exact out to ~10^12 documents
    return df.select(F.pmod(h, F.lit(1_000_003)).alias("_h")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_h").cast("long").alias("content_checksum"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Materialize the corpus as a shard-partitioned parquet layout:
    :func:`shard_assign` (pure projection) feeding
    ``partitionBy("shard")`` — one directory per training shard, so a
    reader filtering ``shard = k`` PRUNES to one directory at plan
    time (PartitionFilters in the scan, no data skipped row-by-row).
    ``max_records_per_file`` bounds file sizes inside each shard."""
    sharded = shard_assign(df, id_col, n_shards)
    writer = sharded.write.mode("overwrite").partitionBy("shard")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


# ---------------------------------------------------------------------------
# chunking (RAG / context-window preparation)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping token-window chunks (the
    RAG-ingest / context-window preparation step).

    ``n_chunks = 1 + ceil(max(0, n - chunk_tokens) / stride)`` with
    ``stride = chunk_tokens - overlap``: chunk *i* covers tokens
    ``[i·stride, i·stride + chunk_tokens)``; the last chunk may be
    short but every token is covered. Zero-token documents yield no
    rows. All integer math (exact on both engines); the whole operator
    is tokenize → per-row ``sequence``/``posexplode`` → ``slice`` —
    a linear projection + explode, zero shuffles at any scale.
    """
    from tabular_to_parquet_spark.operators.text_analysis import tokens

    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).where(F.size("_toks") > 0)
    extra = F.greatest(F.lit(0), F.size("_toks") - chunk_tokens)
    n_chunks = F.lit(1) + F.floor(
        (extra + F.lit(stride - 1)) / F.lit(stride)
    ).cast("int")
    exploded = staged.select(
        F.col(id_col),
        F.col("_toks"),
        F.posexplode(
            F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
        ).alias("chunk_idx", "_start"),
    )
    piece = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
    )


# ---------------------------------------------------------------------------
# benchmark decontamination


def decontamination_hits(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Per-document count of word n-grams shared with an eval set.

    The standard benchmark-decontamination rule (GPT-3 appx. C / PaLM /
    Llama): a training document is contaminated if any of its word
    n-grams also appears in an evaluation benchmark. Returns
    ``(id_col, n_hits)`` for contaminated documents only.

    100 TB shape: eval benchmarks are tiny (≤ millions of n-grams), so
    the distinct eval-gram set is **broadcast** — the corpus side is a
    pure projection (tokenize → n-gram fold → md5) probed against the
    in-memory hash set, no corpus shuffle; the only exchange is the
    final per-doc count on ``id_col``. N-grams travel as 60-bit md5
    ints, never as strings.
    """
    from tabular_to_parquet_spark.operators.text_analysis import word_shingles

    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), n)).alias("_g"),
        ).select(F.col(id_col), md5_i64(F.col("_g")).alias("_gh"))

    eval_grams = grams(eval_df).select("_gh").distinct()
    return (
        grams(corpus)
        .join(F.broadcast(eval_grams), on="_gh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """Drop corpus documents sharing ≥ ``min_hits`` word n-grams with
    the eval set (left-anti against :func:`decontamination_hits`)."""
    hits = decontamination_hits(corpus, eval_df, text_col, id_col, n)
    flagged = hits.where(F.col("n_hits") >= min_hits).select(id_col)
    return corpus.join(flagged, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# bucketed fingerprint index — the zero-shuffle refresh path

def build_fingerprint_index(
    corpus: DataFrame,
    table_name: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> None:
    """Materialize the corpus's DISTINCT content fingerprints as a
    parquet table hash-BUCKETED by ``fp``.

    The nightly-refresh trick :func:`dedup_against` names, made real
    (same pattern as similarity.build_ivf_index): the corpus — the big
    side — is written once; every subsequent batch anti-join reads it
    WITHOUT an Exchange, because the bucketed layout already satisfies
    the join's required distribution. Only the (small) batch side
    shuffles to meet the buckets. At 100 TB the index is one short row
    per distinct document and appends incrementally with
    ``INSERT INTO`` semantics (re-distinct on compaction).
    """
    from tabular_to_parquet_spark.operators.text_analysis import normalized_text
    from tabular_to_parquet_spark.sources.tables import reset_managed_table

    reset_managed_table(corpus.sparkSession, table_name)
    fp = F.md5(normalized_text(F.col(text_col)))
    (
        corpus.select(fp.alias("fp"))
        .distinct()
        .write.mode("overwrite")
        .bucketBy(buckets, "fp")
        .sortBy("fp")
        .format("parquet")
        .saveAsTable(table_name)
    )


def dedup_against_bucketed(
    spark,
    new: DataFrame,
    table_name: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`dedup_against` probing a :func:`build_fingerprint_index`
    table — identical output, no corpus-side shuffle (plan-tested)."""
    from tabular_to_parquet_spark.operators.dedup import dedup_exact
    from tabular_to_parquet_spark.operators.text_analysis import normalized_text

    fp = F.md5(normalized_text(F.col(text_col)))
    batch = dedup_exact(new, text_col, id_col)
    return (
        batch.withColumn("fp", fp)
        .join(spark.table(table_name), on="fp", how="left_anti")
        .drop("fp")
    )


# ---------------------------------------------------------------------------
# near-dup incremental refresh — banded minhash against a corpus index

def build_minhash_band_index(
    corpus: DataFrame,
    table_name: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> None:
    """Materialize the corpus's LSH-banded MinHash signatures, bucketed
    by the probe join's exact key set ``(band, band_key)`` — bucketing
    on the full key set is what lets EnsureRequirements co-partition
    the probe join against the stored layout without a corpus-side
    Exchange (a subset key would make the layouts incompatible and
    Spark would re-shuffle both sides).

    The near-dup twin of :func:`build_fingerprint_index`: BANDS short
    rows per corpus doc, written once; nightly batches probe it with
    an equi-join that shuffles only the batch side."""
    from tabular_to_parquet_spark.operators.dedup import minhash_banded
    from tabular_to_parquet_spark.sources.tables import reset_managed_table

    reset_managed_table(corpus.sparkSession, table_name)
    (
        minhash_banded(corpus, text_col, id_col)
        .write.mode("overwrite")
        .bucketBy(buckets, "band", "band_key")
        .sortBy("band", "band_key")
        .format("parquet")
        .saveAsTable(table_name)
    )


def dedup_near_against(
    new: DataFrame,
    corpus_banded: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Drop batch rows with a NEAR-duplicate (est-Jaccard ≥ threshold)
    already in the corpus; ``corpus_banded`` is any frame with the
    :func:`~tabular_to_parquet_spark.operators.dedup.minhash_banded`
    layout — pass ``spark.table(...)`` over a
    :func:`build_minhash_band_index` table for the zero-corpus-shuffle
    path.

    Plan shape (must survive 100×): in-batch exact dedup first; batch
    signatures are one explode+agg; candidate generation is the banded
    equi-join (never all-pairs); scoring is K codegen'd component
    equalities BEFORE the distinct, so the matched-id shuffle carries
    bare ids bounded by batch size; the final anti-join removes
    matched batch rows.
    """
    from tabular_to_parquet_spark.operators.dedup import (
        MINHASH_K,
        dedup_exact,
        minhash_banded,
    )

    batch = dedup_exact(new, text_col, id_col)
    a = minhash_banded(batch, text_col, id_col).alias("a")
    b = corpus_banded.alias("b")
    n_eq = None
    for j in range(MINHASH_K):
        term = F.col(f"a._mh{j}").eqNullSafe(F.col(f"b._mh{j}")).cast("int")
        n_eq = term if n_eq is None else n_eq + term
    est = n_eq.cast("double") / F.lit(float(MINHASH_K))
    matched = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .filter(est >= threshold)
        .select(F.col(f"a.{id_col}").alias(id_col))
        .distinct()
    )
    return batch.join(matched, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# prepare_corpus — the composed preparation pipeline

def prepare_corpus(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    n_shards: int = 8,
    langs: tuple[str, ...] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end corpus preparation: exact dedup → quality filter →
    language filter → split assignment → shard assignment.

    One declarative plan — Catalyst fuses the quality/language
    predicates into a single projection over the dedup survivors and
    the split/shard columns are pure projections on top, so the whole
    pipeline costs exactly the dedup's two fingerprint shuffles
    regardless of how many filter stages ride on it. This is the
    composition argument for engine-level operators: gluing the same
    steps together as separate jobs would re-shuffle (or re-write)
    the corpus between stages.
    """
    from tabular_to_parquet_spark.operators.dedup import dedup_exact
    from tabular_to_parquet_spark.operators.text_analysis import quality_columns

    out = dedup_exact(docs, text_col, id_col)
    out = out.where(quality_columns(F.col(text_col))["is_good"])
    if langs:
        out = out.where(F.col("lang").isin(*langs))
    out = hash_split(out, id_col, weights)
    return shard_assign(out, id_col, n_shards)


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
) -> DataFrame:
    """MERGE INTO semantics, natively over frames (no table-format jar
    needed in this container — Delta/Iceberg MERGE is exactly this
    plan plus transactional file replacement):

    - key matched in both → the UPDATE row wins;
    - key only in target → target row kept;
    - key only in updates → inserted.

    Implementation: union tagged with a source priority, one window
    per key taking the lowest tag (update=0 beats target=1).  A single
    shuffle on the merge key — the same cost MERGE pays anywhere.
    ``updates`` must carry the target's columns (enforced by
    ``unionByName``).  Updates must be key-unique (standard MERGE
    precondition; duplicate update keys would be nondeterministic in
    any engine — Delta raises there too), which the per-key window
    makes cheap to assert upstream.

    At 100 TB: if the target is maintained as a bucketed table on the
    merge key (sources/tables.py:reset_managed_table machinery), the
    target side of this union arrives pre-partitioned and only the
    (small) update stream shuffles — the same trick the bucketed
    fingerprint index proves in dedup_against_bucketed."""
    cols = target.columns
    tagged = updates.select(*cols).withColumn("_src", F.lit(0)).unionByName(
        target.select(*cols).withColumn("_src", F.lit(1))
    )
    w = W.partitionBy(*keys).orderBy("_src")
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*cols)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Change-data-capture diff of two snapshots: one full-outer join
    on the key, classifying every key as ``added`` (new only),
    ``removed`` (old only), or ``changed`` (present in both with any
    non-key column differing — null-safe compare).  Unchanged keys are
    dropped pre-shuffle-output, so the result is |changes|, not
    |table|.

    Returns the key columns + ``change`` + the new-side row values
    (null for removed).  One shuffle on the key — and like
    ``merge_upsert``, a bucketed snapshot layout removes even that.
    This is the inverse of merge_upsert: ``merge_upsert(old,
    changes)`` replays the diff."""
    val_cols = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in val_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in val_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    differs = None
    for c in val_cols:
        d = ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_nk_{k}"), F.col(f"_ok_{k}")).alias(k)
                for k in keys
            ],
            "change",
            *[F.col(f"_n_{c}").alias(c) for c in val_cols],
        )
    )


def merge_partial_aggregates(
    base_agg: DataFrame,
    delta_agg: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Materialized-aggregate maintenance: combine a stored aggregate
    with a delta batch's aggregate WITHOUT rescanning the base data.
    Works for any decomposable aggregate carried as partials (counts,
    sums, mins/maxes re-expressed as sums here are the count/sum case)
    — union the partial frames, re-sum per key.

    The 100 TB point: the nightly refresh touches |delta| + |groups|
    rows, not the corpus.  Cost is one shuffle on the group key over
    the (tiny) union of two aggregate frames.  Exactness: integer
    partials sum associatively, so (base ⊎ delta) re-aggregated equals
    the full recompute bit-for-bit — pinned by the pl17 oracle."""
    value_cols = [c for c in base_agg.columns if c not in keys]
    return (
        base_agg.unionByName(delta_agg.select(*base_agg.columns))
        .groupBy(*keys)
        .agg(*[F.sum(c).cast("long").alias(c) for c in value_cols])
    )


def compact_parquet_dir(
    spark,
    input_dir: str,
    output_dir: str,
    target_file_mb: int = 128,
) -> int:
    """Small-files compaction for streaming sinks: rewrite a parquet
    directory into ~``target_file_mb`` files, preserving rows exactly.

    Streaming ingest (st1/st2) emits one file per micro-batch; at
    100 TB/day that is thousands of KB-sized files whose footer/open
    costs dominate later scans.  File count = ceil(total_bytes /
    target) from the source directory's actual size — a metadata-only
    estimate (no data pass); the rewrite itself is one shuffle-free
    coalesce.  Returns the file count used.  The swap into place is
    left to the caller (rename/retire), where a transactional table
    format would make it atomic."""
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(input_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(input_dir)
    df.coalesce(n_files).write.mode("overwrite").option(
        "compression", "zstd"
    ).parquet(output_dir)
    return n_files


def temperature_mixture(
    df: DataFrame,
    source_col: str,
    id_col: str,
    seed: str = "tmix",
) -> DataFrame:
    """Temperature-balanced mixture (τ = 2, i.e. p ∝ f^0.5): the
    standard multilingual-corpus rebalancing — large sources are
    downsampled toward sqrt-proportional mass, the smallest source is
    kept whole.  Fully deterministic and in-plan:

        f_s   = n_s / N                (division of exact counts)
        g_s   = sqrt(f_s) / f_s        (sqrt is IEEE-exact)
        r_s   = g_s / max_t(g_t)       (≤ 1; == 1 for the smallest)
        keep iff md5-bucket(id) < floor(r_s * 10000)

    Every float step is a single correctly-rounded op on exact-int
    inputs, so the thresholds — and therefore the sampled corpus — are
    bit-identical across engines and runs.  Cost: one tiny per-source
    aggregate broadcast back onto a scan-side filter; the corpus never
    shuffles.  Exponents other than 0.5 need pow(), which is NOT
    cross-engine bit-stable — the √-temperature is the deterministic
    point on the curve (and the common choice in practice)."""
    stats = df.groupBy(source_col).agg(F.count(F.lit(1)).cast("long").alias("_n_s"))
    total = df.agg(F.count(F.lit(1)).cast("long").alias("_n_tot"))
    g = F.sqrt(F.col("_f")) / F.col("_f")
    rates = (
        stats.join(F.broadcast(total))
        .withColumn("_f", F.col("_n_s").cast("double") / F.col("_n_tot"))
        .withColumn("_g", g)
    )
    gmax = rates.agg(F.max("_g").alias("_gmax"))
    thr = F.floor((F.col("_g") / F.col("_gmax")) * F.lit(float(BUCKETS))).cast("long")
    thresholds = rates.join(F.broadcast(gmax)).select(
        source_col, thr.alias("_thr")
    )
    b = _bucket(F.col(id_col), seed)
    return df.join(F.broadcast(thresholds), source_col).where(b < F.col("_thr")).drop(
        "_thr"
    )


def budget_selection(
    df: DataFrame,
    token_col: str,
    budget: int,
    shard_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Select documents under a per-shard token budget, greedily in a
    deterministic preference order (best-first): a partitioned window
    cumsum over ``order_cols`` keeps every doc whose RUNNING total —
    including itself — fits the budget.

    This is the standard "fill the training run" selection.  Like
    pack_sequences, the window is per-shard: the global variant would
    single-reduce at scale, so callers pre-shard (hash_split /
    shard_assignment) and budget per shard.  Integer token cumsum →
    identical row set on any engine."""
    w = (
        W.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    running = F.sum(F.col(token_col).cast("long")).over(w)
    return df.withColumn("_running", running).filter(
        F.col("_running") <= budget
    ).drop("_running")


def zorder_key(col_a: Column, col_b: Column, bits: int = 8) -> Column:
    """Morton (Z-order) interleave of two bucketized dimensions into
    one clustering key — the layout trick behind multi-dimensional
    data skipping (Delta OPTIMIZE ZORDER BY): sorting/partitioning by
    the interleaved key co-locates rows close in BOTH dimensions, so
    min/max row-group stats prune selective filters on either column.

    Inputs must already be integer bucket indexes in [0, 2^bits).
    Pure integer bit arithmetic (shifts/masks — identical on any
    engine), codegen'd, zero shuffle; the expression unrolls to
    ``bits`` shift-or terms per column."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(col_a.cast("long"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(col_b.cast("long"), i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return key


def context_target_pairs(
    df: DataFrame,
    seq_col: str = "event_type",
    group_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    context_len: int = 3,
) -> DataFrame:
    """Supervised (context, target) example construction from ordered
    sequences: for each element, the ``context_len`` previous elements
    in its group become the input and the element itself the label —
    the classic next-event / next-token training-pair builder.

    ``collect_list`` over a ROWS frame is deterministic (elements
    arrive in frame order, which is the window sort order; the unique
    trailing order col breaks ts ties). Rows with short contexts
    (group starts) are dropped so every example has exactly
    ``context_len`` inputs.

    Scale: one shuffle on the group key, per-group windows never
    globalize, output is a projection of the window — the same shape
    as sequence packing (pl05). At 100 TB, cap group sizes upstream
    (a runaway user/session would skew the window partition).
    """
    w = (
        W.partitionBy(group_col)
        .orderBy(*order_cols)
        .rowsBetween(-context_len, -1)
    )
    return (
        df.select(
            group_col,
            *order_cols,
            F.collect_list(seq_col).over(w).alias("context"),
            F.col(seq_col).alias("target"),
        )
        .filter(F.size("context") == context_len)
    )


def negative_samples(
    df: DataFrame,
    id_col: str = "vec_id",
    k: int = 3,
    seed: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    each anchor id, ``k`` pseudo-random partner ids drawn by hashing
    (anchor, j) into the dense id space [0, N). A draw that hits the
    anchor itself moves to (id+1) % N, so a negative is never the
    anchor.

    Requires dense ids 0..N-1 (the standard layout after a
    row_number re-index). Everything is a projection: N enters the
    plan as a broadcast one-row aggregate, never a driver round-trip
    — at 100 TB the only shuffle is the caller's optional join back
    to features, an equi-join on the sampled id.
    """
    n = df.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    anchors = df.select(id_col).withColumn(
        "j", F.explode(F.array(*[F.lit(j) for j in range(k)]))
    )
    key = F.concat(
        F.col(id_col).cast("string"), F.lit("#"), F.col("j").cast("string")
    )
    raw = md5_i64(key, seed=seed) % F.col("_n")
    return (
        anchors.crossJoin(F.broadcast(n))
        .withColumn("_raw", raw)
        .withColumn(
            "neg_id",
            F.when(F.col("_raw") == F.col(id_col), (F.col("_raw") + 1) % F.col("_n"))
            .otherwise(F.col("_raw")),
        )
        .select(id_col, F.col("j").cast("long").alias("j"), "neg_id")
        # N == 1 degenerate case: (raw+1) % 1 is the anchor again, so no
        # valid negative exists — return empty rather than violate the
        # "never the anchor" invariant. A no-op filter for N >= 2, and
        # in-plan (no driver round-trip to inspect N).
        .filter(F.col("neg_id") != F.col(id_col))
    )


def importance_sample(
    df: DataFrame,
    score: Column,
    max_score: int,
    id_col: str,
    seed: str = "imp",
) -> DataFrame:
    """Row-level importance sampling: keep each row with probability
    ``score / max_score``, deterministically — the per-DOCUMENT
    acceptance that mixture_sample's per-SOURCE rates can't express
    (quality-proportional corpus selection; how a pipeline upsamples
    good documents without a stored random state).

    Acceptance is the exact integer comparison
    ``md5(id) % M  <  score * M / max_score`` rearranged as
    ``u * max_score < score * M`` so no division happens at all —
    reproducible, monotone in the score (raising a doc's score can
    only add it), zero shuffles. Both products stay well inside i64
    for max_score up to ~9·10^12 / M."""
    from tabular_to_parquet_spark.functions.hashing import md5_i64

    m = 1_000_000
    if not (0 < max_score <= 2**63 // m):
        raise ValueError(
            f"max_score must be in (0, 2**63 // {m}] so u * max_score "
            f"stays inside int64, got {max_score}"
        )
    u = md5_i64(F.col(id_col).cast("string"), seed=seed) % m
    return df.where(u * F.lit(max_score) < score.cast("long") * F.lit(m))


def largest_remainder_allocation(
    df: DataFrame,
    domain_col: str,
    slots: int = 100_000,
    weight_scale: int = 1024,
) -> DataFrame:
    """Exact integer apportionment of a fixed sample budget across
    domains — the allocation step a data-mixing pipeline runs BEFORE
    any sampling: decide, to the row, how many of ``slots`` examples
    each domain contributes under √-temperature weighting, with the
    allocations summing to ``slots`` EXACTLY (floor-quotas alone
    under-allocate by up to #domains−1).

    Hamilton / largest-remainder method, all integer after one
    correctly-rounded sqrt per domain:

        w_d    = floor(sqrt(n_d) · weight_scale)     (BIGINT weight)
        base_d = (slots · w_d) div Σw                (floor quota)
        rem_d  = (slots · w_d) mod Σw
        the (slots − Σ base) domains with the largest remainders
        (ties → lexicographically first domain) get +1.

    Determinism: sqrt on an exact integer is one IEEE op; everything
    downstream is BIGINT div/mod and a total-order rank — bit-stable
    across engines. Scale: one shuffle for the per-domain count; every
    later step runs on the DOMAIN-cardinality table (bounded — the
    unpartitioned rank window is over that bounded table, never the
    corpus). slots·w stays inside int64 for n_d up to ~10^12 docs at
    the default scale. Output: (domain, n_docs, weight, alloc).
    """
    from pyspark.sql import Window as W

    stats = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = stats.withColumn(
        "weight",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * F.lit(float(weight_scale)))
        .cast("long"),
    )
    # Σw and the floor-quota deficit both live on the bounded domain
    # table: global windows here are windows over ≤ |domains| rows
    all_w = W.partitionBy()
    quota = (
        w.withColumn("wsum", F.sum("weight").over(all_w))
        .withColumn("base", F.expr(f"({slots} * weight) div wsum"))
        .withColumn("rem", F.expr(f"({slots} * weight) % wsum"))
    )
    ranked = quota.withColumn(
        "deficit", F.lit(slots) - F.sum("base").over(all_w)
    ).withColumn(
        "rn",
        F.row_number().over(W.orderBy(F.col("rem").desc(), F.col("domain"))),
    )
    return ranked.select(
        "domain",
        "n_docs",
        "weight",
        (
            F.col("base")
            + F.when(F.col("rn") <= F.col("deficit"), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("alloc"),
    )


# ---------------------------------------------------------------------------
# in-plan model training: exact fixed-point gradient descent

GD_W_SCALE = 20  # weights live in 2^-20 fixed point (the s09/s11 domain)
GD_RESID_SHIFT = 10  # residual pre-shift, keeps every fdiv numerator < 2^53
GD_LR_SHIFT = 7  # learning rate = 2^-(RESID_SHIFT + LR_SHIFT) = 2^-17


def _pmod_floordiv(a, m) -> Column:
    """Exact floor division for int64 columns via the pmod identity:
    floordiv(a, m) = (a - ((a % m + m) % m)) / m.  Both engines
    truncate ``%`` toward zero identically, the numerator is divisible
    by m, and callers keep |numerator| < 2^53 so the double division
    is IEEE-exact — the only way to share floor-div semantics between
    Spark (`div` truncates) and DuckDB (`//`) without engine-specific
    spellings."""
    pm = ((a % m) + m) % m
    return ((a - pm) / m).cast("long")


def gd_linear_regressor(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    rounds: int = 5,
    sentinel: bool = True,
    checkpoint_rounds: int = 0,
) -> DataFrame:
    """Train a linear regressor by batch gradient descent ENTIRELY
    in-plan — the distributed model-training primitive of a curation
    pipeline (quality regressors, importance weights, calibration
    heads are all this shape), exact to the bit across engines.

    Arithmetic contract (what makes the weights value-hashable):
    weights are 2^-20 fixed point int64; each round computes
    ``resid_i = Σ_j w_j x_ij − (y_i << 20)`` (int64), pre-shifts the
    residual by 2^-10 (floor), accumulates the exact int64 gradient
    ``Σ_i x_ij · rs_i``, mean-normalizes by n and applies a 2^-7
    learning-rate shift — every floor division via
    :func:`_pmod_floordiv` with numerators < 2^53 (holds to ~10^9
    docs with |x| <= ~600, |y| <= ~2200).  Emits one row per round:
    (round, w0.., sum_abs_resid_scaled BEFORE the update) — the loss
    column is the convergence evidence.

    Scale shape (the x43 discipline): the training loop runs in ONE
    Catalyst plan; the model state crossing rounds is a 1-row
    broadcast of weights; no collect inside the loop, no UDFs, no
    floats except IEEE-exact integral divisions.  The STATIC plan
    nests each round's aggregate inside the next (O(rounds^2) scan
    nodes on paper); the "rounds corpus scans" runtime contract is
    delivered by Spark's exchange reuse — identical per-round
    aggregate subtrees canonicalize to ReusedExchange at execution
    (verified: rounds=3 executes 3 corpus aggregates, not 9).  With
    ``spark.sql.exchange.reuse`` disabled the loop degrades to
    O(rounds^2) scans (correct, just slower) — cap ``rounds`` (~10)
    or checkpoint externally if you must run without exchange reuse.

    Pre-flight guard (one EAGER driver-side aggregate — a full corpus
    scan — at plan-BUILD time, before the lazy result DataFrame
    exists): raises ValueError on empty input (n = 0 would
    floor-divide by zero and silently emit null weights) and when
    ``n * max|x| * (max|y| << (W_SCALE - RESID_SHIFT))`` breaches
    2^53/4 — the round-1 gradient magnitude with 4x headroom.  Two
    consequences of the eager scan (r12 ADVICE): building the result
    costs one corpus pass up front, and ``n`` is frozen as a literal
    at build time — a non-deterministic or mutated input would train
    against a snapshot row count with no error; cache/checkpoint
    ``feats`` first if its contents can drift between build and
    execution.

    The pre-flight bound is NECESSARY, NOT SUFFICIENT: a divergent
    trajectory (small n, large |x|, the effective learning rate
    overshooting) can grow residuals/gradients past 2^53 in rounds
    >= 2.  Failure modes outside the envelope differ by magnitude:
    a true int64 overflow (>= 2^63) raises loudly under this
    session's ANSI mode, but the [2^53, 2^63) window raises NOTHING —
    :func:`_pmod_floordiv`'s double division silently loses low bits
    there, the exact silently-wrong-weights corner.  That window is
    closed by an IN-PLAN per-round overflow sentinel: each round's
    aggregate also computes ``max(abs(resid))``, and the weight
    update validates ``max|resid| < 2^53`` and every ``|grad_j| <
    2^53 - n`` (the actual trajectory values, so certifiable corpora
    are never falsely poisoned).  The gradient bound subtracts ``n``
    (r13 ADVICE): the ``grad_j / n`` fdiv's numerator is ``d_j - pm``
    with ``pm`` in ``[0, n)``, so a negative ``d_j`` within ``n`` of
    ``-2^53`` makes the numerator's magnitude exceed 2^53 and (being
    odd) round on the double conversion — ``|d_j| < 2^53 - n`` keeps
    every numerator strictly exact.  The residual check needs no
    slack: its divisors are powers of two, so ``a - pm`` just clears
    low bits and the division is exact scaling.  From the first
    breaching round onward the emitted ``(w0..,
    sum_abs_resid_scaled)`` are NULL (poisoned — a value-hash can
    never silently pass on inexact weights) and the carried weights
    FREEZE at their last valid value, which keeps all post-breach
    arithmetic inside int64 so the poisoned plan still executes
    without raising.  Differentially fuzzed by tools/gd_fuzz.py's
    out-of-envelope regime (exact-python breach round vs the
    poisoned rows).

    ``checkpoint_rounds=N`` (r15, opt-in, default off) truncates the
    O(rounds²) STATIC plan: every N rounds the 1-row carried state is
    ``localCheckpoint``-ed, so later rounds (and the emitted per-round
    rows) read a materialized 1-row RDD instead of re-nesting every
    prior round's aggregate subtree — plan size O(rounds·N), and each
    corpus aggregate executes exactly once (during the eager
    checkpoint cascade) instead of relying on exchange reuse across a
    rounds²-node tree.  Output is bit-identical (test-pinned; the
    weights are deterministic integers).  The trades, and why the
    default stays off: building the result frame becomes EAGER (the
    checkpointed rounds execute at call time), and localCheckpoint is
    executor-local — a lost executor cannot replay it, so the
    one-lazy-plan/no-materialization contract of the default remains
    the right shape for fault-tolerant clusters at small ``rounds``.
    Reach for the knob when rounds ≳ 10 and Catalyst planning time or
    driver memory on the nested tree becomes measurable (r14 verdict
    item 7).

    ``sentinel=False`` (r13 verdict item 7) is the pre-certified-
    corpus fast path: it drops the per-round ``max(abs(resid))``
    aggregate column and every ok/poison projection (the r12 plan
    shape, ~30% cheaper on pl37).  CONTRACT: the caller has already
    certified — e.g. via tools/gd_fuzz.traj_in_envelope or a domain
    bound — that the corpus's ACTUAL trajectory keeps every
    ``|resid| < 2^53`` and every ``|grad_j| < 2^53 - n`` for all
    ``rounds``; outside that envelope this path recreates the silent
    [2^53, 2^63) wrong-weights window the sentinel exists to close.
    Inside the envelope both paths are bit-identical (test-pinned)."""
    pre = feats.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max(
            F.greatest(*[F.abs(F.col(c)) for c in feature_cols])
            if len(feature_cols) > 1
            else F.abs(F.col(feature_cols[0]))
        ).alias("mx"),
        F.max(F.abs(F.col(label_col))).alias("my"),
    ).first()
    n = int(pre["n"] or 0)
    if n == 0:
        raise ValueError(
            "gd_linear_regressor: empty input — n=0 would floor-divide "
            "by zero and emit null weights in every round"
        )
    mx = max(int(pre["mx"] or 0), 1)
    my = max(int(pre["my"] or 0), 1)
    grad1_bound = n * mx * ((my << (GD_W_SCALE - GD_RESID_SHIFT)) + 1)
    if grad1_bound >= (1 << 53) // 4:
        raise ValueError(
            f"gd_linear_regressor: gradient bound {grad1_bound} breaches "
            f"2^53/4 (n={n}, max|x|={mx}, max|y|={my}) — outside the "
            "exact-arithmetic envelope; Spark would wrap int64 sums "
            "silently while the SQL oracle raises. Rescale features/"
            "labels or shard the corpus."
        )
    wt = feats.sparkSession.range(1).select(
        *[F.lit(0).cast("long").alias(f"w{j}") for j in range(len(feature_cols))],
        F.lit(n).cast("long").alias("n"),
        *([F.lit(True).alias("ok")] if sentinel else []),
    )
    two_s = 1 << GD_W_SCALE
    fdiv_exact = F.lit(1 << 53).cast("long")  # _pmod_floordiv exactness bound
    out: DataFrame | None = None
    for t in range(1, rounds + 1):
        scored = feats.crossJoin(F.broadcast(wt))
        pred: Column | None = None
        for j, c in enumerate(feature_cols):
            term = F.col(f"w{j}") * F.col(c)
            pred = term if pred is None else pred + term
        resid = pred - F.col(label_col) * F.lit(two_s)
        rs = _pmod_floordiv(resid, F.lit(1 << GD_RESID_SHIFT))
        aresid = F.abs(resid)
        delta = scored.agg(
            *[
                F.sum(F.col(c) * rs).cast("long").alias(f"d{j}")
                for j, c in enumerate(feature_cols)
            ],
            F.sum(_pmod_floordiv(aresid, F.lit(two_s)))
            .cast("long")
            .alias("loss"),
            # overflow sentinel: the round's actual max |residual| —
            # the fdiv numerators' envelope witness (docstring)
            *([F.max(aresid).alias("mr")] if sentinel else []),
        )

        def upd(j: int) -> Column:
            return F.col(f"w{j}") - _pmod_floordiv(
                _pmod_floordiv(F.col(f"d{j}"), F.col("n")),
                F.lit(1 << GD_LR_SHIFT),
            )

        if sentinel:
            # valid iff every prior round was AND this round's actual
            # residuals and gradients stay inside the 2^53
            # fdiv-exactness envelope (values in [2^53, 2^63) compute
            # silently-wrong floor divisions; >= 2^63 raises under
            # ANSI).  The gradient bound is 2^53 - n, not 2^53: the
            # /n fdiv's numerator d_j - pm exceeds |d_j| by up to
            # n - 1 for negative d_j (docstring, r13 ADVICE)
            ok_now = F.col("ok") & (F.col("mr") < fdiv_exact)
            for j in range(len(feature_cols)):
                ok_now = ok_now & (
                    F.abs(F.col(f"d{j}")) < fdiv_exact - F.col("n")
                )
            new = delta.crossJoin(F.broadcast(wt)).select(
                *[
                    # freeze on poison: carrying the last valid weights
                    # keeps every post-breach round's arithmetic inside
                    # int64 (the poisoned plan must still execute)
                    F.when(ok_now, upd(j))
                    .otherwise(F.col(f"w{j}"))
                    .alias(f"w{j}")
                    for j in range(len(feature_cols))
                ],
                "loss",
                "n",
                ok_now.alias("ok"),
            )
            if checkpoint_rounds and t % checkpoint_rounds == 0 and t < rounds:
                # 1-row state: truncates the static plan (docstring);
                # values unchanged, the weights are deterministic ints
                new = new.localCheckpoint()
            row = new.select(
                F.lit(t).cast("long").alias("round"),
                *[
                    F.when(F.col("ok"), F.col(f"w{j}")).alias(f"w{j}")
                    for j in range(len(feature_cols))
                ],
                F.when(F.col("ok"), F.col("loss")).alias(
                    "sum_abs_resid_scaled"
                ),
            )
            wt = new.select(
                *[f"w{j}" for j in range(len(feature_cols))], "n", "ok"
            )
        else:
            # pre-certified fast path (docstring contract): no mr
            # aggregate, no ok algebra — the exact r12 plan shape
            new = delta.crossJoin(F.broadcast(wt)).select(
                *[upd(j).alias(f"w{j}") for j in range(len(feature_cols))],
                "loss",
                "n",
            )
            if checkpoint_rounds and t % checkpoint_rounds == 0 and t < rounds:
                new = new.localCheckpoint()
            row = new.select(
                F.lit(t).cast("long").alias("round"),
                *[f"w{j}" for j in range(len(feature_cols))],
                F.col("loss").alias("sum_abs_resid_scaled"),
            )
            wt = new.select(
                *[f"w{j}" for j in range(len(feature_cols))], "n"
            )
        out = row if out is None else out.unionAll(row)
    return out
