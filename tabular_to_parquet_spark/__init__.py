"""tabular_to_parquet_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capabilities of the reference CSV/TSV→Parquet converter
(gildas-le-drogoff/tabular-to-parquet) as idiomatic Spark DataFrame
pipelines, and extends them with large-scale training-data operators
(dedup, similarity search, text analysis, multimodal columns).

Layout:
    session       — SparkSession factory (zstd parquet, NTZ, AQE defaults)
    sources/      — delimiter sniffing, driver-side sampling, string-typed
                    delimited-text reads
    functions/    — pure Column->Column expression builders (the lenient
                    cast semantics of the reference, SURVEY.md §2.2)
    plans/        — schema inference (counters + type decision) and the
                    logical type model
    operators/    — convert pipeline, dedup, similarity, text analysis,
                    multimodal plumbing
    streaming/    — Structured Streaming variants
"""

from tabular_to_parquet_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
