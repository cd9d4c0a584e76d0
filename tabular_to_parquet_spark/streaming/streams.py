"""Structured Streaming operators.

The reference is batch-only (README.md:169: "Pas de streaming pur");
these are engine extensions giving the conversion pipeline and the
event analytics a streaming surface:

- ``stream_convert_directory`` — the CSV→Parquet pipeline as a file
  stream: new delimited files landing in a directory are converted
  continuously with the SAME cast expressions as the batch path
  (exactly-once per file via checkpointing). This is the shape a
  100 TB/day ingest takes: partition-parallel, no state, no shuffle.

- ``windowed_event_stats`` — event-time tumbling-window aggregation
  with a watermark for late data; deterministic aggregates only
  (counts and integer-floored cents) so results are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tabular_to_parquet_spark.operators.convert import typed_frame
from tabular_to_parquet_spark.plans.logical_types import LogicalType


def stream_convert_directory(
    spark: SparkSession,
    input_dir: str,
    columns: list[str],
    types: list[LogicalType],
    output_dir: str,
    checkpoint_dir: str,
    delimiter: str = ",",
):
    """Continuous conversion of delimited files appearing in a directory.

    Schema/types must be pre-inferred (run plans.inference on a seed
    file) — streaming requires a fixed schema. Returns the started
    StreamingQuery; callers stop it or await termination.
    """
    schema = T.StructType([T.StructField(n, T.StringType(), True) for n in columns])
    raw = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("delimiter", delimiter)
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .csv(input_dir)
    )
    typed = typed_frame(raw, types)
    return (
        typed.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_stats_frame(events: DataFrame, window: str = "5 minutes") -> DataFrame:
    """The windowed aggregation shared by streaming and batch modes.

    ``floor(value*100)`` keeps the sum in exact integer math —
    deterministic under any aggregation order (a double SUM would be
    order-dependent and unverifiable).
    """
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100)).alias("value_cents"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
            "approx_users",
        )
    )


def windowed_event_stats(
    spark: SparkSession,
    events_path: str,
    window: str = "5 minutes",
    query_name: str = "windowed_event_stats",
) -> DataFrame:
    """Run the windowed aggregation as a real streaming query over the
    parquet directory (file micro-batches), drain it to completion into
    a memory sink, and return the result table.

    `availableNow` + `processAllAvailable` make this deterministic on
    static input while exercising the true streaming engine (state
    store, watermarks, event-time windows).
    """
    from tabular_to_parquet_spark.sources.tables import load_events_stream

    stream = load_events_stream(spark, events_path)
    agg = windowed_event_stats_frame(stream, window)
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(query_name)
