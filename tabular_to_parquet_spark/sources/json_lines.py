"""JSON-lines source — a format extension beyond the reference (which
reads delimited text only, SURVEY.md §2.8 "no JSON/Avro/ORC sources").

The whole engine after the scan is format-agnostic: inference and the
lenient casts operate on a string-typed frame. This source reads
ndjson with every field as a raw string (``primitivesAsString`` keeps
Spark's JSON reader from making its own type decisions), after which
the SAME inference thresholds and cast builders apply — one pipeline,
two wire formats.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_json_header(path: str, max_lines: int = 100) -> list[str]:
    """Column names = union of keys over the first ``max_lines``
    objects, in first-seen order (JSON has no header line)."""
    names: list[str] = []
    seen: set[str] = set()
    with open(path, encoding="utf-8", errors="replace") as fh:
        for i, line in enumerate(fh):
            if i >= max_lines:
                break
            line = line.strip()
            if not line:
                continue
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            if isinstance(obj, dict):
                for k in obj:
                    if k not in seen:
                        seen.add(k)
                        names.append(k)
    return names


def read_json_as_strings(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """Distributed string-typed scan of a JSON-lines file: every field
    read as its raw text so the shared cast builders own ALL type
    decisions (numbers keep their exact source text — no double
    round-trip)."""
    schema = T.StructType(
        [T.StructField(name, T.StringType(), True) for name in columns]
    )
    df = (
        spark.read.schema(schema)
        .option("primitivesAsString", True)
        .option("mode", "PERMISSIVE")
        .json(path)
    )
    return df.select(*[F.col(c) for c in columns])


def convert_json_to_parquet(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    infer_full: bool = False,
):
    """JSON-lines → typed parquet through the SAME inference + cast
    pipeline as the delimited path (convert.py)."""
    from tabular_to_parquet_spark.operators.convert import observed_typed_frame
    from tabular_to_parquet_spark.plans.inference import (
        infer_from_rows,
        infer_schema_distributed,
    )
    from tabular_to_parquet_spark.session import ensure_utc, restore_timezone

    # epoch-timestamp casts are session-tz-sensitive; restored in the
    # finally below because everything here executes eagerly
    prior_tz = ensure_utc(spark)
    try:
        from tabular_to_parquet_spark.operators.convert import first_data_file

        head_file = first_data_file(input_path)
        names = read_json_header(head_file)
        raw = read_json_as_strings(spark, input_path, names)
        if infer_full:
            types = infer_schema_distributed(raw)
        else:
            # driver-side sample in file order, like the delimited default
            rows = []
            with open(head_file, encoding="utf-8", errors="replace") as fh:
                for i, line in enumerate(fh):
                    if len(rows) >= 1000:
                        break
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        obj = json.loads(line)
                    except ValueError:
                        continue
                    if isinstance(obj, dict):
                        # JSON null / missing key observed as "" (a null
                        # token), matching the ragged-row rule
                        rows.append(
                            ["" if obj.get(n) is None else str(obj.get(n)) for n in names]
                        )
            types = infer_from_rows(len(names), rows)
        typed, obs = observed_typed_frame(raw, types)
        typed.write.mode("overwrite").option("compression", "zstd").parquet(output_path)
        return names, types, obs.get
    finally:
        restore_timezone(spark, prior_tz)
