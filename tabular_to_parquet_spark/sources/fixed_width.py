"""Fixed-width text source — a format extension beyond the reference
(which reads delimited text only; SURVEY.md §2.8 lists the absent
formats). Mainframe/COBOL exports and many regulatory feeds arrive as
fixed-width records; the engine after the scan is format-agnostic, so
this source only has to produce a string-typed frame — the SAME
inference thresholds and lenient cast builders then own every type
decision, exactly like the delimited and JSON-lines paths.

Scan shape: ``spark.read.text`` (splittable, embarrassingly parallel)
→ one ``substring`` + ``trim`` per field — a codegen'd projection,
zero shuffles at any scale.

Field semantics: ``start`` is 1-based (matching SQL ``substring``);
values are space-trimmed at both ends (fixed-width padding), so
leading/trailing-space content is not representable — the standard
trade of the format. Lines shorter than a field's extent yield the
available prefix (possibly ``""``, which the null-token rule maps to
NULL downstream).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FWField:
    """One fixed-width field: 1-based ``start`` offset and ``width``."""

    name: str
    start: int
    width: int


def fields_from_widths(names_widths: list[tuple[str, int]]) -> list[FWField]:
    """Build contiguous field specs from ``(name, width)`` pairs."""
    fields, pos = [], 1
    for name, width in names_widths:
        fields.append(FWField(name, pos, width))
        pos += width
    return fields


def read_fixed_width_as_strings(
    spark: SparkSession, path: str, fields: list[FWField]
) -> DataFrame:
    """Distributed string-typed scan: substring + trim per field."""
    raw = spark.read.text(path)
    return raw.select(
        *[
            F.trim(F.substring(F.col("value"), f.start, f.width)).alias(f.name)
            for f in fields
        ]
    )


def _slice_line(line: str, fields: list[FWField]) -> list[str]:
    """Driver-side sampling twin of the Spark projection: identical
    1-based slicing, identical space-only trim."""
    return [
        line[f.start - 1 : f.start - 1 + f.width].strip(" ") for f in fields
    ]


def convert_fixed_width_to_parquet(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    fields: list[FWField],
    infer_full: bool = False,
):
    """Fixed-width text → typed parquet through the SAME inference +
    cast pipeline as the delimited path (operators/convert.py)."""
    from tabular_to_parquet_spark.operators.convert import observed_typed_frame
    from tabular_to_parquet_spark.plans.inference import (
        infer_from_rows,
        infer_schema_distributed,
    )
    from tabular_to_parquet_spark.session import ensure_utc, restore_timezone

    from tabular_to_parquet_spark.operators.convert import first_data_file

    prior_tz = ensure_utc(spark)
    try:
        raw = read_fixed_width_as_strings(spark, input_path, fields)
        if infer_full:
            types = infer_schema_distributed(raw)
        else:
            # driver-side sample in file order, like the delimited default
            # (directory inputs sample the lexicographically-first file)
            rows = []
            with open(first_data_file(input_path), encoding="utf-8",
                      errors="replace") as fh:
                for line in fh:
                    if len(rows) >= 1000:
                        break
                    rows.append(_slice_line(line.rstrip("\r\n"), fields))
            types = infer_from_rows(len(fields), rows)
        typed, obs = observed_typed_frame(raw, types)
        typed.write.mode("overwrite").option("compression", "zstd").parquet(
            output_path
        )
        return [f.name for f in fields], types, obs.get
    finally:
        restore_timezone(spark, prior_tz)
