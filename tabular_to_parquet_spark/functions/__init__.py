from tabular_to_parquet_spark.functions.nulls import is_null_token, normalize_nulls, trimmed
from tabular_to_parquet_spark.functions.parsers import (
    parse_binary,
    parse_bool,
    parse_date,
    parse_float64,
    parse_int64,
    parse_string,
    parse_timestamp,
    parse_timestamp_ms,
    parse_uint64,
)

__all__ = [
    "is_null_token",
    "normalize_nulls",
    "trimmed",
    "parse_bool",
    "parse_int64",
    "parse_uint64",
    "parse_float64",
    "parse_date",
    "parse_timestamp_ms",
    "parse_timestamp",
    "parse_string",
    "parse_binary",
]
