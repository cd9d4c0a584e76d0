from tabular_to_parquet_spark.sources.sniff import detect_delimiter
from tabular_to_parquet_spark.sources.text import (
    read_delimited_as_strings,
    read_header,
    read_sample_rows,
)

__all__ = [
    "detect_delimiter",
    "read_header",
    "read_sample_rows",
    "read_delimited_as_strings",
]
