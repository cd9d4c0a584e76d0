from tabular_to_parquet_spark.operators.convert import (
    cast_expr,
    convert_delimited_to_parquet,
    typed_frame,
)

__all__ = ["cast_expr", "typed_frame", "convert_delimited_to_parquet"]
