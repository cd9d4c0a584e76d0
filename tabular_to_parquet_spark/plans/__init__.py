from tabular_to_parquet_spark.plans.logical_types import LogicalType
from tabular_to_parquet_spark.plans.inference import (
    ColumnStats,
    decide_type,
    infer_schema,
    infer_schema_distributed,
    observe_value,
)

__all__ = [
    "LogicalType",
    "ColumnStats",
    "observe_value",
    "decide_type",
    "infer_schema",
    "infer_schema_distributed",
]
