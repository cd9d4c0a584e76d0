"""Logical type model for inferred columns.

The reference's inference emits Arrow types Spark can't all express
directly (UInt64; per-unit timestamps — SURVEY.md §1.2). We keep the
*logical* type through planning (unit drives ms-truncation semantics,
uint64 range drives the LongType vs DECIMAL(20,0) lowering) and lower
to a Spark type only at the projection boundary.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

#: logical kinds, mirroring the closed type lattice of the reference's
#: inference (reference src/schema.rs:236-296)
KINDS = ("bool", "int64", "uint64", "float64", "date", "timestamp", "string")


@dataclass(frozen=True)
class LogicalType:
    kind: str
    unit: str | None = None  # timestamp unit: s | ms | us | ns
    uint_exceeds_i64: bool = False  # uint64 column whose max > i64::MAX

    def to_spark(self) -> T.DataType:
        """Lower to the Spark storage type (SURVEY.md §1.2 table)."""
        if self.kind == "bool":
            return T.BooleanType()
        if self.kind == "int64":
            return T.LongType()
        if self.kind == "uint64":
            # parquet UINT(64) reads back into Spark as DECIMAL(20,0);
            # stay in LongType when the observed max fits i64
            return T.DecimalType(20, 0) if self.uint_exceeds_i64 else T.LongType()
        if self.kind == "float64":
            return T.DoubleType()
        if self.kind == "date":
            return T.DateType()
        if self.kind == "timestamp":
            return T.TimestampNTZType()
        return T.StringType()


BOOL = LogicalType("bool")
INT64 = LogicalType("int64")
UINT64 = LogicalType("uint64")
FLOAT64 = LogicalType("float64")
DATE = LogicalType("date")
STRING = LogicalType("string")


def timestamp(unit: str) -> LogicalType:
    return LogicalType("timestamp", unit=unit)
