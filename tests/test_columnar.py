"""ORC/Avro columnar-source tests (sources/columnar.py)."""

from __future__ import annotations

import duckdb
import pytest

from tabular_to_parquet_spark.sources.columnar import (
    convert_columnar_to_parquet,
    read_columnar,
)


def test_orc_typed_passthrough(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 2.5, "a"), (2, 3.5, "b")], "i long, f double, s string"
    )
    src = str(tmp_path / "t.orc")
    df.write.orc(src)
    out = str(tmp_path / "t.parquet")
    cols, types, rows = convert_columnar_to_parquet(spark, src, out, fmt="orc")
    assert cols == ["i", "f", "s"] and types is None and rows == 2
    got = duckdb.sql(f"SELECT * FROM '{out}/*.parquet' ORDER BY i").fetchall()
    assert got == [(1, 2.5, "a"), (2, 3.5, "b")]


def test_orc_string_reinference(spark, tmp_path):
    df = spark.createDataFrame(
        [("1", "true", "2024-01-01"), ("2", "false", "2024-01-02")] * 20,
        "i string, b string, d string",
    )
    src = str(tmp_path / "s.orc")
    df.write.orc(src)
    out = str(tmp_path / "s.parquet")
    cols, types, rows = convert_columnar_to_parquet(spark, src, out, fmt="orc")
    assert [t.kind for t in types] == ["uint64", "bool", "date"]
    assert rows == 40
    kinds = {r[0]: r[1] for r in duckdb.sql(
        f"DESCRIBE SELECT * FROM '{out}/*.parquet'").fetchall()}
    assert kinds == {"i": "BIGINT", "b": "BOOLEAN", "d": "DATE"}


def test_avro_gated_error_or_roundtrip(spark, tmp_path):
    """Avro works when the spark-avro connector is deployed; in this
    container the front-end must fail with the actionable message."""
    df = spark.createDataFrame([(1, "a")], "i long, s string")
    src = str(tmp_path / "a.avro")
    try:
        df.write.format("avro").save(src)
    except Exception:
        with pytest.raises((RuntimeError, Exception), match="avro|Avro"):
            read_columnar(spark, src, "avro")
        return
    out = str(tmp_path / "a.parquet")  # pragma: no cover - avro deployed
    cols, types, rows = convert_columnar_to_parquet(spark, src, out, fmt="avro")
    assert rows == 1


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unsupported"):
        read_columnar(spark, "/nonexistent", "xml")
