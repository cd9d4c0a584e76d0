"""Spark 4 Python DataSource API wrapper for the pure-Python Avro
container reader (`sources/avro_python.py`).

`spark.read.format("binaryFile")` + `mapInPandas` (sources/columnar.py)
remains the PERFORMANCE path — Arrow-batched, schema projected before
decode. This module exposes the same reader through the official
`pyspark.sql.datasource` extension point so the format composes like
any built-in source:

    spark.dataSource.register(AvroContainerDataSource)
    df = spark.read.format("avro_py").load("/data/avro_dir")

Planner integration comes free: one `InputPartition` per container
file (files decode in parallel across Python workers, no shuffle, no
driver loop), schema discovered from the first file's header at plan
time. Row-tuple emission keeps the reader dependency-free; a
RecordBatch emitter would lift throughput if this ever became the hot
path (it is not — see columnar.py).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _container_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.avro")))
    return [path]


class AvroContainerDataSource(DataSource):
    """``format("avro_py")`` — Avro OCF via the Python DataSource API."""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self) -> str:
        from tabular_to_parquet_spark.sources.avro_python import (
            parse_record_schema,
            read_header,
            spark_schema_ddl,
        )
        import io

        files = _container_files(self.options["path"])
        if not files:
            raise FileNotFoundError(
                f"no .avro container files under {self.options['path']!r}"
            )
        with open(files[0], "rb") as f:
            schema_json, _codec, _sync = read_header(io.BytesIO(f.read()))
        return spark_schema_ddl(parse_record_schema(schema_json))

    def reader(self, schema) -> "AvroContainerReader":
        return AvroContainerReader(self.options["path"])


class AvroContainerReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(f) for f in _container_files(self.path)]

    def read(self, partition: InputPartition):
        import datetime
        import io

        from tabular_to_parquet_spark.sources.avro_python import (
            iter_records,
            parse_record_schema,
            read_header,
        )

        with open(partition.value, "rb") as f:
            content = f.read()
        # iter_records yields raw decoded values (dates as epoch days,
        # timestamps as epoch millis/micros ints); the tuple protocol
        # wants Python date/datetime objects — naive, interpreted in
        # the session TZ (pinned UTC in session.py)
        schema_json, _codec, _sync = read_header(io.BytesIO(content))
        fields = parse_record_schema(schema_json)
        epoch_d = datetime.date(1970, 1, 1)
        epoch_ts = datetime.datetime(1970, 1, 1)

        def conv(kind):
            if kind == "date":
                return lambda v: epoch_d + datetime.timedelta(days=v)
            if kind == "timestamp-millis":
                return lambda v: epoch_ts + datetime.timedelta(milliseconds=v)
            if kind == "timestamp-micros":
                return lambda v: epoch_ts + datetime.timedelta(microseconds=v)
            return lambda v: v

        convs = [(name, conv(kind)) for name, kind, _null in fields]
        for rec in iter_records(content):
            yield tuple(
                None if rec[name] is None else c(rec[name]) for name, c in convs
            )
