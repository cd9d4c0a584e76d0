"""A/B throughput for the Python DataSource stream readers (r7
verdict item 3): the Arrow-batched product readers
(sources/datasource_py) vs per-row twins that replay the round-7
implementation (``tbl.to_pylist()`` tuple loops), draining the same
events table through the same micro-batch plan.

The twins are defined HERE (cloudpickle ships __main__ classes by
value, so executors don't need the tool on their path) and registered
under distinct format names; the product classes stay untouched.

Usage: python tools/stream_reader_bench.py [events_path] [batches]
Default events_path is the 10x replica's events table if present,
else sf0.1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tabular_to_parquet_spark.session import get_spark
from tabular_to_parquet_spark.sources.datasource_py import (
    EventsReplayDataSource,
    EventsReplayParallelDataSource,
    EventsReplayParallelReader,
    EventsReplayStreamReader,
    _normalize_events_ts,
)


class RowsSimpleReader(EventsReplayStreamReader):
    """The round-7 per-row simple reader, reconstructed for A/B.

    The tuple list is cached once per driver instance, exactly as the
    round-7 implementation cached ``self._rows`` — re-materializing it
    per read() would overstate the Arrow win by ~batches×."""

    _tuples = None

    def _rows(self):
        if self._tuples is None:
            tbl = self._load()
            self._tuples = [
                tuple(r[k] for k in ("event_id", "ts", "user_id",
                                     "event_type", "value", "props"))
                for r in tbl.to_pylist()
            ]
        return self._tuples

    def read(self, start):
        rows = self._rows()
        n = len(rows)
        if start["pos"] >= n:
            return iter(()), start
        per = max(1, -(-n // self.batches))
        end = min(n, start["pos"] + per)
        return iter(rows[start["pos"]:end]), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows()[start["pos"]:end["pos"]])


class RowsSimpleDataSource(EventsReplayDataSource):
    @classmethod
    def name(cls) -> str:
        return "events_replay_rows"

    def simpleStreamReader(self, schema) -> "RowsSimpleReader":
        return RowsSimpleReader(
            self.options["path"], int(self.options.get("batches", "4"))
        )


class RowsParallelReader(EventsReplayParallelReader):
    """The round-7 per-row parallel reader: full-table read + slice
    per partition, tuple emission."""

    def read(self, partition):
        import pyarrow.parquet as pq

        if partition.end <= partition.start:
            return
        tbl = _normalize_events_ts(
            pq.read_table(partition.path).slice(
                partition.start, partition.end - partition.start
            )
        )
        for r in tbl.to_pylist():
            yield (r["event_id"], r["ts"], r["user_id"],
                   r["event_type"], r["value"], r["props"])


class RowsParallelDataSource(EventsReplayParallelDataSource):
    @classmethod
    def name(cls) -> str:
        return "events_replay_par_rows"

    def streamReader(self, schema) -> "RowsParallelReader":
        return RowsParallelReader(
            self.options["path"],
            int(self.options.get("batches", "4")),
            int(self.options.get("parallelism", "4")),
        )


def drain(spark, fmt: str, path: str, batches: int) -> tuple[float, int]:
    stream = (
        spark.readStream.format(fmt)
        .option("path", path)
        .option("batches", str(batches))
        .load()
    )
    agg = stream.groupBy().agg(F.count(F.lit(1)).alias("n"))
    name = f"drain_{fmt}_{int(time.monotonic() * 1e6)}"
    t0 = time.monotonic()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    dt = time.monotonic() - t0
    n = spark.table(name).collect()[0]["n"]
    return dt, n


def main() -> None:
    default_10x = "/tmp/sfx_10/events.parquet"
    path = sys.argv[1] if len(sys.argv) > 1 else (
        default_10x if os.path.exists(default_10x)
        else "/root/testdata/sf0.1/events.parquet"
    )
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("stream-reader-bench")
    spark.sparkContext.setLogLevel("ERROR")
    for cls in (EventsReplayDataSource, EventsReplayParallelDataSource,
                RowsSimpleDataSource, RowsParallelDataSource):
        spark.dataSource.register(cls)

    pairs = [
        ("simple", "events_replay", "events_replay_rows"),
        ("parallel", "events_replay_par", "events_replay_par_rows"),
    ]
    print(f"events: {path} batches={batches}")
    for label, arrow_fmt, rows_fmt in pairs:
        # arrow first, then rows; one warm-up-free single drain each
        # (the comparison is within-process, same table, same plan)
        ta_, na = drain(spark, arrow_fmt, path, batches)
        tr, nr = drain(spark, rows_fmt, path, batches)
        assert na == nr, (na, nr)
        print(
            f"{label:9s} rows={na:>9,d}  arrow={ta_:6.1f}s ({na/ta_:>9,.0f} rows/s)"
            f"  per-row={tr:6.1f}s ({na/tr:>9,.0f} rows/s)  speedup={tr/ta_:.1f}x"
        )


if __name__ == "__main__":
    main()
