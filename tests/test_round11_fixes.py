"""Round-11 hygiene fixes (ADVICE.md r10): mmr_select returns a short
selection instead of IndexError when candidates run out; write_warc
fails fast with the column name on null uri/date/body; the IPC
_SUCCESS manifest falls back to a driver-local read when the Hadoop
FileSystem route itself throws (JVM hiccup must not silently re-admit
torn task output)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------------------
# mmr_select — candidate exhaustion


def _tiny_emb(spark, n=3):
    pad = [0.0] * 62
    rows = [(i, [1.0 / (i + 1), 0.1 * i] + pad) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_mmr_k_beyond_corpus_returns_short_selection(spark):
    from tabular_to_parquet_spark.operators.similarity import mmr_select

    qf = [math.floor(x * 1048576.0) for x in [1.0, 0.0] + [0.0] * 62]
    rows = mmr_select(_tiny_emb(spark, 3), qf, k=10)
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert len({r["vec_id"] for r in rows}) == 3


def test_mmr_heavy_exclude_returns_short_selection(spark):
    from tabular_to_parquet_spark.operators.similarity import mmr_select

    qf = [math.floor(x * 1048576.0) for x in [1.0, 0.0] + [0.0] * 62]
    rows = mmr_select(_tiny_emb(spark, 3), qf, k=5, exclude_ids=[0, 1])
    assert len(rows) == 1 and rows[0]["vec_id"] == 2


def test_mmr_all_excluded_returns_empty(spark):
    from tabular_to_parquet_spark.operators.similarity import mmr_select

    qf = [math.floor(x * 1048576.0) for x in [1.0, 0.0] + [0.0] * 62]
    assert mmr_select(_tiny_emb(spark, 2), qf, k=3, exclude_ids=[0, 1]) == []


# ---------------------------------------------------------------------------
# write_warc — null field fail-fast


def _warc_src(spark, uri=None, date=None, body=None):
    """One-row frame with optional nulls injected per column."""
    row = spark.range(0, 1).select(
        (F.lit(None).cast("string") if uri is None else F.lit(uri)).alias(
            "target_uri"
        ),
        (
            F.lit(None).cast("timestamp")
            if date is None
            else F.timestamp_seconds(F.lit(date))
        ).alias("warc_date"),
        (
            F.lit(None).cast("binary")
            if body is None
            else F.encode(F.lit(body), "UTF-8")
        ).alias("http_body"),
    )
    return row


@pytest.mark.parametrize(
    "kw,col",
    [
        (dict(date=1709251200, body="b"), "target_uri"),
        (dict(uri="http://x/1", body="b"), "warc_date"),
        (dict(uri="http://x/1", date=1709251200), "http_body"),
    ],
)
def test_write_warc_null_field_raises_with_column_name(spark, tmp_path, kw, col):
    from tabular_to_parquet_spark.sources import warc

    src = _warc_src(spark, **kw)
    with pytest.raises(Exception) as ei:
        warc.write_warc(src, str(tmp_path / "arch"))
    assert f"null '{col}'" in str(ei.value)


def test_write_warc_non_null_rows_still_roundtrip(spark, tmp_path):
    from tabular_to_parquet_spark.sources import warc

    src = _warc_src(spark, uri="http://x/1", date=1709251200, body="hello")
    out = str(tmp_path / "arch")
    manifest = warc.write_warc(src, out)
    assert sum(n for _, n in manifest) == 1
    assert warc.read_warc_python(spark, out).count() == 1


# ---------------------------------------------------------------------------
# _load_ipc_manifest — driver-local fallback when the JVM route throws


class _BrokenJvmSpark:
    """Any attribute access on the fake JVM raises — simulates e.g.
    commons-io missing; the manifest must still load via open()."""

    @property
    def _jvm(self):
        raise RuntimeError("gateway down")

    @property
    def _jsc(self):  # pragma: no cover - _jvm raises first
        raise RuntimeError("gateway down")


def test_manifest_falls_back_to_local_read(tmp_path):
    from tabular_to_parquet_spark.sources.columnar import _load_ipc_manifest

    d = tmp_path / "out"
    d.mkdir()
    (d / "_SUCCESS").write_text("part-aa.arrow\t3\npart-bb.arrow\t4\n")
    got = _load_ipc_manifest(_BrokenJvmSpark(), str(d))
    assert got == ["part-aa.arrow", "part-bb.arrow"]


def test_manifest_fallback_handles_file_uri(tmp_path):
    from tabular_to_parquet_spark.sources.columnar import _load_ipc_manifest

    d = tmp_path / "out"
    d.mkdir()
    (d / "_SUCCESS").write_text("part-cc.arrow\t1\n")
    got = _load_ipc_manifest(_BrokenJvmSpark(), "file:" + str(d))
    assert got == ["part-cc.arrow"]


def test_manifest_fallback_absent_marker_is_none(tmp_path):
    from tabular_to_parquet_spark.sources.columnar import _load_ipc_manifest

    d = tmp_path / "out"
    d.mkdir()
    assert _load_ipc_manifest(_BrokenJvmSpark(), str(d)) is None
