"""Round-9 hygiene fixes (ADVICE.md r8): the IPC reader honors the
_SUCCESS manifest (orphan part files from torn writes are excluded),
equi_depth_histogram rejects non-dyadic bin counts with ValueError
(not a strippable assert), and importance_sample validates max_score
against its own int64-overflow bound."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------------------
# read_ipc_python × _SUCCESS manifest


def test_ipc_reader_excludes_orphan_parts(spark, tmp_path):
    from tabular_to_parquet_spark.sources.columnar import (
        read_ipc_python,
        write_ipc,
    )

    out = str(tmp_path / "ipc_out")
    src = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_ipc(src.repartition(3), out)

    # Simulate a retried task's torn output: duplicate a listed part
    # under an unlisted name. Without manifest filtering these 100
    # extra rows would be silently double-read.
    import glob
    import shutil

    parts = sorted(glob.glob(f"{out}/part-*.arrow"))
    assert parts
    shutil.copy(parts[0], f"{out}/part-{'0' * 32}.arrow")

    back = read_ipc_python(spark, out)
    assert back.count() == 100
    total = back.agg(F.sum("v").alias("s")).head()["s"]
    assert total == sum(2 * i for i in range(100))


def test_ipc_reader_without_manifest_reads_everything(spark, tmp_path):
    # Directories NOT produced by write_ipc (no _SUCCESS) keep the old
    # behavior: every container under the path is read.
    import pyarrow as pa
    import pyarrow.ipc as pipc

    from tabular_to_parquet_spark.sources.columnar import read_ipc_python

    d = tmp_path / "plain_ipc"
    d.mkdir()
    for i, name in enumerate(["a.arrow", "b.arrow"]):
        t = pa.table({"k": pa.array([i], type=pa.int64())})
        with pipc.new_file(str(d / name), t.schema) as w:
            w.write_table(t)
    got = read_ipc_python(spark, str(d)).orderBy("k").collect()
    assert [r["k"] for r in got] == [0, 1]


# ---------------------------------------------------------------------------
# equi_depth_histogram — dyadic-bin validation survives python -O


@pytest.mark.parametrize("bad", [0, 3, 6, 100])
def test_equi_depth_histogram_rejects_non_dyadic_bins(spark, bad):
    from tabular_to_parquet_spark.operators.profiling import (
        equi_depth_histogram,
    )

    df = spark.range(0, 10).select(F.col("id").alias("x"))
    with pytest.raises(ValueError, match="power of two"):
        equi_depth_histogram(df, F.col("x"), n_bins=bad)


def test_equi_depth_histogram_accepts_dyadic_bins(spark):
    from tabular_to_parquet_spark.operators.profiling import (
        equi_depth_histogram,
    )

    df = spark.range(0, 16).select(F.col("id").alias("x"))
    rows = equi_depth_histogram(df, F.col("x"), n_bins=4).collect()
    assert sum(r["n"] for r in rows) == 16


# ---------------------------------------------------------------------------
# importance_sample — max_score overflow guard


@pytest.mark.parametrize("bad", [0, -5, 2**63 // 1_000_000 + 1])
def test_importance_sample_rejects_unsafe_max_score(spark, bad):
    from tabular_to_parquet_spark.operators.pipeline import importance_sample

    df = spark.range(0, 10).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("q")
    )
    with pytest.raises(ValueError, match="max_score"):
        importance_sample(df, F.col("q"), max_score=bad, id_col="doc_id")


def test_importance_sample_boundary_max_score_accepted(spark):
    from tabular_to_parquet_spark.operators.pipeline import importance_sample

    bound = 2**63 // 1_000_000
    df = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.lit(bound).alias("q")
    )
    # score == max_score → acceptance probability 1: every row kept,
    # and the boundary product u * max_score must not overflow (the
    # query runs under whatever ANSI setting the session carries).
    kept = importance_sample(df, F.col("q"), max_score=bound, id_col="doc_id")
    assert kept.count() == 50
