"""Round-8 fifth-wave operators: Arrow IPC source (ipc1), n-gram
novelty (x40), fixed-point k-means (s08), autocorrelation (pr23), and
the streaming count-min build (st10).

Exact large-scale values are oracle-gated; these tests pin the
semantics on hand-built inputs."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.ipc as pipc
import pyarrow.parquet as pq
import pyspark.sql.functions as F

from tabular_to_parquet_spark.parity import extensions as _ext  # noqa: F401  (registers)
from tabular_to_parquet_spark.parity.catalog import CATALOG


def _write_docs(spark, rows):
    d = tempfile.mkdtemp(prefix="r8e_docs_")
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": ["s" for _ in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


# ---------------------------------------------------------------------------
# ipc — Arrow IPC source


def test_ipc_reader_file_and_stream_formats(spark, tmp_path):
    """One random-access (file-format, zstd) container + one
    stream-format (uncompressed) container in the same directory:
    both decode, values and timestamps survive exactly."""
    from tabular_to_parquet_spark.sources.columnar import read_ipc_python

    tbl = pa.table(
        {
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "s": pa.array(["a", "b", None, "d"]),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1, 12, 0, 0, 123456), None,
                 dt.datetime(1999, 12, 31, 23, 59, 59), dt.datetime(2024, 6, 1)],
                pa.timestamp("us"),
            ),
        }
    )
    d = tmp_path / "ipc"
    d.mkdir()
    with pipc.new_file(
        str(d / "a.arrow"), tbl.schema,
        options=pipc.IpcWriteOptions(compression="zstd"),
    ) as w:
        w.write_table(tbl.slice(0, 2))
    with pipc.new_stream(str(d / "b.arrows"), tbl.schema) as w:
        w.write_table(tbl.slice(2, 2))
    got = read_ipc_python(spark, str(d)).orderBy("k").collect()
    assert [r["k"] for r in got] == [1, 2, 3, 4]
    assert [r["s"] for r in got] == ["a", "b", None, "d"]
    assert got[0]["ts"] == dt.datetime(2024, 1, 1, 12, 0, 0, 123456)
    assert got[1]["ts"] is None
    assert got[2]["ts"] == dt.datetime(1999, 12, 31, 23, 59, 59)


def test_ipc_empty_directory_raises(spark, tmp_path):
    from tabular_to_parquet_spark.sources.columnar import read_ipc_python

    d = tmp_path / "empty"
    d.mkdir()
    try:
        read_ipc_python(spark, str(d))
        raised = False
    except Exception:
        raised = True
    assert raised


# ---------------------------------------------------------------------------
# x40 — n-gram novelty


def test_x40_duplicate_owns_nothing(spark):
    """Doc 1 (9 tokens) owns its two 8-grams; doc 2 with identical
    text owns none (owner = min doc_id); doc 3 (8 unique tokens) owns
    its single gram; a 7-token doc is excluded."""
    nine = " ".join(f"w{i}" for i in range(9))
    eight = " ".join(f"u{i}" for i in range(8))
    seven = " ".join(f"v{i}" for i in range(7))
    d = _write_docs(
        spark, [(1, nine, "en"), (2, nine, "en"), (3, eight, "en"), (4, seven, "en")]
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in CATALOG["x40_ngram_novelty"].spark(spark, d).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (1, 1, 1.0)


def test_x40_bounds_on_testdata(spark):
    rows = CATALOG["x40_ngram_novelty"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_grams"]
        assert abs(r["novelty"] - r["n_novel"] / r["n_grams"]) < 1e-12


# ---------------------------------------------------------------------------
# s08 — fixed-point k-means


def _write_embeddings(spark, d, vecs):
    pdf = pd.DataFrame(
        {
            "vec_id": list(range(1, len(vecs) + 1)),
            "embedding": [list(map(float, v)) for v in vecs],
            "label": [0] * len(vecs),
        }
    )
    sdf = spark.createDataFrame(pdf).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        F.col("label").cast("int").alias("label"),
    )
    sdf.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))


def test_s08_eight_distinct_vectors_stay_singletons(spark):
    """With exactly 8 well-separated vectors, every seed keeps only
    itself through both Lloyd rounds: 8 singleton clusters whose
    centroids are the fixed-pointed vectors themselves."""
    import math

    d = tempfile.mkdtemp(prefix="r8e_emb_")
    dim = 16
    vecs = []
    for i in range(8):
        v = [0.0] * dim
        v[2 * i] = 0.5 + 0.05 * i
        v[2 * i + 1] = -0.25
        vecs.append(v)
    _write_embeddings(spark, d, vecs)
    rows = CATALOG["s08_kmeans_fixed"].spark(spark, d).collect()
    assert len(rows) == 8 * dim
    for r in rows:
        assert r["n_members"] == 1
        expected = math.floor(float(vecs[r["cid"]][r["dim"]]) * 1048576.0)
        assert r["centroid_fixed"] == expected


def test_s08_partition_invariants_on_testdata(spark):
    rows = CATALOG["s08_kmeans_fixed"].spark(spark, "/root/testdata/sf0.001").collect()
    by_cid_dim0 = [r for r in rows if r["dim"] == 0]
    assert sum(r["n_members"] for r in by_cid_dim0) == 500
    counts = {}
    for r in rows:
        counts.setdefault(r["cid"], set()).add(r["n_members"])
    for cid, sizes in counts.items():
        assert len(sizes) == 1, f"cid {cid} has inconsistent member counts"


# ---------------------------------------------------------------------------
# pr23 — autocorrelation sufficient statistics


def test_pr23_hand_series(spark, tmp_path):
    """Daily counts 1,2,3,4 on four consecutive days: lag-1 pairs
    (1,2),(2,3),(3,4) and lag-2 pairs (1,3),(2,4) — exact sums; lags
    with no pairs emit no row."""
    t0 = dt.datetime(2024, 5, 1)
    rows, eid = [], 0
    for day, n in enumerate([1, 2, 3, 4]):
        for _ in range(n):
            eid += 1
            rows.append((eid, t0 + dt.timedelta(days=day, hours=2)))
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [1] * len(rows),
            "event_type": ["a"] * len(rows),
            "value": [1.0] * len(rows),
            "props": [""] * len(rows),
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r["lag"]: (r["n_pairs"], r["sum_x"], r["sum_y"],
                   r["sum_xy"], r["sum_x2"], r["sum_y2"])
        for r in CATALOG["pr23_autocorrelation"].spark(spark, str(tmp_path)).collect()
    }
    assert got[1] == (3, 6, 9, "20", "14", "29")
    assert got[2] == (2, 3, 7, "11", "5", "25")
    assert got[3] == (1, 1, 4, "4", "1", "16")
    assert set(got) == {1, 2, 3}


# ---------------------------------------------------------------------------
# st10 — streaming CMS linearity


def test_st10_matches_batch_sketch_on_hand_docs(spark):
    """The drained streaming sketch must equal the one-shot batch
    sketch cell-for-cell — CMS is linear, so the micro-batch cut
    cannot matter."""
    from tabular_to_parquet_spark.operators import sketches as sk

    rows = [
        (1, "alpha beta gamma alpha", "en"),
        (2, "beta beta delta", "en"),
        (3, "gamma alpha", "en"),
    ]
    d = _write_docs(spark, rows)
    streamed = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in CATALOG["st10_stream_countmin"].spark(spark, d).collect()
    }
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    batch = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in sk.cms_build(sk.token_counts(docs)).collect()
    }
    assert streamed == batch
    assert sum(v for (j, _), v in streamed.items() if j == 0) == 9  # 9 tokens


# ---------------------------------------------------------------------------
# g07 — local clustering coefficient


def test_g07_triangle_plus_pendant(spark, tmp_path):
    """Graph: triangle 1-2-3 plus pendant 4 attached to 1. Node 1 has
    deg 3, one closed wedge of three -> cc = 2*1/(3*2) = 1/3; nodes
    2,3 have deg 2, cc = 1.0; node 4 deg 1 -> cc = 0."""
    import itertools

    orders = []
    ok = 0
    for pair in [(1, 2), (1, 2), (2, 3), (2, 3), (1, 3), (1, 3), (1, 4), (1, 4)]:
        ok += 1
        orders.append((ok, pair[0]))
        orders.append((ok, pair[1]))
    pdf = pd.DataFrame(
        {
            "l_orderkey": [o[0] for o in orders],
            "l_partkey": [o[1] for o in orders],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = {
        r["node"]: (r["deg"], r["n_triangles"], r["local_cc"])
        for r in CATALOG["g07_local_clustering"].spark(spark, str(tmp_path)).collect()
    }
    assert got[1] == (3, 1, 2.0 * 1 / (3 * 2))
    assert got[2] == (2, 1, 1.0)
    assert got[3] == (2, 1, 1.0)
    assert got[4] == (1, 0, 0.0)


def test_g07_cc_bounds_and_triangle_total(spark):
    from tabular_to_parquet_spark.operators import graph as g
    from tabular_to_parquet_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = CATALOG["g07_local_clustering"].spark(spark, sf).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["local_cc"] <= 1.0
        assert r["n_triangles"] >= 0
    # per-node triangle counts sum to 3x the global count
    edges = g.copurchase_edges_threshold(
        load_table(spark, sf, "lineitem"), min_orders=2
    ).filter(F.col("src") < F.col("dst"))
    n_tri = g.triangle_count(edges).collect()[0]["n_triangles"]
    assert sum(r["n_triangles"] for r in rows) == 3 * n_tri


# ---------------------------------------------------------------------------
# ipc2 — stringly IPC through inference


def test_ipc2_infers_types(spark):
    df = CATALOG["ipc2_string_inference"].spark(spark, "/root/testdata/sf0.001")
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds["l_orderkey"] == "bigint"
    assert kinds["l_quantity"] == "double"
    assert kinds["l_returnflag"] == "string"
    assert kinds["l_shipdate"].startswith("timestamp")


# ---------------------------------------------------------------------------
# write_ipc — export sink


def test_write_ipc_manifest_and_values(spark, tmp_path):
    from tabular_to_parquet_spark.sources.columnar import (
        read_ipc_python,
        write_ipc,
    )

    src = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    out = str(tmp_path / "ipc_out")
    manifest = write_ipc(src.repartition(3), out)
    assert sum(r for _f, r in manifest) == 100
    assert len(manifest) <= 3
    success = (tmp_path / "ipc_out" / "_SUCCESS").read_text()
    assert len(success.strip().splitlines()) == len(manifest)
    back = read_ipc_python(spark, out)
    assert back.count() == 100
    assert back.agg(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(100))


def test_write_ipc_skips_empty_partitions(spark, tmp_path):
    from tabular_to_parquet_spark.sources.columnar import write_ipc

    src = spark.range(0, 2).select(F.col("id").alias("k"))
    out = str(tmp_path / "ipc_sparse")
    manifest = write_ipc(src.repartition(8), out)
    # 2 rows over 8 partitions: only non-empty partitions emit a file
    assert sum(r for _f, r in manifest) == 2
    assert all(r > 0 for _f, r in manifest)
