"""CLI soak at 100x for the r10 wire formats (r10 verdict item 7).

The warc/tar/xlsx e2e tests drive the CLI at sf0.01 only; the 100x
legs in tools/scale_100x.py drive the LIBRARY.  This tool drives the
actual `python -m tabular_to_parquet_spark.cli` subprocess over 100x
archive directories and records wall clock + peak RSS via
`/usr/bin/time -v` — the measurement that catches driver-side memory
surprises (the XLSX shared-strings table was the flagged risk) before
a user does.

Peak-RSS methodology (no GNU time in this container): a poller thread
samples /proc/<pid>/status VmRSS for the CLI process and all its
descendants (python driver -> local JVM -> Python workers) every
0.25 s and records both the peak single-process RSS (the JVM) and the
peak tree-total RSS; VmHWM of survivors is folded in at exit.

Setup (untimed): the same generation halves as scale_100x.py's
tar/xlsx/warc legs, but over a x`copies` exploded frame —
- tar:  stringly 4-col lineitem x copies, one single-member .tar.gz
  per partition (~470k rows each at 100x);
- xlsx: same frame, partition count keeps every sheet under the
  1,048,576-row OOXML limit;
- warc: documents x copies through the distributed write_warc sink
  (member-per-record .warc.gz + _SUCCESS manifest).

Usage:
  python tools/cli_soak_100x.py setup [copies]   # build archive dirs
  python tools/cli_soak_100x.py run   [copies]   # timed CLI runs
"""

from __future__ import annotations

import io
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def work_dir(copies: int) -> str:
    return f"/tmp/cli_soak_{copies}x"


def _exploded_stringly_lineitem(spark, copies: int):
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
    frame = li.select(
        F.col("l_orderkey").cast("string"),
        F.col("l_quantity").cast("string"),
        F.col("l_returnflag").cast("string"),
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss.SSS").alias(
            "l_shipdate"
        ),
    )
    return frame.withColumn(
        "_copy", F.explode(F.array(*[F.lit(i) for i in range(copies)]))
    ).drop("_copy")


def setup(copies: int) -> None:
    import shutil
    import uuid

    import pandas as pd

    from pyspark.sql import functions as F

    from tabular_to_parquet_spark.session import get_spark
    from tabular_to_parquet_spark.sources.warc import write_warc
    from tabular_to_parquet_spark.sources.xlsx_source import write_xlsx

    spark = get_spark("cli-soak-setup")
    spark.sparkContext.setLogLevel("ERROR")
    wd = work_dir(copies)
    os.makedirs(wd, exist_ok=True)
    cols = ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"]

    n_rows = (
        spark.read.parquet(os.path.join(BASE, "lineitem.parquet")).count()
        * copies
    )

    # --- tar ---------------------------------------------------------
    tar_dir = os.path.join(wd, "tar_arch")
    if not os.path.exists(os.path.join(tar_dir, "_DONE")):
        shutil.rmtree(tar_dir, ignore_errors=True)
        os.makedirs(tar_dir)
        t0 = time.monotonic()

        def dump_tar(batches):
            import tarfile

            buf = io.StringIO()
            buf.write(",".join(cols) + "\n")
            n = 0
            for pdf in batches:
                pdf.to_csv(buf, index=False, header=False)
                n += len(pdf)
            if n:
                data = buf.getvalue().encode("utf-8")
                name = os.path.join(
                    tar_dir, f"dump-{uuid.uuid4().hex}.tar.gz"
                )
                with tarfile.open(name, "w:gz") as tf:
                    info = tarfile.TarInfo("member.csv")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
            yield pd.DataFrame({"n": [n]})

        parts = max(32, n_rows // 470_000 + 1)
        _exploded_stringly_lineitem(spark, copies).repartition(
            parts
        ).mapInPandas(dump_tar, "n long").collect()
        open(os.path.join(tar_dir, "_DONE"), "w").close()
        print(f"tar setup: {time.monotonic() - t0:.0f}s, {parts} archives")

    # --- xlsx --------------------------------------------------------
    xlsx_dir = os.path.join(wd, "xlsx_books")
    if not os.path.exists(os.path.join(xlsx_dir, "_DONE")):
        shutil.rmtree(xlsx_dir, ignore_errors=True)
        os.makedirs(xlsx_dir)
        t0 = time.monotonic()

        def dump_xlsx(batches):
            rows = [cols]
            for pdf in batches:
                rows.extend(
                    [str(v) for v in row]
                    for row in pdf.itertuples(index=False)
                )
            if len(rows) > 1:
                assert len(rows) <= 1_048_576, "partition exceeds sheet limit"
                write_xlsx(
                    rows, os.path.join(xlsx_dir, f"book-{uuid.uuid4().hex}.xlsx")
                )
            yield pd.DataFrame({"n": [len(rows) - 1]})

        parts = max(96, n_rows // 900_000 + 1)
        _exploded_stringly_lineitem(spark, copies).repartition(
            parts
        ).mapInPandas(dump_xlsx, "n long").collect()
        open(os.path.join(xlsx_dir, "_DONE"), "w").close()
        print(f"xlsx setup: {time.monotonic() - t0:.0f}s, {parts} books")

    # --- warc --------------------------------------------------------
    warc_dir = os.path.join(wd, "warc_arch")
    if not os.path.exists(os.path.join(warc_dir, "_SUCCESS")):
        shutil.rmtree(warc_dir, ignore_errors=True)
        t0 = time.monotonic()
        docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
        frame = (
            docs.withColumn(
                "_copy",
                F.explode(F.array(*[F.lit(i) for i in range(copies)])),
            )
            .select(
                F.concat(
                    F.lit("http://corpus.example/doc/"),
                    F.col("doc_id"),
                    F.lit("/"),
                    F.col("_copy"),
                ).alias("target_uri"),
                F.timestamp_seconds(
                    F.lit(1709251200) + F.col("doc_id")
                ).alias("warc_date"),
                F.encode(F.col("text"), "UTF-8").alias("http_body"),
            )
        )
        write_warc(frame.repartition(64), warc_dir)
        print(f"warc setup: {time.monotonic() - t0:.0f}s, 64 archives")


def _tree_pids(root: int) -> list[int]:
    pids, stack = [], [root]
    while stack:
        pid = stack.pop()
        pids.append(pid)
        try:
            for tid in os.listdir(f"/proc/{pid}/task"):
                with open(f"/proc/{pid}/task/{tid}/children") as fh:
                    stack.extend(int(c) for c in fh.read().split())
        except OSError:
            continue
    return pids


def _rss_kb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as fh:
            m = re.search(r"VmRSS:\s+(\d+) kB", fh.read())
            return int(m.group(1)) if m else 0
    except OSError:
        return 0


def run(copies: int, only: str = "") -> None:
    import threading

    wd = work_dir(copies)
    results = {}
    for fmt, src in (
        ("tar", os.path.join(wd, "tar_arch")),
        ("xlsx", os.path.join(wd, "xlsx_books")),
        ("warc", os.path.join(wd, "warc_arch")),
    ):
        if only and fmt != only:
            continue
        out = os.path.join(wd, f"out_{fmt}.parquet")
        cmd = [
            sys.executable, "-m", "tabular_to_parquet_spark.cli",
            src, "--format", fmt, "--output", out,
        ]
        t0 = time.monotonic()
        proc = subprocess.Popen(
            cmd,
            cwd=REPO,
            env={**os.environ, "PYTHONPATH": REPO},
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        peak = {"proc": 0, "tree": 0}
        stop = threading.Event()

        def poll():
            while not stop.is_set():
                sizes = [_rss_kb(p) for p in _tree_pids(proc.pid)]
                if sizes:
                    peak["proc"] = max(peak["proc"], max(sizes))
                    peak["tree"] = max(peak["tree"], sum(sizes))
                stop.wait(0.25)

        th = threading.Thread(target=poll, daemon=True)
        th.start()
        proc.wait()
        stop.set()
        th.join()
        wall = time.monotonic() - t0
        rss_kb = peak["proc"]
        import duckdb

        rows = duckdb.sql(
            f"SELECT count(*) FROM '{out}/*.parquet'"
        ).fetchone()[0]
        results[fmt] = {
            "exit": proc.returncode,
            "wall_s": round(wall, 1),
            "peak_rss_gib": round(rss_kb / 1024 / 1024, 2) if rss_kb else None,
            "peak_tree_rss_gib": round(peak["tree"] / 1024 / 1024, 2),
            "rows_out": rows,
        }
        print(json.dumps({fmt: results[fmt]}), flush=True)
        if proc.returncode != 0:
            print(proc.stderr.read()[-2000:], file=sys.stderr)
    print(json.dumps({"copies": copies, "results": results}))


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "setup"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    if mode == "setup":
        setup(copies)
    elif mode == "run":
        run(copies, sys.argv[3] if len(sys.argv) > 3 else "")
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
