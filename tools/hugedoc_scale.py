"""Huge-document tail measurement for the exact-substring family
(r12 verdict item 6).

SCALE §18's salted corpus has benchmark-shaped documents (KBs); the
``chunk_chars`` mechanism (dedup.py `_char_windows_chunked`) is
value-invariance-TESTED but its wall/memory behavior at the realistic
document-length tail — single documents of many MB, where the
unchunked `F.sequence(1, len)` materializes one multi-million-element
array per row — was unmeasured.  This tool:

1. builds (once, reused at /tmp/hugedoc_corpus) a mixture corpus:
   the sf0.1 documents table PLUS four synthetic huge documents of
   ~4/8/16/24 MB of unique sha2-chain text, two of which carry an
   identical planted 312-char span (so the span algebra has real
   cross-huge-doc work to do);
2. runs d22 `substring_duplicate_spans` over the mixture WITH
   ``chunk_chars=4096`` (the two-level scan's recommended knob —
   KB-scale, because Spark's substring walks O(offset) so the chunk
   size bounds the per-window scan cost, not just the per-row array)
   and WITHOUT chunking, recording wall seconds and peak process-tree
   RSS (the cli_soak poller methodology — local mode, so the tree is
   the python driver + the executor JVM);
3. asserts the two runs' pair rows are IDENTICAL (the value-invariance
   contract, now exercised at the tail, not just at fixture size);
4. prints one JSON line per run for the SCALE.md ledger.

Usage: python tools/hugedoc_scale.py [sizes_mb="4,8,16,24"]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.cli_soak_100x import _rss_kb, _tree_pids

BASE = "/root/testdata/sf0.1"
CORPUS_DIR = "/tmp/hugedoc_corpus"
PHRASE = (
    "shared planted span for the huge document tail measurement "
    "abcdefghijklmnopqrstuvwxyz 0123456789 "
) * 3  # 294 chars >> k=24: one long cross-doc island


def build_corpus(spark, sizes_mb: list[int]) -> str:
    out = os.path.join(CORPUS_DIR, "documents.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    from tabular_to_parquet_spark.sources.tables import load_table

    base = load_table(spark, BASE, "documents").select("doc_id", "text")
    parts = [base]
    for i, mb in enumerate(sizes_mb):
        n_chunks = (mb * 1_000_000) // 65  # 64 hex chars + separator
        huge = (
            spark.range(n_chunks)
            .select(
                F.lit(900_000_001 + i).alias("doc_id"),
                F.struct(
                    F.col("id"),
                    F.sha2(
                        F.concat(F.lit(f"hd{i}_"),
                                 F.col("id").cast("string")),
                        256,
                    ).alias("c"),
                ).alias("s"),
            )
            .groupBy("doc_id")
            .agg(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sort_array(F.collect_list("s")),
                        lambda s: s["c"],
                    ),
                ).alias("text")
            )
        )
        if i in (1, 2):  # the planted cross-huge-doc shared span
            huge = huge.select(
                "doc_id", F.concat(F.col("text"), F.lit(" " + PHRASE)).alias("text")
            )
        parts.append(huge)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(32).write.mode("overwrite").parquet(out)
    return out


def measured(label: str, fn, spark=None, timeout_sec: int | None = None):
    """Run fn, sampling peak tree RSS at 0.25 s (cli_soak methodology
    applied to the CURRENT process tree — local mode: python driver +
    executor JVM child).  With ``timeout_sec`` + ``spark``, a timer
    cancels all Spark jobs at the deadline — a leg that cannot finish
    (the unchunked scan's single-task skew) is recorded as an error
    row instead of eating the harness."""
    peak = {"kb": 0}
    stop = threading.Event()
    timer = None
    if timeout_sec and spark is not None:
        timer = threading.Timer(
            timeout_sec, lambda: spark.sparkContext.cancelAllJobs()
        )
        timer.daemon = True
        timer.start()

    def poll():
        me = os.getpid()
        while not stop.is_set():
            sizes = [_rss_kb(p) for p in _tree_pids(me)]
            peak["kb"] = max(peak["kb"], sum(sizes))
            stop.wait(0.25)

    th = threading.Thread(target=poll, daemon=True)
    th.start()
    t0 = time.monotonic()
    err = None
    result = None
    try:
        result = fn()
    except Exception as exc:  # noqa: BLE001 — OOM is a valid outcome here
        err = f"{type(exc).__name__}: {exc}"[:300]
    wall = round(time.monotonic() - t0, 1)
    stop.set()
    th.join(timeout=2)
    if timer is not None:
        timer.cancel()
    print(
        json.dumps(
            {
                "leg": label,
                "wall_sec": wall,
                "peak_tree_rss_gib": round(peak["kb"] / 1024 / 1024, 2),
                "error": err,
                "load1": round(os.getloadavg()[0], 2),
            }
        ),
        flush=True,
    )
    return result, err


def main() -> int:
    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1
                              else "4,8,16,24").split(",")]
    from tabular_to_parquet_spark.operators.dedup import (
        substring_duplicate_spans,
    )
    from tabular_to_parquet_spark.session import get_spark

    spark = get_spark("hugedoc-scale")
    path = build_corpus(spark, sizes)
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    n_chars = docs.agg(F.sum(F.length("text"))).first()[0]
    print(f"[hugedoc] corpus: {n_docs} docs, {n_chars / 1e6:.0f} M chars "
          f"(huge sizes {sizes} MB)", file=sys.stderr)

    results = {}
    for label, chunk in (("d22_chunked_4k", 4096), ("d22_unchunked", None)):
        rows, err = measured(
            label,
            lambda c=chunk: sorted(
                (r["doc_a"], r["doc_b"], r["lcs_len"], r["n_seed_hits"])
                for r in substring_duplicate_spans(
                    docs, k=24, max_df=6, chunk_chars=c
                ).collect()
            ),
            spark=spark,
            timeout_sec=int(os.environ.get("HUGEDOC_TIMEOUT", "1500")),
        )
        if err is None:
            results[label] = rows
    if len(results) == 2:
        a, b = results.values()
        same = a == b
        print(json.dumps({"value_invariant": same,
                          "n_pairs": len(next(iter(results.values())))}),
              flush=True)
        return 0 if same else 1
    return 0  # one leg failed (recorded) — the measurement stands


if __name__ == "__main__":
    raise SystemExit(main())
