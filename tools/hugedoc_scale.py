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
       python tools/hugedoc_scale.py --d25 [sizes_mb]   # d25 leg
                                                         (r13 item 3)
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


def build_corpus_d25(spark, sizes_mb: list[int]) -> str:
    """d25 mixture (r13 verdict item 3): the d22 corpus's huge
    unique-text docs PLUS the two within-document repetition shapes
    the self-repeat operator must survive at huge-doc scale:

    - 900000101 — ~8 MB of ONE ~1 KB block repeated ~8000x: every
      gram occurs ~8000 times, far above max_occ=8, so the occurrence
      cap must drop them all (score 0) INSTEAD of generating the
      ~8000^2/2 within-doc pair explosion — the cap's stress case;
    - 900000102 — ~4 MB of 500 distinct ~4 KB blocks, each appearing
      exactly twice in shuffled order: occurrences of 2 sit inside
      the cap, so essentially every char is self-duplicated
      (permille ≈ 1000) with bounded pair volume.
    """
    import hashlib
    import random as _random

    out = os.path.join(CORPUS_DIR + "_d25", "documents.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    from tabular_to_parquet_spark.sources.tables import load_table

    base = load_table(spark, BASE, "documents").select("doc_id", "text")
    parts = [base]
    for i, mb in enumerate(sizes_mb):
        n_chunks = (mb * 1_000_000) // 65
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
        parts.append(huge)

    def blk(tag: str, n: int) -> str:
        h = [hashlib.md5(f"{tag}{j}".encode()).hexdigest() for j in range(n)]
        return " ".join(h)  # n * 33 - 1 chars

    tandem = (blk("cap", 31) + " ") * 8000  # ~1 KB block x 8000 = ~8.2 MB
    blocks = [blk(f"dup{b}_", 124) for b in range(500)]  # ~4 KB each
    order = blocks * 2
    _random.Random(42).shuffle(order)
    moderate = " ".join(order)  # ~4 MB, every block exactly twice
    parts.append(
        spark.createDataFrame(
            [(900_000_101, tandem), (900_000_102, moderate)],
            "doc_id long, text string",
        )
    )
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


def main_d25(sizes: list[int]) -> int:
    """d25 huge-doc leg (r13 verdict item 3): self_repeated_char_
    fraction over the mixture with the two repetition stress docs;
    chunk_chars=4096 is the measured production knob, a 16384 leg
    checks value-invariance across chunk sizes at the tail (the
    unchunked quadratic is already §20-established on d22 — same
    window generator — so no canceled leg is repeated here)."""
    from tabular_to_parquet_spark.operators.dedup import (
        self_repeated_char_fraction,
    )
    from tabular_to_parquet_spark.session import get_spark

    spark = get_spark(
        "hugedoc-scale-d25",
        extra_conf=(
            {"spark.ui.enabled": "true"}
            if os.environ.get("HUGEDOC_UI") == "1"
            else None
        ),
    )
    path = build_corpus_d25(spark, sizes)
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    n_chars = docs.agg(F.sum(F.length("text"))).first()[0]
    print(f"[hugedoc-d25] corpus: {n_docs} docs, {n_chars / 1e6:.0f} M "
          f"chars (huge sizes {sizes} MB + 8MB tandem + 4MB dup-blocks)",
          file=sys.stderr)

    results = {}
    for label, chunk in (("d25_chunked_4k", 4096),
                         ("d25_chunked_16k", 16384)):
        rows, err = measured(
            label,
            lambda c=chunk: sorted(
                (r["doc_id"], r["n_chars"], r["self_dup_chars"],
                 r["self_dup_permille"])
                for r in self_repeated_char_fraction(
                    docs, k=24, max_occ=8, chunk_chars=c
                ).collect()
            ),
            spark=spark,
            timeout_sec=int(os.environ.get("HUGEDOC_TIMEOUT", "1500")),
        )
        if err is None:
            results[label] = rows
    if len(results) == 2:
        a, b = results.values()
        rows = next(iter(results.values()))
        by_id = {r[0]: r for r in rows}
        checks = {
            "value_invariant": a == b,
            "n_docs": len(rows),
            # the cap stress doc must score 0 (all grams above max_occ)
            "tandem_doc": by_id.get(900_000_101),
            # the in-cap doc must be essentially fully self-duplicated
            "dup_blocks_doc": by_id.get(900_000_102),
        }
        print(json.dumps(checks), flush=True)
        ok = (
            a == b
            and by_id[900_000_101][3] == 0
            and by_id[900_000_102][3] >= 990
        )
        return 0 if ok else 1
    return 0


def main() -> int:
    if "--d25" in sys.argv:
        sys.argv.remove("--d25")
        sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1
                                  else "4,8,16,24").split(",")]
        return main_d25(sizes)
    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1
                              else "4,8,16,24").split(",")]
    from tabular_to_parquet_spark.operators.dedup import (
        substring_duplicate_spans,
    )
    from tabular_to_parquet_spark.session import get_spark

    # HUGEDOC_UI=1 turns the Spark UI on (port 4040) for the stall
    # investigation (r13 NEXT queue): stage/task state and GC time
    # are visible while a leg runs
    spark = get_spark(
        "hugedoc-scale",
        extra_conf=(
            {"spark.ui.enabled": "true"}
            if os.environ.get("HUGEDOC_UI") == "1"
            else None
        ),
    )
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
