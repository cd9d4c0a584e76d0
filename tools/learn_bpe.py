"""Regenerate the embedded BPE merges table (functions/bpe.py).

Usage:
    python tools/learn_bpe.py [documents.parquet] [n_merges]

Reads the fixture with pyarrow (no Spark needed), learns merges with
the pure-Python reference learner over the 1,000 smallest doc_ids, and
rewrites the ``BPE_MERGES`` assignment in functions/bpe.py in place.
Deterministic: same fixture + n_merges -> byte-identical table.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

from tabular_to_parquet_spark.functions.bpe import learn_bpe_merges

BPE_PY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tabular_to_parquet_spark",
    "functions",
    "bpe.py",
)


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/documents.parquet"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    tbl = pq.read_table(path, columns=["doc_id", "text"])
    rows = sorted(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )[:1000]
    merges = learn_bpe_merges([t for _, t in rows if t is not None], n_merges)
    body = "BPE_MERGES: list[tuple[str, str]] = [\n" + "".join(
        f"    ({x!r}, {y!r}),\n" for x, y in merges
    ) + "]\n"
    src = open(BPE_PY).read()
    new = re.sub(
        r"BPE_MERGES: list\[tuple\[str, str\]\] = \[[^\]]*\][^\n]*\n",
        body,
        src,
        count=1,
        flags=re.S,
    )
    assert new != src or body in src, "BPE_MERGES assignment not found"
    open(BPE_PY, "w").write(new)
    print(f"wrote {len(merges)} merges to {BPE_PY}")
    for m in merges[:10]:
        print(" ", m)


if __name__ == "__main__":
    main()
