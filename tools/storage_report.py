"""Storage audit for converted parquet output: per-file codec,
row-group sizes, and compression ratio — the S6 sink contract made
inspectable (the reference's whole product is zstd parquet with
width-adaptive row groups; this shows whether an output actually
honors that).

Usage: python tools/storage_report.py <parquet file or directory>
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow.parquet as pq


def report(path: str) -> dict:
    files = (
        [path]
        if os.path.isfile(path)
        else sorted(glob.glob(os.path.join(path, "*.parquet")))
    )
    total_rows = total_comp = total_raw = 0
    codecs: set[str] = set()
    max_rg_rows = 0
    n_groups = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        total_rows += meta.num_rows
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            n_groups += 1
            max_rg_rows = max(max_rg_rows, g.num_rows)
            for c in range(g.num_columns):
                col = g.column(c)
                codecs.add(col.compression)
                total_comp += col.total_compressed_size
                total_raw += col.total_uncompressed_size
    return {
        "files": len(files),
        "rows": total_rows,
        "row_groups": n_groups,
        "max_row_group_rows": max_rg_rows,
        "codecs": sorted(codecs),
        "compressed_bytes": total_comp,
        "uncompressed_bytes": total_raw,
        "ratio": round(total_raw / total_comp, 2) if total_comp else None,
    }


if __name__ == "__main__":
    import json

    print(json.dumps(report(sys.argv[1] if len(sys.argv) > 1 else ".")))
