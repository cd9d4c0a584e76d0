"""Delimiter sniffing (operator S4, SURVEY.md §2.1).

Reference semantics (reference src/utils.rs:121-137): read the FIRST
line only; count occurrences of each of `, ; \\t | : space`; the most
frequent wins. Tie-breaking matches Rust's `Iterator::max_by_key`,
which returns the LAST equally-maximum element — so a line containing
no candidate at all yields ' ' (space), not ','.

Driver-side pure Python: one line of one file, no Spark job needed.
"""

from __future__ import annotations

import io

#: candidate delimiters, in the reference's order (utils.rs:127)
CANDIDATES = [",", ";", "\t", "|", ":", " "]


def detect_delimiter_in_line(line: str) -> str:
    """Pick the most frequent candidate in one line; ties → last."""
    best, best_count = CANDIDATES[0], -1
    for cand in CANDIDATES:
        n = line.count(cand)
        if n >= best_count:  # >= : last max wins, like Rust max_by_key
            best, best_count = cand, n
    return best


def detect_delimiter(path: str) -> str:
    """Sniff the delimiter from a file's first line (utils.rs:121-137);
    gzip-transparent via sources.text.open_text."""
    from tabular_to_parquet_spark.sources.text import open_text

    with open_text(path) as fh:
        line = fh.readline()
    return detect_delimiter_in_line(line)
