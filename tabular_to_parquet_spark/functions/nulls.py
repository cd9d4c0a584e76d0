"""Null-token normalization (operator P1, SURVEY.md §2.2).

Reference semantics (reference src/utils.rs:48-57, `est_null_texte`):
trim the value; empty → null; case-insensitive membership in
{null, none, nan, n/a, na} → null. Every cast builder applies this
before attempting a parse.

All builders are pure ``Column -> Column`` functions over built-in
expressions — JVM-side, whole-stage-codegen friendly; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: case-insensitive null tokens after trimming (utils.rs:53-56)
NULL_TOKENS = ("null", "none", "nan", "n/a", "na")

#: the exact Unicode White_Space set — Rust char::is_whitespace, i.e.
#: the reference's str::trim (utils.rs:49). Java's plain \s is
#: ASCII-only, which would let NBSP-padded values slip past the trim
#: (and disagree with the driver-side Python inference); a literal
#: enumeration keeps Spark (Java regex), DuckDB (RE2) and Python
#: (str.strip) bit-identical.
WHITESPACE = (
    "\t\n\x0b\x0c\r \x85\xa0 "
    "           "
    "    　"
)

def trimmed(c: Column) -> Column:
    """Whitespace-trim (utils.rs:49 `v.trim()`).

    ``btrim(str, trimStr)`` strips any leading/trailing characters in
    the set — same semantics as a ``^[ws]+|[ws]+$`` regex over the
    WHITESPACE class, but a codepoint set-membership loop instead of a
    regex engine pass: measured ~30% of conversion wall at sf0.1 when
    this was regexp_replace (the cast projection trims every column)."""
    return F.btrim(c, F.lit(WHITESPACE))


def is_null_token(c: Column) -> Column:
    """Boolean: value is a null token (utils.rs:48-57)."""
    t = trimmed(c)
    return c.isNull() | (t == "") | F.lower(t).isin(*NULL_TOKENS)


def normalize_nulls(c: Column) -> Column:
    """Null-token → NULL, else the original (untrimmed) string.

    Matches the reference converter, which stores the raw (untrimmed)
    string for string-typed columns (analyse.rs:252-274) but parses the
    trimmed text for every typed column.
    """
    return F.when(is_null_token(c), F.lit(None)).otherwise(c)
