"""logfmt source — ``key=value`` pairs per line (the de-facto
structured-logging wire format: Heroku, Grafana, Go kit). A fourth
wire format through the SAME format-agnostic pipeline: the scan
produces a string-typed frame, then the shared inference thresholds
and lenient cast builders own every type decision (cf. json_lines.py,
fixed_width.py).

Scan shape: ``spark.read.text`` → one ``regexp_extract`` per key — a
codegen'd projection, zero shuffles, splittable.

Value grammar (kept in the Java-regex ∩ Python-re subset so the
driver-side sampling twin matches the distributed scan exactly):
bare values are space-free runs; quoted values are double-quoted
without escapes. A missing key and an empty value both surface as
``""`` — which IS the engine's null token, so both become NULL after
the cast projection (documented collapse).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KEY_RE = re.compile(r'(?:^| )([A-Za-z_][A-Za-z0-9_]*)=')


def _value_pattern(key: str) -> str:
    """Regex with group 1 = quoted content, group 2 = bare value."""
    return rf'(?:^| ){re.escape(key)}=(?:"([^"]*)"|([^ ]*))'


def read_logfmt_keys(path: str, max_lines: int = 100) -> list[str]:
    """Column names = union of keys over the first ``max_lines``
    lines, in first-seen order (logfmt has no header line)."""
    names: list[str] = []
    seen: set[str] = set()
    with open(path, encoding="utf-8", errors="replace") as fh:
        for i, line in enumerate(fh):
            if i >= max_lines:
                break
            for m in _KEY_RE.finditer(line):
                k = m.group(1)
                if k not in seen:
                    seen.add(k)
                    names.append(k)
    return names


def read_logfmt_as_strings(
    spark: SparkSession, path: str, keys: list[str]
) -> DataFrame:
    """Distributed string-typed scan: one regexp per key; quoted
    content wins over the bare capture."""
    raw = spark.read.text(path)
    cols = []
    for k in keys:
        pat = _value_pattern(k)
        quoted = F.regexp_extract(F.col("value"), pat, 1)
        bare = F.regexp_extract(F.col("value"), pat, 2)
        cols.append(F.when(quoted != "", quoted).otherwise(bare).alias(k))
    return raw.select(*cols)


def _extract_line(line: str, keys: list[str]) -> list[str]:
    """Driver-side sampling twin of the Spark projection."""
    out = []
    for k in keys:
        m = re.search(_value_pattern(k), line)
        if m is None:
            out.append("")
        elif m.group(1):
            out.append(m.group(1))
        else:
            out.append(m.group(2) or "")
    return out


def convert_logfmt_to_parquet(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    infer_full: bool = False,
):
    """logfmt → typed parquet through the SAME inference + cast
    pipeline as the delimited / JSON-lines / fixed-width paths."""
    from tabular_to_parquet_spark.operators.convert import observed_typed_frame
    from tabular_to_parquet_spark.plans.inference import (
        infer_from_rows,
        infer_schema_distributed,
    )
    from tabular_to_parquet_spark.session import ensure_utc, restore_timezone

    from tabular_to_parquet_spark.operators.convert import first_data_file

    prior_tz = ensure_utc(spark)
    try:
        head = first_data_file(input_path)
        keys = read_logfmt_keys(head)
        raw = read_logfmt_as_strings(spark, input_path, keys)
        if infer_full:
            types = infer_schema_distributed(raw)
        else:
            rows = []
            with open(head, encoding="utf-8", errors="replace") as fh:
                for line in fh:
                    if len(rows) >= 1000:
                        break
                    rows.append(_extract_line(line.rstrip("\r\n"), keys))
            types = infer_from_rows(len(keys), rows)
        typed, obs = observed_typed_frame(raw, types)
        typed.write.mode("overwrite").option("compression", "zstd").parquet(
            output_path
        )
        return keys, types, obs.get
    finally:
        restore_timezone(spark, prior_tz)
