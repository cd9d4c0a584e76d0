"""Parser expression unit vectors — ports of reference
tests/utils_tests.rs plus the F5 vectors in FIXTURES.md."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F

from tabular_to_parquet_spark.functions import (
    normalize_nulls,
    parse_binary,
    parse_bool,
    parse_date,
    parse_float64,
    parse_int64,
    parse_string,
    parse_timestamp,
    parse_timestamp_ms,
    parse_uint64,
)


def run_parser(spark, builder, values, **kw):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = df.select(builder(F.col("v"), **kw).alias("r")).collect()
    return [r.r for r in out]


# --- P1 null tokens (utils_tests.rs:5-13) ---------------------------------

def test_null_tokens(spark):
    vals = ["", " ", "NULL", "None", "NaN", "n/a", "NA", "na", "0", "false", "x", None]
    got = run_parser(spark, normalize_nulls, vals)
    assert got == [None, None, None, None, None, None, None, None, "0", "false", "x", None]


# --- P2 booleans (utils_tests.rs:15-24) -----------------------------------

def test_bool_tokens(spark):
    vals = ["true", "1", "t", "y", "YES", "on", "false", "0", "f", "n", "No", "OFF",
            "maybe", "", "TRUE "]
    got = run_parser(spark, parse_bool, vals)
    assert got == [True, True, True, True, True, True,
                   False, False, False, False, False, False,
                   None, None, True]


# --- P3/P4 integers (analyse.rs:128-162) ----------------------------------

def test_int64(spark):
    vals = ["1", "-1", "+5", " 42 ", "9223372036854775807", "9223372036854775808",
            "-9223372036854775808", "-9223372036854775809", "1.5", "1e3", "abc", ""]
    got = run_parser(spark, parse_int64, vals)
    assert got == [1, -1, 5, 42, 2**63 - 1, None, -(2**63), None, None, None, None, None]


def test_uint64_long(spark):
    # long-mode lowering: values above i64::MAX null out (documented
    # divergence; the decimal lowering below keeps full u64 range)
    vals = ["0", "7", "-1", "9223372036854775807", "9223372036854775808", "1.0", ""]
    got = run_parser(spark, parse_uint64, vals)
    assert got == [0, 7, None, 2**63 - 1, None, None, None]


def test_uint64_decimal(spark):
    vals = ["18446744073709551615", "18446744073709551616", "9223372036854775808", "-1"]
    got = run_parser(spark, parse_uint64, vals, as_decimal=True)
    assert got == [Decimal(2**64 - 1), None, Decimal(2**63), None]


# --- P5 floats (analyse.rs:164-180) ---------------------------------------

def test_float64(spark):
    vals = ["3.14", "-2.5", "1e3", "2E-2", ".5", "3.", "+1.5", "42",
            "inf", "-inf", "Infinity", "nan", "NaN", "abc", "1_0", ""]
    got = run_parser(spark, parse_float64, vals)
    assert got == [3.14, -2.5, 1000.0, 0.02, 0.5, 3.0, 1.5, 42.0,
                   None, None, None, None, None, None, None, None]


# --- P6 dates (utils_tests.rs:26-33) --------------------------------------

def test_dates(spark):
    vals = ["1970-01-01", "02/01/1970", "2024-12-31", "12/31/2024", "31/12/2024",
            "invalid", "2024-13-01", ""]
    got = run_parser(spark, parse_date, vals)
    d = datetime.date
    # 02/01/1970 → Jan 2 (day-first wins); 12/31/2024 falls through to M/d/yyyy
    assert got == [d(1970, 1, 1), d(1970, 1, 2), d(2024, 12, 31), d(2024, 12, 31),
                   d(2024, 12, 31), None, None, None]


# --- P7/P8 timestamps (utils_tests.rs:35-44, utils.rs:81-118) -------------

def test_timestamp_ms_text(spark):
    vals = [
        "1970-01-01 00:00:01",            # → 1000 ms
        "1970-01-01T00:00:01",            # T separator
        "2024-01-01 12:00:00.123",        # ms fraction
        "2024-01-01 12:00:00.123456",     # truncated to ms
        "2024-01-01 12:00:00.9999",       # truncate, not round
        "02/01/1970 00:00:00",            # d/M/Y → Jan 2
        "1970/01/02 00:00:00",            # Y/m/d
        "2024-01-01T00:00:00+02:00",      # offset → NULL at conversion
        "not a ts",
        "",
    ]
    got = run_parser(spark, parse_timestamp_ms, vals)
    day_ms = 86400000
    assert got == [
        1000, 1000,
        1704110400123, 1704110400123, 1704110400999,
        day_ms, day_ms,
        None, None, None,
    ]


def test_timestamp_ms_epoch_windows(spark):
    vals = [
        "1000000000",           # s window → 1e12 ms (utils_tests.rs:41-43)
        "3999999999",           # top of s window
        "4000000000",           # out of window → NULL
        "5000000000",           # out of window → NULL
        "999999999",            # below s window (9 digits) → NULL
        "1500000000000",        # ms window → identity
        "1500000000000000",     # µs window → /1000
        "1500000000000000999",  # ns window → /1e6 (truncating)
        "999999999999999999",   # gap between µs and ns windows → NULL
    ]
    got = run_parser(spark, parse_timestamp_ms, vals)
    assert got == [
        1000000000000, 3999999999000, None, None, None,
        1500000000000, 1500000000000, 1500000000000, None,
    ]


def test_timestamp_unit_truncation(spark):
    # a seconds-unit column floor-truncates ms (analyse.rs:201-204)
    vals = ["2024-01-01 00:00:01.999"]
    got_s = run_parser(spark, parse_timestamp, vals, unit="s")
    got_ms = run_parser(spark, parse_timestamp, vals, unit="ms")
    got_us = run_parser(spark, parse_timestamp, vals, unit="us")
    dt = datetime.datetime
    assert got_s == [dt(2024, 1, 1, 0, 0, 1)]
    assert got_ms == [dt(2024, 1, 1, 0, 0, 1, 999000)]
    assert got_us == [dt(2024, 1, 1, 0, 0, 1, 999000)]


# --- P10/P11 strings & binary ---------------------------------------------

def test_string_passthrough(spark):
    vals = ["  padded  ", "x", "NULL", ""]
    got = run_parser(spark, parse_string, vals)
    assert got == ["  padded  ", "x", None, None]


def test_binary(spark):
    got = run_parser(spark, parse_binary, ["abc", "NULL"])
    assert got == [bytearray(b"abc"), None]


def test_pathological_epochs_null_not_crash(spark):
    # ANSI mode is on: these must NULL, never throw (overflow guards)
    vals = ["9" * 30, "9" * 38, "1" + "0" * 37, "99999999999999999999999"]
    got_ms = run_parser(spark, parse_timestamp_ms, vals)
    # the 23-digit value: /1e6 → 1e17 ms fits i64 (reference-identical);
    # the rest exceed i64 ms and null out instead of crashing
    assert got_ms == [None, None, None, 99999999999999999]
    got_ts = run_parser(spark, parse_timestamp, vals, unit="ns")
    assert got_ts == [None, None, None, None]  # µs overflow → NULL


# --- Unicode whitespace trim (ADVICE r1: Rust str::trim strips the full
# --- Unicode White_Space set; Java \s is ASCII-only) ----------------------

def test_unicode_whitespace_null_tokens(spark):
    vals = ["\xa0null\xa0", "\xa0", "\u2003NaN\u2003", "\u3000", "\xa0keep\xa0"]
    got = run_parser(spark, normalize_nulls, vals)
    assert got == [None, None, None, None, "\xa0keep\xa0"]


def test_unicode_whitespace_int_cast(spark):
    # the reference trims NBSP-padded integers before parsing
    vals = ["\xa07\xa0", "\u20287\u2029", "\x1f7\x1f"]  # \x1f is NOT White_Space
    got = run_parser(spark, parse_int64, vals)
    assert got == [7, 7, None]


def test_unicode_whitespace_inference_agrees_with_cast(spark):
    """An NBSP-padded int column must be inferred int-like AND cast
    successfully (the r1 bug: inference said int64, conversion nulled
    100% of values)."""
    from tabular_to_parquet_spark.plans.inference import infer_from_rows

    rows = [["\xa0%d\xa0" % i] for i in range(20)]
    [lt] = infer_from_rows(1, rows)
    assert lt.kind in ("int64", "uint64")
    got = run_parser(spark, parse_int64, [r[0] for r in rows])
    assert got == list(range(20))
