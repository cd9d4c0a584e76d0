"""Schema-inference vectors — ports of reference tests/schema_tests.rs
plus threshold / gate edge cases from SURVEY.md §1.3."""

from __future__ import annotations

from tabular_to_parquet_spark.plans.inference import (
    ColumnStats,
    decide_type,
    infer_from_rows,
    infer_schema,
    infer_schema_distributed,
    observe_value,
)


def infer_one(values: list[str]):
    s = ColumnStats()
    for v in values:
        observe_value(s, v)
    return decide_type(s)


# --- schema_tests.rs:14-28: small non-negative ints → UInt64, not Int64 ---

def test_small_positive_ints_are_unsigned():
    lt = infer_one(["1", "2", "3", "4", "5", "6"])
    assert lt.kind == "uint64" and not lt.uint_exceeds_i64


def test_negative_ints_are_signed():
    lt = infer_one(["1", "-2", "3", "-4"])
    assert lt.kind == "int64"


def test_uint_above_i64_max():
    lt = infer_one(["1", str(2**63 + 10)])
    assert lt.kind == "uint64" and lt.uint_exceeds_i64


def test_huge_ints_fall_to_float():
    lt = infer_one([str(2**64 + 10), "1"])
    assert lt.kind == "float64"


# --- schema_tests.rs:30-43: mixed bool/date/float columns -----------------

def test_fixture_mixte():
    rows = [["true", "2024-01-01", "3.14"], ["false", "2024-01-02", "2.71"]]
    types = infer_from_rows(3, rows)
    assert [t.kind for t in types] == ["bool", "date", "float64"]


# --- §1.3 subtleties -------------------------------------------------------

def test_all_null_column_is_string():
    assert infer_one(["NA", "", "null"]).kind == "string"


def test_null_tokens_excluded_from_ratios():
    # 2 bools + 3 nulls: ratio = 2/2 = 1.0 → bool
    assert infer_one(["true", "NA", "", "false", "None"]).kind == "bool"


def test_pure_digit_epochs_are_integers_not_timestamps():
    # the len≥8 + [-:T] gate blocks non-negative epochs (schema.rs:184)
    lt = infer_one(["1700000000", "1700000001"])
    assert lt.kind == "uint64"


def test_negative_big_ints_count_as_timestamps():
    # negatives DO pass the gate (contain '-') and hit the epoch detector
    lt = infer_one(["-123456789", "-234567890"])
    assert lt.kind == "timestamp" and lt.unit == "s"


def test_timestamp_unit_vote_default_ms():
    # datetime with no fractional part → precision 3 → ms (schema.rs:54)
    lt = infer_one(["2024-01-01 10:00:00", "2024-01-02 11:30:00"])
    assert lt.kind == "timestamp" and lt.unit == "ms"


def test_timestamp_unit_from_fraction():
    lt = infer_one(["2024-01-01 10:00:00.123456", "2024-01-02 11:30:00.654321"])
    assert lt.kind == "timestamp" and lt.unit == "us"
    lt = infer_one(["2024-01-01T10:00:00.123456789"])
    assert lt.kind == "timestamp" and lt.unit == "ns"


def test_naive_fraction_only_3_6_9_digits():
    # "%.2f" has no naive format (schema.rs:76-87) and no tz → not a ts;
    # also not float/int/date/bool → string
    lt = infer_one(["2024-01-01 10:00:00.12", "2024-01-01 10:00:00.34"])
    assert lt.kind == "string"


def test_tz_offsets_recognized_at_inference():
    # inference accepts offsets (schema.rs:58-67) though conversion nulls them
    lt = infer_one(["2024-01-01T00:00:00+02:00", "2024-01-01 01:00:00+0200"])
    assert lt.kind == "timestamp" and lt.unit == "ms"


def test_float_ratio_threshold():
    # 97 floats + 3 strings < 0.98 → string; 98+ → float
    vals = ["1.5"] * 97 + ["x", "y", "z"]
    assert infer_one(vals).kind == "string"
    vals = ["1.5"] * 98 + ["x", "y"]
    assert infer_one(vals).kind == "float64"


def test_int_without_float_syntax_stays_int():
    assert infer_one(["10", "20", "1e2"]).kind == "float64"  # 'e' seen → float
    assert infer_one(["10", "20", "30"]).kind == "uint64"


def test_negatives_ratio_rule():
    # 1 negative among 1000 ints → ratio 0.001 < 0.005 → still unsigned...
    # but UInt64 requires min ≥ 0! min is -1 → falls to Int64 branch.
    vals = ["5"] * 999 + ["-1"]
    assert infer_one(vals).kind == "int64"


# --- end-to-end: driver path and distributed path agree -------------------

TRICKY_CSV = """b,i,u,f,d,t,s,neg,epoch,mixed
true,-5,7,1.5,2024-01-01,2024-06-01 10:00:00,hello,-123456789,1700000000,1
false,-6,8,2.5,02/01/1970,2024-06-01T10:00:00.123,NA,-234567890,1700000001,x
on,7,9,3e2,12/31/2024,1970-01-01 00:00:01,world,-345678901,1700000002,2.5
OFF,8,10,.5,2024-02-29,2024-06-01 10:00:00.123456,NULL,-456789012,1700000003,true
1,-9,11,inf,invalid-is-rare,02/01/1970 00:00:00,x,-567890123,1700000004,2024-01-01
"""


def test_driver_vs_distributed_inference(spark, tmp_path):
    p = tmp_path / "tricky.csv"
    p.write_text(TRICKY_CSV)
    names, types_driver = infer_schema(str(p), ",")
    assert names == ["b", "i", "u", "f", "d", "t", "s", "neg", "epoch", "mixed"]

    from tabular_to_parquet_spark.sources.text import read_delimited_as_strings

    raw = read_delimited_as_strings(spark, str(p), ",", names)
    types_dist = infer_schema_distributed(raw)
    assert [
        (t.kind, t.unit, t.uint_exceeds_i64) for t in types_driver
    ] == [(t.kind, t.unit, t.uint_exceeds_i64) for t in types_dist]

    kinds = [t.kind for t in types_driver]
    assert kinds == [
        "bool", "int64", "uint64", "float64", "string",  # 4/5 dates < 0.995
        "timestamp", "string", "timestamp", "uint64", "string",
    ]


def test_inference_sample_skips_invalid_utf8_rows(tmp_path):
    """The reference's inference reader drops non-UTF-8 lines before
    observing them (conversion.rs:208 / schema.rs:317-320): a corrupted
    row must not sway the type decision."""
    from tabular_to_parquet_spark.plans.inference import infer_schema

    src = tmp_path / "dirty_sample.csv"
    rows = b"i\n" + b"".join(
        b"zzz\xff\n" if i % 3 == 0 else b"%d\n" % i for i in range(60)
    )
    src.write_bytes(rows)
    _names, [lt] = infer_schema(str(src), ",")
    # corrupted rows skipped -> remaining rows are pure ints
    assert lt.kind == "uint64"
