"""Delimiter sniffing vectors (F6, reference src/utils.rs:121-137)."""

from __future__ import annotations

from tabular_to_parquet_spark.sources.sniff import detect_delimiter, detect_delimiter_in_line


def test_basic_delimiters(tmp_path):
    cases = {
        "a,b,c\n1,2,3\n": ",",
        "a;b;c\n": ";",
        "a\tb\tc\n": "\t",
        "a|b|c\n": "|",
    }
    for content, want in cases.items():
        p = tmp_path / "f.csv"
        p.write_text(content)
        assert detect_delimiter(str(p)) == want


def test_max_count_wins():
    # ',' twice vs ':' once → comma
    assert detect_delimiter_in_line("a,b,c:d\n") == ","
    # ':' three times beats ',' twice
    assert detect_delimiter_in_line("a:b:c:d,e,f\n") == ":"


def test_tie_goes_to_last_candidate():
    # Rust max_by_key returns the LAST max: no delimiter at all → ' '
    assert detect_delimiter_in_line("abc\n") == " "
    # ',' and ';' once each → ';' (later in candidate order)
    assert detect_delimiter_in_line("a,b;c\n") == ";"
