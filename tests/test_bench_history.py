"""bench history reconstruction + regression flag (r10 verdict item 5):
BENCH_HISTORY.csv is the committed per-query time series (BENCH_r07–r09
have parsed:null, so git history of BENCH_LOCAL.json is the only
complete record), and bench.py flags any query >1.5× its trailing-3
comparable-snapshot min."""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "bench_history",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "bench_history.py"),
)
bh = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bh)


def _snap(commit, idle=True, sf=0.1, **queries):
    return {"commit": commit, "date": "2026-08-01T00:00:00+00:00",
            "idle": idle, "sf": sf, "reps": 3,
            "queries": {k: float(v) for k, v in queries.items()}}


def test_flag_triggers_above_factor():
    snaps = [_snap("a", q1=1.0), _snap("b", q1=1.2), _snap("c", q1=1.1)]
    flagged = bh.flag_regressions(snaps, {"q1": 1.6})
    assert "q1" in flagged and flagged["q1"]["baseline_sec"] == 1.0
    assert flagged["q1"]["ratio"] == 1.6


def test_flag_quiet_below_factor():
    snaps = [_snap("a", q1=1.0), _snap("b", q1=1.2)]
    assert bh.flag_regressions(snaps, {"q1": 1.4}) == {}


def test_flag_window_is_trailing():
    # an old fast run outside the window must not set the baseline
    snaps = [_snap(c, q1=v) for c, v in
             [("a", 0.5), ("b", 2.0), ("c", 2.1), ("d", 2.2)]]
    assert bh.flag_regressions(snaps, {"q1": 1.0}, window=3) == {}
    # ... but inside the window it does
    assert "q1" in bh.flag_regressions(snaps, {"q1": 1.0}, window=4)


def test_flag_ignores_non_idle_and_other_sf():
    snaps = [
        _snap("a", idle=False, q1=0.1),   # load-confounded: not a baseline
        _snap("b", sf=0.01, q1=0.1),      # different scale: not comparable
        _snap("c", q1=1.0),
    ]
    assert bh.flag_regressions(snaps, {"q1": 1.2}) == {}


def test_flag_new_query_has_no_baseline():
    assert bh.flag_regressions([_snap("a", q1=1.0)], {"brand_new": 9.9}) == {}


def test_csv_roundtrip(tmp_path):
    snaps = [_snap("a", q1=1.0, q2=2.5), _snap("b", idle=False, q1=1.1)]
    p = str(tmp_path / "hist.csv")
    bh.write_csv(snaps, p)
    back = bh.read_csv(p)
    assert back == snaps


def test_read_csv_missing_file_is_empty(tmp_path):
    assert bh.read_csv(str(tmp_path / "absent.csv")) == []


def test_committed_history_loads_and_matches_local():
    """The committed CSV exists and its newest snapshot agrees with the
    committed BENCH_LOCAL.json on some overlapping query."""
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snaps = bh.read_csv(os.path.join(repo, "BENCH_HISTORY.csv"))
    assert len(snaps) >= 10
    with open(os.path.join(repo, "BENCH_LOCAL.json")) as fh:
        local = json.load(fh)
    newest = snaps[-1]["queries"]
    overlap = set(newest) & set(local["queries"])
    assert len(overlap) >= 50
