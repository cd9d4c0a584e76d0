"""bench.py --only subset runner (r11 verdict item 2): a regex subset
runs with the same timing/JSON output shape and never overwrites the
committed full-suite BENCH_LOCAL.json snapshot."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_subset_run_shape_and_no_snapshot_write(tmp_path):
    local = os.path.join(REPO, "BENCH_LOCAL.json")
    before = open(local).read() if os.path.exists(local) else None
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_REPS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--only", "^dedup_exact$"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    # same JSON shape as a full run, subset-marked
    assert payload["metric"] == "bench_total_sec"
    assert payload["subset"] == "^dedup_exact$"
    assert list(payload["queries"]) == ["dedup_exact"]
    assert payload["queries"]["dedup_exact"] > 0
    assert payload["canary_sha256_sec"] > 0
    assert payload["canary_spark_noop_sec"] > 0
    # the CSV-consuming setup was skipped (no convert query selected)
    assert payload["lines"] == 0
    assert payload["convert_lines_per_sec"] is None
    # the committed full-suite snapshot is untouched
    after = open(local).read() if os.path.exists(local) else None
    assert after == before
    assert "BENCH_LOCAL.json NOT written" in out.stderr
