"""Per-query bench time series from BENCH_LOCAL.json's git history.

BENCH_r07–r09 recorded ``parsed: null`` (the driver clips long stdout
lines), so the only complete per-query record across rounds is the
committed BENCH_LOCAL.json at each commit.  This tool walks that
file's git history, extracts every snapshot's min-of-reps per-query
timings plus the machine-state stamps, and writes ONE committed CSV
(``BENCH_HISTORY.csv``) that downstream tooling — and bench.py's
regression flag — can read without touching git.

Regression rule (r10 verdict item 5): a query is flagged when its
fresh min-of-reps exceeds ``factor`` (default 1.5×) times the minimum
of its last ``window`` (default 3) comparable snapshots — same sf,
``idle_at_start`` true (the NEXT.md idle rule: non-idle snapshots are
noise-bounded only, never a regression baseline).

Usage:
    python tools/bench_history.py            # rebuild BENCH_HISTORY.csv
    python tools/bench_history.py --check    # rebuild + flag current
                                             # BENCH_LOCAL.json vs history
"""

from __future__ import annotations

import csv
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CSV_PATH = os.path.join(REPO, "BENCH_HISTORY.csv")
FIELDS = ["commit", "date", "idle", "sf", "reps", "query", "sec"]


def load_history(repo: str = REPO) -> list[dict]:
    """All committed BENCH_LOCAL.json snapshots, oldest first.

    Each snapshot: {commit, date, idle, sf, reps, queries: {name: sec}}
    (sec = the committed min-of-reps).  Unparseable blobs are skipped.
    """
    out = subprocess.run(
        ["git", "log", "--reverse", "--format=%H %cI", "--", "BENCH_LOCAL.json"],
        cwd=repo,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    snaps: list[dict] = []
    for line in out.splitlines():
        sha, _, date = line.partition(" ")
        show = subprocess.run(
            ["git", "show", f"{sha}:BENCH_LOCAL.json"],
            cwd=repo,
            capture_output=True,
            text=True,
        )
        if show.returncode != 0:
            continue
        try:
            payload = json.loads(show.stdout)
        except ValueError:
            continue
        queries = payload.get("queries")
        if not isinstance(queries, dict) or not queries:
            continue
        snaps.append(
            {
                "commit": sha,
                "date": date,
                "idle": bool(payload.get("idle_at_start", False)),
                "sf": float(payload.get("sf", 0.1)),
                "reps": int(payload.get("reps", 1)),
                "queries": {str(k): float(v) for k, v in queries.items()},
            }
        )
    return snaps


def write_csv(snaps: list[dict], path: str = CSV_PATH) -> None:
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(FIELDS)
        for s in snaps:
            for q in sorted(s["queries"]):
                w.writerow(
                    [s["commit"], s["date"], int(s["idle"]), s["sf"],
                     s["reps"], q, s["queries"][q]]
                )


def read_csv(path: str = CSV_PATH) -> list[dict]:
    """Inverse of write_csv — snapshots oldest-first (file order)."""
    if not os.path.exists(path):
        return []
    snaps: list[dict] = []
    by_commit: dict[str, dict] = {}
    with open(path, newline="") as fh:
        for row in csv.DictReader(fh):
            s = by_commit.get(row["commit"])
            if s is None:
                s = {
                    "commit": row["commit"],
                    "date": row["date"],
                    "idle": row["idle"] == "1",
                    "sf": float(row["sf"]),
                    "reps": int(row["reps"]),
                    "queries": {},
                }
                by_commit[row["commit"]] = s
                snaps.append(s)
            s["queries"][row["query"]] = float(row["sec"])
    return snaps


def flag_regressions(
    snaps: list[dict],
    current: dict[str, float],
    sf: float = 0.1,
    factor: float = 1.5,
    window: int = 3,
) -> dict[str, dict]:
    """Queries in ``current`` slower than factor × the min of their
    last ``window`` comparable (idle, same-sf) snapshots.

    Returns {query: {sec, baseline_sec, ratio}}.  Queries with no
    comparable history are never flagged (a new query has no
    baseline)."""
    comparable = [s for s in snaps if s["idle"] and s["sf"] == sf]
    flagged: dict[str, dict] = {}
    for q, sec in current.items():
        hist = [s["queries"][q] for s in comparable if q in s["queries"]]
        if not hist:
            continue
        baseline = min(hist[-window:])
        if baseline > 0 and sec > factor * baseline:
            flagged[q] = {
                "sec": round(sec, 3),
                "baseline_sec": round(baseline, 3),
                "ratio": round(sec / baseline, 2),
            }
    return flagged


def main() -> int:
    snaps = load_history()
    write_csv(snaps)
    print(
        f"[bench-history] {len(snaps)} snapshots, "
        f"{sum(len(s['queries']) for s in snaps)} rows -> {CSV_PATH}",
        file=sys.stderr,
    )
    if "--check" in sys.argv[1:]:
        with open(os.path.join(REPO, "BENCH_LOCAL.json")) as fh:
            cur = json.load(fh)
        if not cur.get("idle_at_start"):
            print("[bench-history] current snapshot not idle; min column only",
                  file=sys.stderr)
        # exclude the newest snapshot if it IS the current payload
        hist = [s for s in snaps if s["queries"] != cur.get("queries")]
        flagged = flag_regressions(hist, cur.get("queries", {}),
                                   sf=float(cur.get("sf", 0.1)))
        print(json.dumps({"regressions": flagged}, indent=2))
        return 1 if flagged else 0
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
