"""Normalize PROGRESS.jsonl into per-run records (ADVICE r3, low).

The driver appends `{ts, wall_s, round, commits, loc, turns, ...}` rows
but `wall_s`/`turns` can RESET mid-round (driver restarts), so naive
aggregation over the raw file loses per-round monotonicity. The rows
carry no run identifier, and the file is driver-owned — so the fix
lives repo-side: derive a stable `run_id` from the reset boundaries
(a row whose `wall_s` or `turns` decreases vs the previous row of the
same round starts a new run) and emit rows that are monotone WITHIN
(round, run_id).

Usage:
    python tools/progress_runs.py            # normalized JSONL to stdout
    python tools/progress_runs.py --summary  # one line per (round, run)
"""

from __future__ import annotations

import json
import sys

PROGRESS = "PROGRESS.jsonl"


def runs(path: str = PROGRESS) -> list[dict]:
    out: list[dict] = []
    prev: dict | None = None
    run_seq = 0
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            if prev is not None and (
                row.get("round") != prev.get("round")
                or row.get("wall_s", 0) < prev.get("wall_s", 0)
                or row.get("turns", 0) < prev.get("turns", 0)
            ):
                run_seq += 1
            out.append({**row, "run_id": f"r{row.get('round', 0)}.{run_seq}"})
            prev = row
    return out


def main() -> int:
    rows = runs(sys.argv[-1] if sys.argv[-1].endswith(".jsonl") else PROGRESS)
    if "--summary" in sys.argv:
        by_run: dict[str, list[dict]] = {}
        for r in rows:
            by_run.setdefault(r["run_id"], []).append(r)
        for rid, rs in by_run.items():
            print(json.dumps({
                "run_id": rid,
                "round": rs[0].get("round"),
                "rows": len(rs),
                "wall_s": [rs[0].get("wall_s"), rs[-1].get("wall_s")],
                "turns": [rs[0].get("turns"), rs[-1].get("turns")],
                "commits": [rs[0].get("commits"), rs[-1].get("commits")],
            }))
        return 0
    for r in rows:
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
