"""Compare two BENCH_DETAIL.json files and flag per-query regressions.

Usage: python tools/bench_diff.py OLD.json [NEW.json] [--pct 30] [--abs 0.5]

A query is flagged when it is BOTH --pct percent and --abs seconds
slower than before (small absolute jitter on sub-second queries is not
a regression).  Exit code 1 if anything is flagged — wire into a
pre-commit or round check.  New/removed queries are listed informally.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d.get("queries", d)


def main(argv: list[str]) -> int:
    args = [a for a in argv if not a.startswith("--")]
    old_path = args[0]
    new_path = args[1] if len(args) > 1 else "BENCH_DETAIL.json"
    pct = 30.0
    abs_s = 0.5
    for a in argv:
        if a.startswith("--pct"):
            pct = float(a.split("=", 1)[1] if "=" in a else argv[argv.index(a) + 1])
        if a.startswith("--abs"):
            abs_s = float(a.split("=", 1)[1] if "=" in a else argv[argv.index(a) + 1])
    old, new = load(old_path), load(new_path)
    flagged = []
    for name, t_new in sorted(new.items()):
        t_old = old.get(name)
        if t_old is None:
            print(f"NEW      {name}: {t_new:.2f}s")
            continue
        d = t_new - t_old
        if d > abs_s and t_old > 0 and d / t_old * 100 > pct:
            flagged.append((name, t_old, t_new))
    for name in sorted(set(old) - set(new)):
        print(f"REMOVED  {name}")
    for name, t_old, t_new in sorted(flagged, key=lambda x: x[1] - x[2]):
        print(f"SLOWER   {name}: {t_old:.2f}s -> {t_new:.2f}s (+{(t_new - t_old) / t_old * 100:.0f}%)")
    if not flagged:
        print(f"no regressions (> {pct:.0f}% and > {abs_s}s) across {len(new)} queries")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
