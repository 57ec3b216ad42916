"""Round-over-round per-query bench comparison.

Diffs two BENCH_full.json maps (steady pass) and prints:
- common-set totals and the ratio (the r(N-1) <-> r(N) continuity number
  the round verdicts track),
- per-query regressions above --threshold (default 1.5x) with absolute
  deltas, sorted worst-first,
- added / removed queries with their costs.

Usage:
    python scripts/bench_compare.py OLD.json NEW.json [--threshold 1.5]

Keep the previous round's map around as BENCH_full_r{N}.json (git keeps
BENCH_full.json current-round); the driver's BENCH_r{N}.json compact
tails don't carry the full map, this file does.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    old = json.load(open(args.old))["queries"]
    new = json.load(open(args.new))["queries"]
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    print(
        f"common set: {len(common)} queries, steady total "
        f"{t_old:.1f}s -> {t_new:.1f}s = {t_new / t_old:.2f}x"
    )

    regs = [
        (q, old[q], new[q])
        for q in common
        if old[q] > 0 and new[q] / old[q] > args.threshold
    ]
    regs.sort(key=lambda r: -(r[2] - r[1]))
    print(f"regressions >{args.threshold}x: {len(regs)}")
    for q, a, b in regs:
        print(f"  {q}: {a:.2f}s -> {b:.2f}s ({b / a:.1f}x, +{b - a:.2f}s)")

    if added:
        cost = sum(new[q] for q in added)
        print(f"added: {len(added)} queries, {cost:.1f}s total")
        for q in sorted(added, key=lambda q: -new[q])[:10]:
            print(f"  {q}: {new[q]:.2f}s")
    if removed:
        print(f"removed: {removed}")


if __name__ == "__main__":
    main()
