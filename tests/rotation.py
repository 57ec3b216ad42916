"""Shared round-keyed cohort rotation for the sf0.1 spot-gate and the
partition-invariance probe (one copy — the two consumers must sweep the
same scheme or coverage claims drift).

The "current round" is max(CORRECTNESS_r*.json) + 1 — i.e. the round being
built — so each round exercises the next alphabetical slice with
wraparound and every query is covered once per ceil(N / size) rounds with
zero bookkeeping.  ``SPARK_GRAFT_SPOT_ROUND`` overrides the round for
reproducing a specific cohort after the round's CORRECTNESS file lands.
"""

from __future__ import annotations

import glob
import os
import re

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def current_round() -> int:
    env = os.environ.get("SPARK_GRAFT_SPOT_ROUND")
    if env:
        return int(env)
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0) + 1


def rotating_cohort(names: list[str], size: int, round_no: int | None = None) -> list[str]:
    if not names:
        return []
    r = current_round() if round_no is None else round_no
    start = (r * size) % len(names)
    return [names[(start + i) % len(names)] for i in range(min(size, len(names)))]
