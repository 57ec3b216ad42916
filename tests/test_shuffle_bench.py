"""Smoke test for the shuffle-throughput parity bench (scripts/
shuffle_bench.py — the PySpark analog of the reference's doc-only
PerformanceEvaluationTool, README.md:154-206).

Runs the harness in a subprocess (it needs its own JVM with the UI REST
endpoint enabled) at a tiny size and checks the contract: one JSON line,
both phases measured, stored bytes ≈ raw bytes (payload incompressible,
like the tool's random blocks).
"""

from __future__ import annotations

import json
import subprocess
import sys


def test_shuffle_bench_contract():
    out = subprocess.run(
        [sys.executable, "scripts/shuffle_bench.py", "--gb", "0.05",
         "--mappers", "8", "--reducers", "4"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "shuffle_throughput"
    for phase in ("write", "read"):
        assert rec[phase]["raw_mb_s"] > 0
        assert rec[phase]["stored_mb"] > 0
    # incompressibility: the shuffle must not be able to compress the
    # payload away (stored within 15% of raw — framing overhead only)
    assert abs(rec["write"]["stored_mb"] - rec["write"]["raw_mb"]) / rec["write"]["raw_mb"] < 0.15
    assert rec["geometry"]["raw_gb"] > 0.04
