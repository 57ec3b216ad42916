"""Partitioning-invariance probe: same query, different physical layouts.

The driver's correctness hash is order-insensitive but VALUE-sensitive, and
the classic silent breaker at cluster scale is a result that depends on the
physical layout (float accumulation order, row_number over an
under-specified sort, limit without a total order, first/any_value).  The
engine-exact disciplines are supposed to make every declared query
layout-independent; this probe CHECKS that by running a query cohort in
fresh subprocesses pinned to genuinely different layouts and comparing
canonical result hashes (column-name-sorted, row-sorted, string-rendered —
tests/parity's normalization) across them.

Each layout is ``CORESxPARTS`` with an optional ``na`` suffix (run the
whole AQE framework OFF — catches results that silently depend on
adaptive re-planning): the worker session runs on
``local[CORES]`` (which changes spark.range splits, parquet scan task
layout, and default parallelism — the SOURCE partitioning) with
``spark.sql.shuffle.partitions=PARTS`` and AQE partition COALESCING
disabled (so the post-shuffle layouts stay actually different instead of
being re-coalesced to similar effective partitioning; skew-split and the
rest of AQE stay on, matching production).

Any mismatch is a query whose RESULT depends on the layout — exactly the
class of bug that would pass the gate locally (local[32], 32 partitions)
and red in a driver environment with different parallelism.

Usage:
    python scripts/partition_invariance_probe.py [--names a,b,c]
        [--layouts 32x32,5x7,32x32na] [--sf-dir /root/testdata/sf0.01]
        [--cohort 30] [--all]

Default cohort: rotating slice of the registry keyed to the current round
(tests/rotation — the same scheme and code as tests/test_sf01_spot_gate.py)
so repeated runs across rounds sweep the whole surface.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import hashlib, json, sys
sys.path.insert(0, %(root)r)
names, sf_dir = json.loads(sys.argv[1]), sys.argv[2]
cores, nparts, aqe = int(sys.argv[3]), int(sys.argv[4]), sys.argv[5] == "1"
from remote_shuffle_spark import EngineConfig, get_session
cfg = EngineConfig(
    app_name="pinvar_%%dx%%d_%%s" %% (cores, nparts, "aqe" if aqe else "noaqe"),
    master="local[%%d]" %% cores,
    shuffle_partitions=nparts,
    adaptive=aqe,
    extra={
        "spark.default.parallelism": str(cores),
        # keep skew-split etc. on, but stop AQE re-coalescing the layouts
        # back toward each other — the whole point is DIFFERENT layouts
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    },
)
spark = get_session(cfg)
import __spark_entry__ as e
from tests.parity import _normalize
qs = e.queries()
out = {}
for name in names:
    pdf = _normalize(qs[name](spark, sf_dir).toPandas())
    blob = pdf.astype(str).to_csv(index=False).encode()
    out[name] = hashlib.md5(blob).hexdigest()
print("PINVAR_JSON:" + json.dumps(out))
"""


def _registry_names() -> list[str]:
    sys.path.insert(0, ROOT)
    import __spark_entry__ as e

    return sorted(e.queries())


def _run_layout(
    names: list[str], sf_dir: str, cores: int, nparts: int, aqe: bool
) -> dict[str, str]:
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            _WORKER % {"root": ROOT},
            json.dumps(names),
            sf_dir,
            str(cores),
            str(nparts),
            "1" if aqe else "0",
        ],
        capture_output=True,
        text=True,
        timeout=5400,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("PINVAR_JSON:"):
            return json.loads(line[len("PINVAR_JSON:"):])
    raise SystemExit(
        f"worker for layout {cores}x{nparts} aqe={aqe} produced no result:\n"
        f"{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default=None, help="comma-separated subset")
    ap.add_argument(
        "--layouts",
        default="32x32,5x7",
        help="comma-separated CORESxPARTS worker layouts",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cohort", type=int, default=30)
    ap.add_argument("--all", action="store_true", help="probe every declared query")
    args = ap.parse_args()

    registry = _registry_names()
    if args.names:
        names = args.names.split(",")
    elif args.all:
        names = registry
    else:
        from tests.rotation import rotating_cohort

        names = rotating_cohort(registry, args.cohort)

    def _parse(spec: str) -> tuple[int, int, bool]:
        aqe = not spec.endswith("na")
        body = spec[:-2] if not aqe else spec
        c, p = body.split("x")
        return int(c), int(p), aqe

    specs = args.layouts.split(",")
    # Duplicate specs would silently collapse in the dict comprehension and
    # report 0 mismatches while comparing a layout against itself — fail loud.
    if len(set(specs)) != len(specs):
        raise SystemExit(f"duplicate layout specs in --layouts: {args.layouts}")
    if len(specs) < 2:
        raise SystemExit("--layouts needs at least two distinct specs to compare")
    hashes = {
        spec: _run_layout(names, args.sf_dir, *_parse(spec)) for spec in specs
    }
    base = specs[0]
    mismatched = [
        n for n in names if any(hashes[s][n] != hashes[base][n] for s in specs[1:])
    ]
    out = {
        "probe": "partition_invariance",
        "sf_dir": args.sf_dir,
        "layouts": specs,
        "n_queries": len(names),
        "mismatched": mismatched,
    }
    for n in mismatched:
        print(
            f"  MISMATCH {n}: " + ", ".join(f"{s}:{hashes[s][n][:12]}" for s in specs),
            file=sys.stderr,
        )
    print(json.dumps(out))
    if mismatched:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
