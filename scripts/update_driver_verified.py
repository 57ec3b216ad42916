"""Print the up-to-date DRIVER_VERIFIED set for queries.py.

Reads every CORRECTNESS_r*.json in the repo root and emits the names
whose rows passed the external gate (rows+schema+hash all true) in ANY
round.  Run at round start, paste the output over the set literal in
remote_shuffle_spark/queries.py — the registry then rotates the next
never-verified queries into the driver's 50-slot window.

Usage: python scripts/update_driver_verified.py
"""

from __future__ import annotations

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def verified_names() -> list[str]:
    names: set[str] = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(path)).items():
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                names.add(name)
    return sorted(names)


if __name__ == "__main__":
    names = verified_names()
    print(f"# {len(names)} names externally verified across all rounds")
    print("DRIVER_VERIFIED: frozenset[str] = frozenset({")
    for i in range(0, len(names), 3):
        chunk = ", ".join(f'"{n}"' for n in names[i : i + 3])
        print(f"    {chunk},")
    print("})")
