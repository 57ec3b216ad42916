"""Sweep every oracle SQL through DuckDB and flag HUGEINT/UHUGEINT columns.

The driver's correctness hash is dtype-sensitive: DuckDB SUM(int)/count_if
return HUGEINT (int128) while Spark returns bigint, so an uncast aggregate
passes the repo's value-based parity mirror but fails the driver gate.
Run after adding/editing any oracle.  Exit 1 if any oracle yields a
HUGEINT column at sf0.01.

Usage: python scripts/oracle_dtype_sweep.py
"""

from __future__ import annotations

import os
import sys

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

BAD = {"HUGEINT", "UHUGEINT"}


def main() -> int:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    failures: list[tuple[str, list[tuple[str, str]]]] = []
    errors: list[tuple[str, str]] = []
    for name, sql in entry.oracle_sql().items():
        try:
            rel = con.sql(sql)
            bad = [
                (c, t)
                for c, t in zip(rel.columns, map(str, rel.types))
                if t in BAD
            ]
        except Exception as exc:  # noqa: BLE001
            errors.append((name, str(exc).splitlines()[0]))
            continue
        if bad:
            failures.append((name, bad))
    for name, bad in failures:
        print(f"HUGEINT  {name}: {bad}")
    for name, err in errors:
        print(f"ERROR    {name}: {err}")
    print(
        f"swept {len(entry.oracle_sql())} oracles: "
        f"{len(failures)} with HUGEINT cols, {len(errors)} errors"
    )
    return 1 if failures or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
