"""Two-sided dtype alignment sweep: Spark result schema vs DuckDB oracle types.

The driver's correctness hash is dtype-sensitive at the KIND level, not
the width level.  Empirical calibration against three rounds of driver
results: int32-vs-int64 pairs (q17 row_number, q52 levenshtein,
ext_vocab token_id) all HASH-MATCHED in r01/r03, while every r03
mismatch was DuckDB HUGEINT (pandas object) against Spark bigint
(pandas int64).  So integer widths and float widths are grouped as one
kind here; what this flags is the breaking class only: numeric-vs-object
(HUGEINT/UHUGEINT), numeric-vs-string, decimal precision/scale
disagreements, date-vs-timestamp, and columns present on one side only.

Usage: python scripts/two_sided_dtype_sweep.py [names...]
Prints one line per mismatched column; exits 0 iff clean.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Map engine types to the KIND the driver's hash distinguishes (see module
# docstring for the empirical calibration: integer/float widths are one kind).
_SPARK_TO_KIND = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "integer": "int",
    "bigint": "int",
    "long": "int",
    "float": "float",
    "double": "float",
    "string": "obj",
    "boolean": "bool",
    "date": "date",
    "binary": "obj",
}

_DUCK_TO_KIND = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "HUGEINT": "HUGEINT!",
    "UHUGEINT": "HUGEINT!",
    "FLOAT": "float",
    "DOUBLE": "float",
    "VARCHAR": "obj",
    "BOOLEAN": "bool",
    "DATE": "date",
    "BLOB": "obj",
}


def _spark_kind(dt: str) -> str:
    dt = dt.lower()
    if dt.startswith("decimal"):
        return "decimal" + dt[len("decimal") :]
    if dt.startswith("timestamp"):
        return "ts"
    if dt.startswith(("array", "map", "struct")):
        return "obj"
    return _SPARK_TO_KIND.get(dt, f"?spark:{dt}")


def _duck_kind(dt: str) -> str:
    dt = str(dt).upper()
    if dt.startswith("DECIMAL"):
        return "decimal" + dt[len("DECIMAL") :].lower()
    if dt.startswith("TIMESTAMP"):
        return "ts"
    if dt.endswith("[]") or dt.startswith(("STRUCT", "MAP", "LIST")):
        return "obj"
    return _DUCK_TO_KIND.get(dt, f"?duck:{dt}")


def main() -> int:
    import __spark_entry__ as entrymod
    from tests.parity import duckdb_connection
    from remote_shuffle_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    spark = get_session()
    con = duckdb_connection(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    bad = 0
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_types = {f.name: _spark_kind(f.dataType.simpleString()) for f in sdf.schema.fields}
            rel = con.sql(oracles[name])
            d_types = {c: _duck_kind(t) for c, t in zip(rel.columns, rel.types)}
        except Exception as e:  # noqa: BLE001 — sweep reports, doesn't crash
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        checked += 1
        for col in sorted(set(s_types) | set(d_types)):
            sk, dk = s_types.get(col), d_types.get(col)
            if sk is None or dk is None:
                print(f"{name}.{col}: column only on one side (spark={sk}, duck={dk})")
                bad += 1
            elif sk != dk:
                print(f"{name}.{col}: spark={sk} vs duck={dk}")
                bad += 1
    print(f"swept {checked} oracled queries: {bad} dtype mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
