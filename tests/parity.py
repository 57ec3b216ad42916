"""Shared oracle-parity harness — mirrors the driver's CORRECTNESS check.

Runs a declared query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and values
(column-name-sorted, row-sorted, order-insensitive) — strict equality for
ints/strings, exact-or-1e-9 for floats (we aim for exact; the tolerance
only localizes a failure).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from remote_shuffle_spark.sources.tables import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> ParityResult:
    s, o = _normalize(spark_pdf), _normalize(oracle_pdf)
    if list(s.columns) != list(o.columns):
        return ParityResult(name, False, f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}")
    if len(s) != len(o):
        return ParityResult(name, False, f"row count differs: spark={len(s)} oracle={len(o)}")
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            a_nan = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT or (a != a)
            b_nan = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT or (b != b)
            if a_nan or b_nan:
                if a_nan != b_nan:
                    return ParityResult(name, False, f"{col}[{i}]: null mismatch {a!r} vs {b!r}")
                continue
            if isinstance(a, float) or isinstance(b, float):
                fa, fb = float(a), float(b)
                if fa != fb:
                    rel = abs(fa - fb) / max(abs(fa), abs(fb), 1e-300)
                    tag = "EXACT-MISS" if rel < 1e-9 else "VALUE-DIFF"
                    return ParityResult(
                        name, False, f"{col}[{i}] {tag}: spark={fa!r} oracle={fb!r} rel={rel:.2e}"
                    )
            else:
                if a != b:
                    return ParityResult(name, False, f"{col}[{i}]: spark={a!r} oracle={b!r}")
    return ParityResult(name, True, f"{len(s)} rows x {len(s.columns)} cols match")


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> list[ParityResult]:
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb_connection(sf_dir)
    results = []
    for name, fn in qs.items():
        if names and name not in names:
            continue
        if name not in oracles:
            sdf = fn(spark, sf_dir)
            n = sdf.count()
            results.append(ParityResult(name, True, f"rows-only: {n} rows"))
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
            rel = con.sql(oracles[name])
            # Driver's hash is dtype-sensitive: DuckDB SUM(int)/count_if yield
            # HUGEINT (int128) where Spark yields bigint — values match, hash
            # doesn't.  Screen here so the local mirror catches the class.
            bad = [
                (c, t)
                for c, t in zip(rel.columns, map(str, rel.types))
                if str(t) in ("HUGEINT", "UHUGEINT")
            ]
            if bad:
                results.append(
                    ParityResult(
                        name, False, f"oracle HUGEINT columns (cast to BIGINT): {bad}"
                    )
                )
                continue
            oracle_pdf = rel.df()
            results.append(compare_frames(name, spark_pdf, oracle_pdf))
        except Exception as e:  # noqa: BLE001 — harness reports, tests assert
            results.append(ParityResult(name, False, f"EXCEPTION: {type(e).__name__}: {e}"))
    return results
