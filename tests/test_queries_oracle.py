"""Every declared query hash-matches its DuckDB oracle at sf0.01.

This mirrors the driver's CORRECTNESS gate (row count + columns + sorted
values) so regressions surface locally before the per-round check.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.parity import ParityResult, compare_frames, duckdb_connection

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def duck(sf_correct):
    con = duckdb_connection(sf_correct)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 2


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_correct, duck, name):
    fn = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    sdf = fn(spark, sf_correct)
    if name not in oracles:
        # rows-only contract: must run and produce a stable schema
        assert sdf.count() >= 0
        return
    spark_pdf = sdf.toPandas()
    oracle_pdf = duck.execute(oracles[name]).df()
    res: ParityResult = compare_frames(name, spark_pdf, oracle_pdf)
    assert res.ok, res.detail


def test_synth_partsupp_key_unique(spark):
    """The synthesized partsupp (tpch_queries._partsupp) must be key-unique
    on (ps_partkey, ps_suppkey) at every fixture SF — the suppkey spread
    i*(S//4) stays distinct for any supplier count S >= 4."""
    from remote_shuffle_spark.tpch_queries import _partsupp

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ps = _partsupp(spark, sf)
        total = ps.count()
        distinct = ps.select("ps_partkey", "ps_suppkey").distinct().count()
        assert total == distinct and total > 0, (sf, total, distinct)
