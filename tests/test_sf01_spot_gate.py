"""sf0.1 rotating oracle SPOT-GATE (round-11 verdict item 7).

The driver's correctness gate runs at sf0.01; this marker hash-checks a
small rotating cohort of declared queries at sf0.1 to catch
scale-dependent semantics (rounding-midpoint drift, overflow, window-tie
instability that only shows up with more rows).  The engine-exact
disciplines (integer/cents arithmetic, md5 hashing, literal weight
tables) should make every query SF-invariant, so any failure here is
high-signal.

Rotation: shared with scripts/partition_invariance_probe.py via
``tests.rotation`` (round = max CORRECTNESS_r*.json + 1, next alphabetical
``COHORT``-slice with wraparound), so all oracled queries get an sf0.1
check every ``ceil(N / COHORT)`` rounds with zero bookkeeping.  The cohort
is round-dependent BY DESIGN (that's the sweep); to reproduce a specific
round's cohort after its CORRECTNESS file lands, set
``SPARK_GRAFT_SPOT_ROUND=<round>``.

Run just this gate:  python -m pytest tests -q -m sf01_gate
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.parity import ParityResult, compare_frames, duckdb_connection
from tests.rotation import rotating_cohort

SF_SCALE = "/root/testdata/sf0.1"
# 25/round (r12 verdict item 5): at 10/round a 320-query surface took 32
# rounds to sweep; the engine-exact disciplines make the checks cheap.
COHORT = 25

SPOT_NAMES = rotating_cohort(sorted(entrymod.oracle_sql()), COHORT)


@pytest.fixture(scope="module")
def duck_sf01():
    if not os.path.isdir(SF_SCALE):
        pytest.skip(f"{SF_SCALE} not present")
    con = duckdb_connection(SF_SCALE)
    yield con
    con.close()


@pytest.mark.sf01_gate
@pytest.mark.parametrize("name", SPOT_NAMES)
def test_query_matches_oracle_at_sf01(spark, duck_sf01, name):
    fn = entrymod.queries()[name]
    oracle = entrymod.oracle_sql()[name]
    spark_pdf = fn(spark, SF_SCALE).toPandas()
    oracle_pdf = duck_sf01.execute(oracle).df()
    res: ParityResult = compare_frames(name, spark_pdf, oracle_pdf)
    assert res.ok, res.detail
