"""sf0.1 rotating oracle SPOT-GATE (round-11 verdict item 7).

The driver's correctness gate runs at sf0.01; this marker hash-checks a
small rotating cohort of declared queries at sf0.1 to catch
scale-dependent semantics (rounding-midpoint drift, overflow, window-tie
instability that only shows up with more rows).  The engine-exact
disciplines (integer/cents arithmetic, md5 hashing, literal weight
tables) should make every query SF-invariant, so any failure here is
high-signal.

Rotation: the cohort index is derived from the highest CORRECTNESS_r*.json
round present in the repo root (i.e. the round currently being built),
so each round exercises the next ``COHORT`` alphabetical slice with
wraparound — all oracled queries get an sf0.1 check every
``ceil(N / COHORT)`` rounds with zero bookkeeping.

Run just this gate:  python -m pytest tests -q -m sf01_gate
"""

from __future__ import annotations

import glob
import os
import re

import pytest

import __spark_entry__ as entrymod
from tests.parity import ParityResult, compare_frames, duckdb_connection

SF_SCALE = "/root/testdata/sf0.1"
COHORT = 10

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _current_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0) + 1


def _cohort() -> list[str]:
    names = sorted(entrymod.oracle_sql())
    if not names:
        return []
    start = (_current_round() * COHORT) % len(names)
    return [names[(start + i) % len(names)] for i in range(min(COHORT, len(names)))]


SPOT_NAMES = _cohort()


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
