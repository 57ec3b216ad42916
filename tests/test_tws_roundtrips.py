"""Focused pins for the r14 TWS round-trip optimization: the processors'
per-key state traffic is the family's dominant cost (keys x batches x
protocol round trips — stateful_v2.py module docstring), so the
optimization that folded every exists()+get() pair into one get() (the
state server returns None for absent state, probed against the JVM) and
skipped value-identical writes is pinned HERE at the unit level, where the
op count is deterministic and ambient-immune.  End-to-end semantics stay
pinned by the batch-vs-stream oracle parity suite."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from remote_shuffle_spark.streaming.stateful_v2 import FirstNPerKey, TTLCountProcessor


class StubValueState:
    def __init__(self):
        self.value = None
        self.ops = Counter()

    def exists(self) -> bool:
        self.ops["exists"] += 1
        return self.value is not None

    def get(self):
        self.ops["get"] += 1
        return self.value

    def update(self, v) -> None:
        self.ops["update"] += 1
        self.value = tuple(v)


class StubHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, StubValueState())


def _batch(rows):
    return iter([pd.DataFrame(rows, columns=["user_id", "event_id", "ts"])])


def test_first_n_single_trip_per_saturated_batch():
    p = FirstNPerKey(n=2)
    h = StubHandle()
    p.init(h)
    st = h.states["count"]

    # batch 1: takes 2 of 3 rows -> exactly one get + one update, no exists
    out1 = list(p.handleInputRows((7,), _batch([(7, 1, 1), (7, 2, 2), (7, 3, 3)]), None))
    assert st.ops == Counter({"get": 1, "update": 1})
    assert st.value == (2,)
    assert len(out1) == 1 and list(out1[0]["event_id"]) == [1, 2]

    # batch 2 (key saturated): ONE round trip total — the read; the
    # value-identical write is skipped and nothing is emitted
    st.ops.clear()
    out2 = list(p.handleInputRows((7,), _batch([(7, 4, 4)]), None))
    assert st.ops == Counter({"get": 1})
    assert st.value == (2,)
    assert out2 == []


def test_first_n_absent_state_reads_none():
    p = FirstNPerKey(n=5)
    h = StubHandle()
    p.init(h)
    out = list(p.handleInputRows((1,), _batch([(1, 9, 9)]), None))
    assert h.states["count"].value == (1,)
    assert len(out) == 1


def test_ttl_count_two_trips_per_batch():
    p = TTLCountProcessor()
    h = StubHandle()
    p.init(h)
    st = h.states["n"]
    list(p.handleInputRows((3,), _batch([(3, 1, 1), (3, 2, 2)]), None))
    list(p.handleInputRows((3,), _batch([(3, 3, 3)]), None))
    # 2 batches x (1 get + 1 update); the old shape paid exists+get+update
    assert st.ops == Counter({"get": 2, "update": 2})
    assert st.value == (3,)
