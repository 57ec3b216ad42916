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

from remote_shuffle_spark.streaming.stateful_v2 import (
    FirstNPerKey,
    TTLCountProcessor,
    TypeCountsProcessor,
)


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


class StubMapState:
    def __init__(self):
        self.m = {}
        self.ops = Counter()

    def exists(self) -> bool:
        self.ops["exists"] += 1
        return bool(self.m)

    def containsKey(self, k) -> bool:
        self.ops["containsKey"] += 1
        return tuple(k) in self.m

    def getValue(self, k):
        self.ops["getValue"] += 1
        return self.m.get(tuple(k))

    def updateValue(self, k, v) -> None:
        self.ops["updateValue"] += 1
        self.m[tuple(k)] = tuple(v)


class StubListState:
    def __init__(self):
        self.rows = []
        self.ops = Counter()

    def appendList(self, rows) -> None:
        self.ops["appendList"] += 1
        self.rows.extend(rows)

    def get(self):
        self.ops["get"] += 1
        return iter(self.rows)


class StubHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, StubValueState())

    def getMapState(self, name, kschema, vschema, ttlDurationMs=None):
        return self.states.setdefault(name, StubMapState())

    def getListState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, StubListState())

    def deleteIfExists(self, name) -> None:
        self.states.pop(name, None)


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


def test_type_counts_list_append_first_batch_only():
    """r15 fold: the `seen` ListState is only ever READ on a key's first
    batch, so appends on later batches were one dead state-server round
    trip per key per batch — pinned to appendList exactly once per key,
    while the per-type getValue+updateValue hot path and the bounded
    first-batch protocol exercises (exists gate, containsKey, list walk)
    keep their counts."""
    p = TypeCountsProcessor()
    h = StubHandle()
    p.init(h)
    assert "scratch" not in h.states  # deleteIfExists exercised
    counts, seen = h.states["counts"], h.states["seen"]

    def batch(rows):
        return iter(
            [pd.DataFrame(rows, columns=["user_id", "event_id", "event_type"])]
        )

    out1 = list(p.handleInputRows((5,), batch([(5, 1, "a"), (5, 2, "b")]), None))
    assert seen.ops == Counter({"appendList": 1, "get": 1})
    assert counts.ops == Counter(
        {"exists": 1, "containsKey": 1, "getValue": 2, "updateValue": 2}
    )
    assert list(out1[0].itertuples(index=False, name=None)) == [
        (5, "a", 1),
        (5, "b", 1),
    ]

    seen.ops.clear()
    counts.ops.clear()
    out2 = list(p.handleInputRows((5,), batch([(5, 3, "a")]), None))
    # batch 2: NO list append, NO containsKey — one exists gate + the
    # per-type read/write pair only
    assert seen.ops == Counter()
    assert counts.ops == Counter({"exists": 1, "getValue": 1, "updateValue": 1})
    assert list(out2[0].itertuples(index=False, name=None)) == [(5, "a", 2)]


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
