"""Upsert/SCD2 emulation semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from remote_shuffle_spark.operators.upsert import merge_upsert, scd2_apply


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "name", "v"]
    )
    updates = spark.createDataFrame([(2, "b2", 99.0), (4, "d", 40.0)], ["id", "name", "v"])
    out = {r.id: (r.name, r.v) for r in merge_upsert(target, updates, ["id"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_idempotent(spark):
    target = spark.createDataFrame([(1, "a")], ["id", "name"])
    updates = spark.createDataFrame([(1, "a2")], ["id", "name"])
    once = merge_upsert(target, updates, ["id"])
    twice = merge_upsert(once, updates, ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_apply(spark):
    ts = lambda s: F.lit(s).cast("timestamp_ntz")  # noqa: E731
    current = spark.createDataFrame(
        [(1, "alice", "2020-01-01 00:00:00", "9999-12-31 00:00:00"),
         (1, "al", "2019-01-01 00:00:00", "2020-01-01 00:00:00"),
         (2, "bob", "2020-01-01 00:00:00", "9999-12-31 00:00:00")],
        ["id", "name", "effective_from", "effective_to"],
    ).select(
        "id", "name",
        F.col("effective_from").cast("timestamp_ntz").alias("effective_from"),
        F.col("effective_to").cast("timestamp_ntz").alias("effective_to"),
    )
    changes = spark.createDataFrame(
        [(1, "alicia", "2021-06-01 00:00:00")], ["id", "name", "change_ts"]
    ).select("id", "name", F.col("change_ts").cast("timestamp_ntz").alias("change_ts"))

    out = scd2_apply(current, changes, ["id"]).collect()
    rows = sorted(((r.id, r.name, str(r.effective_from), str(r.effective_to)) for r in out))
    assert rows == sorted([
        (1, "al", "2019-01-01 00:00:00", "2020-01-01 00:00:00"),        # old history kept
        (1, "alice", "2020-01-01 00:00:00", "2021-06-01 00:00:00"),     # closed at change
        (1, "alicia", "2021-06-01 00:00:00", "9999-12-31 00:00:00"),    # new open version
        (2, "bob", "2020-01-01 00:00:00", "9999-12-31 00:00:00"),       # untouched key
    ])
    # exactly one open row per key
    open_rows = [r for r in out if str(r.effective_to).startswith("9999")]
    assert sorted(r.id for r in open_rows) == [1, 2]


def test_snapshot_diff_statuses(spark):
    from remote_shuffle_spark.operators.upsert import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, None), (5, "e")], ["k", "v"]
    )
    out = {r.k: r.status for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    # 1 removed, 3 changed, 5 added; 2 and 4 (null==null) unchanged → absent
    assert out == {1: "removed", 3: "changed", 5: "added"}


def test_scd2_point_in_time_half_open_boundary(spark):
    """A fact at EXACTLY the change instant must see the NEW version
    (from <= ts < to), facts before see the old one, and a fact before
    the first version matches nothing under inner join."""
    from remote_shuffle_spark.operators.upsert import scd2_point_in_time

    dim = spark.createDataFrame(
        [
            (1, 100, "2020-01-01 00:00:00", "2021-06-01 00:00:00"),
            (1, 200, "2021-06-01 00:00:00", "9999-12-31 00:00:00"),
        ],
        "k long, bal long, effective_from string, effective_to string",
    ).select(
        "k", "bal",
        F.col("effective_from").cast("timestamp_ntz").alias("effective_from"),
        F.col("effective_to").cast("timestamp_ntz").alias("effective_to"),
    )
    fact = spark.createDataFrame(
        [
            (1, "2019-05-05 00:00:00"),  # before history: no match
            (1, "2020-05-05 00:00:00"),  # old version
            (1, "2021-06-01 00:00:00"),  # boundary: NEW version
            (1, "2022-01-01 00:00:00"),  # open version
        ],
        "k long, ts string",
    ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"))
    got = sorted(
        (str(r.ts), r.bal)
        for r in scd2_point_in_time(dim, fact, ["k"], "ts").collect()
    )
    assert got == [
        ("2020-05-05 00:00:00", 100),
        ("2021-06-01 00:00:00", 200),
        ("2022-01-01 00:00:00", 200),
    ]


def test_snapshot_drift_matches_hand_computed_psi_and_ks(spark):
    """PSI and KS against a by-hand computation on a 2-bin fixture:
    old = [a, a, b], new = [a, b, b].  Laplace-smoothed p over totals+2;
    KS over lex bin order (at 'a': |2/3 - 1/3| = 1/3, at 'b': 0)."""
    import math

    from pyspark.sql import functions as F

    from remote_shuffle_spark.operators.upsert import snapshot_drift

    old = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
    new = spark.createDataFrame([("a",), ("b",), ("b",)], "v string")
    row = snapshot_drift(old, new, [("v", F.col("v"))]).first()
    p_o = {"a": 3 / 5, "b": 2 / 5}  # (cnt+1)/(3+2)
    p_n = {"a": 2 / 5, "b": 3 / 5}
    want_psi = sum(
        round((p_n[k] - p_o[k]) * math.log(p_n[k] / p_o[k]), 6) for k in "ab"
    )
    assert row.feature == "v" and row.n_bins == 2
    assert abs(row.psi - want_psi) < 1e-12, (row.psi, want_psi)
    assert row.ks_stat == round(abs(2 / 3 - 1 / 3), 6)


def test_snapshot_drift_zero_on_identical_snapshots(spark):
    """Identical snapshots must report PSI == 0 and KS == 0 exactly
    (every term is (p-p)*ln(1) = 0 before rounding)."""
    from pyspark.sql import functions as F

    from remote_shuffle_spark.operators.upsert import snapshot_drift

    df = spark.createDataFrame([("x", 1), ("y", 2), ("y", 3)], "v string, n long")
    rows = snapshot_drift(
        df, df, [("v", F.col("v")), ("n", F.col("n"))]
    ).collect()
    assert {r.feature for r in rows} == {"v", "n"}
    for r in rows:
        assert r.psi == 0.0 and r.ks_stat == 0.0, r
