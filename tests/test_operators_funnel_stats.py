"""Funnel and chi-square semantics on crafted inputs."""

from __future__ import annotations

import pyspark.sql.functions as F


def _ev(spark, rows):
    # rows: (user_id, t_us, event_type)
    return spark.createDataFrame(
        rows, "user_id bigint, t_us bigint, event_type string"
    ).select("user_id", F.timestamp_micros("t_us").alias("ts"), "event_type")


def test_funnel_strict_order(spark):
    from remote_shuffle_spark.operators.funnel import funnel_counts

    rows = [
        # user 1: full funnel in order
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2: clicked BEFORE viewing -> stops at step 1
        (2, 20, "view"), (2, 10, "click"),
        # user 3: view+click, purchase exactly AT click time (not strictly
        # after) -> stops at step 2
        (3, 10, "view"), (3, 20, "click"), (3, 20, "purchase"),
        # user 4: never viewed -> no steps
        (4, 10, "click"), (4, 20, "purchase"),
    ]
    row = funnel_counts(_ev(spark, rows), ("view", "click", "purchase")).collect()[0]
    assert (row.step_1, row.step_2, row.step_3) == (3, 2, 1)


def test_funnel_first_touch_time_is_used(spark):
    from remote_shuffle_spark.operators.funnel import funnel_counts

    # user's FIRST view is at t=10; the click at t=5 precedes it, the one
    # at t=15 follows it -> converts. If max/view-time were used (t=50),
    # the click would not count.
    rows = [(1, 10, "view"), (1, 50, "view"), (1, 5, "click"), (1, 15, "click")]
    row = funnel_counts(_ev(spark, rows), ("view", "click")).collect()[0]
    assert (row.step_1, row.step_2) == (1, 1)


def test_chi_square_independent_uniform_is_zero(spark):
    from remote_shuffle_spark.operators.stats import chi_square_independence

    # perfectly balanced 2x2 -> chi2 == 0
    rows = [(r, c) for r in ("a", "b") for c in ("x", "y") for _ in range(5)]
    df = spark.createDataFrame(rows, ["r", "c"])
    out = chi_square_independence(df, "r", "c").collect()[0]
    assert (out.n, out.n_rows, out.n_cols, out.dof) == (20, 2, 2, 1)
    assert out.chi2 == 0.0


def test_chi_square_matches_scipy_formula(spark):
    from remote_shuffle_spark.operators.stats import chi_square_independence

    # hand-computed 2x2: O = [[10, 0], [0, 10]] -> chi2 = N = 20
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, ["r", "c"])
    out = chi_square_independence(df, "r", "c").collect()[0]
    assert out.dof == 1
    assert abs(out.chi2 - 20.0) < 1e-9  # includes the two zero cells' E=5 each


def test_chi_square_zero_cells_counted(spark):
    from remote_shuffle_spark.operators.stats import chi_square_independence

    # O = [[4, 0], [0, 0], [0, 4]] row-major over r in (a,b?) — craft a
    # grid with an unobserved combination: (a,y) and (b,x) never occur
    rows = [("a", "x")] * 4 + [("b", "y")] * 4
    df = spark.createDataFrame(rows, ["r", "c"])
    out = chi_square_independence(df, "r", "c").collect()[0]
    # full independence would put E=2 in every cell; the zero cells each
    # contribute (0-2)^2/2 = 2, observed cells (4-2)^2/2 = 2 -> chi2 = 8
    assert abs(out.chi2 - 8.0) < 1e-9
