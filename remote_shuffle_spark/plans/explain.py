"""Physical-plan inspection helpers.

The reference's value proposition is all about what happens at the
exchange; in a Spark-first engine the analogous discipline is *verifying
the plan* — that filters reached the parquet scan, small sides broadcast,
bucketed joins skip the shuffle.  These helpers make plan properties
assertable in tests (tests/test_plans.py) instead of eyeballed.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (post-AQE initial plan).

    Captures the public ``df.explain(mode=...)`` output instead of calling
    the py4j-private ``PythonSQLUtils.explainString`` — identical text in
    classic mode, and the only form that also works under Spark Connect
    (where ``_jvm`` does not exist)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in the scan's PushedFilters."""
    plan = physical_plan(df)
    lines = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = "\n".join(lines)
    missing = [f for f in fragments if f not in joined]
    if missing:
        raise AssertionError(f"filters not pushed down: {missing}\n{joined or plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "BroadcastHashJoin" not in plan:
        raise AssertionError(f"expected BroadcastHashJoin in plan:\n{plan}")


def assert_sort_merge_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "SortMergeJoin" not in plan:
        raise AssertionError(f"expected SortMergeJoin in plan:\n{plan}")


def assert_no_shuffle_exchange(df: DataFrame) -> None:
    """Assert the plan contains no shuffle Exchange (broadcast is fine)."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line and "== " not in line:
            raise AssertionError(f"unexpected shuffle exchange:\n{line}\nfull plan:\n{plan}")


def count_shuffle_exchanges(df: DataFrame) -> int:
    plan = physical_plan(df, mode="simple")
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("+- Exchange") or line.strip().startswith("Exchange")
        or (" Exchange " in f" {line.strip()} " and "BroadcastExchange" not in line)
    )
