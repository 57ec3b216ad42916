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


def _top_level_bracket_groups(s: str) -> list[str]:
    """Split ``[...], [...], [...]`` into its top-level bracket groups
    (nested brackets inside window specs don't break the split)."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start is not None:
                groups.append(s[start : i + 1])
                start = None
    return groups


def assert_no_global_window(df: DataFrame) -> None:
    """Assert no Window operator runs with an EMPTY partition spec.

    ``Window.orderBy(...)`` without a partitionBy plans as
    ``Exchange SinglePartition`` + a one-task Window over the whole
    input — the classic hidden scale-killer (fine at sf0.01, one
    reducer at 100 TB).  In ``simple``-mode plan text a Window node
    prints ``Window [exprs], [partition], [order]`` when fully
    specified and drops EMPTY specs, so a global window shows either
    one trailing group that is an ORDERING (entries carry ASC/DESC)
    or no trailing group at all, while a partition-only window's
    trailing group is a plain column list.  (Global AGGREGATES also
    plan an Exchange SinglePartition but carry one row per upstream
    partition — those are fine and not flagged here.)
    """
    plan = physical_plan(df, mode="simple")
    for line in plan.splitlines():
        s = line.strip().lstrip("+-*: ").strip()
        if not s.startswith("Window "):
            continue
        groups = _top_level_bracket_groups(s)
        if len(groups) >= 3 and groups[1] != "[]":
            continue  # explicit non-empty partition spec
        if len(groups) == 2 and not (
            groups[1] == "[]" or " ASC" in groups[1] or " DESC" in groups[1]
        ):
            continue  # partition-only window (trailing group is a column list)
        raise AssertionError(
            f"global (unpartitioned) Window in plan:\n{s}\nfull plan:\n{plan}"
        )


def assert_no_cartesian_product(df: DataFrame) -> None:
    """Assert the plan contains no CartesianProduct node — the shuffle-
    based cartesian join Spark falls back to when neither side of a
    join without equi-keys is broadcastable: O(|L|·|R|) rows through
    every reducer.  The engine's intentional cross joins are all
    broadcast-of-one-row-aggregate idioms (BroadcastNestedLoopJoin over
    a 1-row side), which this check deliberately permits."""
    plan = physical_plan(df, mode="simple")
    if "CartesianProduct" in plan:
        line = next(ln for ln in plan.splitlines() if "CartesianProduct" in ln)
        raise AssertionError(
            f"CartesianProduct in plan:\n{line.strip()}\nfull plan:\n{plan}"
        )


def count_shuffle_exchanges(df: DataFrame) -> int:
    plan = physical_plan(df, mode="simple")
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("+- Exchange") or line.strip().startswith("Exchange")
        or (" Exchange " in f" {line.strip()} " and "BroadcastExchange" not in line)
    )
