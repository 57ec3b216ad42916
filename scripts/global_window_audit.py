"""Registry-wide plan audit: global windows + cartesian products (round 13).

Sweeps declared queries' PHYSICAL PLANS for unpartitioned Window
operators (plans/explain.py:assert_no_global_window) — the classic
hidden scale-killer: ``Window.orderBy`` without a partitionBy plans as
``Exchange SinglePartition`` + a one-task window over its whole input,
fine at sf0.01 and one reducer at 100 TB.  r12 graded
``ext_gap_distribution``'s global rank the repo's one true scale-killer
plan; r13 removed it (plus gini/rfm/trimmed_mean/mixture_temperature in
the same class) and this audit keeps the property: any NEW global
window fails the sweep unless it is allowlisted below with a bounded-
input justification.

Allowlisted global windows — every entry's window input is bounded by a
TIME-BUCKET calendar or an explicit bin-domain contract, never corpus
rows (the lag/rolling-over-a-daily-series idiom is semantically a
global order over ≤ thousands of rows):

  ext_kll_rolling_quantile   rolling 7-day KLL merge over PER-DAY
                             sketch rows (≤ #days)
  ext_hll_rolling_distinct   rolling 7-day HLL union over PER-DAY
                             sketch rows (≤ #days)
  ext_autocorr_lag1          lag(1) over the DAILY count series
  q71_mom_growth             lag(1) over the MONTHLY revenue series
  ext_snapshot_drift         KS cumulative over the BOUNDED bin domain
                             (operators/upsert.py:snapshot_drift's
                             documented caller contract)

Building a query's DataFrame executes its eager parts (streaming /
index-lifecycle queries run for real), so the full sweep costs roughly
a bench run (~7 min at sf0.001).  Default mode sweeps the rotating
30-query cohort (tests/rotation.py — the sf0.1 spot-gate scheme);
``--all`` sweeps all declared queries.

The same sweep also asserts no CartesianProduct node (the shuffle-based
O(|L|*|R|) fallback join); the engine's intentional cross joins are all
broadcast-of-one-row idioms (BroadcastNestedLoopJoin), which pass.
CARTESIAN_ALLOWLIST names the deliberate exceptions (brute-force oracle
hooks whose all-pairs shape IS the documented contract).

Usage: python scripts/global_window_audit.py [--all] [--names a,b]
Prints one JSON line: {"probe": "plan_audit", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALLOWLIST = {
    "ext_kll_rolling_quantile",
    "ext_hll_rolling_distinct",
    "ext_autocorr_lag1",
    "q71_mom_growth",
    "ext_snapshot_drift",
}

# Queries allowed to plan a CartesianProduct: none today — the
# brute-force similarity oracles broadcast their small side, so even
# they avoid the shuffle cartesian.  Add a name here ONLY with a
# docstring-level justification in the query itself.
CARTESIAN_ALLOWLIST: set[str] = set()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="audit every declared query")
    ap.add_argument("--names", default=None, help="comma-separated subset")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--cohort", type=int, default=30)
    args = ap.parse_args()

    from remote_shuffle_spark import get_session
    from remote_shuffle_spark.plans.explain import (
        assert_no_cartesian_product,
        assert_no_global_window,
    )

    spark = get_session()
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if args.names:
        names = args.names.split(",")
    elif args.all:
        names = list(qs)
    else:
        from tests.rotation import rotating_cohort

        names = rotating_cohort(sorted(qs), args.cohort)

    violations, allowed_hits, cart_violations, errors = [], [], [], []
    for name in names:
        try:
            df = qs[name](spark, args.sf_dir)
        except Exception as ex:  # noqa: BLE001 — audit must report, not die
            errors.append(name)
            print(f"  ERR {name}: {type(ex).__name__}: {ex}", file=sys.stderr)
            continue
        try:
            assert_no_global_window(df)
        except AssertionError as ex:
            if name in ALLOWLIST:
                allowed_hits.append(name)
            else:
                violations.append(name)
                print(f"  VIOLATION {name}: {str(ex).splitlines()[1]}", file=sys.stderr)
        try:
            assert_no_cartesian_product(df)
        except AssertionError as ex:
            if name not in CARTESIAN_ALLOWLIST:
                cart_violations.append(name)
                print(f"  CARTESIAN {name}: {str(ex).splitlines()[1]}", file=sys.stderr)

    print(
        json.dumps(
            {
                "probe": "plan_audit",
                "sf_dir": args.sf_dir,
                "n_queries": len(names),
                "violations": violations,
                "cartesian_violations": cart_violations,
                "allowlisted_hits": allowed_hits,
                "errors": errors,
            }
        )
    )
    if violations or cart_violations or errors:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
