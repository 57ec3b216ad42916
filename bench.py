"""Benchmark harness — runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "declared_query_wall_time", "value": <steady total sec>,
     "unit": "sec", "queries": {"q01_...": sec, ...},
     "queries_first_exec": {...}, "value_first_exec": <sec>, "sf": 0.1}

Each query is fully materialized through the noop sink (computes
everything, writes nothing) so the timing covers the whole plan, not an
early-out count.  Every query runs TWICE in the same session:
``queries`` / ``value`` report the second (steady-state) execution —
first execution pays one-time whole-stage-codegen compilation, measured
at ~1.3x median inflation (q27: 5.5 s first vs 0.37 s steady), which two
rounds of trend analysis had to caveat in prose — and
``queries_first_exec`` keeps the cold numbers so nothing is hidden.
Usage: ``python bench.py [--queries name1,name2] [--repeat 1]`` (repeat 1
restores the old single-run behavior; queries then reports first-exec).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=2, help="executions per query; last one is the reported steady time")
    args = ap.parse_args()

    from remote_shuffle_spark import EngineConfig, get_session

    spark = get_session(EngineConfig(app_name="remote_shuffle_spark_bench"))

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = args.queries.split(",") if args.queries else list(qs)

    sf_name = os.path.basename(args.sf_dir.rstrip("/"))
    sf = float(sf_name.removeprefix("sf")) if sf_name.startswith("sf") else None

    # JVM/codegen warm-up (not timed)
    materialize(qs["q01_scan_filter_agg"](spark, args.sf_dir))

    first: dict[str, float] = {}
    steady: dict[str, float] = {}
    for name in names:
        for rep in range(max(1, args.repeat)):
            t0 = time.perf_counter()
            materialize(qs[name](spark, args.sf_dir))
            took = round(time.perf_counter() - t0, 3)
            if rep == 0:
                first[name] = took
            steady[name] = took
        print(f"  {name}: first {first[name]:.2f}s steady {steady[name]:.2f}s", file=sys.stderr)

    result = {
        "metric": "declared_query_wall_time",
        "value": round(sum(steady.values()), 3),
        "unit": "sec",
        "queries": steady,
        "queries_first_exec": first,
        "value_first_exec": round(sum(first.values()), 3),
        "sf": sf,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
