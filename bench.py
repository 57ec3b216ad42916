"""Benchmark harness — runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "declared_query_wall_time", "value": <total sec>,
     "unit": "sec", "queries": {"q01_...": sec, ...}, "sf": 0.1}

Each query is fully materialized through the noop sink (computes
everything, writes nothing) so the timing covers the whole plan, not an
early-out count.  Usage: ``python bench.py [--queries name1,name2]``.
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

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        materialize(qs[name](spark, args.sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {timings[name]:.2f}s", file=sys.stderr)

    result = {
        "metric": "declared_query_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
