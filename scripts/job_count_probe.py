"""Per-query Spark JOB count probe (StatusTracker deltas) — the
deterministic evidence for driver-loop folds: each job is one driver
round trip, so iterative/streaming queries whose wall time is
latency-floor-bound (r14 scaling block: 8->32-core ratios near 1) are
compared by job count, not by storm-sensitive wall clock.

Usage: python scripts/job_count_probe.py name1,name2,... [sf_dir]
Prints one line per query: <name> jobs=<delta> wall=<sec>.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from remote_shuffle_spark import EngineConfig, get_session

    spark = get_session(
        EngineConfig(app_name="job_count_probe", driver_memory="8g")
    )
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # statusStore.jobsList(null) counts EVERY job regardless of job group
    # (streaming micro-batches run under their own group ids, which the
    # public StatusTracker.getJobIdsForGroup(None) would miss)
    store = spark.sparkContext._jsc.sc().statusStore()

    def n_jobs() -> int:
        return store.jobsList(None).size()

    # warm-up (codegen/session init jobs excluded from every delta)
    qs["q01_scan_filter_agg"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        before = n_jobs()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        print(f"{name} jobs={n_jobs() - before} wall={wall:.2f}", flush=True)


if __name__ == "__main__":
    main()
