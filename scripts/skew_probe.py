"""Skewed-key probe for the round-5 join family (round-5 verdict item 6).

The 25x probes used UNIFORM keys; this one plants the regime salting
exists for — one key holding ``--hot-frac`` (default 20%) of all rows —
and measures, for salted_join vs the plain AQE path and for
interval_overlap_join:

- wall time;
- reducer balance: max/median ROW COUNT over the post-shuffle join
  partitions (the deterministic driver of reducer task time — wall-clock
  per task on a shared VM is noise, partition sizes are not).

Judgment recorded in docs/scale.md.  Synthetic inputs are distributed
(spark.range + expressions), deterministic, and sized by --scale
(5M events at 1.0).

Usage: python scripts/skew_probe.py [--scale 1.0] [--hot-frac 0.2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def synth_skewed_events(spark, n: int, users: int, hot_frac: float):
    """n events; a hot_frac slice all on user 0, the rest uniform."""
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % int(1 / hot_frac) == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(users)))
        .alias("user_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000
        ).alias("ts"),
    )


def partition_balance(df) -> dict:
    """max/median row count over the frame's current partitions."""
    sizes = sorted(
        df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    )
    nonzero = [s for s in sizes if s] or [0]
    return {
        "partitions": len(sizes),
        "max": max(sizes),
        "median": nonzero[len(nonzero) // 2],
        "skew_ratio": round(max(sizes) / max(1, nonzero[len(nonzero) // 2]), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--hot-frac", type=float, default=0.2)
    ap.add_argument("--driver-memory", default="8g")
    args = ap.parse_args()

    from remote_shuffle_spark import EngineConfig, get_session
    from remote_shuffle_spark.operators.joins import interval_overlap_join
    from remote_shuffle_spark.plans.shuffle_policy import salted_join

    spark = get_session(EngineConfig(app_name="skew_probe", driver_memory=args.driver_memory))
    n = int(5_000_000 * args.scale)
    events = synth_skewed_events(spark, n, users=20_000, hot_frac=args.hot_frac)
    dim = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("ue"))
    # force the dim past the broadcast path so the join actually shuffles
    # (the regime salting is for: right too big/mid to broadcast)
    dim = dim.hint("merge")

    out: dict[str, object] = {
        "scale": args.scale,
        "n_events": n,
        "hot_frac": args.hot_frac,
    }

    def timed(name, fn):
        t0 = time.perf_counter()
        res = fn()
        out[name] = {"sec": round(time.perf_counter() - t0, 2), **res}
        print(f"  {name}: {out[name]}", file=sys.stderr)

    left = events.select("event_id", "user_id")

    # plain sort-merge join under AQE (skew-split enabled by EngineConfig)
    timed(
        "plain_aqe_join",
        lambda: {
            "rows": left.join(dim, "user_id").count(),
            **partition_balance(left.repartition(32, "user_id")),
        },
    )
    # salted: per-row unique salt (event_id) — the documented hot-dup fix
    timed(
        "salted_join",
        lambda: {
            "rows": salted_join(
                left,
                dim,
                "user_id",
                salt_buckets=8,
                salt_expr=F.col("event_id"),
            ).count(),
            **partition_balance(
                left.withColumn(
                    "_salt", F.pmod(F.col("event_id"), F.lit(8))
                ).repartition(32, "user_id", "_salt")
            ),
        },
    )

    # interval-overlap with the hot key: intervals on user 0 all coincide
    lhs = events.select(
        "user_id",
        F.unix_micros("ts").alias("start"),
        (F.unix_micros("ts") + 600_000_000).alias("end"),
    )
    rhs = events.filter(F.col("event_id") % 50 == 0).select(
        "user_id",
        F.unix_micros("ts").alias("start"),
        (F.unix_micros("ts") + 1_800_000_000).alias("end"),
    )
    timed(
        "interval_overlap_join_skewed",
        lambda: {
            "pairs": interval_overlap_join(
                lhs, rhs, on=["user_id"], chunk_us=1_800_000_000
            ).count()
        },
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
