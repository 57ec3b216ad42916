"""Plan probe for one PageRank iteration body (operators/graph.py:pagerank).

The declared query's final plan is checkpoint-truncated (each iteration
ends in a lazy localCheckpoint, so `explain` on the returned frame only
shows the tail) — this probe rebuilds ONE iteration body without the
checkpoint, in both shapes:

  before  nodes LEFT JOIN sums ON u = v   (re-key pass, r14 shape)
  after   sums.select(v AS u, ...)        (read ranks off the aggregate)

and dumps both formatted plans.  The equivalence argument (r15): in the
SYMMETRIZED graph every node has degree >= 1, so every node receives at
least one contribution and sums' key set is exactly nodes — the left
join can never produce a NULL _s and is a pure re-keying pass.  The
wall evidence is the job count (scripts/job_count_probe.py: ext_pagerank
49 -> 39 jobs), since the query is driver-latency-bound; this probe
pins the plan mechanism behind those numbers.

Usage: python scripts/pagerank_iter_plan_probe.py <outdir> [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from remote_shuffle_spark import EngineConfig, get_session
from remote_shuffle_spark.plans.explain import physical_plan
from remote_shuffle_spark.sources.tables import load_table


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_session(
        EngineConfig(app_name="pagerank_iter_plan_probe", driver_memory="8g")
    )

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    sym = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("_deg"))
    sym_deg = sym.join(deg, "u").localCheckpoint(eager=True)
    nodes = deg.select("u").localCheckpoint(eager=True)
    n = nodes.count()
    scale, damping_pct = 10**12, 85
    base = ((100 - damping_pct) * scale) // (100 * n)
    r = nodes.select("u", F.lit(scale // n).cast("long").alias("rs"))
    contrib = sym_deg.join(r, "u").select(
        F.col("v"), F.expr("rs div _deg").alias("_c")
    )
    sums = contrib.groupBy("v").agg(F.sum("_c").alias("_s"))

    shapes = {
        "before": nodes.join(sums, nodes["u"] == sums["v"], "left").select(
            "u",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(_s, 0L)) div 100")
            ).cast("long").alias("rs"),
        ),
        "after": sums.select(
            F.col("v").alias("u"),
            (F.lit(base) + F.expr(f"({damping_pct} * _s) div 100"))
            .cast("long")
            .alias("rs"),
        ),
    }
    for name, frame in shapes.items():
        plan = physical_plan(frame)
        out = os.path.join(outdir, f"pagerank_iter_{name}.txt")
        with open(out, "w") as fh:
            fh.write(plan)
        n_join = len(re.findall(r"^\(\d+\) .*Join", plan, re.M))
        n_bx = len(re.findall(r"^\(\d+\) BroadcastExchange", plan, re.M))
        print(f"{name}: joins={n_join} broadcast_exchanges={n_bx} -> {out}")

    # row-set equivalence of the two shapes (one iteration, full compare)
    a = {tuple(r) for r in shapes["before"].collect()}
    b = {tuple(r) for r in shapes["after"].collect()}
    print("iteration-1 row sets equal:", a == b, f"({len(a)} rows)")


if __name__ == "__main__":
    main()
