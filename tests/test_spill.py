"""Spill-path correctness — the reference's central unit-test concern
(RemoteSorterSuite "spilling in local cluster", RemoteAppendOnlyMapSuite
force-spill suites; FIXTURES.md §B spill_rows).

A fresh subprocess runs the flagship aggregation + a wide sort with
``spark.shuffle.spill.numElementsForceSpillThreshold`` forced tiny, so
every aggregation/sort path external-spills, and asserts results equal
the no-spill session's.  (Subprocess because a JVM's SparkConf is fixed
at startup.)
"""

from __future__ import annotations

import json
import subprocess
import sys

SCRIPT = r"""
import json, sys
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[4]")
    .appName("spill_probe")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.shuffle.spill.numElementsForceSpillThreshold", "100")
    .config("spark.sql.ui.retainedExecutions", "1")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
agg = (
    li.groupBy("l_orderkey")
    .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("s"),
         F.count(F.lit(1)).alias("n"))
)
row = agg.agg(F.sum("s").cast("string").alias("total"),
              F.sum("n").alias("rows"),
              F.count(F.lit(1)).alias("groups")).collect()[0]
top = [r.l_orderkey for r in li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber").limit(5).collect()]
print(json.dumps({"total": row.total, "rows": row.rows, "groups": row.groups, "top": top}))
"""


def test_forced_spill_results_match(spark, sf_correct):
    from pyspark.sql import functions as F

    from remote_shuffle_spark.sources.tables import load_table

    out = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]
    got = json.loads(out.stdout.strip().splitlines()[-1])

    li = load_table(spark, sf_correct, "lineitem")
    agg = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    row = agg.agg(
        F.sum("s").cast("string").alias("total"),
        F.sum("n").alias("rows"),
        F.count(F.lit(1)).alias("groups"),
    ).collect()[0]
    top = [
        r.l_orderkey
        for r in li.orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        ).limit(5).collect()
    ]
    assert got == {"total": row.total, "rows": row.rows, "groups": row.groups, "top": top}
