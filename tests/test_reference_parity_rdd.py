"""SURVEY §1.4 record-model parity: the reference's Product2[K,V] /
Aggregator[K,V,C] primitives expressed both ways — RDD K/V (the
reference's native shape) and DataFrame (the engine's) — must agree.

These are the only RDD usages in the repo, kept deliberately: they pin
the semantic mapping the whole engine rests on.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_reducebykey_equals_dataframe_groupby(spark):
    """Aggregator.createCombiner/mergeValue/mergeCombiners (reference
    RemoteAggregator) ≡ partial+final aggregation."""
    data = [(i % 100, i) for i in range(10_000)]
    rdd_result = dict(
        spark.sparkContext.parallelize(data, 16).reduceByKey(lambda a, b: a + b).collect()
    )
    df = spark.createDataFrame(data, ["k", "v"])
    df_result = {
        r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    assert rdd_result == df_result


def test_cogroup_equals_full_outer_join_semantics(spark):
    """The reference's 'simple cogroup' (RemoteAppendOnlyMapSuite.scala:
    206-223): values of both sides grouped per key, keys from either side.

    DataFrame-native equivalent: groupBy().cogroup().applyInPandas —
    checked against both the RDD cogroup and a full-outer-join + group
    formulation."""
    import pandas as pd

    a = [(1, "x"), (1, "y"), (2, "z")]
    b = [(1, 10), (3, 30)]
    rdd_co = {
        k: (sorted(va), sorted(vb))
        for k, (va, vb) in spark.sparkContext.parallelize(a)
        .cogroup(spark.sparkContext.parallelize(b))
        .mapValues(lambda vs: (list(vs[0]), list(vs[1])))
        .collect()
    }

    dfa = spark.createDataFrame(a, ["k", "s"])
    dfb = spark.createDataFrame(b, ["k", "n"])

    def merge(key, la: pd.DataFrame, lb: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": [key[0]],
                "strs": [",".join(sorted(la["s"].astype(str)))],
                "nums": [",".join(str(x) for x in sorted(lb["n"]))],
            }
        )

    co = (
        dfa.groupby("k")
        .cogroup(dfb.groupby("k"))
        .applyInPandas(merge, "k long, strs string, nums string")
    )
    got = {r.k: (r.strs, r.nums) for r in co.collect()}
    expect = {
        k: (",".join(str(x) for x in va), ",".join(str(x) for x in vb))
        for k, (va, vb) in rdd_co.items()
    }
    assert got == expect
    assert set(got) == {1, 2, 3}  # keys from either side survive
