"""Bloom-filter join reduction: exactness against plain semi/anti joins.

The sketch is a performance layer — every test here pins the contract
that it NEVER changes answers: bloom_semi_join ≡ left_semi and
bloom_anti_join ≡ left_anti for all inputs, including NULL keys (never
match → excluded from semi, kept in anti), empty build sides, composite
keys, and aggressive fpp (many false positives for the exact stage to
remove).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from remote_shuffle_spark.operators.bloom import (
    BloomSketch,
    bloom_anti_join,
    bloom_semi_join,
    build_bloom,
)


def _ids(df, col="id"):
    return sorted(r[0] for r in df.select(col).collect())


@pytest.fixture(scope="module")
def sides(spark):
    large = spark.range(0, 2000).select(
        F.col("id"),
        F.when(F.col("id") % 97 == 0, None).otherwise(F.col("id") % 500).alias("k"),
    )
    small = spark.range(0, 50).select((F.col("id") * 7).alias("k"))
    return large.cache(), small.cache()


@pytest.mark.parametrize("fpp", [0.01, 0.5])
def test_semi_equiv(spark, sides, fpp):
    large, small = sides
    got = _ids(bloom_semi_join(large, small, ["k"], fpp=fpp))
    want = _ids(large.join(small, ["k"], "left_semi"))
    assert got == want and len(want) > 0


@pytest.mark.parametrize("fpp", [0.01, 0.5])
def test_anti_equiv(spark, sides, fpp):
    large, small = sides
    got = _ids(bloom_anti_join(large, small, ["k"], fpp=fpp))
    want = _ids(large.join(small, ["k"], "left_anti"))
    assert got == want and len(want) > 0


def test_null_keys_semantics(spark, sides):
    large, small = sides
    n_null = large.filter(F.col("k").isNull()).count()
    assert n_null > 0
    semi = bloom_semi_join(large, small, ["k"])
    anti = bloom_anti_join(large, small, ["k"])
    # NULL never equals anything: all null-key rows land in anti, none in semi
    assert semi.filter(F.col("k").isNull()).count() == 0
    assert anti.filter(F.col("k").isNull()).count() == n_null
    # partition: every large row is in exactly one of the two results
    assert semi.count() + anti.count() == large.count()


def test_empty_small_side(spark, sides):
    large, _ = sides
    empty = large.select("k").filter(F.lit(False))
    assert bloom_semi_join(large, empty, ["k"]).count() == 0
    assert bloom_anti_join(large, empty, ["k"]).count() == large.count()


def test_composite_key(spark):
    large = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 10).alias("a"), (F.col("id") % 7).alias("b")
    )
    small = spark.createDataFrame([(1, 1), (2, 3), (9, 6)], ["a", "b"])
    got = _ids(bloom_semi_join(large, small, ["a", "b"]))
    want = _ids(large.join(small, ["a", "b"], "left_semi"))
    assert got == want and len(want) > 0


def test_prebuilt_sketch_reuse_and_miss_guarantee(spark, sides):
    """One build amortizes across joins, and a Bloom miss is a proof of
    absence: probing every true member must return True (no false
    negatives ever)."""
    large, small = sides
    sketch = build_bloom(small, ["k"], fpp=0.01)
    assert isinstance(sketch, BloomSketch)
    semi = bloom_semi_join(large, small, ["k"], sketch=sketch)
    anti = bloom_anti_join(large, small, ["k"], sketch=sketch)
    assert semi.count() + anti.count() == large.count()
    members_missed = small.filter(~sketch.might_contain(small, F.col("k"))).count()
    assert members_missed == 0


def test_probe_actually_prunes(spark):
    """At fpp=0.01 with 1-in-100 selectivity, the probe should pass only
    a small fraction of the large side to the exact join (the whole
    point of the reduction) — bound it loosely to stay deterministic."""
    large = spark.range(0, 20_000).select(F.col("id"), (F.col("id") % 10_000).alias("k"))
    small = spark.createDataFrame([(i * 100,) for i in range(100)], ["k"])
    sketch = build_bloom(small, ["k"], fpp=0.01)
    survivors = large.filter(sketch.might_contain(large, F.col("k"))).count()
    true_matches = large.join(small, ["k"], "left_semi").count()
    # survivors = true matches + false positives; fpp 0.01 over 20k rows
    # gives ~200 expected FPs — allow 5x slack before calling it broken
    assert true_matches <= survivors <= true_matches + 1000
