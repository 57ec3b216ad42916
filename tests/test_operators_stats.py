"""Decontamination, inverted index, stratified-exact sampling, and
exact-decimal correlation semantics on crafted inputs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from remote_shuffle_spark.operators.decontam import contamination_hits
from remote_shuffle_spark.operators.pipeline import stratified_sample_exact
from remote_shuffle_spark.operators.stats import hll_distinct_rollup, pairwise_corr
from remote_shuffle_spark.operators.text import inverted_index


def test_contamination_planted(spark):
    # doc 10 contains bench doc 1's 4-gram verbatim; doc 11 shares nothing
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (10, "xx alpha beta gamma delta yy"),
            (11, "one two three four five six"),
        ],
        ["doc_id", "text"],
    )
    hits = contamination_hits(train, bench, id_col="doc_id", text_col="text", n=4).collect()
    assert {r.doc_id: r.n_hits for r in hits} == {10: 1}


def test_contamination_short_doc_whole_text(spark):
    # bench doc shorter than n matches via its whole-text shingle
    bench = spark.createDataFrame([(1, "rare pair")], ["doc_id", "text"])
    train = spark.createDataFrame(
        [(10, "a b rare pair c d"), (11, "rare alone here x")], ["doc_id", "text"]
    )
    # n=2: bench emits the bigram "rare pair"
    hits = contamination_hits(train, bench, id_col="doc_id", text_col="text", n=2).collect()
    assert {r.doc_id for r in hits} == {10}


def test_contamination_broadcast_plan(spark):
    bench = spark.createDataFrame([(1, "alpha beta gamma delta")], ["doc_id", "text"])
    train = spark.createDataFrame([(10, "alpha beta gamma delta x")], ["doc_id", "text"])
    plan = contamination_hits(
        train, bench, id_col="doc_id", text_col="text", n=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_inverted_index_postings(spark):
    df = spark.createDataFrame(
        [(3, "apple banana"), (1, "apple"), (2, "apple banana apple")],
        ["doc_id", "text"],
    )
    rows = {
        r.token: (r.df, r.postings_head)
        for r in inverted_index(df, "doc_id", "text", min_df=1, postings_cap=2).collect()
    }
    # df counts distinct docs (doc 2 repeats "apple" in-doc); postings
    # head is the cap smallest ids, sorted
    assert rows["apple"] == (3, "1,2")
    assert rows["banana"] == (2, "2,3")


def test_stratified_sample_exact_quota(spark):
    rows = [(i, "a" if i < 40 else "b") for i in range(50)]  # a:40, b:10
    df = spark.createDataFrame(rows, ["id", "s"])
    samp = stratified_sample_exact(df, "s", frac=0.25, order_col="id").collect()
    by = {}
    for r in samp:
        by.setdefault(r.s, []).append(r.id)
    assert len(by["a"]) == 10 and len(by["b"]) == 3  # ceil(40*.25), ceil(10*.25)
    # deterministic: same call returns the same rows
    again = stratified_sample_exact(df, "s", frac=0.25, order_col="id").collect()
    assert sorted((r.s, r.id) for r in samp) == sorted((r.s, r.id) for r in again)


def test_stratified_sample_exact_systematic(spark):
    df = spark.createDataFrame([(i, "x") for i in range(8)], ["id", "s"])
    samp = stratified_sample_exact(df, "s", frac=0.25, order_col="id", salt=None)
    assert sorted(r.id for r in samp.collect()) == [0, 1]  # head-of-stratum


def test_pairwise_corr_exact_vs_python(spark):
    data = [(float(i), float(3 * i + 1), float(10 - i)) for i in range(20)]
    df = spark.createDataFrame(data, ["x", "y", "z"])
    out = {r.pair: r.corr for r in pairwise_corr(df, [("x", "y"), ("x", "z")]).collect()}
    assert math.isclose(out["x,y"], 1.0, abs_tol=1e-12)
    assert math.isclose(out["x,z"], -1.0, abs_tol=1e-12)


def test_pairwise_corr_partitioning_invariant(spark):
    data = [(float(i % 97) + 0.123456, float((i * 31) % 89) - 4.2) for i in range(500)]
    df = spark.createDataFrame(data, ["x", "y"])
    a = pairwise_corr(df.repartition(1), [("x", "y")]).collect()[0].corr
    b = pairwise_corr(df.repartition(32, "y"), [("x", "y")]).collect()[0].corr
    # exact decimal moments → bit-identical regardless of partitioning
    assert a == b


def test_hll_rollup_merge_equals_groups(spark):
    rows = [(i, f"t{i % 3}", i % 50) for i in range(600)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "user_id"])
    out = {
        r.scope: (r.exact_distinct, r.within_5pct)
        for r in hll_distinct_rollup(df, "event_type", "user_id").collect()
    }
    # each type sees ~17 distinct users, global sees all 50 — small
    # cardinalities are exact in HLL, so within_5pct must hold everywhere
    assert out["GLOBAL"][0] == 50
    assert all(flag == 1 for _, flag in out.values())
