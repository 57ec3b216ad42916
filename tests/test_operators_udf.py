"""UDF-surface operators: applyInPandas vs SQL window equivalence, Arrow
pandas UDF, Python UDTF."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from remote_shuffle_spark.operators import udf as uops
from remote_shuffle_spark.sources.tables import load_table


def test_grouped_zscore_matches_window_zscore(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    a = {
        (r.event_type, round(r.value, 6)): round(r.zscore, 9)
        for r in uops.grouped_zscore(ev, "event_type", "value").collect()
    }
    b = {
        (r.event_type, round(r.value, 6)): round(r.zscore, 9)
        for r in uops.window_zscore(ev, "event_type", "value").collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-9)


def test_grouped_zscore_matches_numpy(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").filter(F.col("event_type") == "click")
    got = sorted(r.zscore for r in uops.grouped_zscore(ev, "event_type", "value").collect())
    vals = np.array([r.value for r in ev.select("value").collect()])
    expect = sorted((vals - vals.mean()) / vals.std())
    assert np.allclose(got, expect, atol=1e-9)


def test_batch_scaled_pandas_udf(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").limit(100)
    rows = uops.batch_scaled(ev, "value", 2.5).select("value", "value_scaled").collect()
    for r in rows:
        assert r.value_scaled == pytest.approx(r.value * 2.5, rel=1e-12)


def test_ngram_udtf(spark):
    try:
        from pyspark.sql.functions import udtf
    except ImportError:
        pytest.skip("Python UDTF requires Spark 4")
    NGrams = uops.ngram_udtf_class()
    ngrams = udtf(NGrams, returnType="doc_id bigint, ngram string, pos int")
    spark.udtf.register("ngrams", ngrams)
    spark.createDataFrame(
        [(1, "a b c d"), (2, "x y")], ["doc_id", "text"]
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT g.* FROM udtf_docs, LATERAL ngrams(doc_id, text, 2) g ORDER BY doc_id, pos"
    ).collect()
    assert [(r.doc_id, r.ngram, r.pos) for r in rows] == [
        (1, "a b", 0), (1, "b c", 1), (1, "c d", 2), (2, "x y", 0),
    ]
