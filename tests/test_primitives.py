"""Shuffle-primitive edge cases distilled from the reference's test suites
(SURVEY §5, FIXTURES.md §B): empty partitions, skew, null keys, hash-ish
collisions, AQE coalescing."""

from __future__ import annotations

from pyspark.sql import functions as F

from remote_shuffle_spark.sources.tables import load_table


def test_empty_map_outputs_roundtrip(spark):
    """RemoteShuffleManagerSuite.scala:156-162 — tiny table through a wide
    exchange: most partitions empty, nothing lost."""
    df = spark.range(20).repartition(40)
    assert df.count() == 20
    assert df.rdd.getNumPartitions() == 40
    assert sorted(r.id for r in df.collect()) == list(range(20))


def test_aqe_coalesces_small_shuffle(spark, sf_smoke):
    """RemoteShuffleManagerSuite.scala:188-190 — AQE shrinks the reduce
    side below the configured shuffle partitions."""
    li = load_table(spark, sf_smoke, "lineitem")
    out = li.groupBy("l_returnflag").count()
    n_parts = out.rdd.getNumPartitions()
    assert n_parts < int(spark.conf.get("spark.sql.shuffle.partitions"))


def test_null_grouping_keys(spark):
    """RemoteAppendOnlyMapSuite.scala:166-188 — null keys form a group."""
    rows = [(None, 1), (None, 2), ("a", 3), ("b", 4), (None, 5)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert got == {None: 8, "a": 3, "b": 4}


def test_low_entropy_collision_keys(spark):
    """RemoteAppendOnlyMapSuite.scala:313-412 — grouping on keys designed
    to collide; SQL semantics must be count-exact regardless."""
    rows = [((("Aa" if i % 2 else "BB") + str(i // 2)), i) for i in range(10_000)]
    df = spark.createDataFrame(rows, ["k", "v"])
    agg = df.groupBy("k").count()
    assert agg.count() == 10_000  # all keys distinct despite hash collisions
    assert agg.agg(F.sum("count").alias("s")).collect()[0].s == 10_000


def test_skewed_key_aggregation(spark):
    """Half-constant keys (RemoteShuffleManagerSuite.scala:168-170)."""
    df = spark.range(100_000).select(
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id")).alias("k")
    )
    counts = df.groupBy("k").count()
    hot = counts.filter(F.col("k") == 0).collect()[0]["count"]
    assert hot == 50_000
    assert counts.count() == 50_001


def test_repartition_checksum_large(spark):
    """1M-row repartition checksum (RemoteShuffleManagerSuite.scala:146-154)."""
    df = spark.range(1_000_000).repartition(100)
    s = df.agg(F.sum("id").alias("s")).collect()[0].s
    assert s == 999_999 * 1_000_000 // 2


def test_sort_with_skewed_lengths(spark):
    """Sort where half the keys are constant — skewed range partitions."""
    df = spark.range(100_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    top = df.orderBy(F.col("k").desc()).limit(3).collect()
    assert [r.k for r in top] == [99999, 99997, 99995]


def test_approx_aggregates_within_bounds(spark, sf_smoke):
    """q29's sketches stay within published error bounds of exact answers."""
    from remote_shuffle_spark.queries import REGISTRY

    li = load_table(spark, sf_smoke, "lineitem")
    exact_parts = li.select("l_partkey").distinct().count()
    row = REGISTRY["q29_approx_agg"].fn(spark, sf_smoke).collect()[0]
    # q29 now returns the exact values plus in-bounds booleans (so the
    # driver oracle can hash-check it); the booleans ARE the bound asserts.
    assert row.exact_parts == exact_parts
    assert row.hll_within_5pct
    assert row.median_within_1pct


def test_new_operators_on_empty_inputs(spark):
    """Empty-input behavior (the reference's empty-map-output suite,
    applied to the round-2 operators): empty in → empty (or zero-row agg)
    out, never an error."""
    from pyspark.sql import functions as F

    from remote_shuffle_spark.operators.clustering import label_centroids
    from remote_shuffle_spark.operators.joins import asof_join
    from remote_shuffle_spark.operators.pipeline import chunk_sequences, with_global_index

    empty_docs = spark.createDataFrame([], "doc_id long, w long")
    assert chunk_sequences(empty_docs, "doc_id", "w", budget=10).count() == 0
    assert with_global_index(empty_docs, order_by=["doc_id"]).count() == 0

    empty_vecs = spark.createDataFrame([], "label string, embedding array<double>")
    assert label_centroids(empty_vecs, "label", "embedding").count() == 0

    left = spark.createDataFrame([(1, "A", 100)], ["id", "k", "t_us"]).select(
        "id", "k", F.timestamp_micros("t_us").alias("ts")
    )
    empty_right = spark.createDataFrame([], "k string, ts timestamp, v double")
    out = asof_join(
        left, empty_right, on=["k"], left_ts="ts", right_ts="ts", right_values=["v"]
    ).collect()
    assert len(out) == 1 and out[0].v_asof is None


def test_kfold_congruence_survives_large_ids(spark, tmp_path):
    """ext_kfold_split's fold function must not overflow int64: raw
    `doc_id * 2654435761` wraps silently in Spark but raises in DuckDB
    for ids above ~3.5e9, so the mod-first form is load-bearing.  Pin
    Spark ≡ DuckDB on ids straddling 2^32."""
    import duckdb

    import remote_shuffle_spark.ext_queries  # noqa: F401 — registers EXT queries
    from remote_shuffle_spark.queries import REGISTRY

    ids = [1, 7, 2**31 - 1, 2**32 + 12345, 2**40 + 7, 2**62 + 3]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, 100, "en", "t" * 4) for i in ids],
        "doc_id long, n_chars int, lang string, text string",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    qd = REGISTRY["ext_kfold_split"]
    got = {
        (r.fold, r.n, r.chars)
        for r in qd.fn(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{sf}/documents.parquet/*.parquet')"
    )
    want = set(map(tuple, con.execute(qd.oracle).fetchall()))
    assert got == want


def test_salted_join_equals_plain_join(spark):
    """salted_join must be result-invariant vs the plain join for inner
    and left joins, including unmatched left rows (exactly once, nulls)
    and a key hot enough to dominate a partition."""
    from remote_shuffle_spark.plans.shuffle_policy import salted_join

    left = spark.createDataFrame(
        [(i, 0 if i < 900 else i, f"r{i}") for i in range(1000)],
        "row_id long, k long, payload string",
    )  # key 0 carries 90% of rows
    right = spark.createDataFrame(
        [(0, "hot"), (950, "cold")], "k long, tag string"
    )

    for how in ("inner", "left"):
        plain = left.join(right, "k", how).select("row_id", "k", "tag")
        salted = salted_join(left, right, "k", salt_buckets=4, how=how).select(
            "row_id", "k", "tag"
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )

    # the physical join key must include the salt (the whole point)
    plan = salted_join(left, right, "k", salt_buckets=4)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "_salt" in plan


def test_scalar_subquery_fanout_equals_single_scan(spark):
    """ext_scalar_subquery_fanout's 100 TB guidance, proven: the eight
    scalar subqueries (eight scans as written) equal ONE conditional-
    aggregation scan — the rewrite a production dashboard ships."""
    from pyspark.sql import functions as F

    from remote_shuffle_spark.ext_queries import ext_scalar_subquery_fanout
    from remote_shuffle_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    multi = ext_scalar_subquery_fanout(spark, sf).collect()[0].asDict()
    ev = load_table(spark, sf, "events")
    bands = [(0, 2), (3, 5), (6, 8), (9, 11), (12, 14), (15, 17), (18, 20), (21, 23)]
    single = (
        ev.agg(
            *[
                F.count(
                    F.when(F.hour("ts").between(lo, hi), 1)
                ).alias(f"h{i}")
                for i, (lo, hi) in enumerate(bands)
            ]
        )
        .collect()[0]
        .asDict()
    )
    assert multi == single and sum(multi.values()) == ev.count()
