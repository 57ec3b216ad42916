"""Source/sink round-trips: every native format preserves data; partitioned
writes produce prunable layouts; binaryFile reads opaque payloads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from remote_shuffle_spark.plans import explain
from remote_shuffle_spark.sources import io as sio
from remote_shuffle_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def sample(spark, sf_smoke):
    return load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


def _sorted_rows(df):
    return sorted((tuple(r) for r in df.collect()))


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip(spark, sample, tmp_path, fmt):
    path = str(tmp_path / fmt)
    opts = {"header": "true"} if fmt == "csv" else {}
    sio.write_table(sample, path, format=fmt, **opts)
    schema = sample.schema  # explicit schema — no inference pass
    back = sio.read_table(spark, path, format=fmt, schema=schema, **opts)
    assert _sorted_rows(back) == _sorted_rows(sample)


def test_partitioned_write_enables_pruning(spark, sample, tmp_path):
    path = str(tmp_path / "part_parquet")
    sio.write_table(sample, path, partition_by=["o_orderpriority"])
    back = sio.read_table(spark, path)
    pruned = back.filter(F.col("o_orderpriority") == "2-HIGH")
    plan = explain.physical_plan(pruned)
    # partition filter, not a data filter: pruning happens at planning
    assert "PartitionFilters" in plan and "o_orderpriority" in plan.split("PartitionFilters")[1].split("]")[0]
    expect = sample.filter(F.col("o_orderpriority") == "2-HIGH")
    assert _sorted_rows(pruned.select(*expect.columns)) == _sorted_rows(expect)


def test_binary_file_source(spark, sample, tmp_path, sf_smoke):
    files = sio.read_binary_files(spark, f"{sf_smoke}/*.parquet")
    rows = files.select("path", "length", F.octet_length("content").alias("n")).collect()
    assert len(rows) == 10  # one per fixture table
    assert all(r.n == r.length and r.length > 0 for r in rows)


def test_optional_formats_are_gated(spark):
    assert sio.optional_format(spark, "parquet")
    assert not sio.optional_format(spark, "delta")
    assert not sio.optional_format(spark, "kafka")


def test_python_datasource_partitioned_and_deterministic(spark):
    """The custom Python DataSource must really parallelize (one task
    per InputPartition) and produce identical rows at any partitioning
    (pure function of the row index)."""
    from pyspark.sql import functions as F

    from remote_shuffle_spark.sources.python_source import register_synth_source

    register_synth_source(spark)

    def read(parts):
        return (
            spark.read.format("rss_synth")
            .option("n", "5000")
            .option("parts", str(parts))
            .load()
        )

    assert read(8).rdd.getNumPartitions() == 8
    a = sorted(tuple(r) for r in read(8).collect())
    b = sorted(tuple(r) for r in read(3).collect())
    assert a == b and len(a) == 5000
    # row model pinned (the oracle's congruences)
    row = read(4).filter(F.col("id") == 1234).collect()[0]
    assert (row.user_id, row.day, row.metric) == (
        (1234 * 2654435761) % 999983 % 500, 1234 % 30, (1234 * 1234) % 9973
    )


def test_python_datasource_writer_commit_protocol(spark, tmp_path):
    """The rss_synth sink's atomic-visibility contract: readers see ONLY
    manifest-listed parts (orphaned task files invisible), overwrite
    clears prior parts, and abort removes staged files."""
    import json
    import os

    from remote_shuffle_spark.sources.python_source import (
        _SinkCommitMessage,
        _SynthSinkWriter,
        committed_files,
        register_synth_source,
    )

    register_synth_source(spark)
    out = str(tmp_path / "sink")
    src = spark.read.format("rss_synth").option("n", "1000").option("parts", "4").load()
    src.write.format("rss_synth").mode("overwrite").option("path", out).save()
    files1 = committed_files(out)
    assert files1 and all(os.path.exists(f) for f in files1)
    # plant an orphan part (a dead speculative task's leftover)
    orphan = os.path.join(out, "part-orphan.jsonl")
    with open(orphan, "w") as f:
        f.write(json.dumps({"id": 10**9, "user_id": 0, "day": 0, "metric": 0}) + "\n")
    assert orphan not in committed_files(out)
    back = spark.read.schema("id long, user_id long, day int, metric long").json(
        committed_files(out)
    )
    assert back.count() == 1000 and back.agg({"id": "max"}).collect()[0][0] < 10**9
    # overwrite clears EVERY old .jsonl, including the orphan
    src.limit(10).write.format("rss_synth").mode("overwrite").option("path", out).save()
    assert not os.path.exists(orphan)
    assert sum(1 for f in os.listdir(out) if f.endswith(".jsonl")) == len(
        committed_files(out)
    )
    # abort removes staged files and the staging dir
    w = _SynthSinkWriter({"path": out}, overwrite=False)
    staging = os.path.join(out, "_staging")
    os.makedirs(staging, exist_ok=True)
    staged = os.path.join(staging, "part-x.jsonl")
    open(staged, "w").write("{}\n")
    w.abort([_SinkCommitMessage(staged, 1)])
    assert not os.path.exists(staged) and not os.path.exists(staging)


def test_python_datasource_writer_append_merges_manifest(spark, tmp_path):
    """Append-mode commits MERGE the existing _SUCCESS manifest with the
    new batch's parts: earlier committed rows stay manifest-visible
    (ADVICE r8: append used to rewrite the manifest with only the new
    batch, silently dropping prior data from committed_files())."""
    import os

    from remote_shuffle_spark.sources.python_source import (
        committed_files,
        register_synth_source,
    )

    register_synth_source(spark)
    out = str(tmp_path / "sink_append")
    src = spark.read.format("rss_synth").option("n", "100").option("parts", "2").load()
    src.write.format("rss_synth").mode("append").option("path", out).save()
    first = set(committed_files(out))
    assert len(first) == 2
    src.write.format("rss_synth").mode("append").option("path", out).save()
    merged = set(committed_files(out))
    assert first < merged and len(merged) == 4
    assert all(os.path.exists(f) for f in merged)
    back = spark.read.schema("id long, user_id long, day int, metric long").json(
        list(merged)
    )
    assert back.count() == 200
    # overwrite after appends resets the manifest to the single new batch
    src.limit(5).write.format("rss_synth").mode("overwrite").option("path", out).save()
    assert len(committed_files(out)) <= 2 and not (
        set(committed_files(out)) & merged
    )
