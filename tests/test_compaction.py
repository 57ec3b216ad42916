"""Small-files compaction: the rebalance-on-write path actually merges
a fragmented table into near-target-sized files without losing rows."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from remote_shuffle_spark.sources.io import compact_files, compact_table


def _parquet_files(path: str) -> list[str]:
    return glob.glob(os.path.join(path, "*.parquet"))


def test_compact_merges_small_files(spark, tmp_path):
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    # 64 tiny files (~a few KB each) — the streaming-sink fragmentation shape
    df = spark.range(0, 100_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    )
    df.repartition(64).write.parquet(frag)
    assert len(_parquet_files(frag)) == 64

    compact_table(spark, frag, out, target_file_bytes=64 * 1024 * 1024)
    files = _parquet_files(out)
    # everything fits one advisory-sized partition -> a handful of files
    assert 1 <= len(files) <= 4
    back = spark.read.parquet(out)
    assert back.count() == 100_000
    assert back.agg(F.sum("id")).collect()[0][0] == df.agg(F.sum("id")).collect()[0][0]


def test_compact_splits_to_multiple_files_at_small_target(spark, tmp_path):
    out = str(tmp_path / "sized")
    df = spark.range(0, 200_000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    )
    # ~200k rows x ~100B -> ~20MB of parquet; 1 MiB target must split
    compact_files(df, out, target_file_bytes=1 * 1024 * 1024)
    files = _parquet_files(out)
    assert len(files) > 3
    sizes = [os.path.getsize(f) for f in files]
    # no pathological file: nothing an order of magnitude over target
    assert max(sizes) < 10 * 1024 * 1024
    assert spark.read.parquet(out).count() == 200_000


def test_compact_conf_restored(spark, tmp_path):
    before = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", None)
    compact_files(
        spark.range(100).toDF("id"), str(tmp_path / "c"), target_file_bytes=4096
    )
    after = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", None)
    assert before == after
