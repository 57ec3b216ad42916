"""Source/sink round-trips beyond the parquet fixtures.

The reference plugin's only "source/sink" is its shuffle store (SURVEY
§2.3); a complete engine needs the standard format surface.  Everything
routes through Spark's native readers/writers (splittable, predicate/
column pushdown where the format allows) with explicit schemas — never
``inferSchema`` in a pipeline (a schema inference pass is a full extra
read of 100 TB).

Formats needing external jars (Delta/Iceberg/Hudi, Kafka) are gated
behind :func:`optional_format` so callers get a clean capability signal
instead of a classpath stack trace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: formats available in a stock PySpark container
NATIVE_FORMATS = ("parquet", "orc", "json", "csv", "text", "binaryFile", "noop")

#: formats that need extra jars — import-try seam
OPTIONAL_FORMATS = {
    "delta": "io.delta:delta-spark",
    "iceberg": "org.apache.iceberg:iceberg-spark-runtime",
    "kafka": "org.apache.spark:spark-sql-kafka-0-10",
}


def optional_format(spark: SparkSession, fmt: str) -> bool:
    """True if the optional format's classes are on the classpath."""
    if fmt not in OPTIONAL_FORMATS:
        return fmt in NATIVE_FORMATS
    try:
        spark.read.format(fmt).load("/nonexistent")
        return True  # pragma: no cover - only with jars present
    except Exception as e:  # noqa: BLE001
        return "Failed to find data source" not in str(e) and "ClassNotFound" not in str(e)


def write_table(
    df: DataFrame,
    path: str,
    *,
    format: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write with the format's atomic commit protocol (tmp + rename — the
    same idempotent-commit semantics as the reference's
    writeIndexFileAndCommit).  ``partition_by`` produces the hive-style
    directory layout that enables partition pruning on re-read."""
    writer = df.write.mode(mode).format(format).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    *,
    format: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    reader = spark.read.format(format).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_binary_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Opaque-file source: (path, modificationTime, length, content) —
    the entry point for multimodal payloads (operators.multimodal) when
    media lives as raw files on object storage."""
    return spark.read.format("binaryFile").load(path_glob)


def compact_files(
    df: DataFrame,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Rewrite ``df`` as ~``target_file_bytes``-sized files (the
    small-files compactor).

    At 100 TB, a table that accrued millions of KB-sized files (streaming
    micro-batches, over-parallel writers) pays footer/open overhead on
    every scan and floods the driver's file index.  The fix is a
    rebalance-on-write: the AQE REBALANCE hint lets the runtime both
    COALESCE undersized shuffle partitions and SPLIT oversized/skewed
    ones to the advisory size, which a static ``repartition(n)`` cannot
    do (n must be guessed, and one hot partition still yields one huge
    file).  The advisory size is applied per-write via the hint's
    runtime re-plan, scoped with a save/restore of the session conf.

    The one shuffle this costs is the price of the layout change itself;
    downstream scans repay it immediately (fewer tasks, bigger
    sequential reads, a driver file index proportional to data size
    rather than writer history).
    """
    spark = df.sparkSession
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(target_file_bytes))
        # by default AQE coalesces only down to minPartitionSize to maximize
        # parallelism; for a compaction write the advisory size IS the goal
        conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        write_table(
            df.hint("rebalance"),
            path,
            format=format,
            partition_by=partition_by,
            mode=mode,
            **options,
        )
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def compact_table(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    format: str = "parquet",
    **options: str,
) -> None:
    """Read a fragmented table and rewrite it compacted (offline
    maintenance form of :func:`compact_files`)."""
    compact_files(
        read_table(spark, in_path, format=format),
        out_path,
        target_file_bytes=target_file_bytes,
        format=format,
        **options,
    )
