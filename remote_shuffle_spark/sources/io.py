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
