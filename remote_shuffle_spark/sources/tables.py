"""Parquet table sources for the driver-generated fixtures (TESTDATA.md).

The reference plugin has no scan layer — its only "source/sink" is the
shuffle store itself (SURVEY.md §2.3).  Our engine's sources are Spark's
native columnar parquet reader: vectorized, predicate-pushdown and
column-pruning capable, partition-splittable via
``spark.sql.files.maxPartitionBytes`` — exactly the properties that matter
when the same tables are 100 TB on an object store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def ensure_session_defaults(spark: SparkSession) -> None:
    """Set the session-level confs the declared queries depend on.

    The driver harness may hand us a SparkSession built without our
    EngineConfig; these are all runtime-settable SQL confs, and each is
    required for correctness (not tuning): nanosAsLong makes the
    ns-timestamp events table readable at all; UTC pins timestamp
    rendering/extraction to match the DuckDB oracle (which runs UTC).
    """
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — a locked-down conf beats a crash here
            pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_session_defaults(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) — Spark reads it as an
        # epoch-nanos long under spark.sql.legacy.parquet.nanosAsLong;
        # floor-divide to micros (matches DuckDB's ns→us truncation) and
        # surface it as TIMESTAMP_NTZ like the other tables' ms timestamps.
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so SQL and DataFrame code mix."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
