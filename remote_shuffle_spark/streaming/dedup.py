"""Streaming exact deduplication (EXT — the reference is batch-only,
SURVEY §2.3; this is the streaming face of operators/dedup.py).

``dropDuplicates`` over a ``readStream`` source keeps the first arrival
per key with state in the state store; a watermark bounds how long state
lives (production uses ``dropDuplicatesWithinWatermark`` + RocksDB state
store so the key set never grows unbounded).  Over a finite input the
retained key set equals batch DISTINCT — which is what the DuckDB oracle
checks.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from remote_shuffle_spark.sources.tables import table_path


def streaming_distinct(
    spark: SparkSession,
    sf_dir: str,
    *,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "1 hour",
    state_partitions: int | None = 8,
) -> DataFrame:
    """First-arrival dedup of the events stream on ``keys``.

    Returns the drained memory-sink table projected to ``keys`` — one row
    per distinct key combination, deterministic, oracle-comparable.

    ``state_partitions`` sizes the stateful exchange — see
    streaming/windowed.py: size it to the distinct-key cardinality, not
    the corpus; None respects the session conf.
    """
    from remote_shuffle_spark.streaming.source import (
        event_time,
        file_stream_dir,
        stream_session,
    )

    scoped = stream_session(spark, state_partitions)
    path = table_path(sf_dir, "events")
    batch = scoped.read.parquet(path)
    stream_dir = file_stream_dir(path)
    stream = scoped.readStream.schema(batch.schema).parquet(stream_dir)
    ts = event_time(dict(batch.dtypes).get("ts"))
    deduped = (
        stream.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .dropDuplicates(list(keys))
        .select(*keys)
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    query = (
        deduped.writeStream.outputMode("append").format("memory").queryName(name).start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return scoped.table(name).orderBy(*keys)
