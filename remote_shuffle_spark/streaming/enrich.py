"""Stream-static broadcast enrichment (EXT).

The most common production streaming shape after windowed aggregation:
an event stream joined against a slowly-changing dimension table to tag
each event with business attributes before aggregating.  Spark plans a
stream-static equi-join as a per-micro-batch join against the static
side; explicitly broadcasting the dimension keeps it that way at scale
(no stateful join, no stream-side shuffle for the join itself — the
dimension rides along to every executor once per plan, exactly how a
1000-executor cluster wants a few-MB dim table handled, and the only
exchange left is the aggregation's own).

Reference parity: the reference has zero streaming (SURVEY §2.3); this
extends the engine's streaming surface alongside windowed.py/dedup.py/
sessionize.py.  The oracle is the batch join+aggregate over the same
finite input.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from remote_shuffle_spark.sources.tables import load_table, table_path


def enriched_event_counts(
    spark: SparkSession,
    sf_dir: str,
    *,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Per-market-segment event counts: stream(events) ⋈ broadcast dim.

    Each event's user maps to a customer row (``user_id + 1 ==
    c_custkey`` in the fixture's key space); the customer dimension is
    broadcast into the per-micro-batch join, then a complete-mode
    aggregation counts events and sums value per segment.  Returns the
    drained batch DataFrame (c_mktsegment, n, sum_value), deterministic
    and oracle-comparable against the batch equivalent.
    """
    from remote_shuffle_spark.streaming.source import file_stream_dir, stream_session

    scoped = stream_session(spark, state_partitions)
    path = table_path(sf_dir, "events")
    batch_schema = scoped.read.parquet(path).schema
    stream = scoped.readStream.schema(batch_schema).parquet(file_stream_dir(path))

    dim = (
        load_table(scoped, sf_dir, "customer")
        .select(
            (F.col("c_custkey") - 1).alias("user_id"),
            "c_mktsegment",
        )
    )
    enriched = stream.join(F.broadcast(dim), "user_id", "inner")
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )
    name = f"enriched_events_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return scoped.table(name).orderBy("c_mktsegment")
