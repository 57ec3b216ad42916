"""Structured Streaming demo over the events table (EXT).

The reference is batch-shuffle only (SURVEY §2.3 — zero streaming code),
so this is a north-star extension: tumbling-window aggregation with a
watermark, run as a real ``readStream`` → ``writeStream`` pipeline driven
to completion with ``processAllAvailable`` (the parquet directory stands
in for a stream source, exactly like the reference's tests used
``file://`` as the "remote" filesystem).

The result of a complete-mode windowed aggregation over a finite input
equals the batch GROUP BY time_bucket — which is what the DuckDB oracle
checks.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from remote_shuffle_spark.sources.tables import table_path


def windowed_event_counts(
    spark: SparkSession,
    sf_dir: str,
    *,
    window: str = "5 minutes",
    watermark: str = "1 hour",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Tumbling-window per-event-type counts + exact value sums.

    Returns a batch DataFrame (the drained memory-sink table) with columns
    (window_start string, event_type, n, sum_value) — deterministic and
    oracle-comparable.

    ``state_partitions`` sizes the stateful exchange (state store
    instances = shuffle partitions at query start, fixed for the query's
    lifetime).  Unlike batch shuffles, every state partition pays
    per-micro-batch commit overhead even when near-empty, so this should
    track the number of DISTINCT GROUP KEYS (windows x event types —
    thousands here), not the corpus size; 32 partitions of tiny state
    measured 1.8x slower than 8 on the fixture.  None = leave the
    session's ``spark.sql.shuffle.partitions`` untouched (use on a real
    cluster where the session conf is already sized for state).
    """
    agg, _ = windowed_event_agg(
        spark, sf_dir, window=window, watermark=watermark, state_partitions=state_partitions
    )
    name = f"windowed_events_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    out = agg.sparkSession.table(name)
    return _project_windows(out)


def windowed_event_agg(
    spark: SparkSession,
    sf_dir: str,
    *,
    window: str = "5 minutes",
    watermark: str = "1 hour",
    state_partitions: int | None = 8,
):
    """The streaming windowed aggregation FRAME (not yet drained) +
    the scoped session that owns it — shared by every sink flavor
    (memory drain above, parquet sinks in streaming.sink)."""
    from remote_shuffle_spark.streaming.source import (
        event_time,
        file_stream_dir,
        stream_session,
    )

    scoped = stream_session(spark, state_partitions)
    path = table_path(sf_dir, "events")
    batch = scoped.read.parquet(path)
    # the file-stream source requires a directory: expose the single
    # fixture file through a symlink dir (testdata itself is read-only)
    stream_dir = file_stream_dir(path)
    stream = scoped.readStream.schema(batch.schema).parquet(stream_dir)
    ts = event_time(dict(batch.dtypes).get("ts"))
    agg = (
        stream.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
    )
    return agg, scoped


def _project_windows(out: DataFrame) -> DataFrame:
    return out.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    ).orderBy("window_start", "event_type")


def windowed_event_counts_filesink(
    spark: SparkSession,
    sf_dir: str,
    *,
    window: str = "5 minutes",
    watermark: str = "1 hour",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Same windowed aggregation driven through the PRODUCTION sink
    (streaming.sink.drain_complete_to_parquet: foreachBatch + idempotent
    parquet overwrite, executor-side writes) and read back from the files
    — the ship-path counterpart of the memory-sink backfill above, with
    the identical result contract (same oracle)."""
    from remote_shuffle_spark.streaming.sink import drain_complete_to_parquet

    agg, scoped = windowed_event_agg(
        spark, sf_dir, window=window, watermark=watermark, state_partitions=state_partitions
    )
    out_dir = drain_complete_to_parquet(agg)
    return _project_windows(scoped.read.parquet(out_dir))


def session_window_stream(
    spark: SparkSession,
    sf_dir: str,
    *,
    gap: str = "30 minutes",
    gap_expr=None,
    watermark: str = "2 hours",
    state_partitions: int | None = 8,
) -> DataFrame:
    """NATIVE streaming session windows (``F.session_window`` under
    append mode) — the built-in merging-session state operator, next to
    the hand-rolled applyInPandasWithState sessionizer.  Append mode
    emits a session only when the watermark FINALIZES it (no more
    events can merge in), so with the fixture as one micro-batch plus
    Spark's no-data eviction batch the emitted set is a pure function
    of the input:

        session emitted  iff  session_end (= last event + gap) <
                              max(ts) - watermark_delay

    (boundary tie-free on the fixtures, asserted in tests; unfinalized
    tail sessions stay in state exactly as a live stream would keep
    them mergeable).  Returns (user_id, session_start, session_end,
    n_events) as formatted strings/longs, batch-oracle-comparable."""
    import uuid

    from remote_shuffle_spark.sources.tables import table_path
    from remote_shuffle_spark.streaming.source import (
        event_time,
        file_stream_dir,
        stream_session,
    )

    scoped = stream_session(spark, state_partitions)
    path = table_path(sf_dir, "events")
    batch = scoped.read.parquet(path)
    stream = (
        scoped.readStream.schema(batch.schema)
        .parquet(file_stream_dir(path))
        .withColumn("ts", event_time(dict(batch.dtypes).get("ts")))
        .withWatermark("ts", watermark)
    )
    # gap_expr (a per-event Column, e.g. event-type-dependent timeouts)
    # selects the DYNAMIC-gap form; session end is then max(ts + gap)
    # over members, and append-mode finalization stays end <= watermark
    # (inclusive), identical to the static-gap eviction boundary.
    agg = stream.groupBy(
        "user_id",
        F.session_window("ts", gap_expr if gap_expr is not None else gap).alias(
            "sw"
        ),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    name = f"session_stream_{uuid.uuid4().hex[:8]}"
    q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        scoped.table(name)
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
