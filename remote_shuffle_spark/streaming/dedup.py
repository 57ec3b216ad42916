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


def dup_split_dir(
    spark: SparkSession, sf_dir: str, *, n_splits: int = 4, dup_every: int = 5
) -> str:
    """Time-ordered event split WITH IN-BATCH DUPLICATE PRESSURE: file k
    holds its contiguous (ts, event_id) range plus a second copy of every
    ``dup_every``-th event of that range — so a streaming dedup operator
    has real duplicates to drop in every micro-batch (the plain ordered
    split has none; deduping it proves only the plumbing).  Cached per
    (source identity, params), same invalidation rule as
    latedrop.late_split_dir."""
    import hashlib
    import os
    import shutil
    import tempfile

    from remote_shuffle_spark.streaming.latedrop import (
        _ordered_events,
        assign_arrival,
    )

    src = table_path(sf_dir, "events")
    real = os.path.realpath(src)
    st = os.stat(real)
    key = hashlib.sha1(
        f"dup|{real}|{n_splits}|{dup_every}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"rss_dupsplit_{key}")
    if os.path.isdir(out) and os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    tmp = f"{out}.tmp.{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    assigned = assign_arrival(
        _ordered_events(spark, sf_dir), n_splits=n_splits, late_every=None
    )
    from remote_shuffle_spark.streaming.splitutil import materialize_split_files

    dupes = assigned.filter(F.pmod(F.col("event_id"), F.lit(dup_every)) == 0)
    with_dupes = assigned.unionAll(dupes)
    materialize_split_files(
        [
            with_dupes.filter(F.col("arrival") == k).select(
                "event_id", "user_id", "event_type", "ts"
            )
            for k in range(n_splits)
        ],
        tmp,
    )
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def streaming_distinct_within_watermark(
    spark: SparkSession,
    sf_dir: str,
    *,
    watermark: str = "30 minutes",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Bounded-state streaming dedup: ``dropDuplicatesWithinWatermark``
    on event_id over the duplicate-pressure split (every 5th event
    appears twice in its micro-batch) — the PRODUCTION dedup shape this
    module's docstring has pointed at since round 3, now executed.

    Unlike ``dropDuplicates`` (state = every key ever seen, grows
    forever), state here expires once the watermark passes the key's
    event time + delay, so long-running streams hold only the last
    (delay)-window of keys — the boundedness is asserted against the
    plain variant in tests/test_streaming.py.  Semantics stay exact for
    same-event-time duplicates: a duplicate whose first copy EXPIRED
    from state is by construction also LATE (same boundary, wm >
    ts + delay) and is dropped by the watermark filter instead — which
    is precisely why the API is safe to bound.  Output over the finite
    fixture therefore equals batch DISTINCT, hash-checked by the
    oracle."""
    from remote_shuffle_spark.streaming.source import stream_session

    scoped = stream_session(spark, state_partitions)
    d = dup_split_dir(spark, sf_dir)
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    stream = (
        scoped.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    name = f"stream_dedup_wm_{uuid.uuid4().hex[:8]}"
    query = (
        stream.writeStream.outputMode("append").format("memory").queryName(name).start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return scoped.table(name).orderBy("event_id")


def doc_split_dir(spark: SparkSession, sf_dir: str, *, n_splits: int = 4) -> str:
    """Documents as a time-ordered micro-batch stream: contiguous doc_id
    ranges per file, synthetic event time ts = epoch + doc_id seconds
    (documents carry no timestamp; a deterministic one makes watermarks
    usable).  Cached like late_split_dir."""
    import hashlib
    import os
    import shutil
    import tempfile

    src = table_path(sf_dir, "documents")
    real = os.path.realpath(src)
    st = os.stat(real)
    key = hashlib.sha1(
        f"docsplit|{real}|{n_splits}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"rss_docsplit_{key}")
    if os.path.isdir(out) and os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    tmp = f"{out}.tmp.{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    docs = spark.read.parquet(src).select(
        "doc_id",
        "text",
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("doc_id") * 1_000_000
        ).alias("ts"),
    )
    # boundaries from the ACTUAL doc_id range, not the row count — a
    # regenerated fixture with 1-based or gapped ids must not lose rows
    # (range-partitioning by value only misbalances on gaps, never drops)
    bounds = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    span = int(bounds.hi) - int(bounds.lo) + 1
    from remote_shuffle_spark.streaming.splitutil import materialize_split_files

    per = max(1, span // n_splits)
    frames = []
    for k in range(n_splits):
        lo = int(bounds.lo) + k * per
        hi = int(bounds.lo) + (k + 1) * per if k < n_splits - 1 else int(bounds.hi) + 1
        frames.append(docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)))
    materialize_split_files(frames, tmp)
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def streaming_content_dedup(
    spark: SparkSession,
    sf_dir: str,
    *,
    watermark: str = "30 days",
    state_partitions: int | None = 8,
) -> DataFrame:
    """INGEST-TIME content dedup over a document stream: md5 digest of
    the text as the dedup key, ``dropDuplicatesWithinWatermark`` state —
    the first thing a training-corpus ingest does to an arriving crawl
    (content-level exact dedup, not record-key dedup).

    WATERMARK CHOICE: duplicate pairs here have DIFFERENT event times
    (ts tracks arrival position), so unlike
    :func:`streaming_distinct_within_watermark` (same-timestamp dups,
    shared expire/late boundary) a horizon shorter than the stream span
    re-admits a dup whose original expired — the "first per content"
    oracle is only exact when the watermark covers the fixture span
    (review round 7 caught the 30-minute default passing on FIXTURE LUCK:
    every planted dup pair happened to sit inside the live window).  The
    30-day default makes the oracle sound for any plausible fixture;
    production tunes it to the re-crawl window it actually wants to
    dedup across — accepting re-admission past it is the POINT of the
    bounded-state API.  Returns (doc_id, digest)."""
    from remote_shuffle_spark.streaming.source import stream_session

    scoped = stream_session(spark, state_partitions)
    d = doc_split_dir(spark, sf_dir)
    stream = (
        scoped.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
        .withColumn("digest", F.md5(F.encode("text", "utf-8")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["digest"])
        .select("doc_id", "digest")
    )
    name = f"content_dedup_{uuid.uuid4().hex[:8]}"
    query = (
        stream.writeStream.outputMode("append").format("memory").queryName(name).start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return scoped.table(name).orderBy("doc_id")
