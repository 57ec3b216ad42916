"""Shared plumbing for the file-backed streaming queries.

Two concerns every streaming declared query has:

- The file-stream source needs a DIRECTORY, but the fixture is one
  read-only parquet file — expose it through a per-target symlink dir.
  The dir is keyed on a hash of the file's REALPATH (not its basename):
  two fixtures with the same basename, or a regenerated fixture at a new
  path, must never silently stream each other's data.  A dangling or
  stale link is re-pointed, not trusted.

- ``spark.sql.shuffle.partitions`` sizes the state-store exchange and is
  fixed at query start.  Mutating the SHARED session conf around
  ``start()`` races concurrent queries on the same session, so the
  setting is scoped to a cloned session (``spark.newSession()`` — same
  SparkContext, isolated SQL conf + temp catalog) instead.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from remote_shuffle_spark.sources.tables import ensure_session_defaults


def event_time(dtype: str | None) -> Column:
    """``ts`` normalized to TIMESTAMP (watermarks require TIMESTAMP, not
    NTZ) from whichever physical type the events fixture carries:

    - ``bigint`` — parquet TIMESTAMP(NANOS) read as epoch-nanos long under
      ``spark.sql.legacy.parquet.nanosAsLong``; floor-divide to micros
      (matches DuckDB's ns→us truncation);
    - ``timestamp_ntz`` / ``timestamp`` — plain cast; the session timezone
      is pinned UTC (ensure_session_defaults) so the wall clock is
      identical to the NTZ batch path either way.
    """
    if dtype == "bigint":
        return F.timestamp_micros(F.expr("ts div 1000"))
    return F.col("ts").cast("timestamp")


def file_stream_dir(path: str, *, link_name: str = "events.parquet") -> str:
    """Directory exposing the single file at ``path`` to a file-stream source."""
    real = os.path.realpath(path)
    key = hashlib.sha1(real.encode()).hexdigest()[:12]
    stream_dir = os.path.join(tempfile.gettempdir(), f"rss_stream_{key}")
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, link_name)
    # lexists, not exists: a dangling symlink must be replaced, not raced
    if os.path.lexists(link):
        if not os.path.islink(link) or os.readlink(link) != real:
            os.remove(link)
            os.symlink(real, link)
    else:
        os.symlink(real, link)
    return stream_dir


def stream_session(spark: SparkSession, state_partitions: int | None) -> SparkSession:
    """Session to run one streaming query in.

    ``state_partitions`` set → a cloned session with that shuffle-partition
    count (state store instances = shuffle partitions at query start; size
    to distinct group keys, not corpus — see windowed.py).  ``None`` → the
    caller's session, conf untouched.
    """
    if state_partitions is None:
        ensure_session_defaults(spark)
        return spark
    scoped = spark.newSession()
    ensure_session_defaults(scoped)
    scoped.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    return scoped
