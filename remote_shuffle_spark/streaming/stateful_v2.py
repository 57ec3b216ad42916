"""Spark 4 `transformWithStateInPandas` seam (the post-applyInPandasWithState
stateful API: typed ValueState/ListState/MapState, timers, TTL, initial
state).

ENVIRONMENT GATE: the API's Python↔JVM state server speaks protobuf, and
this container ships no `google.protobuf` (verified: the TWS driver worker
crashes with `ImportError: cannot import name 'descriptor'` during
`validateAndMaybeEvolveStateSchema`).  The code below is therefore the
documented seam — real processor, real wiring, importable and unit-shaped —
behind :func:`tws_available`, exactly like the multimodal Pillow tier:
on a real cluster (protobuf present) it runs as written; here the pytest
skips with the reason recorded.

The applyInPandasWithState path (streaming/sessionize.py) remains the
container-verified stateful operator; this module exists so a user of the
NEW API has a working pattern to start from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle


def tws_available() -> bool:
    """True iff transformWithStateInPandas can actually run here: the
    state-server protocol imports google.protobuf at first use."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class FirstNPerKey(StatefulProcessor):
    """Keep each key's first ``n`` rows by (ts, event_id) across ALL
    micro-batches — a stateful limiter (per-user rate cap / bounded
    sampling).  One ValueState long per key.  CONTRACT: batches must
    arrive in event-time order for "first" to be global — feed it
    ``latedrop.late_split_dir(..., late_every=None)`` (the ordered-only
    split).  The default late-re-delivery split violates this: its final
    batch re-delivers the EARLIEST events, which this processor would
    wrongly reject as beyond-count."""

    def __init__(self, n: int = 5):
        self.n = n

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.count = handle.getValueState("count", "n long")

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
        taken = self.count.get()[0] if self.count.exists() else 0
        take = pdf.head(max(0, self.n - taken))
        self.count.update((taken + len(take),))
        if len(take):
            yield take[["user_id", "event_id"]]

    def close(self) -> None:
        pass


def first_n_per_key_stream(
    spark: SparkSession,
    sf_dir: str,
    *,
    n: int = 5,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run :class:`FirstNPerKey` over the strictly time-ordered event
    split (``late_split_dir(..., late_every=None)`` — no late
    re-delivery, satisfying the processor's ordered-batch contract) and
    return the drained (user_id, event_id) frame.  Batch oracle: rows
    with ``row_number() over (partition by user_id order by ts,
    event_id) <= n``.  Raises RuntimeError with the environment reason
    when the TWS protocol cannot run here (see module docstring)."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf (the TWS "
            "state-server protocol); not available in this container — "
            "run on a cluster image with protobuf installed"
        )
    import uuid

    from remote_shuffle_spark.streaming.latedrop import (
        _ordered_events,
        late_split_dir,
    )
    from remote_shuffle_spark.streaming.source import stream_session

    split = late_split_dir(spark, sf_dir, late_every=None)
    schema = _ordered_events(spark, sf_dir).schema
    s2 = stream_session(spark, state_partitions)
    s2.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = (
        s2.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(split)
    )
    out = stream.groupBy("user_id").transformWithStateInPandas(
        FirstNPerKey(n), "user_id long, event_id long", "Update", "none"
    )
    name = f"first_n_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return s2.table(name).orderBy("user_id", "event_id")
