from remote_shuffle_spark.streaming.dedup import streaming_distinct
from remote_shuffle_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_streaming,
    sessionize_streaming_table,
)
from remote_shuffle_spark.streaming.windowed import windowed_event_counts

__all__ = [
    "sessionize_batch",
    "sessionize_streaming",
    "sessionize_streaming_table",
    "streaming_distinct",
    "windowed_event_counts",
]
