from remote_shuffle_spark.streaming.cdc import streaming_cdc_upsert
from remote_shuffle_spark.streaming.dedup import streaming_distinct
from remote_shuffle_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_streaming,
    sessionize_streaming_table,
)
from remote_shuffle_spark.streaming.sink import (
    drain_append_to_parquet,
    drain_complete_to_parquet,
)
from remote_shuffle_spark.streaming.windowed import (
    windowed_event_counts,
    windowed_event_counts_filesink,
)

__all__ = [
    "drain_append_to_parquet",
    "drain_complete_to_parquet",
    "sessionize_batch",
    "streaming_cdc_upsert",
    "sessionize_streaming",
    "sessionize_streaming_table",
    "streaming_distinct",
    "windowed_event_counts",
    "windowed_event_counts_filesink",
]
