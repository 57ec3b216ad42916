from remote_shuffle_spark.streaming.sessionize import sessionize_batch, sessionize_streaming
from remote_shuffle_spark.streaming.windowed import windowed_event_counts

__all__ = ["sessionize_batch", "sessionize_streaming", "windowed_event_counts"]
