from remote_shuffle_spark.streaming.windowed import windowed_event_counts

__all__ = ["windowed_event_counts"]
