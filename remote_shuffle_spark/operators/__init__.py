from remote_shuffle_spark.operators import (
    dedup,
    joins,
    multimodal,
    pipeline,
    similarity,
    text,
    udf,
)

__all__ = ["dedup", "joins", "multimodal", "pipeline", "similarity", "text", "udf"]
