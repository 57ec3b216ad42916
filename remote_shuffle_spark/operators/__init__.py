from remote_shuffle_spark.operators import (
    clustering,
    dedup,
    graph,
    joins,
    multimodal,
    pipeline,
    similarity,
    text,
    udf,
    upsert,
)

__all__ = [
    "clustering",
    "dedup",
    "graph",
    "joins",
    "multimodal",
    "pipeline",
    "similarity",
    "text",
    "udf",
    "upsert",
]
