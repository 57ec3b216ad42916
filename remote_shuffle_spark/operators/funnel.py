"""Event-funnel analysis (EXT): ordered-step conversion counting over the
events table — the product-analytics shape (how many users did A, then B
after A, then C after B).

Declarative three-phase plan instead of per-user Python: each step is a
filtered aggregation keyed by user joined to the previous step's first
completion time.  Every shuffle is on ``user_id`` (8-byte key), each pass
reads only its step's events (the event-type filter pushes into the scan),
and AQE broadcasts the per-user step tables once they shrink below the
threshold — at 100 TB the funnel narrows monotonically, so later stages
get cheaper, not costlier.  No collect, no window over the whole corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strict-order funnel: a user converts step i when an event of type
    ``steps[i]`` exists strictly after their step-(i-1) conversion time;
    the conversion time is the EARLIEST such event (the standard
    first-touch funnel).  Returns one row: ``step_1 … step_n`` counts of
    users reaching each step.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        if prev is None:
            cur = ev.groupBy("u").agg(F.min("t").alias("t_conv"))
        else:
            cur = (
                ev.join(prev.withColumnRenamed("t_conv", "t_prev"), "u")
                .filter(F.col("t") > F.col("t_prev"))
                .groupBy("u")
                .agg(F.min("t").alias("t_conv"))
            )
        reached.append(cur)
        prev = cur
    counts = [
        r.agg(F.count(F.lit(1)).alias(f"step_{i + 1}")) for i, r in enumerate(reached)
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)  # each side is a single-row aggregate
    return out
