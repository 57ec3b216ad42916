from remote_shuffle_spark.plans.explain import (
    assert_broadcast_join,
    assert_no_shuffle_exchange,
    assert_pushed_filters,
    physical_plan,
)
from remote_shuffle_spark.plans.shuffle_policy import (
    CheckpointIntegrityError,
    checkpoint_to,
    read_checkpoint,
    salted_aggregate,
    write_bucketed,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_shuffle_exchange",
    "assert_pushed_filters",
    "physical_plan",
    "CheckpointIntegrityError",
    "checkpoint_to",
    "read_checkpoint",
    "salted_aggregate",
    "write_bucketed",
]
