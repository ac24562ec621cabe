from join_example_spark.plans.audit import (
    executed_plan,
    has_broadcast_hash_join,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "executed_plan",
    "has_broadcast_hash_join",
    "pushed_filters",
    "read_schema_columns",
]
