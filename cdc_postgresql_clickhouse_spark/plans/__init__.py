from cdc_postgresql_clickhouse_spark.plans.inspect import (
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    read_schemas,
    shuffle_count,
)

__all__ = [
    "broadcast_join_count",
    "formatted_plan",
    "pushed_filters",
    "read_schemas",
    "shuffle_count",
]
