"""Plan introspection helpers."""

from energy_pandas_spark.plans.explain import (
    broadcast_join_count,
    codegen_stage_count,
    exchange_count,
    formatted_plan,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schemas",
    "exchange_count",
    "broadcast_join_count",
    "codegen_stage_count",
]
