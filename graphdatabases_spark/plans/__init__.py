from graphdatabases_spark.plans.inspect import (
    executed_plan,
    explain_formatted,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    whole_stage_codegen_spans,
)

__all__ = [
    "executed_plan",
    "explain_formatted",
    "has_broadcast_join",
    "pushed_filters",
    "read_schema_columns",
    "whole_stage_codegen_spans",
]
