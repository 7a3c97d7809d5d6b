from .introspect import (
    physical_plan,
    pushed_filters,
    read_schema_columns,
    count_occurrences,
)

__all__ = [
    "physical_plan",
    "pushed_filters",
    "read_schema_columns",
    "count_occurrences",
]
