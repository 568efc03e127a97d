"""Physical-plan inspection: the 100 TB posture made checkable.

The engine has no custom Catalyst rules (SURVEY §4 showed none are
needed) — its performance contract is that the *standard* optimizations
actually fire: filters and column pruning reach the parquet scan,
small dimensions broadcast instead of shuffling the fact side, and hot
expression pipelines stay inside whole-stage codegen. These helpers
turn those properties into assertions so tests catch plan regressions
the same way oracle checks catch value regressions.
"""

from .inspect import (
    broadcast_join_count,
    formatted_plan,
    has_whole_stage_codegen,
    lint_plan,
    pushed_filters,
    scan_columns,
    shuffle_count,
    sort_merge_join_count,
)

__all__ = [
    "broadcast_join_count",
    "formatted_plan",
    "has_whole_stage_codegen",
    "lint_plan",
    "pushed_filters",
    "scan_columns",
    "shuffle_count",
    "sort_merge_join_count",
]
