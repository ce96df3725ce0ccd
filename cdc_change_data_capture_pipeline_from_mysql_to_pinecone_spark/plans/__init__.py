from .inspect import assert_broadcast, assert_pushed_filters, explain_str, plan_report
from .partitioning import ensure_parallelism

__all__ = [
    "explain_str",
    "assert_pushed_filters",
    "assert_broadcast",
    "plan_report",
    "ensure_parallelism",
]
