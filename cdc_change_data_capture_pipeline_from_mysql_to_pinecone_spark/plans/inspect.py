"""Plan-inspection helpers.

The scale contract (filters reach the scan, small dims broadcast,
codegen spans stay wide) is asserted in tests, not hoped for —
`.explain` output is the interface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Assert a predicate was pushed into the parquet scan
    (PushedFilters: [...] in the formatted plan)."""
    plan = explain_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    if not any(fragment in ln for ln in pushed):
        raise AssertionError(f"filter {fragment!r} not pushed; plan:\n{plan}")


def assert_broadcast(df: DataFrame) -> None:
    """Assert the plan contains a broadcast join (no shuffle of the
    big side)."""
    plan = explain_str(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(f"no broadcast join in plan:\n{plan}")


def plan_report(df: DataFrame) -> dict:
    """Summarize the physical plan's scale-relevant features — the
    quick 'is this the plan I want' check (exchange count ≈ shuffle
    count; join strategies; scan-level pushdown)."""
    full = explain_str(df)
    # node counts come from the plan tree only — the formatted detail
    # section repeats every node name and would double-count; pushed
    # filters live in the detail section. After an AQE query has run,
    # the tree also echoes the pre-adaptive plan under '== Initial
    # Plan ==' — count only the plan that actually executed.
    tree = full.split("\n\n")[0].split("== Initial Plan ==")[0]
    return {
        "exchanges": sum(
            1 for ln in tree.splitlines() if "Exchange" in ln and "BroadcastExchange" not in ln
        ),
        "broadcast_joins": tree.count("BroadcastHashJoin") + tree.count("BroadcastNestedLoopJoin"),
        "sort_merge_joins": tree.count("SortMergeJoin"),
        "shuffled_hash_joins": tree.count("ShuffledHashJoin"),
        "has_take_ordered": "TakeOrderedAndProject" in tree,
        "pushed_filters": [
            ln.split("PushedFilters:", 1)[1].strip()
            for ln in full.splitlines()
            if "PushedFilters:" in ln and "PushedFilters: []" not in ln
        ],
        "scans": sum(1 for ln in tree.splitlines() if "Scan parquet" in ln),
    }
