"""Plan-inspection helpers — the engine's scale audit layer.

These assert the *physical* properties the 100 TB design depends on:
filters pushed into parquet scans, pruned read schemas, broadcast hints
honored, and shuffle counts bounded. Used by tests/test_plans.py so a
regression that silently de-optimizes a plan fails CI, not the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def analyzed_plan(df: DataFrame) -> str:
    """Analyzed logical plan — pre-cache-substitution, so filters inside
    a persisted (staged) subtree remain visible for pinning."""
    return df._jdf.queryExecution().analyzed().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the final (AQE-resolved) plan."""
    plan = executed_plan(df)
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if ``fragment`` appears in a scan's PushedFilters list."""
    plan = formatted_plan(df)
    return any(
        fragment in line
        for line in plan.splitlines()
        if "PushedFilters" in line
    )


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names in every parquet scan's ReadSchema (pruning check)."""
    import re

    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            cols.extend(re.findall(r"(\w+):", line.split("struct<", 1)[-1]))
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)
