"""Plan-inspection helpers — the engine's "did Catalyst do what I meant"
toolkit, used by tests/test_plans.py and by hand during optimization.

The iteration loop this enables (and which shaped the flagship pipeline):
.explain the executed plan, count Exchange/Scan/ArrowEvalPython nodes, and
refuse plans with accidental fan-out recompute (a DataFrame consumed by N
operators re-runs its subtree N times — Catalyst has no cross-branch CSE).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

NODE_PATTERNS = {
    "exchanges": r"\bExchange hashpartitioning",
    "scans": r"Scan parquet",
    "python_evals": r"ArrowEvalPython",
    "windows": r"\bWindow\b",
    "sort_merge_joins": r"SortMergeJoin",
    "broadcast_joins": r"BroadcastHashJoin",
    "unions": r"\bUnion\b",
    "codegen_spans": r"WholeStageCodegen",
}


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_nodes(df: DataFrame, pattern: str) -> int:
    return len(re.findall(pattern, executed_plan(df)))


def plan_summary(df: DataFrame) -> dict[str, int]:
    plan = executed_plan(df)
    return {name: len(re.findall(pat, plan)) for name, pat in NODE_PATTERNS.items()}


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan (empty list → nothing pushed)."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", executed_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — the column-pruning check."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", executed_plan(df))
