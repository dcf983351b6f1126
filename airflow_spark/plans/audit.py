"""Plan audits: assert the physical plan is the one you'd want.

At 100 TB the difference between a plan with parquet filter pushdown +
column pruning + broadcast joins and one without is the difference
between minutes and days. These helpers make plan shape *testable* so
regressions fail CI, not production (see tests/test_plans.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def audit_plan(df: DataFrame, execute: bool = False) -> dict:
    """Inspect the physical plan for scale-critical properties.

    With AQE on, codegen spans and final join strategies only appear in
    the *finalized* plan — pass ``execute=True`` to run the query first
    (cheap at test scale) and audit what actually executed."""
    if execute:
        # collect() executes THIS DataFrame's plan (count() would build
        # and finalize a different one), so AQE finalization lands on
        # the queryExecution we are about to explain.
        df.collect()
    plan = explain_str(df)
    # codegen spans only show in simple mode (the `*(n)` stars)
    simple = explain_str(df, "simple")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: ([^\n]+)", plan)
    return {
        "has_pushed_filters": any(p.strip() for p in pushed),
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_schemas": read_schemas,
        "n_broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "n_sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        # shuffle Exchanges only (not BroadcastExchange / ReusedExchange):
        # simple mode prints "Exchange hashpartitioning(...)", formatted
        # mode prints the node as "(n) Exchange" with the partitioning in
        # an Arguments: line — count both spellings
        "n_shuffles": (
            len(re.findall(r"Exchange (?:hash|range|Single)", plan))
            + len(re.findall(r"\(\d+\) Exchange\b", plan))
        ),
        "has_cartesian": "CartesianProduct" in plan,
        "has_bnl_join": "BroadcastNestedLoopJoin" in plan,
        "whole_stage_codegen": (
            "WholeStageCodegen" in simple or bool(re.search(r"\*\(\d+\)", simple))
        ),
        "top_k": "TakeOrderedAndProject" in plan,
        "partial_agg": bool(
            re.search(r"HashAggregate.*partial", plan, re.IGNORECASE)
            or "partial_" in plan
        ),
        "plan": plan,
    }
