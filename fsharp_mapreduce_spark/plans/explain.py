"""Physical-plan inspection helpers — the 'did Catalyst do what we
designed for?' audit layer. Used by tests/test_plans.py to pin:
filters reach the parquet scan, projections prune the read schema,
small dims broadcast, and hot paths stay inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read from each parquet scan (pruning audit)."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    return len(re.findall(r"WholeStageCodegen", formatted_plan(df)))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (the metric to
    minimize; broadcast exchanges are excluded)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange RoundRobinPartitioning", plan))
