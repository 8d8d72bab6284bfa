"""Physical-plan inspection helpers — the 'did Catalyst do what we
designed for?' audit layer. Used by tests/test_plans.py to pin:
filters reach the parquet scan, projections prune the read schema,
small dims broadcast, and hot paths stay inside whole-stage codegen.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


@contextmanager
def aqe_off(spark: SparkSession):
    """Build a plan with AQE disabled (an AdaptiveSparkPlan's initial
    plan reports 0 codegen subtrees before execution — audit the
    static plan instead). Execution configs are restored on exit."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _split_depth0(s: str) -> list[str]:
    """Split on commas at bracket depth 0 only. A flat ``split(",")``
    mangles nested payloads — struct<a:struct<w:int,h:int>> would emit
    a phantom top-level 'h' column, and In(col, [a,b]) would split
    into two half-filters (ADVICE r4)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "<([":
            depth += 1
        elif ch in ">)]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan.
    Matches to END OF LINE, not the first ']' — In(col, [a,b]) filters
    contain nested brackets that a non-greedy class would truncate
    (code-review r4); the depth-0 split keeps each such filter whole."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*)\]", plan):
        out.extend(_split_depth0(m.group(1)))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read from each parquet scan (pruning audit)."""
    plan = formatted_plan(df)
    out = []
    # greedy to the LAST '>' on the line: nested types
    # (struct<a:array<int>,b:string>) would otherwise truncate at the
    # inner '>' and drop later columns from the audit (code-review r4);
    # depth-0 comma split so nested struct fields don't surface as
    # phantom top-level columns (ADVICE r4)
    for m in re.finditer(r"ReadSchema: struct<(.*)>", plan):
        out.append({c.split(":")[0].strip() for c in _split_depth0(m.group(1))})
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)  # one JVM explain round-trip, not two
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (codegen explain mode —
    formatted mode doesn't annotate codegen spans)."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (the metric to
    minimize; broadcast exchanges are excluded). Formatted mode prints
    each node once in the detail section as ``(n) Exchange``."""
    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.MULTILINE))
