"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's dice-roll
frequency count, Example-Job.fs:52-61, made deterministic) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose the full registry in
``fsharp_mapreduce_spark.registry`` — one entry per implemented
operator from SURVEY.md §2 (+ north-star extensions). Nearly every
query carries a DuckDB value-hash oracle (hash-family ops use the
cross-engine md5/polynomial families so DuckDB replays them
value-for-value); the few rows-only entries (ANN recall-style ops)
are pinned by dedicated property tests instead.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fsharp_mapreduce_spark.registry import (
    QUERIES,
    exposed_queries,
    load_all_query_modules,
)

load_all_query_modules()

FLAGSHIP = "q27_dice_frequency"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The gate-exposed registry: ≤50 entries (the driver's correctness
    window checks the first 50 sorted names), covering every pipeline /
    streaming / similarity / multimodal operator plus one representative
    per relational family. The full registry (near-duplicate family
    members included) lives in ``fsharp_mapreduce_spark.registry.
    QUERIES`` and is oracle-verified locally on every pytest run —
    see ``registry.PYTEST_ONLY`` for the fold-out list and rationale."""
    return {name: spec.fn for name, spec in exposed_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible exposed
    query (pytest-only family members carry their oracles in-registry)."""
    return {
        name: spec.oracle for name, spec in exposed_queries().items() if spec.oracle
    }
