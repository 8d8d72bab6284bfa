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

from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules

load_all_query_modules()

FLAGSHIP = "q27_dice_frequency"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in sorted(QUERIES.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in sorted(QUERIES.items()) if spec.oracle
    }
