"""The reference's pull-based loader as a REAL Spark data source.

See ``pull_source_impl`` for the connector classes and the full design
note; this module registers the connector on a session and declares
the q40/st11 queries that prove it.
"""

from __future__ import annotations

from fsharp_mapreduce_spark.sources.pull_source_impl import (  # noqa: F401
    GIMME_SCHEMA,
    GimmeDiceDataSource,
    GimmeDiceReader,
    GimmeDiceStreamReader,
    GimmePull,
)


def register_pull_source(spark) -> None:
    """Idempotently register the connector on a session. The
    DataSource class is pickled into planner/worker processes that may
    not have this repo on their import path (external vanilla driver:
    addPyFile covers executors, but the driver-side streaming source
    runner inherits only the driver env) — so serialize the leaf impl
    module BY VALUE: the unpickler rebuilds the classes from the
    pickle itself, no import needed anywhere."""
    import fsharp_mapreduce_spark.sources.pull_source_impl as _impl

    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(_impl)
    except Exception:
        # cloudpickle layout changed — fall back to path shipping
        # (covers executors; driver-side runner then needs the repo
        # on PYTHONPATH, which in-repo callers have)
        from fsharp_mapreduce_spark.session import ensure_package_shipped

        ensure_package_shipped(spark)
    # no guard: register() overwrites on re-registration (idempotent by
    # API contract), and a missing/broken DataSource API should surface
    # HERE, not as a confusing "source not found" at read time
    spark.dataSource.register(GimmeDiceDataSource)


# -- registered query --------------------------------------------------

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from fsharp_mapreduce_spark.registry import register  # noqa: E402

PULL_ROWS = 60_000
PULL_CHUNK = 8_192


@register(
    "q40_dice_pull_source",
    oracle=f"""
    SELECT CASE WHEN (i % 6) + 1 = 3 THEN 'Win' ELSE 'Lose' END AS outcome,
           COUNT(*) AS n
    FROM generate_series(0, {PULL_ROWS - 1}) t(i)
    GROUP BY 1
    """,
    tags=("source", "connector", "mapreduce"),
)
def q40_dice_pull_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship dice frequency count read through the custom
    pull-source CONNECTOR (pytest-only; q27 holds the flagship slot):
    ``spark.read.format("gimme_dice")`` plans one task per (skip,
    take) pull — the reference's sequential chunked loader
    (Loader.fs:14-38) turned into a parallel first-class source. The
    oracle needs no fixture table: the source is deterministic, so
    DuckDB replays it from generate_series. sf_dir is unused by
    design — this query proves the connector, not the corpus."""
    from fsharp_mapreduce_spark.sources.pull_source import register_pull_source

    register_pull_source(spark)
    src = (
        spark.read.format("gimme_dice")
        .option("rows", PULL_ROWS)
        .option("chunk", PULL_CHUNK)
        .load()
    )
    outcome = F.when(F.col("roll") == 3, "Win").otherwise("Lose")
    return src.groupBy(outcome.alias("outcome")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "st11_dice_pull_stream",
    oracle=f"""
    SELECT CASE WHEN (i % 6) + 1 = 3 THEN 'Win' ELSE 'Lose' END AS outcome,
           COUNT(*) AS n
    FROM generate_series(0, {PULL_ROWS - 1}) t(i)
    GROUP BY 1
    """,
    tags=("streaming", "source", "connector", "mapreduce"),
)
def st11_dice_pull_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship through the connector's STREAMING side
    (pytest-only; st01 holds the pull-stream gate slot): one micro-
    batch per (skip, take) pull, the cursor persisted as the stream
    offset — the reference's sequential chunked consumption
    reproduced exactly, down to completion-by-short-read
    (Orchestrator.fs:74,142-163). The final answer must equal the
    batch connector's (q40) and the generate_series oracle — the
    stream/batch parity property, proven here on a custom source
    rather than a file replay. sf_dir unused by design."""
    from fsharp_mapreduce_spark.streaming.loader import run_to_completion

    register_pull_source(spark)
    src = (
        spark.readStream.format("gimme_dice")
        .option("rows", PULL_ROWS)
        .option("chunk", PULL_CHUNK)
        .load()
    )
    outcome = F.when(F.col("roll") == 3, "Win").otherwise("Lose")
    agg = src.groupBy(outcome.alias("outcome")).agg(F.count(F.lit(1)).alias("n"))
    return run_to_completion(agg, "st11_out", output_mode="complete")
