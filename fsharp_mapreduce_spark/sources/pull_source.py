"""The reference's pull-based loader as a REAL Spark data source.

The reference source contract (Loader.fs:14-38) is a user function
``dataLoadFn skip take`` pulled in chunks by the orchestrator until a
short read signals end-of-source (Gimme/chunkSize,
Orchestrator.fs:74). Spark 4's Python DataSource API lets that
contract exist as a first-class connector instead of a test harness:
``partitions()`` returns one descriptor per (skip, take) pull and each
executor task replays exactly one pull — the chunk boundary IS the
input split, so the pulls run in parallel instead of the reference's
sequential loop, and Spark's task scheduler owns retry/locality.

The shipped instance generates the example job's dice source
(Example-Job.fs:46-49) deterministically: ``roll = (roll_id % 6) + 1``
— the same derivation the q27 flagship uses, so results are
value-hash comparable across the compat path, the SQL path, and this
connector path.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

GIMME_SCHEMA = StructType(
    [
        StructField("roll_id", LongType()),
        StructField("roll", IntegerType()),
    ]
)


class GimmePull(InputPartition):
    """One (skip, take) pull — the Loader.fs:14 cursor contract."""

    def __init__(self, skip: int, take: int):
        self.skip = skip
        self.take = take


class GimmeDiceReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 60_000))
        self.chunk = int(options.get("chunk", 8_192))
        if self.chunk <= 0:
            raise ValueError("chunk must be positive")

    def partitions(self):
        # ceil(rows/chunk) pulls; the final short pull is the
        # end-of-source signal (Loader.fs:32-38) — here it is simply a
        # shorter split, no sentinel needed.
        return [
            GimmePull(skip, min(self.chunk, self.rows - skip))
            for skip in range(0, self.rows, self.chunk)
        ]

    def read(self, partition: GimmePull):
        for i in range(partition.skip, partition.skip + partition.take):
            yield (i, (i % 6) + 1)


class GimmeDiceDataSource(DataSource):
    """``spark.read.format("gimme_dice").option("rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "gimme_dice"

    def schema(self):
        return GIMME_SCHEMA

    def reader(self, schema):
        return GimmeDiceReader(self.options)


def register_pull_source(spark) -> None:
    """Idempotently register the connector on a session. The
    DataSource instance is pickled into the planner/worker processes,
    which must be able to import this module — ship the package first
    (the external-driver case: a vanilla session launched outside the
    repo has no fsharp_mapreduce_spark on executor paths)."""
    from fsharp_mapreduce_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    try:
        spark.dataSource.register(GimmeDiceDataSource)
    except Exception:
        # already registered on this session — the API has no lookup,
        # and re-registration is the only failure mode here
        pass


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
