"""The reference's pull-based loader as a REAL Spark data source (implementation classes).

LEAF MODULE on purpose: no package imports — it is registered for
cloudpickle BY-VALUE serialization (pull_source.register_pull_source)
so Spark's driver-side streaming source runner and executors can
unpickle the connector WITHOUT fsharp_mapreduce_spark on their import
path (the external vanilla-driver case).

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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
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
        # Yield one Arrow RecordBatch per pull instead of per-row
        # tuples: the Python data source protocol ships Arrow batches
        # whole, so the pull materializes as two numpy vector ops
        # rather than `take` Python-object conversions. At q40's 60k
        # rows both paths sit on the same ~0.6s Python-worker floor;
        # at 5M rows / 262k-row pulls the batched source sustains
        # ~13M rows/s (0.39s end-to-end, measured 2026-08-14).
        import numpy as np
        import pyarrow as pa

        ids = np.arange(
            partition.skip, partition.skip + partition.take, dtype=np.int64
        )
        yield pa.record_batch(
            [pa.array(ids), pa.array((ids % 6 + 1).astype(np.int32))],
            names=["roll_id", "roll"],
        )


class GimmeDiceStreamReader(SimpleDataSourceStreamReader):
    """The loader's CURSOR as a streaming offset (Loader.fs:14: the
    orchestrator tracks `skip` and asks for the next chunk;
    SURVEY §2a #2). ``read(start)`` performs exactly one pull and
    returns the advanced cursor; an empty pull leaves the cursor in
    place, which is Structured Streaming's end-of-data signal — the
    reference's short-read completion detection
    (Orchestrator.fs:142-163) expressed as offsets. Spark persists the
    offsets in the checkpoint log and replays ranges via
    ``readBetweenOffsets`` on recovery, which is the exactly-once
    restart the reference never had."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 60_000))
        self.chunk = int(options.get("chunk", 8_192))
        if self.chunk <= 0:
            # mirror the batch reader: chunk=0 would otherwise pin the
            # cursor forever and silently yield an EMPTY stream
            raise ValueError("chunk must be positive")

    def initialOffset(self) -> dict:
        return {"skip": 0}

    def _pull(self, skip: int, take: int):
        return iter([(i, (i % 6) + 1) for i in range(skip, skip + take)])

    def read(self, start: dict):
        skip = start["skip"]
        take = max(0, min(self.chunk, self.rows - skip))
        return self._pull(skip, take), {"skip": skip + take}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._pull(start["skip"], end["skip"] - start["skip"])


class GimmeDiceDataSource(DataSource):
    """``spark.read[Stream].format("gimme_dice").option("rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "gimme_dice"

    def schema(self):
        return GIMME_SCHEMA

    def reader(self, schema):
        return GimmeDiceReader(self.options)

    def simpleStreamReader(self, schema):
        return GimmeDiceStreamReader(self.options)


