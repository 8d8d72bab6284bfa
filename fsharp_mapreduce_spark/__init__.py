"""PySpark-native analytics engine with the capabilities of
nikiwiles/FSharp-MapReduce, re-expressed Spark-first.

The reference (read-only at /root/reference) is a ~450-line generic
MapReduce execution framework on Akka.NET actors: a batched pull
Loader, an Orchestrator (driver/scheduler) and Workers (map + reduce),
driven by four user closures (load, map, reduce, handle-results) that
are pickled and shipped to actors (Common.fs:14, Example-Job.fs:72-75).

This package keeps that *capability surface* but none of the actor
machinery — Spark's DAG scheduler, shuffle service and hash aggregation
own scheduling, batching, acking and fault tolerance (SURVEY.md §3-4):

- ``compat``     — the MapReduceJob closure API (load/map/reduce/handle)
- ``sources``    — batch readers/writers (parquet/csv/json/orc/text)
- ``operators``  — DataFrame-native relational operator library
- ``functions``  — text analysis, dedup, similarity, multimodal columns
- ``streaming``  — Loader pull-stream semantics on Structured Streaming
- ``plans``      — plan-inspection helpers (pushdown / broadcast audits)
"""

from fsharp_mapreduce_spark.registry import release_scoped_caches
from fsharp_mapreduce_spark.session import get_spark

__all__ = ["get_spark", "release_scoped_caches"]
__version__ = "0.1.0"
