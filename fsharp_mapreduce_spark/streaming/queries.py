"""Registered streaming queries: each runs a genuine Structured
Streaming micro-batch pipeline to completion over the bounded events
fixture and returns the final table, so the driver's oracle can check
the streamed answer equals the batch answer (stream-batch parity — the
property the reference's chunked Loader implicitly relies on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fsharp_mapreduce_spark.registry import register, table
from fsharp_mapreduce_spark.streaming.loader import (
    read_pull_stream,
    run_to_completion,
    stage_as_chunked_files,
)


@register(
    "st01_stream_tumbling_agg",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window_agg"),
)
def st01_stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation executed as a real
    micro-batch stream (4 chunked pulls ≡ Gimme chunkSize,
    Loader.fs:32-38) with a 1-hour watermark, driven to completion.
    Must equal the batch q25_time_bucket answer — stream/batch parity.
    """
    staged = stage_as_chunked_files(table(spark, sf_dir, "events"), n_chunks=4)
    ev = read_pull_stream(spark, staged)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )
    out = run_to_completion(agg, "st01_out", output_mode="complete")
    return out.select(
        F.col("window").getField("start").alias("bucket"),
        "event_type",
        "n",
        "total_value",
    )


@register("st02_stream_dedup", oracle=None, tags=("streaming", "dedup"))
def st02_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-once dedup on event_id across micro-batches
    (state-store backed dropDuplicates) — counts must equal the batch
    distinct count. Rows-only check; parity pinned in
    tests/test_streaming.py."""
    staged = stage_as_chunked_files(table(spark, sf_dir, "events"), n_chunks=4)
    ev = read_pull_stream(spark, staged)
    deduped = ev.dropDuplicates(["event_id"]).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_unique")
    )
    out = run_to_completion(deduped, "st02_out", output_mode="complete")
    return out
