"""Loader pull-stream semantics on Structured Streaming.

The reference's Loader is a batched pull source: the orchestrator asks
``Gimme chunkSize`` and gets ≤ chunkSize records until the source is
exhausted (Loader.fs:32-38, Orchestrator.fs:74-88), with flow control
by map-acks. Structured Streaming's micro-batch engine is the exact
analogue: ``maxFilesPerTrigger``/``maxOffsetsPerTrigger`` caps a
trigger's intake (≡ Gimme chunkSize), offsets+checkpoints replace the
``toSkip`` cursor (Loader.fs:14,38), and backpressure is the trigger
loop itself. ``handleResults`` (Orchestrator.fs:175) maps to
``foreachBatch``.
"""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import DataFrame, SparkSession


def stage_as_chunked_files(df: DataFrame, n_chunks: int, out_dir: str | None = None) -> str:
    """Materialize a DataFrame as ``n_chunks`` parquet files so a file
    stream with maxFilesPerTrigger=1 replays it in n_chunks pulls —
    the test harness for Gimme-chunkSize semantics."""
    out_dir = out_dir or tempfile.mkdtemp(prefix="fsmr_stream_")
    df.repartition(n_chunks).write.mode("overwrite").parquet(out_dir)
    return out_dir


def read_pull_stream(
    spark: SparkSession, staged_dir: str, chunk_files: int = 1
) -> DataFrame:
    """readStream over the staged chunk files, one chunk per trigger."""
    schema = spark.read.parquet(staged_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", chunk_files)
        .parquet(staged_dir)
    )


def run_to_completion(stream_df: DataFrame, query_name: str, output_mode: str = "complete"):
    """Drive a bounded stream to exhaustion into an in-memory sink and
    return the final result table (the batch-equivalent answer). The
    reference's completion detection (ack counting,
    Orchestrator.fs:142-163) is Spark's processAllAvailable."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.table(query_name)


def n_chunks_for(total_rows: int, chunk_size: int) -> int:
    return max(1, math.ceil(total_rows / chunk_size))
