"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, plus the mapInPandas plumbing for decode /
feature-extract / resize / frame-sample stages.

The container has no image/audio codecs, so the actual decode step is
STUBBED (clearly marked ``NotImplementedError`` or a deterministic
fake) — but everything Spark-side is real and tested: the schema, the
Arrow batch shapes, the UDF signatures, and the partition-parallel
execution (tests/test_multimodal.py).

At 100 TB the pattern is: payloads stay in parquet binary columns,
transformations run as mapInPandas over Arrow batches (one Python
worker per core, zero driver involvement), and metadata-only queries
never touch the payload bytes thanks to parquet column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fsharp_mapreduce_spark.registry import register, table

# Typed metadata carried alongside every payload.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture adapter: treat each document's UTF-8 bytes as an opaque
    payload so the binary-column pipeline is exercised end-to-end on
    real distributed data."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB — real implementation needs an image codec (PIL/opencv),
    not present in this container. The Spark-side contract (bytes in,
    HxWxC uint8 array out) is what the pipeline is built against."""
    raise NotImplementedError(
        "image decode requires a codec library; wire PIL/cv2 here on a real cluster"
    )


def fake_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature extractor: sha256-seeded pseudo
    embedding. Lets the full distributed plumbing (Arrow batches,
    schema, partitioning) run and be asserted without codecs."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype="<u4")
    return (raw.astype(np.float64) / np.iinfo("uint32").max).astype(np.float32)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, per-partition,
    no shuffle. This is the template the real decode/resize/
    frame-sample stages drop into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "features": pdf["payload"].map(lambda b: fake_features(b, dim).tolist()),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


@register(
    "m01_multimodal_meta",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           sha256(text) AS digest
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def m01_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass: payload byte length + content
    digest, computed JVM-side (no Python) — the dedup/integrity scan
    every multimodal ingest runs before decode."""
    media = documents_as_media(spark, sf_dir)
    return media.select(
        "media_id",
        F.length("payload").cast("bigint").alias("byte_len"),
        F.sha2("payload", 256).alias("digest"),
    )
