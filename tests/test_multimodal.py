"""Multimodal plumbing tests: the decode step is stubbed (no codecs in
this container) but the Spark side — schemas, Arrow batch shapes,
mapInPandas row-multiplying transforms, partition parallelism — is
real and asserted here."""

from __future__ import annotations

import hashlib
import math

import pytest

from fsharp_mapreduce_spark.functions.multimodal import (
    FRAME_STRIDE,
    decode_image,
    documents_as_media,
    extract_features,
    fake_features,
    sample_frames,
)
from tests.conftest import SF_SMOKE


def test_decode_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_media_schema(spark):
    media = documents_as_media(spark, SF_SMOKE)
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    assert media.schema["payload"].dataType.simpleString() == "binary"
    meta = dict(media.select("meta.*").dtypes)
    assert meta == {
        "media_type": "string",
        "format": "string",
        "width": "int",
        "height": "int",
        "duration_ms": "bigint",
    }


def test_feature_extraction_matches_local_stub(spark):
    """The distributed mapInPandas path must agree byte-for-byte with
    a driver-local call of the same stub on the same payloads."""
    media = documents_as_media(spark, SF_SMOKE).limit(20)
    local = {
        r.media_id: fake_features(bytes(r.payload)).tolist()
        for r in media.collect()
    }
    dist = {r.media_id: r.features for r in extract_features(media).collect()}
    assert set(dist) == set(local)
    for mid in local:
        assert len(dist[mid]) == 16
        assert all(
            math.isclose(a, b, rel_tol=1e-6) for a, b in zip(dist[mid], local[mid])
        )
        assert all(0.0 <= v <= 1.0 for v in dist[mid])


def test_feature_extraction_partition_invariant(spark):
    """Same answer at 1 and 8 partitions — no per-partition state leaks
    through the Arrow batch boundary."""
    media = documents_as_media(spark, SF_SMOKE)
    one = {r.media_id: r.byte_len for r in extract_features(media.coalesce(1)).collect()}
    many = {r.media_id: r.byte_len for r in extract_features(media.repartition(8)).collect()}
    assert one == many


def test_frame_sampling_counts_and_digests(spark):
    """Row-multiplying mapInPandas: n_frames = ceil(len/stride); each
    frame digest equals a locally computed sha256 of that byte window."""
    media = documents_as_media(spark, SF_SMOKE).limit(5)
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    frames = sample_frames(media).collect()
    by_media = {}
    for fr in frames:
        by_media.setdefault(fr.media_id, {})[fr.frame_no] = fr.frame_digest
    for mid, body in payloads.items():
        want_n = max(1, math.ceil(len(body) / FRAME_STRIDE))
        assert len(by_media[mid]) == want_n
        for i in range(0, max(len(body), 1), FRAME_STRIDE):
            want = hashlib.sha256(body[i : i + FRAME_STRIDE]).hexdigest()
            assert by_media[mid][i // FRAME_STRIDE] == want


def test_metadata_scan_prunes_payload(spark):
    """Metadata-only queries must not read the payload column: the
    parquet ReadSchema of a meta-only projection excludes it (column
    pruning — the property that makes metadata scans cheap at 100 TB).
    """
    import tempfile

    d = tempfile.mkdtemp(prefix="fsmr_media_")
    documents_as_media(spark, SF_SMOKE).write.mode("overwrite").parquet(d)
    df = spark.read.parquet(d).select("media_id", "meta.media_type")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan, plan


def test_resize_matches_local_stub(spark):
    """The distributed resize path must agree byte-for-byte with a
    driver-local nearest-neighbor downsample of the same payloads."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import resize_media

    media = documents_as_media(spark, SF_SMOKE).limit(20)

    def local_resize(body: bytes, target: int = 8) -> tuple[int, bytes]:
        side = int(len(body) ** 0.5)
        out = min(target, side)
        if out == 0:
            return 0, b""
        arr = np.frombuffer(body[: side * side], dtype=np.uint8).reshape(side, side)
        idx = (np.arange(out) * side) // out
        return out, arr[np.ix_(idx, idx)].tobytes()

    local = {r.media_id: local_resize(bytes(r.payload)) for r in media.collect()}
    dist = {r.media_id: r for r in resize_media(media).collect()}
    assert set(dist) == set(local)
    for mid, (out, buf) in local.items():
        row = dist[mid]
        assert (row.out_w, row.out_h) == (out, out)
        assert row.out_bytes == len(buf) == out * out
        assert bytes(row.resized) == buf
