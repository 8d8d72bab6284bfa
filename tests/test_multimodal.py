"""Multimodal plumbing tests: the decode step is stubbed (no codecs in
this container) but the Spark side — schemas, Arrow batch shapes,
mapInPandas row-multiplying transforms, partition parallelism — is
real and asserted here."""

from __future__ import annotations

import hashlib
import math

import pytest

from fsharp_mapreduce_spark.functions.multimodal import (
    decode_image,
    documents_as_media,
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


def test_real_media_fixture_schema_and_formats(spark):
    """The real-media fixture: schema matches MEDIA_SCHEMA, every
    payload's magic bytes agree with the residue-assigned format, and
    the meta column carries the encoder's declared dimensions."""
    from fsharp_mapreduce_spark.functions.multimodal import (
        _CODECS,
        documents_as_real_media,
        sniff_codec,
    )

    media = documents_as_real_media(spark, SF_SMOKE)
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    rows = media.limit(40).collect()
    assert rows
    for r in rows:
        codec = _CODECS[r.media_id % 4]
        assert sniff_codec(bytes(r.payload)) == codec
        assert r.meta.format == codec


def test_container_constants_match_encoders():
    """_CONTAINER_BYTES/_N_UNITS are format arithmetic used by the m01
    oracle — pin them to the actual encoder output so a header change
    cannot silently desynchronize the oracle."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import (
        _CONTAINER_BYTES,
        _N_UNITS,
        AVI_FRAMES,
        AVI_H,
        AVI_W,
        WAV_SAMPLES,
        encode_avi_gray,
        encode_bmp_gray,
        encode_wav_pcm16,
        BMP_SIDE,
    )

    assert _CONTAINER_BYTES["bmp"] == len(
        encode_bmp_gray(np.zeros((BMP_SIDE, BMP_SIDE), dtype=np.uint8))
    )
    assert _CONTAINER_BYTES["wav"] == len(
        encode_wav_pcm16(np.zeros(WAV_SAMPLES, dtype="<i2"))
    )
    assert _CONTAINER_BYTES["avi"] == len(
        encode_avi_gray(np.zeros((AVI_FRAMES, AVI_H, AVI_W), dtype=np.uint8))
    )
    assert _N_UNITS["wav"] == WAV_SAMPLES
    assert _N_UNITS["avi"] == AVI_FRAMES * AVI_H * AVI_W


def test_real_feature_extraction_matches_local_decode(spark):
    """The distributed mapInPandas feature path must agree with a
    driver-local decode of the same container bytes — and the decoded
    features must differ from what the RAW payload bytes would give
    (i.e. the decoders are really in the loop)."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import (
        FEATURE_DIMS,
        decode_real_units,
        documents_as_real_media,
        extract_real_features,
    )

    media = documents_as_real_media(spark, SF_SMOKE).limit(20)
    local = {}
    for r in media.collect():
        _, units = decode_real_units(bytes(r.payload))
        local[r.media_id] = [
            float(units[w::FEATURE_DIMS].mean()) for w in range(FEATURE_DIMS)
        ]
    dist = {r.media_id: r.features for r in extract_real_features(media).collect()}
    assert set(dist) == set(local)
    for mid in local:
        assert len(dist[mid]) == FEATURE_DIMS
        assert dist[mid] == local[mid]  # exact rationals, no tolerance


def test_real_feature_extraction_partition_invariant(spark):
    """Same answer at 1 and 8 partitions — no per-partition state
    leaks through the Arrow batch boundary."""
    from fsharp_mapreduce_spark.functions.multimodal import (
        documents_as_real_media,
        extract_real_features,
    )

    media = documents_as_real_media(spark, SF_SMOKE)
    one = {
        r.media_id: r.features
        for r in extract_real_features(media.coalesce(1)).collect()
    }
    many = {
        r.media_id: r.features
        for r in extract_real_features(media.repartition(8)).collect()
    }
    assert one == many


def test_real_frame_sampling_shapes(spark):
    """Row-multiplying frame extraction on decoded media: AVI rows
    yield AVI_FRAMES real container frames of H*W pixels, images one
    full-grid frame, audio four fixed windows — and per-frame sums
    match a local decode."""
    from fsharp_mapreduce_spark.functions.multimodal import (
        _FRAME_UNITS,
        AVI_FRAMES,
        decode_real_units,
        documents_as_real_media,
        sample_real_frames,
    )

    media = documents_as_real_media(spark, SF_SMOKE).limit(12)
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    frames = sample_real_frames(media).collect()
    by_media = {}
    for fr in frames:
        by_media.setdefault(fr.media_id, {})[fr.frame_no] = (
            fr.n_units,
            fr.frame_sum,
        )
    for mid, body in payloads.items():
        kind, units = decode_real_units(body)
        fsize = _FRAME_UNITS[kind]
        want_n = (len(units) + fsize - 1) // fsize
        assert len(by_media[mid]) == want_n
        if kind == "avi":
            assert want_n == AVI_FRAMES
        for fno in range(want_n):
            window = units[fno * fsize : (fno + 1) * fsize]
            assert by_media[mid][fno] == (len(window), int(window.sum()))


def test_metadata_scan_prunes_payload(spark):
    """Metadata-only queries must not read the payload column: the
    parquet ReadSchema of a meta-only projection excludes it (column
    pruning — the property that makes metadata scans cheap at 100 TB).
    """
    import tempfile

    from fsharp_mapreduce_spark.functions.multimodal import (
        documents_as_real_media,
    )

    from fsharp_mapreduce_spark.scratch import scratch_dir

    d = scratch_dir("fsmr_media_")
    documents_as_real_media(spark, SF_SMOKE).write.mode("overwrite").parquet(d)
    df = spark.read.parquet(d).select("media_id", "meta.media_type")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan, plan


def test_real_resize_matches_local_decode(spark):
    """The distributed resize path must agree byte-for-byte with a
    driver-local decode + nearest-neighbor downsample, only image
    rows (BMP/PNG residues) reach the Python stage, and the emitted
    buffer is the actual sampled pixel grid."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import (
        BMP_SIDE,
        PNG_SIDE,
        RESIZE_TARGET,
        decode_real_units,
        documents_as_real_media,
        resize_real_images,
    )

    media = documents_as_real_media(spark, SF_SMOKE).limit(20)
    local = {}
    for r in media.collect():
        if r.media_id % 4 not in (0, 3):
            continue
        kind, units = decode_real_units(bytes(r.payload))
        side = BMP_SIDE if kind == "bmp" else PNG_SIDE
        arr = units.reshape(side, side)
        idx = (np.arange(RESIZE_TARGET) * side) // RESIZE_TARGET
        sampled = arr[np.ix_(idx, idx)]
        local[r.media_id] = (int(sampled.sum()), sampled.astype(np.uint8).tobytes())
    dist = {r.media_id: r for r in resize_real_images(media).collect()}
    assert set(dist) == set(local)  # non-image rows filtered out
    for mid, (s, buf) in local.items():
        row = dist[mid]
        assert (row.out_w, row.out_h) == (RESIZE_TARGET, RESIZE_TARGET)
        assert row.resized_sum == s
        assert bytes(row.resized) == buf


def test_m01_sniffs_codec_jvm_side(spark):
    """m01's codec column is computed from the payload MAGIC BYTES by
    JVM expressions (no Python stage after the fixture encode) and
    always agrees with the residue assignment."""
    from fsharp_mapreduce_spark.functions.multimodal import _CODECS
    from fsharp_mapreduce_spark.registry import QUERIES

    rows = QUERIES["m01_multimodal_meta"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.codec == _CODECS[r.media_id % 4]
        if r.codec == "png":
            assert r.byte_len is None  # deflate-dependent, no closed form
        else:
            assert r.byte_len is not None


# --- real BMP codec path (m06, VERDICT r4 #6) -----------------------


def _handbuilt_bmp(pixels_topdown, height_sign=1, palette_fn=None):
    """Build an 8-bit BMP byte-by-byte in the TEST, independently of
    encode_bmp_gray, so a decoder bug can't be masked by a mirrored
    encoder bug. pixels_topdown: list of rows, top row first."""
    import struct

    h, w = len(pixels_topdown), len(pixels_topdown[0])
    stride = (w + 3) // 4 * 4
    palette_fn = palette_fn or (lambda i: (i, i, i))
    palette = b"".join(bytes((*palette_fn(i)[::-1], 0)) for i in range(256))  # BGRX
    offset = 14 + 40 + len(palette)
    rows_order = pixels_topdown[::-1] if height_sign > 0 else pixels_topdown
    body = b"".join(
        bytes(r) + b"\x00" * (stride - w) for r in rows_order
    )
    header = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h * height_sign, 1, 8, 0, len(body), 0, 0, 256, 0
    )
    return header + info + palette + body


def test_decode_bmp_golden_bottom_up_with_padding():
    """3×2 image (stride 4 → one real padding byte/row), bottom-up
    storage: the decoder must flip rows and drop padding."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import decode_bmp

    pixels = [[10, 20, 30], [40, 50, 60]]
    img = decode_bmp(_handbuilt_bmp(pixels))
    assert img.shape == (2, 3)
    assert img.tolist() == pixels
    assert img.dtype == np.uint8


def test_decode_bmp_top_down_negative_height():
    from fsharp_mapreduce_spark.functions.multimodal import decode_bmp

    pixels = [[1, 2, 3], [4, 5, 6]]
    img = decode_bmp(_handbuilt_bmp(pixels, height_sign=-1))
    assert img.tolist() == pixels


def test_decode_bmp_maps_through_palette():
    """A non-identity palette (i → 255−i in the red channel) must be
    honored: index bytes are NOT gray values in a palettized BMP."""
    from fsharp_mapreduce_spark.functions.multimodal import decode_bmp

    pixels = [[0, 1, 2], [3, 4, 5]]
    img = decode_bmp(
        _handbuilt_bmp(pixels, palette_fn=lambda i: (255 - i, i, i))
    )
    assert img.tolist() == [[255 - v for v in row] for row in pixels]


def test_decode_bmp_rejects_malformed_and_unsupported():
    from fsharp_mapreduce_spark.functions.multimodal import decode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG" + b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 10)  # truncated header
    # 24-bit uncompressed → the documented codec gate, not a wrong answer
    import struct

    hdr = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 0, 4, 0, 0, 0, 0)
    with pytest.raises(NotImplementedError):
        decode_bmp(hdr + info + b"\x00" * 4)


def test_encode_decode_roundtrip():
    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import (
        decode_bmp,
        encode_bmp_gray,
    )

    rng = np.random.default_rng(7)
    for side in (1, 3, 7, 18):  # sides hitting every stride remainder
        px = rng.integers(0, 256, size=(side, side), dtype=np.uint8)
        assert (decode_bmp(encode_bmp_gray(px)) == px).all()


def test_m06_decoded_stats_match_local_decode(spark):
    """The distributed encode→decode pipeline must agree with a
    driver-local replay on the same payloads — and the pixel_sum must
    equal the analytic digest tiling (what the oracle checks)."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import (
        BMP_SIDE,
        bmp_roundtrip_stats,
    )

    media = documents_as_media(spark, SF_SMOKE).limit(20)
    n = BMP_SIDE * BMP_SIDE
    local = {}
    for r in media.collect():
        digest = hashlib.sha256(bytes(r.payload)).digest()
        flat = np.frombuffer((digest * (n // 32 + 1))[:n], dtype=np.uint8)
        local[r.media_id] = int(flat.astype(np.int64).sum())
    dist = {r.media_id: r for r in bmp_roundtrip_stats(media).collect()}
    assert set(dist) == set(local)
    for mid, expected_sum in local.items():
        row = dist[mid]
        assert (row.width, row.height) == (BMP_SIDE, BMP_SIDE)
        assert row.pixel_sum == expected_sum


def _wav_bytes(chunks: list[tuple[bytes, bytes]]) -> bytes:
    """Hand-pack a RIFF/WAVE file from (chunk_id, body) pairs — BYTE
    LITERALS independent of both the encoder and the parser."""
    import struct

    body = b""
    for cid, cbody in chunks:
        body += struct.pack("<4sI", cid, len(cbody)) + cbody
        if len(cbody) % 2:
            body += b"\x00"  # RIFF pad byte
    return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body


def _fmt_chunk(audio_format=1, channels=1, rate=8000, bits=16) -> bytes:
    import struct

    block = channels * bits // 8
    return struct.pack("<HHIIHH", audio_format, channels, rate, rate * block, block, bits)


def test_decode_wav_golden_literal():
    """Hand-built WAV with an extra LIST chunk BEFORE data and an
    odd-sized chunk (pad byte) between fmt and data: the parser must
    walk chunks — not assume the 44-byte layout — and read the exact
    little-endian int16 samples."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import decode_wav

    samples = np.array([0, 1, -1, 32767, -32768], dtype="<i2")
    wav = _wav_bytes(
        [
            (b"fmt ", _fmt_chunk()),
            (b"LIST", b"INFOabc"),  # 7 bytes: odd → exercises the pad
            (b"data", samples.tobytes()),
        ]
    )
    got, rate = decode_wav(wav)
    assert rate == 8000
    assert got.tolist() == samples.tolist()


def test_decode_wav_rejects_malformed_and_gates_unsupported():
    import numpy as np
    import pytest

    from fsharp_mapreduce_spark.functions.multimodal import decode_wav

    with pytest.raises(ValueError, match="RIFF/WAVE magic"):
        decode_wav(b"RIFX....WAVE" + b"\x00" * 32)
    with pytest.raises(ValueError, match="missing fmt/data"):
        decode_wav(_wav_bytes([(b"fmt ", _fmt_chunk())]))
    # truncated data chunk: declared size exceeds payload
    import struct

    trunc = _wav_bytes([(b"fmt ", _fmt_chunk())]) + struct.pack("<4sI", b"data", 100)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(trunc + b"\x00" * 10)
    # short fmt chunk must be the documented ValueError, not a raw
    # struct.error (code-review r5)
    with pytest.raises(ValueError, match="fmt chunk too short"):
        decode_wav(_wav_bytes([(b"fmt ", b"\x01\x00"), (b"data", b"\x00\x00")]))
    for bad_fmt in (_fmt_chunk(channels=2), _fmt_chunk(bits=8), _fmt_chunk(audio_format=3)):
        wav = _wav_bytes([(b"fmt ", bad_fmt), (b"data", b"\x00\x00")])
        with pytest.raises(NotImplementedError, match="mono 16-bit PCM"):
            decode_wav(wav)


def test_wav_roundtrip_and_minimal_header():
    """The stdlib writer emits the minimal 44-byte header (the
    constant the oracle's wav_bytes column relies on) and the parser
    inverts it exactly."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import (
        decode_wav,
        encode_wav_pcm16,
    )

    samples = np.arange(-250, 250, dtype="<i2")
    wav = encode_wav_pcm16(samples, 8000)
    assert len(wav) == 44 + 2 * len(samples)
    got, rate = decode_wav(wav)
    assert rate == 8000 and got.tolist() == samples.tolist()


def _chunk(cid: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack("<4sI", cid, len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def _avih(n_frames, w, h, us_per_frame=40000) -> bytes:
    import struct

    return struct.pack(
        "<IIIIIIIIII", us_per_frame, 0, 0, 0x10, n_frames, 0, 1, 0, w, h
    ) + b"\x00" * 16


def _avi(chunks: bytes) -> bytes:
    import struct

    body = b"AVI " + chunks
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def test_decode_avi_golden_literal():
    """Hand-built AVI with an extra JUNK chunk and an odd-sized LIST
    between hdrl and movi: the parser must walk chunks (honoring pad
    bytes), read geometry from avih, and undo the 4-byte stride and
    bottom-up row order of each '00db' frame."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import decode_avi

    # 2 frames of 2x3 (w=3 → stride 4, one real pad byte per row)
    f0 = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    f1 = np.array([[9, 8, 7], [6, 5, 4]], dtype=np.uint8)

    def raster(f):
        return bytes(
            b for r in range(f.shape[0] - 1, -1, -1) for b in (*f[r].tolist(), 0)
        )

    avi = _avi(
        _list(b"hdrl", _chunk(b"avih", _avih(2, 3, 2)))
        + _chunk(b"JUNK", b"padding")  # 7 bytes: odd → pad exercised
        + _list(b"movi", _chunk(b"00db", raster(f0)) + _chunk(b"00db", raster(f1)))
    )
    frames, fps = decode_avi(avi)
    assert fps == 25
    assert frames.shape == (2, 2, 3)
    assert frames[0].tolist() == f0.tolist()
    assert frames[1].tolist() == f1.tolist()


def test_decode_avi_rejects_and_gates():
    import pytest

    from fsharp_mapreduce_spark.functions.multimodal import decode_avi

    with pytest.raises(ValueError, match="RIFF/'AVI ' magic"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="missing avih"):
        decode_avi(_avi(_list(b"movi", b"")))
    # frame-count mismatch between avih and movi
    bad = _avi(
        _list(b"hdrl", _chunk(b"avih", _avih(3, 3, 2)))
        + _list(b"movi", _chunk(b"00db", b"\x00" * 8))
    )
    with pytest.raises(ValueError, match="declares 3 frames"):
        decode_avi(bad)
    # sub-1-fps us_per_frame is rejected (fps=0 would divide-by-zero
    # downstream; review r5b)
    slow = _avi(
        _list(b"hdrl", _chunk(b"avih", _avih(1, 3, 2, us_per_frame=2_500_000)))
        + _list(b"movi", _chunk(b"00db", b"\x00" * 8))
    )
    with pytest.raises(ValueError, match="fps < 1"):
        decode_avi(slow)
    # compressed stream is the documented gate
    comp = _avi(
        _list(b"hdrl", _chunk(b"avih", _avih(1, 3, 2)))
        + _list(b"movi", _chunk(b"00dc", b"\xff\xd8"))
    )
    with pytest.raises(NotImplementedError, match="00dc"):
        decode_avi(comp)


def test_avi_roundtrip():
    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import (
        decode_avi,
        encode_avi_gray,
    )

    frames = np.arange(4 * 8 * 10, dtype=np.uint8).reshape(4, 8, 10)
    avi = encode_avi_gray(frames, fps=25)
    got, fps = decode_avi(avi)
    assert fps == 25 and got.tolist() == frames.tolist()


# --- m09: PNG codec golden tests ------------------------------------------


def test_png_bytes_are_spec_conformant():
    """Byte-literal walk of an encoded PNG: 8-byte signature, IHDR
    first with big-endian dims + (8, 0, 0, 0, 0), two IDAT chunks
    (the deliberate split), IEND last, every chunk CRC valid."""
    import struct
    import zlib

    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import PNG_SIG, encode_png_gray

    px = np.arange(9, dtype=np.uint8).reshape(3, 3)
    png = encode_png_gray(px)
    assert png[:8] == PNG_SIG
    pos, seen = 8, []
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        ctype = png[pos + 4 : pos + 8]
        data = png[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", png[pos + 8 + length : pos + 12 + length])
        assert zlib.crc32(ctype + data) & 0xFFFFFFFF == crc, ctype
        seen.append(ctype)
        pos += 12 + length
    assert seen == [b"IHDR", b"IDAT", b"IDAT", b"IEND"], seen
    w, h, depth, color, comp, filt, inter = struct.unpack(
        ">IIBBBBB", png[16 : 16 + 13]
    )
    assert (w, h, depth, color, comp, filt, inter) == (3, 3, 8, 0, 0, 0, 0)


def test_png_every_filter_type_reconstructs():
    """An 18-row image rotates through all five PNG filter types
    (row % 5); the decoder must reconstruct each against the
    previously-reconstructed row — any per-filter defect corrupts
    that row and everything below it."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import (
        decode_png,
        encode_png_gray,
    )

    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, (18, 18)).astype(np.uint8)
    assert (decode_png(encode_png_gray(px)) == px).all()


def test_png_decoder_gates_and_crc():
    """Corrupted chunk bytes fail the CRC check loudly; color/16-bit
    PNGs hit the documented NotImplementedError gate; a non-PNG
    payload is rejected at the signature."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from fsharp_mapreduce_spark.functions.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png_gray,
    )

    png = bytearray(encode_png_gray(np.zeros((4, 4), dtype=np.uint8)))
    png[40] ^= 0xFF  # flip a byte inside IDAT without fixing the CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))
    rgb_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # color type 2
    rgb = PNG_SIG + _png_chunk(b"IHDR", rgb_ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="grayscale"):
        decode_png(rgb)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")


def test_sniff_codec_identifies_all_four_and_rejects_unknown():
    """sniff_codec routes by bytes: all four encoders' outputs are
    identified, RIFF disambiguates WAV vs AVI by the form type, and
    unknown payloads raise."""
    import numpy as np
    import pytest

    from fsharp_mapreduce_spark.functions.multimodal import (
        AVI_FRAMES,
        AVI_H,
        AVI_W,
        encode_avi_gray,
        encode_bmp_gray,
        encode_png_gray,
        encode_wav_pcm16,
        sniff_codec,
    )

    img = np.zeros((4, 4), dtype=np.uint8)
    assert sniff_codec(encode_bmp_gray(img)) == "bmp"
    assert sniff_codec(encode_png_gray(img)) == "png"
    assert sniff_codec(encode_wav_pcm16(np.zeros(16, dtype="<i2"))) == "wav"
    assert (
        sniff_codec(
            encode_avi_gray(np.zeros((AVI_FRAMES, AVI_H, AVI_W), dtype=np.uint8))
        )
        == "avi"
    )
    with pytest.raises(ValueError, match="unrecognized"):
        sniff_codec(b"GIF89a not supported")


def test_m11_cuts_vary_within_and_across_videos(spark):
    """m11: per-frame digests must make adjacent-frame energies
    genuinely independent — across the fixture the cut count takes
    BOTH extremes and interior values (the single-digest tiling this
    replaced collapsed every video to all-or-nothing cuts: 80 ≡ 16
    (mod 32) makes |d[(j+16)%32]−d[j]| 16-periodic, so all three
    energies coincide), and max_frame_diff ≥ total_motion/3 holds
    row-wise (sanity of the per-frame split)."""
    from fsharp_mapreduce_spark.registry import QUERIES

    rows = (
        QUERIES["m11_scene_cut_detection"]
        .fn(spark, SF_SMOKE)
        .limit(300)
        .collect()
    )
    cuts = {r["n_cuts"] for r in rows}
    assert cuts & {1, 2}, cuts  # interior values exist
    assert len(cuts) >= 3, cuts
    for r in rows:
        assert r["n_frames"] == 4
        assert r["max_frame_diff"] * 3 >= r["total_motion"], r


def test_m12_energy_profile_stats_on_crafted_profiles():
    """The run/onset logic on hand-built profiles, independent of any
    codec: runs at the edges, interior runs, all-silent, no-silent."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import energy_profile_stats

    cases = [
        # profile                      n_silent, longest, onsets
        ([5, 3, 9], (0, 0, 0)),
        ([0, 0, 0], (3, 3, 0)),
        ([0, 5, 0, 0, 7, 0], (4, 2, 2)),
        ([3, 0, 0, 0, 2], (3, 3, 1)),
        ([0], (1, 1, 0)),
        ([0, 4], (1, 1, 1)),
        ([4, 0], (1, 1, 0)),
    ]
    for profile, want in cases:
        got = energy_profile_stats(np.array(profile, dtype=np.int64))
        assert got == want, (profile, got, want)


def test_m12_silence_structure_varies_across_fixture(spark):
    """m12: the gain-byte envelope must produce genuine temporal
    structure — across the fixture the corpus has silent AND loud
    windows, multiple distinct run lengths, and onset counts; and
    per-row accounting holds (silent + loud = 16, run ≤ silent,
    peak·16 ≥ total)."""
    from fsharp_mapreduce_spark.registry import QUERIES

    rows = (
        QUERIES["m12_audio_silence_segmentation"]
        .fn(spark, SF_SMOKE)
        .limit(300)
        .collect()
    )
    assert {r["n_silent"] for r in rows} - {0, 16}, "no interior silence counts"
    assert len({r["longest_silence_run"] for r in rows}) >= 3
    assert any(r["n_onsets"] > 0 for r in rows)
    for r in rows:
        assert r["n_windows"] == 16, r
        assert r["longest_silence_run"] <= r["n_silent"] <= 16, r
        assert r["n_onsets"] <= r["n_silent"], r
        assert r["peak_window_energy"] * 16 >= r["total_energy"], r
        assert (r["n_silent"] == 16) == (r["total_energy"] == 0), r


def test_m14_planted_neardups(spark, tmp_path):
    """m14 semantics on a planted corpus: an exact duplicate pairs at
    hamming 0; a lightly-perturbed copy (one token substituted) pairs
    within the threshold; an unrelated document does not pair with the
    base; a 3-token doc is excluded by the sparsity guard. The hash is
    computed on pixels that round-tripped the REAL BMP codec, so this
    also exercises encode_bmp_gray/decode_bmp on the bag-of-words
    image."""
    import random

    from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules

    load_all_query_modules()

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    base_tokens = [rng.choice(vocab) for _ in range(60)]
    base = " ".join(base_tokens)
    perturbed_tokens = list(base_tokens)
    perturbed_tokens[7] = "zzz"  # one substitution → few cells differ
    perturbed = " ".join(perturbed_tokens)
    unrelated = " ".join(f"x{i}" for i in range(60))
    rows = [
        (0, base, "en", "synth", len(base)),
        (1, base, "en", "synth", len(base)),
        (2, perturbed, "en", "synth", len(perturbed)),
        (3, unrelated, "en", "synth", len(unrelated)),
        (4, "a b c", "en", "synth", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["m14_image_dhash_neardup"].fn(spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in out}
    assert pairs.get((0, 1)) == 0, pairs  # identical text → identical image
    assert (0, 2) in pairs and pairs[(0, 2)] <= 4, pairs
    assert (0, 3) not in pairs and (1, 3) not in pairs, pairs
    assert all(4 not in p for p in pairs), pairs  # sparsity guard


def test_m15_planted_neardups(spark, tmp_path):
    """m15 semantics on a planted corpus (the m14 pins repeated for
    the audio path): an exact duplicate pairs at hamming 0; a
    one-token substitution pairs within the threshold; an unrelated
    document does not pair with the base; a 3-token doc is excluded
    by the sparsity guard. The fingerprint is computed on per-frame
    sums of samples that round-tripped the REAL WAV codec, so this
    also exercises encode_wav_pcm16/decode_wav on the synthesized
    envelope clip."""
    import random

    from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules

    load_all_query_modules()

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    base_tokens = [rng.choice(vocab) for _ in range(60)]
    base = " ".join(base_tokens)
    perturbed_tokens = list(base_tokens)
    perturbed_tokens[7] = "zzz"
    perturbed = " ".join(perturbed_tokens)
    unrelated = " ".join(f"x{i}" for i in range(60))
    rows = [
        (0, base, "en", "synth", len(base)),
        (1, base, "en", "synth", len(base)),
        (2, perturbed, "en", "synth", len(perturbed)),
        (3, unrelated, "en", "synth", len(unrelated)),
        (4, "a b c", "en", "synth", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["m15_audio_fingerprint_neardup"].fn(spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in out}
    assert pairs.get((0, 1)) == 0, pairs  # identical text → identical clip
    assert (0, 2) in pairs and pairs[(0, 2)] <= 4, pairs
    assert (0, 3) not in pairs and (1, 3) not in pairs, pairs
    assert all(4 not in p for p in pairs), pairs  # sparsity guard


def test_m15_envelope_survives_codec(spark):
    """audio_fingerprint_bands' envelope recovery is exact: a frame
    table with known amplitudes (including the 255 clip) yields band
    bits equal to the direct amplitude-gradient computation — pinned
    against an independent numpy replay, not the engine's own code
    path."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import (
        M15_BANDS,
        M15_FRAMES,
        audio_fingerprint_bands,
    )

    rng = np.random.RandomState(7)
    amps = rng.randint(0, 300, size=M15_FRAMES)  # some clip at 255
    frames = [
        {"frame": int(j), "cnt": int(c)} for j, c in enumerate(amps) if c > 0
    ]
    df = spark.createDataFrame(
        [(1, frames)],
        "doc_id long, frames array<struct<frame:int,cnt:bigint>>",
    )
    row = audio_fingerprint_bands(df).collect()[0]
    clipped = np.minimum(amps, 255)
    bits = clipped > np.roll(clipped, -1)
    expect = []
    for b in range(M15_BANDS):
        val = 0
        for k in range(b * 16, (b + 1) * 16):
            if bits[k]:
                val |= 1 << (k % 16)
        expect.append(val)
    assert [row[f"b{b}"] for b in range(M15_BANDS)] == expect


def test_m16_planted_neardups(spark, tmp_path):
    """m16 semantics on a planted corpus (the m14/m15 pins repeated
    for the video path): an exact duplicate pairs at hamming 0; a
    one-token substitution pairs within the threshold; an unrelated
    document does not pair with the base; a 3-token doc is excluded
    by the sparsity guard. The fingerprint is computed on per-frame
    quadrant sums of pixels that round-tripped the REAL AVI codec, so
    this also exercises encode_avi_gray/decode_avi on the synthesized
    clip."""
    import random

    from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules

    load_all_query_modules()

    rng = random.Random(16)
    vocab = [f"w{i}" for i in range(40)]
    base_tokens = [rng.choice(vocab) for _ in range(60)]
    base = " ".join(base_tokens)
    perturbed_tokens = list(base_tokens)
    perturbed_tokens[7] = "zzz"
    perturbed = " ".join(perturbed_tokens)
    unrelated = " ".join(f"x{i}" for i in range(60))
    rows = [
        (0, base, "en", "synth", len(base)),
        (1, base, "en", "synth", len(base)),
        (2, perturbed, "en", "synth", len(perturbed)),
        (3, unrelated, "en", "synth", len(unrelated)),
        (4, "a b c", "en", "synth", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["m16_video_fingerprint_neardup"].fn(spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in out}
    assert pairs.get((0, 1)) == 0, pairs  # identical text → identical clip
    assert (0, 2) in pairs and pairs[(0, 2)] <= 4, pairs
    assert (0, 3) not in pairs and (1, 3) not in pairs, pairs
    assert all(4 not in p for p in pairs), pairs  # sparsity guard


def test_m16_raster_survives_codec(spark):
    """video_fingerprint_bands' quadrant recovery is exact: a cell
    table with known amplitudes (including the 255 clip) yields band
    bits equal to the direct quadrant-gradient computation — pinned
    against an independent numpy replay, not the engine's own code
    path."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.multimodal import (
        M16_BANDS,
        M16_CELLS,
        M16_FRAMES,
        M16_SIDE,
        video_fingerprint_bands,
    )

    rng = np.random.RandomState(9)
    amps = rng.randint(0, 300, size=M16_CELLS)  # some clip at 255
    cells = [
        {"cell": int(j), "cnt": int(c)} for j, c in enumerate(amps) if c > 0
    ]
    df = spark.createDataFrame(
        [(1, cells)],
        "doc_id long, cells array<struct<cell:int,cnt:bigint>>",
    )
    row = video_fingerprint_bands(df).collect()[0]
    clipped = np.minimum(amps, 255).reshape(M16_FRAMES, M16_SIDE, M16_SIDE)
    h = M16_SIDE // 2
    q = np.stack(
        [
            clipped[:, :h, :h].sum(axis=(1, 2)),
            clipped[:, :h, h:].sum(axis=(1, 2)),
            clipped[:, h:, :h].sum(axis=(1, 2)),
            clipped[:, h:, h:].sum(axis=(1, 2)),
        ],
        axis=1,
    )
    bits = (q > np.roll(q, -1, axis=1)).reshape(-1)
    expect = []
    for b in range(M16_BANDS):
        val = 0
        for k in range(b * 16, (b + 1) * 16):
            if bits[k]:
                val |= 1 << (k % 16)
        expect.append(val)
    assert [row[f"b{b}"] for b in range(M16_BANDS)] == expect
