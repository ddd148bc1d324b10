"""Real stdlib decoders in operators/multimodal.py: PNG (zlib + scanline
un-filtering, all five filter types) and WAV (wave module), plus the stub
fallback tiers and the Spark mapInPandas plumbing."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest
from pyspark.sql import Row

from manga_ocr_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_png,
    decode_wav,
    media_features,
)


# -- reference PNG encoder (independent forward filtering) --------------------


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _filter_raw(px: np.ndarray, filters: list[int]) -> bytes:
    """Forward-filter an (h, w, 3) image: one filter-type byte + filtered
    scanline per row (the independent inverse of the decoder's unfilter)."""
    h, w, ch = px.shape
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = px[y].reshape(-1).astype(np.int64)
        f = filters[y % len(filters)]
        line = cur.copy()
        if f == 1:  # sub
            for x in range(w * ch - 1, ch - 1, -1):
                line[x] = (cur[x] - cur[x - ch]) & 0xFF
        elif f == 2:  # up
            line = (cur - prev) & 0xFF
        elif f == 3:  # average
            for x in range(w * ch):
                a = cur[x - ch] if x >= ch else 0
                line[x] = (cur[x] - ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # paeth
            for x in range(w * ch):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (cur[x] - pr) & 0xFF
        raw.append(f)
        raw += bytes(line.astype(np.uint8))
        prev = cur
    return bytes(raw)


def encode_png(px: np.ndarray, filters: list[int]) -> bytes:
    """Minimal PNG encoder for tests: 8-bit RGB, one filter type per row."""
    h, w, ch = px.shape
    assert ch == 3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_filter_raw(px, filters)))
        + _chunk(b"IEND", b"")
    )


_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def encode_png_adam7(px: np.ndarray, filters: list[int]) -> bytes:
    """Adam7-interlaced PNG: seven independently-filtered pass sub-images."""
    h, w, ch = px.shape
    assert ch == 3
    raw = bytearray()
    for xs, ys, xstep, ystep in _ADAM7:
        sub = px[ys::ystep, xs::xstep]
        if sub.shape[0] and sub.shape[1]:
            raw += _filter_raw(np.ascontiguousarray(sub), filters)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _gradient_image(w: int = 16, h: int = 10) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((x + y) * 7 % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


def test_png_roundtrip_every_filter_type():
    px = _gradient_image()
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        data = encode_png(px, filters)
        w, h, feat = decode_png(data)
        assert (w, h) == (16, 10)
        luma = px.astype(np.float64).mean(axis=2)
        want = [
            round(float(b.mean()) / 255.0, 6)
            for b in np.array_split(luma, FEATURE_DIM, axis=0)
        ]
        assert feat == want, f"filters={filters}"


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"garbage")


def encode_bmp(px: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP encoder (independent of the decoder)."""
    h, w, ch = px.shape
    assert ch == 3
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = px[y].reshape(-1).astype(np.uint8).tobytes()
        body += row + b"\x00" * (stride - len(row))
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<Iii", 40, w, h)
        + struct.pack("<HH", 1, 24)
        + struct.pack("<IIiiII", 0, len(body), 2835, 2835, 0, 0)
    )
    return header + bytes(body)


def test_bmp_real_decode():
    from manga_ocr_spark.operators.multimodal import decode_bmp

    px = _gradient_image(9, 11)  # odd width exercises row padding
    w, h, feat = decode_bmp(encode_bmp(px))
    assert (w, h) == (9, 11)
    luma = px.astype(np.float64).mean(axis=2)
    want = [
        round(float(b.mean()) / 255.0, 6)
        for b in np.array_split(luma, FEATURE_DIM, axis=0)
    ]
    assert feat == want


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_wav_real_decode_rms():
    t = np.arange(8000)
    samples = (np.sin(2 * np.pi * 440 * t / 8000) * 16384).astype(np.int16)
    nch, nframes, feat = decode_wav(encode_wav(samples))
    assert (nch, nframes) == (1, 8000)
    # RMS of a 0.5-amplitude sine is ~0.5/sqrt(2)
    assert all(abs(f - 0.5 / np.sqrt(2)) < 0.01 for f in feat)


def test_media_features_real_jpeg_tier(spark):
    # a genuine baseline JPEG flows through the REAL decoder inside the
    # Spark mapInPandas plumbing: true dims, luma-band features
    from tests.test_jpeg import Q_ONE, _test_image, encode_gray_jpeg

    px = _test_image(24, 16)
    jpg = encode_gray_jpeg(px, Q_ONE)
    rows = [Row(media_id=1, payload=bytearray(jpg))]
    (r,) = media_features(spark.createDataFrame(rows)).collect()
    assert r.format == "jpeg" and (r.width, r.height) == (24, 16)
    want = [
        round(float(b.mean()) / 255.0, 6)
        for b in np.array_split(px.astype(np.float64), FEATURE_DIM, axis=0)
    ]
    # q=1 round-trip is near-lossless: bands within 1/255
    assert all(abs(a - b) < 1 / 255 for a, b in zip(r.feature, want))


def test_media_features_real_and_stub_tiers(spark):
    png = encode_png(_gradient_image(), [0, 1, 2, 3, 4])
    wav = encode_wav((np.ones(800) * 1000).astype(np.int16))
    rows = [
        Row(media_id=1, payload=bytearray(png)),
        Row(media_id=2, payload=bytearray(wav)),
        Row(media_id=3, payload=bytearray(b"\x89PNG\r\n" + b"x" * 100)),  # corrupt png
        Row(media_id=4, payload=bytearray(b"\xff\xd8\xff" + b"y" * 50)),  # jpeg: stub
        Row(media_id=5, payload=bytearray(b"")),
    ]
    out = {r.media_id: r for r in media_features(spark.createDataFrame(rows)).collect()}
    assert out[1].format == "png" and (out[1].width, out[1].height) == (16, 10)
    assert out[2].format == "wav" and out[2].height == 800  # nframes
    assert out[3].format == "png" and out[3].width <= 64  # stub fallback dims
    assert out[4].format == "jpeg"  # stub tier
    assert out[5].format == "empty"
    for r in out.values():
        assert len(r.feature) == FEATURE_DIM


def test_png_adam7_matches_noninterlaced():
    # Adam7 and non-interlaced encodings of the SAME pixels must decode to
    # the same features; odd dims exercise empty/narrow passes
    for w, h in ((16, 10), (17, 11), (7, 5), (3, 2), (1, 1), (9, 1)):
        px = _gradient_image(w, h)
        plain = decode_png(encode_png(px, [0, 1, 2, 3, 4]))
        inter = decode_png(encode_png_adam7(px, [0, 4, 2, 3, 1]))
        assert plain == inter, (w, h)
