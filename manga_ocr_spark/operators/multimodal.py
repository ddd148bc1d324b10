"""Multimodal payload plumbing: opaque binary columns + typed metadata.

The engine treats image/audio/video exactly as it treats html: an opaque
``binary`` column processed by Arrow-batched UDFs (the reference's payload
is pixels for the same reason — SURVEY.md §1.1).

Decode tiers (all REAL decoders are public-spec, stdlib+numpy, no codec
libraries):

- **PNG** — chunk walk, size-capped IDAT inflate, per-scanline
  un-filtering (all five filter types), numpy pixel stats. 8-bit
  gray/RGB/alpha/paletted, non-interlaced and Adam7 — including sub-byte
  paletted AND grayscale (depths 1/2/4) in BOTH forms (per-pass strides).
- **JPEG** — T.81 baseline (SOF0) AND progressive (SOF2: spectral
  selection, successive approximation, EOB runs) via operators/jpeg.py:
  Huffman entropy decode, dequant, IDCT, luma plane; validated against
  an independent encoder and the reference's real JPEG test images.
  Arithmetic coding falls to the stub tier.
- **BMP** — uncompressed DIBs: 24-bit BGR, 32-bit BGRx, 8-bit
  paletted; bottom-up and top-down.
- **TIFF** — baseline 6.0: II/MM, strips, 8-bit gray (both
  photometrics) / RGB(A) / palette-color; compression none, PackBits,
  and LZW (REUSING the PDF LZWDecode implementation — TIFF's
  early-change MSB-first variant is exactly what ISO 32000 mandates);
  horizontal-differencing predictor.
- **GIF** — 87a/89a: LSB-first variable-width LZW, global/local color
  tables, interlace, extension skip; first image of an animation.
- **ICO** — favicon directory walk, largest image wins (the browser
  rule); entries decode through decode_png or decode_bmp (classic
  doubled-height DIB form).
- **WAV** — stdlib ``wave``: 8/16-bit PCM -> per-segment RMS features.
- **AVI (MJPEG)** — RIFF walk to the ``movi`` list, first video chunk
  decoded with the repo's own T.81 JPEG decoder.
- **everything else** — deterministic byte-derived stub (clearly
  marked): arithmetic-coded JPEG and non-MJPEG video codecs (no
  public-spec-reasonable pure-Python path without a codec library).
  The Spark-side plumbing — schema, batch shape, iterator-init slot,
  bad-row tolerance — is identical for all tiers. A malformed payload
  of a real format degrades to the stub rather than killing the task
  (the reference's per-item try/except, run.py:207-212).

``media_meta`` (length + md5) is pure JVM and oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 8

# dimension sanity cap shared by the image decoders: header-declared
# w*h bounds the allocations, so a crafted header must be rejected
# before any buffer exists. 25 MP (~75 MB RGB) is far beyond crawled
# thumbnails; genuinely larger images degrade to the stub tier, which
# is the uniform oversize contract.
_MAX_PIXELS = 25_000_000

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _luma_features(luma) -> list[float]:
    """The shared feature epilogue of every image decoder: mean luminance
    of FEATURE_DIM horizontal bands, normalized to [0, 1], 6-decimal
    rounded (the oracle value-hash contract). ONE definition — banding or
    rounding changes cannot drift between formats."""
    bands = np.array_split(luma, FEATURE_DIM, axis=0)
    return [round(float(b.mean()) / 255.0, 6) if b.size else 0.0 for b in bands]


def _inflate_exact(idat: bytes, expected: int) -> bytes:
    """zlib-inflate with the repo's decompression-bomb convention
    (cf. extraction/pdf.py / sources/warc.py): the caller KNOWS the
    exact plaintext size from the header, so cap the inflate at
    expected+1 and require an exact match — a crafted 1000:1 stream
    never allocates beyond the declared image size."""
    import zlib

    d = zlib.decompressobj()
    raw = d.decompress(idat, expected + 1)
    # d.eof preserves the stream-completeness + adler32 verification the
    # uncapped zlib.decompress performed: a truncated/checksum-corrupt
    # stream that happens to yield `expected` bytes must still degrade
    # to the stub tier, not masquerade as a real decode
    if len(raw) != expected or not d.eof:
        raise ValueError("IDAT size mismatch")
    return raw


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering -> (h, stride) uint8 pixel matrix.

    Filters 0 (none) and 2 (up) vectorize; 1 (sub), 3 (average) and
    4 (Paeth) are sequential along x by definition, so they loop — fine
    for the correctness tier this stdlib decoder is (a production kernel
    would ride libvips/PIL on a real image, same Spark plumbing).
    """
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(
            np.int64
        )
        pos += 1 + stride
        if ftype == 0:
            cur = line
        elif ftype == 2:  # up
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 3:  # average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


# Adam7 interlacing: per-pass (x_start, y_start, x_step, y_step); each
# pass is an independently-filtered sub-image in the IDAT stream
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_passes(w: int, h: int) -> list[tuple[int, int, int, int, int, int]]:
    """Non-empty Adam7 passes as (xs, ys, xstep, ystep, pw, ph)."""
    passes = []
    for xs, ys, xstep, ystep in _ADAM7:
        pw = -(-(w - xs) // xstep) if w > xs else 0
        ph = -(-(h - ys) // ystep) if h > ys else 0
        if pw > 0 and ph > 0:
            passes.append((xs, ys, xstep, ystep, pw, ph))
    return passes


def _unpack_subbyte(packed: np.ndarray, ph: int, pw: int, depth: int) -> np.ndarray:
    """(ph, stride) packed rows -> (ph, pw) palette indices: MSB-first
    sub-byte unpack at depth 1/2/4 (PNG packs each ROW independently,
    padding the last byte — which is why interlaced sub-byte images
    must unpack PER PASS, each pass having its own row stride)."""
    bits = np.unpackbits(packed, axis=1)[:, : pw * depth].reshape(ph, pw, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int64)
    return (bits.astype(np.int64) * weights).sum(axis=2)


def decode_png(data: bytes) -> tuple[int, int, list[float]]:
    """REAL stdlib PNG decode -> (width, height, 8 luma-band features).

    Supports bit depths 8 AND 16 for color types 0/2/4/6 (gray, RGB,
    +alpha; 16-bit samples scale by 255/65535), bit depth 8 for paletted
    (type 3), and bit depths 1/2/4 for paletted AND grayscale — every
    combination non-interlaced AND Adam7-interlaced (sub-byte passes
    unpack with pass-local row strides; gray samples scale by
    255/(2^depth-1) per PNG 11.2.2).
    Features: mean luminance of 8 horizontal bands, alpha excluded,
    palette resolved through PLTE, normalized to [0, 1] and rounded to
    6 places. Raises on anything it does not support (caller falls back).
    """
    import struct
    import zlib

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"PLTE":
            if length % 3:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if interlace not in (0, 1) or color not in (0, 2, 3, 4, 6):
        raise ValueError("unsupported PNG variant")
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        # header-declared dims bound every allocation below — reject
        # crafted headers BEFORE allocating (a worker OOM is not
        # recoverable by the per-row except in _decode)
        raise ValueError("PNG dimensions out of bounds")
    if depth == 16:
        if color == 3:
            raise ValueError("unsupported PNG bit depth")  # paletted is never 16-bit
    elif depth != 8 and not (color in (0, 3) and depth in (1, 2, 4)):
        # sub-byte depths exist only for paletted/gray (both supported)
        raise ValueError("unsupported PNG bit depth")
    if depth < 8:
        if interlace == 1:
            # Adam7 sub-byte: every pass packs its OWN row stride
            # ((pw*depth+7)//8 — the per-pass byte padding is exactly
            # why this case needs pass-local unpacking), filters with
            # bpp=1 on the packed bytes per the spec
            passes = _adam7_passes(w, h)
            raw = _inflate_exact(
                bytes(idat),
                sum(ph * ((pw * depth + 7) // 8 + 1) for *_, pw, ph in passes),
            )
            idx = np.zeros((h, w), dtype=np.int64)
            pos2 = 0
            for xs, ys, xstep, ystep, pw, ph in passes:
                pstride = (pw * depth + 7) // 8
                sub_raw = raw[pos2 : pos2 + ph * (pstride + 1)]
                pos2 += ph * (pstride + 1)
                packed = _png_unfilter(sub_raw, ph, pstride, 1)
                idx[ys::ystep, xs::xstep] = _unpack_subbyte(packed, ph, pw, depth)
        else:
            stride = (w * depth + 7) // 8
            raw = _inflate_exact(bytes(idat), h * (stride + 1))
            packed = _png_unfilter(raw, h, stride, 1)
            idx = _unpack_subbyte(packed, h, w, depth)
        if color == 3:
            if plte is None:
                raise ValueError("paletted PNG without PLTE")
            if int(idx.max(initial=0)) >= len(plte):
                raise ValueError("palette index out of range")
            luma = plte[idx].astype(np.float64).mean(axis=2)
        else:
            # grayscale: sample scales to intensity by 255/(2^depth - 1)
            # (PNG 11.2.2 sample depth scaling)
            luma = idx.astype(np.float64) * (255.0 / ((1 << depth) - 1))
        return int(w), int(h), _luma_features(luma)
    if color == 3 and plte is None:
        raise ValueError("paletted PNG without PLTE")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    # 16-bit: two bytes per sample, big-endian. Filtering is defined on
    # BYTES with bpp = bytes per complete pixel (PNG 9.2), so the
    # unfilter path is depth-agnostic; samples re-assemble afterwards
    # with a >u2 view and intensities scale by 255/65535 (the 11.2.2
    # sample depth scaling, same rule the sub-byte tier applies).
    sb = depth // 8  # bytes per sample: 1 or 2
    bpp = channels * sb
    stride = w * bpp
    if interlace == 1:
        # Adam7: seven independently-filtered sub-images, de-interlaced
        # back onto the full-pixel grid; total plaintext size is the sum
        # of the per-pass sub-images, computable before inflating
        passes = _adam7_passes(w, h)
        raw = _inflate_exact(
            bytes(idat), sum(ph * (pw * bpp + 1) for *_, pw, ph in passes)
        )
        px = np.zeros((h, w, bpp), dtype=np.uint8)
        pos2 = 0
        for xs, ys, xstep, ystep, pw, ph in passes:
            pstride = pw * bpp
            sub_raw = raw[pos2 : pos2 + ph * (pstride + 1)]
            pos2 += ph * (pstride + 1)
            sub = _png_unfilter(sub_raw, ph, pstride, bpp).reshape(ph, pw, bpp)
            px[ys::ystep, xs::xstep] = sub
    else:
        raw = _inflate_exact(bytes(idat), h * (stride + 1))
        px = _png_unfilter(raw, h, stride, bpp).reshape(h, w, bpp)
    if sb == 2:
        px = (
            np.ascontiguousarray(px)
            .reshape(h, w * channels * 2)
            .view(">u2")
            .reshape(h, w, channels)
        )
    if color == 3:
        idx = px[:, :, 0].astype(np.int64)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        luma = plte[idx].astype(np.float64).mean(axis=2)  # (h, w)
    else:
        color_ch = {0: 1, 2: 3, 4: 1, 6: 3}[color]  # drop alpha from stats
        luma = px[:, :, :color_ch].astype(np.float64).mean(axis=2)  # (h, w)
        if sb == 2:
            luma *= 255.0 / 65535.0  # PNG 11.2.2 sample depth scaling
    feat = _luma_features(luma)
    return int(w), int(h), feat


def decode_jpeg_features(data: bytes) -> tuple[int, int, list[float]]:
    """REAL JPEG decode (operators/jpeg.py: public-spec T.81 Huffman +
    dequant + IDCT, luma plane only; baseline AND progressive) -> same 8
    luma-band feature contract as PNG/BMP. Arithmetic coding raises
    (caller falls back to the stub tier)."""
    from manga_ocr_spark.operators.jpeg import decode_jpeg_luma

    w, h, y = decode_jpeg_luma(data)
    luma = y.astype(np.float64)
    feat = _luma_features(luma)
    return w, h, feat


def decode_bmp(data: bytes) -> tuple[int, int, list[float]]:
    """REAL stdlib BMP decode: uncompressed BITMAPINFOHEADER DIBs at
    24-bit BGR, 32-bit BGRx, and 8-bit paletted, bottom-up AND top-down
    (negative height). Same feature contract as decode_png: 8 horizontal
    mean-luma bands."""
    import struct

    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP")
    offset = struct.unpack("<I", data[10:14])[0]
    header_size, w, h = struct.unpack("<Iii", data[14:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    compression, _isz, _xp, _yp, clr_used = struct.unpack("<IIiiI", data[30:50])
    topdown = h < 0
    h = abs(h)
    if header_size < 40 or bpp not in (8, 24, 32) or compression != 0:
        raise ValueError("unsupported BMP variant")
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError("BMP dimensions out of bounds")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3  # rows padded to 4 bytes
    if len(data) < offset + stride * h:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset).reshape(
        h, stride
    )[:, : w * nch]
    px = rows.reshape(h, w, nch)
    if not topdown:
        px = px[::-1]  # bottom-up -> top-down
    if bpp == 8:
        ncolors = clr_used or 256
        pal_off = 14 + header_size
        if len(data) < pal_off + ncolors * 4:
            raise ValueError("truncated BMP palette")
        pal = np.frombuffer(data, np.uint8, ncolors * 4, pal_off).reshape(ncolors, 4)
        idx = px[:, :, 0].astype(np.int64)
        if int(idx.max(initial=0)) >= ncolors:
            raise ValueError("BMP palette index out of range")
        luma = pal[idx][:, :, :3].astype(np.float64).mean(axis=2)  # BGRx: drop pad
    else:
        luma = px[:, :, :3].astype(np.float64).mean(axis=2)  # BGR(x): drop pad byte
    feat = _luma_features(luma)
    return int(w), int(h), feat


def decode_wav(data: bytes) -> tuple[int, int, list[float]]:
    """REAL stdlib WAV decode via ``wave``: (n_channels, n_frames,
    8 per-time-segment RMS features normalized to [0, 1]). 16-bit
    signed and 8-bit unsigned (centered at 128) PCM, any channel count
    (RMS over interleaved samples)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        nch, sampwidth, _rate, nframes = (
            wf.getnchannels(),
            wf.getsampwidth(),
            wf.getframerate(),
            wf.getnframes(),
        )
        if sampwidth == 2:
            samples = np.frombuffer(wf.readframes(nframes), dtype="<i2").astype(np.float64)
        elif sampwidth == 1:
            # 8-bit PCM is unsigned, zero at 128; rescale to the 16-bit
            # range so the RMS normalization below is width-independent
            raw8 = np.frombuffer(wf.readframes(nframes), dtype=np.uint8).astype(np.float64)
            samples = (raw8 - 128.0) * 256.0
        else:
            raise ValueError("only 8/16-bit PCM supported")
    if samples.size == 0:
        return nch, 0, [0.0] * FEATURE_DIM
    segs = np.array_split(samples, FEATURE_DIM)
    feat = [
        round(float(np.sqrt(np.mean(s * s))) / 32768.0, 6) if s.size else 0.0
        for s in segs
    ]
    return nch, nframes, feat


def _gif_lzw_decode(data: bytes, min_code_size: int, limit: int | None = None) -> list[int]:
    """GIF LZW -> pixel index list. DIFFERENT from the PDF/TIFF LZW in
    extraction/pdf.py on three axes (which is why it is not reused):
    LSB-first bit packing (PDF is MSB-first), late width change (PDF uses
    the TIFF early-change variant), and explicit clear/EOI codes at
    2^min_code_size (PDF's sit at 256/257).

    ``limit`` caps the OUTPUT length (LZW is expansive — a KB-size
    crafted stream can otherwise blow up to GBs; the caller knows w*h,
    the only amount it can use). Deliberate contract consequence: once
    ``limit`` pixels are decoded the REST of the stream is not read, so
    garbage after a complete image is accepted — the same behavior as
    real-world decoders (giflib stops at the last pixel); corruption
    BEFORE the image completes still raises (test-pinned both ways)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    dict_next = eoi + 1
    table: dict[int, list[int]] = {i: [i] for i in range(clear)}
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                width = min_code_size + 1
                dict_next = eoi + 1
                table = {i: [i] for i in range(clear)}
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code not in table:
                    raise ValueError("corrupt GIF LZW code")
                entry = table[code]  # first code after clear must be literal
            elif code in table:
                entry = table[code]
                table[dict_next] = prev + [entry[0]]
                dict_next += 1
            elif code == dict_next:  # the KwKwK case
                entry = prev + [prev[0]]
                table[dict_next] = entry
                dict_next += 1
            else:
                raise ValueError("corrupt GIF LZW code")
            out.extend(entry)
            if limit is not None and len(out) >= limit:
                return out[:limit]
            prev = entry
            # deferred-width sync: the decoder's dictionary lags the
            # encoder's by one entry (the entry created by code #k is
            # learned while processing code #k+1), so the width bump
            # fires at 2^width - 1 — the de-facto giflib convention real
            # crawled GIFs follow
            if dict_next == (1 << width) - 1 and width < 12:
                width += 1
    return out


def _gif_lzw_encode(indices: list[int], mcs: int) -> bytes:
    """All-LITERAL GIF LZW stream (fixture-synthesis side of
    :func:`gif_payload_from_id`): every pixel is emitted as its own
    root code — no dictionary, no compression, just the width/clear
    bookkeeping a conforming decoder expects (the decoder still builds
    its table per spec, so the emitted width must track its
    deferred-width schedule, and a clear resets before the 12-bit cap).
    Deliberately a DIFFERENT algorithm from both the engine decoder and
    the dictionary-building encoder in tests/test_multimodal.py, so the
    three implementations cross-validate instead of sharing bugs."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bits: list[tuple[int, int]] = []

    width = mcs + 1
    dict_next = eoi + 1
    since_clear = 0
    bits.append((clear, width))
    for px in indices:
        if since_clear >= 64:  # stay far from the 12-bit cap
            bits.append((clear, width))
            width = mcs + 1
            dict_next = eoi + 1
            since_clear = 0
        bits.append((px, width))
        if since_clear > 0:  # decoder inserts on every code after the first
            dict_next += 1
            if dict_next == (1 << width) - 1 and width < 12:
                width += 1
        since_clear += 1
    bits.append((eoi, width))
    acc = n = 0
    out = bytearray()
    for code, w in bits:
        acc |= code << n
        n += w
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, list[float]]:
    """REAL GIF87a/89a decode (first image only — an animation's first
    frame): logical screen + color tables, extension-block skip, LSB-first
    variable-width LZW, interlace de-scrambling, palette -> RGB luma.
    Same 8-band feature contract as PNG/BMP/JPEG. Raises on anything
    unsupported (caller degrades to the stub tier)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError("unexpected GIF block")
        w = int.from_bytes(data[pos + 5 : pos + 7], "little")
        h = int.from_bytes(data[pos + 7 : pos + 9], "little")
        if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
            raise ValueError("GIF dimensions out of bounds")
        iflags = data[pos + 9]
        pos += 10
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF image without a color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decode(bytes(lzw), min_code, limit=w * h)
        if len(idx) < w * h:
            raise ValueError("truncated GIF image data")
        grid = np.asarray(idx[: w * h], dtype=np.int64).reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            order = [y for y in range(0, h, 8)]
            order += [y for y in range(4, h, 8)]
            order += [y for y in range(2, h, 4)]
            order += [y for y in range(1, h, 2)]
            deinter = np.empty_like(grid)
            deinter[order] = grid
            grid = deinter
        if int(grid.max(initial=0)) >= len(pal):
            raise ValueError("GIF index out of palette range")
        luma = pal[grid].astype(np.float64).mean(axis=2)
        bands = np.array_split(luma, FEATURE_DIM, axis=0)
        feat = [round(float(b.mean()) / 255.0, 6) if b.size else 0.0 for b in bands]
        return int(w), int(h), feat
    raise ValueError("GIF contains no image block")


def _riff_chunks(data: bytes, pos: int, end: int):
    """Walk RIFF chunks: yields (fourcc, start, size); LIST chunks yield
    their list-type as fourcc 'LIST:xxxx' and are entered recursively by
    the caller via the returned extents."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        yield fourcc, pos + 8, min(size, end - pos - 8)
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def decode_avi_mjpeg(data: bytes) -> tuple[int, int, list[float]]:
    """REAL RIFF/AVI walk + MJPEG first-frame decode: finds the `movi`
    LIST, takes the first `##dc`/`##db` video chunk and runs it through
    the repo's own T.81 JPEG decoder (operators/jpeg.py). Frames must
    carry their Huffman/quant tables (frames relying on the out-of-band
    MJPEG default tables raise -> stub tier; documented). Same 8-band
    luma feature contract; dims come from the decoded frame."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    from manga_ocr_spark.operators.jpeg import decode_jpeg_luma

    def first_frame(pos: int, end: int) -> bytes | None:
        """First ##dc/##db chunk in [pos, end), descending into LISTs —
        covers frames directly in `movi` AND inside `rec ` grouping
        LISTs (interleaved AVIs wrap each frame bundle in one)."""
        for fourcc, start, size in _riff_chunks(data, pos, end):
            if fourcc[2:4] in (b"dc", b"db") and size > 2:
                return data[start : start + size]
            if fourcc == b"LIST":
                inner = first_frame(start + 4, start + size)
                if inner is not None:
                    return inner
        return None

    def find_movi(pos: int, end: int) -> bytes | None:
        for fourcc, start, size in _riff_chunks(data, pos, end):
            if fourcc == b"LIST":
                ltype = data[start : start + 4]
                if ltype == b"movi":
                    return first_frame(start + 4, start + size)
                inner = find_movi(start + 4, start + size)
                if inner is not None:
                    return inner
        return None

    frame = find_movi(12, 8 + int.from_bytes(data[4:8], "little"))
    if frame is None:
        raise ValueError("no MJPEG frame chunk in AVI")
    w, h, y = decode_jpeg_luma(frame)
    luma = y.astype(np.float64)
    feat = _luma_features(luma)
    return w, h, feat


def decode_ico(data: bytes) -> tuple[int, int, list[float]]:
    """REAL ICO (favicon) decode: directory walk, entries tried LARGEST
    FIRST with fallback to the next entry on decode failure (the full
    browser rule — real favicons routinely bundle a legacy 4-bit entry
    alongside decodable ones, and the file must not stub out because the
    biggest entry is the legacy one). Each frame decodes by REUSING
    decode_png (PNG-compressed entries, the modern form) or decode_bmp
    (classic DIB entries — the ICO payload is a headerless DIB with
    DOUBLED biHeight covering the XOR pixels + AND mask; a synthetic BM
    header and a halved height turn it into exactly what decode_bmp
    already parses, and the trailing AND mask lies beyond the pixel rows
    it reads)."""
    import struct

    if len(data) < 6 or data[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO")
    (count,) = struct.unpack("<H", data[4:6])
    if count == 0 or 6 + 16 * count > len(data):
        raise ValueError("empty/truncated ICO directory")
    entries = []
    for i in range(count):
        off = 6 + 16 * i
        bw, bh = data[off], data[off + 1]
        bw, bh = bw or 256, bh or 256  # 0 means 256 per the format
        size, img_off = struct.unpack("<II", data[off + 8 : off + 16])
        if img_off + size > len(data) or size < 16:
            continue
        entries.append((bw * bh, img_off, size))
    entries.sort(reverse=True)
    for _, img_off, size in entries:
        try:
            return _decode_ico_frame(data[img_off : img_off + size])
        except Exception:
            # try the next-largest entry, like a browser. Broad on purpose:
            # a malformed entry surfaces struct.error / IndexError (short
            # slices, truncated chunk headers) as readily as ValueError,
            # and any of them just means "this entry is undecodable" —
            # the fallback must advance, not abort the whole icon.
            continue
    raise ValueError("no decodable ICO entry")


def _decode_ico_frame(frame: bytes) -> tuple[int, int, list[float]]:
    import struct

    if frame[:8] == _PNG_MAGIC:
        return decode_png(frame)
    # classic DIB entry: BITMAPINFOHEADER with doubled height
    if len(frame) < 40:
        raise ValueError("truncated ICO DIB")
    header_size, w, h2 = struct.unpack("<Iii", frame[:12])
    if not 40 <= header_size <= 4096 or h2 % 2:
        raise ValueError("unsupported ICO DIB")
    bpp = struct.unpack("<H", frame[14:16])[0]
    ncolors = struct.unpack("<I", frame[32:36])[0]
    if bpp == 8 and ncolors == 0:
        ncolors = 256
    if ncolors > 256:
        # a crafted biClrUsed would push the synthetic offset past the
        # 'BM' header's 32-bit field (struct.error, not the module's
        # ValueError degrade contract) — reject first
        raise ValueError("ICO palette too large")
    # biClrUsed is the color-table size whenever nonzero — a 24/32-bit DIB
    # with biClrUsed>0 legally carries an (optimization-hint) palette, and
    # skipping it here would leave bfOffBits pointing INTO the palette so
    # decode_bmp reads shifted pixel rows (silently wrong luma features)
    pal_bytes = ncolors * 4
    pixel_off = 14 + header_size + pal_bytes
    patched = bytearray(frame)
    patched[8:12] = struct.pack("<i", h2 // 2)  # un-double the height
    bm = (
        b"BM"
        + struct.pack("<IHHI", 14 + len(patched), 0, 0, pixel_off)
        + bytes(patched)
    )
    return decode_bmp(bm)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """TIFF PackBits RLE (TIFF 6.0 §9), output capped at ``expected``."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                break
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    return bytes(out[:expected])


def decode_tiff(data: bytes) -> tuple[int, int, list[float]]:
    """REAL baseline TIFF 6.0 decode: II/MM byte order, first IFD, strip
    organization; 8-bit grayscale (WhiteIsZero/BlackIsZero), 8-bit RGB(A)
    and 8-bit palette-color; compression none (1), LZW (5 — REUSES the
    early-change MSB-first LZW already built for PDF LZWDecode in
    extraction/pdf.py, the exact same variant) and PackBits (32773);
    horizontal-differencing predictor 2. Same 8-band luma feature
    contract; raises on unsupported variants (caller degrades)."""
    import struct

    from manga_ocr_spark.extraction.pdf import _lzw_decode

    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack(e + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("truncated TIFF")
    (n_tags,) = struct.unpack(e + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    _SZ = {1: 1, 3: 2, 4: 4}
    for i in range(n_tags):
        off = ifd_off + 2 + i * 12
        if off + 12 > len(data):
            raise ValueError("truncated IFD")
        tag, typ, count = struct.unpack(e + "HHI", data[off : off + 8])
        if typ not in _SZ:
            continue
        total = _SZ[typ] * count
        voff = off + 8 if total <= 4 else struct.unpack(e + "I", data[off + 8 : off + 12])[0]
        if voff + total > len(data):
            continue
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack(e + fmt * count, data[voff : voff + total]))

    def one(tag: int, default: int | None = None) -> int:
        v = tags.get(tag)
        if not v:
            if default is None:
                raise ValueError(f"TIFF missing tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError("TIFF dimensions out of bounds")
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8])
    predictor = one(317, 1)
    if any(b != 8 for b in bits) or compression not in (1, 5, 32773):
        raise ValueError("unsupported TIFF variant")
    if photometric not in (0, 1, 2, 3) or predictor not in (1, 2):
        raise ValueError("unsupported TIFF variant")
    if photometric == 2 and spp < 3:
        raise ValueError("RGB TIFF with <3 samples")
    rows_per_strip = one(278, h)
    if rows_per_strip <= 0:
        raise ValueError("bad RowsPerStrip")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip layout")
    stride = w * spp
    rows = []
    remaining = h
    for soff, scnt in zip(offsets, counts):
        if remaining <= 0:
            break  # surplus strip entries: never decode work we can't use
        if soff + scnt > len(data):
            raise ValueError("strip out of bounds")
        nrows = min(rows_per_strip, remaining)
        remaining -= nrows
        expected = nrows * stride
        raw = data[soff : soff + scnt]
        if compression == 5:
            # limit= caps the LZW expansion at the strip's exact size —
            # a crafted high-ratio stream stops immediately instead of
            # decoding to the blanket 256 MB cap per strip entry
            raw = _lzw_decode(raw, limit=expected)
        elif compression == 32773:
            raw = _packbits_decode(raw, expected)
        if len(raw) < expected:
            raise ValueError("short TIFF strip")
        strip = np.frombuffer(raw, np.uint8, expected).reshape(nrows, w, spp)
        if predictor == 2:
            strip = np.cumsum(strip.astype(np.int64), axis=1).astype(np.uint8)
        rows.append(strip)
    if remaining > 0:
        # every other decoder raises on truncation; features from a
        # partial image while reporting full height would be silently
        # wrong
        raise ValueError("TIFF strips do not cover image height")
    px = np.concatenate(rows, axis=0)
    if photometric == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) % 3:
            raise ValueError("palette TIFF without ColorMap")
        ncol = len(cmap) // 3
        # ColorMap is 16-bit per channel, all reds then greens then blues
        pal = (np.array(cmap, dtype=np.float64).reshape(3, ncol).T) / 257.0
        idx = px[:, :, 0].astype(np.int64)
        if int(idx.max(initial=0)) >= ncol:
            raise ValueError("TIFF palette index out of range")
        luma = pal[idx].mean(axis=2)
    elif photometric == 2:
        luma = px[:, :, :3].astype(np.float64).mean(axis=2)  # drop alpha
    else:
        luma = px[:, :, 0].astype(np.float64)
        if photometric == 0:  # WhiteIsZero
            luma = 255.0 - luma
    feat = _luma_features(luma)
    return int(w), int(h), feat


def _sniff_format(payload: bytes) -> str:
    if payload[:4] == b"\x89PNG":
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if payload[:4] == b"\x00\x00\x01\x00" and len(payload) >= 6:
        return "ico"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    return "bin"


def _stub_decode(payload: bytes) -> tuple[str, int, int, list[float]]:
    """STUB tier: deterministic byte-derived pseudo-features for formats
    with no real decoder (video/exotic) and for malformed payloads of
    real formats — ONE degradation contract for every format: the
    sniffed format name, clearly-fake byte-derived dims, byte-histogram
    features. Stable across runs."""
    if not payload:
        return ("empty", 0, 0, [0.0] * FEATURE_DIM)
    fmt = _sniff_format(payload)
    w = 1 + payload[0] % 64
    h = 1 + payload[-1] % 64
    n = len(payload)
    step = max(1, n // FEATURE_DIM)
    feat = [
        round(sum(payload[i : i + step]) / max(1, len(payload[i : i + step])) / 255.0, 6)
        for i in range(0, step * FEATURE_DIM, step)
    ]
    feat = (feat + [0.0] * FEATURE_DIM)[:FEATURE_DIM]
    return (fmt, w, h, feat)


_REAL_DECODERS = {
    "png": lambda p: decode_png(p),
    "jpeg": lambda p: decode_jpeg_features(p),
    "bmp": lambda p: decode_bmp(p),
    "gif": lambda p: decode_gif(p),
    "tiff": lambda p: decode_tiff(p),
    "ico": lambda p: decode_ico(p),
    "wav": lambda p: decode_wav(p),  # returns (n_channels, n_frames, feat)
    "avi": lambda p: decode_avi_mjpeg(p),
}


def _decode(payload: bytes) -> tuple[str, int, int, list[float]]:
    """Dispatch by magic bytes: real decoder first; ANY failure (corrupt
    payload, arithmetic-coded JPEG, unsupported variant) degrades uniformly to
    the stub tier — same format label, fake dims — instead of failing
    the row."""
    fmt = _sniff_format(payload) if payload else "empty"
    real = _REAL_DECODERS.get(fmt)
    if real is not None:
        try:
            a, b, feat = real(payload)
            return (fmt, a, b, feat)
        except Exception:
            return _stub_decode(payload)
    return _stub_decode(payload)


def media_features(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """binary payloads -> per-item features via mapInPandas (iterator form,
    one-time init slot for heavier codecs), Arrow-batched."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one-time init would load a codec/model here (X1 pattern)
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                fmt, w, h, feat = _decode(bytes(payload) if payload is not None else b"")
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(payload) if payload is not None else 0,
                        "format": fmt,
                        "width": w,
                        "height": h,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(_map, MEDIA_FEATURE_SCHEMA)


def wav_payload_from_id(col):
    """Synthesize a genuine 16-bit PCM WAV per integer id (stdlib wave):
    (100 + id%50) frames of constant amplitude 1024*(1 + id%16), mono,
    8 kHz. Every derived quantity is exact — n_bytes = 44 + 2*frames,
    RMS = (1 + id%16)/32, a dyadic rational exact in float32 — so a SQL
    oracle can recompute the full decode result from the id alone."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def _wav(ids: pd.Series) -> pd.Series:
        import io
        import wave

        out = []
        for i in ids:
            n = 100 + int(i) % 50
            amp = 1024 * (1 + int(i) % 16)
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wf:
                wf.setnchannels(1)
                wf.setsampwidth(2)
                wf.setframerate(8000)
                wf.writeframes(np.full(n, amp, dtype="<i2").tobytes())
            out.append(buf.getvalue())
        return pd.Series(out)

    return _wav(col)


def gif_payload_from_id(col):
    """Synthesize a genuine GIF87a per integer id: a solid-gray image of
    width 4 + id%5, height 4 + id%3, gray level g = (id*7) % 256, padded
    with trailing zero bytes (legal after the GIF trailer) to EXACTLY 256
    bytes. Every decode result is analytic: n_bytes = 256, every nonempty
    luma band = g, so feature[0] = round(g/255, 6) — a SQL oracle
    recomputes the full result from the id alone (same pattern as
    :func:`wav_payload_from_id`). The LZW stream is the all-literal form
    from :func:`_gif_lzw_encode` — an algorithm deliberately different
    from both the engine decoder and the dictionary-building test-side
    encoder, so no two implementations can share a bug."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def _gif(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w, h, g = 4 + i % 5, 4 + i % 3, (i * 7) % 256
            buf = bytearray(b"GIF87a")
            buf += w.to_bytes(2, "little") + h.to_bytes(2, "little")
            buf += bytes([0x80, 0, 0])  # 2-entry GCT
            buf += bytes([g, g, g, 0, 0, 0])
            buf += b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
            buf += b"\x02"  # min code size 2: clear=4, eoi=5, width starts 3
            lzw = _gif_lzw_encode([0] * (w * h), 2)
            for off in range(0, len(lzw), 255):
                blk = lzw[off : off + 255]
                buf += bytes([len(blk)]) + blk
            buf += b"\x00\x3b"
            assert len(buf) <= 256
            buf += b"\x00" * (256 - len(buf))
            out.append(bytes(buf))
        return pd.Series(out)

    return _gif(col)


def media_meta(df: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """Typed metadata over the opaque binary column — pure JVM expressions
    (no UDF): byte length + md5 content hash."""
    return df.select(
        F.col(id_col),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("content_md5"),
    )
