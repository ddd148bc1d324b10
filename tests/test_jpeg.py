"""Baseline JPEG luma decoder (operators/jpeg.py) validated two ways:
an INDEPENDENT minimal encoder written here (forward DCT + quantize +
canonical Huffman with the public Annex-K tables) round-trips within
quantization tolerance, and the reference repo's real JPEG test images
decode with correct dimensions and sane luma statistics."""

from __future__ import annotations

import glob
import os
import struct

import numpy as np
import pytest

from manga_ocr_spark.operators.jpeg import _ZIGZAG, decode_jpeg_luma

# public Annex-K Huffman table specs (BITS, HUFFVAL)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _huff_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code, ln):
        self.acc = (self.acc << ln) | code
        self.nbits += ln
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_block(w: _BitWriter, coeffs, dc_pred, dc_codes, ac_codes) -> int:
    zz = coeffs.reshape(-1)[_ZIGZAG]
    diff = int(zz[0]) - dc_pred
    t = _category(diff)
    w.put(*dc_codes[t])
    if t:
        w.put(_mag_bits(diff, t), t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            w.put(*ac_codes[0xF0])  # ZRL
            run -= 16
        s = _category(v)
        w.put(*ac_codes[(run << 4) | s])
        w.put(_mag_bits(v, s), s)
        run = 0
    if run:
        w.put(*ac_codes[0x00])  # EOB
    return int(zz[0])


def _fdct_quant(px_block: np.ndarray, q: np.ndarray) -> np.ndarray:
    coeff = _C @ (px_block.astype(np.float64) - 128.0) @ _C.T
    qm = np.zeros((8, 8), dtype=np.int64).reshape(-1)
    qm[_ZIGZAG] = q  # q is in zigzag order
    return np.rint(coeff / qm.reshape(8, 8)).astype(np.int64)


def _segments(q, w, h, comps, restart=0):
    """Common header segments. comps: [(cid, hv, tq)]."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(int(x) for x in q)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hv, tq in comps:
        sof += bytes([cid, hv, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        payload = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sos = bytes([len(comps)])
    for cid, _hv, _tq in comps:
        sos += bytes([cid, 0x00])  # dc table 0, ac table 0
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    return out


def encode_gray_jpeg(px: np.ndarray, q: np.ndarray, restart: int = 0) -> bytes:
    h, w = px.shape
    out = _segments(q, w, h, [(1, 0x11, 0)], restart)
    dc_codes, ac_codes = _huff_codes(DC_BITS, DC_VALS), _huff_codes(AC_BITS, AC_VALS)
    bw, bh = -(-w // 8), -(-h // 8)
    padded = np.pad(px, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    writer = _BitWriter()
    dc_pred = 0
    mcu = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart and mcu and mcu % restart == 0:
                writer.flush()
                out_block = bytes(writer.out)
                out += out_block + bytes([0xFF, 0xD0 + (rst % 8)])
                writer = _BitWriter()
                dc_pred = 0
                rst += 1
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            dc_pred = _encode_block(writer, _fdct_quant(blk, q), dc_pred, dc_codes, ac_codes)
            mcu += 1
    writer.flush()
    return bytes(out + writer.out + b"\xff\xd9")


def encode_ycc420_jpeg(ypx: np.ndarray, q: np.ndarray) -> bytes:
    """Interleaved 3-component 4:2:0 with neutral (all-zero) chroma."""
    h, w = ypx.shape
    out = _segments(q, w, h, [(1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)])
    dc_codes, ac_codes = _huff_codes(DC_BITS, DC_VALS), _huff_codes(AC_BITS, AC_VALS)
    mx, my = -(-w // 16), -(-h // 16)
    padded = np.pad(ypx, ((0, my * 16 - h), (0, mx * 16 - w)), mode="edge")
    writer = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    zero = np.zeros((8, 8), dtype=np.int64)
    for yy in range(my):
        for xx in range(mx):
            for v in range(2):
                for hh in range(2):
                    blk = padded[
                        (yy * 2 + v) * 8 : (yy * 2 + v) * 8 + 8,
                        (xx * 2 + hh) * 8 : (xx * 2 + hh) * 8 + 8,
                    ]
                    preds[1] = _encode_block(
                        writer, _fdct_quant(blk, q), preds[1], dc_codes, ac_codes
                    )
            for cid in (2, 3):
                preds[cid] = _encode_block(writer, zero, preds[cid], dc_codes, ac_codes)
    writer.flush()
    return bytes(out + writer.out + b"\xff\xd9")


def _test_image(w=37, h=29):  # non-multiple-of-8/16 exercises edge blocks
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 5 + y * 3 + (x * y) % 31) % 256).astype(np.uint8)


Q_ONE = np.ones(64, dtype=np.int64)


def test_gray_roundtrip_q1_near_lossless():
    px = _test_image()
    w, h, y = decode_jpeg_luma(encode_gray_jpeg(px, Q_ONE))
    assert (w, h) == (37, 29)
    assert int(np.abs(y.astype(int) - px.astype(int)).max()) <= 2


def test_gray_roundtrip_with_restart_markers():
    px = _test_image(64, 24)
    data = encode_gray_jpeg(px, Q_ONE, restart=3)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data
    w, h, y = decode_jpeg_luma(data)
    assert (w, h) == (64, 24)
    assert int(np.abs(y.astype(int) - px.astype(int)).max()) <= 2


def test_ycc420_interleaved_roundtrip():
    px = _test_image(50, 34)
    w, h, y = decode_jpeg_luma(encode_ycc420_jpeg(px, Q_ONE))
    assert (w, h) == (50, 34)
    assert int(np.abs(y.astype(int) - px.astype(int)).max()) <= 2


def test_lossy_quant_table_stays_within_tolerance():
    # smooth gradient + a mid-strength flat table: error bounded by
    # IDCT of half-step quantization noise
    y, x = np.mgrid[0:40, 0:48]
    px = ((x * 4 + y * 2) % 256).astype(np.uint8)
    q = np.full(64, 8, dtype=np.int64)
    w, h, out = decode_jpeg_luma(encode_gray_jpeg(px, q))
    assert (w, h) == (48, 40)
    assert float(np.abs(out.astype(int) - px.astype(int)).mean()) < 4.0


REF_IMAGES = sorted(glob.glob("/root/reference/tests/data/images/*.jpg"))


@pytest.mark.skipif(not REF_IMAGES, reason="reference test images absent")
def test_real_world_jpegs_decode():
    # the reference repo's real manga-panel JPEGs (PUBLIC test data, used
    # here as input bytes only): correct dims read from SOF0 and sane luma
    decoded = 0
    for f in REF_IMAGES[:8]:
        data = open(f, "rb").read()
        w, h, y = decode_jpeg_luma(data)
        assert y.shape == (h, w) and w > 0 and h > 0
        assert 0 < float(y.mean()) < 255 and float(y.std()) > 1
        decoded += 1
    assert decoded >= 4


def test_fill_bytes_before_markers_accepted():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    px = _test_image()
    data = encode_gray_jpeg(px, Q_ONE)
    # inject fill bytes before the DQT and SOF0 markers
    data = data.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1).replace(
        b"\xff\xc0", b"\xff\xff\xff\xff\xc0", 1
    )
    w, h, y = decode_jpeg_luma(data)
    assert (w, h) == (37, 29)
    assert int(np.abs(y.astype(int) - px.astype(int)).max()) <= 2


def test_extended_sequential_rejected():
    # an SOF1 (extended sequential) header must raise (falls to the stub
    # tier in media_features); progressive SOF2 is now SUPPORTED and has
    # its own suite in test_jpeg_progressive.py
    data = bytearray(encode_gray_jpeg(_test_image(), Q_ONE))
    idx = data.find(b"\xff\xc0")
    data[idx + 1] = 0xC1
    with pytest.raises(ValueError, match="unsupported SOF"):
        decode_jpeg_luma(bytes(data))


def test_baseline_scan_ending_early_raises_not_garbage():
    # ADVICE r3: a baseline entropy segment that runs into a marker while
    # MCUs remain must RAISE (degrading the row to the stub tier), not
    # silently decode zero-bit padding into plausible-looking luma. Keep a
    # few real entropy bytes then splice in an EOI far before the last MCU.
    data = encode_gray_jpeg(_test_image(), Q_ONE)
    sos = data.find(b"\xff\xda")
    ent_start = sos + 2 + int.from_bytes(data[sos + 2 : sos + 4], "big")
    truncated = data[: ent_start + 6] + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg_luma(truncated)
    # a mid-scan COM marker (not just EOI) is equally corrupt
    spliced = data[: ent_start + 6] + b"\xff\xfe\x00\x04ab" + data[ent_start + 6 :]
    with pytest.raises(ValueError):
        decode_jpeg_luma(spliced)
