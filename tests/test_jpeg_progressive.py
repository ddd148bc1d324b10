"""Progressive JPEG (SOF2) decoder validated against an INDEPENDENT
progressive encoder written here: spectral selection, successive
approximation (DC + AC refinement), EOB-run coding, restart markers,
interleaved DC scans with chroma, and chroma AC scans (which the decoder
skips wholesale). The strongest check is the identity test: baseline and
progressive encodings of the SAME quantized coefficients must decode to
IDENTICAL pixel arrays — the baseline path is already validated against
real-world JPEGs, so agreement transfers that validation to progressive.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from manga_ocr_spark.operators.jpeg import _ZIGZAG, decode_jpeg_luma
from test_jpeg import (
    Q_ONE,
    _BitWriter,
    _category,
    _fdct_quant,
    _huff_codes,
    _mag_bits,
    _test_image,
    encode_gray_jpeg,
    encode_ycc420_jpeg,
)

# custom Huffman tables covering EVERY (run, size) symbol — the Annex-K
# AC table lacks the EOBn symbols (0x10, 0x20, ...) progressive needs.
# DC: 12 symbols at 4 bits. AC: 255 symbols at 9 bits + 1 at 10 (a DHT
# length-count byte caps at 255, so 256 x 9 bits cannot be declared).
P_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
P_DC_VALS = list(range(12))
P_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
P_AC_VALS = list(range(256))

_DC_CODES = _huff_codes(P_DC_BITS, P_DC_VALS)
_AC_CODES = _huff_codes(P_AC_BITS, P_AC_VALS)


class _ScanWriter:
    """Bit writer with byte-aligned restart-marker segmentation."""

    def __init__(self) -> None:
        self.parts: list[bytes] = []
        self.w = _BitWriter()
        self.rst = 0

    def restart(self) -> None:
        self.w.flush()
        self.parts.append(bytes(self.w.out))
        self.parts.append(bytes([0xFF, 0xD0 + self.rst % 8]))
        self.rst += 1
        self.w = _BitWriter()

    def done(self) -> bytes:
        self.w.flush()
        self.parts.append(bytes(self.w.out))
        return b"".join(self.parts)


def _zz_blocks(px: np.ndarray, q: np.ndarray) -> tuple[list[np.ndarray], int, int]:
    """Quantized coefficient blocks in zigzag order, unpadded raster grid."""
    h, w = px.shape
    bw, bh = -(-w // 8), -(-h // 8)
    padded = np.pad(px, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = []
    for by in range(bh):
        for bx in range(bw):
            blk = _fdct_quant(padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], q)
            blocks.append(blk.reshape(-1)[_ZIGZAG])
    return blocks, bw, bh


def _emit_dc_first(blocks, al: int, restart: int = 0) -> bytes:
    sw = _ScanWriter()
    pred = 0
    for i, blk in enumerate(blocks):
        if restart and i and i % restart == 0:
            sw.restart()
            pred = 0
        v = int(blk[0]) >> al  # arithmetic shift = two's-complement SA
        diff = v - pred
        pred = v
        t = _category(diff)
        sw.w.put(*_DC_CODES[t])
        if t:
            sw.w.put(_mag_bits(diff, t), t)
    return sw.done()


def _emit_dc_refine(blocks, al: int, restart: int = 0) -> bytes:
    sw = _ScanWriter()
    for i, blk in enumerate(blocks):
        if restart and i and i % restart == 0:
            sw.restart()
        sw.w.put((int(blk[0]) >> al) & 1, 1)
    return sw.done()


def _emit_ac_first(blocks, ss: int, se: int, al: int, restart: int = 0) -> bytes:
    sw = _ScanWriter()
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            sw.w.put(*_AC_CODES[nbits << 4])
            if nbits:
                sw.w.put(eobrun - (1 << nbits), nbits)
            eobrun = 0

    for i, blk in enumerate(blocks):
        if restart and i and i % restart == 0:
            flush_eob()
            sw.restart()
        r = 0
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                sw.w.put(*_AC_CODES[0xF0])
                r -= 16
            s = t.bit_length()
            sv = t if v > 0 else -t
            sw.w.put(*_AC_CODES[(r << 4) | s])
            sw.w.put(_mag_bits(sv, s), s)
            r = 0
        if r:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return sw.done()


def _emit_ac_refine(blocks, ss: int, se: int, al: int, restart: int = 0) -> bytes:
    # mirrors T.81 G.1.2.3 (the libjpeg encode_mcu_AC_refine shape):
    # correction bits for already-nonzero coefficients are buffered and
    # emitted after the next symbol; EOB runs accumulate across blocks
    sw = _ScanWriter()
    eobrun = 0
    bebuf: list[int] = []

    def flush_eob() -> None:
        nonlocal eobrun, bebuf
        if eobrun:
            nbits = eobrun.bit_length() - 1
            sw.w.put(*_AC_CODES[nbits << 4])
            if nbits:
                sw.w.put(eobrun - (1 << nbits), nbits)
            eobrun = 0
        for b in bebuf:
            sw.w.put(b, 1)
        bebuf = []

    for i, blk in enumerate(blocks):
        if restart and i and i % restart == 0:
            flush_eob()
            sw.restart()
        absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        eob_idx = -1  # index (within band) of last NEWLY-nonzero coefficient
        for j, t in enumerate(absv):
            if t == 1:  # t==1 <=> newly nonzero (history implies t >= 2)
                eob_idx = j
        r = 0
        pend: list[int] = []
        for j, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and j <= eob_idx:
                flush_eob()
                sw.w.put(*_AC_CODES[0xF0])
                r -= 16
                for b in pend:
                    sw.w.put(b, 1)
                pend = []
            if t > 1:  # history coefficient: one correction bit
                pend.append(t & 1)
                continue
            flush_eob()
            sw.w.put(*_AC_CODES[(r << 4) | 1])
            sw.w.put(1 if int(blk[ss + j]) > 0 else 0, 1)
            for b in pend:
                sw.w.put(b, 1)
            pend = []
            r = 0
        if r > 0 or pend:
            eobrun += 1
            bebuf.extend(pend)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return sw.done()


def _prog_headers(q, w, h, comps, restart=0) -> bytearray:
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(int(x) for x in q)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hv, tq in comps:
        sof += bytes([cid, hv, tq])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    for tc, bits, vals in ((0, P_DC_BITS, P_DC_VALS), (1, P_AC_BITS, P_AC_VALS)):
        payload = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    return out


def _sos(comp_specs, ss, se, ah, al) -> bytes:
    body = bytes([len(comp_specs)])
    for cid in comp_specs:
        body += bytes([cid, 0x00])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


# default script: DC SA (Al=1 then refinement), AC spectral bands with a
# two-step successive approximation (Al=1 -> 0) — exercises every decode
# path: EOBn, ZRL-in-refinement, correction bits, band splits
FULL_SA_SCRIPT = [
    (0, 0, 0, 1),
    (1, 5, 0, 1),
    (6, 63, 0, 1),
    (0, 0, 1, 0),
    (1, 5, 1, 0),
    (6, 63, 1, 0),
]
SPECTRAL_ONLY_SCRIPT = [(0, 0, 0, 0), (1, 20, 0, 0), (21, 63, 0, 0)]


def encode_gray_progressive(
    px: np.ndarray, q: np.ndarray, script=FULL_SA_SCRIPT, restart: int = 0
) -> bytes:
    h, w = px.shape
    blocks, _bw, _bh = _zz_blocks(px, q)
    out = _prog_headers(q, w, h, [(1, 0x11, 0)], restart)
    for ss, se, ah, al in script:
        out += _sos([1], ss, se, ah, al)
        if ss == 0:
            body = (
                _emit_dc_first(blocks, al, restart)
                if ah == 0
                else _emit_dc_refine(blocks, al, restart)
            )
        else:
            body = (
                _emit_ac_first(blocks, ss, se, al, restart)
                if ah == 0
                else _emit_ac_refine(blocks, ss, se, al, restart)
            )
        out += body
    return bytes(out + b"\xff\xd9")


def encode_ycc420_progressive(ypx: np.ndarray, q: np.ndarray) -> bytes:
    """4:2:0 progressive with neutral chroma: interleaved 3-component DC
    scan, luma AC scans, then chroma AC scans (all-zero bands — pure
    EOB runs) that the decoder must SKIP without entropy-decoding."""
    h, w = ypx.shape
    mx, my = -(-w // 16), -(-h // 16)
    padded = np.pad(ypx, ((0, my * 16 - h), (0, mx * 16 - w)), mode="edge")
    # luma blocks on the PADDED mcu grid for the interleaved DC scan
    luma_pad: list[np.ndarray] = []
    for by in range(my * 2):
        row = []
        for bx in range(mx * 2):
            blk = _fdct_quant(padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], q)
            row.append(blk.reshape(-1)[_ZIGZAG])
        luma_pad.append(row)
    out = _prog_headers(q, w, h, [(1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)])
    # interleaved DC-first scan (Al=0), chroma DC = 0 everywhere
    out += _sos([1, 2, 3], 0, 0, 0, 0)
    sw = _ScanWriter()
    preds = {1: 0, 2: 0, 3: 0}

    def put_dc(cid: int, value: int) -> None:
        diff = value - preds[cid]
        preds[cid] = value
        t = _category(diff)
        sw.w.put(*_DC_CODES[t])
        if t:
            sw.w.put(_mag_bits(diff, t), t)

    for yy in range(my):
        for xx in range(mx):
            for v in range(2):
                for hh in range(2):
                    put_dc(1, int(luma_pad[yy * 2 + v][xx * 2 + hh][0]))
            put_dc(2, 0)
            put_dc(3, 0)
    out += sw.done()
    # luma AC scan over the UNPADDED grid (non-interleaved ordering)
    bw, bh = -(-w // 8), -(-h // 8)
    luma_unpad = [luma_pad[by][bx] for by in range(bh) for bx in range(bw)]
    out += _sos([1], 1, 63, 0, 0) + _emit_ac_first(luma_unpad, 1, 63, 0)
    # chroma AC scans: every band zero -> EOB runs only; decoder skips
    cbw, cbh = -(-(-(-w // 2)) // 8), -(-(-(-h // 2)) // 8)
    zero_blocks = [np.zeros(64, dtype=np.int64)] * (cbw * cbh)
    for cid in (2, 3):
        out += _sos([cid], 1, 63, 0, 0) + _emit_ac_first(zero_blocks, 1, 63, 0)
    return bytes(out + b"\xff\xd9")


# ---------------------------------------------------------------------------


def test_progressive_equals_baseline_same_coefficients():
    # the decisive identity: same quantized coefficients through both
    # entropy codings must yield IDENTICAL pixels
    px = _test_image(37, 29)
    for q in (Q_ONE, np.full(64, 6, dtype=np.int64)):
        wb, hb, base = decode_jpeg_luma(encode_gray_jpeg(px, q))
        wp, hp, prog = decode_jpeg_luma(encode_gray_progressive(px, q))
        assert (wb, hb) == (wp, hp) == (37, 29)
        assert np.array_equal(base, prog)


def test_progressive_spectral_only_roundtrip():
    px = _test_image(48, 33)
    w, h, y = decode_jpeg_luma(
        encode_gray_progressive(px, Q_ONE, script=SPECTRAL_ONLY_SCRIPT)
    )
    assert (w, h) == (48, 33)
    assert int(np.abs(y.astype(int) - px.astype(int)).max()) <= 2


def test_progressive_full_sa_roundtrip_q1():
    px = _test_image(37, 29)
    w, h, y = decode_jpeg_luma(encode_gray_progressive(px, Q_ONE))
    assert (w, h) == (37, 29)
    assert int(np.abs(y.astype(int) - px.astype(int)).max()) <= 2


def test_progressive_eobrun_stress():
    # mostly-flat image -> long EOB runs spanning many blocks, plus a few
    # speckles that cut runs mid-stream; exercises EOBn > 1 on both the
    # first-pass and refinement paths
    px = np.full((64, 64), 128, dtype=np.uint8)
    px[5, 7] = 200
    px[40, 33] = 60
    px[63, 63] = 255
    wb, hb, base = decode_jpeg_luma(encode_gray_jpeg(px, Q_ONE))
    wp, hp, prog = decode_jpeg_luma(encode_gray_progressive(px, Q_ONE))
    assert np.array_equal(base, prog)
    assert int(np.abs(prog.astype(int) - px.astype(int)).max()) <= 2


def test_progressive_with_restart_markers():
    px = _test_image(64, 24)
    data = encode_gray_progressive(px, Q_ONE, restart=3)
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    w, h, y = decode_jpeg_luma(data)
    assert (w, h) == (64, 24)
    assert int(np.abs(y.astype(int) - px.astype(int)).max()) <= 2


def test_progressive_ycc420_skips_chroma_scans():
    px = _test_image(50, 34)
    wb, hb, base = decode_jpeg_luma(encode_ycc420_jpeg(px, Q_ONE))
    wp, hp, prog = decode_jpeg_luma(encode_ycc420_progressive(px, Q_ONE))
    assert (wp, hp) == (50, 34)
    assert np.array_equal(base, prog)


def test_progressive_media_features_leaves_stub_tier():
    # the multimodal kernel's real-decode tier must now accept SOF2
    from manga_ocr_spark.operators.multimodal import decode_jpeg_features

    px = _test_image(40, 32)
    w, h, feat = decode_jpeg_features(encode_gray_progressive(px, Q_ONE))
    assert (w, h) == (40, 32)
    assert len(feat) == 8 and all(0.0 <= f <= 1.0 for f in feat)


def test_baseline_shaped_scan_under_sof2_rejected():
    # flipping SOF0->SOF2 makes the (Ss=0, Se=63) baseline scan header
    # invalid for progressive — must raise, not silently mis-decode
    data = bytearray(encode_gray_jpeg(_test_image(), Q_ONE))
    idx = data.find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg_luma(bytes(data))


def test_progressive_two_step_successive_approximation():
    # Al = 2 -> 1 -> 0: two refinement passes per AC band — correction
    # bits emitted across TWO passes must still reconstruct exactly
    script = [
        (0, 0, 0, 2),
        (1, 63, 0, 2),
        (0, 0, 2, 1),
        (1, 63, 2, 1),
        (0, 0, 1, 0),
        (1, 63, 1, 0),
    ]
    px = _test_image(41, 27)
    for q in (Q_ONE, np.full(64, 5, dtype=np.int64)):
        wb, hb, base = decode_jpeg_luma(encode_gray_jpeg(px, q))
        wp, hp, prog = decode_jpeg_luma(encode_gray_progressive(px, q, script=script))
        assert (wb, hb) == (wp, hp) == (41, 27)
        assert np.array_equal(base, prog)
