"""Baseline JPEG decoder vs an independent in-test encoder + IDCT.

The encoder here (bit writer, huffman emission, marker framing) shares NO
code with the decoder, and expected pixels come either from hand-derived
arithmetic (DC-only blocks are flat at DC/8 + 128) or from an explicit
double-loop IDCT written directly from the T.81 formula.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from ocr_hardsubx_spark.functions.media_codecs import (
    UnsupportedMedia,
    decode_jpeg,
)

# hand-chosen canonical tables: DC symbols 0..11 at code length 4;
# AC symbols EOB, (0,1), (0,2), (1,1), ZRL at code length 4
DC_COUNTS = [0, 0, 0, 12] + [0] * 12
DC_SYMBOLS = bytes(range(12))
AC_COUNTS = [0, 0, 0, 5] + [0] * 12
AC_SYMBOLS = bytes([0x00, 0x01, 0x02, 0x11, 0xF0])


def _code_of(counts, symbols, want):
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if symbols[k] == want:
                return length, code
            k += 1
            code += 1
        code <<= 1
    raise KeyError(want)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1s per spec
        return bytes(self.out)


def _category(v):
    return 0 if v == 0 else v.bit_length() if v > 0 else (-v).bit_length()


def _emit_value(w, v, s):
    if s:
        w.put(v if v >= 0 else v + (1 << s) - 1, s)


def _emit_block(w, dc_diff, ac=()):
    """ac: list of (zigzag_index, value) with only small runs/sizes that
    the tiny AC table can express."""
    s = _category(dc_diff)
    length, code = _code_of(DC_COUNTS, DC_SYMBOLS, s)
    w.put(code, length)
    _emit_value(w, dc_diff, s)
    k = 1
    for zz, val in ac:
        run = zz - k
        while run >= 16:
            length, code = _code_of(AC_COUNTS, AC_SYMBOLS, 0xF0)
            w.put(code, length)
            run -= 16
        size = _category(val)
        length, code = _code_of(AC_COUNTS, AC_SYMBOLS, (run << 4) | size)
        w.put(code, length)
        _emit_value(w, val, size)
        k = zz + 1
    if k <= 63:
        length, code = _code_of(AC_COUNTS, AC_SYMBOLS, 0x00)
        w.put(code, length)


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _jpeg(width, height, comps, blocks_writer, qdc=8, qrest=2):
    """comps: list of (id, h, v); blocks_writer fills a _BitWriter."""
    qtable = bytes([0]) + bytes([qdc] + [qrest] * 63)
    dht = (bytes([0x00]) + bytes(DC_COUNTS) + DC_SYMBOLS
           + bytes([0x10]) + bytes(AC_COUNTS) + AC_SYMBOLS)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(comps)])
    for cid, h, v in comps:
        sof += bytes([cid, (h << 4) | v, 0])
    sos = bytes([len(comps)])
    for cid, _, _ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    w = _BitWriter()
    blocks_writer(w)
    return (b"\xff\xd8" + _seg(0xDB, qtable) + _seg(0xC4, dht)
            + _seg(0xC0, sof) + _seg(0xDA, sos) + w.flush() + b"\xff\xd9")


def _idct_reference(coefs8x8):
    """Explicit T.81 A.3.3 IDCT double loop (independent of the decoder's
    matrix form)."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * coefs8x8[u][v]
                          * math.cos((2 * y + 1) * u * math.pi / 16)
                          * math.cos((2 * x + 1) * v * math.pi / 16))
            out[y, x] = s / 4.0
    return out


def test_dc_only_block_is_flat():
    """DC diff 10 at q0=8 -> dequant 80 -> IDCT flat 80/8 = 10 -> 138."""
    jpg = _jpeg(8, 8, [(1, 1, 1)], lambda w: _emit_block(w, 10))
    img = decode_jpeg(jpg)
    assert img.shape == (8, 8)
    np.testing.assert_array_equal(img, np.full((8, 8), 138, np.uint8))


def test_dc_prediction_across_blocks():
    """Two MCUs: diffs 10 then -3 -> DCs 10, 7 -> flat 138, 135."""
    def wr(w):
        _emit_block(w, 10)
        _emit_block(w, -3)
    jpg = _jpeg(16, 8, [(1, 1, 1)], wr)
    img = decode_jpeg(jpg)
    np.testing.assert_array_equal(img[:, :8], np.full((8, 8), 138, np.uint8))
    np.testing.assert_array_equal(img[:, 8:], np.full((8, 8), 135, np.uint8))


def test_ac_coefficient_matches_reference_idct():
    """DC 10 + one AC at zigzag 1 (u=0,v=1): decoder pixels equal the
    explicit double-loop IDCT of the dequantized coefficients."""
    jpg = _jpeg(8, 8, [(1, 1, 1)],
                lambda w: _emit_block(w, 10, ac=[(1, 3)]))
    img = decode_jpeg(jpg)
    coefs = np.zeros((8, 8))
    coefs[0, 0] = 10 * 8          # dequant with qdc=8
    coefs[0, 1] = 3 * 2           # zigzag 1 -> (0,1), qrest=2
    want = np.clip(np.round(_idct_reference(coefs) + 128.0),
                   0, 255).astype(np.uint8)
    np.testing.assert_array_equal(img, want)


def test_negative_ac_and_run():
    """Run-length positioning: AC at zigzag 2 via (run=1,size=1) after an
    implicit gap; negative value exercises the extend mapping."""
    jpg = _jpeg(8, 8, [(1, 1, 1)],
                lambda w: _emit_block(w, 4, ac=[(2, -1)]))
    img = decode_jpeg(jpg)
    coefs = np.zeros((8, 8))
    coefs[0, 0] = 4 * 8
    coefs[1, 0] = -1 * 2          # zigzag 2 -> (1,0)
    want = np.clip(np.round(_idct_reference(coefs) + 128.0),
                   0, 255).astype(np.uint8)
    np.testing.assert_array_equal(img, want)


def test_420_interleave_luma_quadrants():
    """3-component 4:2:0: per MCU four Y blocks (distinct flat DCs) then
    Cb, Cr (zero blocks, entropy-decoded but never transformed)."""
    def wr(w):
        prev = 0
        for dc in (8, 16, 24, 32):     # Y blocks: TL TR BL BR
            _emit_block(w, dc - prev)
            prev = dc
        _emit_block(w, 0)              # Cb (pred independent per comp)
        _emit_block(w, 0)              # Cr
    jpg = _jpeg(16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)], wr)
    img = decode_jpeg(jpg)
    assert img.shape == (16, 16)
    np.testing.assert_array_equal(img[:8, :8], np.full((8, 8), 136))
    np.testing.assert_array_equal(img[:8, 8:], np.full((8, 8), 144))
    np.testing.assert_array_equal(img[8:, :8], np.full((8, 8), 152))
    np.testing.assert_array_equal(img[8:, 8:], np.full((8, 8), 160))


def test_progressive_rejected():
    body = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    jpg = (b"\xff\xd8" + _seg(0xC2, body) + b"\xff\xd9")
    with pytest.raises(UnsupportedMedia):
        decode_jpeg(jpg)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not jpeg")


def test_operator_routes_real_jpeg():
    """multimodal._decode_image now uses the real decoder for baseline
    JPEG payloads."""
    from ocr_hardsubx_spark.operators.multimodal import _decode_image

    jpg = _jpeg(8, 8, [(1, 1, 1)], lambda w: _emit_block(w, 10))
    img, real = _decode_image(jpg)
    np.testing.assert_array_equal(img, np.full((8, 8), 138, np.uint8))
    assert real is True
