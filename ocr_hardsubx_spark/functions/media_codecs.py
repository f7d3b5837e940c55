"""Real media decoders from the standard library (no external codecs).

The sandbox ships no Pillow/libsndfile, but two formats are fully
decodable with stdlib alone, which makes the multimodal plumbing REAL for
them instead of stubbed:

* **PNG** — chunk parse + zlib inflate + per-scanline unfiltering
  (filters 0-4 per the PNG spec: None, Sub, Up, Average, Paeth), for
  8-bit greyscale / grey+alpha / RGB / RGBA, non-interlaced.  Output is
  a (H, W) uint8 luminance array computed with the reference's exact
  fixed-point form (``/root/reference/color.h:90-116`` RGB2Gray builds a
  Q14 LUT from the BT.601 coefficients R2Y=4899 G2Y=9617 B2Y=1868 with
  rounding constant 1<<13; RGB2gray sums and shifts right 14) — so the
  cvtColor(→GRAY) analog is bit-identical, not merely same-weights.
* **WAV** — stdlib ``wave`` for framing, numpy for PCM conversion
  (8/16/32-bit), channel-averaged to mono float32 in [-1, 1].

Anything else (JPEG, GIF, compressed audio) falls back to Pillow when
importable, else to the declared deterministic stub in
operators/multimodal.py.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colortype -> samples per pixel


class UnsupportedMedia(ValueError):
    """Payload is syntactically valid but outside the decoder's subset."""


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W) uint8 luminance. Raises UnsupportedMedia for
    subsets not implemented (palette, 16-bit, interlaced), ValueError for
    malformed data."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, bitdepth, colortype, comp, filt, interlace = ihdr
    if bitdepth != 8 or colortype not in _CHANNELS or interlace != 0:
        raise UnsupportedMedia(
            f"PNG subset not implemented: depth={bitdepth} "
            f"color={colortype} interlace={interlace}")
    ch = _CHANNELS[colortype]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data size mismatch")
    img = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_off + 1
        ).astype(np.int32)
        if ftype == 0:                       # None
            recon = line
        elif ftype == 2:                     # Up
            recon = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):             # Sub / Average / Paeth
            recon = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = recon[x - ch] if x >= ch else 0           # left
                b = prev[x]                                   # up
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = prev[x - ch] if x >= ch else 0        # up-left
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if pa <= pb and pa <= pc else \
                        (b if pb <= pc else c)
                recon[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        img[y] = recon
        prev = recon
    px = img.reshape(height, width, ch)
    if colortype == 0:
        return px[:, :, 0].copy()
    if colortype == 4:                        # grey + alpha
        return px[:, :, 0].copy()
    r = px[:, :, 0].astype(np.int32)
    g = px[:, :, 1].astype(np.int32)
    b = px[:, :, 2].astype(np.int32)
    # reference RGB2gray (color.h:110-116): Q14 LUT sum, >> 14; the
    # 1<<13 rounding constant is folded into the R channel's LUT base
    return ((4899 * r + 9617 * g + 1868 * b + (1 << 13)) >> 14) \
        .astype(np.uint8)


def decode_wav(payload: bytes) -> np.ndarray:
    """WAV bytes -> mono float32 samples in [-1, 1] (channel mean)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:                          # unsigned 8-bit
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    elif width == 4:
        x = (np.frombuffer(frames, dtype="<i4").astype(np.float32)
             / 2147483648.0)
    else:
        raise UnsupportedMedia(f"WAV sample width {width} not implemented")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x.astype(np.float32)
