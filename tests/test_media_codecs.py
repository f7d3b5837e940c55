"""Stdlib media codecs: real PNG/WAV decode (verdict item 10 adapted —
no Pillow in the sandbox, so the real path is built on zlib/wave).

PNG fixtures are constructed BYTE BY HAND in this test (chunk framing,
filter bytes, zlib) — independent of the decoder's own code paths — and
pixel expectations are literals.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from ocr_hardsubx_spark.functions.media_codecs import (
    PNG_SIG,
    UnsupportedMedia,
    decode_png,
    decode_wav,
)
from ocr_hardsubx_spark.operators.multimodal import (
    _decode_audio,
    _decode_image,
    sniff_format,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _png(width, height, colortype, scanlines: bytes) -> bytes:
    """Assemble a PNG from raw (filter byte + pixel bytes) scanlines."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scanlines))
            + _chunk(b"IEND", b""))


def test_grey_png_filter_none():
    # 2x2 grey, filter 0, pixels [[7, 250], [0, 128]]
    png = _png(2, 2, 0, bytes([0, 7, 250, 0, 0, 128]))
    np.testing.assert_array_equal(decode_png(png),
                                  [[7, 250], [0, 128]])


def test_grey_png_filter_sub_and_up():
    # row 0: Sub filter: raw deltas [10, 20] -> recon [10, 30]
    # row 1: Up  filter: raw deltas [5, 5]   -> recon [15, 35]
    png = _png(2, 2, 0, bytes([1, 10, 20, 2, 5, 5]))
    np.testing.assert_array_equal(decode_png(png),
                                  [[10, 30], [15, 35]])


def test_grey_png_filter_average_and_paeth():
    # row 0: Average: pred = (left + 0)//2 -> [100, (100//2)+6=56]
    # row 1: Paeth over (a=left, b=up, c=upleft)
    #   x0: a=0 b=100 c=0 -> pa=100 pb=0 pc=100 -> pred=b=100; +1 = 101
    #   x1: a=101 b=56 c=100 -> pa=|56-100|=44 pb=|101-100|=1
    #       pc=|101+56-200|=43 -> pb smallest -> pred=b=56; +4 = 60
    png = _png(2, 2, 0, bytes([3, 100, 6, 4, 1, 4]))
    np.testing.assert_array_equal(decode_png(png),
                                  [[100, 56], [101, 60]])


def test_rgb_png_reference_q14_luminance():
    # one pixel each of pure R, G, B, white; the reference's RGB2gray
    # Q14 form (color.h:110-116, R2Y=4899 G2Y=9617 B2Y=1868, +1<<13,
    # >>14), hand-computed:
    #   R: (4899*255 + 8192) >> 14 = 76
    #   G: (9617*255 + 8192) >> 14 = 150   (floor-decimal BT.601 gives
    #                                       149 — the Q14 rounding is
    #                                       the observable difference)
    #   B: (1868*255 + 8192) >> 14 = 29
    #   W: (16384*255 + 8192) >> 14 = 255
    row = bytes([0, 255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    png = _png(4, 1, 2, row)
    np.testing.assert_array_equal(decode_png(png), [[76, 150, 29, 255]])


def test_rgba_png_ignores_alpha():
    row = bytes([0, 255, 255, 255, 0, 0, 0, 0, 255])
    png = _png(2, 1, 6, row)
    np.testing.assert_array_equal(decode_png(png), [[255, 0]])


def test_png_unsupported_subsets_raise():
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    png = (PNG_SIG + _chunk(b"IHDR", ihdr16)
           + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
           + _chunk(b"IEND", b""))
    with pytest.raises(UnsupportedMedia):
        decode_png(png)
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def _wav(samples: np.ndarray, n_ch: int = 1, width: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(width)
        w.setframerate(16000)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def test_wav_int16_roundtrip():
    s = np.array([0, 16384, -16384, 32767, -32768], dtype="<i2")
    got = decode_wav(_wav(s))
    np.testing.assert_allclose(
        got, [0.0, 0.5, -0.5, 32767 / 32768, -1.0], atol=1e-6)
    assert got.dtype == np.float32


def test_wav_stereo_averages_to_mono():
    inter = np.array([1000, 3000, -2000, -4000], dtype="<i2")  # L R L R
    got = decode_wav(_wav(inter, n_ch=2))
    np.testing.assert_allclose(got, [2000 / 32768, -3000 / 32768], atol=1e-6)


def test_wav_uint8():
    s = np.array([128, 255, 0], dtype=np.uint8)
    got = decode_wav(_wav(s, width=1))
    np.testing.assert_allclose(got, [0.0, 127 / 128, -1.0], atol=1e-6)


def test_operator_routing_real_vs_stub():
    """_decode_image uses the real codec for PNG (exact pixels) and the
    declared deterministic fake for JPEG (no codec in sandbox);
    _decode_audio likewise for WAV."""
    png = _png(2, 1, 0, bytes([0, 11, 22]))
    assert sniff_format(png) == "png"
    np.testing.assert_array_equal(_decode_image(png), [[11, 22]])

    jpeg = b"\xff\xd8\xff" + b"\x00" * 64
    assert sniff_format(jpeg) == "jpeg"
    fake = _decode_image(jpeg)
    np.testing.assert_array_equal(fake, _decode_image(jpeg))  # deterministic

    s = np.array([0, 8192], dtype="<i2")
    wav = _wav(s)
    assert sniff_format(wav) == "wav"
    np.testing.assert_allclose(_decode_audio(wav), [0.0, 0.25], atol=1e-6)


def test_spark_image_features_on_real_png(spark):
    """The Spark mapInPandas operator consumes a REAL PNG end to end:
    width/height come from the actual decode, and a constant-grid phash
    is reproducible."""
    from ocr_hardsubx_spark.operators.multimodal import image_features

    # 16x8 gradient so the 8x8 grid has distinct block means
    rows = []
    for y in range(8):
        rows.append(bytes([0]) + bytes((x * 16 + y) % 256
                                       for x in range(16)))
    png = _png(16, 8, 0, b"".join(rows))
    df = spark.createDataFrame([(1, bytearray(png))], "id long, payload binary")
    out = image_features(df).collect()
    assert len(out) == 1
    assert (out[0]["width"], out[0]["height"]) == (16, 8)
    grid = np.array(out[0]["grid"]).reshape(8, 8)
    # block means rise left to right exactly as the gradient dictates
    assert (np.diff(grid.mean(axis=0)) > 0).all()


def test_video_frame_sample_spacing_and_cap(spark):
    from ocr_hardsubx_spark.operators.multimodal import video_frame_sample

    df = spark.createDataFrame(
        [(i, bytearray(b"clip" + bytes([i]))) for i in range(6)],
        "id long, payload binary")
    rows = video_frame_sample(df, every_seconds=1.0, max_frames=32).collect()
    assert len(rows) == 6
    for r in rows:
        idx = r["sampled_frames"]
        assert 1 <= len(idx) <= 32
        assert idx == sorted(set(idx))              # strictly increasing
        assert idx[0] == 0 and idx[-1] <= r["n_frames"] - 1
        if len(idx) == 32:                          # capped -> re-spaced
            assert idx[-1] == r["n_frames"] - 1     # still covers the end
    # determinism
    again = video_frame_sample(df, every_seconds=1.0, max_frames=32).collect()
    assert [r["sampled_frames"] for r in again] == \
        [r["sampled_frames"] for r in rows]


# ---- GIF (hand-packed LZW streams, literal expectations) -----------------

def _pack_codes(codes_widths):
    """LSB-first GIF bit packing."""
    acc = 0
    nbits = 0
    out = bytearray()
    for code, width in codes_widths:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif(w, h, palette, lzw_data, min_code=2):
    pal_exp = 1  # 4-entry table
    head = (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | pal_exp, 0, 0)
            + bytes(v for rgb in palette for v in rgb))
    img = (b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
           + bytes([min_code]))
    body = b""
    data = lzw_data
    while data:
        chunk, data = data[:255], data[255:]
        body += bytes([len(chunk)]) + chunk
    return head + img + body + b"\x00" + b"\x3b"


_PAL4 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
# Q14 luminances of the palette entries: 76, 150, 29, 255


def test_gif_four_distinct_pixels():
    """Pixels [0,1,2,3]; CLEAR before every literal keeps codes 3-bit."""
    from ocr_hardsubx_spark.functions.media_codecs import decode_gif

    codes = [(4, 3), (0, 3), (4, 3), (1, 3), (4, 3), (2, 3),
             (4, 3), (3, 3), (5, 3)]
    gif = _gif(2, 2, _PAL4, _pack_codes(codes))
    np.testing.assert_array_equal(decode_gif(gif), [[76, 150], [29, 255]])


def test_gif_lzw_kwkwk_case():
    """Codes [CLEAR, 0, free, free]: the code-equals-next-free (KwKwK)
    rule, plus the width bump from 3 to 4 bits mid-stream."""
    from ocr_hardsubx_spark.functions.media_codecs import decode_gif

    codes = [(4, 3), (0, 3), (6, 3), (7, 3), (5, 4)]
    gif = _gif(2, 2, _PAL4, _pack_codes(codes))
    np.testing.assert_array_equal(decode_gif(gif), np.full((2, 2), 76))


def test_gif_interlaced_rejected():
    from ocr_hardsubx_spark.functions.media_codecs import decode_gif

    head = (b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)
            + bytes(v for rgb in _PAL4 for v in rgb))
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0x40) + b"\x02"
    with pytest.raises(UnsupportedMedia):
        decode_gif(head + img + b"\x00\x3b")
    with pytest.raises(ValueError):
        decode_gif(b"GIF00 nope")


# ---- property round-trips (independent encoders, random payloads) --------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2 ** 32 - 1))
def test_png_roundtrip_random_grey(w, h, seed):
    """Random grey images, alternating None/Up filter rows, decode to the
    exact source pixels."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    lines = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        if y % 2 == 0:
            lines += bytes([0]) + img[y].tobytes()
        else:  # Up filter: deltas vs previous row
            lines += bytes([2]) + ((img[y].astype(np.int32) - prev)
                                   % 256).astype(np.uint8).tobytes()
        prev = img[y].astype(np.int32)
    png = _png(w, h, 0, bytes(lines))
    np.testing.assert_array_equal(decode_png(png), img)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=64))
def test_wav_roundtrip_random_int16(samples):
    s = np.array(samples, dtype="<i2")
    got = decode_wav(_wav(s))
    np.testing.assert_allclose(got, s.astype(np.float64) / 32768.0,
                               atol=1e-7)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 3), min_size=1, max_size=36))
def test_gif_lzw_roundtrip_literals(pixels):
    """Any index stream is expressible as CLEAR-prefixed literals; the
    decoder must reproduce it exactly (then palette -> Q14 grey)."""
    from ocr_hardsubx_spark.functions.media_codecs import _gif_lzw

    codes = []
    for p in pixels:
        codes.append((4, 3))
        codes.append((p, 3))
    codes.append((5, 3))
    got = _gif_lzw(_pack_codes(codes), 2, len(pixels))
    assert got == pixels


def test_tiny_image_grid_has_no_nan():
    """1x1 tracking-pixel PNG: the 8x8 grid upsamples, never NaN."""
    from ocr_hardsubx_spark.operators.multimodal import (
        _phash,
        _resize_grid,
    )

    png = _png(1, 1, 0, bytes([0, 200]))
    img = decode_png(png)
    grid = _resize_grid(img)
    assert grid.shape == (8, 8)
    assert not np.isnan(grid).any()
    np.testing.assert_array_equal(grid, np.full((8, 8), 200, np.float32))
    assert isinstance(_phash(grid), int)


def test_corrupt_payloads_fall_back_to_stub_not_crash():
    """Truncated/garbage payloads of every sniffable format route to the
    deterministic fake instead of killing the task (review finding: the
    raised types are diverse — zlib.error, struct.error, KeyError...)."""
    corrupt = [
        PNG_SIG + b"\x00\x00\x00\x0dIHDR" + b"\x00" * 6,   # truncated PNG
        b"\xff\xd8\xff\xdb\x00\x04\x00",                     # truncated JPEG
        b"\xff\xd8\xff\xda\x00\x02" + b"\x12\x34",           # SOS before SOF
        b"GIF89a\x02\x00",                                   # truncated GIF
        b"RIFF1234WAVEfmt ",                                 # truncated WAV
    ]
    for payload in corrupt:
        img = _decode_image(payload)
        assert img.dtype == np.uint8 and img.size > 0
        au = _decode_audio(payload)
        assert au.dtype == np.float32 and au.size > 0


def test_video_max_frames_one(spark):
    from ocr_hardsubx_spark.operators.multimodal import video_frame_sample

    df = spark.createDataFrame([(1, bytearray(b"clip"))],
                               "id long, payload binary")
    rows = video_frame_sample(df, max_frames=1).collect()
    assert rows[0]["sampled_frames"] == [0]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        video_frame_sample(df, max_frames=0)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2 ** 32 - 1), st.integers(0, 4))
def test_decoder_fuzz_terminates(seed, kind):
    """Random and mutated-valid payloads: decoders must terminate with a
    normal exception (absorbed upstream by the stub fallback) or a valid
    array — never hang.  Mutations flip bytes inside structurally valid
    fixtures so parsing gets past the magic numbers."""
    from ocr_hardsubx_spark.functions.media_codecs import (
        decode_gif,
        decode_jpeg,
    )

    rng = np.random.default_rng(seed)
    if kind == 0:
        payload = bytes(rng.integers(0, 256, size=64, dtype=np.uint8))
    else:
        base = {
            1: _png(3, 3, 0, bytes([0]) + bytes(range(3))
                    + bytes([2, 1, 1, 1, 0, 5, 5, 5])),
            2: _wav(np.array([1, 2, 3], dtype="<i2")),
            3: _gif(2, 2, _PAL4, _pack_codes(
                [(4, 3), (0, 3), (4, 3), (1, 3), (5, 3)])),
            4: None,
        }[kind]
        if base is None:  # mutated JPEG built from the codec test helpers
            from tests.test_jpeg_codec import _emit_block, _jpeg

            base = _jpeg(8, 8, [(1, 1, 1)], lambda w: _emit_block(w, 10))
        b = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        payload = bytes(b)
    for dec in (decode_png, decode_jpeg, decode_gif, decode_wav):
        try:
            out = dec(payload)
            assert out is not None
        except Exception:
            pass  # any normal exception is fine; the router absorbs it


def test_decode_bomb_dimensions_rejected():
    """Corrupt headers claiming absurd dimensions raise BEFORE any big
    allocation (the fuzz suite found a mutated SOF driving a ~30GB
    plane)."""
    from ocr_hardsubx_spark.functions.media_codecs import (
        decode_jpeg,
        decode_png,
    )

    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 0, 0, 0, 0)
    png = (PNG_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00"))
           + _chunk(b"IEND", b""))
    with pytest.raises(UnsupportedMedia):
        decode_png(png)

    sof = (bytes([8]) + struct.pack(">HH", 65535, 65535)
           + bytes([1, 1, 0x11, 0]))
    seg = bytes([0xFF, 0xC0]) + struct.pack(">H", len(sof) + 2) + sof
    with pytest.raises(UnsupportedMedia):
        decode_jpeg(b"\xff\xd8" + seg + b"\xff\xd9")
