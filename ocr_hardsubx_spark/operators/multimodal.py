"""Multimodal column plumbing: image/audio/video as opaque binary columns.

A 100 TB training-data pipeline carries media payloads next to text:
``binary`` columns with typed metadata structs, processed by Arrow-batched
``mapInPandas`` stages exactly like the html pipeline.  The Spark-side
plumbing here — schemas, batch iteration, partition behavior, UDF
signatures — is real and tested.  Decode is REAL for PNG and WAV via
stdlib codecs (functions/media_codecs.py); other formats feature-detect
Pillow and otherwise fall back to a DECLARED deterministic fake (JPEG in
this sandbox), so downstream arithmetic is always exercised with stable
values.  Swapping codecs changes no Spark code.

Operators:
  attach_media_meta   binary -> struct<format,width,height,n_bytes> metadata
  image_features      decode -> 8x8 block-mean luminance grid + perceptual
                      hash (real arithmetic; real pixels for PNG)
  audio_frame_sample  decode -> fixed-hop frame sampling offsets (real
                      samples for WAV)
  video_frame_sample  container probe (stub) -> evenly spaced frame
                      indices, capped with re-spacing
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = ("id long, format string, width int, height int, "
                     "n_bytes long")
IMAGE_FEATURES_SCHEMA = ("id long, phash long, grid array<float>, "
                         "width int, height int")
AUDIO_FRAMES_SCHEMA = ("id long, n_samples long, frame_offsets array<long>")
VIDEO_FRAMES_SCHEMA = ("id long, n_frames int, fps double, "
                       "sampled_frames array<int>")

_MAGIC = {b"\xff\xd8\xff": "jpeg", b"\x89PNG": "png", b"RIFF": "wav",
          b"GIF8": "gif"}


def sniff_format(payload: bytes) -> str:
    for magic, fmt in _MAGIC.items():
        if payload[:len(magic)] == magic:
            return fmt
    return "unknown"


def _pillow():
    """Feature-detect Pillow (absent in the sandbox; present on a real
    cluster image) — used for formats the stdlib codecs don't cover."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def _fake_image(payload: bytes) -> np.ndarray:
    """DECLARED deterministic stub for formats with no available codec:
    derives a pseudo-image from the payload hash so downstream arithmetic
    (resize, grid, phash) is exercised with stable values."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    w = 16 + h[8] % 48
    ht = 16 + h[9] % 48
    return rng.integers(0, 256, size=(ht, w), dtype=np.uint8)


def _decode_image(payload: bytes) -> np.ndarray:
    """Decode to (H, W) uint8 luminance.  PNG and baseline JPEG decode
    for REAL via the stdlib codecs (functions/media_codecs.py: zlib +
    filter reconstruction + reference Q14 grey for PNG; T.81 huffman +
    dequant + IDCT for JPEG); unsupported subsets (progressive JPEG,
    palette PNG, GIF) go through Pillow when importable; the
    deterministic fake remains the declared fallback of last resort."""
    from ..functions.media_codecs import (
        UnsupportedMedia,
        decode_gif,
        decode_jpeg,
        decode_png,
    )

    fmt = sniff_format(payload)
    codec = {"png": decode_png, "jpeg": decode_jpeg,
             "gif": decode_gif}.get(fmt)
    if codec is not None:
        try:
            return codec(payload)
        except Exception:
            # corrupt/truncated crawl payloads surface as many exception
            # types (zlib.error, struct.error, KeyError/IndexError from
            # missing tables, wave/EOF errors...) — the fallback contract
            # absorbs ALL of them so a routine bad payload never kills a
            # task; real-path correctness is pinned by the codec test
            # suites, so a decoder regression fails CI, not silently here
            pass
    Image = _pillow()
    if Image is not None:
        import io
        try:
            with Image.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("L"), dtype=np.uint8)
        except Exception:
            pass
    return _fake_image(payload)


def _decode_audio(payload: bytes) -> np.ndarray:
    """Decode to mono float32 samples.  WAV decodes for REAL via the
    stdlib codec; everything else uses the declared deterministic stub
    (real clusters swap in soundfile/librosa here)."""
    import struct as _struct
    import wave as _wave

    from ..functions.media_codecs import UnsupportedMedia, decode_wav

    if sniff_format(payload) == "wav":
        try:
            return decode_wav(payload)
        except (UnsupportedMedia, _wave.Error, EOFError, ValueError,
                _struct.error):
            pass  # truncated/odd-width WAV: declared stub below
    h = hashlib.sha256(payload).digest()
    n = 1000 + int.from_bytes(h[:2], "little") % 9000
    rng = np.random.default_rng(int.from_bytes(h[8:16], "little"))
    return rng.standard_normal(n).astype(np.float32)


def _resize_grid(img: np.ndarray, k: int = 8) -> np.ndarray:
    """Block-mean resize to k x k (real arithmetic, runs on the stub).
    Images smaller than k x k (1x1 tracking pixels are everywhere on the
    web) are nearest-neighbor upsampled first so no block is empty."""
    h, w = img.shape
    if h < k:
        img = np.repeat(img, -(-k // h), axis=0)
    if w < k:
        img = np.repeat(img, -(-k // w), axis=1)
    h, w = img.shape
    ys = (np.arange(k + 1) * h) // k
    xs = (np.arange(k + 1) * w) // k
    out = np.empty((k, k), dtype=np.float32)
    for i in range(k):
        for j in range(k):
            out[i, j] = img[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    return out


def _phash(grid: np.ndarray) -> int:
    """Average-hash over the 8x8 grid -> 64-bit int."""
    bits = (grid > grid.mean()).flatten()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def attach_media_meta(df: "DataFrame", id_col: str = "id",
                      payload_col: str = "payload") -> "DataFrame":
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for payload in pdf[payload_col]:
                img = _decode_image(payload)
                metas.append((sniff_format(payload), img.shape[1],
                              img.shape[0], len(payload)))
            yield pd.DataFrame({
                "id": pdf[id_col].values,
                "format": [m[0] for m in metas],
                "width": pd.array([m[1] for m in metas], dtype="int32"),
                "height": pd.array([m[2] for m in metas], dtype="int32"),
                "n_bytes": [m[3] for m in metas],
            })

    return df.mapInPandas(gen, schema=MEDIA_META_SCHEMA)


def image_features(df: "DataFrame", id_col: str = "id",
                   payload_col: str = "payload") -> "DataFrame":
    """decode (stub) -> 8x8 block-mean grid -> perceptual hash."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": pdf[id_col].values, "phash": [], "grid": [],
                   "width": [], "height": []}
            for payload in pdf[payload_col]:
                img = _decode_image(payload)
                grid = _resize_grid(img)
                out["phash"].append(_phash(grid))
                out["grid"].append([float(x) for x in grid.flatten()])
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
            out["width"] = pd.array(out["width"], dtype="int32")
            out["height"] = pd.array(out["height"], dtype="int32")
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, schema=IMAGE_FEATURES_SCHEMA)


def audio_frame_sample(df: "DataFrame", frame_hop: int = 512,
                       id_col: str = "id",
                       payload_col: str = "payload") -> "DataFrame":
    """decode (stub) -> fixed-hop frame sampling offsets."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, offs = [], []
            for payload in pdf[payload_col]:
                samples = _decode_audio(payload)
                ns.append(len(samples))
                offs.append(list(range(0, len(samples), frame_hop)))
            yield pd.DataFrame({
                "id": pdf[id_col].values,
                "n_samples": ns,
                "frame_offsets": offs,
            })

    return df.mapInPandas(gen, schema=AUDIO_FRAMES_SCHEMA)


def _probe_video(payload: bytes) -> tuple[int, float]:
    """STUB container probe -> (n_frames, fps).  A real implementation
    reads the container header (e.g. mp4 mvhd duration/timescale); the
    deterministic fake derives both from the payload hash so the sampling
    arithmetic below is exercised with stable values."""
    h = hashlib.sha256(payload).digest()
    n_frames = 100 + int.from_bytes(h[:2], "little") % 9900
    fps = float(24 + h[2] % 5 * 6)  # 24/30/36/42/48
    return n_frames, fps


def video_frame_sample(df: "DataFrame", every_seconds: float = 1.0,
                       max_frames: int = 32, id_col: str = "id",
                       payload_col: str = "payload") -> "DataFrame":
    """Opaque video payloads -> evenly spaced frame indices to decode
    (the reference consumes video frame-by-frame; a training pipeline
    samples sparse frames instead of decoding every one).  Sampling is
    `every_seconds` apart, capped at `max_frames` per clip with the cap
    re-spacing (not truncating) so long clips stay covered end to end.
    Container probe is stubbed (`_probe_video`); the Spark plumbing —
    Arrow batching, schema, per-row list output — is real."""
    if max_frames < 1:
        raise ValueError("max_frames must be >= 1")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nf, fps_l, frames = [], [], []
            for payload in pdf[payload_col]:
                n_frames, fps = _probe_video(payload)
                step = max(1, int(round(fps * every_seconds)))
                idx = list(range(0, n_frames, step))
                if len(idx) > max_frames:
                    if max_frames == 1:
                        idx = [0]
                    else:
                        # re-space over the full duration, don't truncate
                        idx = [(k * (n_frames - 1)) // (max_frames - 1)
                               for k in range(max_frames)]
                nf.append(n_frames)
                fps_l.append(fps)
                frames.append(idx)
            yield pd.DataFrame({
                "id": pdf[id_col].values,
                "n_frames": pd.array(nf, dtype="int32"),
                "fps": fps_l,
                "sampled_frames": frames,
            })

    return df.mapInPandas(gen, schema=VIDEO_FRAMES_SCHEMA)
