"""Synthetic Iceberg-shaped image+caption table + payload codecs.

Schema fixed by the engine contract (BASELINE.json input_hint):
``(image_id string, bytes binary, w int, h int, fmt string,
caption string, phash bigint)`` — the sampled-SF stand-in for the
10^12-image production table. Everything is deterministic in
(seed, n) and generated DISTRIBUTED via mapInPandas over a range —
no driver-side loops, so the generator itself scales with the
cluster.

Codecs:
* PNG — a real minimal RGB8 PNG encoder/decoder on stdlib zlib
  (true lossless round-trip, verified by the payload-invariant tests).
* JPEG — a REAL baseline DCT codec (sources/jpeg.py: 8×8 DCT,
  Annex-K quantization + Huffman tables, JFIF stream) — the lossy
  path end-to-end. Synthetic "jpeg" rows encode at quality 98, which
  keeps the noisy synthetic content above the input_hint's 40 dB PSNR
  invariant (measured ≈ 43.6 dB; the per-pixel noise makes these
  images a worst case for DCT coding).

phash: classic 8×8 average-hash over the grayscale downsample —
64-bit, vectorized.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .jpeg import jpeg_decode, jpeg_encode

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

_VOCAB = (
    "tile polygon ring vertex raster vector lattice cell grid node edge "
    "shell hole dangle mosaic atlas basin ridge contour parcel"
).split()


# --------------------------------------------------------------- PNG --


def png_encode(pixels: np.ndarray) -> bytes:
    """RGB8 (h, w, 3) → PNG bytes (filter 0, one IDAT)."""
    h, w, _ = pixels.shape
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → RGB8 (h, w, 3). Supports 8-bit RGB with scanline
    filters 0-4 (our encoder emits 0; the un-filter loop keeps the
    decoder honest for external PNGs)."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type, *_ = struct.unpack(">IIBBBBB", body)
            assert bit_depth == 8 and color_type == 2, "only RGB8 supported"
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = w * 3 + 1
    rows = raw.reshape(h, stride)
    filters = rows[:, 0]
    out = np.zeros((h, w * 3), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        line = rows[y, 1:].astype(np.int32)
        f = filters[y]
        prev = out[y - 1].astype(np.int32) if y else np.zeros(w * 3, np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need left-neighbor recurrence
            cur = np.empty(w * 3, np.int32)
            for i in range(w * 3):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (line[i] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, 3)


# ------------------------------------------------------- determinism --

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the deterministic per-row hash used for
    pixels, points, and captions (public-domain algorithm)."""
    z = x.astype(np.uint64) + _SM_GAMMA
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _pixels_for(idx: int, seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB pixels: a smooth per-image gradient + seeded
    noise (compressible, so PNG stays small)."""
    rng = np.random.default_rng(int(splitmix64(np.array([seed * 1_000_003 + idx], np.uint64))[0]))
    base = rng.integers(0, 256, size=3, dtype=np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    grad = ((xx + yy) * 255 // max(w + h - 2, 1)).astype(np.uint8)
    noise = rng.integers(0, 32, size=(h, w, 3), dtype=np.uint8)
    return (base[None, None, :] + grad[:, :, None] + noise).astype(np.uint8)


JPEG_QUALITY = 98  # keeps the synthetic noise above 40 dB PSNR


def decode_image(blob: bytes) -> np.ndarray:
    """Format-sniffing decode: PNG signature or JPEG SOI → RGB8."""
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return png_decode(blob)
    if blob[:2] == b"\xff\xd8":
        return jpeg_decode(blob)
    raise ValueError("unknown image container (expected PNG or JFIF)")


def phash64(px: np.ndarray) -> int:
    """8×8 average hash: grayscale → 8×8 block means → bit per cell
    above the mean. Standard perceptual-hash construction."""
    gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    # crop to multiples of 8 then block-mean to 8×8
    gray = gray[: (h // 8) * 8, : (w // 8) * 8]
    small = gray.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    bits = (small > small.mean()).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def caption_for(idx: int, seed: int) -> str:
    hv = splitmix64(np.arange(idx * 8, idx * 8 + 8, dtype=np.uint64) + np.uint64(seed))
    words = [_VOCAB[int(v % len(_VOCAB))] for v in hv]
    return f"caption for img {idx}: " + " ".join(words)


def synth_images(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    w: int = 32,
    h: int = 32,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic image+caption table of n rows."""
    base = spark.range(0, n, numPartitions=partitions or max(n // 4096, 8))

    def gen(batches):
        for pdf in batches:
            out = []
            for idx in pdf["id"].to_numpy():
                idx = int(idx)
                px = _pixels_for(idx, seed, w, h)
                fmt = "jpeg" if idx % 3 == 0 else "png"
                blob = jpeg_encode(px, JPEG_QUALITY) if fmt == "jpeg" else png_encode(px)
                out.append(
                    (
                        f"img_{idx:012d}",
                        blob,
                        w,
                        h,
                        fmt,
                        caption_for(idx, seed),
                        phash64(px),
                    )
                )
            yield pd.DataFrame(
                out, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return base.mapInPandas(gen, IMAGES_SCHEMA)


VIDEOS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fps", T.DoubleType(), False),
    ]
)


def video_frame_pixels(idx: int, seed: int, w: int, h: int, frame: int) -> np.ndarray:
    """Deterministic per-frame pixels: the image generator's frame-0
    pixels rolled horizontally by the frame index (simple 'motion'
    whose per-frame ground truth any test can recompute)."""
    return np.roll(_pixels_for(idx, seed, w, h), shift=frame, axis=1)


def synth_videos(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    w: int = 16,
    h: int = 16,
    n_frames: int = 24,
    fps: float = 25.0,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic multi-frame video table: real APNG
    payloads (sources/apng.py) — the fixtures behind the REAL
    ``frame_sample`` decode path."""
    from .apng import apng_encode

    base = spark.range(0, n, numPartitions=partitions or max(n // 1024, 4))

    def gen(batches):
        for pdf in batches:
            out = []
            for idx in pdf["id"].to_numpy():
                idx = int(idx)
                frames = [video_frame_pixels(idx, seed, w, h, f) for f in range(n_frames)]
                out.append(
                    (f"vid_{idx:09d}", apng_encode(frames, fps), n_frames, w, h, fps)
                )
            yield pd.DataFrame(
                out, columns=["media_id", "bytes", "n_frames", "w", "h", "fps"]
            )

    return base.mapInPandas(gen, VIDEOS_SCHEMA)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
