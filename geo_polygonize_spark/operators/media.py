"""Multimodal payload operators — decode / feature-extract / resize /
frame-sample over opaque ``binary`` media columns (the training-data
extensions named by the brief; the reference has no payload surface).

All operators are ``mapInPandas`` over Arrow record batches: the
binary blobs stay inside the batch (never in a shuffle key), outputs
are struct-of-primitive columns built from numpy, and each batch
decodes with the repo's REAL codecs: PNG and baseline JPEG for
images (``sources/images`` / ``sources/jpeg``), animated-PNG for
video (``sources/apng``) — as of r3 there is no decode stub anywhere
in this surface.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..sources.images import decode_image, phash64, png_encode

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("luma_var", T.DoubleType()),
        T.StructField("phash", T.LongType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
    ]
)


def image_features(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Decode + feature-extract: per-image channel means, luma
    variance, and perceptual hash, recomputed FROM THE BYTES (the
    stored ``phash`` column is lineage to verify against, not an
    input). Map-only; blobs never leave their input partition."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            out = {
                "image_id": pdf[id_col].tolist(),
                "mean_r": np.empty(n),
                "mean_g": np.empty(n),
                "mean_b": np.empty(n),
                "luma_var": np.empty(n),
                "phash": np.empty(n, np.int64),
                "w": np.empty(n, np.int32),
                "h": np.empty(n, np.int32),
            }
            for i, blob in enumerate(pdf["bytes"]):
                px = decode_image(bytes(blob))  # (h, w, 3) uint8
                fl = px.astype(np.float64)
                out["mean_r"][i] = fl[:, :, 0].mean()
                out["mean_g"][i] = fl[:, :, 1].mean()
                out["mean_b"][i] = fl[:, :, 2].mean()
                luma = 0.299 * fl[:, :, 0] + 0.587 * fl[:, :, 1] + 0.114 * fl[:, :, 2]
                out["luma_var"][i] = luma.var()
                out["phash"][i] = phash64(px)
                out["h"][i], out["w"][i] = px.shape[0], px.shape[1]
            yield pd.DataFrame(out)

    return images.select(id_col, "bytes").mapInPandas(extract, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def resize_images(images: DataFrame, out_w: int, out_h: int, id_col: str = "image_id") -> DataFrame:
    """Decode → nearest-neighbor resize (pure numpy gather) →
    re-encode PNG. Real end to end (no codec stub): the output blobs
    decode back to exactly the gathered pixels."""

    def rsz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids, blobs = pdf[id_col].tolist(), []
            for blob in pdf["bytes"]:
                px = decode_image(bytes(blob))
                h, w = px.shape[0], px.shape[1]
                yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
                xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
                blobs.append(png_encode(px[yi][:, xi]))
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "bytes": blobs,
                    "w": np.full(n, out_w, np.int32),
                    "h": np.full(n, out_h, np.int32),
                    "fmt": ["png"] * n,
                }
            )

    return images.select(id_col, "bytes").mapInPandas(rsz, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("t_ms", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def frame_sample(
    videos: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
    bytes_col: str = "bytes",
    fps: float = 25.0,
) -> DataFrame:
    """Video frame sampling with a REAL decoder (r3 — the xor stub is
    gone): the blob is an animated-PNG container (sources/apng.py);
    one output row per sampled frame (frame_idx ≡ 0 mod ``every_n``)
    with its timestamp and the frame re-encoded as a standalone PNG.

    Scale shape: mapInPandas fan-out (many rows out per input row;
    blobs never enter a shuffle key), and only the SAMPLED frames are
    decompressed — APNG full-frame streams are independent, so the
    decoder skips unsampled frames entirely (``apng_decode(indices=)``).
    The frame count comes from the container's acTL chunk, not a
    trusted side column (the r2-era ``n_frames_col`` kwarg was
    deprecated in r4 and removed in r5)."""
    from ..sources.apng import apng_count_frames, apng_decode

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            fidx: list = []
            tms: list = []
            payload: list = []
            for r in pdf.itertuples(index=False):
                blob = bytes(getattr(r, bytes_col))
                n_frames = apng_count_frames(blob)
                want = list(range(0, n_frames, every_n))
                frames = apng_decode(blob, indices=want)
                for k, px in zip(want, frames):
                    ids.append(getattr(r, id_col))
                    fidx.append(k)
                    tms.append(int(round(k * 1000.0 / fps)))
                    payload.append(png_encode(px))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": np.asarray(fidx, np.int32),
                    "t_ms": np.asarray(tms, np.int64),
                    "frame_bytes": payload,
                }
            )

    return videos.select(F.col(id_col).alias(id_col), F.col(bytes_col)).mapInPandas(
        sample, FRAME_SCHEMA
    )
