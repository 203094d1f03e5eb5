"""Animated-PNG (APNG) container — pure stdlib-zlib, real frames.

The video analog of the repo's PNG/JPEG codecs: full-frame RGB8
APNG with ``acTL`` / ``fcTL`` / ``fdAT`` chunks per the APNG spec
(frame 0 rides in the default-image IDAT; later frames in fdAT with
running sequence numbers; dispose_op=0, blend_op=0, full-frame
regions). ``frame_sample`` decodes these for real — the r2 xor stub
is gone; there is no codec stub left in the media surface.

Decoding reuses the PNG scanline machinery by reassembling each
frame's compressed stream into a standalone PNG and running
``png_decode`` — one codec, two containers.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .images import png_decode

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def apng_encode(frames: list, fps: float = 25.0) -> bytes:
    """list of RGB8 (h, w, 3) arrays (same shape) → APNG bytes."""
    if not frames:
        raise ValueError("apng_encode: need at least one frame")
    h, w, _ = frames[0].shape
    delay_num, delay_den = 1, int(round(fps))

    def raw(px: np.ndarray) -> bytes:
        return np.concatenate(
            [np.zeros((h, 1), dtype=np.uint8), px.reshape(h, w * 3)], axis=1
        ).tobytes()

    out = [_SIG, _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))]
    out.append(_chunk(b"acTL", struct.pack(">II", len(frames), 0)))
    seq = 0
    for i, px in enumerate(frames):
        fctl = struct.pack(
            ">IIIIIHHBB", seq, w, h, 0, 0, delay_num, delay_den, 0, 0
        )
        out.append(_chunk(b"fcTL", fctl))
        seq += 1
        comp = zlib.compress(raw(px), 6)
        if i == 0:
            out.append(_chunk(b"IDAT", comp))
        else:
            out.append(_chunk(b"fdAT", struct.pack(">I", seq) + comp))
            seq += 1
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def is_apng(data: bytes) -> bool:
    """PNG signature + an acTL chunk in the header area."""
    return data[:8] == _SIG and b"acTL" in data[:256]


def apng_count_frames(data: bytes) -> int:
    """Frame count from the acTL chunk (no decompression)."""
    assert data[:8] == _SIG, "not a PNG"
    pos = 8
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"acTL":
            return struct.unpack(">I", data[pos + 8 : pos + 12])[0]
        if tag == b"IDAT":
            break
        pos += 12 + length
    return 1


def apng_decode(data: bytes, indices=None) -> list:
    """APNG bytes → list of RGB8 (h, w, 3) frames (full-frame APNG as
    produced by ``apng_encode``; partial-region frames unsupported).

    ``indices``: decode only these frame positions (the streams are
    independent full frames, so a sampler skips the decompression of
    unsampled frames entirely); returns frames in ``indices`` order."""
    assert data[:8] == _SIG, "not a PNG"
    pos = 8
    ihdr = None
    streams: list = []  # compressed stream per frame, in order
    cur = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            ihdr = body
            w, h, bit_depth, color_type, *_ = struct.unpack(">IIBBBBB", body)
            assert bit_depth == 8 and color_type == 2, "only RGB8 supported"
        elif tag == b"fcTL":
            fw, fh, fx, fy = struct.unpack(">IIII", body[4:20])
            assert (fx, fy, fw, fh) == (0, 0, w, h), "partial-frame APNG unsupported"
            if cur is not None:
                streams.append(cur)
            cur = b""
        elif tag == b"IDAT":
            if cur is None:  # plain PNG default image without fcTL
                cur = b""
            cur += body
        elif tag == b"fdAT":
            cur += body[4:]  # strip the sequence number
        elif tag == b"IEND":
            break
        pos += 12 + length
    if cur is not None:
        streams.append(cur)
    sel = range(len(streams)) if indices is None else indices
    frames = []
    for i in sel:
        # bounds-check against the PARSED stream list, not the acTL
        # header: a truncated / foreign blob whose acTL frame count
        # exceeds its actual fcTL/fdAT streams must produce a
        # descriptive media error, not an executor IndexError (r4).
        if not 0 <= i < len(streams):
            raise ValueError(
                f"apng_decode: frame {i} requested but the container "
                f"holds only {len(streams)} frame stream(s) - acTL "
                "frame count exceeds actual fcTL/fdAT data "
                "(truncated or malformed APNG blob?)"
            )
        comp = streams[i]
        png = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", comp) + _chunk(b"IEND", b"")
        frames.append(png_decode(png))
    return frames
