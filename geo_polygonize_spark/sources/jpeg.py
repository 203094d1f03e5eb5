"""Baseline JFIF/JPEG codec — pure numpy + stdlib, no external libs.

A real DCT codec (not a stand-in): 8×8 forward/inverse DCT-II,
ITU-T T.81 Annex-K quantization tables with libjpeg-style quality
scaling, zigzag scan, differential DC, and the Annex-K baseline
Huffman tables, emitted as a standards-shaped JFIF stream
(SOI / APP0 / DQT / SOF0 / DHT / SOS / entropy-coded data with byte
stuffing / EOI). Components are 4:4:4 (no chroma subsampling) —
valid baseline JFIF, and the simplest MCU geometry.

The reference has no payload surface (this is north_rule territory);
the codec exists so the multimodal operators' lossy path is real
end-to-end: encode → bytes on a binary column → decode in a batched
UDF → PSNR/feature invariants. The decoder reads what the encoder
writes (full baseline 4:4:4); it is not a general-purpose JPEG
reader (no progressive, no restart markers, no subsampling).
"""

from __future__ import annotations

import struct

import numpy as np

# ---- ITU-T T.81 Annex K quantization tables (natural order) ----------

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# zigzag: _ZIG[k] = flat index (row*8+col) of the k-th zigzag element
_ZIG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ---- Annex K baseline Huffman tables: (BITS[1..16], HUFFVAL) ---------

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits: list, vals: list) -> dict:
    """Canonical Huffman (T.81 C.2): symbol → (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits: list, vals: list) -> dict:
    """(length, code) → symbol, for incremental bit-by-bit decode."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_DC = (_huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS), _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
_ENC_AC = (_huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS), _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))
_DEC_DC = (_huff_decoder(_DC_LUMA_BITS, _DC_LUMA_VALS), _huff_decoder(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
_DEC_AC = (_huff_decoder(_AC_LUMA_BITS, _AC_LUMA_VALS), _huff_decoder(_AC_CHROMA_BITS, _AC_CHROMA_VALS))

# DCT-II basis matrix: X = C @ block @ C.T ; block = C.T @ X @ C
_C = np.zeros((8, 8))
for _u in range(8):
    cu = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _C[_u, _x] = 0.5 * cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _quality_tables(quality: int):
    """libjpeg-style quality scaling of the Annex-K tables."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_Q_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((_Q_CHROMA * scale + 50) // 100, 1, 255)
    return ql.astype(np.int64), qc.astype(np.int64)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.float64)
    y = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
    cb = -0.168736 * p[..., 0] - 0.331264 * p[..., 1] + 0.5 * p[..., 2] + 128.0
    cr = 0.5 * p[..., 0] - 0.418688 * p[..., 1] - 0.081312 * p[..., 2] + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 B.1.1.5)
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _magnitude(v: int):
    """JPEG magnitude coding: (size, amplitude bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(w: _BitWriter, coef: np.ndarray, prev_dc: int, tbl: int) -> int:
    """One quantized 8×8 block (natural order) → entropy stream."""
    zz = coef.ravel()[_ZIG]
    dc = int(zz[0])
    size, bits = _magnitude(dc - prev_dc)
    code, length = _ENC_DC[tbl][size]
    w.write(code, length)
    w.write(bits, size)
    run = 0
    nz = np.flatnonzero(zz[1:]) + 1
    last = int(nz[-1]) if nz.size else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _ENC_AC[tbl][0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = _ENC_AC[tbl][(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if last < 63:
        code, length = _ENC_AC[tbl][0x00]  # EOB
        w.write(code, length)
    return dc


def jpeg_encode(px: np.ndarray, quality: int = 90) -> bytes:
    """RGB8 (h, w, 3) → baseline JFIF bytes (4:4:4)."""
    h, w = px.shape[:2]
    ql, qc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(px)
    # pad to multiples of 8 by edge replication
    ph, pw = -h % 8, -w % 8
    ycc = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge")
    hh, ww = ycc.shape[:2]

    bw = _BitWriter()
    prev = [0, 0, 0]
    for by in range(0, hh, 8):
        for bx in range(0, ww, 8):
            for comp in range(3):
                block = ycc[by : by + 8, bx : bx + 8, comp] - 128.0
                coef = _C @ block @ _C.T
                q = ql if comp == 0 else qc
                qcoef = np.round(coef / q).astype(np.int64)
                prev[comp] = _encode_block(
                    bw, qcoef, prev[comp], 0 if comp == 0 else 1
                )
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(v) for v in table.ravel()[_ZIG]))

    def dht(cls: int, tid: int, bits: list, vals: list) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, ql)
        + dqt(1, qc)
        + sof
        + dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
        + dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        + dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
        + sos
        + entropy
        + b"\xff\xd9"
    )


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # unstuff
            # else: a marker — baseline 4:4:4 w/o restarts never hits
            # one mid-scan before EOI; reading past is a caller error
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_symbol(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF (as produced by ``jpeg_encode``) → RGB8."""
    assert data[:2] == b"\xff\xd8", "not a JPEG"
    pos = 2
    qtabs = {}
    dec_dc = {}
    dec_ac = {}
    h = w = None
    comp_q = {}
    comp_tabs = {}
    scan_start = None
    while pos < len(data):
        marker, = struct.unpack(">H", data[pos : pos + 2])
        if marker == 0xFFD9:
            break
        length, = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            bpos = 0
            while bpos < len(body):
                tid = body[bpos] & 0x0F
                tab = np.zeros(64, np.int64)
                tab[_ZIG] = np.frombuffer(body[bpos + 1 : bpos + 65], np.uint8)
                qtabs[tid] = tab.reshape(8, 8)
                bpos += 65
        elif marker == 0xFFC0:
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            assert nc == 3, "only 3-component baseline supported"
            for c in range(nc):
                cid, _samp, qid = body[6 + 3 * c : 9 + 3 * c]
                comp_q[cid] = qid
        elif marker == 0xFFC4:
            bpos = 0
            while bpos < len(body):
                cls = body[bpos] >> 4
                tid = body[bpos] & 0x0F
                bits = list(body[bpos + 1 : bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + nv])
                (dec_ac if cls else dec_dc)[tid] = _huff_decoder(bits, vals)
                bpos += 17 + nv
        elif marker == 0xFFDA:
            ns = body[0]
            for c in range(ns):
                cid = body[1 + 2 * c]
                tt = body[2 + 2 * c]
                comp_tabs[cid] = (tt >> 4, tt & 0x0F)
            scan_start = pos + 2 + length
            break
        pos += 2 + length
    assert scan_start is not None and h is not None

    r = _BitReader(data[scan_start:])
    hh = (h + 7) // 8 * 8
    ww = (w + 7) // 8 * 8
    ycc = np.zeros((hh, ww, 3), np.float64)
    prev = [0, 0, 0]
    cids = [1, 2, 3]
    for by in range(0, hh, 8):
        for bx in range(0, ww, 8):
            for comp, cid in enumerate(cids):
                dct, act = comp_tabs[cid]
                zz = np.zeros(64, np.int64)
                size = _decode_symbol(r, dec_dc[dct])
                diff = _extend(r.read_bits(size), size)
                prev[comp] += diff
                zz[0] = prev[comp]
                k = 1
                while k < 64:
                    rs = _decode_symbol(r, dec_ac[act])
                    run, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if run == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += run
                    zz[k] = _extend(r.read_bits(size), size)
                    k += 1
                coef = np.zeros(64, np.float64)
                coef[_ZIG] = zz
                q = qtabs[comp_q[cid]]
                block = _C.T @ (coef.reshape(8, 8) * q) @ _C
                ycc[by : by + 8, bx : bx + 8, comp] = block + 128.0
    return _ycbcr_to_rgb(ycc[:h, :w])
