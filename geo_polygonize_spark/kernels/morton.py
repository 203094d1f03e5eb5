"""Z-order (Morton) keys, vectorized over numpy arrays.

Semantics follow the reference's ``z_order_index`` (reference:
``src/utils/mod.rs:11-37``): map each f64 to a sort-order-preserving
unsigned integer, interleave bits x/y (x in even positions, y in odd).
The reference interleaves the *low* 32 bits of the 64-bit sortable
representation — good enough as a deterministic sort key for node
dedup. For spatial *cell ids* (used by the distributed tiling /
spatial-join layer, which the reference does not have) we instead
quantize coordinates onto an explicit grid and interleave the cell
indices, which gives true spatial locality at any resolution.
"""

from __future__ import annotations

import numpy as np

_MASKS = (
    np.uint64(0x0000FFFF0000FFFF),
    np.uint64(0x00FF00FF00FF00FF),
    np.uint64(0x0F0F0F0F0F0F0F0F),
    np.uint64(0x3333333333333333),
    np.uint64(0x5555555555555555),
)
_LOW32 = np.uint64(0x00000000FFFFFFFF)
_SIGN = np.uint64(0x8000000000000000)


def part1by1(n: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 into the even bit positions.

    Mirrors reference ``src/utils/mod.rs:29-37``.
    """
    n = n.astype(np.uint64, copy=True) & _LOW32
    n = (n | (n << np.uint64(16))) & _MASKS[0]
    n = (n | (n << np.uint64(8))) & _MASKS[1]
    n = (n | (n << np.uint64(4))) & _MASKS[2]
    n = (n | (n << np.uint64(2))) & _MASKS[3]
    n = (n | (n << np.uint64(1))) & _MASKS[4]
    return n


def sortable_float_bits(a: np.ndarray) -> np.ndarray:
    """Map f64 to uint64 preserving numeric order (reference ``mod.rs:18-25``)."""
    bits = np.ascontiguousarray(a, dtype=np.float64).view(np.uint64)
    neg = (bits & _SIGN) != 0
    return np.where(neg, ~bits, bits ^ _SIGN)


def z_order_index(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Reference-parity Morton key of raw f64 coords (``mod.rs:11-15``).

    Used only as a deterministic locality-ish sort key; dedup still
    compares exact coordinates.
    """
    xb = sortable_float_bits(x)
    yb = sortable_float_bits(y)
    return part1by1(xb) | (part1by1(yb) << np.uint64(1))


def cell_morton(
    x: np.ndarray,
    y: np.ndarray,
    x0: float,
    y0: float,
    cell_size: float,
    bits: int = 20,
) -> np.ndarray:
    """True spatial Morton cell id: quantize onto a grid anchored at
    (x0, y0) with ``cell_size``, clamp to ``bits`` bits per axis, then
    interleave. This is the engine's H3/S2-style cell key for the
    spatial-join layer (no analog in the reference; the reference's
    tile grid ``src/tiling.rs:42-58`` plays this role at fixed depth).
    """
    n = np.int64(1) << np.int64(bits)
    ix = np.clip(np.floor((np.asarray(x, dtype=np.float64) - x0) / cell_size), 0, n - 1).astype(np.uint64)
    iy = np.clip(np.floor((np.asarray(y, dtype=np.float64) - y0) / cell_size), 0, n - 1).astype(np.uint64)
    return (part1by1(ix) | (part1by1(iy) << np.uint64(1))).astype(np.int64)
