"""Cell-key column expressions — the engine's H3/S2-style spatial
index, entirely JVM-side (shift/mask column arithmetic compiles into
whole-stage codegen; no Python in the hot path).

The Morton construction mirrors the reference's ``z_order_index`` bit
interleave (reference src/utils/mod.rs:11-37) but over explicit grid
cell indices (resolution = cell_size), which is what the distributed
spatial join keys on.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def part1by1_col(c: Column) -> Column:
    """Spread the low 32 bits into even positions (column expr)."""
    c = c.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _MASKS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def morton_cell_col(
    x: Column, y: Column, x0: float, y0: float, cell_size: float, bits: int = 20
) -> Column:
    """Morton cell id of point columns (x, y): quantize to the grid
    anchored at (x0, y0), clamp to ``bits`` per axis, interleave."""
    n = (1 << bits) - 1
    ix = F.greatest(F.least(F.floor((x - F.lit(x0)) / F.lit(cell_size)), F.lit(n)), F.lit(0))
    iy = F.greatest(F.least(F.floor((y - F.lit(y0)) / F.lit(cell_size)), F.lit(n)), F.lit(0))
    return part1by1_col(ix).bitwiseOR(F.shiftleft(part1by1_col(iy), 1)).alias("cell")


def cell_range_cols(lo: Column, origin: float, cell_size: float, n_cells: int):
    """floor-index of a coordinate on the cell grid, clamped."""
    return F.greatest(
        F.least(F.floor((lo - F.lit(origin)) / F.lit(cell_size)), F.lit(n_cells - 1)), F.lit(0)
    ).cast("int")
