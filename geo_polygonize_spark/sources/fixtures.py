"""Deterministic linework fixtures — the reference test suite's inputs
re-expressed as data (FIXTURES.md §2-3; reference test files cited per
fixture). Each fixture returns (lines_xs, lines_ys, node_input) where
lines_* are lists of float64 vertex arrays.
"""

from __future__ import annotations

import numpy as np


def _ls(*pts):
    xs = np.array([p[0] for p in pts], dtype=np.float64)
    ys = np.array([p[1] for p in pts], dtype=np.float64)
    return xs, ys


def circle(cx: float, cy: float, r: float, points: int):
    """Closed circle approximation — reference
    tests/integration_tests.rs:115-126: angle_i = i * 2π/(points-1),
    i in 0..points (first ≈ last)."""
    i = np.arange(points, dtype=np.float64)
    ang = i * (2.0 * np.pi / (points - 1))
    return cx + r * np.cos(ang), cy + r * np.sin(ang)


def grid_lines(n: int):
    """(n+1) horizontals + (n+1) verticals on [0, n]² →
    n² unit cells (reference benches/polygonize_bench.rs:7-22)."""
    xs, ys = [], []
    for k in range(n + 1):
        x, y = _ls((0.0, float(k)), (float(n), float(k)))
        xs.append(x)
        ys.append(y)
        x, y = _ls((float(k), 0.0), (float(k), float(n)))
        xs.append(x)
        ys.append(y)
    return xs, ys


def random_lines(n: int, seed: int = 42):
    """n random segments, endpoints uniform in [0,100]²
    (reference benches/polygonize_bench.rs:24-38; deterministic via
    numpy's seeded generator — poly-count oracle pinned by our own
    verified run, per FIXTURES.md §3 note)."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0.0, 100.0, size=(n, 4))
    xs = [np.array([r[0], r[2]]) for r in pts]
    ys = [np.array([r[1], r[3]]) for r in pts]
    return xs, ys


def fixture(name: str):
    """Return (lines_xs, lines_ys, node_input, snap_grid) by name."""
    snap = 1e-10
    if name == "triangle_open_segments":
        segs = [_ls((0, 0), (10, 0)), _ls((10, 0), (0, 10)), _ls((0, 10), (0, 0))]
        node = False
    elif name == "square_with_inner_square":
        segs = [
            _ls((0, 0), (10, 0), (10, 10), (0, 10), (0, 0)),
            _ls((2, 2), (2, 8), (8, 8), (8, 2), (2, 2)),
        ]
        node = False
    elif name == "frame_with_diagonals":
        segs = [
            _ls((0, 0), (10, 0), (10, 10), (0, 10), (0, 0)),
            _ls((0, 0), (10, 10)),
            _ls((0, 10), (10, 0)),
        ]
        node = True
    elif name == "collinear_overlap":
        segs = [
            _ls((0, 0), (10, 0)),
            _ls((5, 0), (15, 0)),
            _ls((10, 0), (10, 10), (5, 10), (5, 0)),
        ]
        node = True
    elif name == "nested_holes":
        segs = [
            _ls((0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
            _ls((20, 20), (80, 20), (80, 80), (20, 80), (20, 20)),
            _ls((40, 40), (60, 40), (60, 60), (40, 60), (40, 40)),
        ]
        node = False
    elif name == "touching_squares":
        segs = [
            _ls((0, 0), (50, 0), (50, 50), (0, 50), (0, 0)),
            _ls((50, 0), (100, 0), (100, 50), (50, 50), (50, 0)),
        ]
        node = True
    elif name == "square_with_tail_dangle":
        segs = [
            _ls((0, 0), (10, 0), (10, 10), (0, 10), (0, 0)),
            _ls((10, 10), (20, 20)),
        ]
        node = False
    elif name == "bowtie":
        segs = [_ls((0, 0), (10, 10), (0, 10), (10, 0), (0, 0))]
        node = True
    elif name == "bowtie_snap1e6":
        segs = [_ls((0, 0), (10, 10), (10, 0), (0, 10), (0, 0))]
        node = True
        snap = 1e-6
    elif name == "duplicate_edge":
        segs = [
            _ls((0, 0), (10, 0)),
            _ls((0, 0), (10, 0)),
            _ls((10, 0), (5, 5)),
            _ls((5, 5), (0, 0)),
        ]
        node = True
        snap = 1e-6
    elif name == "overlapping_circles":
        segs = [
            circle(30, 30, 30, 100),
            circle(60, 30, 30, 100),
            circle(45, 55, 30, 100),
        ]
        node = True
    elif name == "curved_holes":
        segs = [
            circle(50, 50, 50, 200),
            circle(30, 30, 10, 100),
            circle(70, 30, 10, 100),
            circle(50, 70, 15, 100),
            circle(50, 40, 5, 100),
        ]
        node = True
    elif name == "complex_bowtie":
        segs = [_ls((0, 0), (100, 100), (0, 100), (100, 0), (0, 0))]
        node = True
    elif name == "tiling_grid_2x2":
        # 3 horizontals + 3 verticals spanning (0,0)-(20,20) → 4 cells
        # of 10×10 (reference src/tiling_tests.rs:7-49)
        segs = []
        for k in (0.0, 10.0, 20.0):
            segs.append(_ls((0, k), (20, k)))
            segs.append(_ls((k, 0), (k, 20)))
        node = True
    else:
        raise KeyError(name)
    xs = [s[0] for s in segs]
    ys = [s[1] for s in segs]
    return xs, ys, node, snap


# fixture → (exact_poly_count or None, extra assertions handled in tests)
EXPECTED_COUNT = {
    "square_with_inner_square": 2,
    "frame_with_diagonals": 5,
    "nested_holes": 3,
    "square_with_tail_dangle": 1,
    "bowtie_snap1e6": 2,
    "duplicate_edge": 1,
    "overlapping_circles": 8,
}
