"""Ring geometry + shell/hole logic, vectorized.

Reproduces the reference's post-tracing stages
(reference: ``src/polygonizer.rs:124-261`` and ``src/utils/simd.rs``):

* shoelace signed area; |area| < 1e-9 rings dropped
  (polygonizer.rs:131-149)
* CCW → shell, CW → hole classification (polygonizer.rs:142-148)
* hole promotion: a CW ring with no CCW twin of ~equal area (1e-6)
  and *exactly* equal bbox becomes a shell, re-wound CCW
  (polygonizer.rs:152-185)
* hole assignment: candidate shells by bbox intersection, even-odd
  ray-cast PIP on the hole's centroid, parent = smallest shell with
  area > hole_area + 1e-6 (polygonizer.rs:192-249)
* assembly: polygon net area (shell - holes) must exceed 1e-6
  (polygonizer.rs:251-259)
* ``point_in_ring`` is the numpy-broadcast analog of the SIMD ray
  cast (simd.rs:31-79) — identical even-odd crossing condition.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def signed_area(xs: np.ndarray, ys: np.ndarray) -> float:
    """Shoelace signed area of a closed ring (first == last).
    Positive = CCW (matches geo::Area used at polygonizer.rs:136).

    The ring is recentred on its first vertex before the shoelace —
    translation-invariant, and avoids the catastrophic cancellation a
    naive x·y shoelace hits far from the origin (found by probing a
    unit square at offset 1e9, where the naive sum returns 0.0).
    """
    x = np.asarray(xs, dtype=np.float64) - xs[0]
    y = np.asarray(ys, dtype=np.float64) - ys[0]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def centroid(xs: np.ndarray, ys: np.ndarray):
    """Polygon (area-weighted) centroid of a closed ring; falls back
    to the first vertex when degenerate (polygonizer.rs:211-214).
    Computed in a first-vertex-local frame (see signed_area)."""
    x0 = float(xs[0])
    y0 = float(ys[0])
    x = np.asarray(xs, dtype=np.float64) - x0
    y = np.asarray(ys, dtype=np.float64) - y0
    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
    a = 0.5 * float(np.sum(cross))
    if abs(a) < 1e-300:
        return x0, y0
    cx = float(np.sum((x[:-1] + x[1:]) * cross)) / (6.0 * a)
    cy = float(np.sum((y[:-1] + y[1:]) * cross)) / (6.0 * a)
    return cx + x0, cy + y0


def polygon_centroid(shell_xs, shell_ys, holes=()):
    """Area-weighted centroid of a polygon with holes (the probe the
    reference takes from geo's Centroid for tile ownership,
    src/tiling.rs:89-91). Falls back to the shell centroid when the
    net area degenerates to ~0 (reference skips such polys; keeping
    the shell centroid keeps ownership exactly-once instead)."""
    a0 = abs(signed_area(shell_xs, shell_ys))
    cx0, cy0 = centroid(shell_xs, shell_ys)
    num_x = a0 * cx0
    num_y = a0 * cy0
    den = a0
    for hxs, hys in holes:
        ah = abs(signed_area(hxs, hys))
        chx, chy = centroid(hxs, hys)
        num_x -= ah * chx
        num_y -= ah * chy
        den -= ah
    if abs(den) < 1e-12:
        return cx0, cy0
    return num_x / den, num_y / den


def bbox(xs: np.ndarray, ys: np.ndarray):
    return float(np.min(xs)), float(np.min(ys)), float(np.max(xs)), float(np.max(ys))


def point_in_ring(px: float, py: float, xs: np.ndarray, ys: np.ndarray) -> bool:
    """Even-odd ray cast, numpy-broadcast over all ring segments at
    once — the vectorized analog of SimdRing::contains (simd.rs:31-79),
    with the identical crossing condition:
      (y1 > py) != (y2 > py)  and  px < (x2-x1)(py-y1)/(y2-y1) + x1
    """
    x1 = xs[:-1]
    y1 = ys[:-1]
    x2 = xs[1:]
    y2 = ys[1:]
    straddle = (y1 > py) != (y2 > py)
    if not np.any(straddle):
        return False
    x1s = x1[straddle]
    y1s = y1[straddle]
    x2s = x2[straddle]
    y2s = y2[straddle]
    xint = (x2s - x1s) * (py - y1s) / (y2s - y1s) + x1s
    return bool(np.count_nonzero(px < xint) % 2)


def points_in_ring(px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Batched many-points × one-ring even-odd ray cast (same crossing
    rule as ``point_in_ring``), used by the image PIP join."""
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x1 = xs[None, :-1]
    y1 = ys[None, :-1]
    x2 = xs[None, 1:]
    y2 = ys[None, 1:]
    straddle = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    crossings = np.count_nonzero(straddle & (px < xint), axis=1)
    return (crossings % 2).astype(bool)


@dataclass
class Polygon:
    shell_xs: np.ndarray
    shell_ys: np.ndarray
    holes: list = field(default_factory=list)  # list of (xs, ys)
    area: float = 0.0  # net unsigned area (shell - holes)


def assemble_polygons(
    ring_xs: list, ring_ys: list, drop_collapsed: bool = False
) -> list[Polygon]:
    """Classification → promotion → hole assignment → assembly
    (polygonizer.rs:124-261). Input: closed rings from ring tracing.

    ``drop_collapsed`` — the reference source carries a final
    ``unsigned_area() > 1e-6`` filter (polygonizer.rs:255-258) that
    drops shells completely filled by their holes (e.g. the outer hull
    of a bowtie / grid). The reference's own artifacts disagree about
    it: the robustness bowtie test (tests/robustness.rs:29) asserts the
    filtered behavior (2 polys), while the committed goldens
    (examples/output/complex_bowtie.geojson: 3 features,
    touching_polys.geojson: 3) and the frame test
    (src/polygonizer_tests.rs:79: 5 polys incl. a net-area-0 frame) and
    overlapping_circles (= 8 incl. hull) require the UNfiltered
    behavior. Both cannot hold at once, so the filter is a flag:
    default False matches the goldens + frame + circles; True matches
    the shipped filter and GEOS's faces-only polygon counts (used for
    the grid/random benchmark oracles).
    """
    shells: list[tuple[np.ndarray, np.ndarray]] = []
    holes: list[tuple[np.ndarray, np.ndarray]] = []
    for xs, ys in zip(ring_xs, ring_ys):
        a = signed_area(xs, ys)
        if abs(a) < 1e-9:
            continue  # degenerate (polygonizer.rs:138-140)
        if a > 0.0:
            shells.append((xs, ys))
        else:
            holes.append((xs, ys))

    # --- hole promotion (polygonizer.rs:152-185) ----------------------
    # CW ring with no CCW twin (area within 1e-6 AND exactly equal
    # bbox) becomes a shell, re-wound CCW. Group shells by exact bbox
    # for O(1) twin lookup.
    shell_area = [abs(signed_area(xs, ys)) for xs, ys in shells]
    by_bbox: dict = {}
    for i, (xs, ys) in enumerate(shells):
        by_bbox.setdefault(bbox(xs, ys), []).append(i)
    for xs, ys in holes:
        ha = abs(signed_area(xs, ys))
        twins = by_bbox.get(bbox(xs, ys), ())
        if not any(abs(shell_area[i] - ha) < 1e-6 for i in twins):
            shells.append((xs[::-1].copy(), ys[::-1].copy()))  # re-wind CCW
            shell_area.append(ha)

    n_shells = len(shells)
    if n_shells == 0:
        return []

    sbx1 = np.array([np.min(xs) for xs, _ in shells])
    sby1 = np.array([np.min(ys) for _, ys in shells])
    sbx2 = np.array([np.max(xs) for xs, _ in shells])
    sby2 = np.array([np.max(ys) for _, ys in shells])
    s_area = np.asarray(shell_area)

    # --- hole assignment (polygonizer.rs:192-249) ---------------------
    shell_holes: list[list] = [[] for _ in range(n_shells)]
    for xs, ys in holes:
        hx1, hy1, hx2, hy2 = bbox(xs, ys)
        cand = np.flatnonzero(
            (sbx1 <= hx2) & (hx1 <= sbx2) & (sby1 <= hy2) & (hy1 <= sby2)
        )
        if cand.size == 0:
            continue
        px, py = centroid(xs, ys)
        ha = abs(signed_area(xs, ys))
        best = -1
        best_area = np.inf
        for i in cand:
            if s_area[i] > ha + 1e-6 and s_area[i] < best_area:
                if point_in_ring(px, py, shells[i][0], shells[i][1]):
                    best = int(i)
                    best_area = float(s_area[i])
        if best >= 0:
            shell_holes[best].append((xs, ys))

    # --- assembly (polygonizer.rs:251-259) ----------------------------
    out: list[Polygon] = []
    for i, (xs, ys) in enumerate(shells):
        net = s_area[i] - sum(abs(signed_area(hx, hy)) for hx, hy in shell_holes[i])
        if drop_collapsed and net <= 1e-6:
            continue
        out.append(Polygon(xs, ys, shell_holes[i], float(net)))
    return out


def canonicalize_ring(xs: np.ndarray, ys: np.ndarray):
    """Rotate a closed ring to start at its lexicographically smallest
    vertex (orientation preserved) — for order-insensitive golden
    comparison (the reference asserts on counts/areas instead;
    FIXTURES.md §1 asks for this canonical form)."""
    x = np.asarray(xs, dtype=np.float64)[:-1]
    y = np.asarray(ys, dtype=np.float64)[:-1]
    k = np.lexsort((y, x))[0]
    rx = np.roll(x, -k)
    ry = np.roll(y, -k)
    return np.concatenate([rx, rx[:1]]), np.concatenate([ry, ry[:1]])
