"""Iterated Snap Rounding noder, vectorized.

Re-derives the semantics of the reference ``SnapNoder``
(reference: ``src/noding/snap.rs:24-173``):

1. snap all endpoints to the grid (``snap.rs:36-39,109-115``),
   drop exactly-degenerate segments (``snap.rs:42``);
2. up to ``max_iter=10`` rounds (``snap.rs:31,45``): find all pairwise
   intersections (bbox candidate filter + exact test), record snapped
   split points that are not already segment endpoints
   (``snap.rs:140-168``); split segments at those points ordered by
   squared distance from the segment start (``snap.rs:62-79``);
   normalize segment direction and dedup exact duplicates
   (``snap.rs:88-101``); stop when a round produces no splits.

The candidate-pair search replaces the reference's R-tree self-join
with a uniform-grid binning self-join — the same bbox-overlap
candidates, but expressible as pure numpy (and, at the cluster level,
as a cell-key equi-join; see operators/tiling.py).
"""

from __future__ import annotations

import numpy as np

from .intersect import COLLINEAR_OVERLAP, SINGLE_POINT, segment_intersections

MAX_ITER = 10  # reference src/noding/snap.rs:31


def snap(a: np.ndarray, grid: float) -> np.ndarray:
    """Grid snap: (a / g).round() * g (reference snap.rs:109-115).

    ``+ 0.0`` normalizes -0.0 to +0.0 so later exact-equality dedup
    behaves like the reference's f64 ``==`` (where -0.0 == 0.0).
    """
    a = np.asarray(a, dtype=np.float64)
    if grid == 0.0:
        return a + 0.0
    return np.round(a / grid) * grid + 0.0


def _candidate_pairs(x1, y1, x2, y2, max_pairs_per_cell: int = 1_000_000):
    """Grid-binned bbox self-join → unique candidate pairs (i < j).

    Each segment is registered in every grid cell its bbox covers;
    every two segments sharing a cell become a candidate, then exact
    bbox overlap is enforced. Cell size adapts so the average segment
    covers few cells.
    """
    n = x1.shape[0]
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    bx1 = np.minimum(x1, x2)
    bx2 = np.maximum(x1, x2)
    by1 = np.minimum(y1, y2)
    by2 = np.maximum(y1, y2)

    gx1, gx2 = bx1.min(), bx2.max()
    gy1, gy2 = by1.min(), by2.max()
    span = max(gx2 - gx1, gy2 - gy1, 1e-300)
    # heuristic cell size: ~sqrt(n) cells per axis, but not smaller than
    # the median bbox extent (keeps cells-per-segment bounded)
    ext = np.maximum(bx2 - bx1, by2 - by1)
    med = float(np.median(ext)) if n else 0.0
    cell = max(span / max(int(np.sqrt(n)), 1), med, span * 1e-9)

    ci1 = np.floor((bx1 - gx1) / cell).astype(np.int64)
    ci2 = np.floor((bx2 - gx1) / cell).astype(np.int64)
    cj1 = np.floor((by1 - gy1) / cell).astype(np.int64)
    cj2 = np.floor((by2 - gy1) / cell).astype(np.int64)

    ncells_x = (ci2 - ci1 + 1)
    ncells = ncells_x * (cj2 - cj1 + 1)
    seg_idx = np.repeat(np.arange(n, dtype=np.int64), ncells)
    # enumerate covered cells per segment
    offs = np.concatenate(([0], np.cumsum(ncells)))
    k = np.arange(offs[-1], dtype=np.int64) - np.repeat(offs[:-1], ncells)
    di = k % np.repeat(ncells_x, ncells)
    dj = k // np.repeat(ncells_x, ncells)
    cell_i = np.repeat(ci1, ncells) + di
    cell_j = np.repeat(cj1, ncells) + dj
    ncols = int(np.floor((gx2 - gx1) / cell)) + 2
    cell_key = cell_j * ncols + cell_i

    order = np.lexsort((seg_idx, cell_key))
    ck = cell_key[order]
    si = seg_idx[order]
    # group boundaries per cell
    starts = np.flatnonzero(np.concatenate(([True], ck[1:] != ck[:-1])))
    counts = np.diff(np.concatenate((starts, [ck.size])))
    # all pairs within each cell, vectorized; cells whose pair count
    # exceeds max_pairs_per_cell (degenerate: thousands of segments
    # sharing one bin) are excluded here and enumerated in bounded
    # chunks below, so peak memory stays O(max_pairs_per_cell) instead
    # of O(c²) for an adversarial hot cell
    npairs_all = counts * (counts - 1) // 2
    big = npairs_all > max_pairs_per_cell
    npairs = np.where(big, 0, npairs_all)
    keys = [np.empty(0, np.int64)]
    total = int(npairs.sum())
    if total > 0:
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(npairs)[:-1])), npairs
        )
        c = np.repeat(counts, npairs).astype(np.int64)
        # map linear pair index -> (a, b) with a < b inside the group
        a = (c - 2 - np.floor(np.sqrt(-8.0 * within + 4.0 * c * (c - 1) - 7) / 2.0 - 0.5)).astype(np.int64)
        b = (within + a + 1 - c * (c - 1) // 2 + (c - a) * ((c - a) - 1) // 2).astype(np.int64)
        base = np.repeat(starts, npairs)
        ii = si[base + a]
        jj = si[base + b]
        keys.append(np.minimum(ii, jj) * np.int64(n) + np.maximum(ii, jj))
    for g in np.flatnonzero(big):
        mem = si[starts[g] : starts[g] + counts[g]]
        c_g = int(mem.size)
        blk = max(int(max_pairs_per_cell // c_g), 1)
        for s0 in range(0, c_g - 1, blk):
            A = mem[s0 : s0 + blk]
            B = mem[s0:]
            # pair (A[r], B[k]) valid iff k > r (A is the slice head)
            rel = (np.arange(B.size)[None, :] > np.arange(A.size)[:, None]).ravel()
            aa = np.repeat(A, B.size)[rel]
            bb = np.tile(B, A.size)[rel]
            lo2 = np.minimum(aa, bb)
            hi2 = np.maximum(aa, bb)
            # bbox filter applied per chunk so only surviving pairs
            # accumulate
            k2 = (
                (bx1[lo2] <= bx2[hi2])
                & (bx1[hi2] <= bx2[lo2])
                & (by1[lo2] <= by2[hi2])
                & (by1[hi2] <= by2[lo2])
            )
            keys.append(lo2[k2] * np.int64(n) + hi2[k2])
    uniq = np.unique(np.concatenate(keys))
    if uniq.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    i = uniq // n
    j = uniq % n
    # exact bbox overlap filter (inclusive, like the R-tree envelopes)
    keep = (bx1[i] <= bx2[j]) & (bx1[j] <= bx2[i]) & (by1[i] <= by2[j]) & (by1[j] <= by2[i])
    return i[keep], j[keep]


def find_splits(x1, y1, x2, y2, grid: float):
    """One noding round: all snapped split points per segment.

    Returns (seg_idx, px, py) arrays — a split point ``(px, py)`` to be
    inserted into segment ``seg_idx``. Mirrors reference
    ``snap.rs:117-173``: SinglePoint → one snapped point per side that
    isn't already that side's endpoint; Collinear → both snapped
    overlap endpoints, same endpoint-exclusion rule.
    """
    i, j = _candidate_pairs(x1, y1, x2, y2)
    if i.size == 0:
        return (np.empty(0, np.int64), np.empty(0, np.float64), np.empty(0, np.float64))

    # endpoint-touch fast path: when the bbox overlap degenerates to a
    # single point P and P is an endpoint of BOTH segments, the only
    # possible intersection is P itself, which can never be a split
    # point (snap.rs:146-151 excludes endpoints) — drop the pair before
    # the exact predicates. This removes the bulk of the pairs in
    # later ISR rounds (adjacent pieces of already-noded chains).
    ox1 = np.maximum(np.minimum(x1[i], x2[i]), np.minimum(x1[j], x2[j]))
    ox2 = np.minimum(np.maximum(x1[i], x2[i]), np.maximum(x1[j], x2[j]))
    oy1 = np.maximum(np.minimum(y1[i], y2[i]), np.minimum(y1[j], y2[j]))
    oy2 = np.minimum(np.maximum(y1[i], y2[i]), np.maximum(y1[j], y2[j]))
    point_overlap = (ox1 == ox2) & (oy1 == oy2)
    is_ep = lambda s, px, py: ((x1[s] == px) & (y1[s] == py)) | ((x2[s] == px) & (y2[s] == py))
    skip = point_overlap & is_ep(i, ox1, oy1) & is_ep(j, ox1, oy1)
    if np.any(skip):
        i, j = i[~skip], j[~skip]
    if i.size == 0:
        return (np.empty(0, np.int64), np.empty(0, np.float64), np.empty(0, np.float64))

    kind, ax, ay, bx, by = segment_intersections(
        x1[i], y1[i], x2[i], y2[i], x1[j], y1[j], x2[j], y2[j]
    )

    out_seg: list[np.ndarray] = []
    out_px: list[np.ndarray] = []
    out_py: list[np.ndarray] = []

    def emit(pair_mask, px, py):
        """Register snapped point (px,py) against both segments of each
        pair where it doesn't coincide with that segment's endpoints."""
        if not np.any(pair_mask):
            return
        pi = i[pair_mask]
        pj = j[pair_mask]
        sx = snap(px[pair_mask], grid)
        sy = snap(py[pair_mask], grid)
        for side in (pi, pj):
            not_endpoint = ~(
                ((sx == x1[side]) & (sy == y1[side])) | ((sx == x2[side]) & (sy == y2[side]))
            )
            out_seg.append(side[not_endpoint])
            out_px.append(sx[not_endpoint])
            out_py.append(sy[not_endpoint])

    emit(kind == SINGLE_POINT, ax, ay)
    coll = kind == COLLINEAR_OVERLAP
    emit(coll, ax, ay)
    emit(coll, bx, by)

    if not out_seg:
        return (np.empty(0, np.int64), np.empty(0, np.float64), np.empty(0, np.float64))
    return np.concatenate(out_seg), np.concatenate(out_px), np.concatenate(out_py)


def _apply_splits(x1, y1, x2, y2, seg_idx, px, py):
    """Split segments at recorded points (reference snap.rs:54-83).

    Points per segment are ordered by squared distance from the
    segment start, consecutive exact duplicates dropped, then windows
    of 2 become the new sub-segments. Unsplit segments pass through.
    """
    n = x1.shape[0]
    has_split = np.zeros(n, dtype=bool)
    has_split[seg_idx] = True

    # untouched segments pass through unchanged
    keep = ~has_split
    kx1, ky1, kx2, ky2 = x1[keep], y1[keep], x2[keep], y2[keep]

    split_ids = np.flatnonzero(has_split)
    if split_ids.size == 0:
        return kx1, ky1, kx2, ky2

    # per split segment: its split points + both endpoints
    all_seg = np.concatenate([seg_idx, split_ids, split_ids])
    all_px = np.concatenate([px, x1[split_ids], x2[split_ids]])
    all_py = np.concatenate([py, y1[split_ids], y2[split_ids]])
    d2 = (all_px - x1[all_seg]) ** 2 + (all_py - y1[all_seg]) ** 2
    order = np.lexsort((d2, all_seg))
    s = all_seg[order]
    ox = all_px[order]
    oy = all_py[order]
    # drop consecutive exact duplicates within a segment (Vec::dedup)
    first = np.concatenate(([True], (s[1:] != s[:-1]) | (ox[1:] != ox[:-1]) | (oy[1:] != oy[:-1])))
    s, ox, oy = s[first], ox[first], oy[first]
    # windows of 2 within each segment group
    pair = s[1:] == s[:-1]
    nx1 = ox[:-1][pair]
    ny1 = oy[:-1][pair]
    nx2 = ox[1:][pair]
    ny2 = oy[1:][pair]
    nz = ~((nx1 == nx2) & (ny1 == ny2))
    return (
        np.concatenate([kx1, nx1[nz]]),
        np.concatenate([ky1, ny1[nz]]),
        np.concatenate([kx2, nx2[nz]]),
        np.concatenate([ky2, ny2[nz]]),
    )


def _normalize_dedup(x1, y1, x2, y2):
    """Orient each segment start<=end and drop exact duplicates
    (reference snap.rs:88-101, including the 1e-12 x-tie quirk)."""
    swap = (x1 > x2) | ((np.abs(x1 - x2) < 1e-12) & (y1 > y2))
    nx1 = np.where(swap, x2, x1)
    ny1 = np.where(swap, y2, y1)
    nx2 = np.where(swap, x1, x2)
    ny2 = np.where(swap, y1, y2)
    order = np.lexsort((ny2, nx2, ny1, nx1))
    nx1, ny1, nx2, ny2 = nx1[order], ny1[order], nx2[order], ny2[order]
    if nx1.size:
        first = np.concatenate(
            (
                [True],
                (nx1[1:] != nx1[:-1])
                | (ny1[1:] != ny1[:-1])
                | (nx2[1:] != nx2[:-1])
                | (ny2[1:] != ny2[:-1]),
            )
        )
        nx1, ny1, nx2, ny2 = nx1[first], ny1[first], nx2[first], ny2[first]
    return nx1, ny1, nx2, ny2


def node_segments(x1, y1, x2, y2, grid: float, max_iter: int = MAX_ITER):
    """Full iterated-snap-rounding noder (reference snap.rs:34-107).

    Input/output: flat segment coordinate arrays.
    """
    x1 = snap(np.asarray(x1, np.float64), grid)
    y1 = snap(np.asarray(y1, np.float64), grid)
    x2 = snap(np.asarray(x2, np.float64), grid)
    y2 = snap(np.asarray(y2, np.float64), grid)
    keep = ~((x1 == x2) & (y1 == y2))
    x1, y1, x2, y2 = x1[keep], y1[keep], x2[keep], y2[keep]

    # Unconditional up-front normalize+dedup. The reference only dedups
    # inside the split loop (snap.rs:88-101), so duplicate segments
    # survive when the first round finds no splits — which contradicts
    # its own touching-squares test (integration_tests.rs:60-71: two
    # squares sharing an edge must yield 2×2500) and golden
    # (touching_polys.geojson: 3 features). Deduping up front matches
    # the intended (and GEOS) semantics.
    x1, y1, x2, y2 = _normalize_dedup(x1, y1, x2, y2)

    for _ in range(max_iter):
        seg_idx, px, py = find_splits(x1, y1, x2, y2, grid)
        if seg_idx.size == 0:
            break
        x1, y1, x2, y2 = _apply_splits(x1, y1, x2, y2, seg_idx, px, py)
        x1, y1, x2, y2 = _normalize_dedup(x1, y1, x2, y2)
    return x1, y1, x2, y2
