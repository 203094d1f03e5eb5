"""Bipartite bbox-overlap candidate join on a uniform grid — the
numpy analog of the reference's R-tree candidate queries
(``tree.locate_in_envelope_intersecting``, polygonizer.rs:205;
``intersection_candidates_with_other_tree``, snap.rs:127). Bins side A
into covered cells, probes side B's covered cells through a
sort-merge, dedups pairs, then enforces exact bbox overlap.
"""

from __future__ import annotations

import numpy as np


def _covered_cells(x1, y1, x2, y2, gx1, gy1, cell, ncols):
    ci1 = np.floor((x1 - gx1) / cell).astype(np.int64)
    ci2 = np.floor((x2 - gx1) / cell).astype(np.int64)
    cj1 = np.floor((y1 - gy1) / cell).astype(np.int64)
    cj2 = np.floor((y2 - gy1) / cell).astype(np.int64)
    nx = ci2 - ci1 + 1
    ncells = nx * (cj2 - cj1 + 1)
    idx = np.repeat(np.arange(x1.size, dtype=np.int64), ncells)
    offs = np.concatenate(([0], np.cumsum(ncells)))
    k = np.arange(offs[-1], dtype=np.int64) - np.repeat(offs[:-1], ncells)
    di = k % np.repeat(nx, ncells)
    dj = k // np.repeat(nx, ncells)
    key = (np.repeat(cj1, ncells) + dj) * ncols + np.repeat(ci1, ncells) + di
    return key, idx


def bbox_join(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Candidate pairs (i over A, j over B) whose bboxes overlap
    (closed intervals). Returns (i, j) int64 arrays, deduplicated."""
    na = ax1.size
    nb = bx1.size
    if na == 0 or nb == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    gx1 = min(ax1.min(), bx1.min())
    gy1 = min(ay1.min(), by1.min())
    gx2 = max(ax2.max(), bx2.max())
    gy2 = max(ay2.max(), by2.max())
    span = max(gx2 - gx1, gy2 - gy1, 1e-300)
    ext = np.median(np.maximum(ax2 - ax1, ay2 - ay1)) if na else 0.0
    cell = max(span / max(int(np.sqrt(na + nb)), 1), float(ext), span * 1e-9)
    ncols = int(np.floor((gx2 - gx1) / cell)) + 2

    akey, aidx = _covered_cells(ax1, ay1, ax2, ay2, gx1, gy1, cell, ncols)
    bkey, bidx = _covered_cells(bx1, by1, bx2, by2, gx1, gy1, cell, ncols)

    ao = np.argsort(akey, kind="stable")
    akey, aidx = akey[ao], aidx[ao]
    lo = np.searchsorted(akey, bkey, side="left")
    hi = np.searchsorted(akey, bkey, side="right")
    cnt = hi - lo
    total = int(cnt.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    b_rep = np.repeat(np.arange(bkey.size, dtype=np.int64), cnt)
    pos = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt
    ) + np.repeat(lo, cnt)
    i = aidx[pos]
    j = bidx[b_rep]
    uniq = np.unique(i * np.int64(nb) + j)
    i = uniq // nb
    j = uniq % nb
    keep = (ax1[i] <= bx2[j]) & (bx1[j] <= ax2[i]) & (ay1[i] <= by2[j]) & (by1[j] <= ay2[i])
    return i[keep], j[keep]
