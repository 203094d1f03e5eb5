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
    # RELATIVE degeneracy test: for a shell fully filled by its holes
    # the true den is 0 but FP leaves a ~1e-9 residual — dividing by it
    # throws the centroid far outside the polygon (observed: a net-0
    # hull reporting (-15, -46) for data in [0, 50]²)
    if abs(den) < max(a0 * 1e-9, 1e-12):
        return cx0, cy0
    return num_x / den, num_y / den


def bbox(xs: np.ndarray, ys: np.ndarray):
    return float(np.min(xs)), float(np.min(ys)), float(np.max(xs)), float(np.max(ys))


def batch_ring_stats(rxs: list, rys: list):
    """Vectorized per-ring geometry for a BATCH of closed rings
    (first == last): canonical rotation (start at the lexicographically
    smallest vertex — same convention as ``canonicalize_ring``), bbox,
    recentred shoelace area, and area-weighted centroid, all computed
    with ``reduceat`` over flat arrays — no per-ring Python.

    The stitched trace kernel processes every ring of every re-traced
    level through this path; a per-ring loop here anti-scales (5+ numpy
    calls × 10⁵ rings × levels measured as the dominant wall cost).

    Determinism contract: two tiles tracing the same ring (different
    rotation) get BIT-IDENTICAL outputs — rotation is normalized before
    any accumulation, and every accumulation is reduceat (fixed order).

    Returns (xr, yr, off, L, bx1, by1, bx2, by2, area, cx, cy):
    ``xr, yr`` flat rotated OPEN rings, ring i at
    ``xr[off[i] : off[i] + L[i]]``; close it by re-appending its first
    point.
    """
    n = len(rxs)
    if n == 0:
        z = np.empty(0)
        zi = np.empty(0, np.int64)
        return z, z, zi, zi, z, z, z, z, z, z, z
    lens = np.fromiter((len(r) for r in rxs), dtype=np.int64, count=n)
    L = lens - 1  # open lengths
    xc = np.concatenate(rxs)
    yc = np.concatenate(rys)
    occ = np.concatenate(([0], np.cumsum(lens)))
    keep = np.ones(xc.size, dtype=bool)
    keep[occ[1:] - 1] = False  # drop each ring's closing duplicate
    xo = xc[keep]
    yo = yc[keep]
    off = np.concatenate(([0], np.cumsum(L)))
    total = int(off[-1])
    grp = np.repeat(np.arange(n, dtype=np.int64), L)

    # canonical start: per-ring argmin of (x, y)
    order = np.lexsort((yo, xo, grp))
    grp_starts = off[:-1]
    first_sorted = order[grp_starts]  # first element of each group
    k = first_sorted - off[:-1]

    # rotation tie-break: when the minimum vertex occurs MORE THAN ONCE
    # in a ring (pinch/bowtie face boundaries, which planar tracing
    # does produce), the stable lexsort above picks the first
    # occurrence in STORAGE order — which differs between two tiles
    # that traced the same ring from different starts, breaking the
    # bit-identical-output contract. Among tied minimum vertices, pick
    # the occurrence whose full rotated sequence is lexicographically
    # smallest — a storage-order-independent canonical form. Ties are
    # rare (simple rings have none), so the per-ring fixup loop is off
    # the hot path; detection is vectorized.
    minx_r = np.repeat(xo[first_sorted], L)
    miny_r = np.repeat(yo[first_sorted], L)
    tie_cnt = np.add.reduceat((xo == minx_r) & (yo == miny_r), off[:-1])
    for g in np.flatnonzero(tie_cnt > 1):
        o, l = off[g], L[g]
        xs_g, ys_g = xo[o : o + l], yo[o : o + l]
        cands = np.flatnonzero((xs_g == xs_g[k[g] + 0]) & (ys_g == ys_g[k[g]]))
        best = int(cands[0])
        bx_rot = np.roll(xs_g, -best)
        by_rot = np.roll(ys_g, -best)
        for c in cands[1:]:
            cx_rot = np.roll(xs_g, -int(c))
            cy_rot = np.roll(ys_g, -int(c))
            neq = np.flatnonzero((bx_rot != cx_rot) | (by_rot != cy_rot))
            if neq.size and (cx_rot[neq[0]], cy_rot[neq[0]]) < (bx_rot[neq[0]], by_rot[neq[0]]):
                best, bx_rot, by_rot = int(c), cx_rot, cy_rot
        k[g] = best

    # rotation gather: rel = (pos + k) mod L, built without division
    pos = np.arange(total, dtype=np.int64) - np.repeat(off[:-1], L)
    rel = pos + np.repeat(k, L)
    wrap = rel >= np.repeat(L, L)
    rel[wrap] -= np.repeat(L, L)[wrap]
    idx = np.repeat(off[:-1], L) + rel
    xr = xo[idx]
    yr = yo[idx]

    # bbox (rotation-invariant)
    bx1 = np.minimum.reduceat(xo, off[:-1])
    by1 = np.minimum.reduceat(yo, off[:-1])
    bx2 = np.maximum.reduceat(xo, off[:-1])
    by2 = np.maximum.reduceat(yo, off[:-1])

    # recentred shoelace on the ROTATED arrays (translation-invariant,
    # cancellation-safe far from the origin — see signed_area)
    nxt = np.arange(total, dtype=np.int64) + 1
    nxt[off[1:] - 1] = off[:-1]
    fx = np.repeat(xr[off[:-1]], L)
    fy = np.repeat(yr[off[:-1]], L)
    dx = xr - fx
    dy = yr - fy
    cross = dx * dy[nxt] - dx[nxt] * dy
    area = 0.5 * np.add.reduceat(cross, off[:-1])

    sx = np.add.reduceat((dx + dx[nxt]) * cross, off[:-1])
    sy = np.add.reduceat((dy + dy[nxt]) * cross, off[:-1])
    ok = np.abs(area) >= 1e-300
    cx = np.where(ok, sx / np.where(ok, 6.0 * area, 1.0), 0.0) + xr[off[:-1]]
    cy = np.where(ok, sy / np.where(ok, 6.0 * area, 1.0), 0.0) + yr[off[:-1]]
    return xr, yr, off[:-1], L, bx1, by1, bx2, by2, area, cx, cy


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


def _pip_many_vs_ring(px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray):
    """Even-odd containment of MANY probe points vs ONE closed ring,
    via a y-bucketed edge index: a horizontal ray at ``py`` can only
    cross edges whose y-span straddles ``py``, so each probe tests the
    ~E/B edges of its bucket instead of all E. Turns the
    hull-vs-all-holes assignment (the dominant assembly cost on grid
    inputs: 10⁵ probes × 10⁵-vertex hull) from O(P·E) into
    O(E + P·E/B). Identical crossing rule to the dense path."""
    x1, y1 = xs[:-1], ys[:-1]
    x2, y2 = xs[1:], ys[1:]
    e = x1.size
    ymin = np.minimum(y1, y2)
    ymax = np.maximum(y1, y2)
    ylo = float(ymin.min())
    yhi = float(ymax.max())
    nb = max(min(int(e // 16), 1 << 20), 1)
    h = max((yhi - ylo) / nb, 1e-300)
    b1 = np.clip(((ymin - ylo) / h).astype(np.int64), 0, nb - 1)
    b2 = np.clip(((ymax - ylo) / h).astype(np.int64), 0, nb - 1)
    cnt = b2 - b1 + 1
    off = np.concatenate(([0], np.cumsum(cnt)))
    eidx = np.repeat(np.arange(e, dtype=np.int64), cnt)
    rel = np.arange(off[-1], dtype=np.int64) - np.repeat(off[:-1], cnt)
    ebkt = np.repeat(b1, cnt) + rel
    order_e = np.argsort(ebkt, kind="stable")
    eidx_s = eidx[order_e]
    estarts = np.searchsorted(ebkt[order_e], np.arange(nb + 1))

    out = np.zeros(px.size, dtype=bool)
    inb = (py >= ylo) & (py <= yhi)
    pid = np.flatnonzero(inb)
    if pid.size == 0:
        return out
    pb = np.clip(((py[pid] - ylo) / h).astype(np.int64), 0, nb - 1)
    order_p = np.argsort(pb, kind="stable")
    pid_s = pid[order_p]
    pb_s = pb[order_p]
    bstarts = np.flatnonzero(np.concatenate(([True], pb_s[1:] != pb_s[:-1])))
    bends = np.concatenate((bstarts[1:], [pb_s.size]))
    for s0, s1 in zip(bstarts.tolist(), bends.tolist()):
        b = pb_s[s0]
        es = eidx_s[estarts[b] : estarts[b + 1]]
        if es.size == 0:
            continue
        rows = pid_s[s0:s1]
        pxv = px[rows][:, None]
        pyv = py[rows][:, None]
        ex1, ey1 = x1[es][None, :], y1[es][None, :]
        ex2, ey2 = x2[es][None, :], y2[es][None, :]
        straddle = (ey1 > pyv) != (ey2 > pyv)
        lhs = (pxv - ex1) * (ey2 - ey1)
        rhs = (ex2 - ex1) * (pyv - ey1)
        crossm = straddle & ((lhs < rhs) == (ey2 > ey1))
        out[rows] = (np.count_nonzero(crossm, axis=1) % 2).astype(bool)
    return out


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
    core = _assemble_core(ring_xs, ring_ys)
    if core is None:
        return []
    (
        shell_ids,
        hole_ids,
        pf,
        all_shell_area,
        hole_area_sum,
        win_s,
        win_h,
        cent_x,
        cent_y,
        areas,
    ) = core
    n_orig = shell_ids.size
    n_shells = n_orig + pf.size

    shell_holes: list[list] = [[] for _ in range(n_shells)]
    for s_i, h_j in zip(win_s.tolist(), win_h.tolist()):
        r = hole_ids[h_j]
        shell_holes[s_i].append((ring_xs[r], ring_ys[r]))

    net_area = (all_shell_area - hole_area_sum).tolist()
    out: list[Polygon] = []
    for i in range(n_shells):
        net = net_area[i]
        if drop_collapsed and net <= 1e-6:
            continue
        if i < n_orig:
            r = shell_ids[i]
            xs, ys = ring_xs[r], ring_ys[r]
        else:
            r = hole_ids[pf[i - n_orig]]
            xs, ys = ring_xs[r][::-1], ring_ys[r][::-1]
        out.append(
            Polygon(np.ascontiguousarray(xs), np.ascontiguousarray(ys), shell_holes[i], net)
        )
    return out


def _assemble_core(ring_xs: list, ring_ys: list):
    """Shared vectorized assembly core: classification, twin
    promotion, and hole→shell winner assignment over flat ragged
    arrays. Returns (shell_ids, hole_ids, pf, all_shell_area,
    hole_area_sum, win_s, win_h, cent_x, cent_y, areas) or None for an
    empty result — consumed by ``assemble_polygons`` (Polygon objects)
    and ``assemble_polygons_pdf`` (Arrow-ready DataFrame)."""
    n_rings = len(ring_xs)
    if n_rings == 0:
        return None

    # --- vectorized per-ring area / bbox / centroid over flat ragged
    # arrays (one reduceat pass instead of per-ring Python calls) ------
    lens = np.fromiter((len(x) for x in ring_xs), dtype=np.int64, count=n_rings)
    offs = np.concatenate(([0], np.cumsum(lens)))
    fx = np.concatenate(ring_xs)
    fy = np.concatenate(ring_ys)
    # recentre each ring on its first vertex (precision; see signed_area)
    fx0 = fx - np.repeat(fx[offs[:-1]], lens)
    fy0 = fy - np.repeat(fy[offs[:-1]], lens)
    cross = fx0[:-1] * fy0[1:] - fx0[1:] * fy0[:-1]
    sumx = fx0[:-1] + fx0[1:]
    sumy = fy0[:-1] + fy0[1:]
    cross[offs[1:-1] - 1] = 0.0  # zero the wrap term between rings
    areas = 0.5 * np.add.reduceat(cross, offs[:-1])
    cxn = np.add.reduceat(sumx * cross, offs[:-1])
    cyn = np.add.reduceat(sumy * cross, offs[:-1])
    with np.errstate(divide="ignore", invalid="ignore"):
        cent_x = np.where(np.abs(areas) < 1e-300, 0.0, cxn / (6.0 * areas)) + fx[offs[:-1]]
        cent_y = np.where(np.abs(areas) < 1e-300, 0.0, cyn / (6.0 * areas)) + fy[offs[:-1]]
    bxs1 = np.minimum.reduceat(fx, offs[:-1])
    bxs2 = np.maximum.reduceat(fx, offs[:-1])
    bys1 = np.minimum.reduceat(fy, offs[:-1])
    bys2 = np.maximum.reduceat(fy, offs[:-1])

    keep = np.abs(areas) >= 1e-9  # degenerate filter (polygonizer.rs:138-140)
    shell_ids = np.flatnonzero(keep & (areas > 0.0))
    hole_ids = np.flatnonzero(keep & (areas < 0.0))
    n_holes = hole_ids.size
    s_area = np.abs(areas[shell_ids])
    h_area = np.abs(areas[hole_ids])

    # --- hole promotion (polygonizer.rs:152-185) ----------------------
    # CW ring with no CCW twin (area within 1e-6 AND exactly equal
    # bbox) becomes a shell, re-wound CCW. Exact-bbox hash groups give
    # O(1) twin lookup (plain-float tuples, not numpy scalars).
    sbt = (
        np.stack([bxs1[shell_ids], bys1[shell_ids], bxs2[shell_ids], bys2[shell_ids]], 1).tolist()
        if shell_ids.size
        else []
    )
    hbt = (
        np.stack([bxs1[hole_ids], bys1[hole_ids], bxs2[hole_ids], bys2[hole_ids]], 1).tolist()
        if n_holes
        else []
    )
    by_bbox: dict = {}
    for i, b in enumerate(sbt):
        by_bbox.setdefault(tuple(b), []).append(i)
    s_area_l = s_area.tolist()
    h_area_l = h_area.tolist()
    promoted_from = [
        k
        for k, b in enumerate(hbt)
        if not any(abs(s_area_l[i] - h_area_l[k]) < 1e-6 for i in by_bbox.get(tuple(b), ()))
    ]

    n_shells = shell_ids.size + len(promoted_from)
    if n_shells == 0:
        return None
    pf = np.asarray(promoted_from, dtype=np.int64)

    def cat(a, b):
        return np.concatenate([a, b]) if pf.size else a

    all_shell_area = cat(s_area, h_area[pf])
    sx1 = cat(bxs1[shell_ids], bxs1[hole_ids][pf])
    sx2 = cat(bxs2[shell_ids], bxs2[hole_ids][pf])
    sy1 = cat(bys1[shell_ids], bys1[hole_ids][pf])
    sy2 = cat(bys2[shell_ids], bys2[hole_ids][pf])
    shell_len = cat(lens[shell_ids], lens[hole_ids][pf])
    shell_off = cat(offs[:-1][shell_ids], offs[:-1][hole_ids][pf])

    # --- hole assignment (polygonizer.rs:192-249) ---------------------
    hole_area_sum = np.zeros(n_shells)
    win_s = np.empty(0, dtype=np.int64)
    win_h = np.empty(0, dtype=np.int64)
    if n_holes and n_shells:
        from .bboxjoin import bbox_join

        # only holes that CAN have a strictly-larger parent enter the
        # spatial join (polygonizer.rs:226). This is not just an early
        # filter: the largest ring (a promoted coverage hull) has a
        # world-spanning bbox, and binning it joined it against every
        # shell — measured as ~80% of assembly time on grid coverages —
        # for candidates the area rule then discarded wholesale.
        ch = np.flatnonzero(h_area < float(all_shell_area.max()) - 1e-6)
        si, hj = bbox_join(
            sx1,
            sy1,
            sx2,
            sy2,
            bxs1[hole_ids][ch],
            bys1[hole_ids][ch],
            bxs2[hole_ids][ch],
            bys2[hole_ids][ch],
        )
        hj = ch[hj]
        # parent must be strictly larger (polygonizer.rs:226)
        bigger = all_shell_area[si] > h_area[hj] + 1e-6
        si, hj = si[bigger], hj[bigger]
        if si.size:
            # vectorized PIP of hole centroids vs candidate shells,
            # grouped by shell ring length (pad-free gather), chunked
            # so the (rows × L) temporaries stay cache-sized. Shells
            # whose (candidate count × ring length) is large — e.g. a
            # grid hull probed by every cell — go through the
            # y-bucketed edge index instead (O(E + P·E/B), not O(P·E)).
            probe_x = cent_x[hole_ids][hj]
            probe_y = cent_y[hole_ids][hj]
            inside = np.zeros(si.size, dtype=bool)
            pair_len = shell_len[si]

            heavy_pairs = np.zeros(si.size, dtype=bool)
            uq, ucount = np.unique(si, return_counts=True)
            heavy_u = uq[(ucount * shell_len[uq]) > 4_000_000]
            for u in heavy_u.tolist():
                rows = np.flatnonzero(si == u)
                heavy_pairs[rows] = True
                o, l = shell_off[u], shell_len[u]
                inside[rows] = _pip_many_vs_ring(
                    probe_x[rows], probe_y[rows], fx[o : o + l], fy[o : o + l]
                )
            pair_len = np.where(heavy_pairs, -1, pair_len)
            for L in np.unique(pair_len):
                if L < 0:
                    continue
                sel_all = np.flatnonzero(pair_len == L)
                step = max(int(2_000_000 // max(L, 1)), 64)
                for s0 in range(0, sel_all.size, step):
                    sel = sel_all[s0 : s0 + step]
                    base = shell_off[si[sel]][:, None] + np.arange(L)[None, :]
                    X = fx[base]
                    Y = fy[base]
                    # promoted shells are reversed rings — orientation
                    # does not change even-odd crossings
                    x1m, x2m = X[:, :-1], X[:, 1:]
                    y1m, y2m = Y[:, :-1], Y[:, 1:]
                    pyv = probe_y[sel][:, None]
                    pxv = probe_x[sel][:, None]
                    # division-free crossing test: px < xint(py)
                    # ⇔ (px-x1)(y2-y1) <> (x2-x1)(py-y1) by sign of
                    # (y2-y1); avoids div-by-zero NaN/inf slow paths on
                    # axis-aligned edges
                    straddle = (y1m > pyv) != (y2m > pyv)
                    lhs = (pxv - x1m) * (y2m - y1m)
                    rhs = (x2m - x1m) * (pyv - y1m)
                    cross_m = straddle & ((lhs < rhs) == (y2m > y1m))
                    crossings = np.count_nonzero(cross_m, axis=1)
                    inside[sel] = (crossings % 2).astype(bool)
            si, hj = si[inside], hj[inside]
            if si.size:
                # smallest containing shell per hole (argmin)
                order = np.lexsort((all_shell_area[si], hj))
                first = np.concatenate(([True], hj[order][1:] != hj[order][:-1]))
                win_s = si[order][first]
                win_h = hj[order][first]
                np.add.at(hole_area_sum, win_s, h_area[win_h])

    return (
        shell_ids,
        hole_ids,
        pf,
        all_shell_area,
        hole_area_sum,
        win_s,
        win_h,
        cent_x,
        cent_y,
        areas,
    )


def assemble_polygons_pdf(
    ring_xs: list,
    ring_ys: list,
    drop_collapsed: bool = False,
    tile_i: int = -1,
    tile_j: int = -1,
):
    """``assemble_polygons`` fused straight into the POLYGON_SCHEMA
    pandas DataFrame — no per-polygon ``Polygon`` objects and no
    per-polygon ``polygon_centroid`` recomputation. At 160k rings the
    object detour costs ~10 s of pure Python; this path is the one the
    Spark kernels (tiled per-tile assembly, stitched local assembly)
    use. Column semantics identical to building rows from
    ``assemble_polygons`` + ``polygon_centroid`` (same formulas, same
    degeneracy fallbacks).
    """
    import pandas as pd

    cols = (
        "tile_i",
        "tile_j",
        "poly_id",
        "shell_xs",
        "shell_ys",
        "hole_xs",
        "hole_ys",
        "n_holes",
        "area",
        "cx",
        "cy",
    )

    def empty():
        return pd.DataFrame(
            {
                "tile_i": np.empty(0, np.int32),
                "tile_j": np.empty(0, np.int32),
                "poly_id": np.empty(0, np.int64),
                "shell_xs": pd.Series([], dtype=object),
                "shell_ys": pd.Series([], dtype=object),
                "hole_xs": pd.Series([], dtype=object),
                "hole_ys": pd.Series([], dtype=object),
                "n_holes": np.empty(0, np.int32),
                "area": np.empty(0, np.float64),
                "cx": np.empty(0, np.float64),
                "cy": np.empty(0, np.float64),
            },
            columns=list(cols),
        )

    core = _assemble_core(ring_xs, ring_ys)
    if core is None:
        return empty()
    (
        shell_ids,
        hole_ids,
        pf,
        all_shell_area,
        hole_area_sum,
        win_s,
        win_h,
        cent_x,
        cent_y,
        areas,
    ) = core
    n_orig = shell_ids.size
    n_shells = n_orig + pf.size

    net_area = all_shell_area - hole_area_sum
    keep = np.ones(n_shells, dtype=bool) if not drop_collapsed else (net_area > 1e-6)

    # polygon centroid (area-weighted shell − holes; polygon_centroid
    # semantics incl. the RELATIVE degeneracy fallback), vectorized
    src = np.concatenate((shell_ids, hole_ids[pf])) if pf.size else shell_ids
    cx0 = cent_x[src]
    cy0 = cent_y[src]
    num_x = all_shell_area * cx0
    num_y = all_shell_area * cy0
    if win_s.size:
        h_abs = np.abs(areas[hole_ids[win_h]])
        np.add.at(num_x, win_s, -h_abs * cent_x[hole_ids[win_h]])
        np.add.at(num_y, win_s, -h_abs * cent_y[hole_ids[win_h]])
    den = all_shell_area - hole_area_sum
    degen = np.abs(den) < np.maximum(all_shell_area * 1e-9, 1e-12)
    safe = np.where(degen, 1.0, den)
    cx = np.where(degen, cx0, num_x / safe)
    cy = np.where(degen, cy0, num_y / safe)

    sel = np.flatnonzero(keep)
    if sel.size == 0:
        return empty()
    # remap winner pairs to kept-shell output positions
    out_pos = np.full(n_shells, -1, dtype=np.int64)
    out_pos[sel] = np.arange(sel.size)

    shell_x_col: list = [None] * sel.size
    shell_y_col: list = [None] * sel.size
    hole_x_col: list = [[] for _ in range(sel.size)]
    hole_y_col: list = [[] for _ in range(sel.size)]
    n_holes_out = np.zeros(sel.size, dtype=np.int32)
    for o, i in enumerate(sel.tolist()):
        if i < n_orig:
            r = shell_ids[i]
            shell_x_col[o] = ring_xs[r]
            shell_y_col[o] = ring_ys[r]
        else:
            r = hole_ids[pf[i - n_orig]]
            shell_x_col[o] = np.ascontiguousarray(ring_xs[r][::-1])
            shell_y_col[o] = np.ascontiguousarray(ring_ys[r][::-1])
    for s_i, h_j in zip(win_s.tolist(), win_h.tolist()):
        o = out_pos[s_i]
        if o < 0:
            continue
        r = hole_ids[h_j]
        hole_x_col[o].append(ring_xs[r])
        hole_y_col[o].append(ring_ys[r])
        n_holes_out[o] += 1

    obj = lambda v: pd.Series(v, dtype=object)
    return pd.DataFrame(
        {
            "tile_i": np.full(sel.size, tile_i, dtype=np.int32),
            "tile_j": np.full(sel.size, tile_j, dtype=np.int32),
            "poly_id": np.arange(sel.size, dtype=np.int64),
            "shell_xs": obj(shell_x_col),
            "shell_ys": obj(shell_y_col),
            "hole_xs": obj(hole_x_col),
            "hole_ys": obj(hole_y_col),
            "n_holes": n_holes_out,
            "area": net_area[sel],
            "cx": cx[sel],
            "cy": cy[sel],
        },
        columns=list(cols),
    )


def canonicalize_ring(xs: np.ndarray, ys: np.ndarray):
    """Rotate a closed ring to start at its lexicographically smallest
    vertex (orientation preserved) — for order-insensitive golden
    comparison (the reference asserts on counts/areas instead;
    FIXTURES.md §1 asks for this canonical form)."""
    x = np.asarray(xs, dtype=np.float64)[:-1]
    y = np.asarray(ys, dtype=np.float64)[:-1]
    k = int(np.lexsort((y, x))[0])
    # same tie-break as batch_ring_stats: among repeated minimum
    # vertices pick the lexicographically-smallest full rotation
    cands = np.flatnonzero((x == x[k]) & (y == y[k]))
    if cands.size > 1:
        bx, by = np.roll(x, -k), np.roll(y, -k)
        for c in cands:
            cx_rot, cy_rot = np.roll(x, -int(c)), np.roll(y, -int(c))
            neq = np.flatnonzero((bx != cx_rot) | (by != cy_rot))
            if neq.size and (cx_rot[neq[0]], cy_rot[neq[0]]) < (bx[neq[0]], by[neq[0]]):
                k, bx, by = int(c), cx_rot, cy_rot
    rx = np.roll(x, -k)
    ry = np.roll(y, -k)
    return np.concatenate([rx, rx[:1]]), np.concatenate([ry, ry[:1]])
