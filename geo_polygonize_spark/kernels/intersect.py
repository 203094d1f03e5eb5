"""Robust-ish planar predicates + batched segment intersection.

The reference relies on the ``robust`` crate's exact ``orient2d``
(reference: ``src/utils/mod.rs:2,66-70``) and on
``geo::line_intersection`` for the noder's exact pairwise test
(``src/noding/snap.rs:140-168``). Here both are re-derived:

* ``orient2d`` — vectorized f64 determinant with Shewchuk's static
  error filter; the (rare) uncertain lanes are re-evaluated exactly
  with ``fractions.Fraction`` (binary f64 → exact rational, so the
  fallback is fully exact, just slow — it only ever sees a handful of
  nearly-degenerate triples).
* ``segment_intersections`` — batched classification of segment pairs
  into none / single-point / collinear-overlap, matching the semantics
  of ``geo``'s LineIntersection (SinglePoint vs Collinear) that the
  reference noder consumes.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

# Shewchuk's ccwerrboundA for double precision: (3 + 16 eps) eps
_CCW_ERRBOUND = 3.3306690738754716e-16


def _orient2d_exact(ax, ay, bx, by, cx, cy) -> int:
    det = (Fraction(ax) - Fraction(cx)) * (Fraction(by) - Fraction(cy)) - (
        Fraction(ay) - Fraction(cy)
    ) * (Fraction(bx) - Fraction(cx))
    return (det > 0) - (det < 0)


_SPLIT = 134217729.0  # 2^27 + 1, Dekker/Veltkamp splitter


def _two_diff(a, b):
    """Exact a - b as (hi, lo) with a - b == hi + lo (Knuth two-sum)."""
    x = a - b
    bvirt = a - x
    avirt = x + bvirt
    bround = bvirt - b
    around = a - avirt
    return x, around + bround


def _two_prod(a, b):
    """Exact a * b as (hi, lo) via Veltkamp splitting (Dekker)."""
    x = a * b
    c = _SPLIT * a
    ahi = c - (c - a)
    alo = a - ahi
    c = _SPLIT * b
    bhi = c - (c - b)
    blo = b - bhi
    err = ((ahi * bhi - x) + ahi * blo + alo * bhi) + alo * blo
    return x, err


def _orient2d_exact_batch(ax, ay, bx, by, cx, cy) -> np.ndarray:
    """Exact orientation sign for many rows at once: expansion
    arithmetic (vectorized two-diff / two-prod → 16 exact terms per
    row) + per-row ``math.fsum`` for the correctly-rounded total. A
    term-wise exact alternative to Shewchuk's adaptive stages; the
    scalar Fraction oracle remains for the (denormal-range) rows where
    fsum could round a nonzero sum to zero."""
    import math

    d1, e1 = _two_diff(ax, cx)  # ax - cx
    d2, e2 = _two_diff(by, cy)  # by - cy
    d3, e3 = _two_diff(ay, cy)  # ay - cy
    d4, e4 = _two_diff(bx, cx)  # bx - cx
    terms = []
    for p, q in ((d1, d2), (d1, e2), (e1, d2), (e1, e2)):
        hi, lo = _two_prod(p, q)
        terms.append(hi)
        terms.append(lo)
    for p, q in ((d3, d4), (d3, e4), (e3, d4), (e3, e4)):
        hi, lo = _two_prod(p, q)
        terms.append(-hi)
        terms.append(-lo)
    mat = np.stack(terms, axis=1)  # (n, 16), exact decomposition of det
    out = np.empty(mat.shape[0], dtype=np.int8)
    tiny = 5e-324 * 16
    for i in range(mat.shape[0]):
        s = math.fsum(mat[i])
        if s > tiny:
            out[i] = 1
        elif s < -tiny:
            out[i] = -1
        elif s == 0.0:
            out[i] = 0
        else:  # |s| in the denormal danger zone → exact rational oracle
            out[i] = _orient2d_exact(ax[i], ay[i], bx[i], by[i], cx[i], cy[i])
    return out


def orient2d_sign(ax, ay, bx, by, cx, cy) -> np.ndarray:
    """Sign of the orientation determinant of (a, b, c), exactly.

    Returns int8 array: +1 = c is left of a→b (CCW), -1 = right, 0 =
    collinear. Vectorized fast path with an exact Fraction fallback for
    lanes inside the error bound (Shewchuk filter).
    """
    ax = np.asarray(ax, dtype=np.float64)
    ay = np.asarray(ay, dtype=np.float64)
    bx = np.asarray(bx, dtype=np.float64)
    by = np.asarray(by, dtype=np.float64)
    cx = np.asarray(cx, dtype=np.float64)
    cy = np.asarray(cy, dtype=np.float64)

    detleft = (ax - cx) * (by - cy)
    detright = (ay - cy) * (bx - cx)
    det = detleft - detright
    detsum = np.abs(detleft) + np.abs(detright)
    errbound = _CCW_ERRBOUND * detsum

    sign = np.sign(det).astype(np.int8)
    uncertain = (np.abs(det) <= errbound) & (detsum > 0.0)
    if np.any(uncertain):
        ax, ay, bx, by, cx, cy = np.broadcast_arrays(ax, ay, bx, by, cx, cy)
        sign = np.array(np.broadcast_to(sign, ax.shape), dtype=np.int8)
        u = np.flatnonzero(np.broadcast_to(uncertain, ax.shape).reshape(-1))
        r = lambda a: a.reshape(-1)[u].astype(np.float64)
        sign.reshape(-1)[u] = _orient2d_exact_batch(r(ax), r(ay), r(bx), r(by), r(cx), r(cy))
    return sign


# classification codes for segment_intersections
NONE = 0
SINGLE_POINT = 1
COLLINEAR_OVERLAP = 2


def segment_intersections(p1x, p1y, p2x, p2y, q1x, q1y, q2x, q2y):
    """Batched exact-ish intersection of segment pairs P=(p1,p2), Q=(q1,q2).

    Returns (kind, ix1, iy1, ix2, iy2):
      kind == SINGLE_POINT     → (ix1, iy1) is the intersection point
      kind == COLLINEAR_OVERLAP → (ix1,iy1)-(ix2,iy2) is the overlap span
      kind == NONE             → no intersection

    Semantics match ``geo::line_intersection`` as used by the
    reference noder (``src/noding/snap.rs:140-168``): collinear
    touching at exactly one point reports SINGLE_POINT; collinear with
    a positive-length shared span reports COLLINEAR_OVERLAP.
    """
    p1x, p1y, p2x, p2y, q1x, q1y, q2x, q2y = (
        np.asarray(a, dtype=np.float64) for a in (p1x, p1y, p2x, p2y, q1x, q1y, q2x, q2y)
    )
    n = p1x.shape[0]
    kind = np.zeros(n, dtype=np.int8)
    ix1 = np.zeros(n, dtype=np.float64)
    iy1 = np.zeros(n, dtype=np.float64)
    ix2 = np.zeros(n, dtype=np.float64)
    iy2 = np.zeros(n, dtype=np.float64)
    if n == 0:
        return kind, ix1, iy1, ix2, iy2

    s1 = orient2d_sign(q1x, q1y, q2x, q2y, p1x, p1y).astype(np.int16)
    s2 = orient2d_sign(q1x, q1y, q2x, q2y, p2x, p2y).astype(np.int16)
    s3 = orient2d_sign(p1x, p1y, p2x, p2y, q1x, q1y).astype(np.int16)
    s4 = orient2d_sign(p1x, p1y, p2x, p2y, q2x, q2y).astype(np.int16)

    collinear = (s1 == 0) & (s2 == 0) & (s3 == 0) & (s4 == 0)
    crossing = (s1 * s2 <= 0) & (s3 * s4 <= 0) & ~collinear

    # --- single-point (proper or endpoint-touch) intersections -------
    if np.any(crossing):
        d1x = p2x - p1x
        d1y = p2y - p1y
        d2x = q2x - q1x
        d2y = q2y - q1y
        denom = d1x * d2y - d1y * d2x
        # crossing with denom == 0 cannot happen (parallel non-collinear
        # segments have s3*s4 > 0); guard anyway.
        safe = crossing & (denom != 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = ((q1x - p1x) * d2y - (q1y - p1y) * d2x) / denom
        px = p1x + t * d1x
        py = p1y + t * d1y
        # When an endpoint lies exactly on the other segment, emit that
        # endpoint verbatim (geo does the same) so snapping/dedup later
        # sees exact coordinates.
        px = np.where(s1 == 0, p1x, np.where(s2 == 0, p2x, px))
        py = np.where(s1 == 0, p1y, np.where(s2 == 0, p2y, py))
        px = np.where((s1 != 0) & (s2 != 0) & (s3 == 0), q1x, px)
        py = np.where((s1 != 0) & (s2 != 0) & (s3 == 0), q1y, py)
        px = np.where((s1 != 0) & (s2 != 0) & (s3 != 0) & (s4 == 0), q2x, px)
        py = np.where((s1 != 0) & (s2 != 0) & (s3 != 0) & (s4 == 0), q2y, py)
        kind[safe] = SINGLE_POINT
        ix1[safe] = px[safe]
        iy1[safe] = py[safe]

    # --- collinear: project on dominant axis, intersect intervals ----
    if np.any(collinear):
        c = np.flatnonzero(collinear)
        use_x = np.abs(p2x[c] - p1x[c]) >= np.abs(p2y[c] - p1y[c])
        # parameterize all four endpoints along the dominant axis
        pa = np.where(use_x, p1x[c], p1y[c])
        pb = np.where(use_x, p2x[c], p2y[c])
        qa = np.where(use_x, q1x[c], q1y[c])
        qb = np.where(use_x, q2x[c], q2y[c])
        plo = np.minimum(pa, pb)
        phi = np.maximum(pa, pb)
        qlo = np.minimum(qa, qb)
        qhi = np.maximum(qa, qb)
        lo = np.maximum(plo, qlo)
        hi = np.minimum(phi, qhi)

        def coord_at(t):
            # recover the full 2-D point on P for axis-parameter t
            with np.errstate(divide="ignore", invalid="ignore"):
                frac = np.where(pb != pa, (t - pa) / (pb - pa), 0.0)
            x = p1x[c] + frac * (p2x[c] - p1x[c])
            y = p1y[c] + frac * (p2y[c] - p1y[c])
            # exact endpoint passthrough where t matches an endpoint
            for ex, ey, et in (
                (p1x[c], p1y[c], pa),
                (p2x[c], p2y[c], pb),
                (q1x[c], q1y[c], qa),
                (q2x[c], q2y[c], qb),
            ):
                hit = t == et
                x = np.where(hit, ex, x)
                y = np.where(hit, ey, y)
            return x, y

        overlap = lo < hi
        touch = lo == hi
        x_lo, y_lo = coord_at(lo)
        x_hi, y_hi = coord_at(hi)
        ov = c[overlap]
        kind[ov] = COLLINEAR_OVERLAP
        ix1[ov] = x_lo[overlap]
        iy1[ov] = y_lo[overlap]
        ix2[ov] = x_hi[overlap]
        iy2[ov] = y_hi[overlap]
        tc = c[touch]
        kind[tc] = SINGLE_POINT
        ix1[tc] = x_lo[touch]
        iy1[tc] = y_lo[touch]

    return kind, ix1, iy1, ix2, iy2
