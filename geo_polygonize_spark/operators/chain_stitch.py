"""Boundary-chain stitched polygonize — the single-trace alternative to
the level-escalation chain in ``stitch.py`` (SURVEY.md §7 step 4's
original sketch, r3 VERDICT item 4).

Why: the level design re-NODES escalated windows at every level, and on
lattice-like linework (the reference's canonical grid benches,
reference benches/polygonize_bench.rs:7-38) every tile boundary
escalates, so each level re-pays noding+tracing over most of the data.
Here the segment data is noded and traced EXACTLY ONCE (one grouped-map
pass); everything that crosses a tile boundary leaves the kernel as an
open boundary CHAIN — perimeter-scale data — and only chains flow
through the merge shuffles.

Protocol (each step local and deterministic):

1. **Claiming.** After windowed noding (global snap grid), every
   half-edge ``g`` is CLAIMED by exactly one tile: the tile whose core
   (half-open ``[x0+i·ts, x0+(i+1)·ts)`` cell) contains ``tail(g)``
   (the half-edge's origin node). Cores partition the plane and
   coordinates are snapped, so ownership is bit-deterministic across
   tiles.
2. **Exactness window.** The tile's buffered window must contain every
   claimed half-edge and its immediate predecessor, with complete
   fans at their heads. A noded sub-segment is never longer than its
   input segment, so ``buffer ≥ max input segment length`` guarantees
   one full step out of the core stays inside the window; the operator
   enforces ``buffer_eff = max(buffer, L_max + 4·snap_grid)`` (one
   narrow aggregate). Within the window, sub-segmentation equals the
   global noding (any splitter of an in-window span touches the
   window — the same complete-fan argument as stitch.py step 1).
3. **Tracing.** The next-CCW successor permutation runs over the FULL
   multigraph with NO dangle pruning (pruning is window-dependent, so
   two tiles could disagree near a window edge; instead dangles ride
   through as zero-width spur excursions and are cancelled exactly
   after ring closure — reduction of adjacent reverse edge pairs on
   the cyclic edge word, which is window-independent). Claimed edges
   decompose under the successor permutation into
   * complete cycles (every edge claimed here) → rings, emitted now;
   * maximal open chains → rows ``(head_key, tail_key, coords)``.
4. **Linking keys.** A chain's ``tail_key`` is the identity hash of
   its LAST claimed half-edge (both endpoints snapped, bit-exact in
   every window that contains them); the FOLLOWING chain — claimed by
   the neighbor tile that owns the next core — computed its first edge
   as ``succ`` of that same half-edge and stamps the same hash as its
   ``head_key``. So the chain graph's successor pointer IS
   ``tail_key``; no discovery join is needed.
5. **Cycle closure.** ``connected_keepers`` (operators/dedup.py — the
   same pointer-doubling min-label CC used for dedup keepers) labels
   each chain with its cycle id in O(log cycle length) rounds over
   narrow (id, id) rows; one ``groupBy(cycle)`` gathers each ring's
   chains (a ring's chain count is perimeter/tile_size — one task
   holds one polygon boundary, the same row-size assumption as
   POLYGON_SCHEMA), and a kernel walks the key links, concatenates
   coordinates, cancels spurs, and emits the closed ring. A dangling
   link (tail with no matching head) is topologically impossible under
   (1)+(2), so the kernel RAISES on it rather than dropping data.
6. **Assembly.** The ring set (local + merged) feeds the same
   classification / twin-promotion / hole-assignment pipeline as
   stitch.py (local kernel or distributed joins) — semantics
   identical to the reference polygonizer (polygonizer.rs:124-261).

Scale shape: one wide shuffle of segment data (the tile repartition),
then shuffles over chain rows only. For a W×W-tile lattice the level
design's escalation re-traces O(W²) cells log W times; here the chain
stages move O(W·tiles_crossed) rows. Skew: the one grouped-map pass
uses the same explicit repartition as tiled_polygonize; a pathological
single tile can still be hot (no sub-split here yet — documented
limitation vs stitch.py's 3c).
"""

from __future__ import annotations

import atexit
import collections
import os
import shutil
import tempfile
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..kernels.graph import build_graph, sort_edges, successor_permutation
from ..kernels.noding import node_segments
from ..kernels.polygonize import DEFAULT_SNAP_GRID
from ..kernels.rings import batch_ring_stats
from .polygonize_op import _bbox_of_segments, segmentize_df
from .stitch import RING_SCHEMA, _tile_range_cols

CHAIN_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.IntegerType()),  # 0 ring, 1 chain
        T.StructField("xs", T.ArrayType(T.DoubleType())),
        T.StructField("ys", T.ArrayType(T.DoubleType())),
        T.StructField("head_key", T.LongType()),
        T.StructField("tail_key", T.LongType()),
        T.StructField("area", T.DoubleType()),
        T.StructField("bx1", T.DoubleType()),
        T.StructField("by1", T.DoubleType()),
        T.StructField("bx2", T.DoubleType()),
        T.StructField("by2", T.DoubleType()),
        T.StructField("cx", T.DoubleType()),
        T.StructField("cy", T.DoubleType()),
    ]
)

# r5 in-trace assembly: the trace kernel emits assembled POLYGONS for
# its core-contained rings (kind 0) plus chains (kind 1), unparented
# CW holes awaiting a possible merged-shell parent (kind 2), and
# narrow attached-hole records (kind 3) so the finish can revise the
# rare holes a chain-closed (merged) shell steals. ``area`` is the
# SIGNED shell area on kind 0 (promotion = area<0, reversible), the
# UNSIGNED hole area on kinds 2/3.
CHAIN_FUSED_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.IntegerType()),
        T.StructField("rid", T.LongType()),
        T.StructField("core", T.LongType()),
        T.StructField("xs", T.ArrayType(T.DoubleType())),
        T.StructField("ys", T.ArrayType(T.DoubleType())),
        T.StructField("hole_xs", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("hole_ys", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("hole_rids", T.ArrayType(T.LongType())),
        T.StructField("n_holes", T.IntegerType()),
        T.StructField("net_area", T.DoubleType()),
        T.StructField("area", T.DoubleType()),
        T.StructField("bx1", T.DoubleType()),
        T.StructField("by1", T.DoubleType()),
        T.StructField("bx2", T.DoubleType()),
        T.StructField("by2", T.DoubleType()),
        T.StructField("cx", T.DoubleType()),
        T.StructField("cy", T.DoubleType()),
        T.StructField("head_key", T.LongType()),
        T.StructField("tail_key", T.LongType()),
        T.StructField("cand_rid", T.LongType()),
        T.StructField("cand_area", T.DoubleType()),
    ]
)


_PRESPLIT_TMPDIR: str | None = None


def _presplit_tmpdir() -> str:
    """Process-scoped temp dir for driver pre-split parquet handoffs,
    removed at interpreter exit (the files back lazy DataFrames, so
    they must outlive the call that wrote them)."""
    global _PRESPLIT_TMPDIR
    if _PRESPLIT_TMPDIR is None:
        _PRESPLIT_TMPDIR = tempfile.mkdtemp(prefix="gp_presplit_")
        atexit.register(shutil.rmtree, _PRESPLIT_TMPDIR, ignore_errors=True)
    return _PRESPLIT_TMPDIR


def _prof(label: str, t0: float) -> float:
    """Env-gated phase timer (SPARK_GRAFT_PROFILE=1): prints the wall
    between driver-side phase boundaries — each phase ends at a Spark
    action, so the print attributes real cluster work, not lazy plan
    building. Zero cost when unset."""
    import os
    import time

    t1 = time.time()
    if os.environ.get("SPARK_GRAFT_PROFILE"):
        print(f"CHAINPROF {label}: {t1 - t0:.3f}s", flush=True)
    return t1


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (uint64 wrap-around)."""
    h ^= h >> 30
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> 27
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> 31
    return h


def _edge_keys(sx, sy, dx, dy) -> np.ndarray:
    """Deterministic int64 identity of directed half-edges from their
    snapped endpoint coordinates (bit-exact across tiles): the four
    float64 bit patterns chained through the splitmix64 finalizer —
    fully vectorized (a per-edge digest call was a measured hot spot)."""
    with np.errstate(over="ignore"):
        h = np.full(np.shape(sx), 0x9E3779B97F4A7C15, dtype=np.uint64)
        for a in (sx, sy, dx, dy):
            h = _mix64(h ^ np.asarray(a, np.float64).view(np.uint64))
    return h.view(np.int64)


def _strip_spurs(xs: np.ndarray, ys: np.ndarray):
    """Cancel zero-width spur excursions on a CLOSED ring (first ==
    last): reduce adjacent reverse directed-edge pairs on the cyclic
    edge word to its (unique) reduced form. Returns the cleaned closed
    ring, or (None, None) if everything cancels (a pure dangle tree's
    face walk). Exact float comparisons — coordinates are snapped."""
    pts = list(zip(xs[:-1].tolist(), ys[:-1].tolist()))
    n = len(pts)
    if n < 2:
        return None, None
    edges = [(pts[i], pts[(i + 1) % n]) for i in range(n)]
    stack: collections.deque = collections.deque()
    for e in edges:
        if stack and stack[-1][0] == e[1] and stack[-1][1] == e[0]:
            stack.pop()
        else:
            stack.append(e)
    # wrap-around cancellation on the cyclic word (deque: a long spur
    # chain straddling the walk origin cancels in O(n), not O(n²))
    while len(stack) >= 2 and stack[0][0] == stack[-1][1] and stack[0][1] == stack[-1][0]:
        stack.pop()
        stack.popleft()
    if len(stack) < 3:
        return None, None
    out_x = np.fromiter((e[0][0] for e in stack), np.float64, len(stack))
    out_y = np.fromiter((e[0][1] for e in stack), np.float64, len(stack))
    return (
        np.concatenate((out_x, out_x[:1])),
        np.concatenate((out_y, out_y[:1])),
    )


def _rings_have_spurs(ring_xs: list, ring_ys: list) -> np.ndarray:
    """Per-ring spur test over CLOSED ring arrays, one vectorized pass
    over the flattened layout: ring i has a spur iff some vertex's
    cyclic predecessor equals its successor. Returns bool per ring."""
    n = len(ring_xs)
    lens = np.fromiter((a.size - 1 for a in ring_xs), np.int64, n)  # open lengths
    off = np.concatenate(([0], np.cumsum(lens)))
    total = int(off[-1])
    xr = np.empty(total)
    yr = np.empty(total)
    for i in range(n):
        xr[off[i] : off[i + 1]] = ring_xs[i][:-1]
        yr[off[i] : off[i + 1]] = ring_ys[i][:-1]
    idx = np.arange(total)
    ring_of = np.repeat(np.arange(n), lens)
    starts = off[ring_of]
    ends = off[ring_of + 1]
    prv = idx - 1
    prv[idx == starts] = ends[idx == starts] - 1
    nxt = idx + 1
    nxt[idx == ends - 1] = starts[idx == ends - 1]
    spur_pos = (xr[prv] == xr[nxt]) & (yr[prv] == yr[nxt])
    flags = np.zeros(n, dtype=bool)
    np.logical_or.at(flags, ring_of[spur_pos], True)
    return flags


def _make_chain_kernel(x0, y0, ts, buffer_eff, snap_grid, cols, rows, fmap):
    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        tile_i, tile_j, f, sub_i, sub_j = (int(v) for v in key)

        x1, y1, x2, y2 = node_segments(
            pdf["x1"].to_numpy(),
            pdf["y1"].to_numpy(),
            pdf["x2"].to_numpy(),
            pdf["y2"].to_numpy(),
            snap_grid,
        )
        empty = pd.DataFrame(
            {
                "kind": np.empty(0, np.int32),
                "xs": pd.Series([], dtype=object),
                "ys": pd.Series([], dtype=object),
                "head_key": np.empty(0, np.int64),
                "tail_key": np.empty(0, np.int64),
                "area": np.empty(0, np.float64),
                "bx1": np.empty(0, np.float64),
                "by1": np.empty(0, np.float64),
                "bx2": np.empty(0, np.float64),
                "by2": np.empty(0, np.float64),
                "cx": np.empty(0, np.float64),
                "cy": np.empty(0, np.float64),
            }
        )
        if x1.size == 0:
            return empty
        g = build_graph(x1, y1, x2, y2)
        sort_edges(g)
        succ = successor_permutation(g)
        m = succ.size
        if m == 0:
            return empty

        sx = g.nx[g.de_src]
        sy = g.ny[g.de_src]
        # claim: tail node inside this (sub-)tile's core cell. The
        # owner index is CLIPPED to the tile grid so nodes exactly on
        # the global bbox max edge (floor index == cols/rows) belong
        # to the last tile instead of to nobody — every half-edge must
        # have exactly one claimant or chain links dangle. Hot tiles
        # sub-split into f×f claiming cells; the factor map is closed
        # over so every kernel derives the same owner for any node.
        ci = np.clip(np.floor((sx - x0) / ts).astype(np.int64), 0, cols - 1)
        cj = np.clip(np.floor((sy - y0) / ts).astype(np.int64), 0, rows - 1)
        f_arr = np.ones(sx.size, dtype=np.int64)
        osi = np.zeros(sx.size, dtype=np.int64)
        osj = np.zeros(sx.size, dtype=np.int64)
        for (hti, htj), fv in fmap.items():
            hot = (ci == hti) & (cj == htj)
            if not hot.any():
                continue
            s = ts / fv
            osi[hot] = np.clip(
                np.floor((sx[hot] - (x0 + hti * ts)) / s).astype(np.int64), 0, fv - 1
            )
            osj[hot] = np.clip(
                np.floor((sy[hot] - (y0 + htj * ts)) / s).astype(np.int64), 0, fv - 1
            )
            f_arr[hot] = fv
        claimed = (
            (ci == tile_i)
            & (cj == tile_j)
            & (f_arr == f)
            & (osi == sub_i)
            & (osj == sub_j)
        )
        idx = np.flatnonzero(claimed)
        k = idx.size
        if k == 0:
            return empty
        pred = np.empty(m, dtype=np.int64)
        pred[succ] = np.arange(m)

        pos = np.full(m, -1, dtype=np.int64)
        pos[idx] = np.arange(k)
        s_g = succ[idx]
        s_in = claimed[s_g]
        nxt = np.where(s_in, pos[s_g], np.arange(k))  # self-loop at tails
        is_tail = ~s_in
        p_g = pred[idx]
        is_head = ~claimed[p_g]

        rounds = int(np.ceil(np.log2(max(k, 2)))) + 1
        # terminal (tail) of each path via pointer doubling; cycle
        # elements land on an arbitrary in-cycle position instead
        jump = nxt.copy()
        for _ in range(rounds):
            jump = jump[jump]
        on_path = is_tail[jump]
        # cycle id: min compact-index over the forward closure
        lab = np.arange(k)
        j2 = nxt.copy()
        for _ in range(rounds):
            lab = np.minimum(lab, lab[j2])
            j2 = j2[j2]
        # distance to terminal (paths) — orders a path head-first
        dist = (~is_tail).astype(np.int64)
        j3 = nxt.copy()
        for _ in range(rounds):
            dist = dist + dist[j3]
            j3 = j3[j3]

        src = g.de_src
        dst = g.de_dst
        gx = g.nx
        gy = g.ny

        out_rows = {
            "kind": [],
            "xs": [],
            "ys": [],
            "head_key": [],
            "tail_key": [],
        }

        # ---- complete local cycles → rings ----------------------------
        cyc = np.flatnonzero(~on_path)
        ring_xs: list = []
        ring_ys: list = []
        if cyc.size:
            # order within each cycle: rank from the min-label anchor
            # (predecessor-doubling, as in graph.edge_rings)
            cpos = np.full(k, -1, dtype=np.int64)
            cpos[cyc] = np.arange(cyc.size)
            cn = cpos[nxt[cyc]]  # permutation over cycle elements
            cpred = np.empty(cyc.size, dtype=np.int64)
            cpred[cn] = np.arange(cyc.size)
            rep = lab[cyc]
            # anchor = element whose global compact index equals rep
            is_rep = cyc == rep
            ptr = cpred.copy()
            ptr[is_rep] = np.flatnonzero(is_rep)
            rank = (~is_rep).astype(np.int64)
            for _ in range(int(np.ceil(np.log2(max(cyc.size, 2)))) + 1):
                rank = rank + rank[ptr]
                ptr = ptr[ptr]
            order = np.lexsort((rank, rep))
            des = idx[cyc[order]]
            reps = rep[order]
            starts = np.flatnonzero(np.concatenate(([True], reps[1:] != reps[:-1])))
            bounds = np.concatenate((starts, [des.size]))
            for a, b in zip(bounds[:-1], bounds[1:]):
                ring_des = des[a:b]
                nodes = np.empty(ring_des.size + 1, dtype=np.int64)
                nodes[0] = src[ring_des[0]]
                nodes[1:] = dst[ring_des]
                ring_xs.append(gx[nodes])
                ring_ys.append(gy[nodes])

        # ---- open chains ---------------------------------------------
        pth = np.flatnonzero(on_path)
        if pth.size:
            term = jump[pth]
            order = np.lexsort((-dist[pth], term))
            p_sorted = pth[order]
            t_sorted = term[order]
            starts = np.flatnonzero(
                np.concatenate(([True], t_sorted[1:] != t_sorted[:-1]))
            )
            bounds = np.concatenate((starts, [p_sorted.size]))
            head_seq = idx[p_sorted[starts]]
            tail_seq = idx[p_sorted[bounds[1:] - 1]]
            if not np.all(is_head[p_sorted[starts]]):
                raise RuntimeError(
                    "chain_stitch: path does not start at a head "
                    f"(tile {tile_i},{tile_j}) — claim decomposition bug"
                )
            pe = pred[head_seq]  # link edges into each chain (exact here)
            hks = _edge_keys(gx[src[pe]], gy[src[pe]], gx[dst[pe]], gy[dst[pe]])
            tks = _edge_keys(
                gx[src[tail_seq]], gy[src[tail_seq]],
                gx[dst[tail_seq]], gy[dst[tail_seq]],
            )
            for ci, (a, b) in enumerate(zip(bounds[:-1], bounds[1:])):
                seq = idx[p_sorted[a:b]]  # head-first half-edge ids
                nodes = np.empty(seq.size + 1, dtype=np.int64)
                nodes[0] = src[seq[0]]
                nodes[1:] = dst[seq]
                out_rows["kind"].append(1)
                out_rows["xs"].append(gx[nodes])
                out_rows["ys"].append(gy[nodes])
                out_rows["head_key"].append(hks[ci])
                out_rows["tail_key"].append(tks[ci])

        # ---- local ring stats (spur-cancelled) ------------------------
        # spurs can only arise from degree-1 nodes (a U-turn in the
        # face walk happens exactly at a fan of one edge); dangle-free
        # tiles — the entire lattice benchmark — skip the machinery
        n_chains = len(out_rows["kind"])
        ring_rows = 0
        if ring_xs:
            if np.any(g.degree == 1):
                spurs = _rings_have_spurs(ring_xs, ring_ys)
                cleaned_x: list = []
                cleaned_y: list = []
                for i in range(len(ring_xs)):
                    if spurs[i]:
                        cx_, cy_ = _strip_spurs(ring_xs[i], ring_ys[i])
                        if cx_ is None:
                            continue
                        cleaned_x.append(cx_)
                        cleaned_y.append(cy_)
                    else:
                        cleaned_x.append(ring_xs[i])
                        cleaned_y.append(ring_ys[i])
            else:
                cleaned_x, cleaned_y = ring_xs, ring_ys
            if cleaned_x:
                xr, yr, off, L, bx1, by1, bx2, by2, area, cxs, cys = batch_ring_stats(
                    cleaned_x, cleaned_y
                )
                keep = np.flatnonzero(np.abs(area) >= 1e-9)
                ring_rows = keep.size
                for i in keep:
                    o, l = off[i], L[i]
                    out_rows["kind"].append(0)
                    out_rows["xs"].append(np.concatenate((xr[o : o + l], xr[o : o + 1])))
                    out_rows["ys"].append(np.concatenate((yr[o : o + l], yr[o : o + 1])))
                    out_rows["head_key"].append(0)
                    out_rows["tail_key"].append(0)
                stat_arrays = (bx1, by1, bx2, by2, area, cxs, cys)
        n_out = len(out_rows["kind"])
        z = np.zeros(n_chains)
        if ring_rows:
            bx1k, by1k, bx2k, by2k, areak, cxk, cyk = stat_arrays
            stats = [
                np.concatenate((z, a[keep]))
                for a in (areak, bx1k, by1k, bx2k, by2k, cxk, cyk)
            ]
        else:
            stats = [np.zeros(n_out)] * 7
        obj = lambda v: pd.Series(v, dtype=object)
        return pd.DataFrame(
            {
                "kind": np.asarray(out_rows["kind"], np.int32),
                "xs": obj(out_rows["xs"]),
                "ys": obj(out_rows["ys"]),
                "head_key": np.asarray(out_rows["head_key"], np.int64),
                "tail_key": np.asarray(out_rows["tail_key"], np.int64),
                "area": stats[0],
                "bx1": stats[1],
                "by1": stats[2],
                "bx2": stats[3],
                "by2": stats[4],
                "cx": stats[5],
                "cy": stats[6],
            }
        )

    return kernel


def _ring_rids(coords_x, coords_y, area, bx1, by1, bx2, by2) -> np.ndarray:
    """Deterministic 64-bit ring ids folding EVERY vertex (r6, ADVICE
    r5: the sampled-vertex version could silently merge two distinct
    canonical rings agreeing on length, endpoints and stats): each
    vertex is mixed with its position and XOR-reduced per ring (one
    vectorized pass over the flattened layout), then chained with the
    canonical stats. Rings are rotation-canonicalized before their
    stats, so every field is tracer-invariant; the SIGNED area
    separates exact-bbox twins. Same 64-bit collision posture as the
    chain link keys (the merge collision guard documents it)."""
    n = len(coords_x)
    if n == 0:
        return np.empty(0, np.int64)
    lens = np.fromiter((a.size for a in coords_x), np.int64, n)
    off = np.concatenate(([0], np.cumsum(lens)))
    fx = np.concatenate(coords_x)
    fy = np.concatenate(coords_y)
    pos = (
        np.arange(int(off[-1]), dtype=np.uint64)
        - np.repeat(off[:-1].astype(np.uint64), lens)
    )
    with np.errstate(over="ignore"):
        ps = _mix64(pos ^ np.uint64(0x9E3779B97F4A7C15))
        ev = _mix64(fx.view(np.uint64) ^ ps) ^ _mix64(fy.view(np.uint64) ^ _mix64(ps))
        vhash = np.bitwise_xor.reduceat(ev, off[:-1])
    parts = [
        lens.astype(np.float64),
        np.asarray(area, np.float64), np.asarray(bx1, np.float64),
        np.asarray(by1, np.float64), np.asarray(bx2, np.float64),
        np.asarray(by2, np.float64),
    ]
    with np.errstate(over="ignore"):
        h = _mix64(np.full(n, 0x243F6A8885A308D3, dtype=np.uint64) ^ vhash)
        for a in parts:
            h = _mix64(h ^ a.view(np.uint64))
    return h.view(np.int64)


def _make_chain_fused_kernel(x0, y0, ts, buffer_eff, snap_grid, cols, rows, fmap):
    """Trace + IN-TASK tentative assembly (r5): wraps the plain chain
    kernel and assembles this claim core's polygons immediately, so
    ring coordinates never take a second Python round-trip through a
    phase-2 kernel. Soundness is the fused-assembly completeness
    argument (assembly.py header): a fully-claimed ring lies inside
    its core, so a member hole's local candidates all live in this
    task; only chain-closed (merged) shells can revise an attachment,
    deferred to narrow rows (kinds 2/3) resolved in
    ``assembly.assemble_rings_fused_trace``."""
    from .assembly import _core_key, _core_local_assembly

    inner = _make_chain_kernel(x0, y0, ts, buffer_eff, snap_grid, cols, rows, fmap)

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from .spatial_join import _ray_cast_rows

        tile_i, tile_j, f, sub_i, sub_j = (int(v) for v in key)
        core = int(_core_key(tile_i, tile_j, f, sub_i, sub_j, rows))
        base = inner(key, pdf)
        out: dict = {fld.name: [] for fld in CHAIN_FUSED_SCHEMA.fields}

        def emit(kind, **kw):
            out["kind"].append(kind)
            for fld in CHAIN_FUSED_SCHEMA.fields[1:]:
                out[fld.name].append(kw.get(fld.name))

        kinds = base["kind"].to_numpy() if len(base) else np.empty(0, np.int64)
        for i in np.flatnonzero(kinds == 1).tolist():
            emit(
                1, core=core, xs=base["xs"].iat[i], ys=base["ys"].iat[i],
                head_key=int(base["head_key"].iat[i]),
                tail_key=int(base["tail_key"].iat[i]),
            )

        ring_pos = np.flatnonzero(kinds == 0)
        if ring_pos.size:
            area = base["area"].to_numpy()[ring_pos]
            bx1 = base["bx1"].to_numpy()[ring_pos]
            by1 = base["by1"].to_numpy()[ring_pos]
            bx2 = base["bx2"].to_numpy()[ring_pos]
            by2 = base["by2"].to_numpy()[ring_pos]
            cxa = base["cx"].to_numpy()[ring_pos]
            cya = base["cy"].to_numpy()[ring_pos]
            coords_x = [
                np.asarray(base["xs"].iat[i], np.float64) for i in ring_pos.tolist()
            ]
            coords_y = [
                np.asarray(base["ys"].iat[i], np.float64) for i in ring_pos.tolist()
            ]
            rid = _ring_rids(coords_x, coords_y, area, bx1, by1, bx2, by2)
            (
                sh, s_area, ho, h_area, hx, hy, best_area, best_rid, best_local
            ) = _core_local_assembly(
                area, rid, cxa, cya, bx1, by1, bx2, by2,
                coords_x, coords_y, np.arange(ring_pos.size), _ray_cast_rows,
            )
            attach: dict = {}
            for p in range(ho.size):
                if best_local[p] >= 0:
                    attach.setdefault(int(best_local[p]), []).append(p)
                    emit(
                        3, rid=int(rid[ho[p]]), core=core,
                        area=float(h_area[p]), cx=float(hx[p]), cy=float(hy[p]),
                        cand_rid=int(best_rid[p]), cand_area=float(best_area[p]),
                    )
                else:
                    # no local parent — a merged shell may adopt it
                    emit(
                        2, rid=int(rid[ho[p]]), core=core,
                        xs=coords_x[ho[p]], ys=coords_y[ho[p]],
                        area=float(h_area[p]), cx=float(hx[p]), cy=float(hy[p]),
                    )
            for pos in range(sh.size):
                p = int(sh[pos])
                xs_p, ys_p = coords_x[p], coords_y[p]
                if area[p] < 0:  # promoted CW: re-wind CCW (reversible)
                    xs_p, ys_p = xs_p[::-1], ys_p[::-1]
                holes = attach.get(pos, ())
                emit(
                    0, rid=int(rid[p]), core=core, xs=xs_p, ys=ys_p,
                    hole_xs=[coords_x[ho[q]] for q in holes],
                    hole_ys=[coords_y[ho[q]] for q in holes],
                    hole_rids=[int(rid[ho[q]]) for q in holes],
                    n_holes=len(holes),
                    net_area=float(abs(area[p]) - h_area[list(holes)].sum()),
                    area=float(area[p]),
                    bx1=float(bx1[p]), by1=float(by1[p]),
                    bx2=float(bx2[p]), by2=float(by2[p]),
                    cx=float(cxa[p]), cy=float(cya[p]),
                )
        return pd.DataFrame(
            {k: pd.Series(v, dtype=object) for k, v in out.items()}
        )

    return kernel


def _merge_walk(rows) -> tuple[list, list]:
    """Walk chain links and close every cycle in one dict pass.
    ``rows``: iterable of (head_key, tail_key, xs, ys). Returns closed
    (ring_xs, ring_ys) with spurs cancelled. Raises on a broken link
    (topologically impossible under the claiming protocol)."""
    by_head: dict = {}
    for hk, tk, xs, ys in rows:
        by_head[int(hk)] = (int(tk), np.asarray(xs, np.float64), np.asarray(ys, np.float64))
    out_xs: list = []
    out_ys: list = []
    done: set = set()
    for start in by_head:
        if start in done:
            continue
        xs_parts = []
        ys_parts = []
        cur_key = start
        n_seen = 0
        while True:
            tk, xs, ys = by_head[cur_key]
            # absolute link validation: the followed chain must begin
            # at the previous chain's end VERTEX. Link keys are 64-bit
            # hashes; at ~10^12 half-edges birthday collisions become
            # plausible, and a collided link would otherwise splice two
            # unrelated rings SILENTLY. Coordinates are snapped, so
            # exact float equality is the correct test. (For runs
            # beyond ~10^11 edges, widen _edge_keys to two mixes —
            # this check turns any collision into a loud error first.)
            if xs_parts and (xs[0] != xs_parts[-1][-1] or ys[0] != ys_parts[-1][-1]):
                raise RuntimeError(
                    "chain_stitch: link key matched but chain geometry is "
                    "discontinuous — 64-bit edge-key collision; widen "
                    "_edge_keys for this input size"
                )
            done.add(cur_key)
            n_seen += 1
            xs_parts.append(xs)
            ys_parts.append(ys)
            if tk == start:
                break
            if tk not in by_head or n_seen > len(by_head):
                raise RuntimeError(
                    f"chain_stitch: broken chain cycle: link {tk} missing "
                    "— topology/claiming bug"
                )
            cur_key = tk
        xs = np.concatenate([p if i == 0 else p[1:] for i, p in enumerate(xs_parts)])
        ys = np.concatenate([p if i == 0 else p[1:] for i, p in enumerate(ys_parts)])
        if xs[0] != xs[-1] or ys[0] != ys[-1]:
            raise RuntimeError("chain_stitch: merged cycle is not closed")
        xs2, ys2 = _strip_spurs(xs, ys)
        if xs2 is not None:
            out_xs.append(xs2)
            out_ys.append(ys2)
    return out_xs, out_ys


def _rings_pdf(ring_xs: list, ring_ys: list, level: int) -> pd.DataFrame:
    """Closed rings → RING_SCHEMA rows (canonicalized, degenerates
    dropped)."""
    if not ring_xs:
        return pd.DataFrame(
            {f.name: pd.Series([], dtype=object) if f.name in ("xs", "ys")
             else np.empty(0, np.float64 if f.name not in ("level", "beacon")
                           else (np.int32 if f.name == "level" else bool))
             for f in RING_SCHEMA.fields}
        )
    xr, yr, off, L, bx1, by1, bx2, by2, area, cxs, cys = batch_ring_stats(
        ring_xs, ring_ys
    )
    keep = np.flatnonzero(np.abs(area) >= 1e-9)
    xs_out = []
    ys_out = []
    for i in keep:
        o, l = off[i], L[i]
        xs_out.append(np.concatenate((xr[o : o + l], xr[o : o + 1])))
        ys_out.append(np.concatenate((yr[o : o + l], yr[o : o + 1])))
    return pd.DataFrame(
        {
            "xs": pd.Series(xs_out, dtype=object),
            "ys": pd.Series(ys_out, dtype=object),
            "area": area[keep],
            "bx1": bx1[keep],
            "by1": by1[keep],
            "bx2": bx2[keep],
            "by2": by2[keep],
            "cx": cxs[keep],
            "cy": cys[keep],
            "level": np.full(keep.size, level, np.int32),
            "beacon": np.zeros(keep.size, bool),
        }
    )


def _merge_chain_cycles_local(chains: DataFrame) -> DataFrame:
    """One-task merge for perimeter-scale chain sets: coalesce(1)
    narrowly gathers the cached chain rows (no shuffle exchange) and a
    single dict walk closes every cycle — no CC driver rounds, no
    per-cycle grouped-map overhead. The same latency-vs-scale trade as
    stitch._assemble_rings_local, gated by the same kind of row-count
    threshold."""

    def merge_all(batches):
        rows = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                rows.append((r.head_key, r.tail_key, r.xs, r.ys))
        xs, ys = _merge_walk(rows)
        yield _rings_pdf(xs, ys, level=1)

    return chains.select("head_key", "tail_key", "xs", "ys").coalesce(1).mapInPandas(
        merge_all, RING_SCHEMA
    )


def _merge_chain_cycles_distributed(chains: DataFrame) -> DataFrame:
    """Scale-path merge: pointer-doubling CC (connected_keepers) labels
    each chain's cycle in O(log cycle length) rounds over narrow
    (id, id) rows; chains then hash-partition by label and every cycle
    is walked WITHIN its partition (one kernel call per partition, many
    cycles per call — cycles never straddle partitions because the
    partitioner keys on the label)."""
    from ..operators.dedup import connected_keepers

    pairs = chains.select(
        F.col("head_key").alias("id_a"), F.col("tail_key").alias("id_b")
    )
    labels = connected_keepers(pairs, id_col="hk")
    labeled = chains.join(
        labels.withColumnRenamed("hk", "head_key"), "head_key"
    )
    n_parts = max(
        int(chains.sparkSession.sparkContext.defaultParallelism), 8
    )
    part = labeled.repartition(n_parts, "keeper")

    def merge_part(batches):
        by_label: dict = {}
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                by_label.setdefault(r.keeper, []).append(
                    (r.head_key, r.tail_key, r.xs, r.ys)
                )
        all_xs: list = []
        all_ys: list = []
        for rows in by_label.values():
            xs, ys = _merge_walk(rows)
            all_xs.extend(xs)
            all_ys.extend(ys)
        yield _rings_pdf(all_xs, all_ys, level=1)

    return part.select("keeper", "head_key", "tail_key", "xs", "ys").mapInPandas(
        merge_part, RING_SCHEMA
    )


SPLIT_SCHEMA = T.StructType(
    [
        T.StructField("seg_id", T.LongType()),
        T.StructField("px", T.DoubleType()),
        T.StructField("py", T.DoubleType()),
    ]
)

SEG_SCHEMA = T.StructType(
    [
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
        T.StructField("x2", T.DoubleType()),
        T.StructField("y2", T.DoubleType()),
    ]
)


def _presplit_long_segments(
    segments: DataFrame,
    tile_size: float,
    x0: float,
    y0: float,
    x1g: float,
    y1g: float,
    snap_grid: float,
    n_segments: int | None = None,
    driver_gate: int = 4096,
) -> DataFrame:
    """One DISTRIBUTED round of snap-round noding (snap → find_splits →
    apply — exactly round 1 of ``node_segments`` on the same snapped,
    normalized, deduplicated input, so the downstream per-tile noding
    converges to the identical global noding). Purpose: inputs whose
    segments span many tiles (the reference's full-extent grid lines)
    force ``buffer_eff ≈ max segment length`` — every tile's window
    covers everything and each tile re-nodes the whole input. Splitting
    long segments at their (snapped) intersections first shortens them
    to feature scale, collapsing buffer_eff back to the user's buffer
    and the per-tile work back to per-tile volume.

    Exactness: per-tile ``find_splits`` over plain-bbox tile subsets
    computes, in union, exactly the global round-1 split set — every
    intersecting pair is co-present in the tile containing its
    intersection point (ε = 2·snap_grid boundary margin), and the
    split for a pair is pair-deterministic, so extra co-presences only
    produce duplicates (dropped). Cost: two narrow shuffles of segment
    rows; triggered only when max segment length > tile_size.

    Driver fast path (r5): when the INPUT is tiny (``n_segments`` ≤
    ``driver_gate``, e.g. a few thousand full-extent construction
    lines — the reference's lattice benches are 802–1602 segments),
    the distributed replica's ~6 stage waves are pure scheduling
    latency (~2 s measured at grid-400 with warm workers for ~50 ms
    of numpy). Run round 1 VERBATIM on the driver instead — same
    snap → normalize+dedup → find_splits → _apply_splits kernels as
    ``node_segments``, global, so bit-exactness is by definition
    rather than by the tile-union argument — and parallelize the
    split output (bounded by the split count the distributed path
    would also materialize). Worst-case driver work is gate² pair
    candidates (vectorized, grid-binned); 4096 keeps that trivial."""
    if n_segments is not None and n_segments <= driver_gate:
        from ..kernels.noding import (
            _apply_splits,
            _normalize_dedup,
            find_splits,
            snap as _snap,
        )

        pdf = segments.select("x1", "y1", "x2", "y2").toPandas()
        x1 = _snap(pdf["x1"].to_numpy(np.float64), snap_grid)
        y1 = _snap(pdf["y1"].to_numpy(np.float64), snap_grid)
        x2 = _snap(pdf["x2"].to_numpy(np.float64), snap_grid)
        y2 = _snap(pdf["y2"].to_numpy(np.float64), snap_grid)
        keep = ~((x1 == x2) & (y1 == y2))
        x1, y1, x2, y2 = x1[keep], y1[keep], x2[keep], y2[keep]
        x1, y1, x2, y2 = _normalize_dedup(x1, y1, x2, y2)
        si, px, py = find_splits(x1, y1, x2, y2, snap_grid)
        if si.size:
            x1, y1, x2, y2 = _apply_splits(x1, y1, x2, y2, si, px, py)
        # hand the split set back through a session temp parquet: a few
        # thousand full-extent lines can split into millions of pieces,
        # and a parallel parquet scan ships them ~5× cheaper than
        # createDataFrame's driver-serialized local relation (measured
        # at 1.28M rows: 1.1 s write+scan vs 5.9 s construct+scan)
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = os.path.join(
            _presplit_tmpdir(), f"presplit_{uuid.uuid4().hex}.parquet"
        )
        pq.write_table(
            pa.table({"x1": x1, "y1": y1, "x2": x2, "y2": y2}),
            path,
            row_group_size=65536,  # enough row groups to split the scan
        )
        out = segments.sparkSession.read.parquet(path)
        # stats are free on the driver — hand them back so the caller
        # skips its post-split agg job entirely. The parquet path rides
        # back too (r6, ADVICE r5): the caller deletes it once the
        # trace is materialized, so a long-lived driver issuing many
        # tiny-input polygonize calls no longer accumulates
        # multi-million-row handoff files until interpreter exit
        # (the atexit tmpdir removal stays as the backstop).
        l_new = float(np.sqrt((x2 - x1) ** 2 + (y2 - y1) ** 2).max()) if x1.size else 0.0
        return out, (l_new, int(x1.size)), None, path
    eps = 2.0 * max(snap_grid, 1e-300)
    cols = max(int(np.ceil((x1g - x0) / tile_size)), 1)
    rows = max(int(np.ceil((y1g - y0) / tile_size)), 1)

    def snap_norm(batches):
        from ..kernels.noding import snap

        for pdf in batches:
            x1 = snap(pdf["x1"].to_numpy(), snap_grid)
            y1 = snap(pdf["y1"].to_numpy(), snap_grid)
            x2 = snap(pdf["x2"].to_numpy(), snap_grid)
            y2 = snap(pdf["y2"].to_numpy(), snap_grid)
            keep = ~((x1 == x2) & (y1 == y2))
            x1, y1, x2, y2 = x1[keep], y1[keep], x2[keep], y2[keep]
            # orient start <= end (snap.rs:88-101 quirk incl. 1e-12 tie)
            swap = (x1 > x2) | ((np.abs(x1 - x2) < 1e-12) & (y1 > y2))
            nx1 = np.where(swap, x2, x1)
            ny1 = np.where(swap, y2, y1)
            nx2 = np.where(swap, x1, x2)
            ny2 = np.where(swap, y1, y2)
            yield pd.DataFrame({"x1": nx1, "y1": ny1, "x2": nx2, "y2": ny2})

    snapped = (
        segments.select("x1", "y1", "x2", "y2")
        .mapInPandas(snap_norm, SEG_SCHEMA)
        .dropDuplicates(["x1", "y1", "x2", "y2"])
    )
    seg_keyed = snapped.withColumn(
        "seg_id", F.xxhash64("x1", "y1", "x2", "y2")
    ).persist()

    sbx1 = F.least("x1", "x2") - F.lit(eps)
    sbx2 = F.greatest("x1", "x2") + F.lit(eps)
    sby1 = F.least("y1", "y2") - F.lit(eps)
    sby2 = F.greatest("y1", "y2") + F.lit(eps)
    # two-sided clamps: see stitch._tile_range_cols (descending-
    # sequence hazard — out-of-grid segments collapse into the edge
    # tile, where every mutually-intersecting out-of-grid pair still
    # meets because clamping is monotone)
    i_lo = F.least(F.greatest(F.floor((sbx1 - F.lit(x0)) / F.lit(tile_size)), F.lit(0)), F.lit(cols - 1)).cast("int")
    i_hi = F.greatest(F.least(F.floor((sbx2 - F.lit(x0)) / F.lit(tile_size)), F.lit(cols - 1)), F.lit(0)).cast("int")
    j_lo = F.least(F.greatest(F.floor((sby1 - F.lit(y0)) / F.lit(tile_size)), F.lit(0)), F.lit(rows - 1)).cast("int")
    j_hi = F.greatest(F.least(F.floor((sby2 - F.lit(y0)) / F.lit(tile_size)), F.lit(rows - 1)), F.lit(0)).cast("int")
    assigned = seg_keyed.withColumn("tile_i", F.explode(F.sequence(i_lo, i_hi))).withColumn(
        "tile_j", F.explode(F.sequence(j_lo, j_hi))
    )

    def split_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.noding import find_splits

        sid = pdf["seg_id"].to_numpy(np.int64)
        si, px, py = find_splits(
            pdf["x1"].to_numpy(),
            pdf["y1"].to_numpy(),
            pdf["x2"].to_numpy(),
            pdf["y2"].to_numpy(),
            snap_grid,
        )
        return pd.DataFrame({"seg_id": sid[si], "px": px, "py": py})

    # no dropDuplicates stage: cross-tile duplicate split points ride
    # into the collect and the apply kernel's post-sort dedup removes
    # them — one fewer 2×-split-row shuffle
    splits = (
        assigned.groupBy("tile_i", "tile_j")
        .applyInPandas(split_kernel, SPLIT_SCHEMA)
        .groupBy("seg_id")
        .agg(F.collect_list("px").alias("pxs"), F.collect_list("py").alias("pys"))
    )
    joined = seg_keyed.join(splits, "seg_id", "left")

    def apply_kernel(batches):
        # the noder's own vectorized split application over the whole
        # Arrow batch (kernels.noding._apply_splits — literally the
        # function the global noder runs in round 1, so the pre-split
        # output is its exact distributed replica; no per-segment
        # Python)
        from ..kernels.noding import _apply_splits

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            x1 = pdf["x1"].to_numpy(np.float64)
            y1 = pdf["y1"].to_numpy(np.float64)
            x2 = pdf["x2"].to_numpy(np.float64)
            y2 = pdf["y2"].to_numpy(np.float64)
            lens = np.fromiter(
                (0 if v is None else len(v) for v in pdf["pxs"]), np.int64, n
            )
            if lens.sum():
                seg_idx = np.repeat(np.arange(n), lens)
                px = np.concatenate(
                    [np.asarray(v, np.float64) for v in pdf["pxs"] if v is not None and len(v)]
                )
                py = np.concatenate(
                    [np.asarray(v, np.float64) for v in pdf["pys"] if v is not None and len(v)]
                )
                # hash-collision insurance: a foreign split point falls
                # off its segment's bbox
                bx1 = np.minimum(x1, x2)[seg_idx]
                bx2 = np.maximum(x1, x2)[seg_idx]
                by1 = np.minimum(y1, y2)[seg_idx]
                by2 = np.maximum(y1, y2)[seg_idx]
                ok = (px >= bx1) & (px <= bx2) & (py >= by1) & (py <= by2)
                nx1, ny1, nx2, ny2 = _apply_splits(
                    x1, y1, x2, y2, seg_idx[ok], px[ok], py[ok]
                )
            else:
                nx1, ny1, nx2, ny2 = x1, y1, x2, y2
            yield pd.DataFrame({"x1": nx1, "y1": ny1, "x2": nx2, "y2": ny2})

    # seg_keyed rides back so the caller can drop its cache once the
    # split output is materialized (it feeds both the tile groups and
    # the split join; nothing reads it after the apply)
    return joined.mapInPandas(apply_kernel, SEG_SCHEMA), None, seg_keyed, None


def chain_stitched_polygonize(
    lines_df: DataFrame,
    tile_size: float,
    buffer: float = 1.0,
    bbox: tuple[float, float, float, float] | None = None,
    snap_grid: float = DEFAULT_SNAP_GRID,
    drop_collapsed: bool = False,
    assembly: str = "auto",
    distributed_assembly_threshold: int = 200_000,
    chain_merge_threshold: int = 200_000,
    max_segments_per_tile: int | None = 200_000,
    max_split_factor: int = 16,
    target_segments_per_tile: int = 8000,
    _segments: DataFrame | None = None,
    _seg_stats: tuple[float, int] | None = None,
) -> DataFrame:
    """Exact distributed polygonize via boundary-chain stitching (module
    docstring). Output semantics match ``stitched_polygonize`` /
    single-group ``polygonize`` exactly.

    ``chain_merge_threshold``: chain sets at or below it merge in one
    coalesced task (a dict walk over perimeter-scale rows — far below
    the per-round latency of the distributed CC path); larger sets take
    the pointer-doubling CC + partition-local walk."""
    from .stitch import _assemble_rings_local, assemble_rings_distributed

    import time as _time

    _t = _time.time()
    _orig_tile = float(tile_size)
    _presplit_file: str | None = None
    segments = (
        _segments if _segments is not None else segmentize_df(lines_df).persist()
    )
    _to_unpersist = [segments]  # cache hygiene: dropped once consumed
    if bbox is None:
        bbox = _bbox_of_segments(segments)
    x0, y0, x1g, y1g = (float(v) for v in bbox)

    seg_len = F.sqrt(
        (F.col("x2") - F.col("x1")) ** 2 + (F.col("y2") - F.col("y1")) ** 2
    )
    if _seg_stats is not None:  # strategy-auto caller already paid this
        l_max, n_segments = _seg_stats
    else:
        _st = segments.agg(
            F.max(seg_len).alias("l"), F.count("*").alias("n")
        ).collect()[0]
        l_max = _st["l"] or 0.0
        n_segments = int(_st["n"])
    _t = _prof("segmentize+stats", _t)
    if (l_max / tile_size) ** 2 >= 32.0:
        # long-segment regime (full-extent lattice lines): buffer_eff
        # balloons to l_max, so a segment replicates to
        # O((l_max/tile_size)²) windows and every tile re-nodes far
        # beyond its share. One distributed pre-split round shortens
        # segments to feature scale first (exactness argument in
        # _presplit_long_segments). Gated on the replication factor:
        # below ~32 extra windows the two pre-split shuffles cost more
        # than the redundancy they remove (measured: grid-100/tile-25
        # regressed ~0.3 s, grid-400/tile-25 improved ~2.4 s).
        segments, _split_stats, _aux_cache, _presplit_file = _presplit_long_segments(
            segments, tile_size, x0, y0, x1g, y1g, snap_grid,
            n_segments=n_segments,
        )
        segments = segments.persist()
        _to_unpersist.append(segments)
        if _aux_cache is not None:
            _to_unpersist.append(_aux_cache)
        if _split_stats is not None:
            # driver fast path: stats came back with the frame — no
            # post-split agg job (the persist materializes lazily on
            # the trace's first touch)
            l_max, n_segments = _split_stats
        else:
            _st = segments.agg(
                F.max(seg_len).alias("l"), F.count("*").alias("n")
            ).collect()[0]
            l_max = _st["l"] or 0.0
            n_segments = int(_st["n"])
        # the raw segment cache is no longer read by anything downstream
        _to_unpersist.pop(0).unpersist()
        _t = _prof("presplit+stats", _t)
    buffer_eff = max(float(buffer), float(l_max) * (1 + 1e-9) + 4 * snap_grid)

    # Unlike tiled_polygonize (where tile_size defines output
    # ownership), the chain engine's tile grid is purely an INTERNAL
    # claiming partition — output is the global ring set for any tile
    # size, and exactness needs only buffer_eff ≥ max segment length.
    # So refine an overly coarse caller tile while the average per-tile
    # noding volume stays above ``target_segments_per_tile`` (coarse
    # tiles re-node quadratically more than their share on dense
    # linework). r5 re-tune with the fused assembly: 8k/tile (grid-400
    # stays at tile 50 / 64 tasks) beats the r4 4k (tile 25 / 256
    # tasks, which paid more in boundary chains + merged residue than
    # the finer windows saved) 7.7 s vs 9.9 s interleaved; 20k (16
    # tasks) under-parallelizes 32 cores. The ≥8×buffer_eff floor
    # keeps window replication bounded.
    tile_eff = float(tile_size)
    while True:
        cand = tile_eff / 2.0
        if cand < 8.0 * buffer_eff:
            break
        n_tiles = max(int(np.ceil((x1g - x0) / tile_eff)), 1) * max(
            int(np.ceil((y1g - y0) / tile_eff)), 1
        )
        if n_segments / n_tiles <= target_segments_per_tile:
            break
        tile_eff = cand
    tile_size = tile_eff

    cols = max(int(np.ceil((x1g - x0) / tile_size)), 1)
    rows = max(int(np.ceil((y1g - y0) / tile_size)), 1)
    sbx1 = F.least("x1", "x2")
    sbx2 = F.greatest("x1", "x2")
    sby1 = F.least("y1", "y2")
    sby2 = F.greatest("y1", "y2")
    i_lo, i_hi, j_lo, j_hi = _tile_range_cols(
        x0, y0, tile_size, buffer_eff, cols, rows, sbx1, sby1, sbx2, sby2
    )
    assigned = segments.withColumn("tile_i", F.explode(F.sequence(i_lo, i_hi))).withColumn(
        "tile_j", F.explode(F.sequence(j_lo, j_hi))
    )
    spark = lines_df.sparkSession

    # hot-tile skew sub-split (north_rule explicit salting; mirrors
    # stitch.py 3c): tiles whose window draws more than
    # max_segments_per_tile segments shatter into f×f claiming
    # sub-cells. In the chain protocol this is ONLY a finer claiming
    # partition — link keys are half-edge identities, so chains
    # crossing sub-cell boundaries merge exactly like tile-crossing
    # ones, with no ownership escalation machinery.
    fmap: dict[tuple[int, int], int] = {}
    # a tile's window count is bounded by the total segment count, so
    # when the whole input fits one kernel task no tile can be hot —
    # skip the per-tile count job entirely (the common small case)
    if max_segments_per_tile is not None and n_segments > max_segments_per_tile:
        fac_rows = (
            assigned.groupBy("tile_i", "tile_j")
            .count()
            .filter(F.col("count") > max_segments_per_tile)
            .collect()
        )
        fmap = {
            (int(r["tile_i"]), int(r["tile_j"])): int(
                min(
                    np.ceil(np.sqrt(r["count"] / max_segments_per_tile)),
                    max_split_factor,
                )
            )
            for r in fac_rows
        }
    if fmap:
        fdf = spark.createDataFrame(
            [(ti, tj, fv) for (ti, tj), fv in fmap.items()],
            "tile_i int, tile_j int, f int",
        )
        assigned = assigned.join(F.broadcast(fdf), ["tile_i", "tile_j"], "left").fillna(
            {"f": 1}
        )
        tile_x0 = F.lit(x0) + F.col("tile_i").cast("double") * F.lit(tile_size)
        tile_y0 = F.lit(y0) + F.col("tile_j").cast("double") * F.lit(tile_size)
        side = F.lit(tile_size) / F.col("f")
        # two-sided clamps: see stitch._tile_range_cols (descending-
        # sequence hazard)
        si_lo = F.least(F.greatest(F.ceil((sbx1 - F.lit(buffer_eff) - tile_x0) / side - 1), F.lit(0)), F.col("f") - 1).cast("int")
        si_hi = F.greatest(F.least(F.floor((sbx2 + F.lit(buffer_eff) - tile_x0) / side), F.col("f") - 1), F.lit(0)).cast("int")
        sj_lo = F.least(F.greatest(F.ceil((sby1 - F.lit(buffer_eff) - tile_y0) / side - 1), F.lit(0)), F.col("f") - 1).cast("int")
        sj_hi = F.greatest(F.least(F.floor((sby2 + F.lit(buffer_eff) - tile_y0) / side), F.col("f") - 1), F.lit(0)).cast("int")
        assigned = assigned.withColumn("sub_i", F.explode(F.sequence(si_lo, si_hi))).withColumn(
            "sub_j", F.explode(F.sequence(sj_lo, sj_hi))
        )
    else:
        assigned = (
            assigned.withColumn("f", F.lit(1))
            .withColumn("sub_i", F.lit(0))
            .withColumn("sub_j", F.lit(0))
        )
    key_cols = ["tile_i", "tile_j", "f", "sub_i", "sub_j"]
    n_parts = max(int(spark.sparkContext.defaultParallelism) * 2, 16)
    assigned = assigned.repartition(n_parts, *key_cols)

    if assembly not in ("auto", "local", "distributed", "split", "fused"):
        raise ValueError(
            f"assembly must be auto|local|distributed|split|fused, got {assembly!r}"
        )
    # r5 in-trace assembly (assembly="fused", experimental, NEVER the
    # auto pick): assembling polygons inside the trace kernel LOST the
    # interleaved A/B to the phase-2 fused assembly on every workload
    # (grid-400 7.6 s vs 6.1, grid-100 3.6 s vs 1.3, grid-800 15.0 s
    # vs 13.6, sparse-60k ~2× — BENCH.md r5) — the avoided second
    # Python pass over ring coordinates was already cheap (parallel
    # map over the cached trace output), while the fused trace pays a
    # 21-field Arrow schema on EVERY ring plus a driver round-trip for
    # the merged residue. Kept as an explicit option because it is the
    # one shape whose finish moves only narrow rows when the merged
    # residue is tiny; auto stays on the measured winner.
    use_fused_trace = assembly == "fused"
    kernel = (
        _make_chain_fused_kernel if use_fused_trace else _make_chain_kernel
    )(x0, y0, float(tile_size), buffer_eff, snap_grid, cols, rows, fmap)
    out = assigned.groupBy(*key_cols).applyInPandas(
        kernel, CHAIN_FUSED_SCHEMA if use_fused_trace else CHAIN_SCHEMA
    )
    if use_fused_trace:
        out = out.persist()
    else:
        # r6: self-GC'd localCheckpoint instead of persist — blocks are
        # ContextCleaner-freed when the returned plan drops (no
        # CacheManager entry to leak or to plan-match a later run), and
        # the final plan may legitimately keep reading it (the fused
        # assembly's bypass rows flow straight from here — zero extra
        # copies of plain ring bytes)
        out = out.localCheckpoint(eager=False)

    if not use_fused_trace:
        local_rings = out.where(F.col("kind") == 0).select(
            "xs", "ys", "area", "bx1", "by1", "bx2", "by2", "cx", "cy",
            F.lit(0).cast("int").alias("level"), F.lit(False).alias("beacon"),
        )
    chains = out.where(F.col("kind") == 1)
    # ONE job over the checkpointed kernel output supplies all three
    # decisions (merge strategy + assembly strategy + the r6 bypass's
    # CW-core set): n_chains exactly, n_local + n_chains as an upper
    # bound on the final ring count (each chain cycle yields ≤ its
    # chain count in rings), and — when no hot-tile split is active —
    # the distinct claim cores holding a CW ring (the interesting set
    # for the fused assembly's phase-2 bypass; empty on lattices).
    # coords ride along (free in the same scan): the merged ring set
    # concatenates chain coordinate arrays, so its total coordinate
    # count is bounded by the chain total + one closing vertex per
    # ring — letting the fused assembly skip the incremental limit
    # gate and collect the residue through one parallel Arrow job
    from .assembly import core_key_col

    kc_aggs = [F.count("*").alias("n"), F.sum(F.size("xs")).alias("c")]
    if not use_fused_trace and not fmap:
        kc_aggs.append(
            F.collect_set(
                F.when(
                    (F.col("kind") == 0) & (F.col("area") < 0),
                    core_key_col(x0, y0, float(tile_size), cols, rows),
                )
            ).alias("cwc")
        )
    kc_rows = out.groupBy("kind").agg(*kc_aggs).collect()
    kc = {int(r["kind"]): (int(r["n"]), int(r["c"] or 0)) for r in kc_rows}
    cw_cores = None
    if not use_fused_trace and not fmap:
        cw_cores = {
            int(v)
            for r in kc_rows
            if int(r["kind"]) == 0
            for v in (r["cwc"] or ())
        }
    _t = _prof("trace+counts", _t)
    n_chains, chain_coords = kc.get(1, (0, 0))
    n_rings_upper = kc.get(0, (0, 0))[0] + n_chains
    # the counts job materialized the kernel output cache — the segment
    # cache behind it (and the driver pre-split parquet handoff, if
    # any) is dead weight from here on
    for df_ in _to_unpersist:
        df_.unpersist()
    if _presplit_file is not None:
        try:
            os.remove(_presplit_file)
        except OSError:
            pass
    if n_chains == 0:
        merged = None
    elif n_chains <= chain_merge_threshold:
        merged = _merge_chain_cycles_local(chains)
    else:
        merged = _merge_chain_cycles_distributed(chains)
    _t = _prof("merge_build", _t)

    if use_fused_trace:
        from .assembly import assemble_rings_fused_trace

        res = assemble_rings_fused_trace(
            out, merged, x0, y0, float(tile_size), cols, rows, fmap,
            drop_collapsed=drop_collapsed, release=out.unpersist,
        )
        _t = _prof("fused_trace_finish", _t)
        if res is not None:
            return res
        # pathological merged residue tripped the collection gates:
        # lossless fallback — re-run with ring emission + the
        # distributed assembly (costs one extra trace; residues this
        # size mean the input is boundary-dominated anyway)
        out.unpersist()
        return chain_stitched_polygonize(
            lines_df, _orig_tile, buffer=buffer, bbox=bbox,
            snap_grid=snap_grid, drop_collapsed=drop_collapsed,
            assembly="distributed",
            distributed_assembly_threshold=distributed_assembly_threshold,
            chain_merge_threshold=chain_merge_threshold,
            max_segments_per_tile=max_segments_per_tile,
            max_split_factor=max_split_factor,
            target_segments_per_tile=target_segments_per_tile,
        )

    if assembly == "auto":
        # r5: large ring sets take the FUSED per-core assembly (zero
        # extra shuffles of ring data) instead of the global joins —
        # the r4 perf-weak global-assembly floor. Crossover measured on
        # the lattice sweep (BENCH.md r5): one-task local assembly wins
        # to ~40k rings (fused pays ~4 fixed job latencies), fused wins
        # by 160k (serial assembly of 10⁵ rings loses to 64-way tasks)
        # — and only fused survives 100×, so the tie goes to it.
        assembly = (
            "local"
            if n_rings_upper <= min(distributed_assembly_threshold, 100_000)
            else "split"
        )
    if assembly == "split":
        from .assembly import assemble_rings_fused

        # fused phase-2: maps over the checkpointed trace output (no
        # ring reshuffle — every trace-local ring's core is derived
        # from its bbox corner, bit-exactly the claiming core). No
        # release callback: the trace checkpoint is self-GC'd and the
        # bypass rows in the final plan read it directly (r6).
        return assemble_rings_fused(
            out, merged, x0, y0, float(tile_size), cols, rows, fmap,
            drop_collapsed=drop_collapsed, release=None,
            merged_rows_bound=n_chains,
            merged_coords_bound=chain_coords + n_chains,
            cw_cores=cw_cores,
        )

    rings = local_rings if merged is None else local_rings.unionByName(merged)
    rings = rings.withColumn("rid", F.xxhash64("xs", "ys")).drop("beacon")
    if assembly == "local":
        # single consumer, one coalesced task — reads the trace
        # checkpoint narrowly, no intermediate ring copy needed (r6;
        # the eager ring checkpoint existed only so the old persist
        # could be released early)
        return _assemble_rings_local(rings, drop_collapsed=drop_collapsed)
    # distributed assembly re-consumes the ring set from several joins —
    # one eager executor-local checkpoint serves every consumer (blocks
    # GC-cleaned when the frame drops)
    rings = rings.localCheckpoint(eager=True)
    return assemble_rings_distributed(rings, drop_collapsed=drop_collapsed)
