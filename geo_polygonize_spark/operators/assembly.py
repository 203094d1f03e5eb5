"""Split ring assembly: per-tile polygon assembly for tile-local rings,
with only the boundary residue routed through a global pass (r5,
VERDICT r4 item 2 — the global-assembly floor).

Both stitch variants used to finish with ``assemble_rings_distributed``
(stitch.py): a 6-8-shuffle global DAG over the FULL ring set, while
``tiled_polygonize`` assembles per tile inside its trace kernel
(reference analog src/tiling.rs:85-106) and pays no global pass. On a
lattice coverage nearly every ring is tile-local after chain closure, so
the global pass is almost pure overhead. This module restores per-tile
assembly for the stitched paths without giving up exactness.

Protocol
--------
Fix an assembly grid (``x0``, ``y0``, ``tile_size`` — any grid is
correct; callers pass the engine's claiming grid).

1. **Classification.** A ring is *local* to tile ``(ti, tj)`` —
   ``ti = floor((bx1-x0)/ts)`` — iff its bbox fits that tile's CLOSURE
   (``bx2 ≤ x0+(ti+1)·ts`` and the y analog). Everything else is
   *global*. Closure-fitting matters: on a lattice aligned with the
   grid, rings that merely TOUCH a tile edge stay local, and the global
   set collapses to the genuinely crossing rings (typically just the
   coverage hull).
2. **Global residue (driver).** The global set is size-gated (fallback:
   the old full global pass). Promotion runs driver-side among global
   rings only — twins share an exact bbox, hence a class — yielding the
   *global shells*, broadcast (meta + coords) to every tile task. Every
   global CW ring (promoted or not: promotion adds shell-hood, it does
   not remove hole-hood — a promoted hull is still absorbed by any
   strictly larger container) becomes a *visitor* hole, routed to the
   tile(s) whose closure contains their centroid.
3. **Per-tile kernel.** One grouped-map pass per tile over its local
   rings + visiting holes: member promotion (exact-bbox twins are
   always co-grouped), then hole→parent assignment where each hole's
   candidate set is (this tile's shells) ∪ (broadcast global shells).
   *Completeness lemma*: PIP(c, s) ⇒ c ∈ bbox(s) ⊆ closure(tile(s)),
   so every possible local parent of a hole lives in a tile whose
   closure contains the hole's centroid — exactly the tiles the hole
   visits. Winner = lexicographic min (area, rid) over candidates.
   - Hole with centroid STRICTLY inside the tile: the candidate set is
     complete here → resolve now. Local winner: attach in-kernel (the
     polygon never leaves the task). Global winner: emit a NARROW
     ``(h_rid, win_rid)`` row — coordinates don't move.
   - Hole with centroid exactly ON a gridline (|touching tiles| > 1):
     *deferred* — every touching tile emits its best candidate as a
     narrow row and the finish takes the min across tiles.
4. **Finish (narrow).** Per-hole winners = final rows ∪ (anchored min
   of deferred rows). Winners targeting global shells aggregate to net
   areas first; hole coordinate arrays are fetched from the ring set
   ONLY for shells that survive ``drop_collapsed`` (on a grid coverage
   the hull absorbs every CW cell ring and nets to zero, so nothing is
   fetched at all). Winners targeting local shells (rare: a hole whose
   centroid sits inside a different tile's shell via a gridline, or a
   concave global hole whose centroid lands in a local shell) patch the
   already-emitted polygons through a broadcast join — kernel output is
   never reshuffled. ``drop_collapsed`` is applied in the finish (the
   kernel can't know about late-arriving patches), a narrow filter.

Scale shape: ring coordinates cross exactly ONE shuffle (the group-by
into tile tasks) in the common path; every later stage moves narrow
winner rows (which carry only their own hole's coords) or
survivor-pruned arrays — the finish never re-reads the caller's ring
caches. The global residue is O(tile-boundary crossings) with an
explicit gate and a lossless fallback.

Reference parity: operational semantics are those of
``kernels.rings._assemble_core`` (reference polygonizer.rs:124-261) —
same degenerate filter, exact-bbox twin promotion (polygonizer.rs:
152-185), strictly-larger min-area parent rule (polygonizer.rs:226),
and final unsigned-area filter (polygonizer.rs:255-258).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..kernels.bboxjoin import bbox_join
from ..kernels.rings import _pip_many_vs_ring
from .polygonize_op import POLYGON_SCHEMA

# kernel emission kinds
K_POLY = 0      # finished polygon (assembled in-task)
K_FINAL = 1     # final hole→global-shell assignment (narrow)
K_PARTIAL = 4   # deferred hole: best candidate from one touching tile

SPLIT_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.IntegerType()),
        T.StructField("rid", T.LongType()),
        T.StructField("shell_xs", T.ArrayType(T.DoubleType())),
        T.StructField("shell_ys", T.ArrayType(T.DoubleType())),
        T.StructField("hole_xs", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("hole_ys", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("n_holes", T.IntegerType()),
        T.StructField("net_area", T.DoubleType()),
        T.StructField("cx", T.DoubleType()),
        T.StructField("cy", T.DoubleType()),
        T.StructField("h_rid", T.LongType()),
        T.StructField("cand_rid", T.LongType()),
        T.StructField("cand_area", T.DoubleType()),
        T.StructField("h_area", T.DoubleType()),
        # hole coordinates ride ON the winner rows (the kernels hold
        # them anyway), so the finish never re-reads the caller's ring
        # cache — merged-visitor rows (fused path) leave them null and
        # resolve from the driver-side residue
        T.StructField("h_xs", T.ArrayType(T.DoubleType())),
        T.StructField("h_ys", T.ArrayType(T.DoubleType())),
    ]
)

_RING_COLS = ["rid", "xs", "ys", "area", "bx1", "by1", "bx2", "by2", "cx", "cy"]


def _touching_tiles(cx: float, cy: float, x0: float, y0: float, ts: float):
    """Tiles whose CLOSURE contains the point — 1, 2, or 4 of them.
    Float-exact: a point lies on a gridline iff it equals the floor
    gridline value under the same IEEE sequence the kernel and the SQL
    routing use."""
    i = int(np.floor((cx - x0) / ts))
    j = int(np.floor((cy - y0) / ts))
    tis = [i]
    tjs = [j]
    if cx == x0 + i * ts:
        tis.append(i - 1)
    if cy == y0 + j * ts:
        tjs.append(j - 1)
    return [(a, b) for a in tis for b in tjs]


def _promote_rows(rows):
    """Exact-bbox twin promotion over collected global rings (same rule
    as kernels.rings._assemble_core, polygonizer.rs:152-185). Returns
    (shells, visitors): shells = CCW rows + promoted CW rows as
    (row, promoted) pairs; visitors = ALL CW rows — in the reference
    semantics a promoted CW ring is BOTH a shell and still assigned as
    a hole to its smallest strictly-larger container (that is how a
    coverage hull nets to zero on a filled grid)."""
    by_bbox: dict = {}
    for r in rows:
        if r["area"] > 0:
            by_bbox.setdefault(
                (r["bx1"], r["by1"], r["bx2"], r["by2"]), []
            ).append(r["area"])
    shells = []
    visitors = []
    for r in rows:
        if r["area"] > 0:
            shells.append((r, False))
        else:
            h_area = -r["area"]
            visitors.append(r)
            twins = by_bbox.get((r["bx1"], r["by1"], r["bx2"], r["by2"]), ())
            if not any(abs(s - h_area) < 1e-6 for s in twins):
                shells.append((r, True))  # promoted — AND a hole above
    return shells, visitors


def _make_split_kernel(x0: float, y0: float, ts: float, gbc):
    """Per-tile assembly kernel. ``gbc``: broadcast global-shell payload
    (g_rid, g_area int64/float64 arrays, g_bbox arrays, coords list)."""

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from .spatial_join import _ray_cast_rows

        g = gbc.value
        n = len(pdf)
        role = pdf["role"].to_numpy()
        area = pdf["area"].to_numpy()
        rid = pdf["rid"].to_numpy()
        cx = pdf["cx"].to_numpy()
        cy = pdf["cy"].to_numpy()
        bx1 = pdf["bx1"].to_numpy()
        by1 = pdf["by1"].to_numpy()
        bx2 = pdf["bx2"].to_numpy()
        by2 = pdf["by2"].to_numpy()
        coords_x = [np.asarray(v, np.float64) for v in pdf["xs"]]
        coords_y = [np.asarray(v, np.float64) for v in pdf["ys"]]

        member = role == 0
        mem_ccw = member & (area > 0.0)
        mem_cw = member & (area < 0.0)

        # --- member promotion: exact-bbox twin lookup ----------------
        by_bbox: dict = {}
        for i in np.flatnonzero(mem_ccw).tolist():
            by_bbox.setdefault(
                (bx1[i], by1[i], bx2[i], by2[i]), []
            ).append(area[i])
        promoted = np.zeros(n, dtype=bool)
        for k in np.flatnonzero(mem_cw).tolist():
            twins = by_bbox.get((bx1[k], by1[k], bx2[k], by2[k]), ())
            if not any(abs(s + area[k]) < 1e-6 for s in twins):
                promoted[k] = True

        shell_idx = np.flatnonzero(mem_ccw | (mem_cw & promoted))
        s_area = np.abs(area[shell_idx])
        # every CW ring is an assignment candidate — promotion makes it
        # ALSO a shell, it does not stop it being a hole (see
        # _promote_rows; kernels.rings._assemble_core assigns over
        # hole_ids = all CW rings, promoted included)
        hole_idx = np.flatnonzero(mem_cw | ~member)
        nh = hole_idx.size
        h_area = np.abs(area[hole_idx])
        hx = cx[hole_idx]
        hy = cy[hole_idx]

        # --- candidate search: local shells ∪ broadcast globals ------
        best_area = np.full(nh, np.inf)
        best_rid = np.full(nh, np.iinfo(np.int64).max, dtype=np.int64)
        best_local = np.full(nh, -1, dtype=np.int64)  # local shell_idx pos

        def update(hsel, areas_c, rids_c, local_pos):
            # lexicographic (area, rid) min — deterministic and
            # symmetric across the per-tile / finish resolution
            take = (areas_c < best_area[hsel]) | (
                (areas_c == best_area[hsel]) & (rids_c < best_rid[hsel])
            )
            rows = hsel[take]
            best_area[rows] = areas_c[take]
            best_rid[rows] = rids_c[take]
            best_local[rows] = local_pos[take] if local_pos is not None else -1

        if nh and shell_idx.size:
            si, hj = bbox_join(
                bx1[shell_idx], by1[shell_idx], bx2[shell_idx], by2[shell_idx],
                hx, hy, hx, hy,
            )
            bigger = s_area[si] > h_area[hj] + 1e-6  # polygonizer.rs:226
            si, hj = si[bigger], hj[bigger]
            if si.size:
                inside = np.zeros(si.size, dtype=bool)
                uq, ucount = np.unique(si, return_counts=True)
                heavy = np.zeros(si.size, dtype=bool)
                for u in uq[(ucount * np.fromiter(
                    (coords_x[shell_idx[u]].size for u in uq.tolist()),
                    np.int64, uq.size,
                )) > 4_000_000].tolist():
                    rows = np.flatnonzero(si == u)
                    heavy[rows] = True
                    inside[rows] = _pip_many_vs_ring(
                        hx[hj[rows]], hy[hj[rows]],
                        coords_x[shell_idx[u]], coords_y[shell_idx[u]],
                    )
                light = np.flatnonzero(~heavy)
                if light.size:
                    inside[light] = _ray_cast_rows(
                        hx[hj[light]], hy[hj[light]],
                        [
                            (coords_x[shell_idx[u]], coords_y[shell_idx[u]])
                            for u in si[light].tolist()
                        ],
                    )
                si, hj = si[inside], hj[inside]
                if si.size:
                    # reduce to ONE candidate per hole before the merge
                    # with globals (update() compares against the
                    # pre-call best, so duplicate holes in one call
                    # would be last-write-wins, not min)
                    srid = rid[shell_idx[si]]
                    order = np.lexsort((srid, s_area[si], hj))
                    first = np.concatenate(
                        ([True], hj[order][1:] != hj[order][:-1])
                    )
                    sel = order[first]
                    update(hj[sel], s_area[si[sel]], srid[sel], si[sel])

        if nh and g["n"]:
            for gi in range(g["n"]):
                ga = g["area"][gi]
                m = np.flatnonzero(
                    (hx >= g["bx1"][gi]) & (hx <= g["bx2"][gi])
                    & (hy >= g["by1"][gi]) & (hy <= g["by2"][gi])
                    & (ga > h_area + 1e-6)
                )
                if m.size == 0:
                    continue
                ins = _pip_many_vs_ring(
                    hx[m], hy[m], g["xs"][gi], g["ys"][gi]
                )
                m = m[ins]
                if m.size:
                    update(
                        m,
                        np.full(m.size, ga),
                        np.full(m.size, g["rid"][gi], dtype=np.int64),
                        None,
                    )

        # --- deferral: centroid exactly on an assembly gridline ------
        gx = x0 + np.floor((hx - x0) / ts) * ts
        gy = y0 + np.floor((hy - y0) / ts) * ts
        deferred = (hx == gx) | (hy == gy)
        has_cand = np.isfinite(best_area)

        # --- emissions -----------------------------------------------
        out: dict[str, list] = {k.name: [] for k in SPLIT_SCHEMA.fields}

        def emit(kind, **kw):
            out["kind"].append(kind)
            for f in SPLIT_SCHEMA.fields[1:]:
                out[f.name].append(kw.get(f.name))

        # attached[local shell pos] -> list of hole positions
        attach: dict[int, list[int]] = {}
        for p in range(nh):
            if deferred[p]:
                if has_cand[p]:
                    emit(
                        K_PARTIAL,
                        h_rid=int(rid[hole_idx[p]]),
                        cand_rid=int(best_rid[p]),
                        cand_area=float(best_area[p]),
                        h_area=float(h_area[p]),
                        h_xs=coords_x[hole_idx[p]],
                        h_ys=coords_y[hole_idx[p]],
                    )
            elif has_cand[p]:
                if best_local[p] >= 0:
                    attach.setdefault(int(best_local[p]), []).append(p)
                else:
                    emit(
                        K_FINAL,
                        h_rid=int(rid[hole_idx[p]]),
                        cand_rid=int(best_rid[p]),
                        cand_area=float(best_area[p]),
                        h_area=float(h_area[p]),
                        h_xs=coords_x[hole_idx[p]],
                        h_ys=coords_y[hole_idx[p]],
                    )
            # no candidate, not deferred: unparented hole — vanishes
            # (identical to _assemble_core: never attached anywhere)

        for pos in range(shell_idx.size):
            i = shell_idx[pos]
            xs_i, ys_i = coords_x[i], coords_y[i]
            if promoted[i]:  # re-wind CCW (polygonizer.rs:164-169)
                xs_i, ys_i = xs_i[::-1], ys_i[::-1]
            holes = attach.get(pos, ())
            emit(
                K_POLY,
                rid=int(rid[i]),
                shell_xs=xs_i,
                shell_ys=ys_i,
                hole_xs=[coords_x[hole_idx[p]] for p in holes],
                hole_ys=[coords_y[hole_idx[p]] for p in holes],
                n_holes=len(holes),
                net_area=float(s_area[pos] - h_area[list(holes)].sum()),
                cx=float(cx[i]),
                cy=float(cy[i]),
            )
        # object dtype throughout: mixed int/None long columns must NOT
        # collapse to float64 (pandas' default), which silently zeroes
        # the low bits of 64-bit rids — Arrow casts object → schema
        return pd.DataFrame(
            {k: pd.Series(v, dtype=object) for k, v in out.items()}
        )

    return kernel


_BYPASS_TILE_GATE = 4096


def _split_tagged(rings: DataFrame, x0: float, y0: float, ts: float) -> DataFrame:
    """Non-degenerate rings tagged with their bbox-corner tile and the
    tile-local test — shared by the summary aggregate and the split
    assembly body (bit-identical column expressions by construction)."""
    nd = rings.where(F.abs("area") >= 1e-9)  # polygonizer.rs:138-140
    ti = F.floor((F.col("bx1") - x0) / ts).cast("int")
    tj = F.floor((F.col("by1") - y0) / ts).cast("int")
    is_local = (
        (F.col("bx2") <= F.lit(x0) + (ti + 1).cast("double") * ts)
        & (F.col("by2") <= F.lit(y0) + (tj + 1).cast("double") * ts)
    )
    return nd.withColumn("ti", ti).withColumn("tj", tj).withColumn(
        "is_local", is_local
    )


def split_ring_summary(rings: DataFrame, x0: float, y0: float, ts: float):
    """The split assembly's one-scan summary row (global-residue gate
    counts, driver-gated distinct CW member cells, and the TOTAL
    non-degenerate ring count so a caller's strategy decision shares
    this scan instead of paying its own count job)."""
    tagged = _split_tagged(rings, x0, y0, float(ts))
    cw_struct = F.when(
        F.col("is_local") & (F.col("area") < 0),
        F.struct(
            F.col("ti").alias("i"), F.col("tj").alias("j"),
            F.col("cx").alias("x"), F.col("cy").alias("y"),
        ),
    )
    return tagged.agg(
        F.count("*").alias("n_all"),
        F.count(F.when(~F.col("is_local"), 1)).alias("n"),
        F.coalesce(
            F.sum(F.when(~F.col("is_local"), F.size("xs"))), F.lit(0)
        ).alias("c"),
        F.slice(
            F.sort_array(F.collect_set(cw_struct)), 1, _BYPASS_TILE_GATE + 1
        ).alias("cw_cells"),
        F.size(F.collect_set(cw_struct)).alias("n_cw_cells"),
    ).collect()[0]


def assemble_rings_split(
    rings: DataFrame,
    x0: float,
    y0: float,
    tile_size: float,
    drop_collapsed: bool = False,
    global_rows_gate: int = 100_000,
    global_coords_gate: int = 10_000_000,
    rings_cached: bool = False,
    summary=None,
) -> DataFrame:
    """Assemble polygons from a ring set (RING_SCHEMA + rid), per-tile
    for tile-local rings (module docstring). Output schema and
    semantics identical to ``assemble_rings_distributed``; falls back
    to it when the global residue exceeds the gates.

    ``rings_cached``: pass True when the caller already persisted or
    checkpointed ``rings``; otherwise this function persists it for its
    own 2-3 consumers and releases it inside the finish (winner rows
    carry their hole coords, so the returned plan never references the
    transient cache)."""
    from .stitch import assemble_rings_distributed

    import os as _os
    import time as _time
    _sprof = bool(_os.environ.get("GP_ASM_PROF"))
    _st = {"t": _time.time()}

    def _smark(name):
        if _sprof:
            now = _time.time()
            print(f"SPLITPROF| {name}: {now - _st['t']:.3f}", flush=True)
            _st["t"] = now

    spark = rings.sparkSession
    ts = float(tile_size)
    own_cache = not rings_cached
    if own_cache:
        rings = rings.persist()
    tagged = _split_tagged(rings, x0, y0, ts)

    # ONE summary aggregate over the ring set (r6 — was three separate
    # full scans: the global gate, the CW tile-key job and the residue
    # stats): global residue gate counts + the distinct CW member cells
    # (tile + centroid, driver-gated, sorted for determinism) that
    # drive the member bypass below. Then the residue itself is fetched
    # through one PARALLEL Arrow job — Spark's incremental
    # limit().collect() runs 1→4→20-task waves and converts ring arrays
    # row-by-row through py4j. Callers that already aggregated the
    # summary for their own strategy decision pass it in (``summary``)
    # and this function runs zero extra full scans before the kernel.
    glob = tagged.where(~F.col("is_local")).select(*_RING_COLS)
    if summary is None:
        summary = split_ring_summary(rings, x0, y0, ts)
        _smark("summary_job")
    if (
        int(summary["n"]) > global_rows_gate
        or int(summary["c"]) > global_coords_gate
    ):
        # pathological tiling (rings >> tile): the split brings nothing
        # (rings is cached on either branch of ``rings_cached``)
        return assemble_rings_distributed(rings, drop_collapsed)
    grows = glob.toPandas().to_dict("records") if int(summary["n"]) else []
    gshells, gvisitors = _promote_rows(grows)
    _smark("glob_collect")

    payload = {
        "n": len(gshells),
        "rid": np.fromiter((r["rid"] for r, _ in gshells), np.int64, len(gshells)),
        "area": np.fromiter((abs(r["area"]) for r, _ in gshells), np.float64, len(gshells)),
        "bx1": np.fromiter((r["bx1"] for r, _ in gshells), np.float64, len(gshells)),
        "by1": np.fromiter((r["by1"] for r, _ in gshells), np.float64, len(gshells)),
        "bx2": np.fromiter((r["bx2"] for r, _ in gshells), np.float64, len(gshells)),
        "by2": np.fromiter((r["by2"] for r, _ in gshells), np.float64, len(gshells)),
        "xs": [np.asarray(r["xs"], np.float64) for r, _ in gshells],
        "ys": [np.asarray(r["ys"], np.float64) for r, _ in gshells],
    }
    gbc = spark.sparkContext.broadcast(payload)

    members = tagged.where("is_local").select(
        F.col("ti").alias("tile_i"), F.col("tj").alias("tile_j"),
        F.lit(0).alias("role"), *_RING_COLS,
    )
    # boundary member holes also visit neighbor tiles (narrow rows in
    # practice — a snapped centroid rarely lands exactly on a gridline)
    # r6 member bypass (same argument as the fused path): a tile with
    # no CW member, no boundary visit and no global visitor produces
    # identity K_POLY rows for every member — skip the coords shuffle
    # AND the Python kernel for those members entirely (the dominant
    # assembly cost on a lattice is moving every ring's coordinates
    # through the groupBy exchange + two Arrow conversions). The
    # interesting-tile set is collected narrow (driver-gated) below.
    gxf = F.lit(x0) + F.floor((F.col("cx") - x0) / ts) * ts
    gyf = F.lit(y0) + F.floor((F.col("cy") - y0) / ts) * ts
    ci = F.floor((F.col("cx") - x0) / ts).cast("int")
    cj = F.floor((F.col("cy") - y0) / ts).cast("int")
    on_x = F.col("cx") == gxf
    on_y = F.col("cy") == gyf
    # the full touching set {ci, ci-1 if on_x} × {cj, cj-1 if on_y}
    # minus the home tile — note (ci, cj) itself IS a neighbor when the
    # centroid sits on the home tile's UPPER edge (then ti == ci-1)
    neighbor_keys = F.filter(
        F.array(
            F.struct(ci.alias("i"), cj.alias("j")),
            F.when(on_x, F.struct((ci - 1).alias("i"), cj.alias("j"))),
            F.when(on_y, F.struct(ci.alias("i"), (cj - 1).alias("j"))),
            F.when(on_x & on_y, F.struct((ci - 1).alias("i"), (cj - 1).alias("j"))),
        ),
        lambda s: s.isNotNull()
        & ~((s["i"] == F.col("ti")) & (s["j"] == F.col("tj"))),
    )
    boundary_visits = (
        tagged.where("is_local")
        .where((F.col("area") < 0) & (on_x | on_y))
        .withColumn("nk", F.explode(neighbor_keys))
        .select(
            F.col("nk.i").alias("tile_i"), F.col("nk.j").alias("tile_j"),
            F.lit(2).alias("role"), *_RING_COLS,
        )
    )

    # interesting tiles = every CW member's home tile + its boundary
    # neighbor tiles (from the summary's distinct CW cells —
    # _touching_tiles mirrors the SQL on_x/on_y float math) + the
    # global visitors' touching tiles. Gated: a hole-dominated input
    # whose CW cell set exceeds the gate keeps the full Python pass.
    bypass = None
    boundary_needed = True
    if int(summary["n_cw_cells"]) <= _BYPASS_TILE_GATE:
        interesting_tiles = set()
        boundary_needed = False
        for c in summary["cw_cells"] or ():
            touch = _touching_tiles(float(c["x"]), float(c["y"]), x0, y0, ts)
            interesting_tiles.add((int(c["i"]), int(c["j"])))
            interesting_tiles.update(touch)
            if len(touch) > 1:
                boundary_needed = True
        for r in gvisitors:
            for ab in _touching_tiles(float(r["cx"]), float(r["cy"]), x0, y0, ts):
                interesting_tiles.add(ab)
        _B = 1 << 32
        tkey = F.col("tile_i").cast("long") * F.lit(_B) + F.col("tile_j").cast("long")
        plain, members = _bypass_interesting_split(
            members,
            tkey,
            {a * _B + b for a, b in interesting_tiles},
            spark,
        )
        bypass = _bypass_poly_rows(plain)

    # the boundary-visit subtree is its own scan of the ring set — skip
    # it when the summary proves no CW member centroid sits on a
    # gridline (every lattice coverage)
    kernel_input = (
        members.unionByName(boundary_visits) if boundary_needed else members
    )
    if gvisitors:
        vrows = []
        for r in gvisitors:
            touch = _touching_tiles(float(r["cx"]), float(r["cy"]), x0, y0, ts)
            for (a, b) in touch:
                vrows.append(
                    (a, b, 1, int(r["rid"]), np.asarray(r["xs"], np.float64),
                     np.asarray(r["ys"], np.float64), float(r["area"]),
                     float(r["bx1"]), float(r["by1"]), float(r["bx2"]),
                     float(r["by2"]), float(r["cx"]), float(r["cy"]))
                )
        # pandas + Arrow path: rows carry coordinate arrays (which may
        # be numpy from the Arrow residue collect above)
        vcols = ["tile_i", "tile_j", "role", "rid", "xs", "ys",
                 "area", "bx1", "by1", "bx2", "by2", "cx", "cy"]
        vpdf = pd.DataFrame(dict(zip(vcols, map(list, zip(*vrows)))))
        vdf = spark.createDataFrame(
            vpdf,
            "tile_i int, tile_j int, role int, rid long, "
            "xs array<double>, ys array<double>, area double, "
            "bx1 double, by1 double, bx2 double, by2 double, "
            "cx double, cy double",
        )
        kernel_input = kernel_input.unionByName(vdf)

    kernel = _make_split_kernel(x0, y0, ts, gbc)
    out = kernel_input.groupBy("tile_i", "tile_j").applyInPandas(kernel, SPLIT_SCHEMA)
    release = (lambda: rings.unpersist()) if own_cache else None
    finish_bypass = bypass
    if bypass is not None and release is not None:
        # early release (this function owns the ring cache): bypass
        # rows must ride through the checkpoint so the final plan
        # never re-reads the released cache
        out = out.unionByName(bypass)
        finish_bypass = None
    # consumed by 3-4 narrow readers; lazy — materializes inside
    # the finish's first job rather than as its own stage wave.
    # When the caller keeps the ring cache alive (rings_cached=True,
    # the stitched_polygonize path), bypass rows skip this checkpoint
    # and flow straight from that cache into the final plan — no
    # second copy of the plain ring bytes.
    out = out.localCheckpoint(eager=False)
    _smark("kernel_plan")

    # every K_FINAL/K_PARTIAL row of the split kernel carries its hole
    # coords (members AND visitors enter the kernel with xs/ys), so no
    # merged_coord_rows fill is needed
    return _finish_assignments(
        spark, out, gshells, drop_collapsed, release=release,
        bypass_polys=finish_bypass,
    )


def core_key_col(x0, y0, ts, cols, rows):
    """SQL claim-core key from the ring bbox corner — mirrors the fused
    kernel's numpy derivation float-for-float (floor of the same IEEE
    double quotient, same clip) for the unsplit (f = 1) case:
    ``_core_key(ti, tj, 1, 0, 0, rows)``."""
    ti_c = F.least(
        F.greatest(F.floor((F.col("bx1") - F.lit(x0)) / F.lit(ts)), F.lit(0)),
        F.lit(cols - 1),
    ).cast("long")
    tj_c = F.least(
        F.greatest(F.floor((F.col("by1") - F.lit(y0)) / F.lit(ts)), F.lit(0)),
        F.lit(rows - 1),
    ).cast("long")
    return ((ti_c * F.lit(rows) + tj_c) * F.lit(17) + F.lit(1)) * F.lit(256)


def _bypass_poly_rows(plain: DataFrame) -> DataFrame:
    """JVM-side identity K_POLY rows for rings of PLAIN cores/tiles —
    exactly what the Python kernels emit for a group with no CW ring
    and no visitor (every ring a plain CCW shell: promotion needs a CW
    twin, holes are CW rings, so no K_FINAL/K_PARTIAL and hole arrays
    are empty). Input: _RING_COLS-shaped frame; output: SPLIT_SCHEMA."""
    return plain.select(
        F.lit(K_POLY).cast("int").alias("kind"),
        "rid",
        F.col("xs").alias("shell_xs"),
        F.col("ys").alias("shell_ys"),
        F.array().cast("array<array<double>>").alias("hole_xs"),
        F.array().cast("array<array<double>>").alias("hole_ys"),
        F.lit(0).cast("int").alias("n_holes"),
        F.col("area").alias("net_area"),
        "cx",
        "cy",
        F.lit(None).cast("long").alias("h_rid"),
        F.lit(None).cast("long").alias("cand_rid"),
        F.lit(None).cast("double").alias("cand_area"),
        F.lit(None).cast("double").alias("h_area"),
        F.lit(None).cast("array<double>").alias("h_xs"),
        F.lit(None).cast("array<double>").alias("h_ys"),
    )


def _bypass_interesting_split(df: DataFrame, key_col, keys: set, spark):
    """(plain, interesting) split of ``df`` on ``key_col`` membership in
    the driver-known ``keys`` — literal ``isin`` for small sets, anti/
    semi broadcast joins above 512 (the _id_filter rule)."""
    if not keys:
        return df, df.where(F.lit(False))
    ids = sorted(keys)
    if len(ids) <= 512:
        return df.where(~key_col.isin(ids)), df.where(key_col.isin(ids))
    idf = spark.createDataFrame(
        pd.DataFrame({"_k": pd.Series(ids, dtype="int64")}), "_k long"
    )
    kdf = df.withColumn("_k", key_col)
    return (
        kdf.join(F.broadcast(idf), "_k", "left_anti").drop("_k"),
        kdf.join(F.broadcast(idf), "_k", "left_semi").drop("_k"),
    )


def _id_filter(spark, df: DataFrame, col: str, ids: list):
    """``df`` rows whose ``col`` is in ``ids`` — as a literal ``isin``
    for small lists, else a broadcast semi-join over an Arrow-built id
    frame (a 10^5-literal ``isin`` costs tens of seconds of pure py4j
    expression construction — the in-trace assembly experiment's
    lesson, BENCH.md r5)."""
    if len(ids) <= 512:
        return df.where(F.col(col).isin(ids))
    idf = spark.createDataFrame(
        pd.DataFrame({col: pd.Series(ids, dtype="int64")}), f"{col} long"
    )
    return df.join(F.broadcast(idf), col, "left_semi")


def _finish_assignments(
    spark,
    out: DataFrame,
    gshells: list,
    drop_collapsed: bool,
    merged_coord_rows: list | None = None,
    extra_partials: DataFrame | None = None,
    release=None,
    bypass_polys: DataFrame | None = None,
) -> DataFrame:
    """Shared narrow finish over a SPLIT_SCHEMA kernel output: resolve
    per-hole winners (finals + min over partial candidate rows), net
    the global shells, and patch rare local-shell winners onto the
    emitted polygons via a broadcast join.

    Hole coordinates ride ON the winner rows (h_xs/h_ys, emitted by
    the kernels, which hold every member/visiting ring's coords), so
    the finish never re-reads the caller's ring caches — ``release``
    fires right after the single winner-aggregate job. The one
    exception is fused-path merged visitors (their coords never enter
    the kernel): those rows carry null h_xs and resolve from
    ``merged_coord_rows`` — the (driver-side) global residue rows."""
    import os as _os
    import time as _time
    _fprof = bool(_os.environ.get("GP_ASM_PROF"))
    _ft = {"t": _time.time()}

    def _fmark(name):
        if _fprof:
            now = _time.time()
            print(f"FINPROF| {name}: {now - _ft['t']:.3f}", flush=True)
            _ft["t"] = now

    polys = out.where(F.col("kind") == K_POLY)
    _wcols = ["h_rid", "cand_rid", "cand_area", "h_area", "h_xs", "h_ys"]
    finals = out.where(F.col("kind") == K_FINAL).select(*_wcols)
    # deferred-min rides in the same plan (an empty K_PARTIAL set costs
    # one empty exchange inside the job — cheaper than a separate
    # existence-check job)
    partial_src = out.where(F.col("kind") == K_PARTIAL).select(*_wcols)
    if extra_partials is not None:
        # driver-computed merged-vs-merged candidates: no coords cols
        # (null-filled; resolved from merged_coord_rows like visitors)
        partial_src = partial_src.unionByName(
            extra_partials, allowMissingColumns=True
        )
    deferred = (
        partial_src.groupBy("h_rid")
        .agg(
            F.min(F.struct("cand_area", "cand_rid", "h_area")).alias("w"),
            # all rows of one h_rid describe the SAME hole ring — any
            # non-null coords are the coords
            F.first("h_xs", ignorenulls=True).alias("h_xs"),
            F.first("h_ys", ignorenulls=True).alias("h_ys"),
        )
        .select(
            "h_rid", F.col("w.cand_rid").alias("cand_rid"),
            F.col("w.cand_area").alias("cand_area"),
            F.col("w.h_area").alias("h_area"), "h_xs", "h_ys",
        )
    )
    winners = finals.unionByName(deferred)

    # r6 (guide §2.4/§5 — no driver loop in the query path when nothing
    # forces one): with no early-release obligation the whole finish
    # folds into the caller's single action. The old shape ran ONE
    # separate aggregate job (collect) to fetch per-candidate hole sums
    # — a full materialization of the kernel-output checkpoint plus ~5
    # AQE stage waves (measured 1.3-2.6 s at grid-400, for a handful of
    # rows) — then re-built the same aggregate as broadcast joins. Here
    # the per-candidate aggregate joins the emitted polygons and the
    # (driver-known) global shells directly inside the returned plan;
    # the two joins reference the same aggregate subtree, so the
    # exchange is planned once and reused.
    if release is None:
        if merged_coord_rows:
            mcdf = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "h_rid": pd.Series(
                            [int(r["rid"]) for r in merged_coord_rows], dtype="int64"
                        ),
                        "m_xs": pd.Series(
                            [r["xs"] for r in merged_coord_rows], dtype=object
                        ),
                        "m_ys": pd.Series(
                            [r["ys"] for r in merged_coord_rows], dtype=object
                        ),
                    }
                ),
                "h_rid long, m_xs array<double>, m_ys array<double>",
            )
            winners = (
                winners.join(F.broadcast(mcdf), "h_rid", "left")
                .withColumn("h_xs", F.coalesce("h_xs", "m_xs"))
                .withColumn("h_ys", F.coalesce("h_ys", "m_ys"))
                .drop("m_xs", "m_ys")
            )
        pagg = (
            winners.groupBy("cand_rid")
            .agg(
                F.collect_list("h_xs").alias("p_xs"),
                F.collect_list("h_ys").alias("p_ys"),
                F.sum("h_area").alias("p_sum"),
                F.count("*").alias("p_n"),
            )
            .withColumnRenamed("cand_rid", "rid")
        )
        # local-shell winners patch onto emitted polygons (rare); global
        # candidate rids never match a K_POLY rid, so no pre-split of
        # the aggregate is needed
        polys = (
            polys.join(F.broadcast(pagg), "rid", "left")
            .withColumn(
                "hole_xs",
                F.when(F.col("p_xs").isNotNull(),
                       F.concat("hole_xs", "p_xs")).otherwise(F.col("hole_xs")),
            )
            .withColumn(
                "hole_ys",
                F.when(F.col("p_ys").isNotNull(),
                       F.concat("hole_ys", "p_ys")).otherwise(F.col("hole_ys")),
            )
            .withColumn(
                "net_area", F.col("net_area") - F.coalesce("p_sum", F.lit(0.0))
            )
            .withColumn(
                "n_holes",
                (F.col("n_holes") + F.coalesce("p_n", F.lit(0))).cast("int"),
            )
            .drop("p_xs", "p_ys", "p_sum", "p_n")
        )
        if bypass_polys is not None:
            # identity rows of plain cores/tiles: never patch targets
            # (callers' argument), so they union in AFTER the patch join
            polys = polys.select(
                *[f.name for f in SPLIT_SCHEMA.fields]
            ).unionByName(bypass_polys)
        if drop_collapsed:
            polys = polys.where(F.col("net_area") > 1e-6)

        gpolys = None
        if gshells:
            gpdf = pd.DataFrame(
                {
                    "rid": pd.Series(
                        [int(r["rid"]) for r, _ in gshells], dtype="int64"
                    ),
                    "shell_xs": pd.Series(
                        [list(r["xs"])[::-1] if prom else list(r["xs"])
                         for r, prom in gshells], dtype=object),
                    "shell_ys": pd.Series(
                        [list(r["ys"])[::-1] if prom else list(r["ys"])
                         for r, prom in gshells], dtype=object),
                    "s_area": pd.Series(
                        [abs(float(r["area"])) for r, _ in gshells], dtype="float64"
                    ),
                    "cx": pd.Series(
                        [float(r["cx"]) for r, _ in gshells], dtype="float64"
                    ),
                    "cy": pd.Series(
                        [float(r["cy"]) for r, _ in gshells], dtype="float64"
                    ),
                }
            )
            gbase = spark.createDataFrame(
                gpdf,
                "rid long, shell_xs array<double>, shell_ys array<double>, "
                "s_area double, cx double, cy double",
            )
            gpolys = (
                gbase.join(F.broadcast(pagg), "rid", "left")
                .select(
                    "rid", "shell_xs", "shell_ys",
                    F.col("p_xs").alias("hole_xs"),
                    F.col("p_ys").alias("hole_ys"),
                    F.coalesce("p_n", F.lit(0)).cast("int").alias("n_holes"),
                    (F.col("s_area") - F.coalesce("p_sum", F.lit(0.0))).alias(
                        "net_area"
                    ),
                    "cx", "cy",
                )
            )
            if drop_collapsed:
                gpolys = gpolys.where(F.col("net_area") > 1e-6)

        final_cols = [
            F.lit(-2).cast("int").alias("tile_i"),  # stitched marker
            F.lit(-2).cast("int").alias("tile_j"),
            F.col("rid").alias("poly_id"),
            "shell_xs", "shell_ys",
            F.coalesce(
                "hole_xs", F.array().cast("array<array<double>>")
            ).alias("hole_xs"),
            F.coalesce(
                "hole_ys", F.array().cast("array<array<double>>")
            ).alias("hole_ys"),
            "n_holes",
            F.col("net_area").alias("area"),
            "cx", "cy",
        ]
        result = polys.select(*final_cols)
        if gpolys is not None:
            result = result.unionByName(gpolys.select(*final_cols))
        _fmark("inplan_build")
        return result

    # ONE aggregate job over the (narrow) winner rows serves both the
    # global-shell nets AND the local-winner detection: the distinct
    # target count is ≤ |global shells| + |rare local winners|, so the
    # collect stays driver-safe even when (grid coverages) every CW
    # ring wins to the hull.
    g_rid_set = {int(r["rid"]) for r, _ in gshells}
    _fmark("plan_build")
    wagg = (
        winners.groupBy("cand_rid")
        .agg(F.sum("h_area").alias("hsum"), F.count("*").alias("hn"))
        .collect()
    )
    _fmark("winner_agg_job")
    gagg = {}
    local_win_rids = []
    for r in wagg:
        cr = int(r["cand_rid"])
        if cr in g_rid_set:
            gagg[cr] = (float(r["hsum"]), int(r["hn"]))
        else:
            local_win_rids.append(cr)
    surviving = []
    for r, prom in gshells:
        hsum, hn = gagg.get(int(r["rid"]), (0.0, 0))
        net = abs(r["area"]) - hsum
        if drop_collapsed and net <= 1e-6:  # polygonizer.rs:255-258
            continue
        surviving.append((r, prom, net, hn))

    # the winner aggregate above materialized ``out``'s checkpoint, and
    # every later consumer (hole coords, patch, polys) reads from it —
    # the caller's ring caches are dead weight from here on
    if release is not None:
        release()

    # fill null winner coords (fused-path merged visitors) from the
    # driver-side residue rows
    if merged_coord_rows:
        mcdf = spark.createDataFrame(
            pd.DataFrame(
                {
                    "h_rid": pd.Series(
                        [int(r["rid"]) for r in merged_coord_rows], dtype="int64"
                    ),
                    "m_xs": pd.Series(
                        [r["xs"] for r in merged_coord_rows], dtype=object
                    ),
                    "m_ys": pd.Series(
                        [r["ys"] for r in merged_coord_rows], dtype=object
                    ),
                }
            ),
            "h_rid long, m_xs array<double>, m_ys array<double>",
        )
        winners = (
            winners.join(F.broadcast(mcdf), "h_rid", "left")
            .withColumn("h_xs", F.coalesce("h_xs", "m_xs"))
            .withColumn("h_ys", F.coalesce("h_ys", "m_ys"))
            .drop("m_xs", "m_ys")
        )

    gpolys = None
    if surviving:
        # pandas + Arrow path: the residue can hold thousands of rows
        # with coordinate arrays, and row-by-row py4j conversion is the
        # slow way to ship them
        gpdf = pd.DataFrame(
            {
                "rid": pd.Series([int(r["rid"]) for r, _, _, _ in surviving], dtype="int64"),
                "shell_xs": pd.Series(
                    [list(r["xs"])[::-1] if prom else list(r["xs"])
                     for r, prom, _, _ in surviving], dtype=object),
                "shell_ys": pd.Series(
                    [list(r["ys"])[::-1] if prom else list(r["ys"])
                     for r, prom, _, _ in surviving], dtype=object),
                "net_area": pd.Series([net for _, _, net, _ in surviving], dtype="float64"),
                "n_holes": pd.Series([hn for _, _, _, hn in surviving], dtype="int32"),
                "cx": pd.Series([float(r["cx"]) for r, _, _, _ in surviving], dtype="float64"),
                "cy": pd.Series([float(r["cy"]) for r, _, _, _ in surviving], dtype="float64"),
            }
        )
        gbase = spark.createDataFrame(
            gpdf,
            "rid long, shell_xs array<double>, shell_ys array<double>, "
            "net_area double, n_holes int, cx double, cy double",
        )
        need_holes = [int(r["rid"]) for r, _, _, hn in surviving if hn > 0]
        if need_holes:
            hole_coords = (
                _id_filter(spark, winners, "cand_rid", need_holes)
                .groupBy("cand_rid")
                .agg(
                    F.collect_list("h_xs").alias("hole_xs"),
                    F.collect_list("h_ys").alias("hole_ys"),
                )
                .withColumnRenamed("cand_rid", "rid")
            )
            gpolys = gbase.join(F.broadcast(hole_coords), "rid", "left")
        else:
            gpolys = gbase.withColumn(
                "hole_xs", F.lit(None).cast("array<array<double>>")
            ).withColumn("hole_ys", F.lit(None).cast("array<array<double>>"))

    # --- patch local-shell winners onto emitted polygons (rare) ------
    if local_win_rids:
        winners_l = _id_filter(spark, winners, "cand_rid", local_win_rids)
        patch = (
            winners_l.groupBy("cand_rid")
            .agg(
                F.collect_list("h_xs").alias("p_xs"),
                F.collect_list("h_ys").alias("p_ys"),
                F.sum("h_area").alias("p_sum"),
                F.count("*").alias("p_n"),
            )
            .withColumnRenamed("cand_rid", "rid")
        )
        polys = (
            polys.join(F.broadcast(patch), "rid", "left")
            .withColumn(
                "hole_xs",
                F.when(F.col("p_xs").isNotNull(),
                       F.concat("hole_xs", "p_xs")).otherwise(F.col("hole_xs")),
            )
            .withColumn(
                "hole_ys",
                F.when(F.col("p_ys").isNotNull(),
                       F.concat("hole_ys", "p_ys")).otherwise(F.col("hole_ys")),
            )
            .withColumn(
                "net_area", F.col("net_area") - F.coalesce("p_sum", F.lit(0.0))
            )
            .withColumn(
                "n_holes",
                (F.col("n_holes") + F.coalesce("p_n", F.lit(0))).cast("int"),
            )
        )
    if bypass_polys is not None:
        # r6: identity rows of plain cores/tiles — they never crossed
        # the Python kernel and (callers' argument) can never be patch
        # targets, so they join the emitted polygons AFTER the patch
        # join, straight from the caller's long-lived ring storage (no
        # second copy through the kernel-output checkpoint). Callers
        # only pass this when that storage outlives the returned plan.
        polys = polys.select(*[f.name for f in SPLIT_SCHEMA.fields]).unionByName(
            bypass_polys
        )
    if drop_collapsed:
        polys = polys.where(F.col("net_area") > 1e-6)

    final_cols = [
        F.lit(-2).cast("int").alias("tile_i"),  # stitched marker
        F.lit(-2).cast("int").alias("tile_j"),
        F.col("rid").alias("poly_id"),
        "shell_xs", "shell_ys",
        F.coalesce("hole_xs", F.array().cast("array<array<double>>")).alias("hole_xs"),
        F.coalesce("hole_ys", F.array().cast("array<array<double>>")).alias("hole_ys"),
        "n_holes",
        F.col("net_area").alias("area"),
        "cx", "cy",
    ]
    result = polys.select(*final_cols)
    if gpolys is not None:
        result = result.unionByName(gpolys.select(*final_cols))
    _fmark("tail_build")
    return result


# --------------------------------------------------------------------------
# Fused variant for the chain engine: phase-2 assembly runs as a
# mapInPandas over the CACHED trace-kernel output with NO extra shuffle.
# Every trace-local ring's vertices lie inside the claiming (sub-)cell
# (a fully-claimed cycle's vertices are all half-edge tails there), so
# its bbox corner identifies that core BIT-EXACTLY and orientation-
# invariantly: ti = clip(floor((bx1-x0)/ts)) — the min-x vertex is in
# the core, twins (same vertex set) always co-derive. GroupBy output
# partitions hold whole claim groups, so an in-pandas groupby inside
# each partition reproduces the per-core grouping without an exchange.
# Member holes can NEVER need cross-core deferral here: a nondegenerate
# ring's centroid is strictly inside its open bbox, the open bbox of a
# core-fitting ring contains no core-boundary gridline, and clipped
# edge cores have no interior core boundaries — so the per-core
# candidate set (own core's shells + broadcast merged shells) is
# complete. Merged (chain-closed) rings form the global residue:
# promotion driver-side, CW rings probe the touching cores as broadcast
# visitors (partial rows, min in the shared finish).
# --------------------------------------------------------------------------


def _touching_cores(cx, cy, x0, y0, ts, cols, rows, fmap):
    """Claim cores whose closure contains the point, at tile AND
    hot-tile sub-cell granularity, mirroring the trace kernel's
    clipped-floor claiming arithmetic float-for-float."""
    i = min(max(int(np.floor((cx - x0) / ts)), 0), cols - 1)
    j = min(max(int(np.floor((cy - y0) / ts)), 0), rows - 1)
    tis = {i}
    if cx == x0 + i * ts and i > 0:
        tis.add(i - 1)
    tjs = {j}
    if cy == y0 + j * ts and j > 0:
        tjs.add(j - 1)
    out = []
    for a in tis:
        for b in tjs:
            fv = fmap.get((a, b), 1)
            side = ts / fv
            tx0 = x0 + a * ts
            ty0 = y0 + b * ts
            u = min(max(int(np.floor((cx - tx0) / side)), 0), fv - 1)
            v = min(max(int(np.floor((cy - ty0) / side)), 0), fv - 1)
            us = {u}
            if cx == tx0 + u * side and u > 0:
                us.add(u - 1)
            vs = {v}
            if cy == ty0 + v * side and v > 0:
                vs.add(v - 1)
            for p in us:
                for q in vs:
                    out.append((a, b, fv, p, q))
    return out


def _core_key(ti, tj, fv, si, sj, rows):
    """Single int64 group key for a claim core (f ≤ 16, si/sj < f)."""
    return (((ti * rows + tj) * 17 + fv) * 16 + si) * 16 + sj


def _best_reduce(si, hj, areas, rids):
    """One (area, rid)-lexicographic min candidate per hole."""
    o = np.lexsort((rids, areas, hj))
    first = np.concatenate(([True], hj[o][1:] != hj[o][:-1]))
    return o[first]


def _core_local_assembly(
    area, rid, cx, cy, bx1, by1, bx2, by2, coords_x, coords_y, idx, ray_cast_rows
):
    """Single-claim-core member assembly WITHOUT merged-shell knowledge
    (shared by the phase-2 fused kernel and the in-trace assembly):
    exact-bbox twin promotion (polygonizer.rs:152-185) and hole→parent
    local-candidate search (strictly-larger min-(area, rid) rule,
    polygonizer.rs:226) over the rings at positions ``idx``.

    Returns ``(sh, s_area, ho, h_area, hx, hy, best_area, best_rid,
    best_local)``: shells (promoted CW included), every CW ring as an
    assignment candidate, and per-hole best LOCAL candidate (inf/-1
    when no local shell strictly contains it)."""
    garea = area[idx]
    ccw = garea > 0.0
    cw = garea < 0.0
    by_bbox: dict = {}
    for p in idx[ccw].tolist():
        by_bbox.setdefault((bx1[p], by1[p], bx2[p], by2[p]), []).append(area[p])
    promoted = np.zeros(idx.size, dtype=bool)
    cw_pos = np.flatnonzero(cw)
    for pos in cw_pos.tolist():
        p = idx[pos]
        twins = by_bbox.get((bx1[p], by1[p], bx2[p], by2[p]), ())
        if not any(abs(s + area[p]) < 1e-6 for s in twins):
            promoted[pos] = True
    sh = idx[ccw | (cw & promoted)]  # shells (promoted CW incl.)
    s_area = np.abs(area[sh])
    ho = idx[cw]  # every CW ring is an assignment candidate
    nh = ho.size
    h_area = np.abs(area[ho])
    hx = cx[ho]
    hy = cy[ho]

    best_area = np.full(nh, np.inf)
    best_rid = np.full(nh, np.iinfo(np.int64).max, dtype=np.int64)
    best_local = np.full(nh, -1, dtype=np.int64)  # pos into sh

    si, hj = _pip_candidates(
        sh, hx, hy, h_area, area, bx1, by1, bx2, by2, coords_x, coords_y,
        ray_cast_rows,
    )
    if si.size:
        srid = rid[sh[si]]
        sel = _best_reduce(si, hj, s_area[si], srid)
        rows_ = hj[sel]
        best_area[rows_] = s_area[si[sel]]
        best_rid[rows_] = srid[sel]
        best_local[rows_] = si[sel]
    return sh, s_area, ho, h_area, hx, hy, best_area, best_rid, best_local


def _pip_candidates(
    sh, hx, hy, h_area, area, bx1, by1, bx2, by2, coords_x, coords_y, ray_cast_rows
):
    """(si, hj) PIP-confirmed candidate pairs: hole centroids vs the
    shells ``sh`` (strictly-larger area rule, polygonizer.rs:226)."""
    if sh.size == 0 or hx.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    si, hj = bbox_join(bx1[sh], by1[sh], bx2[sh], by2[sh], hx, hy, hx, hy)
    keep = np.abs(area[sh])[si] > h_area[hj] + 1e-6
    si, hj = si[keep], hj[keep]
    if si.size == 0:
        return si, hj
    inside = np.zeros(si.size, dtype=bool)
    uq, ucount = np.unique(si, return_counts=True)
    heavy = np.zeros(si.size, dtype=bool)
    for u in uq[(ucount * np.fromiter(
        (coords_x[sh[u]].size for u in uq.tolist()),
        np.int64, uq.size,
    )) > 4_000_000].tolist():
        rws = np.flatnonzero(si == u)
        heavy[rws] = True
        inside[rws] = _pip_many_vs_ring(
            hx[hj[rws]], hy[hj[rws]], coords_x[sh[u]], coords_y[sh[u]]
        )
    light = np.flatnonzero(~heavy)
    if light.size:
        inside[light] = ray_cast_rows(
            hx[hj[light]], hy[hj[light]],
            [(coords_x[sh[u]], coords_y[sh[u]]) for u in si[light].tolist()],
        )
    return si[inside], hj[inside]


def _make_fused_partition_kernel(x0, y0, ts, cols, rows, fmap, gbc, vbc):
    """Per-PARTITION assembly kernel (mapInPandas): regroups the cached
    trace output by claim core (derived from bbox corners — header
    comment), then runs the same member assembly as the split kernel:
    exact-bbox twin promotion, hole→parent candidates over (own core's
    shells ∪ broadcast merged shells), in-task attach for local
    winners, narrow K_FINAL rows for merged winners, K_PARTIAL probes
    for broadcast visitor holes."""

    def kernel(batches):
        from .spatial_join import _ray_cast_rows

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        g = gbc.value
        visitors = vbc.value  # [(rid, h_area, cx, cy, [core keys])]
        n = len(pdf)
        area = pdf["area"].to_numpy()
        rid = pdf["rid"].to_numpy()
        cx = pdf["cx"].to_numpy()
        cy = pdf["cy"].to_numpy()
        bx1 = pdf["bx1"].to_numpy()
        by1 = pdf["by1"].to_numpy()
        bx2 = pdf["bx2"].to_numpy()
        by2 = pdf["by2"].to_numpy()
        coords_x = [np.asarray(v, np.float64) for v in pdf["xs"]]
        coords_y = [np.asarray(v, np.float64) for v in pdf["ys"]]

        ti = np.clip(np.floor((bx1 - x0) / ts).astype(np.int64), 0, cols - 1)
        tj = np.clip(np.floor((by1 - y0) / ts).astype(np.int64), 0, rows - 1)
        f_arr = np.ones(n, dtype=np.int64)
        si_arr = np.zeros(n, dtype=np.int64)
        sj_arr = np.zeros(n, dtype=np.int64)
        for (hti, htj), fv in fmap.items():
            hot = (ti == hti) & (tj == htj)
            if not hot.any():
                continue
            side = ts / fv
            si_arr[hot] = np.clip(
                np.floor((bx1[hot] - (x0 + hti * ts)) / side).astype(np.int64),
                0, fv - 1,
            )
            sj_arr[hot] = np.clip(
                np.floor((by1[hot] - (y0 + htj * ts)) / side).astype(np.int64),
                0, fv - 1,
            )
            f_arr[hot] = fv
        gkey = _core_key(ti, tj, f_arr, si_arr, sj_arr, rows)
        order = np.argsort(gkey, kind="stable")
        gk_s = gkey[order]
        bounds = np.concatenate(
            ([0], np.flatnonzero(gk_s[1:] != gk_s[:-1]) + 1, [n])
        )

        vis_by_key: dict = {}
        for vi, v in enumerate(visitors):
            for k in v[4]:
                vis_by_key.setdefault(k, []).append(vi)
        g_by_core = g.get("by_core")

        out: dict = {k.name: [] for k in SPLIT_SCHEMA.fields}

        def emit(kind, **kw):
            out["kind"].append(kind)
            for fld in SPLIT_SCHEMA.fields[1:]:
                out[fld.name].append(kw.get(fld.name))

        for a, b in zip(bounds[:-1], bounds[1:]):
            idx = order[a:b]
            (
                sh, s_area, ho, h_area, hx, hy, best_area, best_rid, best_local
            ) = _core_local_assembly(
                area, rid, cx, cy, bx1, by1, bx2, by2,
                coords_x, coords_y, idx, _ray_cast_rows,
            )
            nh = ho.size
            if nh and g["n"]:
                # per-core pre-index: only merged shells whose bbox can
                # reach this core are tested (the padded driver index),
                # not the whole residue — on a lattice the residue is
                # O(√n) boundary rings and a full scan per core would
                # be quadratic-ish
                if g_by_core is not None:
                    glist = list(g.get("always", ())) + list(
                        g_by_core.get(int(gk_s[a]), ())
                    )
                else:
                    glist = range(g["n"])
                for gi in glist:
                    ga = g["area"][gi]
                    m = np.flatnonzero(
                        (hx >= g["bx1"][gi]) & (hx <= g["bx2"][gi])
                        & (hy >= g["by1"][gi]) & (hy <= g["by2"][gi])
                        & (ga > h_area + 1e-6)
                    )
                    if m.size == 0:
                        continue
                    ins = _pip_many_vs_ring(
                        hx[m], hy[m], g["xs"][gi], g["ys"][gi]
                    )
                    m = m[ins]
                    take = (ga < best_area[m]) | (
                        (ga == best_area[m]) & (g["rid"][gi] < best_rid[m])
                    )
                    rows_ = m[take]
                    best_area[rows_] = ga
                    best_rid[rows_] = g["rid"][gi]
                    best_local[rows_] = -1

            attach: dict = {}
            for p in range(nh):
                if not np.isfinite(best_area[p]):
                    continue  # unparented hole — vanishes
                if best_local[p] >= 0:
                    attach.setdefault(int(best_local[p]), []).append(p)
                else:
                    emit(
                        K_FINAL,
                        h_rid=int(rid[ho[p]]),
                        cand_rid=int(best_rid[p]),
                        cand_area=float(best_area[p]),
                        h_area=float(h_area[p]),
                        h_xs=coords_x[ho[p]],
                        h_ys=coords_y[ho[p]],
                    )

            # visitor probes: merged CW holes touching this core test
            # against THIS core's shells only (merged-shell candidates
            # are computed once, driver-side)
            vids = vis_by_key.get(int(gk_s[a]), ())
            if vids and sh.size:
                vhx = np.fromiter((visitors[v][2] for v in vids), np.float64, len(vids))
                vhy = np.fromiter((visitors[v][3] for v in vids), np.float64, len(vids))
                vha = np.fromiter((visitors[v][1] for v in vids), np.float64, len(vids))
                vsi, vhj = _pip_candidates(
                    sh, vhx, vhy, vha, area, bx1, by1, bx2, by2,
                    coords_x, coords_y, _ray_cast_rows,
                )
                if vsi.size:
                    vsrid = rid[sh[vsi]]
                    sel = _best_reduce(vsi, vhj, s_area[vsi], vsrid)
                    for s in sel.tolist():
                        emit(
                            K_PARTIAL,
                            h_rid=int(visitors[vids[vhj[s]]][0]),
                            cand_rid=int(vsrid[s]),
                            cand_area=float(s_area[vsi[s]]),
                            h_area=float(vha[vhj[s]]),
                        )

            for pos in range(sh.size):
                p = sh[pos]
                xs_p, ys_p = coords_x[p], coords_y[p]
                if area[p] < 0:  # promoted CW: re-wind CCW
                    xs_p, ys_p = xs_p[::-1], ys_p[::-1]
                holes = attach.get(pos, ())
                emit(
                    K_POLY,
                    rid=int(rid[p]),
                    shell_xs=xs_p,
                    shell_ys=ys_p,
                    hole_xs=[coords_x[ho[q]] for q in holes],
                    hole_ys=[coords_y[ho[q]] for q in holes],
                    n_holes=len(holes),
                    net_area=float(np.abs(area[p]) - h_area[list(holes)].sum()),
                    cx=float(cx[p]),
                    cy=float(cy[p]),
                )

        yield pd.DataFrame(
            {k: pd.Series(v, dtype=object) for k, v in out.items()}
        )

    return kernel


_RESOLVE_SCHEMA = (
    "kind int, h_rid long, loser_rid long, win_rid long, "
    "win_area double, h_area double"
)


def _make_merged_resolve_kernel(gbc):
    """mapInPandas kernel over NARROW hole rows (CHAIN_FUSED_SCHEMA
    kinds 2/3): finds each hole's best merged-shell parent via the
    broadcast per-core reach index (strictly-larger min-(area, rid)
    rule) and emits a row ONLY when a merged shell adopts an
    unparented hole (kind 2) or beats the recorded local candidate
    (kind 3 — a steal)."""

    def kernel(batches):
        g = gbc.value
        by_core = g.get("by_core") or {}
        always = list(g.get("always", ()))
        for pdf in batches:
            if not len(pdf):
                continue
            kind = pdf["kind"].to_numpy()
            h_rid = pdf["rid"].to_numpy()
            core = pdf["core"].to_numpy()
            h_area = pdf["area"].to_numpy()
            hx = pdf["cx"].to_numpy()
            hy = pdf["cy"].to_numpy()
            cand_rid = pdf["cand_rid"].to_numpy(dtype=object)
            cand_area = pdf["cand_area"].to_numpy(dtype=object)
            n = len(pdf)
            best_area = np.full(n, np.inf)
            best_rid = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
            order = np.argsort(core, kind="stable")
            cs = core[order]
            bounds = np.concatenate(
                ([0], np.flatnonzero(cs[1:] != cs[:-1]) + 1, [n])
            )
            for a, b in zip(bounds[:-1], bounds[1:]):
                rows_ = order[a:b]
                glist = always + list(by_core.get(int(cs[a]), ()))
                for gi in glist:
                    ga = g["area"][gi]
                    m = rows_[
                        (hx[rows_] >= g["bx1"][gi]) & (hx[rows_] <= g["bx2"][gi])
                        & (hy[rows_] >= g["by1"][gi]) & (hy[rows_] <= g["by2"][gi])
                        & (ga > h_area[rows_] + 1e-6)
                    ]
                    if m.size == 0:
                        continue
                    ins = _pip_many_vs_ring(hx[m], hy[m], g["xs"][gi], g["ys"][gi])
                    m = m[ins]
                    take = (ga < best_area[m]) | (
                        (ga == best_area[m]) & (g["rid"][gi] < best_rid[m])
                    )
                    rows2 = m[take]
                    best_area[rows2] = ga
                    best_rid[rows2] = g["rid"][gi]
            out = {k: [] for k in (
                "kind", "h_rid", "loser_rid", "win_rid", "win_area", "h_area"
            )}
            for p in np.flatnonzero(np.isfinite(best_area)).tolist():
                if kind[p] == 3:
                    ca = float(cand_area[p])
                    cr = int(cand_rid[p])
                    if not (
                        best_area[p] < ca
                        or (best_area[p] == ca and int(best_rid[p]) < cr)
                    ):
                        continue  # local attachment stands
                    out["loser_rid"].append(cr)
                else:
                    out["loser_rid"].append(None)
                out["kind"].append(int(kind[p]))
                out["h_rid"].append(int(h_rid[p]))
                out["win_rid"].append(int(best_rid[p]))
                out["win_area"].append(float(best_area[p]))
                out["h_area"].append(float(h_area[p]))
            yield pd.DataFrame({k: pd.Series(v, dtype=object) for k, v in out.items()})

    return kernel


def _vis_pip_kernel(batches):
    """PIP-confirm visitor-hole centroids against local-shell rows
    (bbox+area prefiltered in the plan)."""
    from .spatial_join import _ray_cast_rows

    for pdf in batches:
        if not len(pdf):
            continue
        inside = _ray_cast_rows(
            pdf["vcx"].to_numpy(), pdf["vcy"].to_numpy(),
            [
                (np.asarray(x, np.float64), np.asarray(y, np.float64))
                for x, y in zip(pdf["xs"], pdf["ys"])
            ],
        )
        yield pdf.loc[inside, ["h_rid", "cand_rid", "cand_area"]]


def assemble_rings_fused_trace(
    trace_out: DataFrame,
    merged: DataFrame | None,
    x0: float,
    y0: float,
    tile_size: float,
    cols: int,
    rows: int,
    fmap: dict,
    drop_collapsed: bool = False,
    global_rows_gate: int = 100_000,
    global_coords_gate: int = 10_000_000,
    release=None,
) -> DataFrame | None:
    """Finish for the IN-TRACE assembled chain output
    (CHAIN_FUSED_SCHEMA): polygons were assembled inside the trace
    kernel, so everything after the trace moves NARROW rows — merged
    residue meta/coords (driver+broadcast), per-hole revision records,
    and rare patch rows — plus ONE executor-local checkpoint of the
    final polygons (JVM-side; ring coordinates never re-cross Python).

    Revision semantics vs the phase-2 fused kernel are identical:
    a chain-closed (merged) shell adopts unparented holes and steals a
    locally-attached hole exactly when it wins the strictly-larger
    min-(area, rid) rule. Returns None when the merged residue trips
    the collection gates — the caller falls back to the lossless
    distributed assembly."""
    import os as _os
    import time as _time
    _profon = bool(_os.environ.get("GP_ASM_PROF"))
    _tm = {"t": _time.time()}

    def _mark(name):
        if _profon:
            now = _time.time()
            print(f"FTPROF| {name}: {now - _tm['t']:.3f}", flush=True)
            _tm["t"] = now

    spark = trace_out.sparkSession
    polys = trace_out.where(F.col("kind") == 0)

    grows: list = []
    if merged is not None:
        merged_rid = (
            merged.where(F.abs("area") >= 1e-9)
            .withColumn("rid", F.xxhash64("xs", "ys"))
            .select(*_RING_COLS)
        )
        grows = [
            r.asDict() for r in merged_rid.limit(global_rows_gate + 1).collect()
        ]
        if (
            len(grows) > global_rows_gate
            or sum(len(r["xs"]) for r in grows) > global_coords_gate
        ):
            return None
    gshells, gvisitors = _promote_rows(grows)
    ng = len(gshells)
    _mark('merged_collect+promote')

    final_cols = [
        F.lit(-2).cast("int").alias("tile_i"),
        F.lit(-2).cast("int").alias("tile_j"),
        F.col("rid").alias("poly_id"),
        F.col("xs").alias("shell_xs"), F.col("ys").alias("shell_ys"),
        "hole_xs", "hole_ys", "n_holes",
        F.col("net_area").alias("area"), "cx", "cy",
    ]

    if ng == 0 and not gvisitors:
        # no merged residue: the tentative assembly IS the answer
        out_polys = polys
        if drop_collapsed:
            out_polys = out_polys.where(F.col("net_area") > 1e-6)
        final = out_polys.select(*final_cols).localCheckpoint(eager=True)
        if release is not None:
            release()
        return final

    # ---- driver meta + per-core reach index for merged shells -------
    g_rid = np.fromiter((r["rid"] for r, _ in gshells), np.int64, ng)
    g_area = np.fromiter((abs(r["area"]) for r, _ in gshells), np.float64, ng)
    g_bx1 = np.fromiter((r["bx1"] for r, _ in gshells), np.float64, ng)
    g_by1 = np.fromiter((r["by1"] for r, _ in gshells), np.float64, ng)
    g_bx2 = np.fromiter((r["bx2"] for r, _ in gshells), np.float64, ng)
    g_by2 = np.fromiter((r["by2"] for r, _ in gshells), np.float64, ng)
    g_xs = [np.asarray(r["xs"], np.float64) for r, _ in gshells]
    g_ys = [np.asarray(r["ys"], np.float64) for r, _ in gshells]
    ts = float(tile_size)
    by_core: dict = {}
    g_always: list = []
    if ng:
        i_lo = np.clip(np.floor((g_bx1 - x0) / ts).astype(np.int64) - 1, 0, cols - 1)
        i_hi = np.clip(np.floor((g_bx2 - x0) / ts).astype(np.int64) + 1, 0, cols - 1)
        j_lo = np.clip(np.floor((g_by1 - y0) / ts).astype(np.int64) - 1, 0, rows - 1)
        j_hi = np.clip(np.floor((g_by2 - y0) / ts).astype(np.int64) + 1, 0, rows - 1)
        for gi in range(ng):
            span = (int(i_hi[gi]) - int(i_lo[gi]) + 1) * (
                int(j_hi[gi]) - int(j_lo[gi]) + 1
            )
            if span > 4096:
                g_always.append(gi)
                continue
            for a in range(int(i_lo[gi]), int(i_hi[gi]) + 1):
                for b in range(int(j_lo[gi]), int(j_hi[gi]) + 1):
                    fv = fmap.get((a, b), 1)
                    if fv == 1:
                        by_core.setdefault(_core_key(a, b, 1, 0, 0, rows), []).append(gi)
                    else:
                        for p in range(fv):
                            for q in range(fv):
                                by_core.setdefault(
                                    _core_key(a, b, fv, p, q, rows), []
                                ).append(gi)
    payload = {
        "n": ng, "rid": g_rid, "area": g_area,
        "bx1": g_bx1, "by1": g_by1, "bx2": g_bx2, "by2": g_by2,
        "xs": g_xs, "ys": g_ys, "by_core": by_core, "always": g_always,
    }
    gbc = spark.sparkContext.broadcast(payload)
    _mark('reach_index+broadcast')

    # ---- narrow merged-parent resolution (adopts + steals) ----------
    adopts: list = []  # (h_rid, win_rid, h_area)
    steals: list = []  # (h_rid, loser_rid, win_rid, h_area)
    if ng:
        narrow = trace_out.where(F.col("kind").isin(2, 3)).select(
            "kind", "rid", "core", "area", "cx", "cy", "cand_rid", "cand_area"
        )
        for r in narrow.mapInPandas(
            _make_merged_resolve_kernel(gbc), _RESOLVE_SCHEMA
        ).collect():
            if int(r["kind"]) == 2:
                adopts.append((int(r["h_rid"]), int(r["win_rid"]), float(r["h_area"])))
            else:
                steals.append(
                    (int(r["h_rid"]), int(r["loser_rid"]), int(r["win_rid"]),
                     float(r["h_area"]))
                )

    _mark('narrow_resolve')
    # ---- visitors (merged CW holes): local shells ∪ merged shells ---
    # driver part — merged-vs-merged candidates (min per visitor)
    vis_best: dict = {}  # h_rid -> (area, rid)
    vis_meta: dict = {}  # h_rid -> (h_area, cx, cy, xs, ys)
    if gvisitors:
        for r in gvisitors:
            vis_meta[int(r["rid"])] = (
                abs(r["area"]), float(r["cx"]), float(r["cy"]), r["xs"], r["ys"]
            )
        if ng:
            nv = len(gvisitors)
            v_cx = np.fromiter((r["cx"] for r in gvisitors), np.float64, nv)
            v_cy = np.fromiter((r["cy"] for r in gvisitors), np.float64, nv)
            v_ha = np.fromiter((abs(r["area"]) for r in gvisitors), np.float64, nv)
            v_rid = np.fromiter((r["rid"] for r in gvisitors), np.int64, nv)
            si, hj = bbox_join(g_bx1, g_by1, g_bx2, g_by2, v_cx, v_cy, v_cx, v_cy)
            keep = g_area[si] > v_ha[hj] + 1e-6
            si, hj = si[keep], hj[keep]
            if si.size:
                inside = np.zeros(si.size, dtype=bool)
                for u in np.unique(si).tolist():
                    rws = np.flatnonzero(si == u)
                    inside[rws] = _pip_many_vs_ring(
                        v_cx[hj[rws]], v_cy[hj[rws]], g_xs[u], g_ys[u]
                    )
                si, hj = si[inside], hj[inside]
            for s, h in zip(si.tolist(), hj.tolist()):
                key = int(v_rid[h])
                cand = (float(g_area[s]), int(g_rid[s]))
                if key not in vis_best or cand < vis_best[key]:
                    vis_best[key] = cand
        # plan part — local-shell candidates in the visitor's touching
        # cores only (a core-contained shell lies inside its core box,
        # so any local parent's core closure contains the centroid)
        vrows = []
        for r in gvisitors:
            touch = _touching_cores(r["cx"], r["cy"], x0, y0, ts, cols, rows, fmap)
            for a, b, fv, p, q in touch:
                vrows.append(
                    (int(r["rid"]), float(abs(r["area"])),
                     float(r["cx"]), float(r["cy"]),
                     int(_core_key(a, b, fv, p, q, rows)))
                )
        if vrows:
            vdf = spark.createDataFrame(
                vrows, "h_rid long, h_area double, vcx double, vcy double, core long"
            )
            cand = (
                polys.join(F.broadcast(vdf), "core")
                .where(
                    (F.col("vcx") >= F.col("bx1")) & (F.col("vcx") <= F.col("bx2"))
                    & (F.col("vcy") >= F.col("by1")) & (F.col("vcy") <= F.col("by2"))
                    & (F.abs("area") > F.col("h_area") + F.lit(1e-6))
                )
                .select(
                    "h_rid", "vcx", "vcy", "xs", "ys",
                    F.col("rid").alias("cand_rid"),
                    F.abs("area").alias("cand_area"),
                )
            )
            for r in cand.mapInPandas(
                _vis_pip_kernel, "h_rid long, cand_rid long, cand_area double"
            ).collect():
                key = int(r["h_rid"])
                c = (float(r["cand_area"]), int(r["cand_rid"]))
                if key not in vis_best or c < vis_best[key]:
                    vis_best[key] = c

    _mark('visitors')
    # ---- per-merged-shell nets + hole-coord routing -----------------
    g_rid_set = set(g_rid.tolist())
    gagg: dict = {}  # g_rid -> [h_sum, h_n]

    def _g_add(gr, ha):
        e = gagg.setdefault(gr, [0.0, 0])
        e[0] += ha
        e[1] += 1

    for h, w, ha in adopts:
        _g_add(w, ha)
    for h, loser, w, ha in steals:
        _g_add(w, ha)
    vis_local_patch: dict = {}  # local cand_rid -> [(xs, ys, h_area)]
    vis_merged: list = []  # (h_rid, win_rid) — coords from vis_meta
    for h_ridv, (warea, wrid) in vis_best.items():
        ha, vcx_, vcy_, vxs, vys = vis_meta[h_ridv]
        if wrid in g_rid_set:
            _g_add(wrid, ha)
            vis_merged.append((h_ridv, wrid))
        else:
            vis_local_patch.setdefault(wrid, []).append((vxs, vys, ha))

    # ---- patches on local polygons ----------------------------------
    out_polys = polys
    if steals:
        agg: dict = {}
        for h, loser, w, ha in steals:
            e = agg.setdefault(loser, [[], 0.0])
            e[0].append(h)
            e[1] += ha
        sp = spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in agg.items()],
            "rid long, stolen_rids array<long>, stolen_sum double",
        )
        # stage the filtered zip in a temp column FIRST — the per-field
        # withColumns below must all read the same pre-patch arrays
        zipped = F.arrays_zip("hole_rids", "hole_xs", "hole_ys")
        kept = F.filter(
            zipped,
            lambda z: ~F.coalesce(
                F.array_contains("stolen_rids", z["hole_rids"]), F.lit(False)
            ),
        )
        out_polys = (
            out_polys.join(F.broadcast(sp), "rid", "left")
            .withColumn("_kept", kept)
            .withColumn(
                "hole_xs",
                F.when(F.col("stolen_rids").isNotNull(),
                       F.transform("_kept", lambda z: z["hole_xs"]))
                .otherwise(F.col("hole_xs")),
            )
            .withColumn(
                "hole_ys",
                F.when(F.col("stolen_rids").isNotNull(),
                       F.transform("_kept", lambda z: z["hole_ys"]))
                .otherwise(F.col("hole_ys")),
            )
            .withColumn(
                "hole_rids",
                F.when(F.col("stolen_rids").isNotNull(),
                       F.transform("_kept", lambda z: z["hole_rids"]))
                .otherwise(F.col("hole_rids")),
            )
            .withColumn(
                "n_holes",
                F.when(F.col("stolen_rids").isNotNull(),
                       F.size("_kept")).otherwise(F.col("n_holes")).cast("int"),
            )
            .withColumn(
                "net_area",
                F.col("net_area") + F.coalesce("stolen_sum", F.lit(0.0)),
            )
            .drop("stolen_rids", "stolen_sum", "_kept")
        )
    if vis_local_patch:
        prows = []
        for crid, lst in vis_local_patch.items():
            prows.append(
                (crid, [list(x) for x, _, _ in lst], [list(y) for _, y, _ in lst],
                 float(sum(a for _, _, a in lst)), len(lst))
            )
        ppdf = pd.DataFrame(
            {
                "rid": pd.Series([r[0] for r in prows], dtype="int64"),
                "p_xs": pd.Series([r[1] for r in prows], dtype=object),
                "p_ys": pd.Series([r[2] for r in prows], dtype=object),
                "p_sum": pd.Series([r[3] for r in prows], dtype="float64"),
                "p_n": pd.Series([r[4] for r in prows], dtype="int32"),
            }
        )
        patch = spark.createDataFrame(
            ppdf,
            "rid long, p_xs array<array<double>>, p_ys array<array<double>>, "
            "p_sum double, p_n int",
        )
        out_polys = (
            out_polys.join(F.broadcast(patch), "rid", "left")
            .withColumn(
                "hole_xs",
                F.when(F.col("p_xs").isNotNull(),
                       F.concat("hole_xs", "p_xs")).otherwise(F.col("hole_xs")),
            )
            .withColumn(
                "hole_ys",
                F.when(F.col("p_ys").isNotNull(),
                       F.concat("hole_ys", "p_ys")).otherwise(F.col("hole_ys")),
            )
            .withColumn(
                "net_area", F.col("net_area") - F.coalesce("p_sum", F.lit(0.0))
            )
            .withColumn(
                "n_holes",
                (F.col("n_holes") + F.coalesce("p_n", F.lit(0))).cast("int"),
            )
            .drop("p_xs", "p_ys", "p_sum", "p_n")
        )

    _mark('local_patches_plan')
    # ---- merged polygons (driver gbase + routed hole coords) --------
    surviving = []
    for r, prom in gshells:
        hsum, hn = gagg.get(int(r["rid"]), (0.0, 0))
        net = abs(r["area"]) - hsum
        if drop_collapsed and net <= 1e-6:  # polygonizer.rs:255-258
            continue
        surviving.append((r, prom, net, hn))
    _mark('gb:surviving')
    gpolys = None
    if surviving:
        gpdf = pd.DataFrame(
            {
                "rid": pd.Series([int(r["rid"]) for r, _, _, _ in surviving], dtype="int64"),
                "xs": pd.Series(
                    [list(r["xs"])[::-1] if prom else list(r["xs"])
                     for r, prom, _, _ in surviving], dtype=object),
                "ys": pd.Series(
                    [list(r["ys"])[::-1] if prom else list(r["ys"])
                     for r, prom, _, _ in surviving], dtype=object),
                "net_area": pd.Series([net for _, _, net, _ in surviving], dtype="float64"),
                "n_holes": pd.Series([hn for _, _, _, hn in surviving], dtype="int32"),
                "cx": pd.Series([float(r["cx"]) for r, _, _, _ in surviving], dtype="float64"),
                "cy": pd.Series([float(r["cy"]) for r, _, _, _ in surviving], dtype="float64"),
            }
        )
        gbase = spark.createDataFrame(
            gpdf,
            "rid long, xs array<double>, ys array<double>, "
            "net_area double, n_holes int, cx double, cy double",
        )
        _mark('gb:createDataFrame')
        need_holes = {int(r["rid"]) for r, _, _, hn in surviving if hn > 0}
        if need_holes:
            # route hole coords: adopted (kind-2 cache rows), stolen
            # (extracted from the loser polygon rows), visitor-merged
            # (driver meta) — all narrow/rare
            routes = [(h, w) for h, w, _ in adopts] + [
                (h, w) for h, _, w, _ in steals
            ] + vis_merged
            routes = [(h, w) for h, w in routes if w in need_holes]
            rdf = spark.createDataFrame(routes, "h_rid long, win_rid long")
            _mark('gb:routes')
            # broadcast SEMI-joins, never isin: the id sets can reach
            # 10^5 and Column.isin builds one JVM literal per element
            # (measured 99 s of pure Py4J on sparse-60k)
            def _idf(ids, col):
                return spark.createDataFrame(
                    pd.DataFrame({col: pd.Series(sorted(ids), dtype="int64")}),
                    f"{col} long",
                )

            srcs = []
            adopt_ids = {int(h) for h, w, _ in adopts}
            if adopt_ids:
                srcs.append(
                    trace_out.where(F.col("kind") == 2)
                    .join(F.broadcast(_idf(adopt_ids, "rid")), "rid", "semi")
                    .select(F.col("rid").alias("h_rid"), "xs", "ys")
                )
            if steals:
                loser_ids = {int(loser) for _, loser, _, _ in steals}
                stolen_ids = {int(h) for h, _, _, _ in steals}
                zipped = F.arrays_zip("hole_rids", "hole_xs", "hole_ys")
                srcs.append(
                    polys.join(F.broadcast(_idf(loser_ids, "rid")), "rid", "semi")
                    .select(F.explode(zipped).alias("z"))
                    .select(
                        F.col("z.hole_rids").alias("h_rid"),
                        F.col("z.hole_xs").alias("xs"),
                        F.col("z.hole_ys").alias("ys"),
                    )
                    .join(F.broadcast(_idf(stolen_ids, "h_rid")), "h_rid", "semi")
                )
            if vis_merged:
                vm = pd.DataFrame(
                    {
                        "h_rid": pd.Series([h for h, _ in vis_merged], dtype="int64"),
                        "xs": pd.Series(
                            [list(vis_meta[h][3]) for h, _ in vis_merged], dtype=object),
                        "ys": pd.Series(
                            [list(vis_meta[h][4]) for h, _ in vis_merged], dtype=object),
                    }
                )
                srcs.append(
                    spark.createDataFrame(
                        vm, "h_rid long, xs array<double>, ys array<double>"
                    )
                )
            coords = srcs[0]
            for s in srcs[1:]:
                coords = coords.unionByName(s)
            hole_coords = (
                coords.join(F.broadcast(rdf), "h_rid")
                .groupBy("win_rid")
                .agg(
                    F.collect_list("xs").alias("hole_xs"),
                    F.collect_list("ys").alias("hole_ys"),
                )
                .withColumnRenamed("win_rid", "rid")
            )
            gpolys = gbase.join(F.broadcast(hole_coords), "rid", "left")
            _mark('gb:coords_plan')
        else:
            gpolys = gbase.withColumn(
                "hole_xs", F.lit(None).cast("array<array<double>>")
            ).withColumn("hole_ys", F.lit(None).cast("array<array<double>>"))
        gpolys = gpolys.withColumn(
            "hole_xs",
            F.coalesce("hole_xs", F.array().cast("array<array<double>>")),
        ).withColumn(
            "hole_ys",
            F.coalesce("hole_ys", F.array().cast("array<array<double>>")),
        )

    _mark('gbase_plan')
    if drop_collapsed:
        out_polys = out_polys.where(F.col("net_area") > 1e-6)
    result = out_polys.select(*final_cols)
    if gpolys is not None:
        result = result.unionByName(gpolys.select(*final_cols))
    final = result.localCheckpoint(eager=True)
    _mark('final_checkpoint')
    if release is not None:
        release()
    return final


def assemble_rings_fused(
    trace_out: DataFrame,
    merged: DataFrame | None,
    x0: float,
    y0: float,
    tile_size: float,
    cols: int,
    rows: int,
    fmap: dict,
    drop_collapsed: bool = False,
    global_rows_gate: int = 100_000,
    global_coords_gate: int = 10_000_000,
    release=None,
    merged_rows_bound: int | None = None,
    merged_coords_bound: int | None = None,
    cw_cores: set | None = None,
) -> DataFrame:
    """Chain-engine assembly with ZERO extra shuffles of ring data:
    phase 2 maps over the cached trace output (header comment).

    ``cw_cores``: pre-computed claim-core keys holding at least one CW
    ring (the chain engine folds this into its counts job); None =
    compute here with one narrow job. Only consulted when ``fmap`` is
    empty (bypass path).

    ``trace_out``: the persisted CHAIN_SCHEMA kernel output (kind 0 =
    local rings, already degenerate-filtered). ``merged``: chain-merge
    output frame (RING_SCHEMA-ish), or None when no chains existed.
    ``release``: caller callback freeing the trace cache — invoked once
    the returned plan no longer references it.

    ``merged_rows_bound`` / ``merged_coords_bound``: caller-known upper
    bounds on the merged residue (the chain engine gets both free from
    its kind-count job: rows ≤ n_chains, coords ≤ chain coords +
    closing vertices). When both fit the gates, the residue collects
    through ONE parallel Arrow job (``toPandas``) instead of Spark's
    incremental ``limit().collect()`` — which executes 1→4→20-task
    waves and converts ring arrays row-by-row through py4j."""
    from .stitch import assemble_rings_distributed

    import os as _os
    import time as _time
    _prof = bool(_os.environ.get("GP_ASM_PROF"))
    _t = {"t": _time.time()}

    def _mark(name):
        if _prof:
            now = _time.time()
            print(f"ASMPROF| {name}: {now - _t['t']:.3f}", flush=True)
            _t["t"] = now

    spark = trace_out.sparkSession
    ts = float(tile_size)
    ringrows = trace_out.where(F.col("kind") == 0).select(
        F.xxhash64("xs", "ys").alias("rid"),
        "xs", "ys", "area", "bx1", "by1", "bx2", "by2", "cx", "cy",
    )

    grows: list = []
    if merged is not None:
        merged_rid = (
            merged.where(F.abs("area") >= 1e-9)
            .withColumn("rid", F.xxhash64("xs", "ys"))
            .select(*_RING_COLS)
        )
        if (
            merged_rows_bound is not None
            and merged_coords_bound is not None
            and merged_rows_bound <= global_rows_gate
            and merged_coords_bound <= global_coords_gate
        ):
            # bounds certify the gates up front: one parallel Arrow
            # collect, no incremental limit waves
            grows = merged_rid.toPandas().to_dict("records")
        else:
            grows = [
                r.asDict()
                for r in merged_rid.limit(global_rows_gate + 1).collect()
            ]
        if (
            len(grows) > global_rows_gate
            or sum(len(r["xs"]) for r in grows) > global_coords_gate
        ):
            # pathological residue: hand the FULL ring set to the
            # distributed assembly (lossless, slower). Eager local
            # checkpoint, then release the caller's trace cache — the
            # old persist leaked in the CacheManager for the session
            # lifetime and never fired the release callback (ADVICE r5)
            rings = ringrows.unionByName(merged_rid).localCheckpoint(eager=True)
            if release is not None:
                release()
            return assemble_rings_distributed(rings, drop_collapsed)
    _mark("merged_collect+promote")
    gshells, gvisitors = _promote_rows(grows)

    ng = len(gshells)
    g_bx1 = np.fromiter((r["bx1"] for r, _ in gshells), np.float64, ng)
    g_by1 = np.fromiter((r["by1"] for r, _ in gshells), np.float64, ng)
    g_bx2 = np.fromiter((r["bx2"] for r, _ in gshells), np.float64, ng)
    g_by2 = np.fromiter((r["by2"] for r, _ in gshells), np.float64, ng)
    g_area = np.fromiter((abs(r["area"]) for r, _ in gshells), np.float64, ng)
    g_rid = np.fromiter((r["rid"] for r, _ in gshells), np.int64, ng)
    g_xs = [np.asarray(r["xs"], np.float64) for r, _ in gshells]
    g_ys = [np.asarray(r["ys"], np.float64) for r, _ in gshells]

    # per-core reach index (padded one core each side — a superset is
    # harmless, every candidate is still bbox+PIP-tested in the kernel)
    by_core: dict = {}
    g_always: list = []  # world-spanning shells (e.g. the hull): tested
    # by every core rather than enumerated into a giant index
    if ng:
        i_lo = np.clip(np.floor((g_bx1 - x0) / ts).astype(np.int64) - 1, 0, cols - 1)
        i_hi = np.clip(np.floor((g_bx2 - x0) / ts).astype(np.int64) + 1, 0, cols - 1)
        j_lo = np.clip(np.floor((g_by1 - y0) / ts).astype(np.int64) - 1, 0, rows - 1)
        j_hi = np.clip(np.floor((g_by2 - y0) / ts).astype(np.int64) + 1, 0, rows - 1)
        for gi in range(ng):
            span = (int(i_hi[gi]) - int(i_lo[gi]) + 1) * (
                int(j_hi[gi]) - int(j_lo[gi]) + 1
            )
            if span > 4096:
                g_always.append(gi)
                continue
            for a in range(int(i_lo[gi]), int(i_hi[gi]) + 1):
                for b in range(int(j_lo[gi]), int(j_hi[gi]) + 1):
                    fv = fmap.get((a, b), 1)
                    if fv == 1:
                        by_core.setdefault(_core_key(a, b, 1, 0, 0, rows), []).append(gi)
                    else:
                        for p in range(fv):
                            for q in range(fv):
                                by_core.setdefault(
                                    _core_key(a, b, fv, p, q, rows), []
                                ).append(gi)
    payload = {
        "n": ng, "rid": g_rid, "area": g_area,
        "bx1": g_bx1, "by1": g_by1, "bx2": g_bx2, "by2": g_by2,
        "xs": g_xs, "ys": g_ys, "by_core": by_core, "always": g_always,
    }
    gbc = spark.sparkContext.broadcast(payload)
    _mark("index+broadcast")

    # visitor holes: every merged CW ring, probing the cores whose
    # closure contains its centroid; their merged-shell candidates are
    # resolved HERE (vectorized driver numpy — bbox_join + grouped PIP,
    # the residue can be O(√n) boundary rings on a lattice) and fed to
    # the finish as extra partial rows
    vis = []
    extra_rows = []
    if gvisitors:
        nv = len(gvisitors)
        v_rid = np.fromiter((r["rid"] for r in gvisitors), np.int64, nv)
        v_ha = np.fromiter((abs(r["area"]) for r in gvisitors), np.float64, nv)
        v_cx = np.fromiter((r["cx"] for r in gvisitors), np.float64, nv)
        v_cy = np.fromiter((r["cy"] for r in gvisitors), np.float64, nv)
        for vi, r in enumerate(gvisitors):
            touch = _touching_cores(r["cx"], r["cy"], x0, y0, ts, cols, rows, fmap)
            keys = [_core_key(a, b, fv, p, q, rows) for a, b, fv, p, q in touch]
            vis.append(
                (int(v_rid[vi]), float(v_ha[vi]), float(v_cx[vi]), float(v_cy[vi]), keys)
            )
        if ng:
            si, hj = bbox_join(g_bx1, g_by1, g_bx2, g_by2, v_cx, v_cy, v_cx, v_cy)
            keep = g_area[si] > v_ha[hj] + 1e-6
            si, hj = si[keep], hj[keep]
            if si.size:
                inside = np.zeros(si.size, dtype=bool)
                for u in np.unique(si).tolist():
                    rws = np.flatnonzero(si == u)
                    inside[rws] = _pip_many_vs_ring(
                        v_cx[hj[rws]], v_cy[hj[rws]], g_xs[u], g_ys[u]
                    )
                si, hj = si[inside], hj[inside]
            if si.size:
                o = np.lexsort((g_rid[si], g_area[si], hj))
                first = np.concatenate(([True], hj[o][1:] != hj[o][:-1]))
                for s in o[first].tolist():
                    extra_rows.append(
                        (int(v_rid[hj[s]]), int(g_rid[si[s]]),
                         float(g_area[si[s]]), float(v_ha[hj[s]]))
                    )
    vbc = spark.sparkContext.broadcast(vis)
    _mark("visitor_candidates")
    extra_partials = (
        spark.createDataFrame(
            extra_rows, "h_rid long, cand_rid long, cand_area double, h_area double"
        )
        if extra_rows
        else None
    )

    # r6 phase-2 bypass (guide §4.1/§2.3 — don't move bytes through
    # Python that come back unchanged): a core with no CW ring and no
    # visitor produces the IDENTITY kernel output — every ring is a
    # plain CCW shell (promotion needs a CW twin, holes are CW rings,
    # K_FINAL/K_PARTIAL need holes), and such shells can never be
    # patch targets in the finish (every winner's cand_rid lives in
    # the hole's own core or the broadcast globals — both interesting).
    # So only rings of INTERESTING cores (any CW ring, or a visitor
    # touch) cross the Arrow boundary; the rest re-emit JVM-side from
    # the cached trace output. On a dense lattice the interesting set
    # is empty and phase 2 moves zero ring bytes through Python
    # (measured: the phase-2 pass was ~1.7 s of pure serialization of
    # 160k rings at grid-400 — the kernel's own compute is ~0.1 s).
    # Hot-tile sub-splits (fmap) complicate the SQL core derivation —
    # those rare runs keep the full Python pass.
    bypass = None
    phase2_in = ringrows
    if not fmap:
        core_c = core_key_col(x0, y0, ts, cols, rows)
        if cw_cores is None:
            cw_cores = {
                int(r["core"])
                for r in ringrows.where(F.col("area") < 0)
                .select(core_c.alias("core"))
                .distinct()
                .collect()
            }
        vis_cores = {int(k) for v in vis for k in v[4]}
        plain, phase2_in = _bypass_interesting_split(
            ringrows, core_c, set(cw_cores) | vis_cores, spark
        )
        bypass = _bypass_poly_rows(plain)
        _mark("bypass_split")

    kernel = _make_fused_partition_kernel(x0, y0, ts, cols, rows, fmap, gbc, vbc)
    # lazy checkpoint of the (now small: interesting cores only) kernel
    # output — materializes inside the finish's FIRST job (the winner
    # aggregate) instead of as its own stage wave. The bypass rows do
    # NOT ride through this checkpoint: they flow straight from the
    # caller's trace storage into the final plan (zero extra copies of
    # plain ring bytes) — valid because the chain engine's trace output
    # is a self-GC'd localCheckpoint that outlives the plan (r6). If a
    # caller still passes an eager ``release`` callback, keep the old
    # union-into-checkpoint shape so early release stays safe.
    out = phase2_in.mapInPandas(kernel, SPLIT_SCHEMA)
    finish_bypass = bypass
    if bypass is not None and release is not None:
        out = out.unionByName(bypass)
        finish_bypass = None
    out = out.localCheckpoint(eager=False)
    _mark("phase2_plan")  # lazy: kernel wall lands in the finish's first job

    # hole coords: local winners carry theirs on the K_FINAL rows;
    # merged visitors (K_PARTIAL + extra_partials) resolve from the
    # driver-side residue rows
    res = _finish_assignments(
        spark, out, gshells, drop_collapsed,
        merged_coord_rows=grows,
        extra_partials=extra_partials, release=release,
        bypass_polys=finish_bypass,
    )
    _mark("finish")
    return res
