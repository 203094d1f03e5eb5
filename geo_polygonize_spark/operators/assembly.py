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
into tile tasks) in the common path; every later stage moves 32-byte
rows or survivor-pruned arrays. The global residue is O(tile-boundary
crossings) with an explicit gate and a lossless fallback.

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


def assemble_rings_split(
    rings: DataFrame,
    x0: float,
    y0: float,
    tile_size: float,
    drop_collapsed: bool = False,
    global_rows_gate: int = 100_000,
    global_coords_gate: int = 10_000_000,
) -> DataFrame:
    """Assemble polygons from a ring set (RING_SCHEMA + rid), per-tile
    for tile-local rings (module docstring). Output schema and
    semantics identical to ``assemble_rings_distributed``; falls back
    to it when the global residue exceeds the gates."""
    from .stitch import assemble_rings_distributed

    spark = rings.sparkSession
    ts = float(tile_size)
    nd = rings.where(F.abs("area") >= 1e-9)  # polygonizer.rs:138-140
    ti = F.floor((F.col("bx1") - x0) / ts).cast("int")
    tj = F.floor((F.col("by1") - y0) / ts).cast("int")
    is_local = (
        (F.col("bx2") <= F.lit(x0) + (ti + 1).cast("double") * ts)
        & (F.col("by2") <= F.lit(y0) + (tj + 1).cast("double") * ts)
    )
    tagged = nd.withColumn("ti", ti).withColumn("tj", tj).withColumn(
        "is_local", is_local
    )

    glob = tagged.where(~F.col("is_local")).select(*_RING_COLS)
    gstat = glob.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.size("xs")), F.lit(0)).alias("c"),
    ).collect()[0]
    if int(gstat["n"]) > global_rows_gate or int(gstat["c"]) > global_coords_gate:
        # pathological tiling (rings >> tile): the split brings nothing
        return assemble_rings_distributed(rings, drop_collapsed)

    grows = [r.asDict() for r in glob.collect()]
    gshells, gvisitors = _promote_rows(grows)

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

    kernel_input = members.unionByName(boundary_visits)
    if gvisitors:
        vrows = []
        for r in gvisitors:
            touch = _touching_tiles(r["cx"], r["cy"], x0, y0, ts)
            for (a, b) in touch:
                vrows.append(
                    (a, b, 1, r["rid"], r["xs"], r["ys"], r["area"],
                     r["bx1"], r["by1"], r["bx2"], r["by2"], r["cx"], r["cy"])
                )
        vdf = spark.createDataFrame(
            vrows,
            T.StructType(
                [
                    T.StructField("tile_i", T.IntegerType()),
                    T.StructField("tile_j", T.IntegerType()),
                    T.StructField("role", T.IntegerType()),
                    T.StructField("rid", T.LongType()),
                    T.StructField("xs", T.ArrayType(T.DoubleType())),
                    T.StructField("ys", T.ArrayType(T.DoubleType())),
                ]
                + [T.StructField(c, T.DoubleType()) for c in
                   ("area", "bx1", "by1", "bx2", "by2", "cx", "cy")]
            ),
        )
        kernel_input = kernel_input.unionByName(vdf)

    kernel = _make_split_kernel(x0, y0, ts, gbc)
    out = (
        kernel_input.groupBy("tile_i", "tile_j")
        .applyInPandas(kernel, SPLIT_SCHEMA)
        .localCheckpoint(eager=True)  # consumed by 3-4 narrow readers
    )

    polys = out.where(F.col("kind") == K_POLY)
    # ONE narrow job decides the rest of the plan shape (skip the
    # deferred-min shuffle when nothing deferred — the common case)
    kc = {int(r["kind"]): int(r["n"]) for r in
          out.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    finals = out.where(F.col("kind") == K_FINAL).select(
        "h_rid", "cand_rid", "cand_area", "h_area"
    )
    if kc.get(K_PARTIAL, 0):
        deferred = (
            out.where(F.col("kind") == K_PARTIAL)
            .groupBy("h_rid")
            .agg(F.min(F.struct("cand_area", "cand_rid", "h_area")).alias("w"))
            .select(
                "h_rid", F.col("w.cand_rid").alias("cand_rid"),
                F.col("w.cand_area").alias("cand_area"),
                F.col("w.h_area").alias("h_area"),
            )
        )
        winners = finals.unionByName(deferred)
    else:
        winners = finals

    # ONE aggregate job over the (narrow) winner rows serves both the
    # global-shell nets AND the local-winner detection: the distinct
    # target count is ≤ |global shells| + |rare local winners|, so the
    # collect stays driver-safe even when (grid coverages) every CW
    # ring wins to the hull.
    g_rid_set = {int(r["rid"]) for r, _ in gshells}
    wagg = (
        winners.groupBy("cand_rid")
        .agg(F.sum("h_area").alias("hsum"), F.count("*").alias("hn"))
        .collect()
    ) if (kc.get(K_FINAL, 0) or kc.get(K_PARTIAL, 0)) else []
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
    gpolys = None
    if surviving:
        base_rows = [
            (
                int(r["rid"]),
                list(r["xs"])[::-1] if prom else list(r["xs"]),
                list(r["ys"])[::-1] if prom else list(r["ys"]),
                net, hn, float(r["cx"]), float(r["cy"]),
            )
            for r, prom, net, hn in surviving
        ]
        gbase = spark.createDataFrame(
            base_rows,
            "rid long, shell_xs array<double>, shell_ys array<double>, "
            "net_area double, n_holes int, cx double, cy double",
        )
        need_holes = [row[0] for row in base_rows if row[4] > 0]
        if need_holes:
            hole_coords = (
                winners.where(F.col("cand_rid").isin(need_holes))
                .join(
                    rings.select(F.col("rid").alias("h_rid"), "xs", "ys"),
                    "h_rid",
                )
                .groupBy("cand_rid")
                .agg(
                    F.collect_list("xs").alias("hole_xs"),
                    F.collect_list("ys").alias("hole_ys"),
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
        winners_l = winners.where(F.col("cand_rid").isin(local_win_rids))
        patch = (
            winners_l.join(
                rings.select(F.col("rid").alias("h_rid"), "xs", "ys"), "h_rid"
            )
            .groupBy("cand_rid")
            .agg(
                F.collect_list("xs").alias("p_xs"),
                F.collect_list("ys").alias("p_ys"),
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
    return result
