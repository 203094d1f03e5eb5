"""Distributed spatial joins over the polygonized coverage.

These are the north_rule extensions the reference does not have (its
single-process analogs: the R-tree candidate join ``snap.rs:117-132``
and hole-assignment join ``polygonizer.rs:192-249``); here they are
cell-keyed equi-joins + vectorized refinement:

* ``pip_join(points, polygons)`` — point-in-polygon: polygon KEYS
  (id + bbox + area, never ring arrays) replicate into every grid
  cell their bbox covers (column exprs), points key to one cell, the
  equi-join + JVM bbox pre-filter prune candidates, candidates group
  per polygon (salted), ring arrays join ONCE per (polygon, salt),
  and an Arrow kernel ray-casts each probe batch against its one
  polygon (exact even-odd incl. holes, simd.rs:31-79 semantics;
  y-bucketed edge index for huge rings). Winner per point = the
  smallest-area containing polygon (argmin via ``min_by``, the same
  rule as hole assignment, polygonizer.rs:226-229).
  Skew: ``salt`` bounds the probe-group size per polygon (a polygon
  attracting millions of candidates splits into ``salt`` groups, at
  the cost of shipping its rings ``salt`` times).

* ``knn_join(points, centroids, k)`` — k nearest tile centroids per
  point: the (small) centroid table is collected and numpy-broadcast
  inside an Arrow batch UDF (argpartition top-k), avoiding a
  points×centroids shuffle entirely. This is the broadcast-side
  strategy; a cell-neighborhood candidate join is the path for huge
  centroid sets.

* ``raster_tile_assign`` — pure column arithmetic (floor bucketing).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from ..functions.cells import cell_range_cols


def polygon_cells(
    polygons: DataFrame,
    x0: float,
    y0: float,
    cell_size: float,
    n_cells: int = 1 << 20,
) -> DataFrame:
    """Replicate each polygon into every covering grid cell of its
    shell bbox — bbox from array_min/array_max (JVM-side), range
    explode like tile assignment."""
    p = polygons.withColumn("pbx1", F.array_min("shell_xs")).withColumn(
        "pbx2", F.array_max("shell_xs")
    ).withColumn("pby1", F.array_min("shell_ys")).withColumn("pby2", F.array_max("shell_ys"))
    ci1 = cell_range_cols(F.col("pbx1"), x0, cell_size, n_cells)
    ci2 = cell_range_cols(F.col("pbx2"), x0, cell_size, n_cells)
    cj1 = cell_range_cols(F.col("pby1"), y0, cell_size, n_cells)
    cj2 = cell_range_cols(F.col("pby2"), y0, cell_size, n_cells)
    return p.withColumn("cell_i", F.explode(F.sequence(ci1, ci2))).withColumn(
        "cell_j", F.explode(F.sequence(cj1, cj2))
    )


def _ray_cast_rows(px: np.ndarray, py: np.ndarray, rings: list) -> np.ndarray:
    """Fully vectorized per-row ray cast over a ragged batch of rings.
    Rows are processed GROUPED BY RING LENGTH: the row coordinates of
    each group concatenate into one dense (rows × L) matrix — no
    padding, so one 400-vertex hull in a batch of 5-vertex cells does
    not inflate every row to width 400. Identical crossing rule to the
    reference SimdRing (simd.rs:31-79), division-free form."""
    n = len(rings)
    if n == 0:
        return np.zeros(0, dtype=bool)
    lens = np.fromiter((len(r[0]) for r in rings), dtype=np.int64, count=n)
    out = np.zeros(n, dtype=bool)
    for L in np.unique(lens):
        sel = np.flatnonzero(lens == L)
        step = max(int(4_000_000 // max(L, 1)), 64)
        for s0 in range(0, sel.size, step):
            rows = sel[s0 : s0 + step]
            X = np.empty((rows.size, L))
            Y = np.empty((rows.size, L))
            for r, i in enumerate(rows):
                X[r] = rings[i][0]
                Y[r] = rings[i][1]
            x1, x2 = X[:, :-1], X[:, 1:]
            y1, y2 = Y[:, :-1], Y[:, 1:]
            pyv = py[rows][:, None]
            pxv = px[rows][:, None]
            straddle = (y1 > pyv) != (y2 > pyv)
            lhs = (pxv - x1) * (y2 - y1)
            rhs = (x2 - x1) * (pyv - y1)
            cross = straddle & ((lhs < rhs) == (y2 > y1))
            out[rows] = (np.count_nonzero(cross, axis=1) % 2).astype(bool)
    return out


@F.pandas_udf(T.BooleanType())
def _pip_refine(
    px: pd.Series,
    py: pd.Series,
    shell_xs: pd.Series,
    shell_ys: pd.Series,
    hole_xs: pd.Series,
    hole_ys: pd.Series,
) -> pd.Series:
    """Exact even-odd containment: inside shell AND NOT inside any
    hole — one vectorized batch for shells, one for the flattened
    (row, hole) pairs."""
    pxv = px.to_numpy(dtype=np.float64)
    pyv = py.to_numpy(dtype=np.float64)
    shells = [
        (np.asarray(sx, np.float64), np.asarray(sy, np.float64))
        for sx, sy in zip(shell_xs, shell_ys)
    ]
    inside = _ray_cast_rows(pxv, pyv, shells)

    # flatten hole rings of rows currently inside
    hrows: list[int] = []
    hrings: list = []
    for i in np.flatnonzero(inside):
        hx = hole_xs.iloc[i]
        if hx is None or len(hx) == 0:
            continue
        hy = hole_ys.iloc[i]
        for j in range(len(hx)):
            hrows.append(i)
            hrings.append((np.asarray(hx[j], np.float64), np.asarray(hy[j], np.float64)))
    if hrows:
        hr = np.asarray(hrows)
        in_hole = _ray_cast_rows(pxv[hr], pyv[hr], hrings)
        inside[hr[in_hole]] = False
    return pd.Series(inside)


def broadcast_coverage_index(spark, polygons: DataFrame | None = None, rows: list | None = None):
    """Compile a coverage into a broadcast CoverageIndex ONCE, for
    reuse across many ``pip_join(..., index=...)`` /
    ``image_pipeline(..., coverage_index=...)`` calls. Production
    shape: polygonize once, stream micro-batches against it — without
    this, every batch job re-pays the driver-side index compile +
    broadcast write (~1.4 s fixed at a 160k-polygon coverage, the
    dominant cost of a small batch)."""
    from ..kernels.coverage import CoverageIndex

    if rows is None:
        rows = polygons.toPandas().to_dict("records")
    # f32-mirror ray cast iff the deployment is wide enough to be
    # bandwidth-contended (kernels/coverage.py — measured crossover
    # between 8 and 32 local cores; results identical either way)
    return spark.sparkContext.broadcast(
        CoverageIndex(rows, use_f32=spark.sparkContext.defaultParallelism >= 16)
    )


def pip_join_broadcast(
    points: DataFrame,
    polygons: DataFrame,
    point_id: str = "image_id",
    rows: list | None = None,
    index=None,
) -> DataFrame:
    """Broadcast-side PIP join: the polygon coverage is collected once,
    compiled into a numpy CoverageIndex (cell CSR + flat rings —
    kernels/coverage.py), and captured by a single map-only Arrow UDF
    that resolves candidates + exact PIP + smallest-area argmin per
    batch. ZERO shuffles and no ring arrays on the wire — the right
    plan whenever the coverage fits in executor memory (the shuffle
    cell join below is the fallback for coverages that don't).

    ``index``: a prebuilt broadcast from ``broadcast_coverage_index``
    — skips the per-call compile+broadcast entirely.
    """
    from ..kernels.coverage import CoverageIndex

    if index is not None:
        bc = index
    else:
        if rows is None:
            rows = [r.asDict() for r in polygons.collect()]
        # ship via SparkContext.broadcast: the serialized index can be
        # tens of MB, and a plain closure capture would ride inside the
        # task command — re-sent by the driver FOR EVERY TASK
        # (measured: a 34MB index × 64 tasks made the whole stage
        # driver-transfer-bound and flat across core counts). A
        # broadcast transfers once per executor and the closure only
        # carries the handle.
        sc = points.sparkSession.sparkContext
        bc = sc.broadcast(
            CoverageIndex(rows, use_f32=sc.defaultParallelism >= 16)
        )

    schema = T.StructType(
        [
            T.StructField("found", T.BooleanType()),
            T.StructField("p_tile_i", T.IntegerType()),
            T.StructField("p_tile_j", T.IntegerType()),
            T.StructField("p_poly_id", T.LongType()),
            T.StructField("p_area", T.DoubleType()),
            T.StructField("n_containing", T.LongType()),
        ]
    )

    @F.pandas_udf(schema)
    def probe(px: pd.Series, py: pd.Series) -> pd.DataFrame:
        index = bc.value
        n = len(px)
        if index.n == 0:
            # empty coverage: nothing contains anything (found by
            # probing a dangle-only linework through the pipeline)
            return pd.DataFrame(
                {
                    "found": np.zeros(n, dtype=bool),
                    "p_tile_i": np.zeros(n, dtype=np.int32),
                    "p_tile_j": np.zeros(n, dtype=np.int32),
                    "p_poly_id": np.zeros(n, dtype=np.int64),
                    "p_area": np.zeros(n, dtype=np.float64),
                    "n_containing": np.zeros(n, dtype=np.int64),
                }
            )
        x = px.to_numpy(dtype=np.float64)
        y = py.to_numpy(dtype=np.float64)
        found, idx, ncont = index.query(x, y)
        return pd.DataFrame(
            {
                "found": found,
                "p_tile_i": index.tile_i[idx],
                "p_tile_j": index.tile_j[idx],
                "p_poly_id": index.poly_id[idx],
                "p_area": index.area[idx],
                "n_containing": ncont,
            }
        )

    # retain every input column (narrow payloads ride through the
    # map-only join — no re-join shuffle needed for them)
    return (
        points.withColumn("_hit", probe("x", "y"))
        .where(F.col("_hit.found"))
        .withColumn("poly_tile_i", F.col("_hit.p_tile_i"))
        .withColumn("poly_tile_j", F.col("_hit.p_tile_j"))
        .withColumn("poly_id", F.col("_hit.p_poly_id"))
        .withColumn("poly_area", F.col("_hit.p_area"))
        .withColumn("n_containing", F.col("_hit.n_containing"))
        .drop("_hit")
    )


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    x0: float,
    y0: float,
    cell_size: float,
    point_id: str = "image_id",
    salt: int | None = None,
    strategy: str = "cells",
    rows: list | None = None,
    index=None,
    max_probes_per_group: int = 200_000,
) -> DataFrame:
    """points(point_id, x, y) × polygons → one row per point with its
    smallest containing polygon (or none: inner join semantics —
    points outside all coverage drop out).

    ``strategy="broadcast"`` → pip_join_broadcast (map-only; coverage
    must fit in memory). ``strategy="cells"`` (this body) → narrow
    cell-key equi-join + per-polygon probe grouping + one-ring-batch
    PIP refine (module docstring) — the scale path for coverages too
    large to collect. ``salt`` fixes each polygon's probe-group split
    count; the default (None) DERIVES it per polygon from its actual
    candidate count (one narrow window count) so a hot polygon — e.g.
    a hull whose bbox covers the whole point cloud — can never gather
    more than ``max_probes_per_group`` probes into a single
    collect_list row/task.
    """
    if strategy == "broadcast":
        return pip_join_broadcast(
            points, polygons, point_id=point_id, rows=rows, index=index
        )
    # NARROW cell join: only (pkey, bbox, area, tile ids) replicate per
    # covered cell — ring arrays never enter it. Candidates then group
    # per polygon (salted so one hot polygon cannot own a single task),
    # the polygon's rings join ONCE per (polygon, salt) by pkey, and an
    # Arrow kernel ray-casts the whole probe batch against that one
    # polygon (y-bucketed index for huge rings). Ring coordinates cross
    # the wire O(polygons × salt) times total, independent of how many
    # candidate points each polygon attracts — previously they rode on
    # EVERY candidate row, the dominant shuffle payload at scale.
    pkey = F.xxhash64("tile_i", "tile_j", "poly_id")
    group_salt = salt if (salt is not None and salt > 1) else 1

    pc = polygon_cells(
        polygons.select("tile_i", "tile_j", "poly_id", "area", "shell_xs", "shell_ys"),
        x0,
        y0,
        cell_size,
    ).select(
        "cell_i",
        "cell_j",
        pkey.alias("pkey"),
        F.col("tile_i").alias("p_tile_i"),
        F.col("tile_j").alias("p_tile_j"),
        F.col("poly_id").alias("p_poly_id"),
        F.col("area").alias("p_area"),
        "pbx1",
        "pbx2",
        "pby1",
        "pby2",
    )
    coords = polygons.select(
        pkey.alias("pkey"), "shell_xs", "shell_ys", "hole_xs", "hole_ys"
    )
    pts = points.select(point_id, "x", "y").withColumn(
        "cell_i", cell_range_cols(F.col("x"), x0, cell_size, 1 << 20)
    ).withColumn("cell_j", cell_range_cols(F.col("y"), y0, cell_size, 1 << 20))

    if salt is None:
        # auto: per-polygon split count from an UPPER BOUND on its
        # candidate volume — sum of points-per-cell over the polygon's
        # covered cells. The bound needs only a narrow agg of the
        # points table plus a join against the (already narrow) cell
        # cover; the expensive pts×pc candidate join itself executes
        # ONCE (r4 — previously the counts aggregated ``cand`` and the
        # candidate subtree ran twice unless exchange reuse kicked in,
        # a silent 2× on the dominant join). Bound ≥ actual (bbox
        # filter only shrinks it) → conservative split counts, each
        # group still ≤ max_probes_per_group.
        # r6 (guide §2.3): ``_ns`` joins onto the NARROW pc frame
        # (O(polygons × cells) rows) BEFORE the cell join and rides
        # into the candidates as one int column — previously the
        # counts joined onto the candidate frame itself, re-shuffling
        # every (point × polygon) row for a per-polygon lookup
        # (measured ~0.4 s of the 5.4 s 1M×40k wall).
        pts_per_cell = pts.groupBy("cell_i", "cell_j").agg(F.count("*").alias("_np"))
        counts = (
            pc.select("cell_i", "cell_j", "pkey")
            .join(pts_per_cell, ["cell_i", "cell_j"], "inner")
            .groupBy("pkey")
            .agg(F.sum("_np").alias("_nc"))
        )
        n_salt = F.greatest(
            F.ceil(F.col("_nc") / F.lit(max_probes_per_group)), F.lit(1)
        ).cast("int")
        pc = pc.join(counts.select("pkey", n_salt.alias("_ns")), "pkey", "left").fillna(
            {"_ns": 1}  # a polygon with zero points in its cells draws
            # no candidates anyway; 1 keeps the left join total
        )
    # a point keys to ONE cell, so each (point, polygon) candidate pair
    # arises once — no dedup needed
    cand = pts.join(pc, ["cell_i", "cell_j"], "inner").where(
        (F.col("x") >= F.col("pbx1"))
        & (F.col("x") <= F.col("pbx2"))
        & (F.col("y") >= F.col("pby1"))
        & (F.col("y") <= F.col("pby2"))
    )
    if salt is None:
        cand = cand.withColumn(
            "gsalt", F.pmod(F.xxhash64(point_id), F.col("_ns")).cast("int")
        ).drop("_ns")
    elif group_salt > 1:
        cand = cand.withColumn(
            "gsalt", F.pmod(F.xxhash64(point_id), F.lit(group_salt)).cast("int")
        )
    else:
        cand = cand.withColumn("gsalt", F.lit(0))
    # THREE PARALLEL PRIMITIVE ARRAYS, not collect_list(struct(...)):
    # all aggregates of one groupBy consume the same per-group row
    # stream, so the arrays stay index-aligned, and Arrow hands the
    # kernel numpy-convertible list columns directly — no per-element
    # Python dict unpacking in the probe hot path (r4; was the one
    # per-row-Python site left in a scale path).
    per_poly = cand.groupBy("pkey", "gsalt").agg(
        F.first("p_tile_i").alias("p_tile_i"),
        F.first("p_tile_j").alias("p_tile_j"),
        F.first("p_poly_id").alias("p_poly_id"),
        F.first("p_area").alias("p_area"),
        F.collect_list(F.col(point_id)).alias("probe_ids"),
        F.collect_list("x").alias("probe_xs"),
        F.collect_list("y").alias("probe_ys"),
    )
    with_coords = per_poly.join(coords, "pkey")

    pt_field = points.schema[point_id].dataType
    hit_schema = T.StructType(
        [
            T.StructField(point_id, pt_field),
            T.StructField("x", T.DoubleType()),
            T.StructField("y", T.DoubleType()),
            T.StructField("p_tile_i", T.IntegerType()),
            T.StructField("p_tile_j", T.IntegerType()),
            T.StructField("p_poly_id", T.LongType()),
            T.StructField("p_area", T.DoubleType()),
        ]
    )

    def pip_hits(batches):
        from ..kernels.rings import _pip_many_vs_ring

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                px = np.asarray(row.probe_xs, np.float64)
                if px.size == 0:
                    continue
                ids = np.asarray(row.probe_ids)
                py = np.asarray(row.probe_ys, np.float64)
                sx = np.asarray(row.shell_xs, np.float64)
                sy = np.asarray(row.shell_ys, np.float64)
                inside = _pip_many_vs_ring(px, py, sx, sy)
                hx_all = row.hole_xs
                if hx_all is not None and len(hx_all) and inside.any():
                    hy_all = row.hole_ys
                    live = np.flatnonzero(inside)
                    for hx, hy in zip(hx_all, hy_all):
                        if live.size == 0:
                            break
                        in_hole = _pip_many_vs_ring(
                            px[live], py[live],
                            np.asarray(hx, np.float64), np.asarray(hy, np.float64),
                        )
                        inside[live[in_hole]] = False
                        live = live[~in_hole]
                sel = np.flatnonzero(inside)
                if sel.size:
                    yield pd.DataFrame(
                        {
                            point_id: ids[sel],
                            "x": px[sel],
                            "y": py[sel],
                            "p_tile_i": np.full(sel.size, row.p_tile_i, np.int32),
                            "p_tile_j": np.full(sel.size, row.p_tile_j, np.int32),
                            "p_poly_id": np.full(sel.size, row.p_poly_id, np.int64),
                            "p_area": np.full(sel.size, row.p_area, np.float64),
                        }
                    )

    hit = with_coords.mapInPandas(pip_hits, hit_schema)
    # smallest containing polygon per point (argmin, polygonizer.rs:226-229)
    return hit.groupBy(point_id).agg(
        F.min_by(F.struct("p_tile_i", "p_tile_j", "p_poly_id"), "p_area").alias("best"),
        F.min("p_area").alias("poly_area"),
        F.first("x").alias("x"),
        F.first("y").alias("y"),
        F.count("*").alias("n_containing"),
    ).select(
        point_id,
        F.col("best.p_tile_i").alias("poly_tile_i"),
        F.col("best.p_tile_j").alias("poly_tile_j"),
        F.col("best.p_poly_id").alias("poly_id"),
        "poly_area",
        "x",
        "y",
        "n_containing",
    )


def knn_join(
    points: DataFrame,
    centroids: list[tuple[int, float, float]],
    k: int = 3,
    point_id: str = "image_id",
) -> DataFrame:
    """k nearest centroids per point via numpy broadcast in an Arrow
    batch UDF — no shuffle; the centroid table (tile centroids: one
    per tile) rides into each task as a captured array.

    The UDF returns a STRUCT OF PRIMITIVE COLUMNS built directly from
    numpy (id0/d0/id1/d1/...) — zero per-row Python objects — and the
    (rank, id, dist) explosion happens JVM-side. (The first version
    built a list-of-dicts per row; at 1M rows that Python churn made
    the stage anti-scale.) Output: one row per (point, rank)."""
    ids = np.asarray([c[0] for c in centroids], dtype=np.int64)
    cxs = np.asarray([c[1] for c in centroids], dtype=np.float64)
    cys = np.asarray([c[2] for c in centroids], dtype=np.float64)
    kk = min(k, len(ids))

    schema = T.StructType(
        [f for i in range(kk) for f in (
            T.StructField(f"id{i}", T.LongType()),
            T.StructField(f"d{i}", T.DoubleType()),
        )]
    )

    @F.pandas_udf(schema)
    def topk(px: pd.Series, py: pd.Series) -> pd.DataFrame:
        x = px.to_numpy()[:, None]
        y = py.to_numpy()[:, None]
        d2 = (x - cxs[None, :]) ** 2 + (y - cys[None, :]) ** 2
        order = np.argsort(d2, axis=1, kind="stable")[:, :kk]
        rows = np.arange(d2.shape[0])[:, None]
        data = {}
        for i in range(kk):
            c = order[:, i]
            data[f"id{i}"] = ids[c]
            data[f"d{i}"] = np.sqrt(d2[rows[:, 0], c])
        return pd.DataFrame(data)

    nn = points.withColumn("nn", topk("x", "y"))
    ranked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("rank"),
                    F.col(f"nn.id{i}").alias("centroid_id"),
                    F.col(f"nn.d{i}").alias("dist"),
                )
                for i in range(kk)
            ]
        )
    )
    return nn.select(point_id, "x", "y", ranked.alias("r")).select(
        point_id, "x", "y", "r.rank", "r.centroid_id", "r.dist"
    )


def knn_join_cells(
    points: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    point_id: str = "image_id",
    cells_per_axis: int | None = None,
    max_rounds: int = 8,
) -> DataFrame:
    """EXACT k nearest centroids per point for centroid sets too large
    to broadcast (``knn_join`` is the closure-broadcast fast path; this
    is the scale path named in the module docstring).

    Round r uses a grid of side ``cell·2^r``: centroids replicate into
    their 3×3 cell neighborhood (column exprs), points key to one
    cell, the equi-join yields candidates, and a window takes the
    top-k. A point is RESOLVED when it has k candidates and its k-th
    distance is < cell side — any centroid outside the 3×3
    neighborhood is ≥ one cell side away, so nothing closer was
    missed. Unresolved points (sparse regions) retry on the doubled
    grid; each round touches only the leftover points. Exact for every
    resolved point; raises if points remain after ``max_rounds``
    (pathological: fewer than k centroids in range — callers should
    ensure k ≤ #centroids).

    ``centroids``: DataFrame (centroid_id, cx, cy).
    Output: (point_id, x, y, rank, centroid_id, dist) — the
    ``knn_join`` schema.
    """
    spark = points.sparkSession
    stats = centroids.agg(
        F.min("cx").alias("x0"),
        F.max("cx").alias("x1"),
        F.min("cy").alias("y0"),
        F.max("cy").alias("y1"),
        F.count("*").alias("n"),
    ).collect()[0]
    n_cent = int(stats["n"])
    if n_cent == 0:
        raise ValueError("knn_join_cells: empty centroid table")
    x0, y0 = float(stats["x0"]), float(stats["y0"])
    span = max(float(stats["x1"]) - x0, float(stats["y1"]) - y0, 1e-300)
    if cells_per_axis is None:
        cells_per_axis = max(int(np.sqrt(n_cent)), 1)
    base_cell = span / cells_per_axis

    pending = points.select(point_id, "x", "y")
    resolved_parts: list[DataFrame] = []
    w = Window.partitionBy(point_id).orderBy("dist", "centroid_id")
    for r in range(max_rounds):
        cell = base_cell * (2.0**r)
        ci = F.floor((F.col("cx") - F.lit(x0)) / F.lit(cell)).cast("long")
        cj = F.floor((F.col("cy") - F.lit(y0)) / F.lit(cell)).cast("long")
        cent_cells = (
            centroids.withColumn("_ci", ci)
            .withColumn("_cj", cj)
            .withColumn("di", F.explode(F.sequence(F.lit(-1), F.lit(1))))
            .withColumn("dj", F.explode(F.sequence(F.lit(-1), F.lit(1))))
            .select(
                (F.col("_ci") + F.col("di")).alias("cell_i"),
                (F.col("_cj") + F.col("dj")).alias("cell_j"),
                "centroid_id",
                "cx",
                "cy",
            )
        )
        pts = pending.withColumn(
            "cell_i", F.floor((F.col("x") - F.lit(x0)) / F.lit(cell)).cast("long")
        ).withColumn("cell_j", F.floor((F.col("y") - F.lit(y0)) / F.lit(cell)).cast("long"))
        dx = F.col("x") - F.col("cx")
        dy = F.col("y") - F.col("cy")
        # plain multiplies, not pow(·,2): bit-reproducible across
        # engines (the driver oracle recomputes this in DuckDB)
        cand = pts.join(cent_cells, ["cell_i", "cell_j"]).withColumn(
            "dist", F.sqrt(dx * dx + dy * dy)
        )
        # NOTE (r6): a collect_list+sort_array reformulation of the
        # top-k (one groupBy instead of window + resolution aggregate +
        # semi-join) was measured 2.3× SLOWER warm (6.5 s vs 2.8 s at
        # 1M×40k) — per-group list-of-struct aggregation buffers cost
        # more than the window's sort — so the window shape stays.
        topk = (
            cand.withColumn("rank", F.row_number().over(w) - 1)
            .where(F.col("rank") < k)
            .select(point_id, "x", "y", "rank", "centroid_id", "dist")
        )
        # resolved: k candidates AND k-th distance strictly inside the
        # cell-side guarantee radius
        per_point = topk.groupBy(point_id).agg(
            F.count("*").alias("_nk"), F.max("dist").alias("_dk")
        )
        ok_ids = per_point.where(
            (F.col("_nk") >= k) & (F.col("_dk") < F.lit(cell))
        ).select(point_id)
        resolved_parts.append(topk.join(F.broadcast(ok_ids), point_id, "left_semi"))
        # persisted: each later round (and the final union) re-reads
        # it. The handles deliberately stay cached until session GC:
        # an eager full-count-plus-unpersist variant (release each
        # superseded round) was measured 10× SLOWER end-to-end — the
        # full count executes the whole chain eagerly every round,
        # while limit(1) early-stops; the leak is bounded by
        # max_rounds tiny leftover frames (ADVICE r02 adjudicated).
        pending = pending.join(F.broadcast(ok_ids), point_id, "left_anti").persist()
        if pending.limit(1).count() == 0:
            break
    else:
        if pending.limit(1).count() > 0:
            raise RuntimeError(
                f"knn_join_cells: unresolved points after {max_rounds} rounds "
                "(k likely exceeds reachable centroids)"
            )
    out = resolved_parts[0]
    for p in resolved_parts[1:]:
        out = out.unionByName(p)
    return out


def nearest_centroid_cols(
    points: DataFrame,
    centroids: list[tuple[int, float, float]],
    prefix: str = "nearest_tile",
) -> DataFrame:
    """Nearest-centroid as inline columns (rank-0 of knn_join without
    the explode + self-join) — the pipeline's hot path: map-only, no
    shuffle, numpy broadcast in one Arrow batch UDF."""
    ids = np.asarray([c[0] for c in centroids], dtype=np.int64)
    cxs = np.asarray([c[1] for c in centroids], dtype=np.float64)
    cys = np.asarray([c[2] for c in centroids], dtype=np.float64)

    schema = T.StructType(
        [T.StructField("nid", T.LongType()), T.StructField("nd", T.DoubleType())]
    )

    @F.pandas_udf(schema)
    def nearest(px: pd.Series, py: pd.Series) -> pd.DataFrame:
        x = px.to_numpy()[:, None]
        y = py.to_numpy()[:, None]
        d2 = (x - cxs[None, :]) ** 2 + (y - cys[None, :]) ** 2
        c = np.argmin(d2, axis=1)
        return pd.DataFrame(
            {"nid": ids[c], "nd": np.sqrt(d2[np.arange(d2.shape[0]), c])}
        )

    return (
        points.withColumn("_nn", nearest("x", "y"))
        .withColumn(prefix, F.col("_nn.nid"))
        .withColumn(f"{prefix}_dist", F.col("_nn.nd"))
        .drop("_nn")
    )


def raster_tile_assign(
    points: DataFrame, x0: float, y0: float, tile_size: float, cols: int, rows: int
) -> DataFrame:
    """Raster tile per point — pure column arithmetic (the J3 analog,
    tiling.rs:42-58 grid addressing)."""
    return points.withColumn(
        "raster_i", cell_range_cols(F.col("x"), x0, tile_size, cols)
    ).withColumn("raster_j", cell_range_cols(F.col("y"), y0, tile_size, rows))
