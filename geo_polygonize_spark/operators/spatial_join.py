"""Distributed spatial joins over the polygonized coverage.

These are the north_rule extensions the reference does not have (its
single-process analogs: the R-tree candidate join ``snap.rs:117-132``
and hole-assignment join ``polygonizer.rs:192-249``); here they are
cell-keyed equi-joins + vectorized refinement:

* ``pip_join(points, polygons)`` — point-in-polygon: polygons
  replicate into every grid cell their bbox covers (column exprs),
  points key to one cell (column exprs), the equi-join prunes
  candidates, a bbox pre-filter runs JVM-side, and the exact even-odd
  ray cast (the SIMD kernel's numpy analog, simd.rs:31-79, including
  holes) refines in an Arrow batch. Winner per point = the
  smallest-area containing polygon (argmin via ``min_by``, the same
  rule as hole assignment, polygonizer.rs:226-229).
  Skew: points replicate nothing; the heavy side (points) determines
  task balance through the shuffle hash, and AQE skew-join splits hot
  cells. Optionally ``salt`` adds an explicit salt column replicating
  the polygon side S ways so one mega-cell cannot own a single task.

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
from pyspark.sql import DataFrame, functions as F, types as T

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
    """Fully vectorized per-row ray cast over a ragged batch of rings:
    rings are NaN-padded to the batch max length — NaN comparisons are
    False, so padded segments contribute no crossings. Identical
    crossing rule to the reference SimdRing (simd.rs:31-79), batched
    rows × segments instead of 4 SIMD lanes."""
    n = len(rings)
    if n == 0:
        return np.zeros(0, dtype=bool)
    lens = np.fromiter((len(r[0]) for r in rings), dtype=np.int64, count=n)
    lmax = int(lens.max())
    X = np.full((n, lmax), np.nan)
    Y = np.full((n, lmax), np.nan)
    for i, (rx, ry) in enumerate(rings):
        X[i, : lens[i]] = rx
        Y[i, : lens[i]] = ry
    x1, x2 = X[:, :-1], X[:, 1:]
    y1, y2 = Y[:, :-1], Y[:, 1:]
    pyv = py[:, None]
    pxv = px[:, None]
    # division-free crossing test (see kernels/rings.py); NaN padding
    # still yields False comparisons
    straddle = (y1 > pyv) != (y2 > pyv)
    lhs = (pxv - x1) * (y2 - y1)
    rhs = (x2 - x1) * (pyv - y1)
    cross = straddle & ((lhs < rhs) == (y2 > y1))
    return (np.count_nonzero(cross, axis=1) % 2).astype(bool)


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


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    x0: float,
    y0: float,
    cell_size: float,
    point_id: str = "image_id",
    salt: int | None = None,
) -> DataFrame:
    """points(point_id, x, y, cell_i, cell_j ignored) × polygons →
    one row per point with its smallest containing polygon (or none:
    inner join semantics — points outside all coverage drop out).

    Points key to their cell with pure column arithmetic; the polygon
    side is replicated per covered cell (and per salt bucket when
    ``salt`` is set). Join is a plain equi-join Catalyst can plan
    (broadcast if the polygon side is small, else shuffle-hash with
    AQE skew splitting).
    """
    pc = polygon_cells(polygons, x0, y0, cell_size)
    pc = pc.select(
        "cell_i",
        "cell_j",
        F.col("tile_i").alias("p_tile_i"),
        F.col("tile_j").alias("p_tile_j"),
        F.col("poly_id").alias("p_poly_id"),
        "shell_xs",
        "shell_ys",
        "hole_xs",
        "hole_ys",
        F.col("area").alias("p_area"),
        "pbx1",
        "pbx2",
        "pby1",
        "pby2",
    )
    pts = points.withColumn(
        "cell_i", cell_range_cols(F.col("x"), x0, cell_size, 1 << 20)
    ).withColumn("cell_j", cell_range_cols(F.col("y"), y0, cell_size, 1 << 20))

    if salt is not None and salt > 1:
        # explicit skew salting: replicate each polygon-cell row into
        # `salt` buckets; each point picks one bucket by hash
        pc = pc.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        pts = pts.withColumn("salt", F.pmod(F.xxhash64(point_id), F.lit(salt)).cast("int"))
        keys = ["cell_i", "cell_j", "salt"]
    else:
        keys = ["cell_i", "cell_j"]

    cand = pts.join(pc, keys, "inner").where(
        (F.col("x") >= F.col("pbx1"))
        & (F.col("x") <= F.col("pbx2"))
        & (F.col("y") >= F.col("pby1"))
        & (F.col("y") <= F.col("pby2"))
    )
    hit = cand.where(
        _pip_refine("x", "y", "shell_xs", "shell_ys", "hole_xs", "hole_ys")
    )
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
    Output: one row per (point, rank) with centroid id + distance."""
    ids = np.asarray([c[0] for c in centroids], dtype=np.int64)
    cxs = np.asarray([c[1] for c in centroids], dtype=np.float64)
    cys = np.asarray([c[2] for c in centroids], dtype=np.float64)
    kk = min(k, len(ids))

    schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("rank", T.IntegerType()),
                T.StructField("centroid_id", T.LongType()),
                T.StructField("dist", T.DoubleType()),
            ]
        )
    )

    @F.pandas_udf(schema)
    def topk(px: pd.Series, py: pd.Series) -> pd.Series:
        x = px.to_numpy()[:, None]
        y = py.to_numpy()[:, None]
        d2 = (x - cxs[None, :]) ** 2 + (y - cys[None, :]) ** 2
        if kk < d2.shape[1]:
            part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
        else:
            part = np.broadcast_to(np.arange(d2.shape[1]), (d2.shape[0], d2.shape[1])).copy()
        rows = []
        for r in range(d2.shape[0]):
            cand = part[r]
            order = cand[np.argsort(d2[r, cand], kind="stable")]
            rows.append(
                [
                    {"rank": int(j), "centroid_id": int(ids[c]), "dist": float(np.sqrt(d2[r, c]))}
                    for j, c in enumerate(order)
                ]
            )
        return pd.Series(rows)

    return points.withColumn("knn", topk("x", "y")).select(
        point_id, "x", "y", F.explode("knn").alias("nn")
    ).select(
        point_id,
        "x",
        "y",
        F.col("nn.rank").alias("rank"),
        F.col("nn.centroid_id").alias("centroid_id"),
        F.col("nn.dist").alias("dist"),
    )


def raster_tile_assign(
    points: DataFrame, x0: float, y0: float, tile_size: float, cols: int, rows: int
) -> DataFrame:
    """Raster tile per point — pure column arithmetic (the J3 analog,
    tiling.rs:42-58 grid addressing)."""
    return points.withColumn(
        "raster_i", cell_range_cols(F.col("x"), x0, tile_size, cols)
    ).withColumn("raster_j", cell_range_cols(F.col("y"), y0, tile_size, rows))
