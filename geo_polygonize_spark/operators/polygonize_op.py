"""Distributed polygonize operators (DataFrame in → DataFrame out).

The Spark re-expression of the reference's two entry points:

* ``polygonize(lines_df)`` — whole-dataset polygonize, the analog of
  ``Polygonizer::polygonize`` (reference src/polygonizer.rs:112): one
  grouped-map Arrow UDF over a constant key. Correct for any input
  that fits one executor; the distributed path is ``tiled_polygonize``.

* ``tiled_polygonize(lines_df, ...)`` — the analog of
  ``TiledPolygonizer::polygonize`` (reference src/tiling.rs:35-125),
  built Spark-first:
    - segmentization + tile assignment are pure column expressions
      (bbox → covered tile-id ranges → ``sequence``/``explode``) — no
      join, unlike the reference's O(tiles × geoms) scan
      (src/tiling.rs:72-78);
    - buffered replication: a segment lands in every tile whose
      buffered window its bbox intersects (tiling.rs:66-78);
    - explicit skew handling the reference lacks (north_rule's
      "explicit salting of skewed cells"): tiles whose segment count
      exceeds ``max_segments_per_tile`` are split into f×f sub-tiles
      (f from the overflow ratio) with the same buffered-replication
      rule, so one hot tile cannot straggle the stage — one extra
      count scan, still a single shuffle;
    - one shuffle on the (sub-)tile key, then a grouped-map Arrow UDF
      runs the full local polygonize kernel with noding per tile
      (tiling.rs:62-85);
    - exactly-once ownership: keep polygons whose centroid lies in
      the (sub-)tile's half-open core ``[min, max)`` (tiling.rs:99-106)
      — the cores partition the plane, so no dupes and no losses —
      plus the sliver filter (area < 1e-6, tiling.rs:94-97).

Known parity limitation (shared with the reference, see
src/tiling.rs buffer semantics / SURVEY.md §3.3): a ring larger than
tile+buffer is owned by a tile that cannot see all of it. Callers
control ``tile_size``/``buffer``; the single-group ``polygonize`` is
the exact fallback.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..kernels.polygonize import DEFAULT_SNAP_GRID, polygonize_segments_pdf

POLYGON_SCHEMA = T.StructType(
    [
        T.StructField("tile_i", T.IntegerType()),
        T.StructField("tile_j", T.IntegerType()),
        T.StructField("poly_id", T.LongType()),
        T.StructField("shell_xs", T.ArrayType(T.DoubleType())),
        T.StructField("shell_ys", T.ArrayType(T.DoubleType())),
        T.StructField("hole_xs", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("hole_ys", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("n_holes", T.IntegerType()),
        T.StructField("area", T.DoubleType()),
        T.StructField("cx", T.DoubleType()),
        T.StructField("cy", T.DoubleType()),
    ]
)


def segmentize_df(lines_df: DataFrame) -> DataFrame:
    """lines(line_id, xs, ys) → segments(x1, y1, x2, y2).

    Pure column expressions (transform + explode run in whole-stage
    codegen; the reference does this in ``ls.lines()``,
    src/polygonizer.rs:85-100)."""
    seg = F.expr(
        "transform(slice(xs, 1, size(xs) - 1), "
        "(x, i) -> struct(x as x1, ys[i] as y1, xs[i + 1] as x2, ys[i + 1] as y2))"
    )
    return lines_df.select(F.explode(seg).alias("s")).select("s.x1", "s.y1", "s.x2", "s.y2")


def polygonize(
    lines_df: DataFrame,
    node_input: bool = True,
    snap_grid: float = DEFAULT_SNAP_GRID,
    drop_collapsed: bool = False,
) -> DataFrame:
    """Whole-dataset polygonize: one Arrow group holds all segments.

    Exact (no tiling approximation); use for modest inputs or as the
    stitch-free fallback."""
    segments = segmentize_df(lines_df)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return polygonize_segments_pdf(
            pdf["x1"].to_numpy(),
            pdf["y1"].to_numpy(),
            pdf["x2"].to_numpy(),
            pdf["y2"].to_numpy(),
            node_input=node_input,
            snap_grid=snap_grid,
            drop_collapsed=drop_collapsed,
            tile_i=-1,
            tile_j=-1,
        )

    return segments.withColumn("g", F.lit(0)).groupBy("g").applyInPandas(kernel, POLYGON_SCHEMA)


def _bbox_of_segments(segments: DataFrame) -> tuple[float, float, float, float]:
    r = segments.agg(
        F.least(F.min("x1"), F.min("x2")).alias("bx0"),
        F.least(F.min("y1"), F.min("y2")).alias("by0"),
        F.greatest(F.max("x1"), F.max("x2")).alias("bx1"),
        F.greatest(F.max("y1"), F.max("y2")).alias("by1"),
    ).collect()[0]
    return (r["bx0"], r["by0"], r["bx1"], r["by1"])


TILE_KEY = ["tile_i", "tile_j", "f", "sub_i", "sub_j"]


def prepare_tiled(
    lines_df: DataFrame,
    tile_size: float,
    buffer: float = 0.0,
    bbox: tuple[float, float, float, float] | None = None,
    snap_grid: float = DEFAULT_SNAP_GRID,
    drop_collapsed: bool = False,
    max_segments_per_tile: int | None = 200_000,
    max_split_factor: int = 16,
):
    """Build (assigned_segments_df, kernel) for tiled polygonize —
    exposed so the checkpoint/resume layer can anti-join completed
    tile keys between assignment and execution."""
    segments = segmentize_df(lines_df)
    if bbox is None:
        bbox = _bbox_of_segments(segments)
    x0, y0, x1g, y1g = (float(v) for v in bbox)
    cols = max(int(np.ceil((x1g - x0) / tile_size)), 1)
    rows = max(int(np.ceil((y1g - y0) / tile_size)), 1)

    assigned = assign_tiles(segments, tile_size, buffer, x0, y0, cols, rows)
    return prepare_assigned(
        assigned,
        tile_size,
        buffer=buffer,
        x0=x0,
        y0=y0,
        snap_grid=snap_grid,
        drop_collapsed=drop_collapsed,
        max_segments_per_tile=max_segments_per_tile,
        max_split_factor=max_split_factor,
    )


def assign_tiles(
    segments: DataFrame,
    tile_size: float,
    buffer: float,
    x0: float,
    y0: float,
    cols: int,
    rows: int,
) -> DataFrame:
    """Buffered tile assignment as pure column expressions —
    boundary-INCLUSIVE tile ranges: a bbox touching a buffered tile
    edge exactly belongs to that tile too (the reference uses
    Rect::intersects, which is closed — tiling.rs:74; the
    exact-boundary fixture tiling_tests.rs:52-80 depends on it).
    i_lo = ceil(v - 1) includes the tile whose upper edge == bx1."""
    bx1 = F.least("x1", "x2")
    bx2 = F.greatest("x1", "x2")
    by1 = F.least("y1", "y2")
    by2 = F.greatest("y1", "y2")
    ts = F.lit(tile_size)
    # BOTH bounds clamp into [0, n-1] (r6): lo > hi previously made
    # Spark's sequence() DESCEND, materializing phantom out-of-grid
    # tiles for segments wholly outside the declared bbox — whose
    # kernels then emitted polygons the documented contract (and the
    # reference's bbox-derived grid, src/tiling.rs:42-58) says are
    # dropped. Clamping collapses out-of-grid segments into the edge
    # tile; their polygons' centroids stay outside every half-open
    # core, so ownership drops them exactly as documented.
    i_lo = F.least(
        F.greatest(F.ceil((bx1 - F.lit(x0 + buffer)) / ts - 1), F.lit(0)),
        F.lit(cols - 1),
    ).cast("int")
    i_hi = F.greatest(
        F.least(F.floor((bx2 - F.lit(x0 - buffer)) / ts), F.lit(cols - 1)), F.lit(0)
    ).cast("int")
    j_lo = F.least(
        F.greatest(F.ceil((by1 - F.lit(y0 + buffer)) / ts - 1), F.lit(0)),
        F.lit(rows - 1),
    ).cast("int")
    j_hi = F.greatest(
        F.least(F.floor((by2 - F.lit(y0 - buffer)) / ts), F.lit(rows - 1)), F.lit(0)
    ).cast("int")
    return segments.withColumn("tile_i", F.explode(F.sequence(i_lo, i_hi))).withColumn(
        "tile_j", F.explode(F.sequence(j_lo, j_hi))
    )


def prepare_assigned(
    assigned: DataFrame,
    tile_size: float,
    buffer: float,
    x0: float,
    y0: float,
    snap_grid: float = DEFAULT_SNAP_GRID,
    drop_collapsed: bool = False,
    max_segments_per_tile: int | None = 200_000,
    max_split_factor: int = 16,
):
    """Skew sub-split + kernel for ALREADY tile-assigned segments
    (``assign_tiles`` output, or a tile-partitioned segment store as in
    the streaming path)."""
    bx1 = F.least("x1", "x2")
    bx2 = F.greatest("x1", "x2")
    by1 = F.least("y1", "y2")
    by2 = F.greatest("y1", "y2")
    ts = F.lit(tile_size)

    # ---- skew split: hot tiles → f×f buffered sub-tiles --------------
    if max_segments_per_tile is not None:
        factors = (
            assigned.groupBy("tile_i", "tile_j")
            .count()
            .filter(F.col("count") > max_segments_per_tile)
            .select(
                "tile_i",
                "tile_j",
                F.least(
                    F.ceil(F.sqrt(F.col("count") / F.lit(max_segments_per_tile))),
                    F.lit(max_split_factor),
                )
                .cast("int")
                .alias("f"),
            )
        )
        assigned = assigned.join(F.broadcast(factors), ["tile_i", "tile_j"], "left").fillna(
            {"f": 1}
        )
    else:
        assigned = assigned.withColumn("f", F.lit(1))

    tile_x0 = F.lit(x0) + F.col("tile_i").cast("double") * ts
    tile_y0 = F.lit(y0) + F.col("tile_j").cast("double") * ts
    side = ts / F.col("f")
    # two-sided clamps: see assign_tiles (descending-sequence hazard)
    si_lo = F.least(
        F.greatest(F.ceil((bx1 - F.lit(buffer) - tile_x0) / side - 1), F.lit(0)),
        F.col("f") - 1,
    ).cast("int")
    si_hi = F.greatest(
        F.least(F.floor((bx2 + F.lit(buffer) - tile_x0) / side), F.col("f") - 1), F.lit(0)
    ).cast("int")
    sj_lo = F.least(
        F.greatest(F.ceil((by1 - F.lit(buffer) - tile_y0) / side - 1), F.lit(0)),
        F.col("f") - 1,
    ).cast("int")
    sj_hi = F.greatest(
        F.least(F.floor((by2 + F.lit(buffer) - tile_y0) / side), F.col("f") - 1), F.lit(0)
    ).cast("int")
    assigned = assigned.withColumn("sub_i", F.explode(F.sequence(si_lo, si_hi))).withColumn(
        "sub_j", F.explode(F.sequence(sj_lo, sj_hi))
    )

    # Explicit hash repartition on the tile key BEFORE the grouped-map
    # UDF: a grouped-map's cost is per-group kernel CPU, not shuffle
    # bytes, but AQE coalesces by bytes — a few MB of compressed
    # segments collapse to ONE task and serialize the whole stage
    # (observed: grid-400 polygonize = 31s single-task vs ~3s spread).
    # groupBy reuses this exact hash partitioning, so no extra shuffle.
    sess = assigned.sparkSession
    n_parts = max(int(sess.sparkContext.defaultParallelism) * 2, 16)
    assigned = assigned.repartition(n_parts, *TILE_KEY)

    ts_py = float(tile_size)

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        tile_i, tile_j, f, sub_i, sub_j = (int(k) for k in key)
        side_py = ts_py / f
        core_x0 = x0 + tile_i * ts_py + sub_i * side_py
        core_y0 = y0 + tile_j * ts_py + sub_j * side_py
        out = polygonize_segments_pdf(
            pdf["x1"].to_numpy(),
            pdf["y1"].to_numpy(),
            pdf["x2"].to_numpy(),
            pdf["y2"].to_numpy(),
            node_input=True,  # per-tile noding, reference tiling.rs:62-63
            snap_grid=snap_grid,
            drop_collapsed=drop_collapsed,
            tile_i=tile_i,
            tile_j=tile_j,
        )
        cx = out["cx"].to_numpy()
        cy = out["cy"].to_numpy()
        # sliver filter (tiling.rs:94-97) + half-open ownership
        # (tiling.rs:99-106); cores partition the plane → exactly-once
        # across (sub-)tiles
        m = (
            (out["area"].to_numpy() >= 1e-6)
            & (cx >= core_x0)
            & (cx < core_x0 + side_py)
            & (cy >= core_y0)
            & (cy < core_y0 + side_py)
        )
        out = out[m].reset_index(drop=True)
        out["poly_id"] = np.arange(len(out), dtype=np.int64)
        return out

    return assigned, kernel


def tiled_polygonize(
    lines_df: DataFrame,
    tile_size: float,
    buffer: float = 0.0,
    bbox: tuple[float, float, float, float] | None = None,
    snap_grid: float = DEFAULT_SNAP_GRID,
    drop_collapsed: bool = False,
    max_segments_per_tile: int | None = 200_000,
    max_split_factor: int = 16,
) -> DataFrame:
    """Distributed tiled polygonize (reference src/tiling.rs:35-125).

    One shuffle (tile key) + one grouped-map Arrow UDF; optional
    pre-shuffle skew split of hot tiles (see module docstring).

    Contract (reference-parity, src/tiling.rs:66-106): only polygons
    that FIT a tile+buffer window are produced — larger polygons, and
    polygons lying outside an explicitly-passed ``bbox`` (whose tile
    grid clips the world), are dropped. Pass ``bbox=None`` to derive
    the grid from the data, or use ``stitched_polygonize`` for exact
    unbounded output regardless of bbox staleness.
    """
    assigned, kernel = prepare_tiled(
        lines_df,
        tile_size,
        buffer=buffer,
        bbox=bbox,
        snap_grid=snap_grid,
        drop_collapsed=drop_collapsed,
        max_segments_per_tile=max_segments_per_tile,
        max_split_factor=max_split_factor,
    )
    return assigned.groupBy(*TILE_KEY).applyInPandas(kernel, POLYGON_SCHEMA)
