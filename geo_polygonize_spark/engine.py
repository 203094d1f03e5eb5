"""The flagship pipeline: polygonize + spatial-join + tiling over the
image+caption table (BASELINE.json north_star).

Stages (each a documented operator elsewhere in the package):
  1. linework → tiled polygonize → polygon coverage       (1 shuffle)
  2. images → derived points (xxhash64 column exprs — deterministic,
     JVM-side; the payload `bytes` column is PROJECTED OUT here and
     re-joined by image_id at the end, so multi-KB blobs never ride
     through the geometry shuffles)
  3. Morton cell encode (column exprs) → PIP join vs coverage
  4. kNN to tile centroids (numpy broadcast, no shuffle)
  5. raster tile assignment (column arithmetic)
  6. payload re-join + caption passthrough

Every join is either broadcast or a cell-key equi-join; the only wide
shuffles are the tile shuffle inside tiled_polygonize and the PIP
cell join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from .functions.cells import morton_cell_col
from .operators.polygonize_op import tiled_polygonize
from .operators.spatial_join import knn_join, pip_join, raster_tile_assign


def derive_points(images: DataFrame, bbox: tuple[float, float, float, float]) -> DataFrame:
    """Deterministic point per image: two independent xxhash64 streams
    of image_id → uniform (x, y) in bbox. Pure column exprs."""
    x0, y0, x1, y1 = bbox
    m = F.lit(float(1 << 40))
    hx = (F.pmod(F.xxhash64("image_id"), F.lit(1 << 40)).cast("double") / m)
    hy = (F.pmod(F.xxhash64("image_id", F.lit(1)), F.lit(1 << 40)).cast("double") / m)
    return images.select(
        "image_id",
        (F.lit(x0) + hx * F.lit(x1 - x0)).alias("x"),
        (F.lit(y0) + hy * F.lit(y1 - y0)).alias("y"),
    )


def tile_centroids(bbox, tile_size: float) -> list[tuple[int, float, float]]:
    """Centers of the raster tile grid (the kNN targets)."""
    x0, y0, x1, y1 = bbox
    cols = max(int(np.ceil((x1 - x0) / tile_size)), 1)
    rows = max(int(np.ceil((y1 - y0) / tile_size)), 1)
    out = []
    for j in range(rows):
        for i in range(cols):
            out.append((j * cols + i, x0 + (i + 0.5) * tile_size, y0 + (j + 0.5) * tile_size))
    return out


def image_pipeline(
    spark: SparkSession,
    images: DataFrame,
    lines_df: DataFrame,
    bbox: tuple[float, float, float, float],
    tile_size: float,
    buffer: float = 1.0,
    cell_size: float | None = None,
    knn_k: int = 3,
    polygons: DataFrame | None = None,
    salt: int | None = None,
    drop_collapsed: bool = True,
) -> DataFrame:
    """images × linework → per-image spatial enrichment.

    Output: one row per image that falls inside the polygonized
    coverage: containing polygon (smallest), kNN tile centroids,
    raster tile, Morton cell, caption + phash passthrough.
    """
    x0, y0, x1, y1 = bbox
    if cell_size is None:
        cell_size = tile_size / 4.0

    if polygons is None:
        polygons = tiled_polygonize(
            lines_df, tile_size=tile_size, buffer=buffer, bbox=bbox, drop_collapsed=drop_collapsed
        )

    # narrow-then-rejoin: geometry stages never see `bytes`
    points = derive_points(images, bbox).withColumn(
        "cell", morton_cell_col(F.col("x"), F.col("y"), x0, y0, cell_size)
    )

    hits = pip_join(points, polygons, x0, y0, cell_size, salt=salt)

    cents = tile_centroids(bbox, tile_size)
    nn = knn_join(hits, cents, k=knn_k)
    nn1 = nn.filter(F.col("rank") == 0).select(
        "image_id",
        F.col("centroid_id").alias("nearest_tile"),
        F.col("dist").alias("nearest_tile_dist"),
    )

    cols = max(int(np.ceil((x1 - x0) / tile_size)), 1)
    rows = max(int(np.ceil((y1 - y0) / tile_size)), 1)
    placed = raster_tile_assign(hits, x0, y0, tile_size, cols, rows)

    enriched = (
        placed.join(nn1, "image_id")
        .withColumn("cell", morton_cell_col(F.col("x"), F.col("y"), x0, y0, cell_size))
    )
    # payload re-join (broadcast the narrow enrichment if small; at
    # scale both sides hash-join on image_id, the table's natural key)
    return enriched.join(
        images.select("image_id", "caption", "phash", "fmt", "w", "h"), "image_id"
    )
