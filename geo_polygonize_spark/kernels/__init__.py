"""Pure-numpy geometry kernels (no Spark imports) — unit-testable
standalone, executed inside Arrow pandas UDFs by the operators layer."""

from .morton import cell_morton, z_order_index
from .polygonize import polygonize_lines, polygonize_segments, segmentize
from .rings import (
    Polygon,
    assemble_polygons,
    bbox,
    canonicalize_ring,
    centroid,
    point_in_ring,
    points_in_ring,
    polygon_centroid,
    signed_area,
)

__all__ = [
    "Polygon",
    "assemble_polygons",
    "bbox",
    "canonicalize_ring",
    "cell_morton",
    "centroid",
    "point_in_ring",
    "points_in_ring",
    "polygon_centroid",
    "polygonize_lines",
    "polygonize_segments",
    "segmentize",
    "signed_area",
    "z_order_index",
]
