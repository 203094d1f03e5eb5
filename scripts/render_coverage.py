"""Render a GeoJSON linework file's polygonized coverage to SVG —
the dev-visualization CLI (reference ``scripts/visualize.py`` analog,
without matplotlib).

Usage: python scripts/render_coverage.py INPUT.geojson OUT.svg
       [--tile-size T] [--buffer B] [--width W]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--tile-size", type=float, default=None)
    ap.add_argument("--buffer", type=float, default=1.0)
    ap.add_argument("--width", type=int, default=800)
    args = ap.parse_args()

    from geo_polygonize_spark.operators.polygonize_op import tiled_polygonize
    from geo_polygonize_spark.plans import build_session
    from geo_polygonize_spark.sources.geojson import read_geojson_lines
    from geo_polygonize_spark.sources.svg import write_svg

    spark = build_session("render", cores=8, shuffle_partitions=8)
    lines = read_geojson_lines(spark, args.input)
    if args.tile_size is None:
        # one tile covering everything — simplest for small dev inputs
        from geo_polygonize_spark.operators.polygonize_op import _bbox_of_segments, segmentize_df

        bx = _bbox_of_segments(segmentize_df(lines))
        args.tile_size = max(bx[2] - bx[0], bx[3] - bx[1], 1.0) * 2.0
    polys = tiled_polygonize(lines, tile_size=args.tile_size, buffer=args.buffer)
    write_svg(polys, args.output, width=args.width)
    print(f"wrote {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
