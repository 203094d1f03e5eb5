#!/usr/bin/env python
"""CLI: GeoJSON file in → polygons GeoJSON out.

The analog of the reference's only end-user executable
(``examples/polygonize.rs:22-102``: clap args ``input output --node``),
plus the engine's extra knobs:

    python scripts/polygonize_file.py IN.geojson OUT.geojson \
        [--node] [--snap-grid 1e-10] [--tile-size T] [--buffer B] \
        [--stitched] [--drop-collapsed]

Default (no --tile-size): single-group exact polygonize — the
``Polygonizer::polygonize`` path. ``--tile-size`` → the distributed
tiled path (``TiledPolygonizer``, reference src/tiling.rs:35-125);
``--stitched`` → the multi-level stitched path (no max polygon size).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--node", action="store_true", help="robust noding (reference --node)")
    ap.add_argument("--snap-grid", type=float, default=1e-10)
    ap.add_argument("--tile-size", type=float, default=None)
    ap.add_argument("--buffer", type=float, default=1.0)
    ap.add_argument("--stitched", action="store_true")
    ap.add_argument("--drop-collapsed", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    if not os.path.exists(args.input):
        print(f"Input file does not exist: {args.input}", file=sys.stderr)
        return 1

    from geo_polygonize_spark.plans import build_session
    from geo_polygonize_spark.sources.geojson import read_geojson_lines, write_geojson_polygons

    spark = build_session("polygonize-file", cores=args.cores, shuffle_partitions=args.cores)
    try:
        lines = read_geojson_lines(spark, args.input)
        print(f"Read {lines.count()} linework features from {args.input}")
        if args.tile_size is None:
            from geo_polygonize_spark.operators.polygonize_op import polygonize

            polys = polygonize(
                lines,
                node_input=args.node,
                snap_grid=args.snap_grid,
                drop_collapsed=args.drop_collapsed,
            )
        elif args.stitched:
            from geo_polygonize_spark.operators.stitch import stitched_polygonize

            polys = stitched_polygonize(
                lines,
                tile_size=args.tile_size,
                buffer=args.buffer,
                snap_grid=args.snap_grid,
                drop_collapsed=args.drop_collapsed,
            )
        else:
            from geo_polygonize_spark.operators.polygonize_op import tiled_polygonize

            polys = tiled_polygonize(
                lines,
                tile_size=args.tile_size,
                buffer=args.buffer,
                snap_grid=args.snap_grid,
                drop_collapsed=args.drop_collapsed,
            )
        n = write_geojson_polygons(polys, args.output)
        print(f"Wrote {n} polygons to {args.output}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
