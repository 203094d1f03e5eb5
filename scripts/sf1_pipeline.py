"""VERDICT r5 item 5: one 1M-image (sf1-scale) image_pipeline run to
confirm no hidden driver-side or broadcast-size cliff before the design
is declared 100x-safe. Records wall, per-stage timers, peak driver RSS,
and images/s vs the sf0.1 rate.

Run: python scripts/sf1_pipeline.py   (writes results to stdout;
numbers cited in OPTIMIZATION_r06.md / BENCH.md)
"""

from __future__ import annotations

import os
import resource
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from geo_polygonize_spark.engine import image_pipeline
from geo_polygonize_spark.plans import build_session
from geo_polygonize_spark.sources.fixtures import grid_lines
from geo_polygonize_spark.sources.images import synth_images

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    spark = build_session("sf1-pipeline", cores=CPUS, shuffle_partitions=max(CPUS, 8))
    n_images = 1_000_000
    img_path = f"/tmp/bench_images_sf1.0.parquet"
    t0 = time.time()
    if not os.path.exists(img_path):
        synth_images(spark, n_images, partitions=max(CPUS * 4, 64)).write.mode(
            "overwrite"
        ).parquet(img_path)
    print(f"SF1 synth+write: {time.time() - t0:.1f}s", flush=True)
    images = spark.read.parquet(img_path)

    n = 50
    lx, ly = grid_lines(n)
    cover_df = spark.createDataFrame(
        [
            (i, [float(v) for v in x], [float(v) for v in y], "bench")
            for i, (x, y) in enumerate(zip(lx, ly))
        ],
        "line_id long, xs array<double>, ys array<double>, dataset string",
    )
    bbox = (0.0, 0.0, float(n), float(n))

    # warm (codegen + python workers), same shape the bench warms
    image_pipeline(
        spark, images.limit(20_000), cover_df, bbox, tile_size=10.0, buffer=1.5
    ).count()
    print(f"SF1 warm done, driver RSS {rss_mb():.0f} MB", flush=True)

    for rep in range(3):
        t0 = time.time()
        n_out = image_pipeline(
            spark, images, cover_df, bbox, tile_size=10.0, buffer=1.5
        ).count()
        dt = time.time() - t0
        print(
            f"SF1 run {rep}: {dt:.2f}s  rows={n_out}  "
            f"images/s={n_images / dt:,.0f}  driver RSS {rss_mb():.0f} MB",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
