"""Interleaved same-session A/B for the r6 level-engine presplit
(SPARK_GRAFT_LEVEL_PRESPLIT toggles at call time). Cold plans:
clearCache before every run, as bench.py's polygonize family does."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from geo_polygonize_spark.plans import build_session
from geo_polygonize_spark.sources.fixtures import grid_lines

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = build_session("ab-level-presplit", cores=CPUS, shuffle_partitions=max(CPUS, 8))


def lines_df(xs, ys):
    return spark.createDataFrame(
        [
            (i, [float(v) for v in x], [float(v) for v in y], "bench")
            for i, (x, y) in enumerate(zip(xs, ys))
        ],
        "line_id long, xs array<double>, ys array<double>, dataset string",
    )


def run(gn, ts, presplit: bool):
    from geo_polygonize_spark.operators.stitch import stitched_polygonize

    os.environ["SPARK_GRAFT_LEVEL_PRESPLIT"] = "1" if presplit else "0"
    spark.catalog.clearCache()
    df = lines_df(*grid_lines(gn))
    t0 = time.time()
    n = stitched_polygonize(
        df, tile_size=ts, buffer=1.5, bbox=(0.0, 0.0, float(gn), float(gn)),
        drop_collapsed=True, strategy="level",
    ).count()
    dt = time.time() - t0
    assert n == gn * gn, n
    return dt


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # warm codegen/workers once per variant
    run(100, 25.0, False)
    run(100, 25.0, True)
    for gn, ts in ((400, 50.0), (100, 25.0)):
        a, b = [], []
        for _ in range(rounds):
            a.append(run(gn, ts, False))
            b.append(run(gn, ts, True))
        print(
            f"AB level grid{gn}: presplit OFF {sorted(a)}  ON {sorted(b)}  "
            f"(min {min(a):.2f} vs {min(b):.2f})",
            flush=True,
        )
