"""Per-partition lineage/metrics checkpoints + mid-job resume.

north_rule requirement with no reference analog (the reference is a
single-process library; a crash restarts from scratch). Design:

* work unit = one (sub-)tile group of the tiled polygonize;
* polygons append under ``<dir>/polygons/run_id=<id>``; one metrics
  row per completed tile appends to ``<dir>/metrics``:
  ``(tile key, fingerprint, n_segments, n_polys, run_id,
  completed_at)``. Fingerprint = commutative sum of per-segment
  xxhash64 → lineage records *what input* the tile was computed from.
* metrics commit AFTER polygons, so a crash mid-run leaves orphan
  polygon files but no metrics row — the resume recomputes the tile
  and the read path ignores orphans (it only admits polygons whose
  (tile key, run_id) is the tile's LATEST committed metrics row).
* resume = anti-join of the current assignment's (tile key,
  fingerprint) against committed metrics — unchanged tiles skip,
  changed/missing tiles recompute. Idempotent end to end.
"""

from __future__ import annotations

import time
import uuid

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .operators.polygonize_op import (
    POLYGON_SCHEMA,
    TILE_KEY,
    prepare_assigned,
    prepare_tiled,
)


def _tile_metrics(assigned: DataFrame) -> DataFrame:
    # bit_xor: commutative + overflow-free under ANSI mode (a plain
    # sum of 64-bit hashes overflows); n_segments disambiguates the
    # duplicate-pair xor cancellation case
    return assigned.groupBy(*TILE_KEY).agg(
        F.count("*").alias("n_segments"),
        F.bit_xor(F.xxhash64("x1", "y1", "x2", "y2")).alias("fingerprint"),
    )


def _latest_metrics(spark: SparkSession, metrics_path: str) -> DataFrame | None:
    try:
        m = spark.read.parquet(metrics_path)
    except AnalysisException as e:
        # absent metrics dir = never-checkpointed store (fresh run);
        # other failures must surface (same rationale as the polygons
        # read in read_checkpointed_coverage)
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise
    w = Window.partitionBy(*TILE_KEY).orderBy(F.col("completed_at").desc())
    return m.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def resumable_tiled_polygonize(
    spark: SparkSession,
    lines_df: DataFrame | None,
    ckpt_dir: str,
    tile_size: float,
    assigned_segments: DataFrame | None = None,
    scope_to_assigned: bool = False,
    x0: float = 0.0,
    y0: float = 0.0,
    buffer: float = 0.0,
    **kwargs,
) -> DataFrame:
    """Tiled polygonize with tile-level checkpoint/resume. Returns the
    polygon DataFrame read from the checkpoint store — identical
    whether the job ran fresh, resumed after a crash, or was already
    complete (then it is a pure scan, no recompute).

    ``assigned_segments``: pre-tile-assigned segments (x1..y2, tile_i,
    tile_j) instead of raw lines — the streaming path feeds the
    touched partitions of its tile-partitioned segment store here.
    ``scope_to_assigned``: the assignment covers only a SUBSET of the
    store's tiles (incremental recompute); stale-key tombstoning then
    applies only within the parents present in the assignment, and
    absent tiles are trusted as still-valid coverage."""
    if assigned_segments is not None:
        bbox = kwargs.pop("bbox", None)
        if bbox is not None:
            x0, y0 = float(bbox[0]), float(bbox[1])
        assigned, kernel = prepare_assigned(
            assigned_segments, tile_size, buffer=buffer, x0=x0, y0=y0, **kwargs
        )
    else:
        assigned, kernel = prepare_tiled(lines_df, tile_size, buffer=buffer, **kwargs)
    metrics_now = _tile_metrics(assigned).persist()

    poly_path = f"{ckpt_dir}/polygons"
    metrics_path = f"{ckpt_dir}/metrics"

    latest = _latest_metrics(spark, metrics_path)
    if latest is not None:
        # n_segments joins too: xor cancels on duplicated segments, so
        # (fingerprint, count) together identify the tile's multiset
        pending_keys = metrics_now.join(
            latest.select(*TILE_KEY, "fingerprint", "n_segments"),
            on=TILE_KEY + ["fingerprint", "n_segments"],
            how="left_anti",
        ).select(*TILE_KEY)
        # stale keys: committed in the store but absent from the
        # CURRENT assignment — a vanished tile, or a sub-tile layout
        # superseded by a different skew-split factor f (a changed
        # max_segments_per_tile or data growth). Without invalidation
        # their polygons stay admitted NEXT TO the new layout's —
        # silent duplication of the tile's coverage. Tombstone metrics
        # rows (a newer run that wrote zero polygons for the key) make
        # the latest-run admission drop them.
        stale_candidates = latest.select(*TILE_KEY)
        if scope_to_assigned:
            # incremental scope: only parents present in the current
            # assignment may invalidate; everything else is trusted
            parents = metrics_now.select("tile_i", "tile_j").distinct()
            stale_candidates = stale_candidates.join(
                F.broadcast(parents), ["tile_i", "tile_j"], "left_semi"
            )
        stale_keys = stale_candidates.join(
            metrics_now.select(*TILE_KEY), on=TILE_KEY, how="left_anti"
        )
    else:
        pending_keys = metrics_now.select(*TILE_KEY)
        stale_keys = None

    # polygon rows carry the FULL sub-tile group key so resume
    # admission is exact even when a single sub-tile recomputes
    import pandas as pd
    from pyspark.sql import types as T

    ckpt_schema = T.StructType(
        POLYGON_SCHEMA.fields
        + [
            T.StructField("f", T.IntegerType()),
            T.StructField("sub_i", T.IntegerType()),
            T.StructField("sub_j", T.IntegerType()),
        ]
    )

    def keyed_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        out = kernel(key, pdf)
        out["f"] = int(key[2])
        out["sub_i"] = int(key[3])
        out["sub_j"] = int(key[4])
        return out

    run_id = uuid.uuid4().hex
    if pending_keys.limit(1).count() > 0:
        pending = assigned.join(F.broadcast(pending_keys), TILE_KEY, "left_semi")
        polys = pending.groupBy(*TILE_KEY).applyInPandas(keyed_kernel, ckpt_schema)
        polys.write.mode("append").parquet(f"{poly_path}/run_id={run_id}")
        # count what actually landed (cheap scan of the new run dir)
        written = spark.read.parquet(f"{poly_path}/run_id={run_id}")
        counts = written.groupBy(*TILE_KEY).agg(F.count("*").alias("n_polys"))
        (
            _tile_metrics(pending)
            .join(counts, TILE_KEY, "left")
            .fillna({"n_polys": 0})
            .withColumn("run_id", F.lit(run_id))
            .withColumn("completed_at", F.lit(float(time.time())))
            .write.mode("append")
            .parquet(metrics_path)
        )
    if stale_keys is not None and stale_keys.limit(1).count() > 0:
        (
            stale_keys.withColumn("n_segments", F.lit(0).cast("long"))
            .withColumn("fingerprint", F.lit(0).cast("long"))
            .withColumn("n_polys", F.lit(0).cast("long"))
            .withColumn("run_id", F.lit(run_id))
            .withColumn("completed_at", F.lit(float(time.time())))
            .write.mode("append")
            .parquet(metrics_path)
        )
    metrics_now.unpersist()
    return read_checkpointed_coverage(spark, ckpt_dir)


def read_checkpointed_coverage(spark: SparkSession, ckpt_dir: str) -> DataFrame:
    """Latest committed polygon coverage from a checkpoint dir: admit
    only each sub-tile's latest committed run (orphans from crashed
    runs, superseded fingerprints, and tombstoned keys — vanished
    tiles / replaced skew-split layouts — drop out). An empty or
    not-yet-written checkpoint dir reads as an empty coverage."""
    latest = _latest_metrics(spark, f"{ckpt_dir}/metrics")
    if latest is None:
        return spark.createDataFrame([], POLYGON_SCHEMA)
    try:
        polys = spark.read.option("basePath", f"{ckpt_dir}/polygons").parquet(
            f"{ckpt_dir}/polygons/run_id=*"
        )
    except AnalysisException as e:
        # ONLY a genuinely absent polygons dir reads as empty (a
        # metrics-only checkpoint: every committed run wrote 0 polygons,
        # so no polygons/ directory was ever created). Any other read
        # failure — permissions, corruption, transient FS errors — must
        # surface, not masquerade as an empty coverage.
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], POLYGON_SCHEMA)
        raise
    return polys.join(
        F.broadcast(latest.select(*TILE_KEY, "run_id")),
        on=TILE_KEY + ["run_id"],
        how="left_semi",
    ).drop("run_id", "f", "sub_i", "sub_j")
