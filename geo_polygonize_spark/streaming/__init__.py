"""Streaming ingestion → incremental polygonize.

The reference is strictly batch (single ``polygonize()`` call,
SURVEY.md §2.9) and the north_rule asks for resumable checkpoints
rather than Structured Streaming semantics. This module is the thin
bridge for callers that DO receive linework as a stream: micro-batches
append to a lines store, and each trigger re-runs the checkpointed
tiled polygonize — whose per-tile content fingerprints
(checkpoint.py) make the re-run naturally INCREMENTAL: only tiles
whose segment set changed recompute; untouched tiles are pure scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..checkpoint import resumable_tiled_polygonize


def streaming_polygonize(
    spark: SparkSession,
    lines_stream: DataFrame,
    store_dir: str,
    ckpt_dir: str,
    tile_size: float,
    trigger: str = "10 seconds",
    available_now: bool = False,
    **polygonize_kwargs,
):
    """lines readStream → incremental polygon coverage.

    ``lines_stream``: streaming DataFrame with the lines schema
    (line_id, xs, ys, dataset). Each micro-batch appends to
    ``store_dir`` (parquet) and refreshes the coverage at
    ``ckpt_dir`` via the fingerprint-checkpointed tiled polygonize.
    Returns the StreamingQuery; read the current coverage any time
    with ``read_coverage``.
    """

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.write.mode("append").parquet(store_dir)
        all_lines = spark.read.parquet(store_dir)
        # changed tiles recompute, unchanged tiles no-op (fingerprints)
        resumable_tiled_polygonize(
            spark, all_lines, ckpt_dir, tile_size, **polygonize_kwargs
        ).count()

    w = lines_stream.writeStream.foreachBatch(on_batch).option(
        "checkpointLocation", f"{ckpt_dir}/_stream_meta"
    )
    # availableNow: drain everything currently available then stop —
    # deterministic for tests and batch-catchup runs
    w = w.trigger(availableNow=True) if available_now else w.trigger(processingTime=trigger)
    return w.start()


def read_coverage(spark: SparkSession, ckpt_dir: str) -> DataFrame:
    """Latest committed polygon coverage from a streaming/resumable
    checkpoint dir."""
    from ..checkpoint import read_checkpointed_coverage

    return read_checkpointed_coverage(spark, ckpt_dir)
