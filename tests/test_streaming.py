"""Streaming bridge: file-source micro-batches → incremental
checkpointed polygonize (fingerprints recompute only changed tiles)."""

from geo_polygonize_spark.sources.fixtures import grid_lines
from geo_polygonize_spark.streaming import read_coverage, streaming_polygonize

from .conftest import lines_to_df


def test_streaming_incremental(spark, tmp_path):
    n = 10
    xs, ys = grid_lines(n)
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")

    # batch 1: horizontals only (no closed rings yet)
    lines_to_df(spark, xs[::2], ys[::2]).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "line_id long, xs array<double>, ys array<double>, dataset string"
    ).parquet(src)
    q = streaming_polygonize(
        spark, stream, store, ck, tile_size=5.0, buffer=1.5,
        bbox=(0.0, 0.0, float(n), float(n)), drop_collapsed=True,
        available_now=True,
    )
    q.awaitTermination(120)
    assert read_coverage(spark, ck).count() == 0  # dangles only so far

    # batch 2: verticals arrive → full grid closes
    lines_to_df(spark, xs[1::2], ys[1::2]).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(
        "line_id long, xs array<double>, ys array<double>, dataset string"
    ).parquet(src)
    q2 = streaming_polygonize(
        spark, stream2, store, ck, tile_size=5.0, buffer=1.5,
        bbox=(0.0, 0.0, float(n), float(n)), drop_collapsed=True,
        available_now=True,
    )
    q2.awaitTermination(120)
    out = read_coverage(spark, ck)
    assert out.count() == n * n
    # metrics show multiple runs (incremental lineage)
    m = spark.read.parquet(f"{ck}/metrics")
    assert m.select("run_id").distinct().count() >= 2
