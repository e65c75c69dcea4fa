"""Structured Streaming tiling: the streaming pipeline must produce the
same per-(window, tile) counts as the identical batch computation."""

from pyspark.sql import functions as F

from gos2_spark.geometry import Loop
from gos2_spark.spark.joins import TileSet, point_in_polygon_join
from gos2_spark.spark.pages import geoparsed_pages, synth_pages
from gos2_spark.spark.streaming import run_to_memory, streaming_tile_counts


def test_streaming_tile_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "pages_stream")
    synth_pages(spark, 20000, num_partitions=4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    tiles = TileSet({
        "nyc": Loop.regular(40.7128, -74.0060, 1.5, 16),
        "tokyo": Loop.regular(35.6762, 139.6503, 2.0, 16),
    }, max_cells=16)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)  # multiple micro-batches
        .parquet(src)
    )
    q = run_to_memory(
        streaming_tile_counts(stream, tiles, window="90 days"), "tc_test"
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["tile_id"]): r["n_pages"]
            for r in spark.table("tc_test").collect()
        }
    finally:
        q.stop()

    batch = (
        point_in_polygon_join(
            geoparsed_pages(spark.read.parquet(src), keep=("url", "warc_ts")),
            tiles, how="inner",
        )
        .groupBy(F.window("warc_ts", "90 days").alias("win"), "tile_id")
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("win.start").alias("ws"), "tile_id", "n_pages")
    )
    want = {(r["ws"], r["tile_id"]): r["n_pages"] for r in batch.collect()}
    assert got == want
    assert sum(v for (_, t), v in got.items() if t == "nyc") > 0
    assert sum(v for (_, t), v in got.items() if t == "tokyo") > 0
