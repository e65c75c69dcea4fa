"""Structured Streaming surface: continuous page tiling.

The reference is a static batch library (no incremental operators —
SURVEY §1), so streaming is an ENGINE extension, not a parity item: the
same geoparse → s2_cellid → covering-join → refine pipeline applied to an
unbounded pages stream. Design notes for 100 TB/day ingest:

- the tile side is static and broadcast: the stream-static inner join
  needs no stream-side state at all;
- the only stateful operator is the windowed count, bounded by the
  watermark (late pages beyond it are dropped deterministically);
- the refine pandas UDF is stateless per-batch, so Arrow batching and
  the one-thread-per-worker pinning behave exactly as in batch jobs;
- checkpointLocation + the source's exactly-once file tracking replace
  the batch checkpoint manifests of gos2_spark.spark.checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .joins import TileSet, point_in_polygon_join
from .pages import geoparsed_pages


def streaming_tile_counts(
    pages_stream: DataFrame,
    tiles: TileSet,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Unbounded pages -> per-(event-time window, tile) page counts.

    ``pages_stream`` is any streaming DataFrame with the pages schema
    (``spark.readStream.schema(...).parquet(dir)``, Kafka + a parser, or
    an Iceberg streaming read). The result is an append/update stream
    keyed by (window, tile_id).
    """
    pts = geoparsed_pages(pages_stream, keep=("url", "warc_ts"))
    joined = point_in_polygon_join(pts, tiles, how="inner")
    win = (
        F.window("warc_ts", window, slide) if slide else F.window("warc_ts", window)
    )
    return (
        joined.withWatermark("warc_ts", watermark)
        .groupBy(win.alias("win"), "tile_id")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "tile_id",
            "n_pages",
        )
    )


def streaming_first_seen_dedup(
    pages_stream: DataFrame,
    key_cols: tuple[str, ...] = ("url",),
    watermark: str = "24 hours",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """First-seen streaming dedup: keep the first arrival per key, drop
    re-crawls/duplicates arriving within the watermark horizon.

    The streaming counterpart of pipeline.dedup.exact_dedup, built on the
    native stateful operator (dropDuplicatesWithinWatermark) so state is
    BOUNDED by event time — a plain dropDuplicates would grow state
    forever on an unbounded crawl. Dedup by content instead of url by
    adding a hash column first (e.g. md5(text)) and passing it here.
    """
    out = pages_stream.withWatermark(ts_col, watermark)
    # bounded-state variant (Spark >= 3.5); the unbounded fallback keeps
    # semantics for old runtimes but is not the 100-TB path
    if hasattr(out, "dropDuplicatesWithinWatermark"):
        return out.dropDuplicatesWithinWatermark(list(key_cols))
    return out.dropDuplicates(list(key_cols))


def run_to_memory(result: DataFrame, name: str = "tile_counts"):
    """Drive a streaming result into an in-memory table (tests/demos):
    returns the StreamingQuery; callers processAllAvailable() then read
    ``spark.table(name)``.

    Complete mode so a finite test batch emits every window (append mode
    only emits windows the watermark has closed — correct for production
    sinks, empty for a one-shot availableNow drain)."""
    return (
        result.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
