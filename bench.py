"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on local[N].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pages_per_sec": ...}

The flagship measure is the end-to-end point-in-polygon pipeline
(synthetic pages -> geoparse -> s2_cellid -> covering join -> refine ->
per-tile counts); per-query timings cover the driver-contract surface.
Scaling evidence (local[8] vs local[32]) is produced by bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PAGES_ROWS = int(os.environ.get("BENCH_PAGES_ROWS", "2000000"))

BENCH_QUERIES = [
    "haversine_distance",
    "rect_contains_wrap",
    "cap_contains",
    "pip_join",
    "pip_histogram",
    "knn_join",
    "cell_counts_l5",
    "dedup_exact",
    "text_stats",
    "embedding_knn",
    "top_events_per_user",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from gos2_spark.spark.session import get_spark

    spark = get_spark(
        app_name="gos2_spark_bench", master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    qs = entry_mod.queries()

    # flagship: pages pipeline throughput. Pages are materialized to parquet
    # once (setup, excluded from timing) — the measured job is the real
    # shape: scan -> geoparse -> s2_cellid -> covering join -> refine -> agg.
    from gos2_spark.geometry import Loop
    from gos2_spark.spark.joins import TileSet, point_in_polygon_join
    from gos2_spark.spark.pages import geoparsed_pages, synth_pages
    from pyspark.sql import functions as F

    tiles = TileSet(
        {
            "nyc": Loop.regular(40.7128, -74.0060, 1.5, 16),
            "london": Loop.regular(51.5074, -0.1278, 2.0, 12),
            "tokyo": Loop.regular(35.6762, 139.6503, 2.0, 16),
            "sydney": Loop.regular(-33.8688, 151.2093, 1.0, 12),
        },
        max_cells=32,
    )
    pages_dir = os.environ.get(
        "BENCH_PAGES_DIR", f"/tmp/gos2_bench_pages_{PAGES_ROWS}"
    )
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        synth_pages(spark, PAGES_ROWS).write.mode("overwrite").parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)
    t0 = time.time()
    joined = point_in_polygon_join(geoparsed_pages(pages), tiles, how="inner")
    counts = joined.groupBy("tile_id").agg(F.count("*").alias("n")).collect()
    t_flagship = time.time() - t0
    timings["flagship_pip_pages"] = round(t_flagship, 3)
    pages_per_sec = PAGES_ROWS / t_flagship

    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "spatial-join + S2-tiling bench (flagship pip pages + driver queries)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "pages_rows": PAGES_ROWS,
        "pages_per_sec": round(pages_per_sec, 1),
        "cpus": int(CPUS),
        "tile_counts": {r["tile_id"]: r["n"] for r in counts},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
