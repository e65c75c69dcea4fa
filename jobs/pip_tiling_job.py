"""Production entry point: S2 tiling + point-in-polygon join over a pages
table, launched via spark-submit with the engine shipped as --py-files.

    python -m zipfile -c /tmp/gos2_spark.zip gos2_spark
    spark-submit --master <cluster> --py-files /tmp/gos2_spark.zip \
        jobs/pip_tiling_job.py \
        --pages /data/pages_parquet --tiles tiles.json \
        --output /data/pip_out --buckets 64 [--level 12]

The job is resumable at bucket granularity (north_rule: "resumable from
checkpoint with per-partition lineage + metrics"): pages are split into
``--buckets`` deterministic url-hash buckets — the stand-in for Iceberg
partition values on a real warehouse — and each bucket runs as its own
checkpointed Spark job writing ``partition=<b>`` output plus a manifest
``(partition_id, rows_in, rows_out, t_start, t_end, lineage)``. Resume is
automatic: re-running with the same code version, params, and input skips
buckets whose manifests validate; changing any of those invalidates the
lineage hash and reruns everything.

tiles.json accepts a GeoJSON FeatureCollection (Polygon/MultiPolygon
features, RFC 7946) or the compact per-tile-id form:
    {"nyc": {"regular": [40.71, -74.01, 1.5, 16]},
     "box": {"vertices": [[10, -40], [10, -20], [30, -20], [30, -40]]}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tileset(spec_path: str, max_cells: int, workers: int | None = None):
    from gos2_spark.geometry import Loop
    from gos2_spark.spark.joins import TileSet

    with open(spec_path) as f:
        spec = json.load(f)
    if spec.get("type") == "FeatureCollection":
        from gos2_spark.spark.joins import tileset_from_geojson

        return tileset_from_geojson(spec, max_cells=max_cells, workers=workers)
    loops = {}
    for tile_id, body in spec.items():
        if "regular" in body:
            lat, lng, radius, nv = body["regular"]
            loops[tile_id] = Loop.regular(lat, lng, radius, int(nv))
        elif "vertices" in body:
            loops[tile_id] = Loop.from_latlngs_deg(
                [(float(a), float(b)) for a, b in body["vertices"]]
            )
        else:
            raise ValueError(f"tile {tile_id!r}: need 'regular' or 'vertices'")
    return TileSet(loops, max_cells=max_cells, workers=workers)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pages", required=True, help="input pages parquet dir")
    p.add_argument("--tiles", required=True, help="tile-spec JSON path")
    p.add_argument("--output", required=True, help="output dir (data/ + _manifests/)")
    p.add_argument("--buckets", type=int, default=64,
                   help="url-hash checkpoint partitions (Iceberg-partition stand-in)")
    p.add_argument("--level", type=int, default=None,
                   help="also emit the level-L cell per matched page")
    p.add_argument("--max-cells", type=int, default=32)
    p.add_argument("--tile-workers", type=int, default=None,
                   help="driver process pool for the TileSet build "
                        "(large tile sets; identical results to serial)")
    p.add_argument("--code-version", default="r2")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from gos2_spark.spark.checkpoint import CheckpointedRunner, lineage_hash
    from gos2_spark.spark.joins import point_in_polygon_join
    from gos2_spark.spark.pages import geoparsed_pages, s2_parent_sql
    from gos2_spark.spark.source import input_fingerprint, read_pages

    # under spark-submit the session/master comes from the submit command;
    # getOrCreate attaches to it instead of hardcoding local[*]
    spark = SparkSession.builder.appName("gos2_pip_tiling").config(
        "spark.sql.execution.arrow.pyspark.enabled", "true"
    ).getOrCreate()

    tiles = build_tileset(args.tiles, args.max_cells, args.tile_workers)
    # Iceberg table identifier on a real cluster, parquet path here
    pages = read_pages(spark, args.pages)

    params = {
        "tiles": sorted(tiles.tiles.keys(), key=str),
        "buckets": args.buckets,
        "level": args.level,
        "max_cells": args.max_cells,
    }
    # snapshot id on real Iceberg, file listing + sizes on parquet
    try:
        fp = input_fingerprint(spark, args.pages)
    except OSError:
        fp = f"path:{args.pages}"
    lineage = lineage_hash(args.code_version, params, fp)
    runner = CheckpointedRunner(args.output, lineage)

    bucket_expr = F.pmod(F.xxhash64(F.col("url")), F.lit(args.buckets))

    def load(pid: str):
        return pages.where(bucket_expr == int(pid))

    def transform(df):
        # url-hash bucket partitions are row-random w.r.t. cells -> no rebalance
        out = point_in_polygon_join(
            geoparsed_pages(df), tiles, how="inner", rebalance=False
        )
        if args.level is not None:
            out = out.withColumn(
                f"cell_l{args.level}", s2_parent_sql(F.col("cell_id"), args.level)
            )
        return out

    t0 = time.time()
    results = runner.run_all([str(b) for b in range(args.buckets)], load, transform)
    wall = time.time() - t0
    done = [r for r in results if not r.skipped]
    print(json.dumps({
        "job": "pip_tiling",
        "lineage": lineage,
        "buckets": args.buckets,
        "processed": len(done),
        "resumed_skips": len(results) - len(done),
        "rows_in": sum(r.rows_in for r in results),
        "rows_out": sum(r.rows_out for r in results),
        "wall_sec": round(wall, 3),
        "output": args.output,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
