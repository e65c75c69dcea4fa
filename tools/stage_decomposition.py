"""Per-stage scaling decomposition of the staged cell-sorted pip job.

Splits the deployment-layout flagship into cumulative stages and times
each in a FRESH JVM (2 full warmups + 3 timed steady-state runs,
min-of-3) at several core counts, so the scaling ladder's efficiency
numbers can be attributed: which term stops scaling on a
bandwidth-walled box, and what a multi-executor cluster (per-node DRAM
scales with executors) would actually see.

Stages (cumulative):
  scan   — row-group-pruned scan + covering BETWEEN prefilter + count
           (the hardware floor: no Python, no join, no shuffle)
  join   — + grid-key broadcast hash join (candidate generation), count
  full   — + vectorized boundary refine + per-tile aggregation

Usage: python tools/stage_decomposition.py [rows] [cores ...]
Writes one JSON line; the staged points table must already exist in
/tmp (run bench_scaling.py --staged once first).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
CORES = [int(c) for c in sys.argv[2:]] or [2, 8, 32]

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from gos2_spark.spark.session import get_spark
from gos2_spark.geometry import Loop
from gos2_spark.spark.joins import TileSet, point_in_polygon_join
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); rows = int(sys.argv[2]); stage = sys.argv[3]
spark = get_spark(app_name=f"decomp_{{cpus}}_{{stage}}",
                  master=f"local[{{cpus}}]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
points = spark.read.parquet(f"/tmp/gos2_scaling_points_{{rows}}")
tiles = TileSet({{
    "nyc": Loop.regular(40.7128, -74.0060, 1.5, 16),
    "london": Loop.regular(51.5074, -0.1278, 2.0, 12),
    "tokyo": Loop.regular(35.6762, 139.6503, 2.0, 16),
    "sydney": Loop.regular(-33.8688, 151.2093, 1.0, 12),
}}, max_cells=32)
art = tiles.spark_artifacts(spark)
if stage == "scan":
    pre = F.expr(" OR ".join(
        f"(`cell_id` BETWEEN {{lo}} AND {{hi}})" for lo, hi in art["ranges"]))
    def job():
        points.where(pre).select(F.count("*")).collect()
elif stage == "join":
    from gos2_spark.spark.pages import s2_parent_sql
    pre = F.expr(" OR ".join(
        f"(`cell_id` BETWEEN {{lo}} AND {{hi}})" for lo, hi in art["ranges"]))
    grid = art["grid"]
    gkey = s2_parent_sql(F.col("cell_id"), art["grid_level"])
    def job():
        pts = points.where(pre).withColumn("_gk", gkey)
        (pts.join(F.broadcast(grid),
                  (pts["_gk"] == grid["grid_key"])
                  & (F.col("cell_id") >= F.col("g_rmin"))
                  & (F.col("cell_id") <= F.col("g_rmax")), "inner")
            .select(F.count("*")).collect())
else:
    def job():
        point_in_polygon_join(points, tiles, how="inner",
                              rebalance=False).groupBy(
            "tile_id").agg(F.count("*")).collect()
for _ in range(2):
    job()
ts = []
for _ in range(3):
    t0 = time.time(); job(); ts.append(time.time() - t0)
print("RESULT " + json.dumps(ts))
spark.stop()
"""


def run(cpus: int, stage: str):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _WORKER.format(repo=repo), str(cpus),
         str(ROWS), stage],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed ({cpus}, {stage}):\n{out.stderr[-2000:]}")


def main() -> None:
    res: dict = {"rows": ROWS, "protocol": "fresh JVM, 2 warmups, min-of-3"}
    for cpus in CORES:
        level = {}
        for stage in ("scan", "join", "full"):
            ts = run(cpus, stage)
            level[stage] = {"min": round(min(ts), 3),
                            "runs": [round(t, 2) for t in ts]}
        res[f"local{cpus}"] = level
    print(json.dumps(res))


if __name__ == "__main__":
    main()
