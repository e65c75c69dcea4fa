"""Scaling-efficiency evidence: the same flagship job at two parallelism
levels (local[8] vs local[32] — sandbox stand-in for N vs 4N executors).

Protocol (BASELINE.md): deterministic synthetic pages table (seed folded
into xxhash64), flagship geoparse -> s2_cellid -> covering join -> refine ->
per-tile counts, 3 runs each, median wall-clock of the action (JVM startup
excluded). Prints one JSON line with pages/sec at both levels and
efficiency = (rate32 / rate8) / 4. north_rule target: >= 0.8.

Run:  python bench_scaling.py [rows]
Each parallelism level runs in a fresh subprocess (one JVM per level).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
RUNS = int(os.environ.get("BENCH_RUNS", "3"))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from gos2_spark.spark.session import get_spark
from gos2_spark.geometry import Loop
from gos2_spark.spark.joins import TileSet, point_in_polygon_join
from gos2_spark.spark.pages import geoparsed_pages, synth_pages
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); rows = int(sys.argv[2]); runs = int(sys.argv[3])
spark = get_spark(app_name=f"scaling_{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=64)  # identical plan at both levels
spark.sparkContext.setLogLevel("ERROR")
tiles = TileSet({{
    "nyc": Loop.regular(40.7128, -74.0060, 1.5, 16),
    "london": Loop.regular(51.5074, -0.1278, 2.0, 12),
    "tokyo": Loop.regular(35.6762, 139.6503, 2.0, 16),
    "sydney": Loop.regular(-33.8688, 151.2093, 1.0, 12),
}}, max_cells=32)
import os
pages_dir = f"/tmp/gos2_scaling_pages_{{rows}}"
if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
    synth_pages(spark, rows, num_partitions=128).write.mode("overwrite").parquet(pages_dir)
pages = spark.read.parquet(pages_dir)
# warm-up (JIT, Arrow init) excluded from timing
point_in_polygon_join(geoparsed_pages(pages.limit(50_000)), tiles).count()
times = []
for _ in range(runs):
    t0 = time.time()
    out = point_in_polygon_join(geoparsed_pages(pages), tiles, how="inner")
    out.groupBy("tile_id").agg(F.count("*")).collect()
    times.append(time.time() - t0)
print("RESULT " + json.dumps(times))
spark.stop()
"""


def run_level(cpus: int) -> list[float]:
    repo = os.path.dirname(os.path.abspath(__file__))
    script = _WORKER.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(ROWS), str(RUNS)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed (cpus={cpus}):\n{out.stderr[-3000:]}")


def main() -> None:
    t8 = statistics.median(run_level(8))
    t32 = statistics.median(run_level(32))
    rate8 = ROWS / t8
    rate32 = ROWS / t32
    efficiency = (rate32 / rate8) / 4.0
    print(json.dumps({
        "metric": "pip-join scaling efficiency local[8] -> local[32]",
        "rows": ROWS,
        "runs": RUNS,
        "sec_at_8": round(t8, 3),
        "sec_at_32": round(t32, 3),
        "pages_per_sec_at_8": round(rate8, 1),
        "pages_per_sec_at_32": round(rate32, 1),
        "efficiency": round(efficiency, 4),
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }))


if __name__ == "__main__":
    main()
