"""Scaling supplement for the second round-4 continuation session: the
same N -> 4N fresh-JVM interleaved protocol as bench_scaling_ops.py,
applied to two representative NEW operator classes over a synthesized
120M-row stream —

  tb : token_bucket (spark/ratelimit.py) — groupBy carrying time-ordered
       arrays + one JVM fold per key (the order-sensitive-recurrence
       class: burstiness, hurst, NW/SW alignment share this shape)
  d8 : the zero-join raster class (flow_direction_d8's plan: occupancy
       distinct + pure scalar Horn/D8 expressions — horn_slope_aspect,
       hillshade_grid, bilinear_elevation share it)

Each worker JVM does one full-size warm-up then timed steady-state runs;
levels interleave. Appends pairs under "ops2_supplement_<op>_<N>_to_<4N>"
in BENCH/scaling.json.

Run: python tools/bench_scaling_ops2.py [rows]   (BENCH_N=2 by default)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000_000
RUNS = int(os.environ.get("BENCH_RUNS", "2"))
N = int(os.environ.get("BENCH_N", "2"))
N4 = 4 * N

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from gos2_spark.spark.session import get_spark
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); rows = int(sys.argv[2]); op = sys.argv[3]
runs = int(sys.argv[4])
spark = get_spark(app_name=f"ops2_scaling_{{cpus}}",
                  master=f"local[{{cpus}}]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

if op == "tb":
    from gos2_spark.spark.ratelimit import token_bucket
    def job():
        d = spark.range(0, rows, 1, 128)
        seq = d.select(
            (F.col("id") % 1000000).alias("user_id"),
            (F.xxhash64("id") % 2000000000000 + 2000000000000).alias("us"),
            F.col("id").alias("event_id"),
        )
        return token_bucket(
            seq, "user_id", "us", "event_id",
            capacity=2.0, refill_us_per_token=4.0e10,
        ).count()
else:
    def job():
        # the flow_direction_d8 plan over synthesized points: distinct
        # occupancy grid + pure scalar steepest-descent expressions
        d = spark.range(0, rows, 1, 128)
        pts = d.select(
            (F.xxhash64("id") % 5000).alias("r"),
            (F.xxhash64("id", F.lit(1)) % 5000).alias("c"),
        )
        occ = pts.distinct()
        occ.createOrReplaceTempView("_occ_scale")
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "entry", {repo!r} + "/__spark_entry__.py")
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        return spark.sql(m._d8_select_sql("_occ_scale")).count()

job()  # full-size warm-up (codegen/JIT/pool), excluded
times = []
for _ in range(runs):
    t0 = time.time(); job(); times.append(time.time() - t0)
print(json.dumps({{"cpus": cpus, "op": op, "times": times}}))
spark.stop()
"""


def run_worker(cpus: int, op: str) -> list[float]:
    code = _WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(ROWS), op, str(RUNS)],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["times"]


def main() -> None:
    path = os.path.join(REPO, "BENCH", "scaling.json")
    with open(path) as fh:
        doc = json.load(fh)
    for op in ("tb", "d8"):
        lo1 = run_worker(N, op)
        hi1 = run_worker(N4, op)
        lo2 = run_worker(N, op)
        hi2 = run_worker(N4, op)
        t_lo = min(lo1 + lo2)
        t_hi = min(hi1 + hi2)
        eff = round((t_lo / t_hi) / 4.0, 4)
        doc.setdefault("pairs", {})[f"ops2_supplement_{op}_{N}_to_{N4}"] = {
            "metric": f"{op} operator scaling local[{N}] -> local[{N4}]",
            "rows": ROWS,
            "runs": 2 * RUNS,
            "times_lo": [round(t, 2) for t in lo1 + lo2],
            "times_hi": [round(t, 2) for t in hi1 + hi2],
            "efficiency": eff,
            "target": 0.8,
            "pass": eff >= 0.8,
        }
        print(op, "eff", eff, "lo", round(t_lo, 2), "hi", round(t_hi, 2))
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)


if __name__ == "__main__":
    main()
