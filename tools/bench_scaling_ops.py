"""Scaling supplement for the round-4 continuation operators: the same
N -> 4N fresh-JVM protocol as bench_scaling.py, applied to two of the new
statistics operators over a 20M-row synthesized stream —

  mw : mann_whitney_u  (groupBy + distinct-value rank windows + keyed agg)
  km : kaplan_meier    (map-side-combined risk sets + bounded curve fold)

Each worker JVM does one full-size warm-up then reports timed steady-state
runs; levels interleave. Appends the pair under "ops_supplement_<op>_
<N>_to_<4N>" in BENCH/scaling.json.

Run: python tools/bench_scaling_ops.py [rows]   (BENCH_N=2 by default)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
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
spark = get_spark(app_name=f"ops_scaling_{{cpus}}",
                  master=f"local[{{cpus}}]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

def synth():
    d = spark.range(0, rows, 1, 128)
    return d.select(
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("g"),
        F.pmod(F.xxhash64("id"), F.lit(2)).cast("int").alias("side"),
        ((F.col("id") * 7919 % 100000) / 100.0).alias("v"),
        (F.col("id") % 400 + 1).alias("t"),
        ((F.col("id") * 31 % 10) < 7).cast("int").alias("e"),
    )

if op == "mw":
    from gos2_spark.spark.nonparam import mann_whitney_u
    def job():
        return mann_whitney_u(synth(), "g", "side", "v").count()
else:
    from gos2_spark.spark.survival import kaplan_meier
    def job():
        return kaplan_meier(synth().select("g", "t", "e"),
                            "g", "t", "e").count()

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
    for op in ("mw", "km"):
        # interleave levels so environment drift hits both equally
        lo1 = run_worker(N, op)
        hi1 = run_worker(N4, op)
        lo2 = run_worker(N, op)
        hi2 = run_worker(N4, op)
        t_lo = min(lo1 + lo2)
        t_hi = min(hi1 + hi2)
        eff = round((t_lo / t_hi) / 4.0, 4)
        doc.setdefault("pairs", {})[f"ops_supplement_{op}_{N}_to_{N4}"] = {
            "metric": f"{op} operator scaling local[{N}] -> local[{N4}]",
            "rows": ROWS,
            "runs": 2 * RUNS,
            "times_lo": [round(t, 2) for t in lo1 + lo2],
            "times_hi": [round(t, 2) for t in hi1 + hi2],
            "efficiency": eff,
            "target": 0.8,
            "pass": eff >= 0.8,
        }
        print(op, "eff", eff, "lo", t_lo, "hi", t_hi)
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)


if __name__ == "__main__":
    main()
