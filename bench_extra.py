"""Per-query isolation bench (guide §1.4): times individual declared
queries with EXACTLY bench.py's methodology (1 untimed warmup + min of 3
timed ``.count()`` runs) but without the flagship staging, so a single
query can be measured in isolation while optimizing.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q1 q2 ...
  python bench_extra.py --explain q1     # also dump .explain('formatted')

This file is measurement tooling only; bench.py stays the frozen driver
contract.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    explain = "--explain" in args
    noop = "--noop" in args
    names = [a for a in args if not a.startswith("--")]

    import __spark_entry__ as entry_mod
    from gos2_spark.spark.session import get_spark

    spark = get_spark(
        app_name="gos2_spark_bench_extra", master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    timings: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if explain:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore
                df._jdf.queryExecution(), "formatted"
            )
            print(f"===== {name} =====\n{plan}")
            continue

        if noop:
            def action():
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
        else:
            def action():
                qs[name](spark, SF_DIR).count()

        action()  # warmup (codegen/JIT), excluded
        raw = []
        for _ in range(RUNS):
            t0 = time.time()
            action()
            raw.append(time.time() - t0)
        timings[name] = round(min(raw), 3)
        raw_runs[name] = [round(t, 3) for t in raw]
        print(f"{name}: min={timings[name]} raw={raw_runs[name]}", flush=True)

    if timings:
        print(json.dumps({"sf": SF_DIR, "queries": timings, "raw": raw_runs}))
    spark.stop()


if __name__ == "__main__":
    main()
