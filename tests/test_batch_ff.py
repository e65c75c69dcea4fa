"""Bootstrap CI, jackknife SE, Zipf slope — python references using
Spark's own xxhash64 for the replicate membership."""

import math
import re
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_bootstrap_ci_brackets_mean_and_matches_python(spark):
    from pyspark.sql import functions as F

    ev = duckdb.sql(
        f"SELECT event_id, round(value * 100) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    ids = [int(e) for e, _ in ev]
    cents = {int(e): int(c) for e, c in ev}
    # replicate membership via Spark's own hash (the oracle model)
    rows = [(e, r) for e in ids for r in range(32)]
    df = spark.createDataFrame(rows, "e long, r int").select(
        "e",
        "r",
        F.pmod(
            F.xxhash64(
                F.concat(
                    F.col("e").cast("string"), F.lit("#b"), F.col("r").cast("string")
                )
            ),
            F.lit(2),
        ).alias("m"),
    )
    mem = defaultdict(list)
    for row in df.collect():
        if row["m"] == 0:
            mem[row["r"]].append(cents[row["e"]])
    means = sorted(
        (sum(v) / len(v), r) for r, v in mem.items()
    )
    lo, hi = means[1][0], means[-2][0]
    got = entry.queries()["bootstrap_mean_ci"](spark, SF_DIR).collect()[0]
    assert got["n_reps"] == 32
    assert abs(got["ci_lo"] - lo / 100.0) < 1e-9
    assert abs(got["ci_hi"] - hi / 100.0) < 1e-9
    full = sum(cents.values()) / len(cents) / 100.0
    assert abs(got["mean_value"] - full) < 1e-9
    # half-sample means should bracket the full mean
    assert got["ci_lo"] <= full <= got["ci_hi"]


def test_jackknife_matches_python(spark):
    rows = duckdb.sql(
        f"SELECT c_nationkey, round(c_acctbal * 100) FROM read_parquet('{SF_DIR}/customer.parquet')"
    ).fetchall()
    blocks = defaultdict(lambda: [0, 0])
    for nat, c in rows:
        blocks[nat][0] += int(c)
        blocks[nat][1] += 1
    st = sum(s for s, _ in blocks.values())
    nt = sum(n for _, n in blocks.values())
    j = len(blocks)
    loos = [ (st - s) / (nt - n) for _, (s, n) in sorted(blocks.items())]
    sl = sum(loos)
    sll = sum(v * v for v in loos)
    var = (j - 1) / j * (sll - sl * sl / j)
    got = entry.queries()["jackknife_nation_mean"](spark, SF_DIR).collect()[0]
    assert got["n_blocks"] == j
    assert abs(got["mean_value"] - st / nt / 100.0) < 1e-9
    assert abs(got["jackknife_se"] - math.sqrt(max(var, 0.0)) / 100.0) < 1e-8


def test_zipf_slope_matches_python_and_is_negative(spark):
    docs = duckdb.sql(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    cnt = Counter()
    for (text,) in docs:
        cnt.update(t for t in re.split(r"[^a-z]+", text.lower()) if t)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    pts = [(math.log(i + 1), math.log(c)) for i, (_, c) in enumerate(top)]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    syy = sum(y * y for _, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    got = entry.queries()["zipf_slope_fit"](spark, SF_DIR).collect()[0]
    assert got["n_points"] == n
    assert abs(got["zipf_slope"] - slope) < 1e-7
    assert abs(got["r2"] - r2) < 1e-7
    assert got["zipf_slope"] < 0  # frequency falls with rank
