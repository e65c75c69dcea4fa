"""Thirteenth round-4 operator batch: raster zonal statistics, Katz
centrality, and native streaming session windows."""

import random
import shutil
import tempfile
from collections import defaultdict

from pyspark.sql import functions as F

import __spark_entry__ as entry


def test_zonal_stats_matches_python_replay(spark):
    """Per-tile aggregates equal a python fold over the engine's own
    rasterization joined with the point surface — the composition adds
    no hidden state — and basic zonal invariants hold."""
    from gos2_spark.spark.pages import s2_parent_sql
    from gos2_spark.spark.raster import rasterize_centers

    sf = "/root/testdata/sf0.001"
    rast = {
        (r["tile_id"], r["cell_id"])
        for r in rasterize_centers(
            spark, entry._tileset(32), entry._RASTER_LEVEL
        ).collect()
    }
    pts = entry._cust_points(spark, sf)
    counts = {
        r["cell_id"]: r["n"]
        for r in pts.groupBy(
            s2_parent_sql(F.col("cell_id"), entry._RASTER_LEVEL).alias(
                "cell_id"
            )
        ).agg(F.count("*").alias("n")).collect()
    }
    want = defaultdict(lambda: [0, 0, 0, None, None])
    for tile, cell in rast:
        w = want[tile]
        w[0] += 1
        n = counts.get(cell)
        if n is not None:
            w[1] += 1
            w[2] += n
            w[3] = n if w[3] is None else min(w[3], n)
            w[4] = n if w[4] is None else max(w[4], n)
    got = {
        r["tile_id"]: r
        for r in entry.queries()["zonal_stats"](spark, sf).collect()
    }
    assert set(got) == set(want)
    for tile, (nc, no, sv, mn, mx) in want.items():
        r = got[tile]
        assert (r["n_cells"], r["n_occupied"], r["sum_val"]) == (nc, no, sv)
        assert r["min_val"] == mn and r["max_val"] == mx
        if no:
            assert abs(r["mean_occupied"] - sv / no) < 1e-9
        else:
            assert r["mean_occupied"] is None
        assert r["n_occupied"] <= r["n_cells"]


def _katz_ref(edges, iters=3, a=0.125):
    nodes = sorted({x for e in edges for x in e})
    x = {v: 1.0 for v in nodes}
    for _ in range(iters):
        inc = {v: 0.0 for v in nodes}
        for s, d in edges:
            inc[d] += x[s]
        x = {v: 1.0 + a * inc[v] for v in nodes}
    return x


def test_katz_matches_python_replay_and_ranks_indegree(spark):
    from gos2_spark.pipeline.graph import katz_centrality

    rng = random.Random(31)
    edges = sorted({(rng.randrange(12), rng.randrange(12)) for _ in range(40)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["katz"]
        for r in katz_centrality(df, iterations=3, alpha=0.125).collect()
    }
    want = _katz_ref(edges)
    assert set(got) == set(want)
    for v, k in want.items():
        assert abs(got[v] - k) < 1e-9, v
    # a node everything points at dominates
    star = [(i, 99) for i in range(10)]
    sdf = spark.createDataFrame(star, "src long, dst long")
    sk = {
        r["node"]: r["katz"]
        for r in katz_centrality(sdf, iterations=2, alpha=0.125).collect()
    }
    assert max(sk, key=sk.get) == 99


def test_streaming_sessions_equal_batch_sessionize(spark):
    """A multi-micro-batch replay of a synthetic event log produces
    exactly the batch sessionize() rows — the live/backfill parity the
    op promises."""
    from gos2_spark.spark.aggregates import sessionize
    from gos2_spark.spark.streaming import (
        run_to_memory,
        streaming_session_counts,
    )

    rng = random.Random(41)
    rows = []
    t = 1_700_000_000_000_000
    for u in range(6):
        cur = t + u * 999_999
        for _ in range(rng.randint(3, 15)):
            cur += rng.choice([60, 300, 1200, 7200]) * 1_000_000
            rows.append((u, cur))
    df = spark.createDataFrame(rows, "user_id long, us long").select(
        "user_id", F.timestamp_micros(F.col("us")).alias("ts")
    )
    batch = {
        (r["key"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(
            df, key_col="user_id", ts_col="ts", gap="1 hour"
        ).collect()
    }
    tmp = tempfile.mkdtemp(prefix="gos2_test_sessions_")
    try:
        df.repartition(3).write.mode("overwrite").parquet(tmp)
        sch = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        out = streaming_session_counts(
            stream, gap="1 hour", watermark="3650 days"
        )
        q = run_to_memory(out, "gos2_test_sessions")
        q.awaitTermination()
        streamed = {
            (r["key"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.table("gos2_test_sessions").collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert streamed == batch
