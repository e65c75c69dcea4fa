"""Structured Streaming tiling: the streaming pipeline must produce the
same per-(window, tile) counts as the identical batch computation."""

from pyspark.sql import functions as F

from gos2_spark.geometry import Loop
from gos2_spark.spark.joins import TileSet, point_in_polygon_join
from gos2_spark.spark.pages import geoparsed_pages, synth_pages
from gos2_spark.spark.streaming import run_to_memory, streaming_tile_counts


def test_streaming_tile_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "pages_stream")
    synth_pages(spark, 20000, num_partitions=4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    tiles = TileSet({
        "nyc": Loop.regular(40.7128, -74.0060, 1.5, 16),
        "tokyo": Loop.regular(35.6762, 139.6503, 2.0, 16),
    }, max_cells=16)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)  # multiple micro-batches
        .parquet(src)
    )
    q = run_to_memory(
        streaming_tile_counts(stream, tiles, window="90 days"), "tc_test"
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["tile_id"]): r["n_pages"]
            for r in spark.table("tc_test").collect()
        }
    finally:
        q.stop()

    batch = (
        point_in_polygon_join(
            geoparsed_pages(spark.read.parquet(src), keep=("url", "warc_ts")),
            tiles, how="inner",
        )
        .groupBy(F.window("warc_ts", "90 days").alias("win"), "tile_id")
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("win.start").alias("ws"), "tile_id", "n_pages")
    )
    want = {(r["ws"], r["tile_id"]): r["n_pages"] for r in batch.collect()}
    assert got == want
    assert sum(v for (_, t), v in got.items() if t == "nyc") > 0
    assert sum(v for (_, t), v in got.items() if t == "tokyo") > 0


def test_streaming_first_seen_dedup(spark, tmp_path):
    """Duplicates arriving in DIFFERENT micro-batches are dropped (the
    dedup operator is stateful across batches); output keys equal the
    batch-mode distinct set."""
    import shutil
    from gos2_spark.spark.streaming import streaming_first_seen_dedup

    src = str(tmp_path / "dup_stream")
    synth_pages(spark, 3000, num_partitions=1).write.mode("overwrite").parquet(src)
    # duplicate every row into a second file -> a later micro-batch
    import glob, os
    part = glob.glob(os.path.join(src, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(src, "part-duplicate.parquet"))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(src)
    )
    deduped = streaming_first_seen_dedup(stream, key_cols=("url",))
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory").queryName("dedup_test")
        .trigger(availableNow=True).start()
    )
    try:
        q.processAllAvailable()
        got = [r["url"] for r in spark.table("dedup_test").collect()]
    finally:
        q.stop()

    n_in = spark.read.parquet(src).count()
    want = {r["url"] for r in spark.read.parquet(src).select("url").distinct().collect()}
    assert n_in == 2 * len(want)  # the stream really contained duplicates
    assert len(got) == len(set(got)) == len(want)
    assert set(got) == want


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """The same sessionize() call over a stream (4 micro-batches, events
    time-UNORDERED across files) produces exactly the batch sessions —
    session_window state merges sessions across micro-batches, and a
    watermark wider than the file disorder admits every late event."""
    src = str(tmp_path / "ev_stream")
    (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(src)
    )
    schema = spark.read.parquet(src).schema
    from gos2_spark.spark.aggregates import sessionize

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = run_to_memory(
        sessionize(stream.withWatermark("ts", "400 days"), gap="1 hour"),
        "sess_test",
    )
    try:
        q.processAllAvailable()
        got = {
            (r["key"], r["session_start"]): r["n_events"]
            for r in spark.table("sess_test").collect()
        }
    finally:
        q.stop()
    batch = sessionize(
        spark.read.parquet(src).withColumn("ts", F.col("ts").cast("timestamp")),
        gap="1 hour",
    )
    want = {
        (r["key"], r["session_start"]): r["n_events"] for r in batch.collect()
    }
    assert got == want and len(got) > 100


def test_streaming_geofence_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState geofence: drain phase 1, STOP the query,
    add phase-2 files, restart from the same checkpoint — transitions
    that straddle the phase boundary are only detectable if per-user
    last-fence state was restored from the state store."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gos2_spark.geometry import Loop
    from gos2_spark.spark.joins import TileSet
    from gos2_spark.spark.streaming import streaming_geofence_transitions

    tiles = TileSet(
        {"a": Loop.regular(10.0, 10.0, 3.0, 12),
         "b": Loop.regular(-20.0, 40.0, 3.0, 12)},
        max_cells=16,
    )
    # user 1: inside a (phase 1) -> inside b (phase 2): ONE cross-phase
    # transition. user 2: outside -> outside: none.
    p1 = [(1, 100, 1000, 10.0, 10.0), (1, 200, 1001, 10.1, 10.1),
          (2, 100, 2000, 50.0, 120.0)]
    p2 = [(1, 300, 1002, -20.0, 40.0), (2, 300, 2001, 55.0, 125.0)]
    schema = "user_id long, tsec long, event_id long, lat double, lng double"
    src, chk, out = str(tmp_path / "src"), str(tmp_path / "chk"), str(tmp_path / "out")

    def write(rows):
        spark.createDataFrame(rows, schema).withColumn(
            "ts", F.timestamp_seconds(F.col("tsec"))
        ).drop("tsec").write.mode("append").parquet(src)

    def drain():
        sch = spark.read.parquet(src).schema
        stream = spark.readStream.schema(sch).parquet(src)
        q = (
            streaming_geofence_transitions(stream, tiles)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write(p1)
    drain()
    mid = spark.read.parquet(out).count()
    assert mid == 0  # no transitions inside phase 1
    write(p2)
    drain()
    rows = {
        (r["user_id"], r["event_id"], r["from_idx"], r["to_idx"])
        for r in spark.read.parquet(out).collect()
    }
    names = tiles.tile_ids()
    ia, ib = names.index("a"), names.index("b")
    # the a->b transition at event 1002 exists ONLY if user 1's
    # last-fence state (a) survived the restart
    assert rows == {(1, 1002, ia, ib)}


def test_streaming_geofence_string_keys(spark, tmp_path):
    """The output schema mirrors the input stream's user/seq types:
    string/UUID ids must flow through the stateful geofence unchanged
    (round 2 hardcoded 'long, long' and failed on them)."""
    from pyspark.sql import functions as F

    from gos2_spark.geometry import Loop
    from gos2_spark.spark.joins import TileSet
    from gos2_spark.spark.streaming import streaming_geofence_transitions

    tiles = TileSet(
        {"a": Loop.regular(10.0, 10.0, 3.0, 12),
         "b": Loop.regular(-20.0, 40.0, 3.0, 12)},
        max_cells=16,
    )
    rows = [("alice", 100, "ev-1", 10.0, 10.0), ("alice", 200, "ev-2", -20.0, 40.0),
            ("bob", 100, "ev-3", 50.0, 120.0)]
    schema = "user_id string, tsec long, event_id string, lat double, lng double"
    src, chk, out = str(tmp_path / "s"), str(tmp_path / "c"), str(tmp_path / "o")
    spark.createDataFrame(rows, schema).withColumn(
        "ts", F.timestamp_seconds(F.col("tsec"))
    ).drop("tsec").write.parquet(src)
    sch = spark.read.parquet(src).schema
    stream = spark.readStream.schema(sch).parquet(src)
    q = (
        streaming_geofence_transitions(stream, tiles)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["event_id"], r["from_idx"], r["to_idx"])
        for r in spark.read.parquet(out).collect()
    }
    names = tiles.tile_ids()
    assert got == {("alice", "ev-2", names.index("a"), names.index("b"))}


def test_streaming_ttl_dedup_matches_batch_across_restart(spark, tmp_path):
    """TTL dedup: drain phase 1, stop, add phase-2 files, restart from
    the same checkpoint — the kept-event set must equal the batch fold
    over the full history, which only holds if last-kept state survived
    the restart (events inside the TTL of a phase-1 keeper must stay
    suppressed in phase 2)."""
    from pyspark.sql import functions as F

    from gos2_spark.spark.streaming import streaming_ttl_dedup

    ttl_us = 3_600_000_000  # 1h
    # user 1: keeps t=0h; 0.5h suppressed; 1.5h kept (phase 1);
    #         phase 2: 1.9h suppressed (inside TTL of 1.5h), 3h kept.
    # user 2: keeps t=0h in phase 1; phase 2: 0.5h suppressed, 1h kept.
    h = 3600
    p1 = [(1, 0 * h, 10), (1, h // 2, 11), (1, 3 * h // 2, 12),
          (2, 0 * h, 20)]
    p2 = [(1, 19 * h // 10, 13), (1, 3 * h, 14),
          (2, h // 2, 21), (2, h, 22)]
    schema = "user_id long, tsec long, event_id long"
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")

    def write(rows):
        spark.createDataFrame(rows, schema).withColumn(
            "ts", F.timestamp_seconds(F.col("tsec"))
        ).drop("tsec").write.mode("append").parquet(src)

    def drain():
        sch = spark.read.parquet(src).schema
        stream = spark.readStream.schema(sch).parquet(src)
        q = (
            streaming_ttl_dedup(stream, ttl_us)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    write(p1)
    drain()
    write(p2)
    drain()

    kept = {
        (r.user_id, r.event_id)
        for r in spark.read.parquet(out).collect()
    }
    assert kept == {(1, 10), (1, 12), (1, 14), (2, 20), (2, 22)}
