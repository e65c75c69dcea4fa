"""Mobility metrics: radius of gyration (spark/trajectory.py), jump-length
histogram and location entropy driver queries."""

import math
import random

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _angle(p, q):
    ax = math.cos(math.radians(p[1])) * math.cos(math.radians(p[0]))
    ay = math.sin(math.radians(p[1])) * math.cos(math.radians(p[0]))
    az = math.sin(math.radians(p[0]))
    bx = math.cos(math.radians(q[1])) * math.cos(math.radians(q[0]))
    by = math.sin(math.radians(q[1])) * math.cos(math.radians(q[0]))
    bz = math.sin(math.radians(q[0]))
    cx, cy, cz = ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx
    return math.atan2(
        math.sqrt(cx * cx + cy * cy + cz * cz), ax * bx + ay * by + az * bz
    )


def _rog_reference(points):
    vecs = [
        (
            math.cos(math.radians(lng)) * math.cos(math.radians(lat)),
            math.sin(math.radians(lng)) * math.cos(math.radians(lat)),
            math.sin(math.radians(lat)),
        )
        for lat, lng in points
    ]
    n = len(vecs)
    m = tuple(sum(v[i] for v in vecs) / n for i in range(3))
    norm = math.sqrt(sum(c * c for c in m))
    clat = math.degrees(math.asin(m[2] / norm))
    clng = math.degrees(math.atan2(m[1], m[0]))
    return math.sqrt(
        sum(_angle((lat, lng), (clat, clng)) ** 2 for lat, lng in points) / n
    )


def test_rog_matches_python_reference(spark):
    from gos2_spark.spark.trajectory import radius_of_gyration

    rng = random.Random(41)
    pts = [(rng.uniform(-60, 60), rng.uniform(-170, 170)) for _ in range(60)]
    df = spark.createDataFrame(
        [("u", lat, lng) for lat, lng in pts], "user_id string, lat double, lng double"
    )
    got = radius_of_gyration(df, key_col="user_id").collect()[0]
    assert got["n_pts"] == 60
    assert abs(got["rog_rad"] - _rog_reference(pts)) < 1e-9


def test_rog_zero_for_stationary_user(spark):
    from gos2_spark.spark.trajectory import radius_of_gyration

    df = spark.createDataFrame(
        [("u", 12.5, 77.6)] * 5, "user_id string, lat double, lng double"
    )
    got = radius_of_gyration(df, key_col="user_id").collect()[0]
    assert got["rog_rad"] < 1e-7


def test_rog_two_point_symmetry(spark):
    from gos2_spark.spark.trajectory import radius_of_gyration

    # two points: centroid is the midpoint, RoG = half the separation
    df = spark.createDataFrame(
        [("u", 0.0, 0.0), ("u", 0.0, 10.0)], "user_id string, lat double, lng double"
    )
    got = radius_of_gyration(df, key_col="user_id").collect()[0]
    assert abs(got["rog_rad"] - math.radians(5.0)) < 1e-9


def test_jump_hist_counts_and_bins(spark):
    q = entry.queries()["jump_length_hist"](spark, SF_DIR)
    rows = q.collect()
    assert len(rows) > 0
    # bins ordered, counts positive, sum_rad consistent with bin bounds
    for r in rows:
        assert r["n_jumps"] > 0
        lo, hi = 2.0 ** r["bin"], 2.0 ** (r["bin"] + 1)
        assert r["sum_rad"] > r["n_jumps"] * lo * 0.999
        assert r["sum_rad"] < r["n_jumps"] * hi * 1.001


def test_location_entropy_bounds(spark):
    rows = entry.queries()["location_entropy"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        # 0 <= H <= ln(n_cells)
        assert -1e-9 <= r["entropy"] <= math.log(r["n_cells"]) + 1e-9
        assert r["n_cells"] <= r["n_visits"]


def test_location_entropy_exact_small_case(spark):
    # single user, visits split 2/1 across two distinct far-apart cells
    from pyspark.sql import functions as F

    from gos2_spark.spark.functions import s2_cellid
    from gos2_spark.spark.pages import s2_parent_sql

    df = spark.createDataFrame(
        [("u", 10.0, 10.0), ("u", 10.0001, 10.0001), ("u", -40.0, 120.0)],
        "user_id string, lat double, lng double",
    )
    cells = df.select(
        "user_id", s2_parent_sql(s2_cellid(F.col("lat"), F.col("lng")), 6).alias("cell")
    )
    per = cells.groupBy("user_id", "cell").count().collect()
    assert sorted(r["count"] for r in per) == [1, 2]
    # H = ln3 - (2 ln2)/3
    h = math.log(3) - 2 * math.log(2) / 3
    from collections import Counter

    counts = [r["count"] for r in per]
    n = sum(counts)
    href = math.log(n) - sum(c * math.log(c) for c in counts) / n
    assert abs(h - href) < 1e-12
