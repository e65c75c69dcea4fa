"""Native-SQL Hilbert encode (functions.add_cellid_sql) must be
bit-identical to the numpy golden-reference kernel (functions.s2_cellid),
which itself is pinned to the reference's C++-generated test vectors
(cellid_test.go:187-220). Trig differs (java.lang.Math vs numpy) so
equality is asserted empirically over a dense corpus + adversarial points.
"""

import numpy as np
from pyspark.sql import functions as F

from gos2_spark.kernels import projection as PJ
from gos2_spark.spark.functions import add_cellid_sql, s2_cellid


def test_sql_cellid_matches_kernel_random(spark):
    df = spark.range(0, 200_000, 1, 8).select(
        F.col("id"),
        F.degrees(
            F.asin(F.pmod(F.xxhash64("id", F.lit(1)), 2000001) / 1000000.0 - 1.0)
        ).alias("lat"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 360000001) / 1000000.0 - 180.0).alias("lng"),
    )
    sql_side = add_cellid_sql(df, "lat", "lng", "cs").select("id", "cs")
    kern_side = df.select("id", s2_cellid(F.col("lat"), F.col("lng")).alias("ck"))
    n_diff = sql_side.join(kern_side, "id").where(F.col("cs") != F.col("ck")).count()
    assert n_diff == 0


def test_sql_cellid_edge_points(spark):
    pts = [
        (90.0, 0.0), (-90.0, 0.0), (0.0, 180.0), (0.0, -180.0),
        (0.0, 0.0), (45.0, 45.0),
        (35.26438968275465, 45.0),    # cube-corner latitudes
        (-35.26438968275466, -135.0),
        (1e-15, 1e-15), (-1e-15, 179.9999999999999),
        (89.9999999999999, -179.9999999999999),
    ]
    df = spark.createDataFrame([(i, la, ln) for i, (la, ln) in enumerate(pts)],
                               "id int, lat double, lng double")
    rows = {
        r.id: r.cs
        for r in add_cellid_sql(df, "lat", "lng", "cs").collect()
    }
    # compare against the kernel evaluated directly (no Spark)
    lat = np.array([p[0] for p in pts])
    lng = np.array([p[1] for p in pts])
    from gos2_spark.kernels import hilbert as H

    want = H.to_signed(PJ.cellid_from_latlng(lat, lng))
    for i in range(len(pts)):
        assert rows[i] == int(want[i]), pts[i]


def test_webmercator_tiles_and_quadkey_golden(spark):
    """Slippy-tile golden vectors: (0,0) z=1 -> (1,1); the Bing docs
    quadkey example tile (x=3, y=5, z=3) -> '213'; Mercator-domain clamp
    at the poles."""
    from pyspark.sql import functions as F

    from gos2_spark.spark.webmercator import wm_quadkey, wm_tile_x, wm_tile_y

    df = spark.createDataFrame(
        [(0.0, 0.0), (41.85, -87.65), (89.9, 10.0), (-89.9, 10.0)],
        "lat double, lng double",
    )
    rows = (
        df.select(
            wm_tile_x(F.col("lng"), 1).alias("x1"),
            wm_tile_y(F.col("lat"), 1).alias("y1"),
        )
        .collect()
    )
    assert (rows[0]["x1"], rows[0]["y1"]) == (1, 1)
    # poles clamp into the valid row range
    assert rows[2]["y1"] == 0 and rows[3]["y1"] == 1
    qk = (
        spark.createDataFrame([(3, 5)], "xt long, yt long")
        .select(wm_quadkey("xt", "yt", 3).alias("q"))
        .collect()[0]["q"]
    )
    assert qk == "213"  # Bing tile-system documentation example
    # independent python-math reference for a non-trivial point
    import math

    lat, lng, z = 41.85, -87.65, 15
    n = 1 << z
    wx = math.floor((lng + 180.0) / 360.0 * n)
    rad = math.radians(lat)
    wy = math.floor(
        (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.pi)
        / 2.0 * n
    )
    r = (
        df.where(F.col("lat") == 41.85)
        .select(
            wm_tile_x(F.col("lng"), z).alias("x"),
            wm_tile_y(F.col("lat"), z).alias("y"),
        )
        .collect()[0]
    )
    assert (r["x"], r["y"]) == (wx, wy)


def test_geohash_golden_vectors(spark):
    """Known geohashes: the Wikipedia example, the origin, a southern-
    hemisphere city, and odd-length prefix consistency."""
    from pyspark.sql import functions as F

    from gos2_spark.spark.geohash import geohash

    df = spark.createDataFrame(
        [(57.64911, 10.40744), (0.0, 0.0), (-25.382708, -49.265506)],
        "lat double, lng double",
    )
    rows = df.select(
        geohash("lat", "lng", 8).alias("g8"),
        geohash("lat", "lng", 5).alias("g5"),
    ).collect()
    assert [r["g8"] for r in rows] == ["u4pruydq", "s0000000", "6gkzwgjz"]
    # truncation property: a shorter geohash is the prefix of a longer one
    assert all(r["g8"].startswith(r["g5"]) for r in rows)
