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
