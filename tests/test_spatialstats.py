"""Spatial statistics (spark/spatialstats.py): Getis-Ord Gi* and
Ripley's K sanity properties on planted patterns."""

import math

import pytest
from pyspark.sql import functions as F


def _points(spark, rows):
    from gos2_spark.spark.functions import s2_cellid

    df = spark.createDataFrame(rows, "key long, lat double, lng double")
    return df.withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))


def test_gistar_flags_planted_hotspot(spark):
    """A dense blob in one cell + sparse background: the blob cell (and
    only a handful of cells) must carry a large positive Gi*."""
    from gos2_spark.pipeline.graph import _default_materialize
    from gos2_spark.spark.pages import s2_parent_sql
    from gos2_spark.spark.spatialstats import getis_ord_gistar

    rows = []
    k = 0
    # background: one point per ~distinct far-apart location
    for i in range(40):
        rows.append((k, -40.0 + i * 2.0, -160.0 + i * 7.9))
        k += 1
    # hotspot: 60 points inside one tight blob near (10, 10)
    for i in range(60):
        rows.append((k, 10.0 + (i % 8) * 1e-3, 10.0 + (i // 8) * 1e-3))
        k += 1
    pts = _points(spark, rows)
    counts = _default_materialize(spark)(
        pts.groupBy(s2_parent_sql(F.col("cell_id"), 5).alias("cell")).agg(
            F.count("*").alias("n")
        )
    )
    out = getis_ord_gistar(counts).collect()
    top = max(out, key=lambda r: r["gi_star"])
    assert top["x_count"] == 60
    assert top["gi_star"] > 2.0
    # background cells (count 1) sit at or below the mean -> negative z
    lows = [r["gi_star"] for r in out if r["x_count"] == 1 and r["w_i"] == 1]
    assert lows and all(g < 0 for g in lows)


def test_gistar_weights_count_occupied_neighbors(spark):
    """w_i = 1 + #occupied edge neighbors; local_sum sums self + them."""
    from gos2_spark.spark.spatialstats import getis_ord_gistar
    from gos2_spark.kernels import hilbert as H
    import numpy as np

    # three sibling cells: a center cell and one of its edge neighbors
    # occupied, plus one far-away cell
    from gos2_spark.kernels import projection as PJ

    base = H.from_token(np.array(["1009"], dtype=object))[0]  # level-5 cell
    nbrs = PJ.edge_neighbors(np.array([base], dtype=np.uint64))[0]
    far = H.from_token(np.array(["5009"], dtype=object))[0]
    bias = 1 << 63

    def biased(u):
        v = int(u) ^ bias
        return v - (1 << 64) if v >= (1 << 63) else v

    rows = [(biased(base), 10), (biased(nbrs[0]), 3), (biased(far), 5)]
    counts = spark.createDataFrame(rows, "cell long, n long")
    out = {r["cell"]: r for r in getis_ord_gistar(counts).collect()}
    assert out[biased(base)]["w_i"] == 2
    assert out[biased(base)]["local_sum"] == 13
    assert out[biased(far)]["w_i"] == 1
    assert out[biased(far)]["local_sum"] == 5


def test_ripley_k_detects_clustering(spark):
    """A tight cluster yields K(r) far above the CSR expectation pi*r^2;
    pair counts are exact and monotone in r."""
    from gos2_spark.spark.spatialstats import ripley_k

    rows = [(i, 5.0 + (i % 10) * 1e-3, 5.0 + (i // 10) * 1e-3) for i in range(50)]
    # a few isolated far points
    rows += [(100 + i, -60.0 + i * 11.0, 120.0 + i * 9.0) for i in range(5)]
    pts = _points(spark, rows)
    out = {r["r_rad"]: r for r in ripley_k(pts, (0.001, 0.01), point_key="key").collect()}
    assert out[0.001]["n_points"] == 55
    assert out[0.001]["n_pairs"] <= out[0.01]["n_pairs"]
    # all 50*49/2 cluster pairs are within 0.01 rad (~64 km)
    assert out[0.01]["n_pairs"] == 50 * 49 // 2
    k = out[0.01]["k_hat"]
    assert k > math.pi * 0.01 * 0.01 * 10  # >10x CSR
