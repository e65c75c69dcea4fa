"""Eleventh round-4 operator batch: bivariate Ripley cross-K and the
emerging-hotspot space-time classification."""

import math
import random

from pyspark.sql import functions as F

import __spark_entry__ as entry


def _points(spark, rows, key="key"):
    from gos2_spark.spark.functions import s2_cellid

    df = spark.createDataFrame(rows, f"{key} long, lat double, lng double")
    return df.withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))


def _angle(p, q):
    (lat1, lng1), (lat2, lng2) = p, q
    r1, l1, r2, l2 = map(math.radians, (lat1, lng1, lat2, lng2))
    a = (math.cos(l1) * math.cos(r1), math.sin(l1) * math.cos(r1), math.sin(r1))
    b = (math.cos(l2) * math.cos(r2), math.sin(l2) * math.cos(r2), math.sin(r2))
    cx = a[1] * b[2] - a[2] * b[1]
    cy = a[2] * b[0] - a[0] * b[2]
    cz = a[0] * b[1] - a[1] * b[0]
    return math.atan2(
        math.sqrt(cx * cx + cy * cy + cz * cz),
        a[0] * b[0] + a[1] * b[1] + a[2] * b[2],
    )


def test_cross_k_matches_brute_force_and_detects_attraction(spark):
    """Pair counts at every radius equal the O(n_a*n_b) replay; a B
    pattern planted AT the A locations yields K_ab far above pi*r^2."""
    from gos2_spark.spark.spatialstats import cross_k

    rng = random.Random(13)
    a_rows = [
        (i, rng.uniform(-20, 20), rng.uniform(-40, 40)) for i in range(25)
    ]
    # B: one point right next to each A point (attraction), plus noise
    b_rows = [
        (100 + i, lat + 0.01, lng + 0.01) for i, lat, lng in a_rows
    ] + [
        (200 + i, rng.uniform(-80, 80), rng.uniform(100, 170))
        for i in range(25)
    ]
    pa = _points(spark, a_rows)
    pb = _points(spark, b_rows, key="bid")
    radii = (0.001, 0.01, 0.3)
    out = {
        r["r_rad"]: r
        for r in cross_k(pa, pb, radii, point_key="key", b_key="bid").collect()
    }
    for r in radii:
        want = sum(
            1
            for _, la, ga in a_rows
            for _, lb, gb in b_rows
            if _angle((la, ga), (lb, gb)) <= r
        )
        assert out[r]["n_pairs"] == want, r
        assert out[r]["n_a"] == 25 and out[r]["n_b"] == 50
        k = 4.0 * math.pi * want / (25 * 50)
        assert abs(out[r]["k_hat"] - round(k, 9)) < 1e-9
    # attraction at the planted 0.01-rad scale: K far above independence
    assert out[0.01]["k_hat"] > 10 * math.pi * 0.01 * 0.01


def test_cross_k_pair_count_is_symmetric(spark):
    """#close pairs is direction-free: swapping the roles of A and B
    must give identical n_pairs at every radius."""
    from gos2_spark.spark.spatialstats import cross_k

    rng = random.Random(4)
    a_rows = [(i, rng.uniform(-30, 30), rng.uniform(-60, 60)) for i in range(20)]
    b_rows = [
        (50 + i, rng.uniform(-30, 30), rng.uniform(-60, 60)) for i in range(30)
    ]
    pa = _points(spark, a_rows)
    pb = _points(spark, b_rows, key="bid")
    radii = (0.05, 0.5)
    ab = {
        r["r_rad"]: r["n_pairs"]
        for r in cross_k(pa, pb, radii, point_key="key", b_key="bid").collect()
    }
    pa2 = _points(spark, [(k, la, lo) for k, la, lo in b_rows])
    pb2 = _points(spark, [(k, la, lo) for k, la, lo in a_rows], key="bid")
    ba = {
        r["r_rad"]: r["n_pairs"]
        for r in cross_k(
            pa2, pb2, radii, point_key="key", b_key="bid"
        ).collect()
    }
    assert ab == ba


def test_emerging_hotspots_categories_consistent_with_scores(spark):
    """Every emitted row's category is exactly the (gi_star, mk_z)
    threshold decision — the composition adds no hidden state — and the
    join keeps only Mann-Kendall-eligible cells."""
    rows = entry.queries()["emerging_hotspots"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows, "sf0.01 must produce classified cells"
    z = 1.959963984540054
    seen = set()
    for r in rows:
        hot = r["gi_star"] > z
        if hot and r["mk_z"] > z:
            want = "intensifying"
        elif hot and r["mk_z"] < -z:
            want = "diminishing"
        elif hot:
            want = "persistent"
        elif r["mk_z"] > z:
            want = "new"
        else:
            want = "none"
        assert r["category"] == want, r
        seen.add(r["category"])
    assert "none" in seen  # the null class is never silently dropped
