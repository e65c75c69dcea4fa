"""Sixteenth round-4 operator batch: group diameter, O-ring pair
correlation, Visvalingam effective area, cross/along-track decomposition,
closest pair per cell."""

import math
import random

from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# group_diameter
# ---------------------------------------------------------------------------

def test_group_diameter_matches_brute_force(spark):
    from gos2_spark.spark.spatialstats import group_diameter

    rng = random.Random(17)
    rows = []
    pts = {"g0": [], "g1": []}
    k = 0
    for g in ("g0", "g1"):
        for _ in range(25):
            p = (rng.uniform(-60, 60), rng.uniform(-170, 170))
            pts[g].append((k, p))
            rows.append((g, k, p[0], p[1]))
            k += 1
    df = spark.createDataFrame(rows, "g string, key long, lat double, lng double")
    got = {r["g"]: r for r in group_diameter(df, "g", point_key="key").collect()}
    for g, members in pts.items():
        best = max(
            (
                (_angle(pa, pb), ka, kb)
                for i, (ka, pa) in enumerate(members)
                for kb, pb in members[i + 1 :]
            )
        )
        assert abs(got[g]["diameter_rad"] - best[0]) < 1e-9
        assert (got[g]["key_a"], got[g]["key_b"]) == (best[1], best[2])
        assert got[g]["n_points"] == 25


def test_group_diameter_antipodal_and_singleton(spark):
    from gos2_spark.spark.spatialstats import group_diameter

    rows = [
        ("anti", 1, 0.0, 0.0),
        ("anti", 2, 0.0, 179.0),
        ("anti", 3, 10.0, 10.0),
        ("solo", 4, 5.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "g string, key long, lat double, lng double")
    got = {r["g"]: r for r in group_diameter(df, "g", point_key="key").collect()}
    assert got["anti"]["key_a"] == 1 and got["anti"]["key_b"] == 2
    assert abs(got["anti"]["diameter_rad"] - math.radians(179.0)) < 1e-9
    assert got["solo"]["key_a"] is None and got["solo"]["n_points"] == 1


# ---------------------------------------------------------------------------
# pair_correlation
# ---------------------------------------------------------------------------

def test_pair_correlation_matches_brute_force(spark):
    from gos2_spark.spark.functions import s2_cellid
    from gos2_spark.spark.spatialstats import pair_correlation

    rng = random.Random(29)
    pts = [
        (i, rng.uniform(-20, 20), rng.uniform(-20, 20)) for i in range(120)
    ]
    df = spark.createDataFrame(pts, "key long, lat double, lng double")
    df = df.withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))
    out = {
        r["bin_idx"]: r
        for r in pair_correlation(
            df, max_radius_deg=6.0, n_bins=3, point_key="key"
        ).collect()
    }
    binw = math.radians(6.0) / 3.0
    n = len(pts)
    counts = {}
    for i, (ka, la, ga) in enumerate(pts):
        for kb, lb, gb in pts[i + 1 :]:
            d = _angle((la, ga), (lb, gb))
            if d <= math.radians(6.0):
                b = min(int(d // binw), 2)
                counts[b] = counts.get(b, 0) + 1
    assert {b: r["n_pairs"] for b, r in out.items()} == counts
    for b, r in out.items():
        frac = counts[b] / (n * (n - 1) / 2.0)
        ring = (math.cos(b * binw) - math.cos((b + 1) * binw)) / 2.0
        assert abs(r["g"] - frac / ring) < 1e-6


# ---------------------------------------------------------------------------
# effective_area
# ---------------------------------------------------------------------------

def test_effective_area_collinear_is_zero_and_triangle_known(spark):
    from gos2_spark.spark.trajectory import effective_area

    rows = [
        # collinear run (area 0 at both interior vertices)
        ("line", 0, 0, 0.0, 0.0),
        ("line", 1, 1, 1.0, 1.0),
        ("line", 2, 2, 2.0, 2.0),
        ("line", 3, 3, 3.0, 3.0),
        # one interior vertex spanning a known triangle:
        # (0,0)-(1,2)-(2,0): area = 2, area2 = 4
        ("tri", 0, 0, 0.0, 0.0),
        ("tri", 1, 1, 2.0, 1.0),
        ("tri", 2, 2, 0.0, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts long, event_id long, lat double, lng double"
    )
    got = {
        r["user_id"]: r
        for r in effective_area(df, keep_threshold_deg2=0.5).collect()
    }
    assert got["line"]["n_interior"] == 2
    assert got["line"]["n_keep"] == 0 and got["line"]["area2_sum"] == 0.0
    assert got["tri"]["n_interior"] == 1
    assert got["tri"]["n_keep"] == 1 and got["tri"]["area2_sum"] == 4.0


def test_effective_area_matches_python_replay(spark):
    from gos2_spark.spark.trajectory import effective_area

    rng = random.Random(31)
    traj = [(i, rng.uniform(-5, 5), rng.uniform(-5, 5)) for i in range(30)]
    rows = [("u", t, t, la, lg) for t, la, lg in traj]
    df = spark.createDataFrame(
        rows, "user_id string, ts long, event_id long, lat double, lng double"
    )
    [r] = effective_area(df, keep_threshold_deg2=0.5).collect()
    a2s = []
    for i in range(1, len(traj) - 1):
        (_, y1, x1), (_, y2, x2), (_, y3, x3) = traj[i - 1 : i + 2]
        a2s.append(abs(x1 * (y2 - y3) + x2 * (y3 - y1) + x3 * (y1 - y2)))
    assert r["n_interior"] == len(a2s)
    assert r["n_keep"] == sum(1 for a in a2s if a >= 0.5)
    assert abs(r["area2_sum"] - sum(a2s)) < 1e-5


# ---------------------------------------------------------------------------
# cross/along-track
# ---------------------------------------------------------------------------

def test_cross_track_on_route_is_zero_and_signs_split(spark):
    from gos2_spark.spark.functions import along_track_rad, cross_track_rad

    # route along the equator 0->90E; points: on-route, north (left),
    # south (right)
    rows = [(1, 0.0, 45.0), (2, 10.0, 45.0), (3, -10.0, 45.0)]
    df = spark.createDataFrame(rows, "key long, lat double, lng double")
    out = {
        r["key"]: r
        for r in df.select(
            "key",
            cross_track_rad(
                F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(90.0),
                F.col("lat"), F.col("lng"),
            ).alias("xt"),
            along_track_rad(
                F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(90.0),
                F.col("lat"), F.col("lng"),
            ).alias("at"),
        ).collect()
    }
    assert abs(out[1]["xt"]) < 1e-12
    assert abs(out[1]["at"] - math.radians(45.0)) < 1e-9
    # bearing to a north point is LEFT of the eastward track -> negative
    assert out[2]["xt"] < 0 < out[3]["xt"]
    assert abs(out[2]["xt"] + math.radians(10.0)) < 1e-9
    assert abs(out[3]["xt"] - math.radians(10.0)) < 1e-9
    # along-track foot of both offset points is the same meridian
    assert abs(out[2]["at"] - out[3]["at"]) < 1e-9


def test_cross_track_python_replay_random_points(spark):
    from gos2_spark.spark.functions import cross_track_rad

    rng = random.Random(37)
    rows = [
        (i, rng.uniform(-60, 60), rng.uniform(-170, 170)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "key long, lat double, lng double")
    a = (40.7128, -74.0060)
    b = (51.5074, -0.1278)
    got = {
        r["key"]: r["xt"]
        for r in df.select(
            "key",
            cross_track_rad(
                F.lit(a[0]), F.lit(a[1]), F.lit(b[0]), F.lit(b[1]),
                F.col("lat"), F.col("lng"),
            ).alias("xt"),
        ).collect()
    }

    def hav(p, q):
        x = (
            math.sin(0.5 * (math.radians(q[0]) - math.radians(p[0]))) ** 2
            + math.sin(0.5 * (math.radians(q[1]) - math.radians(p[1]))) ** 2
            * math.cos(math.radians(p[0])) * math.cos(math.radians(q[0]))
        )
        return 2 * math.atan2(math.sqrt(x), math.sqrt(max(0.0, 1 - x)))

    def brg(p, q):
        dlng = math.radians(q[1]) - math.radians(p[1])
        y = math.sin(dlng) * math.cos(math.radians(q[0]))
        x = math.cos(math.radians(p[0])) * math.sin(math.radians(q[0])) - math.sin(
            math.radians(p[0])
        ) * math.cos(math.radians(q[0])) * math.cos(dlng)
        t = math.atan2(y, x)
        return t + 2 * math.pi if t < 0 else t

    for k, la, lg in rows:
        want = math.asin(
            max(
                -1.0,
                min(
                    1.0,
                    math.sin(hav(a, (la, lg)))
                    * math.sin(brg(a, (la, lg)) - brg(a, b)),
                ),
            )
        )
        assert abs(got[k] - want) < 1e-9, k


# ---------------------------------------------------------------------------
# closest pair per cell: replay the registered query against the kernels
# ---------------------------------------------------------------------------

def test_closest_pair_cells_matches_kernel_replay(spark):
    import numpy as np

    import duckdb

    from gos2_spark.kernels import hilbert as H
    from gos2_spark.kernels import projection as P

    rows = duckdb.sql(
        f"SELECT c_custkey FROM '{SF_DIR}/customer.parquet' ORDER BY 1"
    ).fetchall()
    keys = np.array([r[0] for r in rows], dtype=np.int64)
    lat = -60.0 + (keys * 7 % 120) + (keys % 97) / 97.0
    lng = -170.0 + (keys * 13 % 340) + (keys % 89) / 89.0
    ids = P.cellid_from_latlng(lat.astype(float), lng.astype(float))
    lsb = np.uint64(1) << np.uint64(2 * (30 - 4))
    # parent(L) = (id & -lsb) | lsb  ==  clear everything below lsb, set lsb
    parents = (ids & ~(lsb - np.uint64(1))) | lsb
    by_cell = {}
    for k, la, lg, pid in zip(keys, lat, lng, parents):
        by_cell.setdefault(H.to_token(np.array([pid]))[0], []).append(
            (int(k), float(la), float(lg))
        )
    want = {}
    for tok, members in by_cell.items():
        if len(members) < 2:
            continue
        best = min(
            (
                (_angle((la, lg), (lb, gb)), ka, kb)
                for i, (ka, la, lg) in enumerate(members)
                for kb, lb, gb in members[i + 1 :]
            )
        )
        want[tok] = (len(members), best[1], best[2])
    got = {
        r["cell_token"]: r
        for r in entry.queries()["closest_pair_cells"](spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for tok, (n, ka, kb) in want.items():
        assert got[tok]["n_points"] == n
        assert (got[tok]["key_a"], got[tok]["key_b"]) == (ka, kb), tok
