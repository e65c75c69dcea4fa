"""UTM projection (spark/geodesy.py::utm_steps) vs an independent python
implementation of the Snyder series + known-fixture checks."""

import math

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

A = 6378137.0
F_ = 1.0 / 298.257223563
E2 = F_ * (2 - F_)
EP2 = E2 / (1 - E2)


def _utm_ref(lat, lng):
    zone = math.floor((lng + 180.0) / 6.0) + 1
    lam0 = math.radians(zone * 6 - 183)
    phi = math.radians(lat)
    sphi, cphi = math.sin(phi), math.cos(phi)
    n = A / math.sqrt(1 - E2 * sphi * sphi)
    t = (sphi / cphi) ** 2
    c = EP2 * cphi * cphi
    a = (math.radians(lng) - lam0) * cphi
    m = A * (
        (1 - E2 / 4 - 3 * E2**2 / 64 - 5 * E2**3 / 256) * phi
        - (3 * E2 / 8 + 3 * E2**2 / 32 + 45 * E2**3 / 1024) * math.sin(2 * phi)
        + (15 * E2**2 / 256 + 45 * E2**3 / 1024) * math.sin(4 * phi)
        - (35 * E2**3 / 3072) * math.sin(6 * phi)
    )
    east = (
        0.9996
        * n
        * (
            a
            + (1 - t + c) * a**3 / 6
            + (5 - 18 * t + t * t + 72 * c - 58 * EP2) * a**5 / 120
        )
        + 500000.0
    )
    north = 0.9996 * (
        m
        + n
        * (sphi / cphi)
        * (
            a * a / 2
            + (5 - t + 9 * c + 4 * c * c) * a**4 / 24
            + (61 - 58 * t + t * t + 600 * c - 330 * EP2) * a**6 / 720
        )
    )
    if lat < 0:
        north += 10000000.0
    return zone, east, north


def test_utm_matches_python_reference(spark):
    from gos2_spark.spark.geodesy import utm_project

    fixtures = [
        (40.7128, -74.0060),   # NYC -> zone 18N
        (51.4778, -0.0014),    # Greenwich -> zone 30/31N boundary area
        (-33.8688, 151.2093),  # Sydney -> zone 56S
        (0.5, 0.5),
        (-45.0, -170.5),
    ]
    df = spark.createDataFrame(fixtures, "lat double, lng double")
    got = {
        (round(r["lat"], 4), round(r["lng"], 4)): r
        for r in utm_project(df).collect()
    }
    for lat, lng in fixtures:
        zone, east, north = _utm_ref(lat, lng)
        r = got[(round(lat, 4), round(lng, 4))]
        assert r["zone"] == zone
        assert abs(r["easting"] - east) < 1e-6
        assert abs(r["northing"] - north) < 1e-6
        assert r["hemisphere"] == ("S" if lat < 0 else "N")


def test_utm_geometric_invariants():
    # central-meridian point of zone 18 (lng = -75): easting exactly the
    # 500 km false easting, equator: northing 0
    zone, east, north = _utm_ref(0.0, -75.0)
    assert zone == 18
    assert abs(east - 500000.0) < 1e-6
    assert abs(north) < 1e-6
    # one degree east of the central meridian on the equator is one
    # degree of arc scaled by k0 (to first order)
    _, east1, _ = _utm_ref(0.0, -74.0)
    arc = math.radians(1.0) * A * 0.9996
    assert abs((east1 - 500000.0) - arc) < 30.0
    # southern hemisphere picks up the 10,000 km false northing
    _, _, north_s = _utm_ref(-0.01, -75.0)
    assert north_s > 9_990_000


def test_utm_driver_rollup_consistent(spark):
    rows = entry.queries()["utm_coordinates"](spark, SF_DIR).collect()
    assert sum(r["n_points"] for r in rows) == 150
    for r in rows:
        assert 1 <= r["zone"] <= 60
        # mean easting stays inside the zone's plausible band
        mean_e = r["sum_easting"] / r["n_points"]
        assert 100000 < mean_e < 900000
