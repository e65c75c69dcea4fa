"""MGRS 100km square naming — python replay + known-letter fixtures."""

import math

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

COLS = "ABCDEFGHJKLMNPQRSTUVWXYZ"
ROWS = "ABCDEFGHJKLMNPQRSTUV"
BANDS = "CDEFGHJKLMNPQRSTUVWX"


def _mgrs_ref(zone, lat, easting, northing):
    band = BANDS[math.floor((lat + 80.0) / 8.0)]
    col = COLS[(math.floor(easting / 100000.0) - 1 + 8 * ((zone - 1) % 3)) % 24]
    row = ROWS[(math.floor(northing / 100000.0) + 5 * ((zone - 1) % 2)) % 20]
    return band, col, row


def test_mgrs_known_scheme_fixtures():
    # central meridian of zone 1 (x=500km): col index (5-1+0)%24 = 4 -> 'E'
    band, col, row = _mgrs_ref(1, 0.0, 500000.0, 0.0)
    assert (band, col, row) == ("N", "E", "A")
    # zone 2 shifts the column alphabet by 8 -> 'N' (I skipped)
    _, col2, row2 = _mgrs_ref(2, 0.0, 500000.0, 0.0)
    assert col2 == COLS[(4 + 8) % 24]
    assert row2 == ROWS[5]  # even zone row offset
    # zone 52, lat 37.5 (Seoul): band index 14 -> S (Korea is 52S)
    band3, _, _ = _mgrs_ref(52, 37.5, 321000.0, 4150000.0)
    assert band3 == "S"


def test_mgrs_driver_matches_python_replay(spark):
    from gos2_spark.spark.geodesy import utm_project
    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        [
            (1, 40.7128, -74.0060),
            (2, -33.8688, 151.2093),
            (3, 51.4778, -0.0014),
            (4, 35.0, 129.0),
        ],
        "key long, lat double, lng double",
    )
    utm = {r["key"]: r for r in utm_project(pts).collect()}
    got = entry.queries()["mgrs_squares"](spark, SF_DIR).collect()
    # driver rollup: every square has >= 1 point, zones valid, letters in
    # the reduced alphabets
    assert sum(r["n_points"] for r in got) == 150
    for r in got:
        assert r["band"] in BANDS and r["col_letter"] in COLS
        assert r["row_letter"] in ROWS
    # per-point letter replay through the UTM fixture values
    for k, r in utm.items():
        lat = {1: 40.7128, 2: -33.8688, 3: 51.4778, 4: 35.0}[k]
        band, col, row = _mgrs_ref(r["zone"], lat, r["easting"], r["northing"])
        assert band in BANDS and col in COLS and row in ROWS
