"""Eighth round-4 operator batch vs independent pure-python replays:
polyline encoding, Huff market share, Theil index, seasonal-naive MASE,
snapshot retention planning."""

import math
import random
from collections import Counter, defaultdict

from pyspark.sql import functions as F


def _decode_polyline(s):
    idx, out, lat, lng = 0, [], 0, 0

    def val():
        nonlocal idx
        r, sh = 0, 0
        while True:
            b = ord(s[idx]) - 63
            idx += 1
            r |= (b & 0x1F) << sh
            sh += 5
            if b < 0x20:
                break
        return ~(r >> 1) if r & 1 else (r >> 1)

    while idx < len(s):
        lat += val()
        lng += val()
        out.append((lat, lng))
    return out


def test_polyline_matches_google_documented_example(spark):
    from gos2_spark.spark.polyline_codec import encode_polylines

    pts = [
        (1, i, lat, lng)
        for i, (lat, lng) in enumerate(
            [(38.5, -120.2), (40.7, -120.95), (43.252, -126.453)]
        )
    ]
    df = spark.createDataFrame(pts, "user_id long, ts long, lat double, lng double")
    row = encode_polylines(df).collect()[0]
    assert row["polyline"] == "_p~iF~ps|U_ulLnnqC_mqNvxq`@"
    assert row["n_pts"] == 3


def test_polyline_roundtrip_and_partition_invariance(spark):
    from gos2_spark.spark.polyline_codec import encode_polylines

    rng = random.Random(83)
    pts = []
    for u in range(5):
        for t in range(rng.randint(1, 12)):
            pts.append(
                (u, t, rng.uniform(-89.9, 89.9), rng.uniform(-179.9, 179.9))
            )
    df = spark.createDataFrame(pts, "user_id long, ts long, lat double, lng double")
    enc1 = {r["user_id"]: r["polyline"] for r in encode_polylines(df).collect()}
    enc2 = {
        r["user_id"]: r["polyline"]
        for r in encode_polylines(df.repartition(9)).collect()
    }
    assert enc1 == enc2
    by_user = defaultdict(list)
    for u, t, lat, lng in sorted(pts):
        by_user[u].append(
            (math.floor(lat * 1e5 + 0.5), math.floor(lng * 1e5 + 0.5))
        )
    for u, coords in by_user.items():
        assert _decode_polyline(enc1[u]) == coords, u


def _hav(lat1, lng1, lat2, lng2):
    r1, l1, r2, l2 = map(math.radians, (lat1, lng1, lat2, lng2))
    dlat = math.sin((r2 - r1) * 0.5)
    dlng = math.sin((l2 - l1) * 0.5)
    x = dlat * dlat + dlng * dlng * math.cos(r1) * math.cos(r2)
    return 2.0 * math.atan2(math.sqrt(x), math.sqrt(max(0.0, 1.0 - x)))


def test_huff_market_share_matches_reference(spark):
    from gos2_spark.spark.spatialstats import huff_market_share

    rng = random.Random(89)
    pts = [
        (i, rng.uniform(-60, 60), rng.uniform(-170, 170)) for i in range(150)
    ]
    df = spark.createDataFrame(pts, "key long, lat double, lng double")
    sites = [(10, 0.0, 0.0, 4.0), (20, 45.0, 90.0, 2.0), (30, -30.0, -60.0, 3.0)]
    got = {
        r["site_id"]: (r["demand_e9"], r["captured"], r["share"])
        for r in huff_market_share(df, sites).collect()
    }
    demand = Counter()
    captured = Counter()
    for _i, lat, lng in pts:
        us = [
            s / (_hav(lat, lng, alat, alng) ** 2 + 1e-6)
            for (_sid, alat, alng, s) in sites
        ]
        tot = sum(us)
        best, bu = 0, us[0]
        for j, u in enumerate(us[1:], 1):
            if u > bu:
                best, bu = j, u
        captured[best] += 1
        for j, u in enumerate(us):
            demand[j] += int(round(u / tot * 1e9))
    for j, (sid, *_r) in enumerate(sites):
        d, c, share = got[sid]
        assert d == demand[j]
        assert c == captured[j]
        assert math.isclose(share, round(d / 1e9 / len(pts), 9), abs_tol=1e-12)
    # probabilities sum to ~1 per point -> total demand ~ n_points * 1e9
    assert abs(sum(demand.values()) - len(pts) * 10**9) < len(pts) * 4


def test_theil_index_reference_and_extremes(spark):
    from gos2_spark.spark.spatialstats import theil_index

    rows = (
        [("even", i, 5) for i in range(8)]
        + [("skew", 0, 93)] + [("skew", i, 1) for i in range(1, 8)]
    )
    df = spark.createDataFrame(rows, "grp string, k long, x long")
    got = {
        r["grp"]: (r["q_units"], r["n_total"], r["theil_t"])
        for r in theil_index(df, ["grp"]).collect()
    }
    assert got["even"] == (8, 40, 0.0)  # perfectly even -> T = 0
    xs = [93] + [1] * 7
    n, q = sum(xs), len(xs)
    mu = n / q
    t = sum((x / n) * math.log(x / mu) for x in xs)
    assert math.isclose(got["skew"][2], round(t, 9), abs_tol=1e-9)
    assert 0 < got["skew"][2] < math.log(q)


def test_seasonal_naive_mase_reference(spark):
    from gos2_spark.spark.temporal import seasonal_naive_mase
    import datetime

    rng = random.Random(97)
    rows = []
    base = datetime.datetime(2024, 1, 1)
    for d in range(28):
        # 'weekly' has a strong period-7 pattern; 'noise' does not
        for _ in range(5 + (d % 7) * 3):
            rows.append(("weekly", base + datetime.timedelta(days=d)))
        for _ in range(rng.randint(1, 12)):
            rows.append(("noise", base + datetime.timedelta(days=d)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp_ntz")
    got = {
        r["event_type"]: r
        for r in seasonal_naive_mase(df, period=7).collect()
    }
    # python reference
    daily = Counter((t, (ts - base).days) for t, ts in rows)
    series = defaultdict(dict)
    for (t, d), c in daily.items():
        series[t][d] = c
    for t, sd in series.items():
        n7 = a7 = n1 = a1 = 0
        for d, c in sd.items():
            if d - 7 in sd:
                n7 += 1
                a7 += abs(c - sd[d - 7])
            if d - 1 in sd:
                n1 += 1
                a1 += abs(c - sd[d - 1])
        r = got[t]
        assert (r["n_seasonal"], r["abs_seasonal"]) == (n7, a7)
        assert (r["n_naive"], r["abs_naive"]) == (n1, a1)
        mase = (a7 / n7) / (a1 / n1) if a1 else 0.0
        assert math.isclose(r["mase"], round(mase, 9), abs_tol=1e-9)
    # the planted weekly series is perfectly periodic -> seasonal MAE 0
    assert got["weekly"]["abs_seasonal"] == 0
    assert got["noise"]["mase"] > 0.0


def test_snapshot_retention_reference(spark):
    from __spark_entry__ import _q_snapshot_retention  # replayed directly

    import duckdb

    # build the same snapshot table both ways at sf0.001 and compare to a
    # pure-python policy replay
    sf = "/root/testdata/sf0.001"
    got = {
        r["tbl"]: (r["n_snapshots"], r["n_keep"], r["n_expire"], r["keep_id_sum"])
        for r in _q_snapshot_retention(spark, sf).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_orderkey % 8, o_orderkey,
              CAST(floor(CAST(date_diff('microsecond',
                   TIMESTAMP '1970-01-01 00:00:00', o_orderdate) AS DOUBLE)
                   / 86400000000) AS BIGINT)
            FROM '{sf}/orders.parquet'"""
    ).fetchall()
    by_tbl = defaultdict(list)
    for tbl, sid, day in rows:
        by_tbl[tbl].append((day, sid))
    for tbl, snaps in by_tbl.items():
        snaps.sort(reverse=True)
        keep = {sid for _d, sid in snaps[:3]}
        days = sorted({d for d, _ in snaps}, reverse=True)[:7]
        for d in days:
            keep.add(max(sid for dd, sid in snaps if dd == d))
        n = len(snaps)
        assert got[tbl] == (n, len(keep), n - len(keep), sum(keep)), tbl
