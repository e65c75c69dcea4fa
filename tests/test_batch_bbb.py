"""Weiszfeld spatial median, Mahalanobis outliers, line density —
independent Python references (sequential Weiszfeld, numpy-free 2x2
covariance algebra)."""

import math
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_spatial_median_matches_python(spark):
    rows = duckdb.sql(
        f"""SELECT event_id FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE event_id % 20 = 0"""
    ).fetchall()
    pts = []
    for (eid,) in rows:
        pts.append(
            (
                -60.0 + (eid * 11 % 120) + (eid % 83) / 83.0,
                -170.0 + (eid * 17 % 340) + (eid % 79) / 79.0,
            )
        )
    n = len(pts)
    mx = sum(round(la * 97) for la, _ in pts) / (97.0 * n)
    my = sum(round(lo * 89) for _, lo in pts) / (89.0 * n)
    for _ in range(8):
        swx = swy = sw = 0
        for la, lo in pts:
            d = max(1e-3, math.hypot(la - mx, lo - my))
            swx += round(la / d * 1e9)
            swy += round(lo / d * 1e9)
            sw += round(1e9 / d)
        mx, my = swx / sw, swy / sw
    r = entry.queries()["spatial_median"](spark, SF_DIR).collect()[0]
    assert r["iters"] == 8
    assert abs(r["median_lat"] - mx) < 1e-8
    assert abs(r["median_lng"] - my) < 1e-8
    # the geometric median's objective must beat the centroid's
    cx = sum(la for la, _ in pts) / n
    cy = sum(lo for _, lo in pts) / n
    obj_med = sum(math.hypot(la - mx, lo - my) for la, lo in pts)
    obj_cen = sum(math.hypot(la - cx, lo - cy) for la, lo in pts)
    assert obj_med <= obj_cen + 1e-6


def test_mahalanobis_matches_python(spark):
    rows = duckdb.sql(
        f"""SELECT c_custkey, c_nationkey
            FROM read_parquet('{SF_DIR}/customer.parquet')"""
    ).fetchall()
    per = defaultdict(list)
    for k, nat in rows:
        lat = -60.0 + (k * 7 % 120) + (k % 97) / 97.0
        lng = -170.0 + (k * 13 % 340) + (k % 89) / 89.0
        per[nat].append((round(lat * 97), round(lng * 89)))
    got = {r["nation"]: r for r in entry.queries()["mahalanobis_outliers"](spark, SF_DIR).collect()}
    assert set(got) == set(per)
    for nat, ab in per.items():
        n = len(ab)
        sa = sum(a for a, _ in ab)
        sb = sum(b for _, b in ab)
        saa = sum(a * a for a, _ in ab)
        sbb = sum(b * b for _, b in ab)
        sab = sum(a * b for a, b in ab)
        ma, mb = sa / n / 97.0, sb / n / 89.0
        vaa = (saa / n - (sa / n) ** 2) / 97.0**2
        vbb = (sbb / n - (sb / n) ** 2) / 89.0**2
        vab = (sab / n - (sa / n) * (sb / n)) / (97.0 * 89.0)
        det = vaa * vbb - vab * vab
        md2s = [
            (
                vbb * (a / 97.0 - ma) ** 2
                - 2 * vab * (a / 97.0 - ma) * (b / 89.0 - mb)
                + vaa * (b / 89.0 - mb) ** 2
            )
            / det
            for a, b in ab
        ]
        r = got[nat]
        assert r["n_points"] == n
        assert r["n_outliers"] == sum(1 for m in md2s if m > 5.991)
        assert abs(r["max_md2"] - max(md2s)) < 1e-6
        # chi2(2) 95% radius excludes roughly 5% of a wide cloud
        assert r["n_outliers"] <= 0.25 * n


def _vec(lat, lng):
    la, lo = math.radians(lat), math.radians(lng)
    return (
        math.cos(lo) * math.cos(la),
        math.sin(lo) * math.cos(la),
        math.sin(la),
    )


def test_line_density_matches_python(spark):
    rows = duckdb.sql(
        f"""SELECT user_id, epoch_us(ts), event_id
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY user_id, 2, 3"""
    ).fetchall()
    per = defaultdict(list)
    for uid, us, eid in rows:
        lat = -60.0 + (eid * 11 % 120) + (eid % 83) / 83.0
        lng = -170.0 + (eid * 17 % 340) + (eid % 79) / 79.0
        per[uid].append((lat, lng))
    agg = defaultdict(lambda: [0, 0])
    for seq in per.values():
        for (la1, lo1), (la2, lo2) in zip(seq, seq[1:]):
            a, b = _vec(la1, lo1), _vec(la2, lo2)
            cx = a[1] * b[2] - a[2] * b[1]
            cy = a[2] * b[0] - a[0] * b[2]
            cz = a[0] * b[1] - a[1] * b[0]
            leg = math.atan2(
                math.sqrt(cx * cx + cy * cy + cz * cz),
                a[0] * b[0] + a[1] * b[1] + a[2] * b[2],
            )
            key = (
                int(math.floor((la1 + la2) / 2.0 / 10.0)),
                int(math.floor((lo1 + lo2) / 2.0 / 10.0)),
            )
            agg[key][0] += 1
            agg[key][1] += round(leg * 1e12)
    got = {(r["tr"], r["tc"]): r for r in entry.queries()["line_density"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for key, (n, sq) in agg.items():
        r = got[key]
        assert r["n_legs"] == n
        assert abs(r["total_len_rad"] - sq / 1e12) < 1e-6
        assert abs(r["mean_len_rad"] - sq / 1e12 / n) < 1e-6
