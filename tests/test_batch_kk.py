"""Moran correlogram + bivariate Moran — brute-force python references."""

import math
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _pts():
    return duckdb.sql(
        f"""SELECT c_custkey,
                   -60.0 + (c_custkey * 7 % 120) + (c_custkey % 97) / 97.0,
                   -170.0 + (c_custkey * 13 % 340) + (c_custkey % 89) / 89.0
            FROM read_parquet('{SF_DIR}/customer.parquet')"""
    ).fetchall()


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


def test_moran_correlogram_matches_brute(spark):
    pts = _pts()
    z = {k: 3 * math.floor(lat) + math.floor(lng) for k, lat, lng in pts}
    n = len(pts)
    mean = sum(z.values()) / n
    den = sum((v - mean) ** 2 for v in z.values())
    bands = defaultdict(lambda: [0, 0.0])
    for i, (ka, lata, lnga) in enumerate(pts):
        for kb, latb, lngb in pts[i + 1 :]:
            d = _angle((lata, lnga), (latb, lngb))
            if d <= math.radians(5.0):
                b = math.floor(math.degrees(d))
                bands[b][0] += 1
                bands[b][1] += (z[ka] - mean) * (z[kb] - mean)
    got = {r["band"]: r for r in entry.queries()["moran_correlogram"](spark, SF_DIR).collect()}
    assert set(got) == set(bands)
    for b, (w2, cross) in bands.items():
        i_ref = (n / (2 * w2)) * (2 * cross / den)
        assert got[b]["w_pairs"] == 2 * w2
        assert abs(got[b]["morans_i"] - i_ref) < 1e-7
    # short-range bands should show stronger positive autocorrelation
    # than the longest band for this smooth field
    if 0 in got and 4 in got:
        assert got[0]["morans_i"] > got[4]["morans_i"]


def test_bivariate_moran_matches_brute(spark):
    # sf0.01: at sf0.001 the 150 global points have no within-2-degree
    # pairs at all (w = 0 -> NULL statistic by design)
    sf = "/root/testdata/sf0.01"
    pts = duckdb.sql(
        f"""SELECT c_custkey,
                   -60.0 + (c_custkey * 7 % 120) + (c_custkey % 97) / 97.0,
                   -170.0 + (c_custkey * 13 % 340) + (c_custkey % 89) / 89.0
            FROM read_parquet('{sf}/customer.parquet')"""
    ).fetchall()
    zx = {k: 3 * math.floor(lat) + math.floor(lng) for k, lat, lng in pts}
    zy = {k: k % 7 for k, _, _ in pts}
    n = len(pts)
    mx = sum(zx.values()) / n
    my = sum(zy.values()) / n
    vx = sum((v - mx) ** 2 for v in zx.values())
    vy = sum((v - my) ** 2 for v in zy.values())
    w = 0
    num = 0.0
    for i, (ka, lata, lnga) in enumerate(pts):
        for kb, latb, lngb in pts[i + 1 :]:
            if _angle((lata, lnga), (latb, lngb)) <= math.radians(2.0):
                w += 2
                num += (zx[ka] - mx) * (zy[kb] - my)
                num += (zx[kb] - mx) * (zy[ka] - my)
    r = entry.queries()["bivariate_moran"](spark, sf).collect()[0]
    assert r["w_pairs"] == w
    i_ref = (n / w) * num / math.sqrt(vx * vy)
    assert abs(r["bivariate_i"] - i_ref) < 1e-7
    # y = key mod 7 is spatially unstructured: |I_xy| should be small
    assert abs(r["bivariate_i"]) < 0.2
