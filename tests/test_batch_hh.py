"""Quadkey pyramid, directional variogram, rate limiter — references."""

import math
from collections import Counter, defaultdict

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


def test_quadkey_pyramid_prefix_consistency(spark):
    rows = entry.queries()["quadkey_pyramid"](spark, SF_DIR).collect()
    by_zoom = defaultdict(dict)
    for r in rows:
        by_zoom[r["zoom"]][r["quadkey"]] = r["n_points"]
        assert len(r["quadkey"]) == r["zoom"]
        assert set(r["quadkey"]) <= set("0123")
    total = sum(by_zoom[5].values())
    for z in range(1, 6):
        assert sum(by_zoom[z].values()) == total
    # each parent count equals the sum of its children
    for z in range(1, 5):
        for qk, n in by_zoom[z].items():
            kids = sum(
                v for k, v in by_zoom[z + 1].items() if k.startswith(qk)
            )
            assert kids == n


def test_quadkey_pyramid_matches_python(spark):
    counts = Counter()
    for _, lat, lng in _pts():
        n = 32
        x = max(0, min(n - 1, math.floor((lng + 180.0) / 360.0 * n)))
        rad = math.radians(lat)
        y = max(
            0,
            min(
                n - 1,
                math.floor(
                    (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.pi)
                    / 2.0
                    * n
                ),
            ),
        )
        qk = "".join(
            str(((x >> (i - 1)) % 2) + 2 * ((y >> (i - 1)) % 2))
            for i in range(5, 0, -1)
        )
        for z in range(1, 6):
            counts[(z, qk[:z])] += 1
    got = {
        (r["zoom"], r["quadkey"]): r["n_points"]
        for r in entry.queries()["quadkey_pyramid"](spark, SF_DIR).collect()
    }
    assert got == dict(counts)


def test_directional_variogram_matches_brute(spark):
    pts = _pts()

    def angle(p, q):
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

    agg = defaultdict(lambda: [0, 0])
    for i, (ka, lata, lnga) in enumerate(pts):
        za = 3 * math.floor(lata) + math.floor(lnga)
        for kb, latb, lngb in pts[i + 1 :]:
            d = angle((lata, lnga), (latb, lngb))
            if d <= math.radians(5.0):
                zb = 3 * math.floor(latb) + math.floor(lngb)
                sector = "ns" if abs(lata - latb) > abs(lnga - lngb) else "ew"
                a = agg[(sector, math.floor(math.degrees(d)))]
                a[0] += 1
                a[1] += (za - zb) ** 2
    got = {
        (r["sector"], r["bin"]): r
        for r in entry.queries()["directional_variogram"](spark, SF_DIR).collect()
    }
    assert set(got) == set(agg)
    for key, (n, sd2) in agg.items():
        assert got[key]["n_pairs"] == n
        assert abs(got[key]["gamma"] - sd2 / (2 * n)) < 1e-7


def test_rate_limit_matches_python(spark):
    ev = duckdb.sql(
        f"""SELECT user_id,
                   epoch_us(ts - TIMESTAMP '1970-01-01 00:00:00') // 10000000
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    per = Counter()
    for u, w in ev:
        per[(f"site{u % 20}", w)] += 1
    hosts = defaultdict(lambda: [0, 0, 0, 0])
    for (h, _), c in per.items():
        a = hosts[h]
        a[0] += c
        a[1] += 1
        a[2] += max(0, c - 3)
        a[3] = max(a[3], c)
    got = {
        r["host"]: r
        for r in entry.queries()["rate_limit_windows"](spark, SF_DIR).collect()
    }
    assert set(got) == set(hosts)
    for h, (nr, nw, nt, mx) in hosts.items():
        r = got[h]
        assert (r["n_requests"], r["n_windows"]) == (nr, nw)
        assert (r["n_throttled"], r["max_window_load"]) == (nt, mx)


def test_geohash_pyramid_prefix_consistency(spark):
    rows = entry.queries()["geohash_pyramid"](spark, SF_DIR).collect()
    by_lvl = defaultdict(dict)
    for r in rows:
        by_lvl[r["lvl"]][r["prefix"]] = r["n_points"]
        assert len(r["prefix"]) == r["lvl"]
    total = sum(by_lvl[4].values())
    for lvl in range(1, 5):
        assert sum(by_lvl[lvl].values()) == total
    for lvl in range(1, 4):
        for p, n in by_lvl[lvl].items():
            kids = sum(
                v for k, v in by_lvl[lvl + 1].items() if k.startswith(p)
            )
            assert kids == n
