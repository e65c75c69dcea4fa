"""LOO-IDW cross-validation and Hopkins statistic — brute-force python
references (also re-certifies distance_join / knn_join_df recall)."""

import math
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _cust_pts():
    return duckdb.sql(
        f"""SELECT c_custkey,
                   -60.0 + (c_custkey * 7 % 120) + (c_custkey % 97) / 97.0,
                   -170.0 + (c_custkey * 13 % 340) + (c_custkey % 89) / 89.0,
                   c_nationkey
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


def test_idw_loo_matches_brute_force(spark):
    pts = _cust_pts()
    r = math.radians(3.0)
    per_nation = defaultdict(list)
    for k, lat, lng, nat in pts:
        num = den = 0.0
        cnt = 0
        for k2, lat2, lng2, _ in pts:
            if k2 == k:
                continue
            d = _angle((lat, lng), (lat2, lng2))
            if d <= r:
                w = 1.0 / ((1e-3 + d) * (1e-3 + d))
                num += w * (k2 % 1000) / 10.0
                den += w
                cnt += 1
        if cnt:
            per_nation[nat].append(num / den - (k % 1000) / 10.0)
    got = {
        r_["c_nationkey"]: r_
        for r_ in entry.queries()["idw_loo_cv"](spark, SF_DIR).collect()
    }
    assert set(got) == set(per_nation)
    for nat, errs in per_nation.items():
        rmse = math.sqrt(sum(e * e for e in errs) / len(errs))
        assert got[nat]["n_points"] == len(errs)
        assert abs(got[nat]["rmse"] - rmse) < 1e-6


def test_hopkins_matches_brute_force(spark):
    pts = _cust_pts()
    coords = [(lat, lng) for _, lat, lng, _ in pts]
    su = 0.0
    for i, p in enumerate(coords):
        su += min(_angle(p, q) for j, q in enumerate(coords) if j != i)
    sw = 0.0
    for i in range(1, 301):
        s = (
            -60.0 + (i * 29 % 120) + (i % 71) / 71.0,
            -170.0 + (i * 31 % 340) + (i % 67) / 67.0,
        )
        sw += min(_angle(s, q) for q in coords)
    r = entry.queries()["hopkins_statistic"](spark, SF_DIR).collect()[0]
    assert r["n_real"] == len(coords) and r["n_synth"] == 300
    assert abs(r["sum_u"] - su) < 1e-6
    assert abs(r["sum_w"] - sw) < 1e-6
    assert abs(r["hopkins_h"] - sw / (su + sw)) < 1e-8
    assert 0.0 < r["hopkins_h"] < 1.0
