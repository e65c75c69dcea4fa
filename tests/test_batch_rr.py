"""Projection family + GC intersections batch — independent Snyder
formula implementations and vector-math references in plain Python."""

import math

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

A = 6378137.0
FLAT = 1.0 / 298.257223563
E2 = FLAT * (2.0 - FLAT)
E = math.sqrt(E2)


def _pts():
    rows = duckdb.sql(
        f"SELECT c_custkey FROM read_parquet('{SF_DIR}/customer.parquet')"
    ).fetchall()
    out = []
    for (k,) in rows:
        lat = -60.0 + (k * 7 % 120) + (k % 97) / 97.0
        lng = -170.0 + (k * 13 % 340) + (k % 89) / 89.0
        out.append((k, lat, lng))
    return out


def _q_of(phi):
    s = math.sin(phi)
    return (1.0 - E2) * (
        s / (1.0 - E2 * s * s)
        - (1.0 / (2.0 * E)) * math.log((1.0 - E * s) / (1.0 + E * s))
    )


def _m_of(phi):
    return math.cos(phi) / math.sqrt(1.0 - E2 * math.sin(phi) ** 2)


def _t_of(phi):
    s = math.sin(phi)
    return math.tan(math.pi / 4 - phi / 2) / (
        (1.0 - E * s) / (1.0 + E * s)
    ) ** (E / 2)


def _albers(lat, lng):
    phi1, phi2 = math.radians(29.5), math.radians(45.5)
    phi0, lam0 = math.radians(23.0), math.radians(-96.0)
    m1, m2 = _m_of(phi1), _m_of(phi2)
    n = (m1 * m1 - m2 * m2) / (_q_of(phi2) - _q_of(phi1))
    c = m1 * m1 + n * _q_of(phi1)
    rho0 = A * math.sqrt(c - n * _q_of(phi0)) / n
    q = _q_of(math.radians(lat))
    rho = A * math.sqrt(c - n * q) / n
    th = n * (math.radians(lng) - lam0)
    return rho * math.sin(th), rho0 - rho * math.cos(th)


def _lcc(lat, lng):
    phi1, phi2 = math.radians(33.0), math.radians(45.0)
    phi0, lam0 = math.radians(23.0), math.radians(-96.0)
    n = (math.log(_m_of(phi1)) - math.log(_m_of(phi2))) / (
        math.log(_t_of(phi1)) - math.log(_t_of(phi2))
    )
    big_f = _m_of(phi1) / (n * _t_of(phi1) ** n)
    rho0 = A * big_f * _t_of(phi0) ** n
    rho = A * big_f * _t_of(math.radians(lat)) ** n
    th = n * (math.radians(lng) - lam0)
    return rho * math.sin(th), rho0 - rho * math.cos(th)


def _check_projection(spark, qname, proj):
    from collections import defaultdict

    sums = defaultdict(lambda: [0, 0, 0])
    for k, lat, lng in _pts():
        x, y = proj(lat, lng)
        b = math.floor(lat / 10.0)
        sums[b][0] += 1
        sums[b][1] += round(x * 1e6)
        sums[b][2] += round(y * 1e6)
    got = {r["band"]: r for r in entry.queries()[qname](spark, SF_DIR).collect()}
    assert set(got) == set(sums)
    for b, (n, sx, sy) in sums.items():
        r = got[b]
        assert r["n_points"] == n
        # micrometer-quantized: last-ULP libm differences may flip a few
        # round() calls by 1 micrometer each
        assert abs(r["sum_x"] - sx / 1e6) < 1e-3
        assert abs(r["sum_y"] - sy / 1e6) < 1e-3


def test_albers_matches_snyder(spark):
    _check_projection(spark, "albers_coordinates", _albers)


def test_lcc_matches_snyder(spark):
    _check_projection(spark, "lcc_coordinates", _lcc)


def _vec(lat, lng):
    la, lo = math.radians(lat), math.radians(lng)
    return (
        math.cos(lo) * math.cos(la),
        math.sin(lo) * math.cos(la),
        math.sin(la),
    )


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def test_gc_intersections_matches_vector_math(spark):
    pts = sorted(_pts())[:16]
    segs = []
    for s in range(8):
        _, la0, lo0 = pts[s]
        _, la1, lo1 = pts[s + 8]
        segs.append((_vec(la0, lo0), _vec(la1, lo1)))
    rows = entry.queries()["gc_intersections"](spark, SF_DIR).collect()
    assert len(rows) == 28
    n_hits = 0
    for r in rows:
        a1, b1 = segs[r["seg_a"]]
        a2, b2 = segs[r["seg_b"]]
        n1, n2 = _cross(a1, b1), _cross(a2, b2)
        i = _cross(n1, n2)

        def inside(p, a, b, n):
            return _dot(_cross(a, p), n) >= 0 and _dot(_cross(p, b), n) >= 0

        pos = inside(i, a1, b1, n1) and inside(i, a2, b2, n2)
        neg_i = (-i[0], -i[1], -i[2])
        neg = inside(neg_i, a1, b1, n1) and inside(neg_i, a2, b2, n2)
        assert r["intersects"] == (pos or neg)
        if pos or neg:
            n_hits += 1
            p = i if pos else neg_i
            lat = math.degrees(math.atan2(p[2], math.hypot(p[0], p[1])))
            lng = math.degrees(math.atan2(p[1], p[0]))
            assert abs(r["int_lat"] - lat) < 1e-7
            assert abs(r["int_lng"] - lng) < 1e-7
            # the point must lie on both great circles
            norm = math.sqrt(_dot(p, p))
            assert abs(_dot(p, n1)) / norm < 1e-9
            assert abs(_dot(p, n2)) / norm < 1e-9
    # random long segments over a hemisphere-scale region do cross
    assert 0 < n_hits < 28
