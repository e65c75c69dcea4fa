"""Ports of the remaining small reference test files:

  * latlng_test.go:10-77  — string formatting, point conversion, distance
  * vector_test.go:12-305 — norms, dot/cross, identities, ordering
  * cellunion_test.go:8-35 — the exact Pittsburg normalization fixture
"""

import math

import numpy as np
import pytest

from gos2_spark.geometry import _vec as V
from gos2_spark.cover.cellunion import CellUnion
from gos2_spark.kernels import projection as PJ


def _f64_eq(a, b):
    return abs(a - b) < 1e-14 or (a != 0 and abs((a - b) / a) < 1e-14)


def test_latlng_string():
    # latlng_test.go:10-16 — 7-decimal degree formatting.
    lat, lng = math.sqrt(2), -math.sqrt(5)
    assert f"[{lat:.7f}, {lng:.7f}]" == "[1.4142136, -2.2360680]"


LATLNG_POINT_CASES = [
    # latlng_test.go:18-35 (verified against C++ S2)
    (0, 0, 1, 0, 0),
    (90, 0, 6.12323e-17, 0, 1),
    (-90, 0, 6.12323e-17, 0, -1),
    (0, 180, -1, 1.22465e-16, 0),
    (0, -180, -1, -1.22465e-16, 0),
    (90, 180, -6.12323e-17, 7.4988e-33, 1),
    (90, -180, -6.12323e-17, -7.4988e-33, 1),
    (-90, 180, -6.12323e-17, 7.4988e-33, -1),
    (-90, -180, -6.12323e-17, -7.4988e-33, -1),
    (
        -81.82750430354997, 151.19796752929685,
        -0.12456788151479525, 0.0684875268284729, -0.989844584550441,
    ),
]


def _approx(a, b, tol=1e-14):
    return abs(a - b) <= tol * max(1.0, abs(a), abs(b))


@pytest.mark.parametrize("lat,lng,x,y,z", LATLNG_POINT_CASES)
def test_latlng_point_conversion(lat, lng, x, y, z):
    px, py, pz = PJ.latlng_to_xyz(np.radians(np.array([lat])), np.radians(np.array([lng])))
    assert _approx(px[0], x) and _approx(py[0], y) and _approx(pz[0], z)
    lat2 = math.degrees(V.latitude((px[0], py[0], pz[0])))
    assert _approx(lat2, lat, 1e-12)
    if abs(lat) != 90:
        lng2 = math.degrees(V.longitude((px[0], py[0], pz[0])))
        assert _approx(lng2, lng, 1e-12)


@pytest.mark.parametrize(
    "lat1,lng1,lat2,lng2,want,tol",
    [
        # latlng_test.go:56-77
        (90, 0, 90, 0, 0, 1e-13),
        (-37, 25, -66, -155, 77, 1e-13),
        (0, 165, 0, -80, 115, 1e-13),
        (47, -127, -47, 53, 180, 2e-6),
    ],
)
def test_latlng_distance(lat1, lng1, lat2, lng2, want, tol):
    d = PJ.latlng_distance(
        np.radians(np.array([lat1])), np.radians(np.array([lng1])),
        np.radians(np.array([lat2])), np.radians(np.array([lng2])),
    )
    assert abs(math.degrees(d[0]) - want) <= tol


VECTORS = [
    # vector_test.go:246-259
    ((0, 0, 0), (0, 0, 0)),
    ((0, 0, 0), (0, 1, 2)),
    ((1, 0, 0), (0, 1, 0)),
    ((1, 0, 0), (0, 1, 1)),
    ((1, 1, 1), (-1, -1, -1)),
    ((1, 2, 2), (-0.3, 0.4, -1.2)),
]


def test_vector_norms():
    # vector_test.go:12-47
    assert V.norm((0, 0, 0)) == 0
    assert _f64_eq(V.norm((0, 1, 0)), 1)
    assert _f64_eq(V.norm((3, -4, 12)), 13)
    assert _f64_eq(V.norm2((3, -4, 12)), 169)
    assert _f64_eq(V.norm2((1, 1e-16, 1e-32)), 1)


def test_vector_normalize_and_is_unit():
    # vector_test.go:48-86: normalize preserves direction, yields unit norm.
    for vec in [(1, 0, 0), (0, 1, 0), (3, -4, 12), (1, 1e-16, 1e-32)]:
        n = V.normalize(vec)
        assert _f64_eq(V.norm(tuple(n)), 1)
        cx = V.cross(vec, tuple(n))
        assert V.norm(tuple(cx)) < 1e-12 * V.norm(vec)
        assert V.is_unit(tuple(n))
    # Zero vector stays zero (Go returns Vector{0,0,0}).
    assert not V.is_unit((0, 0, 0))


def test_vector_dot_cross_add_sub_mul():
    # vector_test.go:87-207
    assert _f64_eq(V.dot((1, 0, 0), (1, 0, 0)), 1)
    assert _f64_eq(V.dot((1, 0, 0), (0, 1, 0)), 0)
    assert tuple(V.cross((1, 0, 0), (0, 1, 0))) == (0, 0, 1)
    assert tuple(V.cross((0, 1, 0), (1, 0, 0))) == (0, 0, -1)
    assert tuple(V.add((1, 0, 0), (0, 1, 0))) == (1, 1, 0)
    assert tuple(V.sub((1, 0, 0), (0, 1, 0))) == (1, -1, 0)
    assert tuple(V.mul((1, 0, 0), 3.0)) == (3, 0, 0)
    assert _f64_eq(V.distance((3, 1, 40), (0, 2, -2)), math.sqrt(9 + 1 + 42 * 42))


def test_vector_angle_known_values():
    # vector_test.go:208-228
    assert _f64_eq(V.angle((1, 0, 0), (0, 1, 0)), math.pi / 2)
    assert _f64_eq(V.angle((1, 0, 0), (0, 1, 1)), math.pi / 2)
    assert V.angle((1, 0, 0), (1, 0, 0)) == 0
    assert _f64_eq(V.angle((1, 1, 1), (-1, -1, -1)), math.pi)


@pytest.mark.parametrize("v1,v2", VECTORS)
def test_vector_identities(v1, v2):
    # vector_test.go:246-284: angle and dot commute, cross anti-commutes
    # and is orthogonal to both inputs.
    assert _f64_eq(V.angle(v1, v2), V.angle(v2, v1))
    assert _f64_eq(V.dot(v1, v2), V.dot(v2, v1))
    c1, c2 = V.cross(v1, v2), V.cross(v2, v1)
    assert all(_approx(a, -b) for a, b in zip(tuple(c1), tuple(c2)))
    assert abs(V.dot(v1, tuple(c1))) < 1e-14
    assert abs(V.dot(v2, tuple(c1))) < 1e-14


def test_cellunion_normalization_exact_fixture():
    # cellunion_test.go:8-35 — byte-exact Pittsburg CA fixture.
    cu = CellUnion(
        [
            0x80855C0000000000,  # A: a cell over Pittsburg CA
            0x80855D0000000000,  # B, a child of A
            0x8085634000000000,  # first child of X, disjoint from A
            0x808563C000000000,  # second child of X
            0x80855DC000000000,  # a child of B
            0x808562C000000000,  # third child of X
            0x8085624000000000,  # fourth child of X
            0x80855D0000000000,  # B again
        ]
    )
    assert cu.ids == [0x80855C0000000000, 0x8085630000000000]  # A, X
