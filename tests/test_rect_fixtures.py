"""Rect fixtures ported from the reference's s2/rect_test.go — area,
add-point growth (incl. wrap through the antimeridian), and expansion."""

import math

import pytest

from gos2_spark.geometry import Rect
from gos2_spark.geometry.interval import R1Interval, S1Interval

D = math.radians


def rect_deg(lat_lo, lng_lo, lat_hi, lng_hi):
    """rect_test.go:46-60 — raw endpoint construction (NOT the normalized
    from_degrees used by queries): lat interval verbatim, lng through
    from_endpoints."""
    return Rect(
        R1Interval(D(lat_lo), D(lat_hi)),
        S1Interval.from_endpoints(D(lng_lo), D(lng_hi)),
    )


def approx(a: Rect, b: Rect, eps: float = 1e-15) -> bool:
    return (
        abs(a.lat.lo - b.lat.lo) < eps and abs(a.lat.hi - b.lat.hi) < eps
        and abs(a.lng.lo - b.lng.lo) < eps and abs(a.lng.hi - b.lng.hi) < eps
    )


@pytest.mark.parametrize("rect,want", [
    (Rect(R1Interval(0, 0), S1Interval(0, 0)), 0),
    (Rect.full(), 4 * math.pi),
    (Rect(R1Interval(0, math.pi / 2), S1Interval(0, math.pi / 2)), math.pi / 2),
])
def test_area(rect, want):
    assert abs(rect.area() - want) <= 1e-14


def test_rect_from_latlng_is_point():
    r = Rect.from_latlng_rad(D(23), D(47))
    lat, lng = r.center()
    assert lat == D(23) and lng == D(47)
    assert r.lat.lo == r.lat.hi and r.lng.lo == r.lng.hi


ADD_POINT = [
    (Rect(R1Interval.empty(), S1Interval.empty()), (0.0, 0.0),
     rect_deg(0, 0, 0, 0)),
    (rect_deg(0, 0, 0, 0), (0.0, -math.pi / 2),
     rect_deg(0, -90, 0, 0)),
    (rect_deg(0, -90, 0, 0), (math.pi / 4, -math.pi),
     rect_deg(0, -180, 45, 0)),
    (rect_deg(0, -180, 45, 0), (math.pi / 2, 0.0),
     rect_deg(0, -180, 90, 0)),
]


@pytest.mark.parametrize("idx", range(len(ADD_POINT)))
def test_add_point(idx):
    start, (lat, lng), want = ADD_POINT[idx]
    got = start.add_point_rad(lat, lng)
    assert approx(got, want), (idx, got, want)


EMPTY_LNG = Rect(Rect.full().lat, S1Interval.empty())

EXPANDED = [
    (rect_deg(70, 150, 80, 170), (20, 30), rect_deg(50, 120, 90, -160)),
    (EMPTY_LNG, (20, 30), EMPTY_LNG),
    (Rect.full(), (20, 30), Rect.full()),
    (rect_deg(-90, 170, 10, 20), (30, 80), rect_deg(-90, -180, 40, 180)),
]


@pytest.mark.parametrize("idx", range(len(EXPANDED)))
def test_expanded(idx):
    start, (mlat, mlng), want = EXPANDED[idx]
    got = start.expanded(D(mlat), D(mlng))
    assert approx(got, want), (idx, (got.lat.lo, got.lat.hi, got.lng.lo, got.lng.hi),
                               (want.lat.lo, want.lat.hi, want.lng.lo, want.lng.hi))
