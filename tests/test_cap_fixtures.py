"""Cap fixtures ported from the reference's s2/cap_test.go — emptiness,
complement, cap-cap containment/intersection, point containment at
boundary epsilons, expansion, and the radius->height table."""

import math

import numpy as np
import pytest

from gos2_spark.geometry import Cap
from gos2_spark.geometry.cap import radius_to_height

EPS = 1e-14
TINY_RAD = 1e-10
_EMPTY_HEIGHT = -1.0
_FULL_HEIGHT = 2.0


def pt(x, y, z):
    v = np.array([x, y, z], dtype=np.float64)
    v = v / math.sqrt(float(v @ v))
    return (float(v[0]), float(v[1]), float(v[2]))


def from_latlng_deg(lat, lng):
    la, lo = math.radians(lat), math.radians(lng)
    return (
        math.cos(lo) * math.cos(la), math.sin(lo) * math.cos(la), math.sin(la)
    )


x_axis_pt = pt(1, 0, 0)
y_axis_pt = pt(0, 1, 0)
empty = Cap.empty()
full = Cap.full()
x_axis = Cap.from_point(x_axis_pt)
y_axis = Cap.from_point(y_axis_pt)
x_comp = x_axis.complement()
hemi = Cap(pt(1, 0, 1), 1.0)
concave = Cap.from_center_angle(from_latlng_deg(80, 10), math.radians(150.0))
tiny = Cap.from_center_angle(pt(1, 2, 3), TINY_RAD)


@pytest.mark.parametrize("cap,is_empty,is_full", [
    (empty, True, False),
    (empty.complement(), False, True),
    (full, False, True),
    (full.complement(), True, False),
    (x_comp, False, True),
    (x_comp.complement(), True, False),
    (tiny, False, False),
    (concave, False, False),
    (hemi, False, False),
])
def test_basic_empty_full(cap, is_empty, is_full):
    assert cap.is_empty() == is_empty
    assert cap.is_full() == is_full


def test_center_height_radius():
    assert x_axis.approx_equal(x_axis.complement().complement())
    assert full.height == _FULL_HEIGHT
    assert math.degrees(full.radius()) == 180.0
    assert empty.height == Cap.empty().height
    assert y_axis.height == 0.0
    assert x_axis.height == 0.0
    assert x_axis.radius() == 0.0
    hc = tuple(-c for c in hemi.center)
    assert hc == hemi.complement().center
    assert hemi.height == 1.0


CONTAINS = [
    (empty, empty, True),
    (full, empty, True),
    (full, full, True),
    (empty, x_axis, False),
    (full, x_axis, True),
    (x_axis, full, False),
    (x_axis, x_axis, True),
    (x_axis, empty, True),
    (hemi, tiny, True),
    (hemi, Cap.from_center_angle(x_axis_pt, math.pi / 4 - EPS), True),
    (hemi, Cap.from_center_angle(x_axis_pt, math.pi / 4 + EPS), False),
    (concave, hemi, True),
    (concave, Cap(tuple(-c for c in concave.center), 0.1), False),
]


@pytest.mark.parametrize("idx", range(len(CONTAINS)))
def test_cap_contains_cap(idx):
    c1, c2, want = CONTAINS[idx]
    assert c1.contains_cap(c2) == want, idx


def _tangent():
    c = np.array(tiny.center)
    o = np.array(pt(3, 2, 1))
    t = np.cross(c, o)
    return t / math.sqrt(float(t @ t))


CONTAINS_POINT = [
    (x_axis, x_axis_pt, True),
    (x_axis, pt(1, 1e-20, 0), False),
    (y_axis, x_axis.center, False),
    (x_comp, x_axis.center, True),
    (x_comp.complement(), x_axis.center, False),
    (tiny, tuple(np.array(tiny.center) + _tangent() * (TINY_RAD * 0.99)), True),
    (tiny, tuple(np.array(tiny.center) + _tangent() * (TINY_RAD * 1.01)), False),
    (hemi, pt(1, 0, -(1 - EPS)), True),
    (hemi, x_axis_pt, True),
    (hemi.complement(), x_axis_pt, False),
    (concave, from_latlng_deg(-70 * (1 - EPS), 10), True),
    (concave, from_latlng_deg(-70 * (1 + EPS), 10), False),
    (concave, from_latlng_deg(-50 * (1 - EPS), -170), True),
    (concave, from_latlng_deg(-50 * (1 + EPS), -170), False),
]


@pytest.mark.parametrize("idx", range(len(CONTAINS_POINT)))
def test_cap_contains_point(idx):
    c, p, want = CONTAINS_POINT[idx]
    assert c.contains_point(p) == want, idx


INTERIOR_INTERSECTS = [
    (empty, empty, False),
    (empty, x_axis, False),
    (full, empty, False),
    (full, full, True),
    (full, x_axis, True),
    (x_axis, full, False),
    (x_axis, x_axis, False),
    (x_axis, empty, False),
    (concave, hemi.complement(), True),
]


@pytest.mark.parametrize("idx", range(len(INTERIOR_INTERSECTS)))
def test_interior_intersects(idx):
    c1, c2, want = INTERIOR_INTERSECTS[idx]
    assert c1.interior_intersects_cap(c2) == want, idx


def test_interior_contains():
    assert not hemi.interior_contains_point(pt(1, 0, -(1 + EPS)))


def test_expanded():
    cap50 = Cap.from_center_angle(x_axis_pt, math.radians(50.0))
    cap51 = Cap.from_center_angle(x_axis_pt, math.radians(51.0))
    assert empty.expanded(_FULL_HEIGHT).is_empty()
    assert full.expanded(_FULL_HEIGHT).is_full()
    assert cap50.expanded(0).approx_equal(cap50)
    assert cap50.expanded(math.radians(1.0)).approx_equal(cap51)
    assert not cap50.expanded(math.radians(129.99)).is_full()
    assert cap50.expanded(math.radians(130.01)).is_full()


def _f64_eq(a, b):
    return abs(a - b) <= 1e-14


@pytest.mark.parametrize("radians,want", [
    (-0.5, _EMPTY_HEIGHT),
    (0.0, 0.0),
    (math.pi, _FULL_HEIGHT),
    (2 * math.pi, _FULL_HEIGHT),
    (math.radians(-7.0), _EMPTY_HEIGHT),
    (math.radians(12.0), 0.02185239926619),
    (math.radians(30.0), 0.13397459621556),
    (math.radians(45.0), 0.29289321881345),
    (math.radians(90.0), 1.0),
    (math.radians(179.99), 1.99999998476912),
    (math.radians(180.0), _FULL_HEIGHT),
    (math.radians(270.0), _FULL_HEIGHT),
    (-1.0, _EMPTY_HEIGHT),
    (1.0, 0.45969769413186),
    (math.pi / 2.0, 1.0),
    (2.0, 1.41614683654714),
    (3.0, 1.98999249660044),
    (4.0, _FULL_HEIGHT),
])
def test_radius_to_height(radians, want):
    assert _f64_eq(radius_to_height(radians), want)
