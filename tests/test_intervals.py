"""S1 (circular, possibly inverted) and R1 interval fixtures ported
verbatim from the reference's own tests (s1/interval_test.go,
r1/interval_test.go) — the wrap-aware interval algebra underpinning every
Rect longitude operation."""

import math

import pytest

from gos2_spark.geometry.interval import R1Interval, S1Interval

PI = math.pi

empty = S1Interval.empty()
full = S1Interval.full()
zero = S1Interval.from_endpoints(0, 0)
pi2 = S1Interval.from_endpoints(PI / 2, PI / 2)
pi = S1Interval.from_endpoints(PI, PI)
mipi = S1Interval.from_endpoints(-PI, -PI)  # normalizes to [π, π]
mipi2 = S1Interval.from_endpoints(-PI / 2, -PI / 2)
quad1 = S1Interval.from_endpoints(0, PI / 2)
quad2 = S1Interval.from_endpoints(PI / 2, -PI)
quad3 = S1Interval.from_endpoints(PI, -PI / 2)
quad4 = S1Interval.from_endpoints(-PI / 2, 0)
quad12 = S1Interval.from_endpoints(0, -PI)
quad23 = S1Interval.from_endpoints(PI / 2, -PI / 2)
quad34 = S1Interval.from_endpoints(-PI, 0)
quad41 = S1Interval.from_endpoints(-PI / 2, PI / 2)
quad123 = S1Interval.from_endpoints(0, -PI / 2)
quad234 = S1Interval.from_endpoints(PI / 2, 0)
quad341 = S1Interval.from_endpoints(PI, PI / 2)
quad412 = S1Interval.from_endpoints(-PI / 2, -PI)
mid12 = S1Interval.from_endpoints(PI / 2 - 0.01, PI / 2 + 0.02)
mid23 = S1Interval.from_endpoints(PI - 0.01, -PI + 0.02)
mid34 = S1Interval.from_endpoints(-PI / 2 - 0.01, -PI / 2 + 0.02)
mid41 = S1Interval.from_endpoints(-0.01, 0.02)


def iv(lo, hi):
    return S1Interval.from_endpoints(lo, hi)


def test_constructors_normalize_mipi():
    assert mipi.lo == PI and mipi.hi == PI


def test_simple_predicates():
    assert zero.is_valid() and not zero.is_empty() and not zero.is_full()
    assert empty.is_valid() and empty.is_empty() and not empty.is_full()
    assert empty.is_inverted()
    assert full.is_valid() and not full.is_empty() and full.is_full()
    assert pi.is_valid() and not pi.is_empty() and not pi.is_inverted()
    assert mipi.is_valid() and not mipi.is_empty() and not mipi.is_inverted()


@pytest.mark.parametrize("interval,want", [
    (quad12, PI / 2),
    (iv(3.1, 2.9), 3 - PI),
    (iv(-2.9, -3.1), PI - 3),
    (iv(2.1, -2.1), PI),
    (pi, PI),
    (mipi, PI),
    (quad23, PI),
    (quad123, 0.75 * PI),
])
def test_center(interval, want):
    assert abs(interval.center() - want) <= 1e-15


@pytest.mark.parametrize("interval,want", [
    (quad12, PI), (pi, 0), (mipi, 0),
    (quad123, 1.5 * PI), (quad23, PI), (full, 2 * PI),
])
def test_length(interval, want):
    assert interval.length() == want


def test_empty_length_negative():
    assert empty.length() < 0


@pytest.mark.parametrize("interval,inside,outside,i_in,i_out", [
    (empty, [], [0, PI, -PI], [], [PI, -PI]),
    (full, [0, PI, -PI], [], [PI, -PI], []),
    (quad12, [0, PI, -PI], [], [PI / 2], [0, PI, -PI]),
    (quad23, [PI / 2, -PI / 2, PI, -PI], [0], [PI, -PI], [PI / 2, -PI / 2, 0]),
    (pi, [PI, -PI], [0], [], [PI, -PI]),
    (mipi, [PI, -PI], [0], [], [PI, -PI]),
    (zero, [0], [], [], [0]),
])
def test_contains(interval, inside, outside, i_in, i_out):
    for p in inside:
        assert interval.contains(p), (interval.lo, interval.hi, p)
    for p in outside:
        assert not interval.contains(p), (interval.lo, interval.hi, p)
    for p in i_in:
        assert interval.interior_contains(p)
    for p in i_out:
        assert not interval.interior_contains(p)


quad12eps = iv(quad12.lo, mid23.hi)
quad2hi = iv(mid23.lo, quad12.hi)
quad412eps = iv(mid34.lo, quad12.hi)
quadeps12 = iv(mid41.lo, quad12.hi)
quad1lo = iv(quad12.lo, mid41.hi)
quad2lo = iv(quad23.lo, mid12.hi)
quad3hi = iv(mid34.lo, quad23.hi)
quadeps23 = iv(mid12.lo, quad23.hi)
quad23eps = iv(quad23.lo, mid34.hi)
quadeps123 = iv(mid41.lo, quad23.hi)

# (x, y, x_contains_y, x_int_contains_y, x_intersects_y, x_int_intersects_y,
#  union, intersection) — the full table from s1/interval_test.go:179-327.
OPS = [
    (empty, empty, True, True, False, False, empty, empty),
    (empty, full, False, False, False, False, full, empty),
    (empty, zero, False, False, False, False, zero, empty),
    (empty, pi, False, False, False, False, pi, empty),
    (empty, mipi, False, False, False, False, mipi, empty),
    (full, empty, True, True, False, False, full, empty),
    (full, full, True, True, True, True, full, full),
    (full, zero, True, True, True, True, full, zero),
    (full, pi, True, True, True, True, full, pi),
    (full, mipi, True, True, True, True, full, mipi),
    (full, quad12, True, True, True, True, full, quad12),
    (full, quad23, True, True, True, True, full, quad23),
    (zero, empty, True, True, False, False, zero, empty),
    (zero, full, False, False, True, False, full, zero),
    (zero, zero, True, False, True, False, zero, zero),
    (zero, pi, False, False, False, False, iv(0, PI), empty),
    (zero, pi2, False, False, False, False, quad1, empty),
    (zero, mipi, False, False, False, False, quad12, empty),
    (zero, mipi2, False, False, False, False, quad4, empty),
    (zero, quad12, False, False, True, False, quad12, zero),
    (zero, quad23, False, False, False, False, quad123, empty),
    (pi2, empty, True, True, False, False, pi2, empty),
    (pi2, full, False, False, True, False, full, pi2),
    (pi2, zero, False, False, False, False, quad1, empty),
    (pi2, pi, False, False, False, False, iv(PI / 2, PI), empty),
    (pi2, pi2, True, False, True, False, pi2, pi2),
    (pi2, mipi, False, False, False, False, quad2, empty),
    (pi2, mipi2, False, False, False, False, quad23, empty),
    (pi2, quad12, False, False, True, False, quad12, pi2),
    (pi2, quad23, False, False, True, False, quad23, pi2),
    (pi, empty, True, True, False, False, pi, empty),
    (pi, full, False, False, True, False, full, pi),
    (pi, zero, False, False, False, False, iv(PI, 0), empty),
    (pi, pi, True, False, True, False, pi, pi),
    (pi, pi2, False, False, False, False, iv(PI / 2, PI), empty),
    (pi, mipi, True, False, True, False, pi, pi),
    (pi, mipi2, False, False, False, False, quad3, empty),
    (pi, quad12, False, False, True, False, iv(0, PI), pi),
    (pi, quad23, False, False, True, False, quad23, pi),
    (mipi, empty, True, True, False, False, mipi, empty),
    (mipi, full, False, False, True, False, full, mipi),
    (mipi, zero, False, False, False, False, quad34, empty),
    (mipi, pi, True, False, True, False, mipi, mipi),
    (mipi, pi2, False, False, False, False, quad2, empty),
    (mipi, mipi, True, False, True, False, mipi, mipi),
    (mipi, mipi2, False, False, False, False, iv(-PI, -PI / 2), empty),
    (mipi, quad12, False, False, True, False, quad12, mipi),
    (mipi, quad23, False, False, True, False, quad23, mipi),
    (quad12, empty, True, True, False, False, quad12, empty),
    (quad12, full, False, False, True, True, full, quad12),
    (quad12, zero, True, False, True, False, quad12, zero),
    (quad12, pi, True, False, True, False, quad12, pi),
    (quad12, mipi, True, False, True, False, quad12, mipi),
    (quad12, quad12, True, False, True, True, quad12, quad12),
    (quad12, quad23, False, False, True, True, quad123, quad2),
    (quad12, quad34, False, False, True, False, full, quad12),
    (quad23, empty, True, True, False, False, quad23, empty),
    (quad23, full, False, False, True, True, full, quad23),
    (quad23, zero, False, False, False, False, quad234, empty),
    (quad23, pi, True, True, True, True, quad23, pi),
    (quad23, mipi, True, True, True, True, quad23, mipi),
    (quad23, quad12, False, False, True, True, quad123, quad2),
    (quad23, quad23, True, False, True, True, quad23, quad23),
    (quad23, quad34, False, False, True, True, quad234, iv(-PI, -PI / 2)),
    (quad1, quad23, False, False, True, False, quad123, iv(PI / 2, PI / 2)),
    (quad2, quad3, False, False, True, False, quad23, mipi),
    (quad3, quad2, False, False, True, False, quad23, pi),
    (quad2, pi, True, False, True, False, quad2, pi),
    (quad2, mipi, True, False, True, False, quad2, mipi),
    (quad3, pi, True, False, True, False, quad3, pi),
    (quad3, mipi, True, False, True, False, quad3, mipi),
    (quad12, mid12, True, True, True, True, quad12, mid12),
    (mid12, quad12, False, False, True, True, quad12, mid12),
    (quad12, mid23, False, False, True, True, quad12eps, quad2hi),
    (mid23, quad12, False, False, True, True, quad12eps, quad2hi),
    (quad12, mid34, False, False, False, False, quad412eps, empty),
    (mid34, quad12, False, False, False, False, quad412eps, empty),
    (quad12, mid41, False, False, True, True, quadeps12, quad1lo),
    (mid41, quad12, False, False, True, True, quadeps12, quad1lo),
    (quad23, mid12, False, False, True, True, quadeps23, quad2lo),
    (mid12, quad23, False, False, True, True, quadeps23, quad2lo),
    (quad23, mid23, True, True, True, True, quad23, mid23),
    (mid23, quad23, False, False, True, True, quad23, mid23),
    (quad23, mid34, False, False, True, True, quad23eps, quad3hi),
    (mid34, quad23, False, False, True, True, quad23eps, quad3hi),
    (quad23, mid41, False, False, False, False, quadeps123, empty),
    (mid41, quad23, False, False, False, False, quadeps123, empty),
]


@pytest.mark.parametrize("idx", range(len(OPS)))
def test_interval_operations(idx):
    x, y, c, ic, i, ii, want_u, want_i = OPS[idx]
    assert x.contains_interval(y) == c, idx
    assert x.interior_contains_interval(y) == ic, idx
    assert x.intersects(y) == i, idx
    assert x.interior_intersects(y) == ii, idx
    u = x.union(y)
    assert (u.lo, u.hi) == (want_u.lo, want_u.hi), idx
    n = x.intersection(y)
    assert (n.lo, n.hi) == (want_i.lo, want_i.hi), idx


@pytest.mark.parametrize("start,points,want", [
    (empty, [0], zero),
    (empty, [PI], pi),
    (empty, [-PI], mipi),
    (empty, [PI, -PI], pi),
    (empty, [-PI, PI], mipi),
    (empty, [mid12.lo, mid12.hi], mid12),
    (empty, [mid23.lo, mid23.hi], mid23),
    (quad1, [-0.9 * PI, -PI / 2], quad123),
    (full, [0], full),
    (full, [PI], full),
    (full, [-PI], full),
])
def test_add_point(start, points, want):
    got = start
    for p in points:
        got = got.add_point(p)
    assert abs(got.lo - want.lo) <= 1e-15 and abs(got.hi - want.hi) <= 1e-15


@pytest.mark.parametrize("interval,margin,want", [
    (empty, 1, empty),
    (full, 1, full),
    (zero, 1, iv(-1, 1)),
    (mipi, 0.01, iv(PI - 0.01, -PI + 0.01)),
    (pi, 27, full),
    (pi, PI / 2, quad23),
    (pi2, PI / 2, quad12),
    (mipi2, PI / 2, quad34),
    (empty, -1, empty),
    (full, -1, full),
    (quad123, -27, empty),
    (quad234, -27, empty),
    (quad123, -PI / 2, quad2),
    (quad341, -PI / 2, quad4),
    (quad412, -PI / 2, quad1),
])
def test_expanded(interval, margin, want):
    got = interval.expanded(margin)
    assert abs(got.lo - want.lo) <= 1e-15 and abs(got.hi - want.hi) <= 1e-15


# --- R1 interval fixtures (r1/interval_test.go) -----------------------------

r1_unit = R1Interval(0, 1)
r1_neg = R1Interval(-1, 0)
r1_half = R1Interval(0.5, 0.5)
r1_empty = R1Interval.empty()


def test_r1_basics():
    assert r1_empty.is_empty()
    assert not r1_unit.is_empty() and not r1_half.is_empty()
    assert r1_unit.center() == 0.5 and r1_half.center() == 0.5
    assert r1_neg.length() == 1 and r1_half.length() == 0
    assert r1_empty.length() < 0


@pytest.mark.parametrize("x,y,want", [
    (r1_unit, r1_half, r1_half),
    (r1_unit, r1_neg, R1Interval(0, 0)),
    (r1_neg, r1_half, R1Interval.empty()),
    (r1_unit, r1_empty, R1Interval.empty()),
    (r1_empty, r1_unit, R1Interval.empty()),
])
def test_r1_intersection(x, y, want):
    got = x.intersection(y)
    assert got.is_empty() == want.is_empty()
    if not want.is_empty():
        assert (got.lo, got.hi) == (want.lo, want.hi)


@pytest.mark.parametrize("x,y,want", [
    (R1Interval(99, 100), r1_empty, R1Interval(99, 100)),
    (r1_empty, R1Interval(99, 100), R1Interval(99, 100)),
    (R1Interval(5, 3), R1Interval(0, -2), r1_empty),
    (R1Interval(0, -2), R1Interval(5, 3), r1_empty),
    (r1_unit, r1_unit, r1_unit),
    (r1_unit, r1_neg, R1Interval(-1, 1)),
    (r1_neg, r1_unit, R1Interval(-1, 1)),
    (r1_half, r1_unit, r1_unit),
])
def test_r1_union(x, y, want):
    got = x.union(y)
    assert got.is_empty() == want.is_empty()
    if not want.is_empty():
        assert (got.lo, got.hi) == (want.lo, want.hi)


@pytest.mark.parametrize("start,p,want", [
    (r1_empty, 5.0, R1Interval(5, 5)),
    (R1Interval(5, 5), -1.0, R1Interval(-1, 5)),
    (R1Interval(-1, 5), 0.0, R1Interval(-1, 5)),
    (R1Interval(-1, 5), 6.0, R1Interval(-1, 6)),
])
def test_r1_add_point(start, p, want):
    got = start.add_point(p)
    assert (got.lo, got.hi) == (want.lo, want.hi)


@pytest.mark.parametrize("interval,margin,want", [
    (r1_empty, 0.45, r1_empty),
    (r1_unit, 0.5, R1Interval(-0.5, 1.5)),
])
def test_r1_expanded(interval, margin, want):
    got = interval.expanded(margin)
    assert got.is_empty() == want.is_empty()
    if not want.is_empty():
        assert (got.lo, got.hi) == (want.lo, want.hi)
