"""Robust predicate parity tests (fixtures from point_test.go / edgeutil_test.go)."""

import math

import numpy as np

from gos2_spark.kernels import predicates as PR


def _norm(x, y, z):
    n = math.sqrt(x * x + y * y + z * z)
    return (x / n, y / n, z / n)


# point_test.go:234-307 — 13 symbolic-perturbation ladder matrices.
SYMBOLIC_CASES = [
    ((-3, -1, 0), (-2, 1, 0), (1, -2, 0), 1),
    ((-6, 3, 3), (-4, 2, -1), (-2, 1, 4), 1),
    ((0, -1, -1), (0, 1, -2), (0, 2, 1), 1),
    ((-1, 2, 7), (2, 1, -4), (4, 2, -8), 1),
    ((-4, -2, 7), (2, 1, -4), (4, 2, -8), 1),
    ((0, -5, 7), (0, -4, 8), (0, -2, 4), 1),
    ((-5, -2, 7), (0, 0, -2), (0, 0, -1), 1),
    ((0, -2, 7), (0, 0, 1), (0, 0, 2), 1),
    ((-3, 1, 7), (-1, -4, 1), (0, 0, 0), 1),
    ((-6, -4, 7), (-3, -2, 1), (0, 0, 0), 1),
    ((0, -4, 7), (0, -2, 1), (0, 0, 0), -1),
    ((-1, -4, 5), (0, 0, -3), (0, 0, 0), -1),
    ((0, -4, 5), (0, 0, -5), (0, 0, 0), 1),
]


def test_symbolic_perturbation_ladder():
    for a, b, c, want in SYMBOLIC_CASES:
        # all 6 permutations with matching parity (point_test.go:289-330)
        assert PR.expensive_ccw(a, b, c) == want
        assert PR.expensive_ccw(b, c, a) == want
        assert PR.expensive_ccw(c, a, b) == want
        assert PR.expensive_ccw(c, b, a) == -want
        assert PR.expensive_ccw(b, a, c) == -want
        assert PR.expensive_ccw(a, c, b) == -want


def test_colinear_points():
    # point_test.go:155-222 — exactly-collinear triples must be resolved
    # consistently (never 0) by the robust pipeline.
    a = (0.72571927877036835, 0.46058825605889098, 0.51106749730504852)
    b = (0.7257192746638208, 0.46058826573818168, 0.51106749441312738)
    c = (0.72571927671709457, 0.46058826089853633, 0.51106749585908795)
    r = PR.robust_ccw(a, b, c)
    assert r != 0
    assert r == PR.robust_ccw(b, c, a)
    assert r == -PR.robust_ccw(c, b, a)

    x1 = _norm(0.99999999999999989, 1.4901161193847655e-08, 0)
    x2 = _norm(1, 1.4901161193847656e-08, 0)
    nx1 = tuple(-v for v in x1)
    r = PR.robust_ccw(x1, x2, nx1)
    assert r != 0
    assert r == PR.robust_ccw(x2, nx1, x1)
    assert r == -PR.robust_ccw(nx1, x2, x1)

    x3 = _norm(1, 1, 1)
    x4 = tuple(v * 0.99999999999999989 for v in x3)
    nx3 = tuple(-v for v in x3)
    assert PR.robust_ccw(x3, x4, nx3) != 0


def test_simple_crossing_cases():
    # Two clearly crossing great-circle edges.
    a, b = _norm(1, 0, 0.1), _norm(0, 1, -0.1)
    c, d = _norm(0.6, 0.6, 0.5), _norm(0.6, 0.6, -0.5)
    assert PR.robust_crossing(a, b, c, d) == 1
    assert PR.edge_or_vertex_crossing(a, b, c, d)
    # Disjoint edges.
    e, f = _norm(-1, 0, 0.1), _norm(0, -1, 0.1)
    assert PR.robust_crossing(a, b, e, f) == -1
    # Shared vertex -> 0 from robust_crossing.
    assert PR.robust_crossing(a, b, b, d) == 0


def test_vertex_crossing_shared_vertex():
    a, b = _norm(1, 0, 0.1), _norm(0, 1, -0.1)
    d = _norm(0.6, 0.6, -0.5)
    # edge AB vs edge BD share vertex b
    got = PR.edge_or_vertex_crossing(a, b, b, d)
    assert isinstance(got, (bool, np.bool_))


def _regular_loop(lat0, lng0, radius_deg, n):
    """CCW circle of n vertices around (lat0, lng0) — test helper."""
    from gos2_spark.kernels import projection as P

    center = np.array(P.latlng_to_xyz(math.radians(lat0), math.radians(lng0)))
    # tangent frame
    zax = center
    xax = np.array(PR.ortho(tuple(zax)))
    yax = np.cross(zax, xax)
    r = math.radians(radius_deg)
    verts = []
    for k in range(n):
        t = 2 * math.pi * k / n
        v = (
            math.cos(r) * zax
            + math.sin(r) * (math.cos(t) * xax + math.sin(t) * yax)
        )
        verts.append(v / np.linalg.norm(v))
    return np.array(verts)


def _loop_contains_scalar(p, verts, origin_inside):
    """Direct scalar port of Loop.Contains inner loop — oracle for the
    vectorized kernel."""
    inside = origin_inside
    m = len(verts)
    for i in range(m):
        c = tuple(verts[i])
        d = tuple(verts[(i + 1) % m])
        if PR.edge_or_vertex_crossing(tuple(PR.ORIGIN), tuple(p), c, d):
            inside = not inside
    return inside


def test_batch_containment_matches_scalar_oracle():
    rng = np.random.default_rng(42)
    verts = _regular_loop(40.0, -74.0, 5.0, 16)
    # random points clustered near the loop boundary + far away
    lat = 40.0 + rng.uniform(-8, 8, 300)
    lng = -74.0 + rng.uniform(-8, 8, 300)
    from gos2_spark.kernels import projection as P

    x, y, z = P.latlng_to_xyz(np.radians(lat), np.radians(lng))
    pts = np.stack([x, y, z], axis=1)
    for origin_inside in (False, True):
        got = PR.contains_points_in_loop(pts, verts, origin_inside)
        want = np.array(
            [_loop_contains_scalar(pts[i], verts, origin_inside) for i in range(len(pts))]
        )
        assert (got == want).all()


def test_batch_containment_point_on_vertex():
    verts = _regular_loop(10.0, 20.0, 3.0, 8)
    pts = verts[:3]  # query points exactly equal to loop vertices
    got = PR.contains_points_in_loop(pts, verts, False)
    want = np.array([_loop_contains_scalar(p, verts, False) for p in pts])
    assert (got == want).all()


def test_distance_to_edges():
    # edgeutil_test.go:117-168 style checks.
    a = _norm(1, 0, 0)
    b = _norm(0, 1, 0)
    x = np.array([_norm(1, 1, 0)])  # midpoint of the edge: distance 0
    assert PR.distance_to_edges(x, a, b)[0] < 1e-15
    x = np.array([_norm(1, 1, 1)])
    assert abs(PR.distance_to_edges(x, a, b)[0] - math.asin(math.sqrt(1.0 / 3))) < 1e-15
    x = np.array([_norm(-1, -1, 0)])  # antipode of midpoint: closest endpoint
    assert abs(PR.distance_to_edges(x, a, b)[0] - 0.75 * math.pi) < 1e-15
    # beyond endpoint b
    x = np.array([_norm(-1, 1, 0)])
    assert abs(PR.distance_to_edges(x, a, b)[0] - math.pi / 4) < 1e-12


def test_point_area():
    # point_test.go:333-389 core cases.
    p000 = _norm(1, 0, 0)
    p045 = _norm(1, 1, 0)
    p090 = _norm(0, 1, 0)
    pz = _norm(0, 0, 1)
    eps = 1e-10
    assert abs(PR.point_area(p000, p090, pz) - math.pi / 2) < eps
    # spherical triangle pole-equator spanning 135 deg of longitude: area 3pi/4
    assert abs(PR.point_area(p045, pz, p180()) - 3 * math.pi / 4) < eps


def p180():
    return (-1.0, 0.0, 0.0)


def test_ordered_ccw():
    a = _norm(1, 0, 0)
    b = _norm(1, 1, 0)
    c = _norm(0, 1, 0)
    o = _norm(0, 0, 1)
    assert PR.ordered_ccw(a, b, c, o)
    assert not PR.ordered_ccw(c, b, a, o) or PR.ordered_ccw(a, b, c, o)
