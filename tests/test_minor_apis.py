"""Fixture-backed tests for the round-2 minor API ports:

- ClosestPoint(WithNormal)  (edgeutil.go:108-127; fixtures
  edgeutil_test.go:117-168 TestDistanceToEdge rows)
- uAxis/vAxis/faceNorm/uNorm/vNorm  (stuv.go:125-202)
- Loop.IsValid / AreLoopsValid  (loop.go:90-135, polygon.go:315-340)
- Polygon.IsNormalized / Parent  (polygon.go:341-380)
- s1.Angle E5/E6/E7  (s1/angle.go:12-46)
"""

import math

import numpy as np
import pytest

from gos2_spark.geometry import Angle, Loop, Polygon, are_loops_valid
from gos2_spark.kernels import predicates as PR
from gos2_spark.kernels import projection as PJ


def _n(x, y, z):
    v = np.array([x, y, z], dtype=np.float64)
    v = v / np.linalg.norm(v)
    return (float(v[0]), float(v[1]), float(v[2]))


# The TestDistanceToEdge table (edgeutil_test.go:117-143): (x, a, b,
# distance_radians, expected_closest); (0,0,0) means "either endpoint".
CLOSEST_FIXTURES = [
    ((1, 0, 0), (1, 0, 0), (0, 1, 0), 0.0, (1, 0, 0)),
    ((0, 1, 0), (1, 0, 0), (0, 1, 0), 0.0, (0, 1, 0)),
    ((1, 3, 0), (1, 0, 0), (0, 1, 0), 0.0, (1, 3, 0)),
    ((0, 0, 1), (1, 0, 0), (0, 1, 0), math.pi / 2, (1, 0, 0)),
    ((0, 0, -1), (1, 0, 0), (0, 1, 0), math.pi / 2, (1, 0, 0)),
    ((-1, -1, 0), (1, 0, 0), (0, 1, 0), 0.75 * math.pi, (0, 0, 0)),
    ((0, 1, 0), (1, 0, 0), (1, 1, 0), math.pi / 4, (1, 1, 0)),
    ((0, -1, 0), (1, 0, 0), (1, 1, 0), math.pi / 2, (1, 0, 0)),
    ((0, -1, 0), (1, 0, 0), (-1, 1, 0), math.pi / 2, (1, 0, 0)),
    ((-1, -1, 0), (1, 0, 0), (-1, 1, 0), math.pi / 2, (-1, 1, 0)),
    ((1, 1, 1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(1.0 / 3)), (1, 1, 0)),
    ((1, 1, -1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(1.0 / 3)), (1, 1, 0)),
    ((-1, 0, 0), (1, 1, 0), (1, 1, 0), 0.75 * math.pi, (1, 1, 0)),
    ((0, 0, -1), (1, 1, 0), (1, 1, 0), math.pi / 2, (1, 1, 0)),
    ((-1, 0, 0), (1, 0, 0), (1, 0, 0), math.pi, (1, 0, 0)),
]


@pytest.mark.parametrize("x,a,b,dist,want", CLOSEST_FIXTURES)
def test_closest_point_fixtures(x, a, b, dist, want):
    x, a, b = _n(*x), _n(*a), _n(*b)
    got = PR.closest_point(x, a, b)
    gd = PR.distance_to_edges(np.array([x]), a, b)[0]
    assert abs(gd - dist) <= 1e-14
    if want == (0, 0, 0):
        assert got == a or got == b
    else:
        # the Go fixture compares with Point.ApproxEqual — an ANGLE
        # comparison — because interior answers are the unnormalized
        # plane projection; mirror that
        want = _n(*want)
        gn = np.asarray(got) / np.linalg.norm(got)
        assert np.arccos(np.clip(gn @ np.asarray(want), -1, 1)) < 1e-12


def test_closest_points_batch_matches_scalar():
    rng = np.random.default_rng(5)
    X = rng.normal(size=(200, 3))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    a, b = _n(1, 0.2, 0.1), _n(0.1, 1, -0.3)
    batch = PR.closest_points_to_edge(X, a, b)
    for i in range(len(X)):
        scalar = PR.closest_point(tuple(X[i]), a, b)
        assert np.linalg.norm(batch[i] - np.array(scalar)) < 1e-14


# --- face frame accessors ----------------------------------------------------

def test_face_frame_right_handed():
    for f in range(6):
        u = PJ.u_axis(f)
        v = PJ.v_axis(f)
        n = PJ.face_norm(f)
        assert np.allclose(np.cross(u, v), n)
        assert np.allclose(np.linalg.norm(u), 1)
        assert np.allclose(np.linalg.norm(v), 1)


def test_u_v_norm_perpendicular_to_edge():
    faces = np.repeat(np.arange(6), 3)
    uu = np.tile(np.array([-0.4, 0.0, 0.7]), 6)
    for vv in (-0.9, 0.2, 0.8):
        un = PJ.u_norm(faces, uu)
        # every point on the constant-u edge is perpendicular to u_norm
        x, y, z = PJ.face_uv_to_xyz(faces, uu, np.full_like(uu, vv))
        assert np.abs(un[:, 0] * x + un[:, 1] * y + un[:, 2] * z).max() < 1e-15
        vn = PJ.v_norm(faces, np.full_like(uu, vv))
        x, y, z = PJ.face_uv_to_xyz(faces, uu, np.full_like(uu, vv))
        assert np.abs(vn[:, 0] * x + vn[:, 1] * y + vn[:, 2] * z).max() < 1e-15


# --- loop / polygon validation ----------------------------------------------

def test_loop_is_valid():
    assert Loop.regular(10.0, 20.0, 5.0, 16).is_valid()
    assert not Loop([(1.0, 0.0, 0.0), (0.0, 1.0, 0.0)]).is_valid()  # < 3
    assert not Loop([(1.0, 0.0, 0.0), (0.0, 2.0, 0.0), (0.0, 0.0, 1.0)]).is_valid()  # non-unit
    dup = _n(1, 0, 0)
    assert not Loop([dup, _n(0, 1, 0), dup, _n(0, 0, 1)]).is_valid()  # dup vertex
    # bowtie: edges 1 and 3 cross
    from gos2_spark.geometry.loop import Loop as L

    bow = L.from_latlngs_deg([(0.0, 0.0), (0.0, 10.0), (10.0, 0.0), (10.0, 10.0)])
    assert not bow.is_valid()


def test_are_loops_valid():
    shell = Loop.regular(0.0, 0.0, 10.0, 12)
    hole = Loop.regular(0.0, 0.0, 2.0, 8)
    assert are_loops_valid([shell, hole])
    # duplicate directed edge (same loop twice)
    assert not are_loops_valid([shell, Loop(list(shell.vertices))])
    # crossing loops
    other = Loop.regular(5.0, 0.0, 10.0, 12)
    assert not are_loops_valid([shell, other])
    # non-normalized (inverted) loop covers more than half the sphere
    inv = Loop(list(shell.vertices))
    inv.invert()
    assert not are_loops_valid([inv])


def test_polygon_parent_and_is_normalized():
    shell = Loop.regular(0.0, 0.0, 10.0, 12)
    hole = Loop.regular(0.0, 0.0, 2.0, 8)
    p = Polygon([shell, hole])
    shells = [i for i, l in enumerate(p.loops) if l.depth == 0]
    holes = [i for i, l in enumerate(p.loops) if l.depth == 1]
    assert len(shells) == 1 and len(holes) == 1
    assert p.parent(shells[0]) == -1
    assert p.parent(holes[0]) == shells[0]
    assert p.is_normalized()
    # child sharing two vertices with its parent -> not normalized
    bad_child = Loop([shell.vertices[0], shell.vertices[1], _n(0.9, 0.05, 0.05)])
    q = Polygon.from_loop(shell)
    q.loops.append(bad_child)
    bad_child.depth = 1
    assert not q.is_normalized()


# --- s1.Angle ----------------------------------------------------------------

def test_angle_codecs():
    a = Angle.from_degrees(40.7128)
    assert a.e5() == 4071280
    assert a.e6() == 40712800
    assert a.e7() == 407128000
    assert abs(Angle.from_e7(-740060000).degrees() + 74.006) < 1e-9
    assert Angle.from_e5(123).e5() == 123
    # the reference truncates toward zero (s1/angle.go:27-32, "TODO:
    # Check rounding") — a negative value can lose one ulp on round-trip;
    # parity means reproducing that
    assert Angle.from_e6(-987654).e6() == -987653
    # truncation toward zero, like Go int32(float64)
    assert Angle.from_degrees(0.000014999).e5() == 1
    assert Angle.from_degrees(-0.000014999).e5() == -1
    assert Angle.from_radians(-1.0).abs().radians() == 1.0
    assert abs(Angle.from_radians(-math.pi / 2).normalized().radians()
               - 1.5 * math.pi) < 1e-15
    assert abs(Angle.from_degrees(180.0).radians() - math.pi) < 1e-15


# --- point frames + r3 matrix helpers (point.go:440-449, r3/matrix.go) -------

def test_ortho_orthogonal_and_unit():
    from gos2_spark.geometry import _vec as V
    # the reference's TestOrtho axes plus skew vectors (r3/vector_test.go:229-243)
    for v in [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 1), (0.3, -0.7, 0.2),
              (-3, 2, 9)]:
        u = V.ortho(v)
        assert abs(V.dot(v, u)) < 1e-14 * max(1.0, V.norm(v))
        assert abs(V.norm(u) - 1.0) < 1e-14
        # fixed-offset construction, matching r3/vector.go:102 exactly
        want = V.normalize(V.cross(v, (0.012, 0.0053, 0.00457)))
        assert u == want


def test_frame_from_point_orthonormal_right_handed():
    from gos2_spark.geometry import _vec as V
    for z in [(0, 0, 1), (1, 0, 0), (0.26726124, 0.53452248, 0.80178373)]:
        z = V.normalize(z)
        m = V.frame_from_point(z)
        c0, c1, c2 = (V.col(m, i) for i in range(3))
        assert c2 == z
        # orthonormal
        for a, b in [(c0, c1), (c0, c2), (c1, c2)]:
            assert abs(V.dot(a, b)) < 1e-14
        for c in (c0, c1):
            assert abs(V.norm(c) - 1.0) < 1e-14
        # right-handed: c0 x c1 == c2
        assert V.distance(V.cross(c0, c1), c2) < 1e-14
        # frame axes map to world axes: M * e_i == col_i
        for i, e in enumerate([(1, 0, 0), (0, 1, 0), (0, 0, 1)]):
            assert V.distance(V.point_from_frame(m, e), V.col(m, i)) < 1e-15


def test_point_frame_roundtrip():
    from gos2_spark.geometry import _vec as V
    z = V.normalize((0.2, -0.5, 0.84))
    m = V.frame_from_point(z)
    for q in [(1, 0, 0), (0.5, 0.5, 0.70710678), (-0.1, 0.9, 0.42)]:
        q = V.normalize(q)
        back = V.point_to_frame(m, V.point_from_frame(m, q))
        assert V.distance(back, q) < 1e-15
    # matrix helpers agree with the reference's definitions
    mt = V.transpose(m)
    assert V.transpose(mt) == m
    assert V.matrix_from_cols(V.col(m, 0), V.col(m, 1), V.col(m, 2)) == m
