"""Cell-face and st/uv fixtures ported from the reference's
s2/cell_test.go (TestCellFaces) and s2/stuv_test.go."""

import math

import numpy as np

from gos2_spark.geometry.cell import Cell, _u_norm, _v_norm
from gos2_spark.kernels import projection as PJ


def _f64_eq(a, b):
    return abs(a - b) <= 1e-14


def _norm(v):
    v = np.asarray(v, dtype=np.float64)
    return v / math.sqrt(float(v @ v))


def test_cell_faces():
    """cell_test.go:449-504: face-cell structure + edge/vertex incidence
    (each cube edge shared by 2 faces, each vertex by 3)."""
    edge_counts: dict = {}
    vertex_counts: dict = {}
    for face in range(6):
        cell = Cell.from_face(face)
        assert cell.face == face
        assert cell.level == 0
        assert cell.orientation == (face & 0x01)  # swapMask alternation
        assert not cell.is_leaf()
        for k in range(4):
            v = np.asarray(cell.vertex(k), dtype=np.float64)
            v_next = np.asarray(cell.vertex((k + 1) & 3), dtype=np.float64)
            e = _norm(cell.edge_raw(k))
            edge_counts[tuple(np.round(e, 12))] = (
                edge_counts.get(tuple(np.round(e, 12)), 0) + 1
            )
            vertex_counts[tuple(np.round(v, 12))] = (
                vertex_counts.get(tuple(np.round(v, 12)), 0) + 1
            )
            assert _f64_eq(float(v @ e), 0.0)
            assert _f64_eq(float(v_next @ e), 0.0)
            assert _f64_eq(float(_norm(np.cross(v, v_next)) @ e), 1.0)
    assert all(c == 2 for c in edge_counts.values()), edge_counts
    assert all(c == 3 for c in vertex_counts.values()), vertex_counts


def test_stuv_roundtrip_exact():
    """stuv_test.go:7-14 — exact float roundtrips at .125."""
    assert float(PJ.st_to_uv(PJ.uv_to_st(np.array([0.125])))[0]) == 0.125
    assert float(PJ.uv_to_st(PJ.st_to_uv(np.array([0.125])))[0]) == 0.125


def test_uv_norms_orthogonal():
    """stuv_test.go:16-29 — uNorm/vNorm orthogonal to their face lines."""
    xs = np.arange(-1.0, 1.0 + 1e-12, 1 / 64.0)  # reference steps 1/1024; 1/64 keeps it fast
    for face in range(6):
        for x in xs:
            a = np.array(PJ.face_uv_to_xyz(
                np.array([face]), np.array([x]), np.array([-1.0])
            )).ravel()
            b = np.array(PJ.face_uv_to_xyz(
                np.array([face]), np.array([x]), np.array([1.0])
            )).ravel()
            n = np.asarray(_u_norm(face, float(x)), dtype=np.float64)
            c = np.cross(a, b)
            ang = math.atan2(
                math.sqrt(float(np.cross(c, n) @ np.cross(c, n))), float(c @ n)
            )
            assert _f64_eq(ang, 0.0), (face, x, "u")
            a = np.array(PJ.face_uv_to_xyz(
                np.array([face]), np.array([-1.0]), np.array([x])
            )).ravel()
            b = np.array(PJ.face_uv_to_xyz(
                np.array([face]), np.array([1.0]), np.array([x])
            )).ravel()
            n = np.asarray(_v_norm(face, float(x)), dtype=np.float64)
            c = np.cross(a, b)
            ang = math.atan2(
                math.sqrt(float(np.cross(c, n) @ np.cross(c, n))), float(c @ n)
            )
            assert _f64_eq(ang, 0.0), (face, x, "v")
