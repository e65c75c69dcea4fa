"""Decoded S2 cell with geometry (uv rect, vertices, edges, bounds).

Semantics: /root/reference/s2/cell.go. Driver-side only — the engine never
materializes Cells per data row; they exist for coverer callbacks and
polygon/tile preparation.
"""

from __future__ import annotations

import math

import numpy as np

from ..kernels import hilbert as H
from ..kernels import projection as PJ
from . import _vec as V
from .cap import Cap
from .interval import R1Interval, S1Interval
from .metric import average_area
from .rect import Rect, VALID_LAT

MAX_ERROR = 1.0 / (1 << 51)
POLE_MIN_LAT = math.asin(math.sqrt(1.0 / 3))
M_PI_2 = math.pi / 2
M_PI_4 = math.pi / 4

# uAxis/vAxis z-components per face (stuv.go:170-202)
_U_AXIS_Z = (0.0, 0.0, 0.0, -1.0, -1.0, 0.0)
_V_AXIS_Z = (1.0, 1.0, 0.0, 0.0, 0.0, 0.0)

MAX_SIZE_F = float(1 << 30)


def _st_to_uv(s: float) -> float:
    """Scalar stToUV (stuv.go:28-33)."""
    if s >= 0.5:
        return (1.0 / 3.0) * (4.0 * s * s - 1.0)
    return (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))


def _u_norm(face: int, u: float):
    """stuv.go:133-148."""
    return [
        (u, -1.0, 0.0), (1.0, u, 0.0), (1.0, 0.0, u),
        (-u, 0.0, 1.0), (0.0, -u, 1.0), (0.0, -1.0, -u),
    ][face]


def _v_norm(face: int, v: float):
    """stuv.go:153-168."""
    return [
        (-v, 0.0, 1.0), (0.0, -v, 1.0), (0.0, -1.0, -v),
        (v, -1.0, 0.0), (1.0, v, 0.0), (1.0, 0.0, v),
    ][face]


def _face_uv_to_xyz(face: int, u: float, v: float):
    """stuv.go:108-123 (scalar)."""
    return [
        (1.0, u, v), (-u, 1.0, v), (-u, -v, 1.0),
        (-1.0, -v, -u), (v, -1.0, -u), (v, u, -1.0),
    ][face]


class Cell:
    __slots__ = ("id", "face", "level", "orientation", "u_lo", "u_hi", "v_lo", "v_hi")

    def __init__(self, cell_id: int):
        self.id = int(cell_id)
        f, i, j, o = H.face_ij_orientation_scalar(self.id)
        self.face = f
        self.orientation = o
        self.level = H.level_scalar(self.id)
        # ijLevelToBoundUV (cellid.go:515-530), scalar
        cell_size = 1 << (30 - self.level)
        x_lo = i & -cell_size
        y_lo = j & -cell_size
        self.u_lo = _st_to_uv(x_lo / MAX_SIZE_F)
        self.u_hi = _st_to_uv((x_lo + cell_size) / MAX_SIZE_F)
        self.v_lo = _st_to_uv(y_lo / MAX_SIZE_F)
        self.v_hi = _st_to_uv((y_lo + cell_size) / MAX_SIZE_F)

    @staticmethod
    def from_latlng_deg(lat: float, lng: float) -> "Cell":
        return Cell(int(PJ.cellid_from_latlng(np.array([lat]), np.array([lng]))[0]))

    @staticmethod
    def from_face(face: int) -> "Cell":
        return Cell((face << 61) | (1 << 60))

    def is_leaf(self) -> bool:
        return self.level == 30

    def children(self) -> list[int]:
        if self.is_leaf():
            return []
        return H.children_scalar(self.id)

    def child_cells(self) -> list["Cell"]:
        return [Cell(c) for c in self.children()]

    def _uv_vertex(self, k: int):
        """CCW in UV plane: (lo,lo),(hi,lo),(hi,hi),(lo,hi) (r2/rect.go:70-77)."""
        return [
            (self.u_lo, self.v_lo), (self.u_hi, self.v_lo),
            (self.u_hi, self.v_hi), (self.u_lo, self.v_hi),
        ][k]

    def vertex_raw(self, k: int):
        u, v = self._uv_vertex(k)
        return _face_uv_to_xyz(self.face, u, v)

    def vertex(self, k: int):
        return V.normalize(self.vertex_raw(k))

    def edge_raw(self, k: int):
        """Inward normal of edge k (cell.go:169-180)."""
        if k == 0:
            return _v_norm(self.face, self.v_lo)
        if k == 1:
            return _u_norm(self.face, self.u_hi)
        if k == 2:
            return V.neg(_v_norm(self.face, self.v_hi))
        return V.neg(_u_norm(self.face, self.u_lo))

    def center_raw(self):
        # faceSiTi center delta (cellid.go:373-384), scalar
        f, i, j, _ = H.face_ij_orientation_scalar(self.id)
        if self.id & 1:
            delta = 1
        else:
            delta = 2 if ((i ^ (self.id >> 2)) & 1) else 0
        si, ti = 2 * i + delta, 2 * j + delta
        u = _st_to_uv((0.5 / (1 << 30)) * si)
        v = _st_to_uv((0.5 / (1 << 30)) * ti)
        return _face_uv_to_xyz(self.face, u, v)

    def center(self):
        return V.normalize(self.center_raw())

    def average_area(self) -> float:
        return average_area(self.level)

    def exact_area(self) -> float:
        from ..kernels.predicates import point_area

        v = [self.vertex(k) for k in range(4)]
        return point_area(v[0], v[1], v[2]) + point_area(v[0], v[2], v[3])

    def approx_area(self) -> float:
        """cell.go:66-88."""
        if self.level < 2:
            return self.average_area()
        v = [self.vertex(k) for k in range(4)]
        flat_area = 0.5 * V.norm(V.cross(V.sub(v[2], v[0]), V.sub(v[3], v[1])))
        return flat_area * 2 / (1 + math.sqrt(1 - min(flat_area / math.pi, 1.0)))

    def contains_point(self, p) -> bool:
        """Boundary-inclusive face-uv box test (cell.go:205-215)."""
        coords = (p[0], p[1], p[2])
        f = self.face
        if f < 3:
            if coords[f] <= 0:
                return False
        else:
            if coords[f - 3] >= 0:
                return False
        # validFaceXYZToUV (stuv.go:68-82)
        x, y, z = coords
        u, v = [
            lambda: (y / x, z / x), lambda: (-x / y, z / y), lambda: (-x / z, -y / z),
            lambda: (z / x, y / x), lambda: (z / y, -x / y), lambda: (-y / z, -x / z),
        ][f]()
        return self.u_lo <= u <= self.u_hi and self.v_lo <= v <= self.v_hi

    def contains_cell(self, other: "Cell") -> bool:
        lsb = self.id & (-self.id)
        return self.id - (lsb - 1) <= other.id <= self.id + (lsb - 1)

    def may_intersect_cell(self, other: "Cell") -> bool:
        lsb_a = self.id & (-self.id)
        lsb_b = other.id & (-other.id)
        return (other.id - (lsb_b - 1) <= self.id + (lsb_a - 1)
                and other.id + (lsb_b - 1) >= self.id - (lsb_a - 1))

    def _latitude(self, i: int, j: int) -> float:
        u = self.u_lo if i == 0 else self.u_hi
        v = self.v_lo if j == 0 else self.v_hi
        return V.latitude(_face_uv_to_xyz(self.face, u, v))

    def _longitude(self, i: int, j: int) -> float:
        u = self.u_lo if i == 0 else self.u_hi
        v = self.v_lo if j == 0 else self.v_hi
        return V.longitude(_face_uv_to_xyz(self.face, u, v))

    def rect_bound(self) -> Rect:
        """cell.go:217-289."""
        if self.level > 0:
            u = self.u_lo + self.u_hi
            v = self.v_lo + self.v_hi
            i = int(u < 0) if _U_AXIS_Z[self.face] == 0 else int(u > 0)
            j = int(v < 0) if _V_AXIS_Z[self.face] == 0 else int(v > 0)
            lat = R1Interval.from_point_pair(self._latitude(i, j), self._latitude(1 - i, 1 - j))
            lat = lat.expanded(MAX_ERROR).intersection(VALID_LAT)
            if lat.lo == -M_PI_2 or lat.hi == M_PI_2:
                return Rect(lat, S1Interval.full())
            lng = S1Interval.from_point_pair(self._longitude(i, 1 - j), self._longitude(1 - i, j))
            return Rect(lat, lng.expanded(MAX_ERROR))
        return [
            Rect(R1Interval(-M_PI_4, M_PI_4), S1Interval(-M_PI_4, M_PI_4)),
            Rect(R1Interval(-M_PI_4, M_PI_4), S1Interval(M_PI_4, 3 * M_PI_4)),
            Rect(R1Interval(POLE_MIN_LAT, M_PI_2), S1Interval(-math.pi, math.pi)),
            Rect(R1Interval(-M_PI_4, M_PI_4), S1Interval(3 * M_PI_4, -3 * M_PI_4)),
            Rect(R1Interval(-M_PI_4, M_PI_4), S1Interval(-3 * M_PI_4, -M_PI_4)),
            Rect(R1Interval(-M_PI_2, -POLE_MIN_LAT), S1Interval(-math.pi, math.pi)),
        ][self.face]

    def cap_bound(self) -> Cap:
        """cell.go:98-114."""
        u = 0.5 * (self.u_lo + self.u_hi)
        v = 0.5 * (self.v_lo + self.v_hi)
        cap = Cap(V.normalize(_face_uv_to_xyz(self.face, u, v)), 0.0)
        for k in range(4):
            cap.add_point(self.vertex(k))
        return cap

    def __repr__(self) -> str:
        return f"Cell({H.to_string(self.id)})"
