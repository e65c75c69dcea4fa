"""Simple spherical polygon (single CCW vertex chain).

Semantics: /root/reference/s2/loop.go. Driver-side object: loops are the
broadcast build side of the spatial join; per-row containment runs through
the vectorized kernel (kernels.predicates.contains_points_in_loop) seeded
with this object's ``origin_inside`` and vertex array.
"""

from __future__ import annotations

import math

import numpy as np

from ..kernels import predicates as PR
from . import _vec as V
from .cap import Cap
from .interval import R1Interval, S1Interval
from .rect import Rect

_MAX_LENGTH = math.pi - 1e-5  # GetSurfaceIntegral stability bound (loop.go:255)


class Loop:
    def __init__(self, vertices, depth: int = 0):
        """vertices: sequence of unit xyz tuples, CCW chain (not closed)."""
        self.vertices = [tuple(map(float, v)) for v in vertices]
        self.depth = depth
        self.bound = Rect.full()
        self.origin_inside = False
        self._init_origin()
        self._init_bound()

    # --- constructors ------------------------------------------------------

    @staticmethod
    def from_latlngs_deg(latlngs) -> "Loop":
        return Loop([V.from_degrees(lat, lng) for lat, lng in latlngs])

    @staticmethod
    def from_cell(cell) -> "Loop":
        loop = Loop.__new__(Loop)
        loop.vertices = [cell.vertex(k) for k in range(4)]
        loop.depth = 0
        loop.bound = cell.rect_bound()
        loop.origin_inside = False
        loop._init_origin()
        loop._init_bound()
        return loop

    @staticmethod
    def regular(lat_deg: float, lng_deg: float, radius_deg: float, num_vertices: int) -> "Loop":
        """Regular CCW loop around a center (loop_test.go:644-655 analogue)."""
        center = V.from_degrees(lat_deg, lng_deg)
        xax = PR.ortho(center)
        yax = V.cross(center, xax)
        r = math.radians(radius_deg)
        verts = []
        for k in range(num_vertices):
            t = 2 * math.pi * k / num_vertices
            p = V.add(
                V.mul(center, math.cos(r)),
                V.add(V.mul(xax, math.sin(r) * math.cos(t)), V.mul(yax, math.sin(r) * math.sin(t))),
            )
            verts.append(V.normalize(p))
        return Loop(verts)

    # --- accessors ---------------------------------------------------------

    def vertex(self, i: int):
        """Wrapping accessor (loop.go:390-396)."""
        n = len(self.vertices)
        return self.vertices[i - n] if i >= n else self.vertices[i]

    def num_vertices(self) -> int:
        return len(self.vertices)

    def is_hole(self) -> bool:
        return (self.depth & 1) != 0

    def sign(self) -> int:
        return -1 if self.is_hole() else 1

    def vertices_array(self) -> np.ndarray:
        return np.array(self.vertices, dtype=np.float64)

    # --- construction invariants ------------------------------------------

    def _init_origin(self) -> None:
        """loop.go:327-350."""
        self.origin_inside = False
        v1_inside = PR.ordered_ccw(
            PR.ortho(self.vertex(1)), self.vertex(0), self.vertex(2), self.vertex(1)
        )
        if v1_inside != self.contains(self.vertex(1)):
            self.origin_inside = True

    def _init_bound(self) -> None:
        """loop.go:352-385 (RectBounder + pole containment fixups)."""
        bound = Rect.empty()
        prev = None
        prev_ll = None
        for i in range(len(self.vertices) + 1):
            b = self.vertex(i % len(self.vertices)) if i >= len(self.vertices) else self.vertex(i)
            ll = (V.latitude(b), V.longitude(b))
            if bound.is_empty():
                bound = bound.add_point_rad(*ll)
            else:
                # edgeutil.go:291-331 (RectBounder.AddPoint)
                bound = bound.union(
                    Rect(
                        R1Interval.from_point_pair(prev_ll[0], ll[0]),
                        S1Interval.from_point_pair(prev_ll[1], ll[1]),
                    )
                )
                a_cross_b = PR._point_cross(prev, b)
                direction = V.cross(a_cross_b, (0.0, 0.0, 1.0))
                da = V.dot(direction, prev)
                db = V.dot(direction, b)
                if da * db < 0:
                    abslat = math.acos(abs(a_cross_b[2] / V.norm(a_cross_b)))
                    lat = bound.lat
                    if da < 0:
                        lat = R1Interval(lat.lo, max(abslat, lat.hi))
                    else:
                        lat = R1Interval(min(-abslat, lat.lo), lat.hi)
                    lng = bound.lng
                    if abslat >= math.pi / 2 - 1e-15:
                        lng = S1Interval.full()
                    bound = Rect(lat, lng)
            prev, prev_ll = b, ll

        self.bound = Rect.full()
        if self.contains((0.0, 0.0, 1.0)):
            bound = Rect(R1Interval(bound.lat.lo, math.pi / 2), S1Interval.full())
        if bound.lng.is_full() and self.contains((0.0, 0.0, -1.0)):
            bound = Rect(R1Interval(-math.pi / 2, bound.lat.hi), bound.lng)
        self.bound = bound

    def invert(self) -> None:
        """loop.go:190-203."""
        self.vertices.reverse()
        self.origin_inside = not self.origin_inside
        if self.bound.lat.lo > -math.pi / 2 and self.bound.lat.hi < math.pi / 2:
            self.bound = Rect.full()
        else:
            self._init_bound()

    # --- containment -------------------------------------------------------

    def contains(self, p) -> bool:
        """Point-in-loop: bound check + crossing parity (loop.go:532-558).

        Scalar driver-side path; batch rows go through
        kernels.predicates.contains_points_in_loop.
        """
        if not self.bound.contains_latlng_rad(V.latitude(p), V.longitude(p)):
            return False
        return bool(
            PR.contains_points_in_loop(
                np.array([p], dtype=np.float64),
                self.vertices_array(),
                self.origin_inside,
            )[0]
        )

    def contains_batch(self, points: np.ndarray) -> np.ndarray:
        """Vectorized containment (no bound prefilter — caller's job)."""
        return PR.contains_points_in_loop(points, self.vertices_array(), self.origin_inside)

    def find_vertex(self, p) -> int:
        """Index i in 1..n with vertex(i) == p, else -1 (loop.go:164-183)."""
        for i in range(1, len(self.vertices) + 1):
            if self.vertex(i) == tuple(p):
                return i
        return -1

    # --- surface integrals -------------------------------------------------

    def _surface_integral(self, f_tri, add):
        """Fan integral with origin restabilization (loop.go:254-301)."""
        origin = self.vertex(0)
        n = len(self.vertices)
        for i in range(1, n - 1):
            if V.angle(self.vertex(i + 1), origin) > _MAX_LENGTH:
                old_origin = origin
                if origin == self.vertex(0):
                    origin = V.normalize(PR._point_cross(self.vertex(0), self.vertex(i)))
                elif V.angle(self.vertex(i), self.vertex(0)) < _MAX_LENGTH:
                    origin = self.vertex(0)
                else:
                    origin = V.cross(self.vertex(0), old_origin)
                    add(f_tri(self.vertex(0), old_origin, origin))
                add(f_tri(old_origin, self.vertex(i), origin))
            add(f_tri(origin, self.vertex(i), self.vertex(i + 1)))
        if origin != self.vertex(0):
            add(f_tri(origin, self.vertex(n - 1), self.vertex(0)))

    def area(self) -> float:
        """loop.go:303-311."""
        total = 0.0

        def signed_area(a, b, c):
            return PR.point_area(a, b, c) * PR.robust_ccw(a, b, c)

        def add(v):
            nonlocal total
            total += v

        self._surface_integral(signed_area, add)
        if total < 0:
            total += 4 * math.pi
        return max(0.0, min(4 * math.pi, total))

    def centroid(self):
        """loop.go:313-317 (area-weighted, not normalized)."""
        acc = [0.0, 0.0, 0.0]

        def true_centroid(a, b, c):
            # point.go:413-438
            angle_a = V.angle(b, c)
            angle_b = V.angle(c, a)
            angle_c = V.angle(a, b)
            ra = angle_a / math.sin(angle_a) if angle_a != 0 else 1.0
            rb = angle_b / math.sin(angle_b) if angle_b != 0 else 1.0
            rc = angle_c / math.sin(angle_c) if angle_c != 0 else 1.0
            x = (a[0], b[0] - a[0], c[0] - a[0])
            y = (a[1], b[1] - a[1], c[1] - a[1])
            z = (a[2], b[2] - a[2], c[2] - a[2])
            r = (ra, rb - ra, rc - ra)
            return V.mul(
                (V.dot(V.cross(y, z), r), V.dot(V.cross(z, x), r), V.dot(V.cross(x, y), r)),
                0.5,
            )

        def add(v):
            acc[0] += v[0]
            acc[1] += v[1]
            acc[2] += v[2]

        self._surface_integral(true_centroid, add)
        return tuple(acc)

    # --- normalization -----------------------------------------------------

    def canonical_first_vertex(self):
        """loop.go:417-434."""
        first = 0
        n = len(self.vertices)
        for i in range(1, n):
            if self.vertex(i) < self.vertex(first):
                first = i
        if self.vertex(first + 1) < self.vertex(first + n - 1):
            return first, 1
        return first + n, -1

    def turning_angle(self) -> float:
        """loop.go:436-455."""
        if len(self.vertices) < 3:
            return 0.0
        n = len(self.vertices)
        i, direction = self.canonical_first_vertex()

        def turn(a, b, c):
            ang = V.angle(PR._point_cross(b, a), PR._point_cross(c, b))
            return ang if PR.robust_ccw(a, b, c) > 0 else -ang

        def vx(k):
            return self.vertex(k % n) if k % n >= 0 else self.vertex(k % n + n)

        angle = turn(vx(i + n - direction), vx(i), vx(i + direction))
        m = n - 1
        while m > 0:
            i += direction
            angle += turn(vx(i - direction), vx(i), vx(i + direction))
            m -= 1
        return float(direction) * angle

    def is_valid(self) -> bool:
        """Input validation for untrusted loops (loop.go:90-135): >= 3
        vertices, all unit length, no duplicate vertices, no non-adjacent
        edge intersections. The reference prunes the crossing scan with
        its edge index; the candidate set here is the full upper triangle
        (a superset), so results are identical."""
        n = len(self.vertices)
        if n < 3:
            return False
        for v in self.vertices:
            if not V.is_unit(v):
                return False
        if len(set(self.vertices)) != n:
            return False
        for i in range(n):
            a0, a1 = self.vertex(i), self.vertex((i + 1) % n)
            for j in range(i + 2, n):
                if i == 0 and j == n - 1:
                    continue  # adjacent (wraps)
                if PR.robust_crossing(
                    a0, a1, self.vertex(j), self.vertex((j + 1) % n)
                ) > 0:
                    return False
        return True

    def is_normalized(self) -> bool:
        """loop.go:398-407."""
        if self.bound.lng.length() < math.pi:
            return True
        return self.turning_angle() >= -1e-14

    def normalize(self) -> None:
        if not self.is_normalized():
            self.invert()

    # --- Region contract ---------------------------------------------------

    def cap_bound(self) -> Cap:
        return self.bound.cap_bound()

    def contains_cell(self, cell) -> bool:
        """loop.go:457-463."""
        if not self.bound.contains_point(cell.center()):
            return False
        return self.contains_loop(Loop.from_cell(cell))

    def may_intersect_cell(self, cell) -> bool:
        """loop.go:560-565."""
        if not self.bound.intersects_rect(cell.rect_bound()):
            return False
        return Loop.from_cell(cell).intersects(self)

    # --- loop-pair relations ----------------------------------------------

    def _are_boundaries_crossing(self, b: "Loop", process_wedge):
        """AreBoundariesCrossing (loop.go:650-680), vectorized: all edge
        pairs evaluated in one batched pass (the reference prunes with its
        edge index; candidates are a superset so results are identical), then
        only shared-vertex pairs fall back to scalar wedge processing.
        ``process_wedge`` returns True to short-circuit with False.
        """
        a = self
        has_crossing, shared = PR.loop_crossing_batch(
            a.vertices_array(), b.vertices_array()
        )
        if has_crossing:
            return True
        for ai, j in shared:
            if a.vertex(ai + 1) == b.vertex(j + 1) and process_wedge(
                a.vertex(ai), a.vertex(ai + 1), a.vertex(ai + 2),
                b.vertex(j), b.vertex(j + 2),
            ):
                return False
        return False

    def contains_loop(self, b: "Loop") -> bool:
        """loop.go:465-521."""
        a = self
        if not a.bound.contains_rect(b.bound):
            return False
        if not a.contains(b.vertex(0)) and a.find_vertex(b.vertex(0)) < 0:
            return False
        state = {"doesnt_contain": False}

        def process(a0, ab1, a2, b0, b2):
            state["doesnt_contain"] = not PR.wedge_contains(a0, ab1, a2, b0, b2)
            return state["doesnt_contain"]

        if a._are_boundaries_crossing(b, process) or state["doesnt_contain"]:
            return False
        if a.bound.union(b.bound).is_full():
            if b.contains(a.vertex(0)) and b.find_vertex(a.vertex(0)) < 0:
                return False
        return True

    def contains_nested(self, b: "Loop") -> bool:
        """loop.go:523-540."""
        if not self.bound.contains_rect(b.bound):
            return False
        m = self.find_vertex(b.vertex(1))
        if m < 0:
            return self.contains(b.vertex(1))
        return PR.wedge_contains(
            self.vertex(m - 1), self.vertex(m), self.vertex(m + 1),
            b.vertex(0), b.vertex(2),
        )

    def intersects(self, b: "Loop") -> bool:
        """loop.go:681-724."""
        a = self
        if len(b.vertices) > len(a.vertices):
            return b.intersects(a)
        if not a.bound.intersects_rect(b.bound):
            return False
        if a.contains(b.vertex(0)) and a.find_vertex(b.vertex(0)) < 0:
            return True
        state = {"intersects": False}

        def process(a0, ab1, a2, b0, b2):
            state["intersects"] = PR.wedge_intersects(a0, ab1, a2, b0, b2)
            return state["intersects"]

        if a._are_boundaries_crossing(b, process) or state["intersects"]:
            return True
        if b.bound.contains_rect(a.bound):
            if b.contains(a.vertex(0)) and b.find_vertex(a.vertex(0)) < 0:
                return True
        return False

    def contains_or_crosses(self, b: "Loop") -> int:
        """+1 contains / 0 disjoint-or-contained-by / -1 crosses (loop.go:726-757)."""
        a = self
        if not a.bound.intersects_rect(b.bound):
            return 0
        state = {
            "has_boundary_crossing": False,
            "a_super": False,
            "b_super": False,
            "disjoint": False,
        }

        def process(a0, ab1, a2, b0, b2):
            rel = PR.get_wedge_relation(a0, ab1, a2, b0, b2)
            if rel == PR.WEDGE_PROPERLY_OVERLAPS:
                state["has_boundary_crossing"] = True
                return True
            state["a_super"] = state["a_super"] or rel == PR.WEDGE_PROPERLY_CONTAINS
            state["b_super"] = state["b_super"] or rel == PR.WEDGE_IS_PROPERLY_CONTAINED
            if state["a_super"] and state["b_super"]:
                state["has_boundary_crossing"] = True
                return True
            state["disjoint"] = state["disjoint"] or rel == PR.WEDGE_IS_DISJOINT
            return False

        if a._are_boundaries_crossing(b, process):
            return -1
        if state["has_boundary_crossing"]:
            return -1
        if state["disjoint"] or state["b_super"]:
            return 0
        if not a.bound.contains_rect(b.bound):
            return 0
        if not a.contains(b.vertex(0)) and a.find_vertex(b.vertex(0)) < 0:
            return 0
        return 1

    def boundary_approx_equals(self, b: "Loop", max_error: float = 1e-15) -> bool:
        """loop.go:759-779 (test oracle)."""
        n = len(self.vertices)
        if n != len(b.vertices):
            return False
        for offset in range(n):
            if V.angle(self.vertex(offset), b.vertex(0)) <= max_error:
                ok = True
                for i in range(n):
                    if V.angle(self.vertex(i + offset), b.vertex(i)) > max_error:
                        ok = False
                        break
                if ok:
                    return True
        return False

    def __repr__(self) -> str:
        return f"Loop({len(self.vertices)} vertices, depth={self.depth})"
