"""Spherical cap region (center + height). Semantics: /root/reference/s2/cap.go."""

from __future__ import annotations

import math

from . import _vec as V

EMPTY_HEIGHT = -1.0
ZERO_HEIGHT = 0.0
FULL_HEIGHT = 2.0
ROUND_UP = 1.0 + 1.0 / (1 << 52)


def radius_to_height(radians: float) -> float:
    """cap.go:299-312: h = 2 sin^2(r/2), stable near zero."""
    if radians < 0:
        return EMPTY_HEIGHT
    if radians >= math.pi:
        return FULL_HEIGHT
    d = math.sin(0.5 * radians)
    return 2 * d * d


class Cap:
    """Disc region; height = 1 - cos(radius) (cap.go:45-48)."""

    def __init__(self, center, height: float):
        self.center = V.normalize(tuple(map(float, center)))
        self.height = height

    @staticmethod
    def from_center_angle(center, radians: float) -> "Cap":
        return Cap(center, radius_to_height(radians))

    @staticmethod
    def from_point(p) -> "Cap":
        return Cap(p, ZERO_HEIGHT)

    @staticmethod
    def from_latlng_deg(lat: float, lng: float, radius_deg: float) -> "Cap":
        return Cap.from_center_angle(V.from_degrees(lat, lng), math.radians(radius_deg))

    @staticmethod
    def empty() -> "Cap":
        return Cap((1.0, 0.0, 0.0), EMPTY_HEIGHT)

    @staticmethod
    def full() -> "Cap":
        return Cap((1.0, 0.0, 0.0), FULL_HEIGHT)

    def is_empty(self) -> bool:
        return self.height < ZERO_HEIGHT

    def is_full(self) -> bool:
        return self.height == FULL_HEIGHT

    def radius(self) -> float:
        """Radians (cap.go:117-126)."""
        if self.is_empty():
            return EMPTY_HEIGHT
        return 2 * math.asin(math.sqrt(0.5 * self.height))

    def area(self) -> float:
        return 2.0 * math.pi * max(ZERO_HEIGHT, self.height)

    def add_point(self, p) -> None:
        """cap.go:88-101 (mutating, like the reference)."""
        if self.is_empty():
            self.center = tuple(p)
            self.height = 0.0
        else:
            dist2 = V.norm2(V.sub(self.center, p))
            self.height = max(self.height, ROUND_UP * 0.5 * dist2)

    def contains_point(self, p) -> bool:
        """cap.go:253-255."""
        return V.norm2(V.sub(self.center, p)) <= 2 * self.height

    def interior_contains_point(self, p) -> bool:
        return self.is_full() or V.norm2(V.sub(self.center, p)) < 2 * self.height

    def contains_cap(self, other: "Cap") -> bool:
        if self.is_full() or other.is_empty():
            return True
        return self.radius() >= V.angle(self.center, other.center) + other.radius()

    def intersects_cap(self, other: "Cap") -> bool:
        if self.is_empty() or other.is_empty():
            return False
        return self.radius() + other.radius() >= V.angle(self.center, other.center)

    def interior_intersects_cap(self, other: "Cap") -> bool:
        if self.height <= ZERO_HEIGHT or other.is_empty():
            return False
        return self.radius() + other.radius() > V.angle(self.center, other.center)

    def complement(self) -> "Cap":
        height = EMPTY_HEIGHT
        if not self.is_full():
            height = FULL_HEIGHT - max(self.height, ZERO_HEIGHT)
        return Cap(V.neg(self.center), height)

    def expanded(self, radians: float) -> "Cap":
        if self.is_empty():
            return Cap.empty()
        return Cap.from_center_angle(self.center, self.radius() + radians)

    # --- Region contract (coverer callbacks) -------------------------------

    def cap_bound(self) -> "Cap":
        return self

    def may_intersect_cell(self, cell) -> bool:
        """cap.go:135-143."""
        vertices = [cell.vertex(k) for k in range(4)]
        for v in vertices:
            if self.contains_point(v):
                return True
        return self._intersects_cell(cell, vertices)

    def contains_cell(self, cell) -> bool:
        """cap.go:153-168."""
        vertices = [cell.vertex(k) for k in range(4)]
        for v in vertices:
            if not self.contains_point(v):
                return False
        return not self.complement()._intersects_cell(cell, vertices)

    def _intersects_cell(self, cell, vertices) -> bool:
        """cap.go:179-240 (cell interior vs cap, vertices pre-checked)."""
        if self.height >= 1:
            return False
        if self.is_empty():
            return False
        if cell.contains_point(self.center):
            return True
        sin2_angle = self.height * (2 - self.height)
        for k in range(4):
            edge = cell.edge_raw(k)
            d = V.dot(self.center, edge)
            if d > 0:
                continue
            if d * d > sin2_angle * V.norm2(edge):
                return False
            direction = V.cross(edge, self.center)
            if V.dot(direction, vertices[k]) < 0 and V.dot(direction, vertices[(k + 1) & 3]) > 0:
                return True
        return False

    def contains_point_latlng_deg(self, lat: float, lng: float) -> bool:
        return self.contains_point(V.from_degrees(lat, lng))

    def approx_equal(self, other: "Cap", eps: float = 1e-14) -> bool:
        return (
            (V.angle(self.center, other.center) <= eps and abs(self.height - other.height) <= eps)
            or (self.is_empty() and other.height <= eps)
            or (other.is_empty() and self.height <= eps)
            or (self.is_full() and other.height >= 2 - eps)
            or (other.is_full() and self.height >= 2 - eps)
        )

    def __repr__(self) -> str:
        return f"Cap(center={self.center}, radius={math.degrees(self.radius()):.4f}deg)"
