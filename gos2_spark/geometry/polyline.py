"""Open vertex chain on the sphere. Semantics: /root/reference/s2/polyline.go
(the reference port is minimal — vertices + accessors; we add the standard
derived quantities used by the engine's polyline ops)."""

from __future__ import annotations

import math

from . import _vec as V
from .interval import R1Interval, S1Interval
from .rect import Rect


class Polyline:
    def __init__(self, vertices):
        self.vertices = [tuple(map(float, v)) for v in vertices]

    @staticmethod
    def from_latlngs_deg(latlngs) -> "Polyline":
        return Polyline([V.from_degrees(lat, lng) for lat, lng in latlngs])

    def num_vertices(self) -> int:
        return len(self.vertices)

    def vertex(self, k: int):
        return self.vertices[k]

    def length(self) -> float:
        """Total geodesic length in radians."""
        return sum(
            V.angle(self.vertices[i], self.vertices[i + 1])
            for i in range(len(self.vertices) - 1)
        )

    def interpolate(self, fraction: float):
        """Point at the given fraction of the total length (clamped)."""
        if fraction <= 0:
            return self.vertices[0]
        target = fraction * self.length()
        for i in range(len(self.vertices) - 1):
            a, b = self.vertices[i], self.vertices[i + 1]
            seg = V.angle(a, b)
            if target <= seg and seg > 0:
                # slerp along the segment (edgeutil.go EdgeInterpolate)
                t = target / seg
                sin_seg = math.sin(seg)
                if sin_seg == 0:
                    return a
                wa = math.sin((1 - t) * seg) / sin_seg
                wb = math.sin(t * seg) / sin_seg
                return V.normalize(V.add(V.mul(a, wa), V.mul(b, wb)))
            target -= seg
        return self.vertices[-1]

    def rect_bound(self) -> Rect:
        bound = Rect(R1Interval.empty(), S1Interval.empty())
        for v in self.vertices:
            bound = bound.add_point_rad(V.latitude(v), V.longitude(v))
        return bound

    def edges(self) -> list[tuple]:
        return [
            (self.vertices[i], self.vertices[i + 1])
            for i in range(len(self.vertices) - 1)
        ]

    def __repr__(self) -> str:
        return f"Polyline({len(self.vertices)} vertices)"


def edge_interpolate_at_distance(ax: float, a, b, ab: float):
    """Point at angular distance ``ax`` along geodesic a->b whose total
    angle is ``ab`` (edgeutil.go:346-354) — identical float-op order."""
    import math

    f = math.sin(ax) / math.sin(ab)
    e = math.cos(ax) - f * math.cos(ab)
    return V.normalize(V.add(V.mul(a, e), V.mul(b, f)))


def edge_interpolate(t: float, a, b):
    """Point at parametric fraction ``t`` along geodesic a->b
    (edgeutil.go:335-344)."""
    if t == 0:
        return a
    if t == 1:
        return b
    ab = V.angle(a, b)
    return edge_interpolate_at_distance(t * ab, a, b, ab)
