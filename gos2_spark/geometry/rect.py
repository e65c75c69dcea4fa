"""Latitude-longitude rectangle region. Semantics: /root/reference/s2/rect.go."""

from __future__ import annotations

import math

from . import _vec as V
from .cap import Cap
from .interval import R1Interval, S1Interval

VALID_LAT = R1Interval(-math.pi / 2, math.pi / 2)


class Rect:
    def __init__(self, lat: R1Interval, lng: S1Interval):
        self.lat = lat
        self.lng = lng

    @staticmethod
    def empty() -> "Rect":
        return Rect(R1Interval.empty(), S1Interval.empty())

    @staticmethod
    def full() -> "Rect":
        return Rect(VALID_LAT, S1Interval.full())

    @staticmethod
    def from_latlng_rad(lat: float, lng: float) -> "Rect":
        return Rect(R1Interval(lat, lat), S1Interval(lng, lng))

    @staticmethod
    def from_point_pair_rad(lat1, lng1, lat2, lng2) -> "Rect":
        return Rect(
            R1Interval.from_point_pair(lat1, lat2),
            S1Interval.from_point_pair(lng1, lng2),
        )

    @staticmethod
    def from_degrees(lat_lo, lng_lo, lat_hi, lng_hi) -> "Rect":
        """Convenience: corners in degrees (lng interval lo->hi eastward)."""
        return Rect(
            R1Interval(math.radians(lat_lo), math.radians(lat_hi)),
            S1Interval.from_endpoints(math.radians(lng_lo), math.radians(lng_hi)),
        )

    def is_empty(self) -> bool:
        return self.lat.is_empty()

    def is_full(self) -> bool:
        return self.lat.equal(VALID_LAT) and self.lng.is_full()

    def is_valid(self) -> bool:
        return (
            abs(self.lat.lo) <= math.pi / 2
            and abs(self.lat.hi) <= math.pi / 2
            and self.lng.is_valid()
            and self.lat.is_empty() == self.lng.is_empty()
        )

    def center(self):
        return (self.lat.center(), self.lng.center())

    def vertex(self, k: int):
        """(lat, lng) radians, CCW order SW, SE, NE, NW (rect.go:105-108)."""
        lat = self.lat.lo if (k >> 1) == 0 else self.lat.hi
        b = (k >> 1) ^ (k & 1)
        lng = self.lng.lo if b == 0 else self.lng.hi
        return (lat, lng)

    def area(self) -> float:
        if self.is_empty():
            return 0.0
        return self.lng.length() * abs(math.sin(self.lat.hi) - math.sin(self.lat.lo))

    def add_point_rad(self, lat: float, lng: float) -> "Rect":
        if not (abs(lat) <= math.pi / 2 and abs(lng) <= math.pi):
            return self
        return Rect(self.lat.add_point(lat), self.lng.add_point(lng))

    def contains_latlng_rad(self, lat: float, lng: float) -> bool:
        """rect.go:161-163."""
        return self.lat.contains(lat) and self.lng.contains(lng)

    def contains_point(self, p) -> bool:
        return self.contains_latlng_rad(V.latitude(p), V.longitude(p))

    def contains_rect(self, o: "Rect") -> bool:
        return self.lat.contains_interval(o.lat) and self.lng.contains_interval(o.lng)

    def intersects_rect(self, o: "Rect") -> bool:
        return self.lat.intersects(o.lat) and self.lng.intersects(o.lng)

    def union(self, o: "Rect") -> "Rect":
        return Rect(self.lat.union(o.lat), self.lng.union(o.lng))

    def expanded(self, lat_margin: float, lng_margin: float) -> "Rect":
        """rect.go:209-214."""
        return Rect(
            self.lat.expanded(lat_margin).intersection(VALID_LAT),
            self.lng.expanded(lng_margin),
        )

    # --- Region contract ---------------------------------------------------

    def cap_bound(self) -> Cap:
        """rect.go:66-102 (pole cap vs mid cap, smaller wins)."""
        if self.is_empty():
            return Cap.empty()
        if self.lat.lo + self.lat.hi < 0:
            pole_z, pole_angle = -1.0, math.pi / 2 + self.lat.hi
        else:
            pole_z, pole_angle = 1.0, math.pi / 2 - self.lat.lo
        pole_cap = Cap.from_center_angle((0.0, 0.0, pole_z), pole_angle)
        lng_span = self.lng.hi - self.lng.lo
        if math.remainder(lng_span, 2 * math.pi) >= 0 and lng_span < 2 * math.pi:
            mid_cap = Cap.from_center_angle(V.from_latlng_rad(*self.center()), 0.0)
            for k in range(4):
                mid_cap.add_point(V.from_latlng_rad(*self.vertex(k)))
            if mid_cap.height < pole_cap.height:
                return mid_cap
        return pole_cap

    def contains_cell(self, cell) -> bool:
        return self.contains_rect(cell.rect_bound())

    def may_intersect_cell(self, cell) -> bool:
        return self.intersects_rect(cell.rect_bound())

    def approx_equals(self, o: "Rect", eps: float = 1e-14) -> bool:
        return (
            abs(self.lat.lo - o.lat.lo) <= eps
            and abs(self.lat.hi - o.lat.hi) <= eps
            and abs(self.lng.lo - o.lng.lo) <= eps
            and abs(self.lng.hi - o.lng.hi) <= eps
        )

    def __repr__(self) -> str:
        return (
            f"Rect(lat=[{math.degrees(self.lat.lo):.4f},{math.degrees(self.lat.hi):.4f}],"
            f" lng=[{math.degrees(self.lng.lo):.4f},{math.degrees(self.lng.hi):.4f}])"
        )
