"""1-D closed intervals: real line (r1) and unit circle (s1).

Semantics from /root/reference/r1/interval.go and /root/reference/s1/interval.go.
Plain-Python value objects used driver-side (bounds, coverer callbacks);
vectorized equivalents live inline in the kernels where needed.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

_EPS = math.ulp(0.0)  # smallest subnormal, matches Go's Nextafter(0, 1)


@dataclass(frozen=True)
class R1Interval:
    """Closed interval on the real line; empty iff lo > hi (r1/interval.go:11-16)."""

    lo: float
    hi: float

    @staticmethod
    def empty() -> "R1Interval":
        return R1Interval(1.0, 0.0)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "R1Interval":
        return R1Interval(p1, p2) if p1 <= p2 else R1Interval(p2, p1)

    def is_empty(self) -> bool:
        return self.lo > self.hi

    def center(self) -> float:
        return 0.5 * (self.lo + self.hi)

    def length(self) -> float:
        return self.hi - self.lo

    def contains(self, p: float) -> bool:
        return self.lo <= p <= self.hi

    def contains_interval(self, o: "R1Interval") -> bool:
        if o.is_empty():
            return True
        return self.lo <= o.lo and o.hi <= self.hi

    def interior_contains(self, p: float) -> bool:
        return self.lo < p < self.hi

    def interior_contains_interval(self, o: "R1Interval") -> bool:
        if o.is_empty():
            return True
        return self.lo < o.lo and o.hi < self.hi

    def intersects(self, o: "R1Interval") -> bool:
        if self.lo <= o.lo:
            return o.lo <= self.hi and o.lo <= o.hi
        return self.lo <= o.hi and self.lo <= self.hi

    def interior_intersects(self, o: "R1Interval") -> bool:
        return o.lo < self.hi and self.lo < o.hi and self.lo < self.hi and o.lo <= self.hi

    def intersection(self, o: "R1Interval") -> "R1Interval":
        return R1Interval(max(self.lo, o.lo), min(self.hi, o.hi))

    def union(self, o: "R1Interval") -> "R1Interval":
        if self.is_empty():
            return o
        if o.is_empty():
            return self
        return R1Interval(min(self.lo, o.lo), max(self.hi, o.hi))

    def add_point(self, p: float) -> "R1Interval":
        if self.is_empty():
            return R1Interval(p, p)
        if p < self.lo:
            return R1Interval(p, self.hi)
        if p > self.hi:
            return R1Interval(self.lo, p)
        return self

    def expanded(self, margin: float) -> "R1Interval":
        if self.is_empty():
            return self
        return R1Interval(self.lo - margin, self.hi + margin)

    def equal(self, o: "R1Interval") -> bool:
        return (self.lo == o.lo and self.hi == o.hi) or (self.is_empty() and o.is_empty())


def _positive_distance(a: float, b: float) -> float:
    """Distance a->b in [0, 2π), stable (s1/interval.go:196-202)."""
    d = b - a
    if d >= 0:
        return d
    return (b + math.pi) - (a - math.pi)


@dataclass(frozen=True)
class S1Interval:
    """Closed interval on the unit circle; lo > hi means inverted/wrapping
    (s1/interval.go:8-19)."""

    lo: float
    hi: float

    @staticmethod
    def empty() -> "S1Interval":
        return S1Interval(math.pi, -math.pi)

    @staticmethod
    def full() -> "S1Interval":
        return S1Interval(-math.pi, math.pi)

    @staticmethod
    def from_endpoints(lo: float, hi: float) -> "S1Interval":
        # both conditions test the ORIGINAL endpoints (interval.go:23-31):
        # from_endpoints(-pi, -pi) must normalize to [pi, pi], so the hi
        # check must not observe the already-normalized lo
        new_lo, new_hi = lo, hi
        if lo == -math.pi and hi != math.pi:
            new_lo = math.pi
        if hi == -math.pi and lo != math.pi:
            new_hi = math.pi
        return S1Interval(new_lo, new_hi)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "S1Interval":
        if p1 == -math.pi:
            p1 = math.pi
        if p2 == -math.pi:
            p2 = math.pi
        if _positive_distance(p1, p2) <= math.pi:
            return S1Interval(p1, p2)
        return S1Interval(p2, p1)

    def is_valid(self) -> bool:
        return (
            abs(self.lo) <= math.pi
            and abs(self.hi) <= math.pi
            and not (self.lo == -math.pi and self.hi != math.pi)
            and not (self.hi == -math.pi and self.lo != math.pi)
        )

    def is_full(self) -> bool:
        return self.hi - self.lo == 2 * math.pi

    def is_empty(self) -> bool:
        return self.lo - self.hi == 2 * math.pi

    def is_inverted(self) -> bool:
        return self.lo > self.hi

    def center(self) -> float:
        c = 0.5 * (self.lo + self.hi)
        if not self.is_inverted():
            return c
        return c + math.pi if c <= 0 else c - math.pi

    def length(self) -> float:
        ln = self.hi - self.lo
        if ln >= 0:
            return ln
        ln += 2 * math.pi
        return ln if ln > 0 else -1.0

    def fast_contains(self, p: float) -> bool:
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def contains(self, p: float) -> bool:
        if p == -math.pi:
            p = math.pi
        return self.fast_contains(p)

    def interior_contains(self, p: float) -> bool:
        if p == -math.pi:
            p = math.pi
        if self.is_inverted():
            return p > self.lo or p < self.hi
        return (self.lo < p < self.hi) or self.is_full()

    def contains_interval(self, o: "S1Interval") -> bool:
        if self.is_inverted():
            if o.is_inverted():
                return o.lo >= self.lo and o.hi <= self.hi
            return (o.lo >= self.lo or o.hi <= self.hi) and not self.is_empty()
        if o.is_inverted():
            return self.is_full() or o.is_empty()
        return o.lo >= self.lo and o.hi <= self.hi

    def interior_contains_interval(self, o: "S1Interval") -> bool:
        if self.is_inverted():
            if o.is_inverted():
                return (o.lo > self.lo and o.hi < self.hi) or o.is_empty()
            return o.lo > self.lo or o.hi < self.hi
        if o.is_inverted():
            return self.is_full() or o.is_empty()
        return (o.lo > self.lo and o.hi < self.hi) or self.is_full()

    def intersects(self, o: "S1Interval") -> bool:
        if self.is_empty() or o.is_empty():
            return False
        if self.is_inverted():
            return o.is_inverted() or o.lo <= self.hi or o.hi >= self.lo
        if o.is_inverted():
            return o.lo <= self.hi or o.hi >= self.lo
        return o.lo <= self.hi and o.hi >= self.lo

    def interior_intersects(self, o: "S1Interval") -> bool:
        if self.is_empty() or o.is_empty() or self.lo == self.hi:
            return False
        if self.is_inverted():
            return o.is_inverted() or o.lo < self.hi or o.hi > self.lo
        if o.is_inverted():
            return o.lo < self.hi or o.hi > self.lo
        return (o.lo < self.hi and o.hi > self.lo) or self.is_full()

    def union(self, o: "S1Interval") -> "S1Interval":
        if o.is_empty():
            return self
        if self.fast_contains(o.lo):
            if self.fast_contains(o.hi):
                if self.contains_interval(o):
                    return self
                return S1Interval.full()
            return S1Interval(self.lo, o.hi)
        if self.fast_contains(o.hi):
            return S1Interval(o.lo, self.hi)
        if self.is_empty() or o.fast_contains(self.lo):
            return o
        if _positive_distance(o.hi, self.lo) < _positive_distance(self.hi, o.lo):
            return S1Interval(o.lo, self.hi)
        return S1Interval(self.lo, o.hi)

    def intersection(self, o: "S1Interval") -> "S1Interval":
        if o.is_empty():
            return S1Interval.empty()
        if self.fast_contains(o.lo):
            if self.fast_contains(o.hi):
                if o.length() < self.length():
                    return o
                return self
            return S1Interval(o.lo, self.hi)
        if self.fast_contains(o.hi):
            return S1Interval(self.lo, o.hi)
        if o.fast_contains(self.lo):
            return self
        return S1Interval.empty()

    def add_point(self, p: float) -> "S1Interval":
        if abs(p) > math.pi:
            return self
        if p == -math.pi:
            p = math.pi
        if self.fast_contains(p):
            return self
        if self.is_empty():
            return S1Interval(p, p)
        if _positive_distance(p, self.lo) < _positive_distance(self.hi, p):
            return S1Interval(p, self.hi)
        return S1Interval(self.lo, p)

    def expanded(self, margin: float) -> "S1Interval":
        if margin >= 0:
            if self.is_empty():
                return self
            if self.length() + 2 * margin + 2 * _EPS >= 2 * math.pi:
                return S1Interval.full()
        else:
            if self.is_full():
                return self
            if self.length() + 2 * margin - 2 * _EPS <= 0:
                return S1Interval.empty()
        result = S1Interval.from_endpoints(
            math.remainder(self.lo - margin, 2 * math.pi),
            math.remainder(self.hi + margin, 2 * math.pi),
        )
        if result.lo <= -math.pi:
            result = S1Interval(math.pi, result.hi)
        return result

    def equal(self, o: "S1Interval") -> bool:
        return self.lo == o.lo and self.hi == o.hi
