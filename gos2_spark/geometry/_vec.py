"""Tiny 3-vector helpers for driver-side geometry (tuples of float).

Semantics mirror /root/reference/r3/vector.go; the batch equivalents live in
the kernels.
"""

from __future__ import annotations

import math

Vec = tuple


def add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def mul(a, m: float):
    return (a[0] * m, a[1] * m, a[2] * m)


def neg(a):
    return (-a[0], -a[1], -a[2])


def dot(a, b) -> float:
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def norm2(a) -> float:
    return dot(a, a)


def norm(a) -> float:
    return math.sqrt(dot(a, a))


def normalize(a):
    if a == (0.0, 0.0, 0.0):
        return a
    n = norm(a)
    return (a[0] / n, a[1] / n, a[2] / n)


def angle(a, b) -> float:
    """atan2(|a×b|, a·b) (r3/vector.go:96-98)."""
    return math.atan2(norm(cross(a, b)), dot(a, b))


def distance(a, b) -> float:
    return norm(sub(a, b))


def is_unit(a) -> bool:
    return abs(norm2(a) - 1) <= 5e-14


def from_latlng_rad(lat: float, lng: float):
    """latlng.go:54-59."""
    cosphi = math.cos(lat)
    return (math.cos(lng) * cosphi, math.sin(lng) * cosphi, math.sin(lat))


def latitude(p) -> float:
    return math.atan2(p[2], math.sqrt(p[0] * p[0] + p[1] * p[1]))


def longitude(p) -> float:
    return math.atan2(p[1], p[0])


def from_degrees(lat_deg: float, lng_deg: float):
    return from_latlng_rad(math.radians(lat_deg), math.radians(lng_deg))
