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


def ortho(a):
    """A unit vector orthogonal to ``a`` — the reference's fixed-offset
    cross construction (r3/vector.go:102), NOT the axis-permutation trick,
    so results match its choices bit-for-bit."""
    return normalize(cross(a, (0.012, 0.0053, 0.00457)))


# -- 3x3 matrices as row-major tuples of rows (r3/matrix.go) --------------


def matrix_from_cols(v0, v1, v2):
    """r3/matrix.go:11-19 — columns are the input vectors."""
    return (
        (v0[0], v1[0], v2[0]),
        (v0[1], v1[1], v2[1]),
        (v0[2], v1[2], v2[2]),
    )


def transpose(m):
    return tuple(zip(*m))


def col(m, i: int):
    return (m[0][i], m[1][i], m[2][i])


def mul_vector(m, v):
    return (
        m[0][0] * v[0] + m[0][1] * v[1] + m[0][2] * v[2],
        m[1][0] * v[0] + m[1][1] * v[1] + m[1][2] * v[2],
        m[2][0] * v[0] + m[2][1] * v[1] + m[2][2] * v[2],
    )


def frame_from_point(z):
    """Right-handed orthonormal frame with ``z`` as the 3rd column
    (point.go:440-445): col1 = z.Ortho(), col0 = col1 x z (unit by
    construction). Used for local-tangent-plane work (snapping, small-cap
    sampling)."""
    c1 = ortho(z)
    c0 = cross(c1, z)
    return matrix_from_cols(c0, c1, z)


def point_from_frame(m, q):
    """point.go:447-449 — frame-local coords ``q`` back to world."""
    return mul_vector(m, q)


def point_to_frame(m, p):
    """Inverse of point_from_frame for orthonormal ``m``: multiply by the
    transpose (rotation inverse)."""
    return mul_vector(transpose(m), p)


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
