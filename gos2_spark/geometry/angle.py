"""s1.Angle: radians-backed angle with degree / E5 / E6 / E7 codecs.

Semantics: /root/reference/s1/angle.go (units:12-19, accessors:21-32,
Abs/Normalized:34-46). The engine stores angles as bare float64 radians in
DataFrames; this wrapper exists for API parity and for the integer
E-notation codecs (protocol-buffer-style fixed-point lat/lng encodings).
"""

from __future__ import annotations

import math

_DEGREE = math.pi / 180.0


class Angle:
    """Immutable angle; value is radians (s1/angle.go:10)."""

    __slots__ = ("_rad",)

    def __init__(self, radians: float = 0.0):
        self._rad = float(radians)

    # --- constructors (angle.go:12-19) -------------------------------------

    @staticmethod
    def from_radians(rad: float) -> "Angle":
        return Angle(rad)

    @staticmethod
    def from_degrees(deg: float) -> "Angle":
        return Angle(deg * _DEGREE)

    @staticmethod
    def from_e5(e5: int) -> "Angle":
        return Angle.from_degrees(e5 * 1e-5)

    @staticmethod
    def from_e6(e6: int) -> "Angle":
        return Angle.from_degrees(e6 * 1e-6)

    @staticmethod
    def from_e7(e7: int) -> "Angle":
        return Angle.from_degrees(e7 * 1e-7)

    # --- accessors (angle.go:21-32) ----------------------------------------

    def radians(self) -> float:
        return self._rad

    def degrees(self) -> float:
        return self._rad / _DEGREE

    def e5(self) -> int:
        # int32 truncation toward zero, exactly like Go's int32(float64)
        return int(self.degrees() * 1e5)

    def e6(self) -> int:
        return int(self.degrees() * 1e6)

    def e7(self) -> int:
        return int(self.degrees() * 1e7)

    # --- arithmetic / canonical forms (angle.go:34-46) ----------------------

    def abs(self) -> "Angle":
        return Angle(abs(self._rad))

    def normalized(self) -> "Angle":
        rad = math.fmod(self._rad, 2 * math.pi)
        if rad < 0:
            rad += 2 * math.pi
        return Angle(rad)

    def __eq__(self, other) -> bool:
        return isinstance(other, Angle) and self._rad == other._rad

    def __lt__(self, other: "Angle") -> bool:
        return self._rad < other._rad

    def __hash__(self) -> int:
        return hash(self._rad)

    def __repr__(self) -> str:
        return f"Angle({self.degrees():.7f} deg)"
