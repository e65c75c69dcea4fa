"""Cell level <-> size calculus (quadratic projection metrics).

Constants and formulas from /root/reference/s2/metric.go:25-109. Used by the
coverer (level selection) and edge coverings.
"""

from __future__ import annotations

import math

MAX_LEVEL = 30


class Metric:
    def __init__(self, deriv: float, dim: int):
        self.deriv = deriv
        self.dim = dim

    def value(self, level: int) -> float:
        """Deriv * 2^(-dim*level) via ldexp (metric.go:25-27)."""
        return math.ldexp(self.deriv, -self.dim * level)

    def closest_level(self, value: float) -> int:
        scale = math.sqrt(2) if self.dim == 1 else 2.0
        return self.min_level(scale * value)

    def min_level(self, value: float) -> int:
        """Minimum level with size <= value (metric.go:43-53)."""
        if value <= 0:
            return MAX_LEVEL
        _, exp = math.frexp(value / self.deriv)
        return max(0, min(MAX_LEVEL, -((exp - 1) >> (self.dim - 1))))

    def max_level(self, value: float) -> int:
        """Maximum level with size >= value (metric.go:57-63)."""
        if value <= 0:
            return MAX_LEVEL
        _, exp = math.frexp(self.deriv / value)
        return max(0, min(MAX_LEVEL, (exp - 1) >> (self.dim - 1)))


# metric.go:91-109
MIN_ANGLE_SPAN = Metric(4.0 / 3, 1)
MAX_ANGLE_SPAN = Metric(1.704897179199218452, 1)
AVG_ANGLE_SPAN = Metric(math.pi / 2, 1)
MIN_WIDTH = Metric(2 * math.sqrt(2) / 3, 1)
MAX_WIDTH = Metric(MAX_ANGLE_SPAN.deriv, 1)
AVG_WIDTH = Metric(1.434523672886099389, 1)
MIN_EDGE = Metric(2 * math.sqrt(2) / 3, 1)
MAX_EDGE = Metric(MAX_ANGLE_SPAN.deriv, 1)
AVG_EDGE = Metric(1.459213746386106062, 1)
MIN_DIAG = Metric(8 * math.sqrt(2) / 9, 1)
MAX_DIAG = Metric(2.438654594434021032, 1)
AVG_DIAG = Metric(2.060422738998471683, 1)
MIN_AREA = Metric(8 * math.sqrt(2) / 9, 2)
MAX_AREA = Metric(2.635799256963161491, 2)
AVG_AREA = Metric(4 * math.pi / 6, 2)
MAX_EDGE_ASPECT = 1.442615274452682920
MAX_DIAG_ASPECT = math.sqrt(3)


def average_area(level: int) -> float:
    """cell.go:128-130."""
    return AVG_AREA.value(level)
