"""Cell metrics for the quadratic projection (the S2 library default).

Used to choose covering levels from radii/extents (e.g. kNN search rings,
tile-level selection).  Constants and level-selection semantics studied from
the reference (vnayar/s2geometry-d src/s2/s2metrics.d:36-260); the derivs
are mathematical constants of the quadratic cube projection.
"""

from __future__ import annotations

import math

MAX_CELL_LEVEL = 30


class Metric:
    __slots__ = ("deriv", "dim")

    def __init__(self, deriv: float, dim: int):
        self.deriv = deriv
        self.dim = dim

    def get_value(self, level: int) -> float:
        return math.ldexp(self.deriv, -self.dim * level)

    def get_level_for_max_value(self, value: float) -> int:
        """Min level such that the metric is <= value (clamped to [0,30])."""
        if value <= 0:
            return MAX_CELL_LEVEL
        # frexp returns value = m * 2^e with m in [0.5,1); ilogb = e-1.
        ilogb = math.frexp(value / self.deriv)[1] - 1
        return max(0, min(MAX_CELL_LEVEL, -(ilogb >> (self.dim - 1))))

    def get_level_for_min_value(self, value: float) -> int:
        """Max level such that the metric is >= value (clamped to [0,30])."""
        if value <= 0:
            return MAX_CELL_LEVEL
        ilogb = math.frexp(self.deriv / value)[1] - 1
        return max(0, min(MAX_CELL_LEVEL, ilogb >> (self.dim - 1)))

    def get_closest_level(self, value: float) -> int:
        return self.get_level_for_max_value(
            (math.sqrt(2.0) if self.dim == 1 else 2.0) * value
        )


def _L(deriv: float) -> Metric:
    return Metric(deriv, 1)


def _A(deriv: float) -> Metric:
    return Metric(deriv, 2)


MIN_ANGLE_SPAN = _L(4.0 / 3.0)
MAX_ANGLE_SPAN = _L(1.704897179199218452)
AVG_ANGLE_SPAN = _L(math.pi / 2)

MIN_WIDTH = _L(2 * math.sqrt(2.0) / 3)
MAX_WIDTH = _L(MAX_ANGLE_SPAN.deriv)
AVG_WIDTH = _L(1.434523672886099389)

MIN_EDGE = _L(2 * math.sqrt(2.0) / 3)
MAX_EDGE = _L(MAX_ANGLE_SPAN.deriv)
AVG_EDGE = _L(1.459213746386106062)

MIN_DIAG = _L(8 * math.sqrt(2.0) / 9)
MAX_DIAG = _L(2.438654594434021032)
AVG_DIAG = _L(2.060422738998471683)

MIN_AREA = _A(8 * math.sqrt(2.0) / 9)
MAX_AREA = _A(2.635799256963161491)
AVG_AREA = _A(4 * math.pi / 6)

MAX_EDGE_ASPECT = 1.442615274452682920
MAX_DIAG_ASPECT = math.sqrt(3.0)
