"""Scalar region types used driver-side: Cell, Cap, LatLngRect.

Regions expose the predicate trio that drives covering generation
(SURVEY.md §1.2): ``contains_cell``, ``may_intersect_cell``,
``contains_point``, plus ``cell_union_bound`` (the fast-covering seed).

Semantics studied from the reference (vnayar/s2geometry-d):
cap predicates ``src/s2/s2cap.d:75-135,480-550``, cell geometry
``src/s2/s2cell.d:148-173,614-629``, chord-angle arithmetic
``src/s2/s1chord_angle.d:230-330``.  Independent python re-expression.

Region cardinality is tiny relative to the fact table, so this layer is
plain python; the per-point math lives in the vectorized kernels.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from . import coords, metrics
from .cellid import CellId

DBL_EPSILON = 2.220446049250313e-16


# ---------------------------------------------------------------- vectors

def norm(p):
    return math.sqrt(p[0] * p[0] + p[1] * p[1] + p[2] * p[2])


def normalize(p):
    n = norm(p)
    return (p[0] / n, p[1] / n, p[2] / n)


def dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def neg(a):
    return (-a[0], -a[1], -a[2])


def latlng_point(lat_deg: float, lng_deg: float):
    x, y, z = coords.latlng_to_xyz(np.array([lat_deg]), np.array([lng_deg]))
    return (float(x[0]), float(y[0]), float(z[0]))


# ---------------------------------------------------------------- chord angle
# A chord angle is represented as the squared chord length in [0,4]
# (negative = empty, matching the reference's S1ChordAngle currency).

MAX_LENGTH2 = 4.0


def chord2_between(a, b) -> float:
    d = sub(a, b)
    return min(MAX_LENGTH2, d[0] * d[0] + d[1] * d[1] + d[2] * d[2])


def chord2_from_radians(radians: float) -> float:
    if radians < 0:
        return -1.0
    s = 2.0 * math.sin(0.5 * min(radians, math.pi))
    return s * s


def chord2_to_radians(length2: float) -> float:
    if length2 < 0:
        return -1.0
    return 2.0 * math.asin(0.5 * math.sqrt(length2))


def chord2_add(a2: float, b2: float) -> float:
    """Angle addition in squared-chord space (s1chord_angle.d:294-330)."""
    if b2 == 0:
        return a2
    if a2 + b2 >= MAX_LENGTH2:
        return MAX_LENGTH2
    x = a2 * (1 - 0.25 * b2)
    y = b2 * (1 - 0.25 * a2)
    return min(MAX_LENGTH2, x + y + 2 * math.sqrt(x * y))


def chord2_sin2(length2: float) -> float:
    return length2 * (1 - 0.25 * length2)


# ---------------------------------------------------------------- S2Cell

_UNORM = (
    lambda u: (u, -1.0, 0.0),
    lambda u: (1.0, u, 0.0),
    lambda u: (1.0, 0.0, u),
    lambda u: (-u, 0.0, 1.0),
    lambda u: (0.0, -u, 1.0),
    lambda u: (0.0, -1.0, -u),
)
_VNORM = (
    lambda v: (-v, 0.0, 1.0),
    lambda v: (0.0, -v, 1.0),
    lambda v: (0.0, -1.0, -v),
    lambda v: (v, -1.0, 0.0),
    lambda v: (1.0, v, 0.0),
    lambda v: (1.0, 0.0, v),
)


class Cell:
    """Decoded cell: face, level, (u,v) bound, geometric predicates."""

    __slots__ = ("cell_id", "face", "level", "uv")

    def __init__(self, cell_id: CellId):
        self.cell_id = cell_id
        self.face = cell_id.face()
        self.level = cell_id.level()
        self.uv = cell_id.get_bound_uv()

    def id(self) -> CellId:
        return self.cell_id

    def get_vertex_raw(self, k: int):
        # CCW order: (u0,v0),(u1,v0),(u1,v1),(u0,v1)
        j = (k >> 1) & 1
        i = j ^ (k & 1)
        return coords.face_uv_to_xyz_scalar(self.face, self.uv[0][i], self.uv[1][j])

    def get_vertex(self, k: int):
        return normalize(self.get_vertex_raw(k))

    def get_edge_raw(self, k: int):
        """Inward-facing (non-unit) normal of edge k->k+1."""
        k &= 3
        if k == 0:
            return _VNORM[self.face](self.uv[1][0])  # bottom
        if k == 1:
            return _UNORM[self.face](self.uv[0][1])  # right
        if k == 2:
            return neg(_VNORM[self.face](self.uv[1][1]))  # top
        return neg(_UNORM[self.face](self.uv[0][0]))  # left

    # -- areas (s2cell.d:237-292) ----------------------------------------
    def average_area(self) -> float:
        """Average area of cells at this level (exact closed form)."""
        from . import metrics

        return metrics.AVG_AREA.get_value(self.level)

    def approx_area(self) -> float:
        """Cheap area approximation, accurate to ~3% (flat quad area with a
        first-order spherical-excess correction; s2cell.d ApproxArea)."""
        if self.level < 2:
            return self.average_area()
        v = [self.get_vertex(k) for k in range(4)]
        d1 = (v[2][0] - v[0][0], v[2][1] - v[0][1], v[2][2] - v[0][2])
        d2 = (v[3][0] - v[1][0], v[3][1] - v[1][1], v[3][2] - v[1][2])
        cx = d1[1] * d2[2] - d1[2] * d2[1]
        cy = d1[2] * d2[0] - d1[0] * d2[2]
        cz = d1[0] * d2[1] - d1[1] * d2[0]
        flat_area = 0.5 * math.sqrt(cx * cx + cy * cy + cz * cz)
        return flat_area * 2.0 / (1.0 + math.sqrt(1.0 - min(flat_area / math.pi, 1.0)))

    def exact_area(self) -> float:
        """Exact cell area: two spherical triangle excesses."""
        from . import measures

        v = [self.get_vertex(k) for k in range(4)]
        return measures.triangle_area(v[0], v[1], v[2]) + measures.triangle_area(
            v[0], v[2], v[3]
        )

    def contains_point(self, p) -> bool:
        # Valid-face check, then uv-bound containment expanded by epsilon so
        # that Cell(CellId(p)).contains_point(p) always holds.
        axis = self.face % 3
        comp = p[axis]
        if self.face < 3:
            if comp <= 0:
                return False
        elif comp >= 0:
            return False
        # Project onto this cell's own face (the largest-|component| face may
        # differ on boundaries, and we must accept boundary points on both).
        u, v = _project_uv(self.face, p)
        e = DBL_EPSILON
        return (
            self.uv[0][0] - e <= u <= self.uv[0][1] + e
            and self.uv[1][0] - e <= v <= self.uv[1][1] + e
        )

    def get_center(self):
        return self.cell_id.to_point()

    def subdivide(self) -> list["Cell"]:
        return [Cell(c) for c in self.cell_id.children()]


def _project_uv(face: int, p):
    if face == 0:
        return p[1] / p[0], p[2] / p[0]
    if face == 1:
        return -p[0] / p[1], p[2] / p[1]
    if face == 2:
        return -p[0] / p[2], -p[1] / p[2]
    if face == 3:
        return p[2] / p[0], p[1] / p[0]
    if face == 4:
        return p[2] / p[1], -p[0] / p[1]
    return -p[1] / p[2], -p[0] / p[2]


# ---------------------------------------------------------------- S2Cap

@dataclass
class Cap:
    """Spherical disc: unit-vector center + squared-chord radius."""

    center: tuple
    radius2: float  # squared chord length in [-1, 4]

    @staticmethod
    def from_latlng_radius(lat_deg: float, lng_deg: float, radius_deg: float) -> "Cap":
        return Cap(
            latlng_point(lat_deg, lng_deg),
            chord2_from_radians(math.radians(radius_deg)),
        )

    @staticmethod
    def from_center_height(center, height: float) -> "Cap":
        return Cap(center, 2.0 * height)

    @staticmethod
    def empty() -> "Cap":
        return Cap((1.0, 0.0, 0.0), -1.0)

    @staticmethod
    def full() -> "Cap":
        return Cap((1.0, 0.0, 0.0), 4.0)

    def is_empty(self) -> bool:
        return self.radius2 < 0

    def is_full(self) -> bool:
        return self.radius2 == 4.0

    def radius_radians(self) -> float:
        return chord2_to_radians(self.radius2)

    def complement(self) -> "Cap":
        if self.is_full():
            return Cap.empty()
        if self.is_empty():
            return Cap.full()
        return Cap(neg(self.center), 4.0 - self.radius2)

    def add_point(self, p) -> None:
        if self.is_empty():
            self.center = p
            self.radius2 = 0.0
        else:
            self.radius2 = max(self.radius2, chord2_between(self.center, p))

    # -- point/cap predicates -------------------------------------------
    def contains_point(self, p) -> bool:
        return chord2_between(self.center, p) <= self.radius2

    def contains_cap(self, other: "Cap") -> bool:
        if self.is_full() or other.is_empty():
            return True
        return self.radius2 >= chord2_add(
            chord2_between(self.center, other.center), other.radius2
        )

    def intersects_cap(self, other: "Cap") -> bool:
        if self.is_empty() or other.is_empty():
            return False
        return chord2_add(self.radius2, other.radius2) >= chord2_between(
            self.center, other.center
        )

    # -- cell predicates (drive the coverer) -----------------------------
    def contains_cell(self, cell: Cell) -> bool:
        vertices = []
        for k in range(4):
            v = cell.get_vertex(k)
            if not self.contains_point(v):
                return False
            vertices.append(v)
        return not self.complement()._intersects_cell(cell, vertices)

    def may_intersect_cell(self, cell: Cell) -> bool:
        vertices = []
        for k in range(4):
            v = cell.get_vertex(k)
            if self.contains_point(v):
                return True
            vertices.append(v)
        return self._intersects_cell(cell, vertices)

    def _intersects_cell(self, cell: Cell, vertices) -> bool:
        """True if the cap intersects any point of the cell excluding its
        vertices (already checked by the caller)."""
        # A hemisphere-or-larger cap: cell and cap-complement both convex.
        if self.radius2 >= 2.0:  # chord^2 of 90 degrees
            return False
        if self.is_empty():
            return False
        if cell.contains_point(self.center):
            return True
        sin2_angle = chord2_sin2(self.radius2)
        for k in range(4):
            edge = cell.get_edge_raw(k)
            d = dot(self.center, edge)
            if d > 0:
                continue
            if d * d > sin2_angle * dot(edge, edge):
                return False  # entire cap on the exterior side of this edge
            direction = cross(edge, self.center)
            if dot(direction, vertices[k]) < 0 and dot(direction, vertices[(k + 1) & 3]) > 0:
                return True
        return False

    # -- covering seed -----------------------------------------------------
    def cell_union_bound(self) -> list[CellId]:
        """<=4-cell (or 6-face) bound of the cap (s2cap.d:490-511)."""
        level = metrics.MIN_WIDTH.get_level_for_min_value(self.radius_radians()) - 1
        if level < 0:
            return [CellId.from_face(f) for f in range(6)]
        center_leaf = CellId.from_point(*self.center)
        return center_leaf.append_vertex_neighbors(level)

    def get_cap_bound(self) -> "Cap":
        return self


# ---------------------------------------------------------------- intervals

@dataclass
class S1Interval:
    """Longitude interval on the circle [-pi, pi] with wraparound; inverted
    (lo > hi) means it wraps through +/-pi.  Empty = [pi, -pi]."""

    lo: float
    hi: float

    @staticmethod
    def empty() -> "S1Interval":
        return S1Interval(math.pi, -math.pi)

    @staticmethod
    def full() -> "S1Interval":
        return S1Interval(-math.pi, math.pi)

    def is_empty(self) -> bool:
        return self.lo == math.pi and self.hi == -math.pi

    def is_full(self) -> bool:
        return self.lo == -math.pi and self.hi == math.pi

    def is_inverted(self) -> bool:
        return self.lo > self.hi

    def contains(self, p: float) -> bool:
        if p == -math.pi:
            p = math.pi
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def interior_contains(self, p: float) -> bool:
        if p == -math.pi:
            p = math.pi
        if self.is_inverted():
            return p > self.lo or p < self.hi
        return (self.lo < p < self.hi) or self.is_full()

    def contains_interval(self, y: "S1Interval") -> bool:
        if self.is_inverted():
            if y.is_inverted():
                return y.lo >= self.lo and y.hi <= self.hi
            return (y.lo >= self.lo or y.hi <= self.hi) and not self.is_empty()
        if y.is_inverted():
            return self.is_full() or y.is_empty()
        return y.lo >= self.lo and y.hi <= self.hi

    def intersects(self, y: "S1Interval") -> bool:
        if self.is_empty() or y.is_empty():
            return False
        if self.is_inverted():
            return y.is_inverted() or y.lo <= self.hi or y.hi >= self.lo
        if y.is_inverted():
            return y.lo <= self.hi or y.hi >= self.lo
        return y.lo <= self.hi and y.hi >= self.lo

    @staticmethod
    def from_point(p: float) -> "S1Interval":
        if p == -math.pi:
            p = math.pi
        return S1Interval(p, p)

    def get_length(self) -> float:
        length = self.hi - self.lo
        if length >= 0:
            return length
        length += 2 * math.pi
        return length if length > 0 else -1.0

    def expanded(self, margin: float) -> "S1Interval":
        if margin <= 0:
            return self
        if self.is_empty():
            return self
        if self.get_length() + 2 * margin + 2e-15 >= 2 * math.pi:
            return S1Interval.full()
        lo = math.remainder(self.lo - margin, 2 * math.pi)
        if lo <= -math.pi:
            lo = math.pi
        hi = math.remainder(self.hi + margin, 2 * math.pi)
        if hi <= -math.pi:
            hi = math.pi
        return S1Interval(lo, hi)

    def intersection(self, y: "S1Interval") -> "S1Interval":
        if y.is_empty():
            return S1Interval.empty()
        if self.contains(y.lo):
            if self.contains(y.hi):
                # either y inside self, or self inside y
                if y.contains_interval(self):
                    return S1Interval(self.lo, self.hi)
                return S1Interval(y.lo, y.hi)
            return S1Interval(y.lo, self.hi)
        if self.contains(y.hi):
            return S1Interval(self.lo, y.hi)
        if y.contains(self.lo):
            return S1Interval(self.lo, self.hi)
        return S1Interval.empty()

    def add_point(self, p: float) -> "S1Interval":
        if p == -math.pi:
            p = math.pi
        if self.contains(p):
            return S1Interval(self.lo, self.hi)
        if self.is_empty():
            return S1Interval(p, p)
        dlo = _positive_distance(p, self.lo)
        dhi = _positive_distance(self.hi, p)
        if dlo < dhi:
            return S1Interval(p, self.hi)
        return S1Interval(self.lo, p)


def _positive_distance(a: float, b: float) -> float:
    d = b - a
    if d >= 0:
        return d
    return (b + math.pi) - (a - math.pi)


@dataclass
class LatLngRect:
    """lat interval x lng interval (radians); lng wraps at +/-pi."""

    lat_lo: float
    lat_hi: float
    lng: S1Interval

    @staticmethod
    def from_degrees(lat_lo: float, lat_hi: float, lng_lo: float, lng_hi: float) -> "LatLngRect":
        return LatLngRect(
            math.radians(lat_lo),
            math.radians(lat_hi),
            S1Interval(math.radians(lng_lo), math.radians(lng_hi)),
        )

    @staticmethod
    def empty() -> "LatLngRect":
        return LatLngRect(1.0, 0.0, S1Interval.empty())

    @staticmethod
    def full() -> "LatLngRect":
        return LatLngRect(-math.pi / 2, math.pi / 2, S1Interval.full())

    def is_empty(self) -> bool:
        return self.lat_lo > self.lat_hi or self.lng.is_empty()

    def add_point_degrees(self, lat: float, lng: float) -> "LatLngRect":
        """Grow to include the point (s2latlng_rect.d addPoint)."""
        la, ln = math.radians(lat), math.radians(lng)
        if self.is_empty():
            return LatLngRect(la, la, S1Interval.from_point(ln))
        return LatLngRect(
            min(self.lat_lo, la), max(self.lat_hi, la), self.lng.add_point(ln)
        )

    def lo_degrees(self) -> tuple:
        """(lat, lng) of the lower-left corner in degrees (reference lo())."""
        return (math.degrees(self.lat_lo), math.degrees(self.lng.lo))

    def hi_degrees(self) -> tuple:
        return (math.degrees(self.lat_hi), math.degrees(self.lng.hi))

    def contains_latlng_radians(self, lat: float, lng: float) -> bool:
        return self.lat_lo <= lat <= self.lat_hi and self.lng.contains(lng)

    def contains_point(self, p) -> bool:
        lat = math.atan2(p[2], math.hypot(p[0], p[1]))
        lng = math.atan2(p[1], p[0])
        return self.contains_latlng_radians(lat, lng)

    def interior_contains_latlng_radians(self, lat: float, lng: float) -> bool:
        """Strict interior (boundary excluded; s2latlng_rect.d interiorContains)."""
        return self.lat_lo < lat < self.lat_hi and self.lng.interior_contains(lng)

    def interior_contains_point(self, p) -> bool:
        lat = math.atan2(p[2], math.hypot(p[0], p[1]))
        lng = math.atan2(p[1], p[0])
        return self.interior_contains_latlng_radians(lat, lng)

    def contains_rect(self, y: "LatLngRect") -> bool:
        if y.is_empty():
            return True
        return (
            self.lat_lo <= y.lat_lo
            and self.lat_hi >= y.lat_hi
            and self.lng.contains_interval(y.lng)
        )

    def intersects_rect(self, y: "LatLngRect") -> bool:
        if self.is_empty() or y.is_empty():
            return False
        return (
            self.lat_lo <= y.lat_hi
            and self.lat_hi >= y.lat_lo
            and self.lng.intersects(y.lng)
        )

    # -- cell predicates ---------------------------------------------------
    # contains: sound via the cell's rect bound (bound superset of cell).
    # may_intersect: conservative superset via rect-bound intersection; a
    # valid covering only requires may_intersect to never under-report
    # (SURVEY.md §2.6 note).  Exactness matches the reference for contains.
    def contains_cell(self, cell: Cell) -> bool:
        return self.contains_rect(cell_rect_bound(cell))

    def may_intersect_cell(self, cell: Cell) -> bool:
        return self.intersects_rect(cell_rect_bound(cell))

    def cell_union_bound(self) -> list[CellId]:
        return self.get_cap_bound().cell_union_bound()

    def get_cap_bound(self) -> "Cap":
        # Bounding cap around the rect: cap over the pole-most edge circle or
        # around the center, whichever is smaller (simplified, conservative).
        if self.is_empty():
            return Cap.empty()
        # pole-centered cap
        if self.lat_lo + self.lat_hi < 0:
            pole_cap = Cap((0.0, 0.0, -1.0), chord2_from_radians(self.lat_hi + math.pi / 2))
        else:
            pole_cap = Cap((0.0, 0.0, 1.0), chord2_from_radians(math.pi / 2 - self.lat_lo))
        if self.lng.is_full():
            return pole_cap
        # mid-point cap covering the 4 corners
        mid_lat = 0.5 * (self.lat_lo + self.lat_hi)
        lng_lo, lng_hi = self.lng.lo, self.lng.hi
        span = lng_hi - lng_lo if lng_hi >= lng_lo else lng_hi - lng_lo + 2 * math.pi
        mid_lng = lng_lo + 0.5 * span
        if mid_lng > math.pi:
            mid_lng -= 2 * math.pi
        mid = latlng_point(math.degrees(mid_lat), math.degrees(mid_lng))
        cap = Cap(mid, -1.0)
        for lat in (self.lat_lo, self.lat_hi):
            for lng in (lng_lo, lng_hi):
                cap.add_point(latlng_point(math.degrees(lat), math.degrees(lng)))
        # rect edges can bulge beyond corner points; pad by a cell-safe margin
        cap.radius2 = chord2_add(cap.radius2, chord2_from_radians(1e-9)) if cap.radius2 >= 0 else cap.radius2
        if pole_cap.radius2 < cap.radius2:
            return pole_cap
        return cap


_POLE_MIN_LAT = math.asin(math.sqrt(1.0 / 3.0)) - 0.5 * DBL_EPSILON


def cell_rect_bound(cell: Cell) -> LatLngRect:
    """Conservative lat/lng bound of a cell (s2cell.d getRectBound shape)."""
    if cell.level == 0:
        q = math.pi / 4
        if cell.face == 0:
            return LatLngRect(-q, q, S1Interval(-q, q))
        if cell.face == 1:
            return LatLngRect(-q, q, S1Interval(q, 3 * q))
        if cell.face == 2:
            return LatLngRect(_POLE_MIN_LAT, math.pi / 2, S1Interval.full())
        if cell.face == 3:
            return LatLngRect(-q, q, S1Interval(3 * q, -3 * q))
        if cell.face == 4:
            return LatLngRect(-q, q, S1Interval(-3 * q, -q))
        return LatLngRect(-math.pi / 2, -_POLE_MIN_LAT, S1Interval.full())

    # level > 0: lat/lng extremes are attained at the vertices.
    lats = []
    lngs = []
    for k in range(4):
        v = cell.get_vertex(k)
        lats.append(math.atan2(v[2], math.hypot(v[0], v[1])))
        lngs.append(math.atan2(v[1], v[0]))
    lat_lo = min(lats) - 2 * DBL_EPSILON
    lat_hi = max(lats) + 2 * DBL_EPSILON
    lng_iv = S1Interval.empty()
    for lng in lngs:
        lng_iv = lng_iv.add_point(lng)
    # expand lng by 2eps with clamping to full
    if not lng_iv.is_full():
        lo = lng_iv.lo - 2 * DBL_EPSILON
        hi = lng_iv.hi + 2 * DBL_EPSILON
        if lo < -math.pi:
            lo += 2 * math.pi
        if hi > math.pi:
            hi -= 2 * math.pi
        lng_iv = S1Interval(lo, hi)
    lat_lo = max(lat_lo, -math.pi / 2)
    lat_hi = min(lat_hi, math.pi / 2)
    # polar closure: a cell touching a pole must cover all longitudes
    if lat_lo <= -math.pi / 2 + 1e-15 or lat_hi >= math.pi / 2 - 1e-15:
        lng_iv = S1Interval.full()
    return LatLngRect(lat_lo, lat_hi, lng_iv)
