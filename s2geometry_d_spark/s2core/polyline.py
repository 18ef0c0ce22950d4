"""S2Polyline as a first-class region: coverable, joinable, distance-queryable.

Semantics studied from the reference (vnayar/s2geometry-d
src/s2/s2polyline.d:53-381 — length, interpolate, project, getCapBound,
mayIntersect) — independent numpy re-expression.  The region API
(contains_cell / may_intersect_cell / cell_union_bound) drives the
RegionCoverer, so polylines can be covered and used in covering joins like
any other region.

``BufferedRegion`` wraps any edge-set object with a radius: "all points
within D of the polyline" becomes an ordinary coverable region whose
interior cells (wholly inside the buffer) skip the exact distance test —
the covering-expansion idea of S2CellUnion.expand expressed as a region.
"""

from __future__ import annotations

import math

import numpy as np

from . import measures
from .cellid import CellId
from .regions import Cap, Cell, chord2_between, chord2_from_radians, normalize


class Polyline:
    def __init__(self, vertices: list[tuple]):
        assert len(vertices) >= 2
        self.vertices = [tuple(map(float, v)) for v in vertices]
        self._A = np.asarray(self.vertices[:-1], dtype=np.float64)
        self._B = np.asarray(self.vertices[1:], dtype=np.float64)

    @staticmethod
    def from_latlngs(latlngs: list[tuple]) -> "Polyline":
        from .regions import latlng_point

        return Polyline([latlng_point(lat, lng) for lat, lng in latlngs])

    def num_edges(self) -> int:
        return self._A.shape[0]

    def edges(self):
        return [
            (tuple(self._A[i]), tuple(self._B[i])) for i in range(self._A.shape[0])
        ]

    # -- measures ---------------------------------------------------------
    def length(self) -> float:
        return measures.polyline_length(self.vertices)

    def interpolate(self, t: float):
        return measures.polyline_interpolate(self.vertices, t)

    def project(self, p) -> tuple[tuple, int, float]:
        """(closest point on the polyline, edge index, squared chord
        distance) — s2polyline.d:335-381."""
        d2 = measures.edges_min_chord2_from_point(np.asarray(p), self._A, self._B)
        k = int(np.argmin(d2))
        q = measures.project_to_edge(tuple(p), tuple(self._A[k]), tuple(self._B[k]))
        return q, k, float(d2[k])

    def min_chord2(self, p) -> float:
        """Min squared chord distance from p to the polyline."""
        return float(
            measures.edges_min_chord2_from_point(np.asarray(p), self._A, self._B).min()
        )

    def intersects(self, other: "Polyline") -> bool:
        """True if the polylines share any point: a proper edge crossing OR
        a shared vertex / vertex-on-edge touch (crossingSign >= 0 with a
        vertex-crossing confirm — s2polyline.d intersects semantics)."""
        from . import predicates as pred

        na, nb = self._A.shape[0], other._A.shape[0]
        A = np.repeat(self._A, nb, axis=0)
        B = np.repeat(self._B, nb, axis=0)
        C = np.tile(other._A, (na, 1))
        D = np.tile(other._B, (na, 1))
        signs = pred.crossing_sign_pairs(A, B, C, D)
        if (signs > 0).any():
            return True
        for i in np.nonzero(signs == 0)[0]:
            if pred.vertex_crossing(
                tuple(A[i]), tuple(B[i]), tuple(C[i]), tuple(D[i])
            ) or tuple(A[i]) in (tuple(C[i]), tuple(D[i])) or tuple(B[i]) in (
                tuple(C[i]),
                tuple(D[i]),
            ):
                return True
        return False

    def subsample_vertices(self, tolerance_radians: float) -> list[int]:
        """Vertex indices of a simplified polyline within ``tolerance`` of
        the original, preserving direction/backtracking (the reference's
        wedge-interval greedy scan, s2polyline.d:470-493,847-922 — NOT
        Douglas-Peucker; independent re-expression)."""
        v = self.vertices
        n = len(v)
        if n == 0:
            return []
        tol = max(0.0, float(tolerance_radians))
        indices = [0]
        index = 0
        while index + 1 < n:
            nxt = _find_end_vertex(v, tol, index)
            if v[nxt] != v[index]:
                indices.append(nxt)
            index = nxt
        return indices

    # -- region API ---------------------------------------------------------
    def contains_cell(self, cell: Cell) -> bool:
        return False  # a curve contains no 2D region

    def may_intersect_cell(self, cell: Cell) -> bool:
        # conservative: some edge within the cell's circumradius of its center
        center = cell.cell_id.to_point()
        circ2 = max(chord2_between(center, cell.get_vertex(k)) for k in range(4))
        return self.min_chord2(center) <= circ2 * (1.0 + 1e-9) + 1e-15

    def get_rect_bound(self):
        """Edge-aware rect bound (s2latlng_rect_bounder.d): per-edge lat
        bulge included — vertex-only bounds under-cover arcs that peak past
        their endpoint latitudes."""
        from .rectbounder import chain_rect_bound

        return chain_rect_bound(self.vertices, closed=False)

    def get_cap_bound(self) -> Cap:
        # vertex-hull cap: sound below hemisphere spread (caps with radius
        # < 90deg are geodesically convex, so edges stay inside); otherwise
        # fall back to the edge-aware rect-derived cap (never full-sphere)
        from .rectbounder import rect_cap_bound

        cx = cy = cz = 0.0
        for v in self.vertices:
            cx, cy, cz = cx + v[0], cy + v[1], cz + v[2]
        norm = math.sqrt(cx * cx + cy * cy + cz * cz) / len(self.vertices)
        if norm >= 1e-9:
            c = normalize((cx, cy, cz))
            r2 = max(chord2_between(c, v) for v in self.vertices)
            if r2 < 2.0:
                return Cap(c, r2)
        return rect_cap_bound(self.get_rect_bound())

    def cell_union_bound(self) -> list[CellId]:
        return self.get_cap_bound().cell_union_bound()


def _find_end_vertex(v: list[tuple], tol: float, index: int) -> int:
    """Longest prefix from v[index] replaceable by one edge: track the wedge
    of ray angles whose rays pass within ``tol`` of every skipped vertex
    (1D S1Interval in the origin's tangent frame)."""
    from . import predicates as pred
    from .regions import S1Interval

    origin = v[index]
    xf = pred.ortho(origin)
    yf = (
        origin[1] * xf[2] - origin[2] * xf[1],
        origin[2] * xf[0] - origin[0] * xf[2],
        origin[0] * xf[1] - origin[1] * xf[0],
    )
    wedge = S1Interval.full()
    last_distance = 0.0
    idx = index + 1
    while idx < len(v):
        cand = v[idx]
        dot = sum(origin[i] * cand[i] for i in range(3))
        distance = math.acos(max(-1.0, min(1.0, dot)))
        # no simplified edges longer than 90 degrees (numeric stability)
        if distance > math.pi / 2 and last_distance > 0:
            break
        # vertices must advance along the ray (beyond the origin disc)
        if distance < last_distance and last_distance > tol:
            break
        last_distance = distance
        if distance <= tol:
            idx += 1
            continue
        dx = sum(cand[i] * xf[i] for i in range(3))
        dy = sum(cand[i] * yf[i] for i in range(3))
        center = math.atan2(dy, dx)
        if not wedge.contains(center):
            break
        half_angle = math.asin(min(1.0, math.sin(tol) / math.sin(distance)))
        wedge = wedge.intersection(S1Interval.from_point(center).expanded(half_angle))
        idx += 1
    return idx - 1


class BufferedRegion:
    """All points within ``radius_radians`` of a base object exposing
    ``min_chord2(point)`` and ``get_cap_bound()`` (e.g. a Polyline).

    Cell classification uses the triangle inequality on ANGLES (chord
    lengths are not additive): with d = angle(center, base) and
    r = circumradius(cell),

    * d + r <= buffer  -> the whole cell is inside the buffer (interior);
    * d - r >  buffer  -> the cell cannot intersect the buffer.
    """

    def __init__(self, base, radius_radians: float):
        self.base = base
        self.radius = float(radius_radians)

    def _angles(self, cell: Cell) -> tuple[float, float]:
        center = cell.cell_id.to_point()
        d2 = self.base.min_chord2(center)
        d = 2.0 * math.asin(min(1.0, 0.5 * math.sqrt(max(0.0, d2))))
        circ2 = max(chord2_between(center, cell.get_vertex(k)) for k in range(4))
        r = 2.0 * math.asin(min(1.0, 0.5 * math.sqrt(circ2)))
        return d, r

    def contains_cell(self, cell: Cell) -> bool:
        d, r = self._angles(cell)
        return d + r <= self.radius * (1.0 - 1e-12)

    def may_intersect_cell(self, cell: Cell) -> bool:
        d, r = self._angles(cell)
        return d - r <= self.radius * (1.0 + 1e-12)

    def get_cap_bound(self) -> Cap:
        base_cap = self.base.get_cap_bound()
        if base_cap.is_full():
            return base_cap
        ang = base_cap.radius_radians() + self.radius
        if ang >= math.pi:
            return Cap.full()
        return Cap(base_cap.center, chord2_from_radians(ang))

    def cell_union_bound(self) -> list[CellId]:
        return self.get_cap_bound().cell_union_bound()
