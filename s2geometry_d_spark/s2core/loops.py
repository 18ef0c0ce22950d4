"""Spherical loops and polygons with crossing-parity containment.

A Loop is a closed vertex chain with interior on the left (CCW = interior).
Containment is edge-crossing parity from a fixed anchor point whose own
containment is bootstrapped from the wedge test at vertex 1 — the same
two-step scheme the reference uses (vnayar/s2geometry-d
src/s2/s2loop.d:1382-1430,1485-1497); independent re-expression.

Polygons are loop sets with even-odd (shell/hole parity) semantics.
Region predicates (contains_cell / may_intersect_cell) drive the coverer.
"""

from __future__ import annotations

import math

import numpy as np

from . import predicates as pred
from .cellid import CellId
from .regions import Cap, Cell, chord2_between, latlng_point, normalize


def _apply_vertex_model(out, x, y, z, vertices, model: str):
    """Override containment for points exactly equal to a vertex: OPEN
    excludes them, CLOSED includes them (exact float equality — on-vertex
    queries are exact by construction, reference tests likewise)."""
    closed = model == "closed"
    for v in vertices:
        m = (x == v[0]) & (y == v[1]) & (z == v[2])
        if m.any():
            out = np.where(m, closed, out)
    return out


class Loop:
    def __init__(self, vertices: list[tuple]):
        """vertices: list of unit xyz tuples, implicitly closed, CCW interior.
        The reference's one-vertex empty/full sentinels (s2loop.d:1374-1379:
        [(0,0,1)] = empty, [(0,0,-1)] = full) are accepted; all other loops
        need >= 3 vertices."""
        if len(vertices) == 1 and tuple(vertices[0]) in (
            (0.0, 0.0, 1.0),
            (0.0, 0.0, -1.0),
        ):
            self.vertices = [tuple(map(float, v)) for v in vertices]
            self.origin_inside = self.vertices[0][2] < 0  # full contains all
            return
        assert len(vertices) >= 3
        self.vertices = [tuple(map(float, v)) for v in vertices]
        self.origin_inside = False
        self._init_origin()

    @staticmethod
    def from_latlngs(latlngs: list[tuple]) -> "Loop":
        return Loop([latlng_point(lat, lng) for lat, lng in latlngs])

    @staticmethod
    def make_regular(center_lat: float, center_lng: float, radius_deg: float, n: int) -> "Loop":
        """Regular n-gon inscribed in a cap (s2loop.d:952-964 semantics)."""
        z = latlng_point(center_lat, center_lng)
        # build a frame
        zv = np.array(z)
        a = np.array([1.0, 0.0, 0.0]) if abs(zv[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
        xv = np.cross(zv, a)
        xv /= np.linalg.norm(xv)
        yv = np.cross(zv, xv)
        r = math.radians(radius_deg)
        verts = []
        for k in range(n):
            # CCW when seen from outside the sphere at the center
            ang = 2 * math.pi * k / n
            p = math.cos(r) * zv + math.sin(r) * (math.cos(ang) * xv + math.sin(ang) * yv)
            verts.append(tuple(p / np.linalg.norm(p)))
        return Loop(verts)

    def edges(self):
        v = self.vertices
        return [(v[i], v[(i + 1) % len(v)]) for i in range(len(v))]

    def _init_origin(self) -> None:
        v = self.vertices
        self.origin_inside = False
        v1_inside = pred.ordered_ccw(pred.ortho(v[1]), v[0], v[2], v[1])
        if v1_inside != self.contains_point(v[1]):
            self.origin_inside = True

    # -- containment -----------------------------------------------------
    def contains_point(self, p, model: str = "semi_open") -> bool:
        """Vertex models (s2contains_point_query.d:50-72): for OPEN/CLOSED a
        point equal to a loop VERTEX is decided by the model directly;
        SEMI_OPEN (default) uses edge-or-vertex crossing parity, which
        contains each boundary point exactly once between adjacent loops."""
        pt = tuple(p)
        if model != "semi_open" and pt in set(self.vertices):
            return model == "closed"
        inside = self.origin_inside
        for c, d in self.edges():
            inside ^= pred.edge_or_vertex_crossing(pred.ORIGIN, pt, c, d)
        return inside

    def contains_points_vec(self, x, y, z, model: str = "semi_open") -> np.ndarray:
        counts = pred.crossings_with_fixed_edges(
            pred.ORIGIN[0], pred.ORIGIN[1], pred.ORIGIN[2], x, y, z, self.edges()
        )
        out = (counts & 1).astype(bool) ^ self.origin_inside
        if model != "semi_open":
            out = _apply_vertex_model(out, x, y, z, self.vertices, model)
        return out


class Polygon:
    """Set of loops with even-odd containment (shells and holes)."""

    def __init__(self, loops: list[Loop], poly_id: str = ""):
        self.loops = loops
        self.poly_id = poly_id
        self._all_edges = [e for lp in loops for e in lp.edges()]
        self._base_parity = bool(sum(lp.origin_inside for lp in loops) & 1)

    @staticmethod
    def from_loops_latlng(loops_latlng: list[list[tuple]], poly_id: str = "") -> "Polygon":
        return Polygon([Loop.from_latlngs(ll) for ll in loops_latlng], poly_id)

    def num_edges(self) -> int:
        return len(self._all_edges)

    def all_vertices(self) -> list[tuple]:
        return [v for lp in self.loops for v in lp.vertices]

    # -- point containment ---------------------------------------------------
    def contains_point(self, p, model: str = "semi_open") -> bool:
        pt = tuple(p)
        if model != "semi_open" and pt in set(self.all_vertices()):
            return model == "closed"
        inside = self._base_parity
        for c, d in self._all_edges:
            inside ^= pred.edge_or_vertex_crossing(pred.ORIGIN, pt, c, d)
        return inside

    def contains_points_vec(self, x, y, z, model: str = "semi_open") -> np.ndarray:
        counts = pred.crossings_with_fixed_edges(
            pred.ORIGIN[0], pred.ORIGIN[1], pred.ORIGIN[2], x, y, z, self._all_edges
        )
        out = (counts & 1).astype(bool) ^ self._base_parity
        if model != "semi_open":
            out = _apply_vertex_model(out, x, y, z, self.all_vertices(), model)
        return out

    def contains_latlngs_vec(self, lat_deg, lng_deg, model: str = "semi_open") -> np.ndarray:
        from . import coords

        x, y, z = coords.latlng_to_xyz(lat_deg, lng_deg)
        return self.contains_points_vec(x, y, z, model)

    # -- region predicates for the coverer -----------------------------------
    def _any_edge_crossing(self, cell: Cell) -> bool:
        cv = [cell.get_vertex(k) for k in range(4)]
        for k in range(4):
            a, b = cv[k], cv[(k + 1) & 3]
            for c, d in self._all_edges:
                if pred.crossing_sign(a, b, c, d) >= 0:
                    return True
        return False

    def may_intersect_cell(self, cell: Cell) -> bool:
        # (1) any loop vertex inside the cell
        for lp in self.loops:
            for v in lp.vertices:
                if cell.contains_point(v):
                    return True
        # (2) any cell vertex inside the polygon
        for k in range(4):
            if self.contains_point(cell.get_vertex(k)):
                return True
        # (3) boundary crossing
        return self._any_edge_crossing(cell)

    def contains_cell(self, cell: Cell) -> bool:
        # all 4 vertices inside, no boundary crossings, no loop vertex inside
        for k in range(4):
            if not self.contains_point(cell.get_vertex(k)):
                return False
        for lp in self.loops:
            for v in lp.vertices:
                if cell.contains_point(v):
                    return False
        return not self._any_edge_crossing(cell)

    # -- polygon x polygon relations (boolean-op predicate tier) -----------
    def _boundary_crosses(self, other: "Polygon") -> bool:
        """Any PROPER crossing between the two boundaries (vectorized
        triage -> exact over all edge pairs).  Driver-side relation for
        moderate polygons; the distributed form of this question is
        operators.crossing.crossing_edges_join."""
        ea = self._all_edges
        eb = other._all_edges
        A = np.repeat(np.asarray([e[0] for e in ea]), len(eb), axis=0)
        B = np.repeat(np.asarray([e[1] for e in ea]), len(eb), axis=0)
        C = np.tile(np.asarray([e[0] for e in eb]), (len(ea), 1))
        D = np.tile(np.asarray([e[1] for e in eb]), (len(ea), 1))
        return bool((pred.crossing_sign_pairs(A, B, C, D) > 0).any())

    def intersects(self, other: "Polygon") -> bool:
        """True if the regions share any point (semi-open boundary
        semantics): boundaries cross, or one region swallows a vertex of
        the other (with disjoint boundaries, each loop is wholly in or
        out)."""
        if self._boundary_crosses(other):
            return True
        return any(self.contains_point(v) for v in other.all_vertices()) or any(
            other.contains_point(v) for v in self.all_vertices()
        )

    def contains_polygon(self, other: "Polygon") -> bool:
        """True if other's region is a subset of this region: no boundary
        crossings, every vertex of other inside self, and no vertex of
        self inside other (a self boundary vertex interior to other would
        mean a hole of self cuts into other — see even-odd annulus cases
        in tests)."""
        if self._boundary_crosses(other):
            return False
        if not all(self.contains_point(v) for v in other.all_vertices()):
            return False
        return not any(other.contains_point(v) for v in self.all_vertices())

    def get_rect_bound(self):
        """Edge-aware lat/lng rect bound (s2latlng_rect_bounder.d): union
        of per-edge bounds — which include the latitude bulge past vertex
        latitudes — expanded to a pole when the interior contains it."""
        from .rectbounder import chain_rect_bound, rect_union
        from .regions import LatLngRect, S1Interval

        out = None
        for lp in self.loops:
            b = chain_rect_bound(lp.vertices, closed=True)
            out = b if out is None else rect_union(out, b)
        if self.contains_point((0.0, 0.0, 1.0)):
            out = rect_union(out, LatLngRect(out.lat_lo, math.pi / 2, S1Interval.full()))
        if self.contains_point((0.0, 0.0, -1.0)):
            out = rect_union(out, LatLngRect(-math.pi / 2, out.lat_hi, S1Interval.full()))
        return out

    def get_cap_bound(self) -> Cap:
        """Sound bounding cap via the edge-aware rect bound (replaces the
        round-2 full-sphere fallback at hemisphere scale): take the smaller
        of the rect-derived cap and the centroid-vertex cap when the latter
        is sound (< hemisphere vertex spread)."""
        from .rectbounder import rect_cap_bound

        best = rect_cap_bound(self.get_rect_bound())
        cx = cy = cz = 0.0
        n = 0
        for lp in self.loops:
            for v in lp.vertices:
                cx += v[0]
                cy += v[1]
                cz += v[2]
                n += 1
        norm = math.sqrt(cx * cx + cy * cy + cz * cz) / n
        if norm >= 1e-9:
            c = normalize((cx / n, cy / n, cz / n))
            r2 = 0.0
            for lp in self.loops:
                for v in lp.vertices:
                    r2 = max(r2, chord2_between(c, v))
            if r2 < 2.0 and r2 < best.radius2:
                # vertex hull bounds the interior only below hemisphere
                # spread; within that it is usually tighter than the rect cap
                best = Cap(c, r2)
        return best

    def cell_union_bound(self) -> list[CellId]:
        return self.get_cap_bound().cell_union_bound()


# --------------------------------------------------------------- validation


def find_validation_error(loops_vertices: list) -> str | None:
    """The reference's validity contract for loops/polygons
    (s2loop.d:230-287 findValidationError + findSelfIntersection;
    s2polygon.d loop-relation checks), as a single function over a list of
    vertex-list loops.  Returns a human-readable error string, or None for
    valid geometry.  Checks, in reference order:

    1. NOT_UNIT_LENGTH — every vertex a unit vector;
    2. LOOP_NOT_ENOUGH_VERTICES — >= 3 vertices per loop;
    3. DUPLICATE_VERTICES — no degenerate edge (v[i] == v[i+1]);
    4. ANTIPODAL_VERTICES — no edge between antipodal points;
    5. LOOP_SELF_INTERSECTION — no two edges of one loop cross, and
       non-adjacent edges may not even touch (shared vertices between
       non-adjacent edges = duplicate vertex in the loop);
    6. POLYGON_LOOPS_CROSS — edges of different loops may not cross.

    Pairs with builder-v2 ``build_polygon``: dirty inputs FAIL here, the
    repaired output PASSES (the validity-repair pipeline's gate)."""
    import math as _math

    from . import predicates as _pred

    for li, vs in enumerate(loops_vertices):
        for i, v in enumerate(vs):
            n2 = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
            if abs(n2 - 1.0) > 1e-10:
                return f"NOT_UNIT_LENGTH: loop {li} vertex {i}"
        if len(vs) < 3:
            return f"LOOP_NOT_ENOUGH_VERTICES: loop {li}"
        n = len(vs)
        for i in range(n):
            a, b = vs[i], vs[(i + 1) % n]
            if a == b:
                return f"DUPLICATE_VERTICES: loop {li} edge {i} is degenerate"
            if a == (-b[0], -b[1], -b[2]):
                return f"ANTIPODAL_VERTICES: loop {li} edge {i}"
        # self-intersection: any proper crossing between edges; any shared
        # vertex between NON-adjacent edges (a repeated loop vertex)
        for i in range(n):
            a, b = vs[i], vs[(i + 1) % n]
            for j in range(i + 1, n):
                c, d = vs[j], vs[(j + 1) % n]
                adjacent = j == i + 1 or (i == 0 and j == n - 1)
                if _pred.crossing_sign(a, b, c, d) > 0:
                    return f"LOOP_SELF_INTERSECTION: loop {li} edges {i},{j}"
                if not adjacent and (c in (a, b) or d in (a, b)):
                    return (
                        f"DUPLICATE_VERTICES: loop {li} vertex shared by "
                        f"non-adjacent edges {i},{j}"
                    )
    # cross-loop crossings
    for li in range(len(loops_vertices)):
        for lj in range(li + 1, len(loops_vertices)):
            va, vb = loops_vertices[li], loops_vertices[lj]
            for i in range(len(va)):
                a, b = va[i], va[(i + 1) % len(va)]
                for j in range(len(vb)):
                    c, d = vb[j], vb[(j + 1) % len(vb)]
                    if _pred.crossing_sign(a, b, c, d) > 0:
                        return (
                            f"POLYGON_LOOPS_CROSS: loop {li} edge {i} x "
                            f"loop {lj} edge {j}"
                        )
    return None
