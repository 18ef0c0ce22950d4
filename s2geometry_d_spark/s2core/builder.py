"""Minimal S2Builder-style snap rounding (reference: s2builder.d:100-700,
S2CellIdSnapFunction in builder/ — the full builder also rebuilds graphs
across self-intersections; this module implements the snap-function layer
the overlay pipeline actually needs for dirty inputs).

Semantics implemented:

* ``snap_to_cell_center``: vertices snap to their level-L cell center (the
  S2CellIdSnapFunction: snap radius <= half the level-L diagonal);
* consecutive duplicate vertices merge; zero-length and back-and-forth
  (A->B->A) degenerate edge pairs cancel; loops that collapse below 3
  distinct vertices vanish (the builder's degeneracy removal for the
  polygon layer with degenerate edges disabled);
* ``snap_polygon`` applies both per loop and drops vanished loops.

Snapped geometry is guaranteed to move each vertex by at most the level-L
max diagonal / 2 (metrics.MAX_DIAG), which callers use as the error bound.
"""

from __future__ import annotations

from . import metrics
from .cellid import CellId
from .loops import Loop, Polygon


def snap_radius(level: int) -> float:
    """Max vertex movement (radians) of cell-center snapping at a level."""
    return 0.5 * metrics.MAX_DIAG.get_value(level)


def snap_to_cell_center(p, level: int):
    cid = CellId.from_point(p[0], p[1], p[2]).parent(level)
    return cid.to_point()


def _cancel_degeneracies(verts: list) -> list:
    """Remove consecutive duplicates and A->B->A spikes until stable."""
    changed = True
    while changed and len(verts) >= 2:
        changed = False
        out = []
        n = len(verts)
        i = 0
        while i < n:
            v = verts[i]
            if out and v == out[-1]:
                i += 1
                changed = True
                continue
            out.append(v)
            i += 1
        if len(out) >= 2 and out[0] == out[-1]:
            out.pop()
            changed = True
        # spike removal: X, Y, X -> X (circular)
        n = len(out)
        if n >= 3:
            spiked = []
            skip = set()
            for j in range(n):
                if out[(j - 1) % n] == out[(j + 1) % n] and n - len(skip) > 2:
                    # middle of a spike: drop this vertex and one neighbor
                    skip.add(j)
                    skip.add((j + 1) % n)
                    changed = True
                    break
            if skip:
                out = [v for j, v in enumerate(out) if j not in skip]
        verts = out
    return verts


def snap_loop(vertices: list, level: int) -> list | None:
    """Snap a loop's vertices to level-L cell centers and cancel the
    degeneracies snapping creates; None when the loop collapses."""
    snapped = [snap_to_cell_center(v, level) for v in vertices]
    cleaned = _cancel_degeneracies(snapped)
    if len(set(cleaned)) < 3:
        return None
    return cleaned


def snap_polygon(poly: Polygon, level: int) -> Polygon | None:
    """Snap every loop; drop collapsed loops; None if nothing survives."""
    loops = []
    for lp in poly.loops:
        vs = snap_loop(lp.vertices, level)
        if vs is not None:
            loops.append(Loop(vs))
    if not loops:
        return None
    return Polygon(loops, poly.poly_id)


# ======================================================== builder v2
# Snap-rounding framework with the reference's SnapFunction contract
# (s2builder.d:100-700; builder/util/snap_functions.d:44-470): candidate
# snap sites from SnapPoint(), greedy site selection at snap-radius
# separation, nearest-site vertex mapping, self-intersection splitting,
# edge rerouting through nearby sites, degenerate-edge cleanup and loop
# reassembly.  The guarantees implemented (and pinned by tests):
#
#   1. every output vertex is a SnapPoint() value;
#   2. vertices move at most snap_radius;
#   3. output vertices are separated by >= min_vertex_separation;
#   4. self-intersections are eliminated (split_crossing_edges);
#   5. idempotency: building the output again is a no-op.

import math as _math

from . import measures


class SnapFunction:
    """Base contract (s2builder.d SnapFunction)."""

    snap_radius: float  # radians

    def snap_point(self, p):  # pragma: no cover - abstract
        raise NotImplementedError

    def min_vertex_separation(self) -> float:
        raise NotImplementedError


class IdentitySnapFunction(SnapFunction):
    """Vertices stay put; merging happens only through site selection
    (snap_functions.d:44-110)."""

    def __init__(self, snap_radius_radians: float = 0.0):
        self.snap_radius = float(snap_radius_radians)

    def snap_point(self, p):
        return tuple(p)

    def min_vertex_separation(self) -> float:
        return self.snap_radius


class S2CellIdSnapFunction(SnapFunction):
    """Snap to level-L cell centers (snap_functions.d:126-340).

    min snap radius = 0.5 * MAX_DIAG(level) + 4 eps (the reference's
    numeric-error allowance); min_vertex_separation = max(MIN_EDGE(level),
    0.548 * r, r - 0.5 * MAX_DIAG(level))."""

    def __init__(self, level: int, snap_radius_radians: float | None = None):
        self.level = int(level)
        min_r = self.min_snap_radius_for_level(level)
        if snap_radius_radians is None:
            snap_radius_radians = min_r
        if snap_radius_radians < min_r:
            raise ValueError(
                f"snap_radius {snap_radius_radians} below the level-{level} "
                f"minimum {min_r}"
            )
        self.snap_radius = float(snap_radius_radians)

    @staticmethod
    def min_snap_radius_for_level(level: int) -> float:
        return 0.5 * metrics.MAX_DIAG.get_value(level) + 4 * 2.220446049250313e-16

    @staticmethod
    def level_for_max_snap_radius(snap_radius_radians: float) -> int:
        return metrics.MAX_DIAG.get_level_for_max_value(
            2 * (snap_radius_radians - 4 * 2.220446049250313e-16)
        )

    def snap_point(self, p):
        return snap_to_cell_center(p, self.level)

    def min_vertex_separation(self) -> float:
        min_edge = metrics.MIN_EDGE.get_value(self.level)
        max_diag = metrics.MAX_DIAG.get_value(self.level)
        return max(min_edge, 0.548 * self.snap_radius, self.snap_radius - 0.5 * max_diag)


class IntLatLngSnapFunction(SnapFunction):
    """Snap to integer (lat, lng) at 10^exponent per degree — E5/E6/E7
    coordinates (snap_functions.d:342-470).

    min snap radius = (1/sqrt(2)) * 10^-exp degrees + (9*sqrt(2)+1.5) eps;
    min_vertex_separation uses the reference's (2-sqrt(2))/2 proportional
    bound folded to the conservative max() form."""

    MIN_EXPONENT = 0
    MAX_EXPONENT = 10

    def __init__(self, exponent: int, snap_radius_radians: float | None = None):
        if not (self.MIN_EXPONENT <= exponent <= self.MAX_EXPONENT):
            raise ValueError(exponent)
        self.exponent = int(exponent)
        self._from_degrees = 10.0 ** exponent
        self._to_degrees = 1.0 / self._from_degrees
        min_r = self.min_snap_radius_for_exponent(exponent)
        if snap_radius_radians is None:
            snap_radius_radians = min_r
        if snap_radius_radians < min_r:
            raise ValueError(
                f"snap_radius {snap_radius_radians} below the E{exponent} "
                f"minimum {min_r}"
            )
        self.snap_radius = float(snap_radius_radians)

    @staticmethod
    def min_snap_radius_for_exponent(exponent: int) -> float:
        eps = 2.220446049250313e-16
        return _math.radians(_math.sqrt(0.5) / 10.0 ** exponent) + (
            9 * _math.sqrt(2.0) + 1.5
        ) * eps

    def snap_point(self, p):
        lat = _math.degrees(_math.asin(max(-1.0, min(1.0, p[2]))))
        lng = _math.degrees(_math.atan2(p[1], p[0]))
        # round-half-even like the reference's lround? reference uses
        # round-half-away (lround); python round() is banker's — use
        # floor(x+0.5) to match lround for positive, ceil(x-0.5) negative
        def _lround(x: float) -> float:
            return _math.floor(x + 0.5) if x >= 0 else _math.ceil(x - 0.5)

        lat = _lround(lat * self._from_degrees) * self._to_degrees
        lng = _lround(lng * self._from_degrees) * self._to_degrees
        la, lo = _math.radians(lat), _math.radians(lng)
        return (
            _math.cos(la) * _math.cos(lo),
            _math.cos(la) * _math.sin(lo),
            _math.sin(la),
        )

    def min_vertex_separation(self) -> float:
        # reference: max((1 - 1/sqrt(2)) * r - const, 0.277 * r)
        return max(0.277 * self.snap_radius, (1 - _math.sqrt(0.5)) * self.snap_radius)


def _chord2(a, b) -> float:
    dx, dy, dz = a[0] - b[0], a[1] - b[1], a[2] - b[2]
    return dx * dx + dy * dy + dz * dz


def _chord2_of_angle(rad: float) -> float:
    s = _math.sin(min(rad, _math.pi) / 2.0)
    return 4.0 * s * s


def choose_sites(vertices: list, snap_fn: SnapFunction) -> list:
    """Greedy snap-site selection (s2builder.d: a candidate becomes a site
    only if it is >= snap_radius from every existing site); returns the
    sites in first-seen order."""
    r2 = _chord2_of_angle(snap_fn.snap_radius)
    sites: list = []
    for v in vertices:
        cand = snap_fn.snap_point(v)
        if all(_chord2(cand, s) >= r2 or cand == s for s in sites):
            if cand not in sites:
                sites.append(cand)
    return sites


def _nearest_site(p, sites: list):
    best, bd = None, _math.inf
    for s in sites:
        d = _chord2(p, s)
        if d < bd:
            best, bd = s, d
    return best


def build_polyline(vertices: list, snap_fn: SnapFunction):
    """Builder POLYLINE layer (builder/util/s2polyline_layer.d semantics
    with the default options — PATH polyline type, sibling pairs kept,
    degenerate edges discarded): vertices snap to greedily-chosen sites,
    zero-length edges (consecutive vertices snapping to the same site)
    collapse, and a line left with fewer than 2 vertices vanishes
    (returns None).  Unlike the polygon layer there is no crossing split
    or depth assignment — a polyline is just an edge chain."""
    verts = [tuple(v) for v in vertices]
    sites = choose_sites(verts, snap_fn)
    out: list = []
    for v in verts:
        s = _nearest_site(v, sites)
        if s is not None and (not out or s != out[-1]):
            out.append(s)
    if len(out) < 2:
        return None
    return out


def build_polygon(
    loops_vertices: list,
    snap_fn: SnapFunction,
    split_crossing_edges: bool = True,
):
    """Snap-round a (possibly dirty) polygon: self-intersections split,
    near-duplicate vertices merged to shared snap sites, edges rerouted
    through nearby sites, degeneracies cancelled, loops reassembled with
    nesting depths.

    Returns (loops, depths) where loops is a list of vertex lists
    (interior-left) and depths the s2polygon.d nesting depths — or
    ([], []) if everything collapses.  Reference pipeline:
    s2builder.d:100-700 + builder/util/s2polygon_layer.d."""
    from . import predicates as pred
    from .boolean import _stitch, assign_loop_depths, edge_intersection

    edges = []
    for vs in loops_vertices:
        n = len(vs)
        edges.extend((tuple(vs[i]), tuple(vs[(i + 1) % n])) for i in range(n))

    # 1. self-intersection splitting: add each crossing point to BOTH edges
    if split_crossing_edges:
        from .regions import chord2_between

        splits: dict = {i: [] for i in range(len(edges))}
        for i in range(len(edges)):
            a0, a1 = edges[i]
            for j in range(i + 1, len(edges)):
                b0, b1 = edges[j]
                if pred.crossing_sign(a0, a1, b0, b1) > 0:
                    x = edge_intersection(a0, a1, b0, b1)
                    splits[i].append(x)
                    splits[j].append(x)
        new_edges = []
        for i, (u, v) in enumerate(edges):
            pts = sorted(splits[i], key=lambda x: chord2_between(u, x))
            chain = [u, *pts, v]
            new_edges.extend(
                (chain[k], chain[k + 1])
                for k in range(len(chain) - 1)
                if chain[k] != chain[k + 1]
            )
        edges = new_edges

    # 2. site selection over all endpoint vertices (input order)
    verts_in_order = [w for e in edges for w in e]
    sites = choose_sites(verts_in_order, snap_fn)

    # 3. snap endpoints to nearest site; reroute edges through other sites
    # within snap_radius of the original edge, ordered along it
    r2 = _chord2_of_angle(snap_fn.snap_radius)
    snapped_edges = []
    for u, v in edges:
        su, sv = _nearest_site(u, sites), _nearest_site(v, sites)
        mid = []
        for s in sites:
            if s == su or s == sv:
                continue
            if measures.point_edge_distance2(s, u, v) <= r2:
                mid.append(s)
        mid.sort(key=lambda s: _chord2(u, s))
        chain = [su, *mid, sv]
        snapped_edges.extend(
            (chain[k], chain[k + 1])
            for k in range(len(chain) - 1)
            if chain[k] != chain[k + 1]
        )

    # 4. degeneracy cleanup: cancel sibling pairs (u,v)+(v,u), dedupe
    # duplicate directed edges (polygon layer, degenerate edges disabled)
    from collections import Counter

    count = Counter(snapped_edges)
    cleaned = []
    for e in list(count):
        u, v = e
        sib = (v, u)
        if sib in count:
            k = min(count[e], count[sib])
            count[e] -= k
            count[sib] -= k
    cleaned = [e for e, c in count.items() if c > 0]

    if not cleaned:
        return [], []

    loops = [lp for lp in _stitch(cleaned) if len(lp) >= 3]
    if not loops:
        return [], []
    return loops, assign_loop_depths(loops)
