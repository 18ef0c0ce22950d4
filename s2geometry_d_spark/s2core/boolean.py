"""Polygon boolean overlay: A∩B, A∪B, A−B geometry on the sphere.

Reference: s2boolean_operation.d:225-481 (over s2builder.d's edge graph).
The reference builds a snap-rounded graph of all edges and classifies graph
edges by containment; for two clean input polygons the same semantics
reduce to a spherical Weiler–Atherton walk, which is what this module
implements:

1. crossing detection between the edge sets (crossingSign, the same
   triage→exact cascade the crossing-edge join uses);
2. intersection points from the two great-circle normals
   (s2edge_crossings getIntersection semantics, stated in the same
   expression order as the SQL oracle so both engines agree bitwise);
3. edges split at their crossings (ordered along the arc by chord distance
   from the edge origin);
4. each sub-edge kept or dropped by the midpoint's containment in the
   OTHER polygon — midpoints of split edges are strictly inside/outside in
   generic position (op table: ∩ keeps inside/inside, ∪ outside/outside,
   A−B keeps A-outside plus B-inside REVERSED);
5. stitching by exact successor keys: crossing points are shared Python
   objects between both chains, so start-point lookup is exact float
   equality, no snapping needed.

Inputs are polygons with interior-on-the-left orientation (shells CCW,
holes CW) and edges shorter than 180 deg.  MULTI-LOOP polygons (shell +
hole nesting, s2polygon.d:129+ depth semantics) are fully supported: the
interior-left classification (ILRegion parity over the complete edge set)
and the exact-successor stitching are loop-structure-agnostic, so annulus
operands, island-producing differences and multi-loop results all run
through the same walk (oracled via polygon_overlay_holes{,_diff,_union}).
Shared-vertex / tangency cases are out of generic position;
S2ContainsVertexQuery (s2contains_vertex_query.d) is provided for the
shared-vertex containment decisions and is exercised by its own tests.
"""

from __future__ import annotations

import math

from . import predicates as pred
from .measures import signed_triangle_area
from .regions import chord2_between, normalize

# ------------------------------------------------------------- intersection


def edge_intersection(a0, a1, b0, b1):
    """Intersection point of two properly-crossing geodesic edges.

    Expression order deliberately mirrors the SQL oracle fragment
    (raw cross products, sign-corrected toward the A edge's midpoint,
    normalized last) so both engines produce bitwise-identical doubles.
    """
    n1 = (
        a0[1] * a1[2] - a0[2] * a1[1],
        a0[2] * a1[0] - a0[0] * a1[2],
        a0[0] * a1[1] - a0[1] * a1[0],
    )
    n2 = (
        b0[1] * b1[2] - b0[2] * b1[1],
        b0[2] * b1[0] - b0[0] * b1[2],
        b0[0] * b1[1] - b0[1] * b1[0],
    )
    x = (
        n1[1] * n2[2] - n1[2] * n2[1],
        n1[2] * n2[0] - n1[0] * n2[2],
        n1[0] * n2[1] - n1[1] * n2[0],
    )
    d = x[0] * (a0[0] + a1[0]) + x[1] * (a0[1] + a1[1]) + x[2] * (a0[2] + a1[2])
    if d < 0:
        x = (-x[0], -x[1], -x[2])
    n = math.sqrt(x[0] * x[0] + x[1] * x[1] + x[2] * x[2])
    return (x[0] / n, x[1] / n, x[2] / n)


# ---------------------------------------------------- S2ContainsVertexQuery


def contains_vertex_sign(target, incident_edges) -> int:
    """Shared-vertex containment (s2contains_vertex_query.d): given the
    directed edges of a region incident to ``target`` — (direction_point,
    +1 outgoing / -1 incoming) — returns +1 if the region contains the
    vertex, -1 if not, 0 if the boundary passes straight through (matched
    edges only).

    Rule: accumulate per-direction degree; among unmatched directions, the
    one LAST in CCW order from ortho(target) decides — outgoing means the
    interior (left side) wraps past the reference direction, so the vertex
    is contained."""
    degree: dict = {}
    for d, s in incident_edges:
        degree[d] = degree.get(d, 0) + s
    ref = pred.ortho(target)
    best_dir, best_sign = ref, 0
    for d, s in degree.items():
        if s == 0:
            continue
        if pred.ordered_ccw(ref, best_dir, d, target):
            best_dir, best_sign = d, s
    return 1 if best_sign > 0 else (-1 if best_sign < 0 else 0)


# ------------------------------------------------------------------ overlay


def _directed_edges(poly) -> list:
    return [(v0, v1) for lp in poly.loops for (v0, v1) in lp.edges()]


class ILRegion:
    """Containment for an interior-on-the-LEFT directed boundary, anchored
    locally: a point just left of the first edge is inside by definition,
    and any other point is inside iff the crossing parity from that anchor
    is even.  This is orientation-convention-free — it works for shells,
    CW holes and overlay RESULTS alike, unlike disc-parity even-odd."""

    def __init__(self, edges: list):
        self.edges = edges
        u, v = edges[0]
        mid = normalize((u[0] + v[0], u[1] + v[1], u[2] + v[2]))
        n = normalize(
            (
                u[1] * v[2] - u[2] * v[1],
                u[2] * v[0] - u[0] * v[2],
                u[0] * v[1] - u[1] * v[0],
            )
        )
        eps = 1e-9
        self.anchor = normalize(
            (mid[0] + eps * n[0], mid[1] + eps * n[1], mid[2] + eps * n[2])
        )

    @staticmethod
    def from_loops(loops_vertices: list) -> "ILRegion":
        edges = [
            (vs[i], vs[(i + 1) % len(vs)])
            for vs in loops_vertices
            for i in range(len(vs))
        ]
        return ILRegion(edges)

    def contains_point(self, p) -> bool:
        inside = True  # the anchor is inside by construction
        for c, d in self.edges:
            inside ^= pred.edge_or_vertex_crossing(self.anchor, tuple(p), c, d)
        return inside


def _subdivide(edges, crossings) -> list:
    subs = []
    for i, (v0, v1) in enumerate(edges):
        pts = sorted(crossings.get(i, []), key=lambda x: chord2_between(v0, x))
        chain = [v0, *pts, v1]
        for k in range(len(chain) - 1):
            u, v = chain[k], chain[k + 1]
            if chord2_between(u, v) > 0.0:
                subs.append((u, v))
    return subs


def _arc_midpoint(u, v):
    return normalize((u[0] + v[0], u[1] + v[1], u[2] + v[2]))


def overlay(poly_a, poly_b, op: str) -> list[list[tuple]]:
    """Boolean overlay of two polygons; returns the result's loops as
    vertex lists (interior-left orientation preserved).  ``op`` is one of
    'intersection', 'union', 'difference' (A minus B)."""
    if op not in ("intersection", "union", "difference"):
        raise ValueError(op)
    ea = _directed_edges(poly_a)
    eb = _directed_edges(poly_b)
    # interior-left containment anchored at the boundary itself, so holes
    # (CW loops) classify correctly regardless of the Polygon class's
    # even-odd convention
    ra = ILRegion(ea)
    rb = ILRegion(eb)

    cross_a: dict = {}
    cross_b: dict = {}
    for i, (u0, u1) in enumerate(ea):
        for j, (w0, w1) in enumerate(eb):
            if pred.crossing_sign(u0, u1, w0, w1) > 0:
                x = edge_intersection(u0, u1, w0, w1)
                cross_a.setdefault(i, []).append(x)
                cross_b.setdefault(j, []).append(x)

    sa = _subdivide(ea, cross_a)
    sb = _subdivide(eb, cross_b)

    def kept(subs, other, want_inside, reverse=False):
        out = []
        for u, v in subs:
            if other.contains_point(_arc_midpoint(u, v)) == want_inside:
                out.append((v, u) if reverse else (u, v))
        return out

    if op == "intersection":
        edges = kept(sa, rb, True) + kept(sb, ra, True)
    elif op == "union":
        edges = kept(sa, rb, False) + kept(sb, ra, False)
    else:  # difference: A outside B, plus B's edges inside A reversed
        edges = kept(sa, rb, False) + kept(sb, ra, True, reverse=True)

    # stitch by exact start-point keys (crossing points are shared objects)
    succ: dict = {}
    for e in edges:
        succ.setdefault(e[0], []).append(e)
    loops: list[list[tuple]] = []
    used: set = set()
    for e in edges:
        if id(e) in used:
            continue
        loop = []
        cur = e
        while True:
            used.add(id(cur))
            loop.append(cur[0])
            nxts = [x for x in succ.get(cur[1], []) if id(x) not in used]
            if not nxts:
                # loop closes when the next start equals the first vertex
                break
            # generic position: exactly one unused successor
            cur = nxts[0]
        loops.append(loop)
    return loops


def union_many(polygons: list) -> list[list[tuple]]:
    """N-way union by folding the pairwise overlay (the reference's
    S2Polygon.destructiveUnion over s2boolean_operation.d): U_i =
    overlay(U_{i-1}, P_i, 'union').  Intermediate results (possibly
    multi-loop, possibly with holes) re-enter as interior-left loop sets,
    which the ILRegion-based classification handles unchanged."""
    from .loops import Loop, Polygon

    if not polygons:
        return []
    acc = polygons[0]
    for p in polygons[1:]:
        loops = overlay(acc, p, "union")
        acc = Polygon([Loop(vs) for vs in loops], "u")
    return [lp.vertices for lp in acc.loops]


def clip_polyline(vertices: list, poly, keep_inside: bool = True) -> list[list[tuple]]:
    """Clip an open polyline to a polygon (S2Polyline::intersect semantics,
    s2polyline.d / s2boolean_operation.d applied to a 1D operand): split
    every polyline edge at its polygon-boundary crossings, keep the
    sub-edges whose midpoint is inside (or outside), and stitch consecutive
    kept sub-edges back into maximal chains.

    Returns the kept chains as vertex lists.  Crossing points use the same
    closed-form as the overlay, so the SQL oracle re-derives the clipped
    vertex multiset for convex polygons."""
    pedges = _directed_edges(poly)
    region = ILRegion(pedges)
    chains: list[list[tuple]] = []
    cur: list[tuple] = []
    for i in range(len(vertices) - 1):
        u, v = vertices[i], vertices[i + 1]
        xs = [
            edge_intersection(u, v, c, d)
            for c, d in pedges
            if pred.crossing_sign(u, v, c, d) > 0
        ]
        xs.sort(key=lambda x: chord2_between(u, x))
        chain = [u, *xs, v]
        for k in range(len(chain) - 1):
            a, b = chain[k], chain[k + 1]
            if chord2_between(a, b) == 0.0:
                continue
            if region.contains_point(_arc_midpoint(a, b)) == keep_inside:
                if cur and cur[-1] == a:
                    cur.append(b)
                else:
                    if len(cur) >= 2:
                        chains.append(cur)
                    cur = [a, b]
            else:
                if len(cur) >= 2:
                    chains.append(cur)
                cur = []
    if len(cur) >= 2:
        chains.append(cur)
    return chains


def loops_signed_area(loops) -> float:
    """Signed area of an overlay result (shells positive, holes negative):
    fan of signed triangle excesses per loop — exact for results smaller
    than a hemisphere per loop, which overlay fixtures are."""
    total = 0.0
    for vs in loops:
        for i in range(1, len(vs) - 1):
            total += signed_triangle_area(vs[0], vs[i], vs[i + 1])
    return total
