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


OPS = ("intersection", "union", "difference", "symmetric_difference")


def overlay(poly_a, poly_b, op: str) -> list[list[tuple]]:
    """Boolean overlay of two polygons; returns the result's loops as
    vertex lists (interior-left orientation preserved).  ``op`` is one of
    'intersection', 'union', 'difference' (A minus B),
    'symmetric_difference' (the reference's fourth OpType,
    s2boolean_operation.d:225-481)."""
    if op not in OPS:
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
    elif op == "difference":  # A outside B, plus B's edges inside A reversed
        edges = kept(sa, rb, False) + kept(sb, ra, True, reverse=True)
    else:
        # symmetric difference keeps EVERY sub-edge: outside-other forward
        # (bounding the A−B / B−A pieces from outside), inside-other
        # REVERSED (the same pieces bounded from within the other region).
        # Each crossing vertex is 2-in/2-out — the CCW-sweep stitcher
        # pairs the wedges so the two pieces come out as separate simple
        # loops rather than a figure-eight.
        edges = (
            kept(sa, rb, False)
            + kept(sa, rb, True, reverse=True)
            + kept(sb, ra, False)
            + kept(sb, ra, True, reverse=True)
        )

    # stitch by exact start-point keys (crossing points are shared objects);
    # _stitch's CCW successor rule only engages at 2-in/2-out vertices
    # (symmetric difference) — generic-position ∩/∪/− have single
    # successors and take the same path as before
    return _stitch(edges)


# ---------------------------------------------- degenerate-tolerant overlay


def _signed_area_from_edges(edges) -> float:
    """Loop-structure-agnostic signed area: sum of signed triangle excesses
    from a fixed reference point over the DIRECTED edge set (the boundary
    line integral) — lets degenerate-overlay tests check areas without
    trusting the stitcher's loop grouping."""
    o = normalize((0.12, 0.34, 0.93))
    return sum(signed_triangle_area(o, u, v) for u, v in edges)


def _on_edge_strictly(u, v, w) -> bool:
    """w lies strictly inside the arc u->v (exact collinearity + between).

    Collinearity must use the UNPERTURBED exact sign: pred.sign applies the
    SoS tie-break, which by design never returns 0 for distinct points —
    exactly the answer this predicate needs."""
    if w == u or w == v:
        return False
    if pred.triage_sign(u, v, w) != 0:
        return False
    if pred.exact_sign(u, v, w, perturb=False) != 0:
        return False
    duv = chord2_between(u, v)
    return chord2_between(u, w) < duv and chord2_between(v, w) < duv


def _split_edges(edges, extra_points, other_vertices):
    """Split every edge at (a) its precomputed crossing points
    (``extra_points[i]`` — SHARED Python objects with the other side, so
    exact-successor stitching works across chains) and (b) other-region
    VERTICES lying exactly on it — the degenerate configurations snapping
    produces (shared sub-edges, vertex tangencies)."""
    out = []
    for i, (u, v) in enumerate(edges):
        pts = list(extra_points.get(i, []))
        for w in other_vertices:
            if _on_edge_strictly(u, v, w):
                pts.append(w)
        pts.sort(key=lambda x: chord2_between(u, x))
        chain = [u, *pts, v]
        for k in range(len(chain) - 1):
            if chord2_between(chain[k], chain[k + 1]) > 0.0:
                out.append((chain[k], chain[k + 1]))
    return out


def _probe(u, v, side: int):
    """Point epsilon to the LEFT (side=+1) or RIGHT (-1) of edge u->v at its
    midpoint — off-boundary by construction, so membership is decided by
    plain parity even when the edge itself lies ON the other boundary."""
    m = _arc_midpoint(u, v)
    n = normalize(
        (
            u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0],
        )
    )
    eps = 1e-9 * side
    return normalize((m[0] + eps * n[0], m[1] + eps * n[1], m[2] + eps * n[2]))


def _stitch(edges) -> list[list[tuple]]:
    """Loop assembly with a CCW-sweep successor rule at shared vertices
    (where 2-in/2-out configurations appear): among unused out-edges, take
    the one whose direction is LAST in CCW order from the incoming
    direction — the minimal interior wedge, keeping each loop simple."""
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
                break
            if len(nxts) == 1:
                cur = nxts[0]
            else:
                t = cur[1]
                incoming = cur[0]  # direction point back along the arrival edge
                best = nxts[0]
                for cand in nxts[1:]:
                    if pred.ordered_ccw(incoming, best[1], cand[1], t):
                        best = cand
                cur = best
        loops.append(loop)
    return loops


def overlay_degenerate(poly_a, poly_b, op: str) -> list[list[tuple]]:
    """Boolean overlay tolerant of SHARED VERTICES and SHARED (SUB-)EDGES —
    the out-of-generic-position configurations the reference resolves
    through its snap-rounded edge graph (s2boolean_operation.d:225-481 over
    s2builder.d).  Same result contract as :func:`overlay`; degenerate
    boundary coincidences resolve by the reference's semantics with
    degenerate edges disabled: same-direction shared edges appear ONCE,
    opposite-direction shared edges and edge-tangencies vanish.

    Method: split at crossings AND at other-region vertices on the edge;
    classify each sub-edge by an epsilon-LEFT (or RIGHT, for union)
    membership probe — never ON the boundary, so coincident edges classify
    exactly; dedupe identical directed sub-edges; stitch with a CCW-sweep
    successor rule at 2-in/2-out shared vertices.

    symmetric_difference probes BOTH sides of every undirected sub-edge:
    the edge is boundary iff A△B membership flips across it (oriented
    interior-left); shared edges in EITHER direction have equal membership
    on both sides and vanish — the reference's semantics with degenerate
    edges disabled."""
    if op not in OPS:
        raise ValueError(op)
    ea = _directed_edges(poly_a)
    eb_orig = _directed_edges(poly_b)
    # difference = A ∩ complement(B): complement's boundary is B reversed
    eb = [(v, u) for u, v in eb_orig] if op == "difference" else eb_orig
    ra = ILRegion(ea)
    rb = ILRegion(eb_orig)  # membership in B itself (original orientation)

    va = {w for e in ea for w in e}
    vb = {w for e in eb for w in e}
    # crossing points computed ONCE and shared between both chains (exact
    # float equality is what the stitcher's successor lookup relies on)
    cross_a: dict = {}
    cross_b: dict = {}
    for i, (u0, u1) in enumerate(ea):
        for j, (w0, w1) in enumerate(eb):
            if pred.crossing_sign(u0, u1, w0, w1) > 0:
                x = edge_intersection(u0, u1, w0, w1)
                cross_a.setdefault(i, []).append(x)
                cross_b.setdefault(j, []).append(x)
    sa = _split_edges(ea, cross_a, vb)
    sb = _split_edges(eb, cross_b, va)

    if op == "symmetric_difference":
        # two-sided probe per UNDIRECTED sub-edge (an edge shared between
        # the operands appears in both sa and sb — classify its geometry
        # once): in-symdiff = in_A XOR in_B; keep with symdiff-interior on
        # the LEFT, drop when both sides agree (interior edge or shared
        # boundary)
        undirected: dict = {}
        for u, v in sa + sb:
            undirected.setdefault((u, v) if u <= v else (v, u), (u, v))
        kept_edges = []
        for u, v in undirected.values():
            pl, pr = _probe(u, v, 1), _probe(u, v, -1)
            sl = ra.contains_point(pl) != rb.contains_point(pl)
            sr = ra.contains_point(pr) != rb.contains_point(pr)
            if sl and not sr:
                kept_edges.append((u, v))
            elif sr and not sl:
                kept_edges.append((v, u))
        return _stitch(kept_edges)

    # classification probes:
    #   intersection — boundary edge iff its interior side (left) is inside
    #     the OTHER region;
    #   union — iff its exterior side (right) is outside the other region;
    #   difference — A-side: left outside B; (reversed) B-side: left in A.
    side = -1 if op == "union" else 1

    def keep_a(u, v):
        in_b = rb.contains_point(_probe(u, v, side))
        if op == "intersection":
            return in_b
        return not in_b  # union (right outside B) / difference (left outside B)

    def keep_b(u, v):
        in_a = ra.contains_point(_probe(u, v, side))
        return (not in_a) if op == "union" else in_a

    kept = [(u, v) for u, v in sa if keep_a(u, v)]
    # dedupe coincident same-direction sub-edges (shared boundary kept once)
    seen = set(kept)
    for u, v in sb:
        if (u, v) not in seen and keep_b(u, v):
            kept.append((u, v))
            seen.add((u, v))

    return _stitch(kept)


def overlay_snapped(
    poly_a, poly_b, op: str, snap_level: int = 20, snap_fn=None
) -> list[list[tuple]]:
    """The reference's full pipeline shape for dirty inputs: snap both
    operands to level-L cell centers (s2builder.d snap rounding — vertices
    within the snap radius become EXACTLY equal floats), then run the
    degeneracy-tolerant overlay on the now-coincident geometry.  Collapsed
    operands follow the boolean identities (empty ∩ X = empty, etc.).

    ``snap_fn`` (a builder-v2 SnapFunction) replaces the plain cell-center
    snap with the FULL snap-rounding pipeline — self-intersection
    splitting, site merging, edge rerouting (s2builder.d) — before the
    overlay: the dirty-input path."""
    from .builder import snap_polygon

    if snap_fn is not None:
        from .builder import build_polygon
        from .loops import Loop, Polygon

        def rebuild(poly):
            loops, _ = build_polygon([lp.vertices for lp in poly.loops], snap_fn)
            return Polygon([Loop(vs) for vs in loops], poly.poly_id) if loops else None

        a, b = rebuild(poly_a), rebuild(poly_b)
        if a is None or b is None:
            if op == "intersection":
                return []
            if op in ("union", "symmetric_difference"):
                survivor = a or b
                return [lp.vertices for lp in survivor.loops] if survivor else []
            return [lp.vertices for lp in a.loops] if a else []
        return overlay_degenerate(a, b, op)

    a = snap_polygon(poly_a, snap_level)
    b = snap_polygon(poly_b, snap_level)
    if a is None or b is None:
        if op == "intersection":
            return []
        if op in ("union", "symmetric_difference"):  # empty △ X = X
            survivor = a or b
            return [lp.vertices for lp in survivor.loops] if survivor else []
        return [lp.vertices for lp in a.loops] if a else []
    return overlay_degenerate(a, b, op)


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


def _sub_edge_on_boundary(u, v, pedges):
    """If the sub-edge u->v lies ON a polygon boundary edge, return that
    edge (c, d); else None.  Decided from the sub-edge's ENDPOINTS with the
    exact predicates (the endpoints are exact input/vertex floats; a
    midpoint would be a rounded construction)."""

    def on_closed(c, d, w):
        return w == c or w == d or _on_edge_strictly(c, d, w)

    for c, d in pedges:
        if on_closed(c, d, u) and on_closed(c, d, v):
            return (c, d)
    return None


def clip_polyline(
    vertices: list,
    poly,
    keep_inside: bool = True,
    polygon_model: str = "semi_open",
) -> list[list[tuple]]:
    """Clip an open polyline to a polygon (S2Polyline::intersect semantics,
    s2polyline.d / s2boolean_operation.d applied to a 1D operand): split
    every polyline edge at its polygon-boundary crossings, keep the
    sub-edges whose midpoint is inside (or outside), and stitch consecutive
    kept sub-edges back into maximal chains.

    ``polygon_model`` is the reference's PolygonModel option
    (s2boolean_operation.d:225-316) deciding polyline sub-edges that lie
    exactly ON the polygon boundary:

    * ``open`` — boundary not contained: on-boundary runs are dropped by
      intersection (kept by difference);
    * ``closed`` — boundary contained: on-boundary runs kept by
      intersection;
    * ``semi_open`` (default) — contained iff the polygon interior is on
      the LEFT of the polyline's own direction, i.e. runs parallel to the
      boundary edge are contained, antiparallel runs are not.

    Polyline edges are additionally split at polygon VERTICES lying on
    them, so every sub-edge lies within a single boundary edge and the
    model decision is per-run exact.  Returns the kept chains as vertex
    lists.  Crossing points use the same closed-form as the overlay, so
    the SQL oracle re-derives the clipped vertex multiset for convex
    polygons."""
    if polygon_model not in ("open", "semi_open", "closed"):
        raise ValueError(polygon_model)
    pedges = _directed_edges(poly)
    pverts = {w for e in pedges for w in e}
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
        # split at polygon vertices ON the edge too (coincident runs)
        xs.extend(w for w in pverts if _on_edge_strictly(u, v, w))
        xs.sort(key=lambda x: chord2_between(u, x))
        chain = [u, *xs, v]
        for k in range(len(chain) - 1):
            a, b = chain[k], chain[k + 1]
            if chord2_between(a, b) == 0.0:
                continue
            coincident = _sub_edge_on_boundary(a, b, pedges)
            if coincident is None:
                contained = region.contains_point(_arc_midpoint(a, b))
            elif polygon_model == "open":
                contained = False
            elif polygon_model == "closed":
                contained = True
            else:  # semi_open: interior-left iff run parallels the edge
                c, _d = coincident
                contained = chord2_between(c, a) <= chord2_between(c, b)
            if contained == keep_inside:
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


def loop_disc_contains(loop_vs, p) -> bool:
    """Containment of ``p`` in the DISC bounded by a loop — the side with
    the smaller area (interior-left for CCW shells, interior-RIGHT for CW
    holes) — the curve containment that defines nesting depth
    (s2polygon.d:129+ / s2loop.d:346-369)."""
    edges = [
        (loop_vs[i], loop_vs[(i + 1) % len(loop_vs)]) for i in range(len(loop_vs))
    ]
    inside_left = ILRegion(edges).contains_point(p)
    return inside_left if loops_signed_area([loop_vs]) > 0 else not inside_left


def assign_loop_depths(loops) -> list[int]:
    """Nesting depth per result loop (shell 0, hole 1, island 2, ...):
    depth = number of OTHER loops whose disc properly contains this loop —
    tested at one edge midpoint (disjoint result curves make one probe
    sufficient; a midpoint is never a shared crossing vertex).  The depths
    make overlay results directly encodable in the reference's polygon
    wire format (encode_polygon depths / has_holes)."""
    depths = []
    for i, vs in enumerate(loops):
        p = _arc_midpoint(vs[0], vs[1])
        depths.append(
            sum(
                1
                for j, other in enumerate(loops)
                if j != i and loop_disc_contains(other, p)
            )
        )
    return depths


def loops_signed_area(loops) -> float:
    """Signed area of an overlay result (shells positive, holes negative):
    fan of signed triangle excesses per loop — exact for results smaller
    than a hemisphere per loop, which overlay fixtures are."""
    total = 0.0
    for vs in loops:
        for i in range(1, len(vs) - 1):
            total += signed_triangle_area(vs[0], vs[i], vs[i + 1])
    return total


def regions_equal(poly_a, poly_b) -> bool:
    """S2BooleanOperation.equals (s2boolean_operation.d:551-560): two
    regions are equal iff their symmetric difference is empty — runs the
    degeneracy-tolerant walk so operands sharing boundary geometry (same
    region, different loop starting points / vertex counts along straight
    runs) compare correctly."""
    return overlay_degenerate(poly_a, poly_b, "symmetric_difference") == []
