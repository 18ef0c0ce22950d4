"""Polygon cell index: per-cell clipped edge lists + contains-center bits.

The Spark-side equivalent of the reference's MutableS2ShapeIndex
(vnayar/s2geometry-d src/s2/mutable_s2shape_index.d:47,929-1630): a
top-down subdivision of the sphere into cells annotated with

* the (conservative superset of) polygon edges that may intersect the cell
  — clipped by the vectorized "min chord distance from cell center <= cell
  circumradius" criterion, which every truly-intersecting edge satisfies;
* whether the CELL CENTER is inside the polygon (the contains-center bit,
  s2contains_point_query.d:248-278).

A point's containment is then decided from its own cell: cells are
spherically convex (intersections of great-circle half-spaces), so the
geodesic from the cell center to any point in the cell stays inside the
cell, and only edges intersecting the cell can cross it.  Boundary
candidates therefore test ~max_edges_per_cell edges instead of the whole
polygon — the fix for the O(total edges) per-point parity of round 1.

Uniform cells (no nearby edges) are wholly inside or outside; inside ones
become interior covering cells (accepted with no exact test), outside ones
are dropped from the candidate probe entirely.  Boundary cells keep
subdividing while they hold more than ``max_edges_per_cell`` edges AND the
level allows, and at least until ``min_boundary_level`` so the candidate
probe stays tight for small polygons.
"""

from __future__ import annotations

import numpy as np

from . import cellunion, measures, metrics
from .cellid import CellId
from .regions import Cell, chord2_between

_SIGN = np.uint64(1 << 63)


def _min_chord2_precomp(p, A, B, U, NA, BN) -> np.ndarray:
    """measures.edges_min_chord2_from_point with the per-edge frames
    (U = unit normal, NA = U x A, BN = B x U) hoisted out of the loop."""
    s = U @ p
    Q = p[None, :] - s[:, None] * U
    qn = np.linalg.norm(Q, axis=1)
    qn = np.where(qn == 0, 1.0, qn)
    Q = Q / qn[:, None]
    in_arc = (np.einsum("ij,ij->i", Q, NA) >= 0) & (np.einsum("ij,ij->i", Q, BN) >= 0)
    d_arc = ((p[None, :] - Q) ** 2).sum(axis=1)
    d_a = ((p[None, :] - A) ** 2).sum(axis=1)
    d_b = ((p[None, :] - B) ** 2).sum(axis=1)
    return np.where(in_arc, d_arc, np.minimum(d_a, d_b))


class PolygonCellIndex:
    """Complete decomposition of a polygon into interior / boundary cells.

    Attributes
    ----------
    interior_cells : list[int]
        Normalized uint64 cell ids wholly inside the polygon.
    boundary : list[tuple[int, tuple, bool, np.ndarray]]
        (cell_id, center_xyz, contains_center, edge_indices) per boundary
        cell, sorted by cell id.
    edges_a, edges_b : np.ndarray
        (E, 3) arrays of edge endpoints (indexable by the per-cell lists).
    """

    def __init__(
        self,
        polygon,
        max_edges_per_cell: int = 16,
        max_level: int = 18,
        min_boundary_level: int | None = None,
        max_cells: int = 500_000,
    ):
        edges = polygon._all_edges
        A = np.asarray([e[0] for e in edges], dtype=np.float64)
        B = np.asarray([e[1] for e in edges], dtype=np.float64)
        self.edges_a, self.edges_b = A, B
        # per-edge constants for the distance filter, computed ONCE (the
        # subdivision visits each edge many times): unit great-circle
        # normals and the two in-arc test frames
        N = np.cross(A, B)
        nn = np.linalg.norm(N, axis=1)
        nn = np.where(nn == 0, 1.0, nn)
        U = N / nn[:, None]
        NA = np.cross(U, A)
        BN = np.cross(B, U)

        if min_boundary_level is None:
            # subdivide boundary cells to ~1/4 of the polygon's bound radius
            # so the candidate probe is tight even for few-edge polygons
            bound = polygon.get_cap_bound()
            if bound.is_full():
                min_boundary_level = 2
            else:
                r = max(bound.radius_radians(), 1e-6)
                min_boundary_level = max(
                    0, min(max_level, metrics.AVG_EDGE.get_closest_level(r / 4.0))
                )
        self.min_boundary_level = min_boundary_level

        uniform: list[tuple[int, tuple]] = []  # (cell_id, center)
        boundary: list[tuple[int, tuple, np.ndarray]] = []
        stack = [(CellId.from_face(f), np.arange(A.shape[0])) for f in range(6)]
        n_nodes = 0
        while stack:
            cid, cand = stack.pop()
            n_nodes += 1
            if n_nodes > max_cells:
                raise ValueError(
                    f"polygon cell index exceeded {max_cells} nodes "
                    f"(E={A.shape[0]}, max_edges_per_cell={max_edges_per_cell})"
                )
            cell = Cell(cid)
            center = cid.to_point()
            circ2 = max(chord2_between(center, cell.get_vertex(k)) for k in range(4))
            # conservative clip: every edge intersecting the cell is within
            # the circumradius of its center (tolerance absorbs float error)
            d2 = _min_chord2_precomp(
                np.asarray(center), A[cand], B[cand], U[cand], NA[cand], BN[cand]
            )
            near = cand[d2 <= circ2 * (1.0 + 1e-9) + 1e-15]
            lvl = cid.level()
            if near.size == 0:
                uniform.append((cid.id, center))
            elif (near.size <= max_edges_per_cell and lvl >= min_boundary_level) or (
                lvl >= max_level
            ):
                boundary.append((cid.id, center, near))
            else:
                for child in cid.children():
                    stack.append((child, near))

        # one vectorized contains pass for every emitted center
        centers = np.asarray(
            [c for _, c in uniform] + [c for _, c, _ in boundary], dtype=np.float64
        )
        if centers.size:
            inside = polygon.contains_points_vec(
                centers[:, 0], centers[:, 1], centers[:, 2]
            )
        else:
            inside = np.zeros(0, dtype=bool)

        nu = len(uniform)
        self.interior_cells = cellunion.normalize(
            [cid for (cid, _), flag in zip(uniform, inside[:nu]) if flag]
        )
        self.boundary = sorted(
            (cid, center, bool(inside[nu + i]), near)
            for i, (cid, center, near) in enumerate(boundary)
        )

    # -- convenience -------------------------------------------------------
    def num_boundary_cells(self) -> int:
        return len(self.boundary)

    def max_clipped_edges(self) -> int:
        return max((n.size for _, _, _, n in self.boundary), default=0)

    def covering_cells(self) -> list[tuple[int, bool]]:
        """(cell_id, is_interior) rows for the candidate probe."""
        return [(cid, True) for cid in self.interior_cells] + [
            (cid, False) for cid, _, _, _ in self.boundary
        ]

    def contains_points(self, x, y, z, cell_ids_unsigned) -> np.ndarray:
        """Vectorized containment via the index (driver-side check/oracle):
        each point must come with its leaf cell id."""
        from . import cellid as ci

        n = x.shape[0]
        out = np.zeros(n, dtype=bool)
        decided = np.zeros(n, dtype=bool)
        # interior cells
        if self.interior_cells:
            arr = np.asarray(self.interior_cells, dtype=np.uint64)
            rmin = ci.range_min(arr)
            rmax = ci.range_max(arr)
            pos = np.searchsorted(rmin, cell_ids_unsigned, side="right") - 1
            ok = (pos >= 0) & (cell_ids_unsigned <= rmax[np.clip(pos, 0, None)])
            out[ok] = True
            decided |= ok
        # boundary cells
        from . import predicates as pred

        b_ids = np.asarray([c for c, _, _, _ in self.boundary], dtype=np.uint64)
        rmin = ci.range_min(b_ids)
        rmax = ci.range_max(b_ids)
        pos = np.searchsorted(rmin, cell_ids_unsigned, side="right") - 1
        ok = (pos >= 0) & (cell_ids_unsigned <= rmax[np.clip(pos, 0, None)]) & ~decided
        for o in np.unique(pos[ok]):
            m = ok & (pos == o)
            _, center, c_bit, near = self.boundary[int(o)]
            edge_list = [
                (tuple(self.edges_a[e]), tuple(self.edges_b[e])) for e in near
            ]
            counts = pred.crossings_with_fixed_edges(
                center[0], center[1], center[2], x[m], y[m], z[m], edge_list
            )
            out[m] = ((counts & 1).astype(bool)) ^ c_bit
        return out
