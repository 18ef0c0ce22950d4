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
