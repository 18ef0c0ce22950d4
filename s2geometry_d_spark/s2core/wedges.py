"""Wedge relations: compare two angular wedges sharing a middle vertex.

A wedge at vertex ab1 over an edge chain (x0, ab1, x2) is the region to the
left of the edges — the set of rays from edge (ab1,x0) inclusive to
(ab1,x2) exclusive, clockwise.  Used by loop/polygon containment logic at
shared vertices.  Semantics studied from the reference
(vnayar/s2geometry-d src/s2/s2wedge_relations.d:44-99); independent
re-expression over our robust ordered_ccw.
"""

from __future__ import annotations

from . import predicates as pred

WEDGE_EQUALS = "equals"
WEDGE_PROPERLY_CONTAINS = "properly_contains"
WEDGE_IS_PROPERLY_CONTAINED = "is_properly_contained"
WEDGE_PROPERLY_OVERLAPS = "properly_overlaps"
WEDGE_IS_DISJOINT = "is_disjoint"


def wedge_contains(a0, ab1, a2, b0, b2) -> bool:
    """True if wedge A=(a0,ab1,a2) contains wedge B=(b0,ab1,b2)."""
    return pred.ordered_ccw(a2, b2, b0, ab1) and pred.ordered_ccw(b0, a0, a2, ab1)


def wedge_intersects(a0, ab1, a2, b0, b2) -> bool:
    """True if the open wedges intersect."""
    return not (pred.ordered_ccw(a0, b2, b0, ab1) and pred.ordered_ccw(b0, a2, a0, ab1))


def get_wedge_relation(a0, ab1, a2, b0, b2) -> str:
    """Detailed relation of wedge A to wedge B (six circular edge orderings
    collapse to five relations; overlapping edges take the most specific)."""
    a0, a2, b0, b2 = tuple(a0), tuple(a2), tuple(b0), tuple(b2)
    if a0 == b0 and a2 == b2:
        return WEDGE_EQUALS
    if pred.ordered_ccw(a0, a2, b2, ab1):
        if pred.ordered_ccw(b2, b0, a0, ab1):
            return WEDGE_PROPERLY_CONTAINS
        return WEDGE_IS_PROPERLY_CONTAINED if a2 == b2 else WEDGE_PROPERLY_OVERLAPS
    if pred.ordered_ccw(a0, b0, b2, ab1):
        return WEDGE_IS_PROPERLY_CONTAINED
    return (
        WEDGE_IS_DISJOINT
        if pred.ordered_ccw(a0, b0, a2, ab1)
        else WEDGE_PROPERLY_OVERLAPS
    )
