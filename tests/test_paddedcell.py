"""PaddedCell invariants (s2padded_cell.d:11-141): incremental-vs-scratch
bound equality, Hilbert entry/exit chaining, middle-strip geometry and
shrink_to_fit containment + minimality."""

from __future__ import annotations

import math
import random

from s2geometry_d_spark.s2core.cellid import CellId
from s2geometry_d_spark.s2core.paddedcell import PaddedCell


def _rand_cell(rnd, max_level=20) -> CellId:
    c = CellId.from_latlng(rnd.uniform(-89, 89), rnd.uniform(-180, 180))
    return c.parent(rnd.randint(0, max_level))


def test_zero_padding_bound_equals_cell_bound():
    rnd = random.Random(2)
    for _ in range(100):
        c = _rand_cell(rnd)
        pc = PaddedCell(c, 0.0)
        assert pc.bound == c.get_bound_uv() or c.is_face()
        padded = PaddedCell(c, 0.25)
        (u0, u1), (v0, v1) = c.get_bound_uv() if not c.is_face() else (
            (-1.0, 1.0),
            (-1.0, 1.0),
        )
        assert padded.bound == ((u0 - 0.25, u1 + 0.25), (v0 - 0.25, v1 + 0.25))


def test_incremental_child_equals_from_scratch():
    """A child derived from its parent (bound clipped at the padded
    middle) must equal the child built from its own id — the property the
    recursive descent relies on."""
    rnd = random.Random(9)
    for _ in range(150):
        parent = PaddedCell(_rand_cell(rnd, 18), rnd.choice([0.0, 1e-3, 0.1]))
        for pos in range(4):
            i, j = parent.get_child_ij(pos)
            inc = parent.child(i, j)
            scratch = PaddedCell(inc.id, parent.padding)
            assert inc.level == scratch.level
            assert inc.orientation == scratch.orientation
            assert inc._ij_lo == scratch._ij_lo
            for d in range(2):
                for e in range(2):
                    assert math.isclose(
                        inc.bound[d][e], scratch.bound[d][e], abs_tol=1e-15
                    ), (inc.bound, scratch.bound)


def test_entry_exit_vertices_chain_through_children():
    """Hilbert continuity: the entry vertex of child(pos 0) is the cell's
    entry vertex, the exit of child(pos 3) is the cell's exit, and
    consecutive children share exit == entry."""
    rnd = random.Random(21)
    for _ in range(80):
        pc = PaddedCell(_rand_cell(rnd, 18), 0.0)
        kids = [pc.child(*pc.get_child_ij(pos)) for pos in range(4)]
        assert kids[0].get_entry_vertex() == pc.get_entry_vertex()
        assert kids[3].get_exit_vertex() == pc.get_exit_vertex()
        for a, b in zip(kids, kids[1:]):
            assert a.get_exit_vertex() == b.get_entry_vertex()


def test_entry_exit_match_curve_order():
    """Entry/exit must be vertices of the cell, and the entry of cell k+1
    equals the exit of cell k along a run of same-level siblings."""
    rnd = random.Random(33)
    for _ in range(40):
        c = _rand_cell(rnd, 15)
        run = [c]
        for _ in range(3):
            nxt = run[-1].next()
            if nxt.id == 0 or nxt.level() != c.level():
                break
            run.append(nxt)
        for a, b in zip(run, run[1:]):
            if a.parent(0).id != b.parent(0).id:
                continue  # face crossings share the vertex only up to sign
            assert PaddedCell(a, 0.0).get_exit_vertex() == PaddedCell(
                b, 0.0
            ).get_entry_vertex()


def test_middle_is_centered_between_children():
    rnd = random.Random(4)
    for _ in range(60):
        pc = PaddedCell(_rand_cell(rnd, 18), 0.01)
        (mu0, mu1), (mv0, mv1) = pc.middle()
        assert math.isclose(mu1 - mu0, 0.02, rel_tol=1e-12)
        assert math.isclose(mv1 - mv0, 0.02, rel_tol=1e-12)
        (u0, u1), (v0, v1) = pc.bound
        assert u0 < mu0 < mu1 < u1
        assert v0 < mv0 < mv1 < v1


def test_shrink_to_fit_contains_and_is_minimal():
    rnd = random.Random(77)
    checked = 0
    for _ in range(300):
        base = _rand_cell(rnd, 10)
        pc = PaddedCell(base, 0.0)
        (u0, u1), (v0, v1) = pc.bound
        # random small rect inside the padded bound
        cu = rnd.uniform(u0, u1)
        cv = rnd.uniform(v0, v1)
        du = rnd.uniform(0, (u1 - u0) * 0.2)
        dv = rnd.uniform(0, (v1 - v0) * 0.2)
        rect = (
            (max(u0, cu - du), min(u1, cu + du)),
            (max(v0, cv - dv), min(v1, cv + dv)),
        )
        got = pc.shrink_to_fit(rect)
        # containment: got is base or a descendant, and its bound (plus
        # padding slack) contains the rect
        assert base.contains(got) or got.id == base.id
        if got.id == base.id:
            continue
        (gu0, gu1), (gv0, gv1) = got.get_bound_uv()
        slack = 1e-12
        assert gu0 - slack <= rect[0][0] and rect[0][1] <= gu1 + slack
        assert gv0 - slack <= rect[1][0] and rect[1][1] <= gv1 + slack
        # minimality: the two opposite rect corners fall in different
        # children of got, so one level deeper cannot contain it
        kids = [k for k in got.children()]
        def owner(u, v):
            for k in kids:
                (ku0, ku1), (kv0, kv1) = k.get_bound_uv()
                if ku0 <= u <= ku1 and kv0 <= v <= kv1:
                    return k.id
            return None
        o1 = owner(rect[0][0], rect[1][0])
        o2 = owner(rect[0][1], rect[1][1])
        if o1 is not None and o2 is not None:
            assert o1 != o2 or got.level() == 30
        checked += 1
    assert checked > 50
