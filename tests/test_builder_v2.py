"""Builder-v2 snap-rounding framework (reference s2builder.d:100-700 +
builder/util/snap_functions.d:44-470): snap-function contracts, dirty-input
repair (near-duplicate vertices, self-intersections, slivers), guarantee
pins (grid membership, max vertex movement, vertex separation,
idempotency), and the overlay_snapped composition."""

from __future__ import annotations

import itertools
import math

import pytest

from s2geometry_d_spark.s2core import builder as B2
from s2geometry_d_spark.s2core import metrics
from s2geometry_d_spark.s2core.boolean import loops_signed_area, overlay_snapped
from s2geometry_d_spark.s2core.loops import Loop, Polygon


def xyz(lat, lng):
    la, lo = math.radians(lat), math.radians(lng)
    return (math.cos(la) * math.cos(lo), math.cos(la) * math.sin(lo), math.sin(la))


def chord(a, b):
    return math.sqrt(B2._chord2(a, b))


def angle(a, b):
    return 2.0 * math.asin(min(1.0, 0.5 * chord(a, b)))


# ----------------------------------------------------- snap-function pins


def test_cellid_snap_radius_formula():
    for level in (5, 10, 20, 30):
        r = B2.S2CellIdSnapFunction.min_snap_radius_for_level(level)
        assert r >= 0.5 * metrics.MAX_DIAG.get_value(level)
        # snapping any point moves it at most r
        sf = B2.S2CellIdSnapFunction(level)
        for lat, lng in [(0.0, 0.0), (37.2, -121.9), (-89.9, 17.0), (45.0, 180.0)]:
            p = xyz(lat, lng)
            assert angle(p, sf.snap_point(p)) <= r
    # level_for_max_snap_radius inverts the formula
    for level in (4, 12, 22):
        r = B2.S2CellIdSnapFunction.min_snap_radius_for_level(level)
        assert B2.S2CellIdSnapFunction.level_for_max_snap_radius(r) >= level - 1


def test_intlatlng_snap_radius_and_grid():
    for exp in (2, 4, 7):
        sf = B2.IntLatLngSnapFunction(exp)
        scale = 10.0 ** exp
        for lat, lng in [(1.234567, -2.3456), (-37.0001, 175.9999), (0.0, 0.0)]:
            p = xyz(lat, lng)
            q = sf.snap_point(p)
            assert angle(p, q) <= sf.snap_radius
            qla = math.degrees(math.asin(max(-1.0, min(1.0, q[2]))))
            qlo = math.degrees(math.atan2(q[1], q[0]))
            assert abs(qla * scale - round(qla * scale)) < 1e-4
            assert abs(qlo * scale - round(qlo * scale)) < 1e-4
    with pytest.raises(ValueError):
        B2.IntLatLngSnapFunction(11)
    with pytest.raises(ValueError):
        B2.IntLatLngSnapFunction(4, snap_radius_radians=1e-12)


def test_identity_snap_function_merges_by_radius():
    """Identity snapping still MERGES vertices within the snap radius via
    greedy site selection (the reference's duplicate-cleanup contract)."""
    sf = B2.IdentitySnapFunction(math.radians(0.1))
    dirty = [xyz(0, 0), xyz(0, 5), xyz(0.00001, 5.00001), xyz(5, 5), xyz(5, 0)]
    loops, depths = B2.build_polygon([dirty], sf)
    assert len(loops) == 1 and len(loops[0]) == 4
    # every output vertex IS an input vertex (identity snap point)
    assert set(loops[0]) <= set(dirty)


# ----------------------------------------------------- dirty-input corpus


def test_near_duplicate_vertices_merge_and_area_preserved():
    clean = [xyz(0, 0), xyz(0, 5), xyz(5, 5), xyz(5, 0)]
    dirty = [
        clean[0],
        xyz(1e-7, 1e-7),  # near-duplicate of corner 0
        clean[1],
        clean[2],
        xyz(5.0000001, 0.0000001),  # near-duplicate of corner 3
        clean[3],
    ]
    sf = B2.IntLatLngSnapFunction(4)
    loops, depths = B2.build_polygon([dirty], sf)
    assert len(loops) == 1 and len(loops[0]) == 4 and depths == [0]
    ref_area = loops_signed_area([clean])
    assert abs(loops_signed_area(loops) - ref_area) < 1e-8


def test_self_intersection_split_into_lobes():
    """A bowtie loop splits at the crossing into two lobes with opposite
    orientations (topology preservation: no vertex crosses an edge)."""
    bow = [xyz(0, 0), xyz(5, 5), xyz(0, 5), xyz(5, 0)]
    loops, _depths = B2.build_polygon([bow], B2.IntLatLngSnapFunction(6))
    assert len(loops) == 2
    areas = sorted(loops_signed_area([lp]) for lp in loops)
    assert areas[0] < 0 < areas[1]
    assert abs(areas[0] + areas[1]) < 1e-9  # symmetric lobes


def test_sliver_loop_collapses():
    sl = [xyz(0, 0), xyz(0, 3), xyz(1e-4, 1.5)]
    loops, depths = B2.build_polygon([sl], B2.S2CellIdSnapFunction(8))
    assert loops == [] and depths == []


def test_spike_edges_cancel():
    """An A->B->A spike snaps to a sibling edge pair and cancels."""
    sq = [xyz(0, 0), xyz(0, 5), xyz(2.5, 7.0), xyz(0, 5), xyz(5, 5), xyz(5, 0)]
    loops, _ = B2.build_polygon([sq], B2.IntLatLngSnapFunction(4))
    assert len(loops) == 1
    got = {
        (
            round(math.degrees(math.asin(v[2])), 3),
            round(math.degrees(math.atan2(v[1], v[0])), 3),
        )
        for v in loops[0]
    }
    assert got == {(0.0, 0.0), (0.0, 5.0), (5.0, 5.0), (5.0, 0.0)}


def test_hole_polygon_depths_survive_snap():
    shell = Loop.make_regular(10.0, 40.0, 8.0, 12).vertices
    hole = list(reversed(Loop.make_regular(10.2, 40.1, 3.0, 9).vertices))
    loops, depths = B2.build_polygon([shell, hole], B2.IntLatLngSnapFunction(5))
    assert sorted(depths) == [0, 1]


# ----------------------------------------------------- guarantee pins


def test_vertex_separation_and_idempotency():
    sf = B2.IntLatLngSnapFunction(3)
    dirty = [xyz(0, 0), xyz(0.0004, 0.0003), xyz(0, 5), xyz(5, 5), xyz(5, 0)]
    loops, _ = B2.build_polygon([dirty], sf)
    allv = [v for lp in loops for v in lp]
    min_sep_chord = 2 * math.sin(sf.min_vertex_separation() / 2)
    for a, b in itertools.combinations(allv, 2):
        assert chord(a, b) >= min_sep_chord * (1 - 1e-12)
    loops2, _ = B2.build_polygon(loops, sf)
    assert sorted(map(tuple, (v for lp in loops for v in lp))) == sorted(
        map(tuple, (v for lp in loops2 for v in lp))
    )


def test_max_vertex_movement_bound():
    sf = B2.S2CellIdSnapFunction(12)
    dirty = [xyz(7.01, 3.02), xyz(7.03, 8.06), xyz(12.07, 8.01), xyz(12.02, 3.04)]
    loops, _ = B2.build_polygon([dirty], sf)
    for lp in loops:
        for v in lp:
            assert min(angle(v, u) for u in dirty) <= sf.snap_radius


# ----------------------------------------------------- overlay composition


def test_overlay_snapped_with_snap_fn():
    """Dirty operands (near-duplicate vertices) through the FULL builder-v2
    + degenerate-overlay composition: result area matches the clean-input
    overlay within the snap-radius perturbation bound."""
    a_clean = Polygon([Loop.make_regular(0.0, 0.0, 6.0, 12)], "a")
    b_clean = Polygon([Loop.make_regular(3.0, 2.0, 5.0, 10)], "b")

    def pollute(poly):
        vs = []
        for j, v in enumerate(poly.loops[0].vertices):
            vs.append(v)
            if j % 4 == 1:
                la = math.degrees(math.asin(v[2])) + 1e-8
                lo = math.degrees(math.atan2(v[1], v[0])) + 1e-8
                vs.append(xyz(la, lo))
        return Polygon([Loop(vs)], poly.poly_id)

    sf = B2.IntLatLngSnapFunction(5)
    for op in ("intersection", "union", "difference", "symmetric_difference"):
        from s2geometry_d_spark.s2core.boolean import overlay

        clean = loops_signed_area(overlay(a_clean, b_clean, op))
        snapped = loops_signed_area(
            overlay_snapped(pollute(a_clean), pollute(b_clean), op, snap_fn=sf)
        )
        # perimeter ~ 2*pi*6 deg, vertex movement <= snap radius => area
        # shift bounded well below 1e-4 sr
        assert abs(snapped - clean) < 1e-4, (op, snapped, clean)


def test_identity_zero_radius_is_noop():
    """IdentitySnapFunction with snap_radius 0 must reproduce the input
    exactly (the reference's default no-snapping configuration)."""
    sq = [xyz(3.0, 4.0), xyz(3.0, 9.0), xyz(8.0, 9.0), xyz(8.0, 4.0)]
    loops, depths = B2.build_polygon([sq], B2.IdentitySnapFunction(0.0))
    assert depths == [0]
    assert sorted(loops[0]) == sorted(sq)


def test_validation_gate_before_and_after_repair():
    """find_validation_error (s2loop.d:230-287 contract): dirty inputs
    fail with the reference's error classes; builder-v2 output passes —
    the validity-repair pipeline's entry and exit gates."""
    from s2geometry_d_spark.s2core.loops import find_validation_error as fve

    ok = [xyz(0, 0), xyz(0, 5), xyz(5, 5), xyz(5, 0)]
    assert fve([ok]) is None
    # each dirty class detected
    assert "NOT_UNIT_LENGTH" in fve([[(2.0, 0.0, 0.0), xyz(0, 5), xyz(5, 5)]])
    assert "LOOP_NOT_ENOUGH_VERTICES" in fve([[xyz(0, 0), xyz(0, 5)]])
    assert "DUPLICATE_VERTICES" in fve([[xyz(0, 0), xyz(0, 0), xyz(0, 5), xyz(5, 5)]])
    a = xyz(10.0, 20.0)
    assert "ANTIPODAL_VERTICES" in fve([[a, (-a[0], -a[1], -a[2]), xyz(5, 5)]])
    bow = [xyz(0, 0), xyz(5, 5), xyz(0, 5), xyz(5, 0)]
    assert "LOOP_SELF_INTERSECTION" in fve([bow])
    crossing_loops = [
        [xyz(0, 0), xyz(0, 10), xyz(10, 10), xyz(10, 0)],
        [xyz(5, 5), xyz(5, 15), xyz(15, 15), xyz(15, 5)],
    ]
    assert "POLYGON_LOOPS_CROSS" in fve(crossing_loops)
    # repair: the bowtie through builder v2 -> output validates clean
    loops, _ = B2.build_polygon([bow], B2.IntLatLngSnapFunction(6))
    assert fve(loops) is None
    # hole polygon (non-crossing nested loops) is valid as-is
    shell = Loop.make_regular(10.0, 40.0, 8.0, 12).vertices
    hole = list(reversed(Loop.make_regular(10.2, 40.1, 3.0, 9).vertices))
    assert fve([shell, hole]) is None
