"""Snap-rounding (builder-lite, reference s2builder.d + cell-center snap
function): movement bound, degeneracy cancellation, collapse handling, and
composition with the overlay on snapped inputs."""

from __future__ import annotations

import math

from s2geometry_d_spark.s2core import boolean as B
from s2geometry_d_spark.s2core import builder as bld
from s2geometry_d_spark.s2core.loops import Loop, Polygon
from s2geometry_d_spark.s2core.regions import chord2_between, chord2_to_radians, latlng_point


def test_snap_movement_within_radius():
    level = 12
    lp = Loop.make_regular(37.0, 127.0, 5.0, 64)
    snapped = bld.snap_loop(lp.vertices, level)
    assert snapped is not None
    r = bld.snap_radius(level)
    for v in lp.vertices:
        s = bld.snap_to_cell_center(v, level)
        moved = chord2_to_radians(chord2_between(v, s))
        assert moved <= r * (1 + 1e-9)


def test_snap_cancels_duplicates_and_spikes():
    a = latlng_point(10.0, 10.0)
    b = latlng_point(10.0, 11.0)
    c = latlng_point(11.0, 10.5)
    d = latlng_point(9.5, 10.5)
    # duplicate + spike (c -> d -> c)
    verts = [a, a, b, c, d, c]
    cleaned = bld._cancel_degeneracies(verts)
    assert cleaned == [a, b, c]


def test_tiny_sliver_collapses_to_none():
    # a sliver far smaller than the level-6 cell size, placed INSIDE one
    # cell (not on a corner, where 4 centers are legitimately distinct),
    # snaps to a single center and vanishes
    lp = Loop.make_regular(0.3, 0.4, 0.001, 8)
    assert bld.snap_loop(lp.vertices, 6) is None


def test_snapped_polygon_area_close_and_overlay_composes():
    level = 14
    a = Polygon([Loop.make_regular(10.0, 20.0, 8.0, 24)], "a")
    b = Polygon([Loop.make_regular(12.0, 23.0, 8.0, 24)], "b")
    sa = bld.snap_polygon(a, level)
    sb = bld.snap_polygon(b, level)
    assert sa is not None and sb is not None
    area = B.loops_signed_area([lp.vertices for lp in a.loops])
    area_s = B.loops_signed_area([lp.vertices for lp in sa.loops])
    # area drift bounded by perimeter * snap radius (loose factor 4)
    perim = 2 * math.pi * math.sin(math.radians(8.0))
    assert abs(area - area_s) <= 4 * perim * bld.snap_radius(level)
    inter = B.overlay(sa, sb, "intersection")
    assert inter, "snapped polygons must still overlay"
    ai = B.loops_signed_area(inter)
    ai_raw = B.loops_signed_area(B.overlay(a, b, "intersection"))
    assert abs(ai - ai_raw) <= 8 * perim * bld.snap_radius(level)
