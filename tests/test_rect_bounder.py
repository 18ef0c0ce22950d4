"""Edge-aware rect bounder (reference: s2latlng_rect_bounder.d).

Pinned fixtures: the classic same-latitude bulge (two lat-45 points 90 deg
of longitude apart peak at atan(tan 45 / cos 45) ~ 54.7356 deg; 180 deg
apart they graze the pole), plus random-edge containment sampling and the
rect -> cap soundness that replaces the hemisphere full-sphere fallback.
"""

from __future__ import annotations

import math
import random

import numpy as np

from s2geometry_d_spark.s2core import rectbounder as rb
from s2geometry_d_spark.s2core.loops import Loop, Polygon
from s2geometry_d_spark.s2core.polyline import Polyline
from s2geometry_d_spark.s2core.regions import chord2_between, latlng_point


def _lat(p):
    return math.degrees(math.atan2(p[2], math.hypot(p[0], p[1])))


def test_same_latitude_bulge_exact():
    a = latlng_point(45.0, -45.0)
    b = latlng_point(45.0, 45.0)
    r = rb.edge_rect_bound(a, b)
    expect = math.degrees(math.atan(math.tan(math.radians(45.0)) / math.cos(math.radians(45.0))))
    assert abs(math.degrees(r.lat_hi) - expect) < 1e-9
    assert abs(math.degrees(r.lat_lo) - 45.0) < 1e-9
    # southern mirror bulges down
    r2 = rb.edge_rect_bound(latlng_point(-45.0, 10.0), latlng_point(-45.0, 100.0))
    assert abs(math.degrees(r2.lat_lo) + expect) < 1e-9


def test_pole_grazing_edge_gets_full_lng():
    a = latlng_point(45.0, -90.0)
    b = latlng_point(45.0, 90.0)
    r = rb.edge_rect_bound(a, b)
    assert math.degrees(r.lat_hi) > 89.999999
    assert r.lng.is_full()


def test_monotone_lat_edge_has_no_bulge():
    a = latlng_point(10.0, 20.0)
    b = latlng_point(50.0, 25.0)
    r = rb.edge_rect_bound(a, b)
    assert abs(math.degrees(r.lat_lo) - 10.0) < 1e-9
    assert abs(math.degrees(r.lat_hi) - 50.0) < 1e-9


def test_random_edges_sampled_points_contained():
    rnd = random.Random(11)
    for _ in range(200):
        lat1, lng1 = rnd.uniform(-80, 80), rnd.uniform(-180, 180)
        lat2, lng2 = lat1 + rnd.uniform(-40, 40), lng1 + rnd.uniform(-90, 90)
        lat2 = max(-89.9, min(89.9, lat2))
        a = np.array(latlng_point(lat1, lng1))
        b = np.array(latlng_point(lat2, lng2))
        r = rb.edge_rect_bound(tuple(a), tuple(b))
        for t in np.linspace(0.0, 1.0, 17):
            p = a + (b - a) * t
            p = p / np.linalg.norm(p)
            lat = math.atan2(p[2], math.hypot(p[0], p[1]))
            lng = math.atan2(p[1], p[0])
            assert r.lat_lo - 1e-12 <= lat <= r.lat_hi + 1e-12
            assert r.lng.contains(lng) or r.lng.contains(lng + 1e-12) or r.lng.contains(lng - 1e-12)


def test_polyline_rect_bound_covers_bulge():
    pl = Polyline.from_latlngs([(45.0, -60.0), (45.0, 30.0), (20.0, 40.0)])
    r = pl.get_rect_bound()
    # first edge spans 90 deg of lng at lat 45 -> bulges to ~54.7
    assert math.degrees(r.lat_hi) > 54.7


def test_polygon_cap_bound_not_full_sphere_at_hemisphere_scale():
    """Round-2 gap: a hemisphere-scale polygon fell back to the full-sphere
    cap, seeding coverings from all six faces.  The rect-derived cap must
    stay a proper subset while containing every loop point and edge bulge."""
    big = Polygon([Loop.make_regular(40.0, 10.0, 70.0, 64)], "big")
    cap = big.get_cap_bound()
    assert not cap.is_full()
    for v in big.loops[0].vertices:
        assert cap.contains_point(v)
    # interior samples stay inside too (cap must bound the REGION)
    for f in np.linspace(0.1, 0.9, 7):
        inner = Loop.make_regular(40.0, 10.0, 70.0 * f, 32)
        for v in inner.vertices[::8]:
            assert cap.contains_point(v)


def test_polar_polygon_rect_reaches_pole():
    ring = Polygon([Loop.make_regular(90.0, 0.0, 15.0, 24)], "polar")
    r = ring.get_rect_bound()
    assert math.degrees(r.lat_hi) == 90.0
    assert r.lng.is_full()


def test_rect_cap_bound_contains_rect_corners():
    from s2geometry_d_spark.s2core.regions import LatLngRect

    rnd = random.Random(5)
    for _ in range(100):
        lat_lo = rnd.uniform(-80, 70)
        lat_hi = lat_lo + rnd.uniform(1, 160 - max(0.0, lat_lo + 80))
        lat_hi = min(lat_hi, 89.0)
        lng_lo = rnd.uniform(-180, 180)
        span = rnd.uniform(1, 350)
        rect = LatLngRect.from_degrees(lat_lo, lat_hi, lng_lo, ((lng_lo + span + 180) % 360) - 180)
        cap = rb.rect_cap_bound(rect)
        for la in (lat_lo, lat_hi, 0.5 * (lat_lo + lat_hi)):
            for t in np.linspace(0, 1, 9):
                ln = lng_lo + span * t
                p = latlng_point(la, ((ln + 180) % 360) - 180)
                assert chord2_between(cap.center, p) <= cap.radius2 * (1 + 1e-9) + 1e-12
