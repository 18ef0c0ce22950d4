"""Scalar gap-closers: edge-pair distance, compareDistances exact,
expandedByDistanceUV, rect interiorContains."""

import math

import numpy as np
import pytest

from s2geometry_d_spark.s2core import cellid as ci
from s2geometry_d_spark.s2core import coords, measures
from s2geometry_d_spark.s2core import predicates as pred
from s2geometry_d_spark.s2core.cellid import CellId
from s2geometry_d_spark.s2core.regions import LatLngRect, latlng_point


def test_edge_pair_min_dist2():
    a, b = latlng_point(0, 0), latlng_point(0, 10)
    c, d = latlng_point(5, 5), latlng_point(-5, 5)  # crosses (a,b)
    assert measures.edge_pair_min_dist2(a, b, c, d) == 0.0
    # parallel-ish edges: distance equals the known endpoint distance
    e, f = latlng_point(2, 0), latlng_point(2, 10)
    d2 = measures.edge_pair_min_dist2(a, b, e, f)
    expect = measures.point_edge_distance2(e, a, b)
    assert d2 == pytest.approx(expect, rel=1e-12)
    assert d2 > 0
    # shared vertex -> crossing_sign == 0 path, distance 0 via endpoints
    assert measures.edge_pair_min_dist2(a, b, b, latlng_point(5, 20)) == 0.0


def test_compare_distances_exact():
    x = latlng_point(10, 10)
    a = latlng_point(20, 10)
    b = latlng_point(10, 20)
    s = pred.compare_distances(x, a, b)
    da = sum((x[i] - a[i]) ** 2 for i in range(3))
    db = sum((x[i] - b[i]) ** 2 for i in range(3))
    assert s == (1 if da > db else -1)
    # exactly equal distances -> 0 (same point twice)
    assert pred.compare_distances(x, a, a) == 0
    # mirror symmetry: x on the equator, a/b mirrored across it use the
    # exact path (float difference is tiny or zero)
    x2 = latlng_point(0, 0)
    am = latlng_point(30, 7)
    bm = (am[0], am[1], -am[2])  # exact float mirror
    assert pred.compare_distances(x2, am, bm) == 0


def test_expanded_by_distance_uv_contains_buffer():
    cid = CellId.from_latlng(20.0, 30.0).parent(8)
    uv = cid.get_bound_uv()
    face = cid.face()
    dist = math.radians(0.5)
    exp = ci.expanded_by_distance_uv(uv, dist)
    # the expanded rect strictly contains the original
    assert exp[0][0] < uv[0][0] < uv[0][1] < exp[0][1]
    assert exp[1][0] < uv[1][0] < uv[1][1] < exp[1][1]
    # points at distance < dist from the cell project inside the new rect
    rng = np.random.default_rng(4)
    from s2geometry_d_spark.s2core.regions import Cell

    cell = Cell(cid)
    for k in range(4):
        v = np.asarray(cell.get_vertex(k))
        for _ in range(10):
            d = rng.normal(size=3)
            d -= d.dot(v) * v
            d /= np.linalg.norm(d)
            ang = rng.uniform(0, dist * 0.99)
            p = math.cos(ang) * v + math.sin(ang) * d
            # project to THIS face's uv (may fall outside [-1,1])
            f, u, vv = coords.xyz_to_face_uv(p[0], p[1], p[2])
            # skip samples that left the face (rect covers one face only)
            if int(f[0]) != face:
                continue
            assert exp[0][0] <= u[0] <= exp[0][1]
            assert exp[1][0] <= vv[0] <= exp[1][1]


def test_rect_interior_contains():
    r = LatLngRect.from_degrees(-10.0, 10.0, 20.0, 40.0)
    assert r.interior_contains_latlng_radians(math.radians(0), math.radians(30))
    # boundary excluded
    assert not r.interior_contains_latlng_radians(math.radians(10.0), math.radians(30))
    assert not r.interior_contains_latlng_radians(math.radians(0), math.radians(40.0))
    # but plain contains includes it
    assert r.contains_latlng_radians(math.radians(10.0), math.radians(30))


def test_point_utils():
    import numpy as np

    a = latlng_point(10.0, 20.0)
    b = latlng_point(10.0, 20.000001)  # nearly identical
    n = pred.robust_cross_prod(a, b)
    # unit, orthogonal to both
    assert abs(sum(c * c for c in n) - 1.0) < 1e-12
    assert abs(pred._dot(n, a)) < 1e-9 and abs(pred._dot(n, b)) < 1e-9
    # degenerate: equal points -> deterministic orthogonal
    n2 = pred.robust_cross_prod(a, a)
    assert abs(pred._dot(n2, a)) < 1e-12

    # rotate 90 degrees about z: x axis -> y axis
    r = pred.rotate((1.0, 0.0, 0.0), (0.0, 0.0, 1.0), math.pi / 2)
    assert r == pytest.approx((0.0, 1.0, 0.0), abs=1e-15)
    # rotation preserves the angle to the axis
    p = latlng_point(35.0, -40.0)
    ax = latlng_point(80.0, 10.0)
    q = pred.rotate(p, ax, 1.234)
    assert pred._dot(p, ax) == pytest.approx(pred._dot(q, ax), abs=1e-12)

    # frame roundtrip
    z = latlng_point(-25.0, 111.0)
    frame = pred.get_frame(z)
    for pt in (p, a, z):
        local = pred.to_frame(frame, pt)
        back = pred.from_frame(frame, local)
        assert back == pytest.approx(pt, abs=1e-14)
    # frame is right-handed orthonormal
    x, y, zz = frame
    assert pred._dot(x, y) == pytest.approx(0.0, abs=1e-14)
    assert pred._cross(x, y) == pytest.approx(zz, abs=1e-14)
