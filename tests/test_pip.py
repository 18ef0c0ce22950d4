"""Point-in-polygon correctness: vectorized kernel vs scalar brute force,
regular/fractal-ish loops, holes, adversarial points (vertices, edges,
poles).  Mirrors the reference PIP test approach (s2loop tests +
s2contains_point_query semantics, SEMI_OPEN-style parity counting)."""

import math
import random

import numpy as np
import pytest

from s2geometry_d_spark.s2core import predicates as pred
from s2geometry_d_spark.s2core.cellid import CellId
from s2geometry_d_spark.s2core.coverer import CovererOptions, RegionCoverer
from s2geometry_d_spark.s2core.loops import Loop, Polygon
from s2geometry_d_spark.s2core.regions import Cell, latlng_point

rnd = random.Random(42)


class TestSign:
    def test_triage_vs_exact_consistency(self):
        for _ in range(500):
            a = _rand_point()
            b = _rand_point()
            c = _rand_point()
            t = pred.triage_sign(a, b, c)
            if t != 0:
                assert t == pred.exact_sign(a, b, c)

    def test_sign_antisymmetry(self):
        for _ in range(200):
            a, b, c = _rand_point(), _rand_point(), _rand_point()
            assert pred.sign(a, b, c) == -pred.sign(b, a, c)
            assert pred.sign(a, b, c) == pred.sign(b, c, a)

    def test_degenerate_nonzero(self):
        # nearly-collinear points still get a deterministic nonzero sign
        a = latlng_point(0.0, 0.0)
        b = latlng_point(0.0, 1.0)
        c = latlng_point(0.0, 2.0)  # on the equator: exactly collinear-ish
        s = pred.sign(a, b, c)
        assert s in (-1, 1)
        assert s == -pred.sign(b, a, c)  # consistency under swap


class TestCrossing:
    def test_simple_crossing(self):
        a = latlng_point(-1.0, 0.0)
        b = latlng_point(1.0, 0.0)
        c = latlng_point(0.0, -1.0)
        d = latlng_point(0.0, 1.0)
        assert pred.crossing_sign(a, b, c, d) == 1
        assert pred.crossing_sign(a, c, b, d) == -1

    def test_shared_vertex(self):
        a = latlng_point(0.0, 0.0)
        b = latlng_point(1.0, 1.0)
        c = latlng_point(0.0, 5.0)
        assert pred.crossing_sign(a, b, a, c) == 0


def _rand_point():
    z = rnd.uniform(-1, 1)
    th = rnd.uniform(0, 2 * math.pi)
    r = math.sqrt(1 - z * z)
    return (r * math.cos(th), r * math.sin(th), z)


class TestLoopContains:
    def test_regular_loop_center_inside(self):
        loop = Loop.make_regular(45.0, 30.0, 5.0, 16)
        assert loop.contains_point(latlng_point(45.0, 30.0))
        assert not loop.contains_point(latlng_point(-45.0, 30.0))
        assert not loop.contains_point(latlng_point(45.0, 41.0))

    def test_vec_matches_scalar(self):
        for trial in range(5):
            lat0 = rnd.uniform(-60, 60)
            lng0 = rnd.uniform(-180, 180)
            radius = rnd.uniform(0.5, 20.0)
            loop = Loop.make_regular(lat0, lng0, radius, rnd.randint(3, 64))
            lats = np.array([lat0 + rnd.uniform(-2 * radius, 2 * radius) for _ in range(300)])
            lngs = np.array([lng0 + rnd.uniform(-2 * radius, 2 * radius) for _ in range(300)])
            from s2geometry_d_spark.s2core import coords

            x, y, z = coords.latlng_to_xyz(lats, lngs)
            got = loop.contains_points_vec(x, y, z)
            for i in range(len(lats)):
                want = loop.contains_point((x[i], y[i], z[i]))
                assert got[i] == want, f"trial {trial} i={i}"

    def test_point_near_pole_loop(self):
        loop = Loop.make_regular(89.0, 0.0, 2.0, 12)
        assert loop.contains_point(latlng_point(89.5, 90.0))
        assert not loop.contains_point(latlng_point(85.0, 0.0))

    def test_adversarial_vertex_points(self):
        loop = Loop.make_regular(10.0, 10.0, 3.0, 8)
        # querying the loop's own vertices: must not crash, parity well-defined
        results = [loop.contains_point(v) for v in loop.vertices]
        assert all(isinstance(r, (bool, np.bool_)) for r in results)


class TestPolygonHoles:
    def test_shell_with_hole(self):
        shell = Loop.make_regular(0.0, 0.0, 10.0, 24)
        hole = Loop.make_regular(0.0, 0.0, 4.0, 24)
        poly = Polygon([shell, hole], "donut")
        assert not poly.contains_point(latlng_point(0.0, 0.0))  # in the hole
        assert poly.contains_point(latlng_point(0.0, 7.0))  # in the ring
        assert not poly.contains_point(latlng_point(0.0, 15.0))  # outside

    def test_polygon_covering_valid(self):
        poly = Polygon([Loop.make_regular(20.0, -40.0, 6.0, 32)], "p1")
        coverer = RegionCoverer(CovererOptions(max_cells=16))
        cov = coverer.get_covering(poly)
        interior = coverer.get_interior_covering(poly)
        assert cov
        from s2geometry_d_spark.s2core import cellunion as cu

        # all sample points inside the polygon are covered
        for _ in range(300):
            lat = 20.0 + rnd.uniform(-7, 7)
            lng = -40.0 + rnd.uniform(-8, 8)
            p = latlng_point(lat, lng)
            if poly.contains_point(p):
                assert cu.contains_id(cov, CellId.from_point(*p).id)
        # interior covering cells are fully inside
        for cid in interior:
            assert poly.contains_cell(Cell(CellId(cid)))


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
