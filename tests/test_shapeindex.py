"""PolygonCellIndex invariants: brute-force parity, clipped-edge bounds,
covering completeness (driver-side, no Spark)."""

import numpy as np
import pytest

from s2geometry_d_spark.s2core import cellid as ci
from s2geometry_d_spark.s2core import coords
from s2geometry_d_spark.s2core.loops import Loop, Polygon
from s2geometry_d_spark.s2core.shapeindex import PolygonCellIndex


def _random_points(n, seed=7):
    rng = np.random.default_rng(seed)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180.0, 180.0, n)
    x, y, z = coords.latlng_to_xyz(lat, lng)
    return x, y, z, ci.from_xyz(x, y, z)


@pytest.mark.parametrize(
    "spec",
    [
        (-20.0, -65.0, 12.0, 12),     # the demo 12-gon
        (37.0, 127.0, 20.0, 2000),    # dense regular loop
        (80.0, 0.0, 15.0, 64),        # near-polar
        (0.0, 179.5, 30.0, 48),       # straddles the dateline + face seams
    ],
)
def test_index_matches_bruteforce(spec):
    lat, lng, r, n = spec
    poly = Polygon([Loop.make_regular(lat, lng, r, n)], "p")
    idx = PolygonCellIndex(poly)
    x, y, z, cells = _random_points(5000)
    got = idx.contains_points(x, y, z, cells)
    want = poly.contains_points_vec(x, y, z)
    assert (got == want).all()


def test_clipped_edge_bound_holds():
    poly = Polygon([Loop.make_regular(37.0, 127.0, 20.0, 2000)], "p")
    idx = PolygonCellIndex(poly, max_edges_per_cell=16)
    # boundary cells respect the cap unless forced terminal by max_level
    from s2geometry_d_spark.s2core.cellid import CellId

    for cid, _, _, near in idx.boundary:
        assert near.size <= 16 or CellId(cid).level() >= 18
    assert idx.num_boundary_cells() > 100  # actually subdivided


def test_multi_loop_polygon_with_hole():
    shell = Loop.make_regular(10.0, 10.0, 15.0, 32)
    hole_ccw = Loop.make_regular(10.0, 10.0, 6.0, 24)
    # even-odd semantics: a same-orientation inner loop acts as a hole
    poly = Polygon([shell, hole_ccw], "ring")
    idx = PolygonCellIndex(poly)
    x, y, z, cells = _random_points(8000, seed=11)
    got = idx.contains_points(x, y, z, cells)
    want = poly.contains_points_vec(x, y, z)
    assert (got == want).all()
    # the hole interior is genuinely excluded
    hx, hy, hz = coords.latlng_to_xyz(np.array([10.0]), np.array([10.0]))
    hc = ci.from_xyz(hx, hy, hz)
    assert not idx.contains_points(hx, hy, hz, hc)[0]


def test_interior_cells_are_truly_interior():
    poly = Polygon([Loop.make_regular(-20.0, -65.0, 12.0, 12)], "p")
    idx = PolygonCellIndex(poly)
    # sample each interior cell's center and corners: all must be inside
    from s2geometry_d_spark.s2core.regions import Cell
    from s2geometry_d_spark.s2core.cellid import CellId

    pts = []
    for cid in idx.interior_cells:
        cell = Cell(CellId(cid))
        pts.append(CellId(cid).to_point())
        pts.extend(cell.get_vertex(k) for k in range(4))
    pts = np.asarray(pts)
    assert poly.contains_points_vec(pts[:, 0], pts[:, 1], pts[:, 2]).all()
