"""S2ShapeIndexRegion parity (s2shape_index_region.d:69-318): the unified
index table as a region — getCellUnionBound, contains(S2Cell),
mayIntersect(S2Cell) — with the reference's conservative directions checked
EXACTLY against driver-object brute force:

* contains=true  must imply the cell truly is inside a single shape;
* may_intersect=false must imply the cell truly is disjoint from all shapes;
* and both must be TIGHT enough to be non-trivial (deep-inside cells do
  report contains, far cells do report disjoint).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from s2geometry_d_spark.operators.index_region import (
    cells_region_relation,
    index_cell_union_bound,
)
from s2geometry_d_spark.operators.poly_index import polygons_dataframe
from s2geometry_d_spark.operators.shape_index import unified_shape_index
from s2geometry_d_spark.s2core import predicates
from s2geometry_d_spark.s2core.cellid import CellId
from s2geometry_d_spark.s2core.loops import Loop, Polygon
from s2geometry_d_spark.s2core.regions import Cell

_FLIP = 1 << 63


def _signed(u: int) -> int:
    v = (u ^ _FLIP) & ((1 << 64) - 1)
    return v - (1 << 64) if v >= _FLIP else v


def _unsigned(s: int) -> int:
    return (int(s) ^ _FLIP) & ((1 << 64) - 1)


def _brute_cell_relation(poly: Polygon, cid: CellId) -> tuple[bool, bool]:
    """(contains, intersects) by exact geometry: corner/center containment
    + pairwise edge crossings + polygon-vertex-in-cell."""
    cell = Cell(cid)
    corners = [cell.get_vertex(k) for k in range(4)]
    pts = np.asarray(corners + [cid.to_point()], dtype=np.float64)
    inside = poly.contains_points_vec(pts[:, 0], pts[:, 1], pts[:, 2])
    crossing = False
    for k in range(4):
        a, b = corners[k], corners[(k + 1) % 4]
        for ea, eb in poly._all_edges:
            if predicates.crossing_sign(a, b, tuple(ea), tuple(eb)) >= 0:
                crossing = True
                break
        if crossing:
            break
    contains = bool(inside.all()) and not crossing
    vertex_in = any(
        CellId.from_point(*v).parent(cid.level()).id == cid.id
        for ea, _ in poly._all_edges
        for v in [ea]
    )
    intersects = bool(inside.any()) or crossing or vertex_in
    return contains, intersects


def _target_df(spark, cells):
    return spark.createDataFrame([(int(c),) for c in cells], ["tcell"])


def test_relation_conservative_and_tight_vs_brute(spark):
    poly = Polygon([Loop.make_regular(12.0, 34.0, 3.0, 7)], "hex")
    idx = unified_shape_index(
        polys_df=polygons_dataframe(spark, [("hex", poly)])
    ).persist()
    try:
        # targets: the full subtree around the polygon at levels 4..11 plus
        # far-away cells — built from the polygon's own cap center
        center = CellId.from_point(*poly.loops[0].vertices[0])
        cells = []
        for lvl in range(4, 12):
            base = center.parent(lvl)
            cells.append(_signed(base.id))
            # neighborhood sweep: siblings-of-ancestors give partial overlaps
            for d in (-2, -1, 1, 2):
                cells.append(_signed(CellId(base.id + d * 2 * (base.id & -base.id)).id))
        far = CellId.from_point(-0.9, 0.1, -0.3)
        cells += [_signed(far.parent(l).id) for l in range(4, 12)]
        cells = sorted(set(cells))

        rel = {
            int(r["tcell"]): (bool(r["contains"]), bool(r["may_intersect"]))
            for r in cells_region_relation(_target_df(spark, cells), idx).collect()
        }
        assert set(rel) == set(cells)

        n_contained = n_disjoint = 0
        for s in cells:
            cid = CellId(_unsigned(s))
            bc, bi = _brute_cell_relation(poly, cid)
            ec, em = rel[s]
            assert not ec or bc, f"claimed contains on non-contained {cid.id:#x}"
            assert em or not bi, f"claimed disjoint on intersecting {cid.id:#x}"
            n_contained += ec
            n_disjoint += not em
        # tightness: the deep-inside and far cells must actually classify
        assert n_contained >= 3
        assert n_disjoint >= 6
    finally:
        idx.unpersist()


def test_subdivided_and_coarse_target_path(spark):
    poly = Polygon([Loop.make_regular(-40.0, 100.0, 1.5, 6)], "p0")
    idx = unified_shape_index(
        polys_df=polygons_dataframe(spark, [("p0", poly)])
    ).persist()
    try:
        jl = int(idx.agg(F.min("cov_level")).collect()[0][0])
        center = CellId.from_point(*poly.loops[0].vertices[0])
        coarse = [_signed(center.parent(l).id) for l in range(1, jl)]
        rel = cells_region_relation(_target_df(spark, coarse), idx).collect()
        for r in rel:
            # target strictly contains index cells: SUBDIVIDED — intersects,
            # never "contained by a single shape"
            assert bool(r["may_intersect"]) and not bool(r["contains"])
    finally:
        idx.unpersist()


def test_point_and_edge_shapes_never_contain(spark):
    pts = [("pt0", 5.0, 5.0)]
    edges = [("e0", 6.0, 6.0, 7.0, 7.0)]
    pts_df = spark.createDataFrame(pts, ["point_id", "lat", "lng"])
    edges_df = spark.createDataFrame(edges, ["edge_id", "alat", "alng", "blat", "blng"])
    idx = unified_shape_index(points_df=pts_df, edges_df=edges_df).persist()
    try:
        from s2geometry_d_spark.s2core.regions import latlng_point
        p_leaf = CellId.from_point(*latlng_point(5.0, 5.0))
        targets = [_signed(p_leaf.parent(l).id) for l in (8, 12, 30)]
        far = CellId.from_point(*latlng_point(-60.0, -120.0))
        targets.append(_signed(far.parent(8).id))
        rel = {
            int(r["tcell"]): (bool(r["contains"]), bool(r["may_intersect"]))
            for r in cells_region_relation(_target_df(spark, targets), idx).collect()
        }
        for s, (c, m) in rel.items():
            assert not c  # dim 0/1 shapes have no interior
        assert rel[_signed(far.parent(8).id)][1] is False
        assert rel[_signed(p_leaf.parent(8).id)][1] is True
    finally:
        idx.unpersist()


def test_cell_union_bound_single_face_and_multi_face(spark):
    one = Polygon([Loop.make_regular(20.0, 20.0, 2.0, 6)], "a")
    idx1 = unified_shape_index(
        polys_df=polygons_dataframe(spark, [("a", one)])
    ).persist()
    try:
        bound = index_cell_union_bound(idx1)
        assert 1 <= len(bound) <= 4  # single-face refinement
        rows = idx1.select("cell_signed").collect()
        for r in rows:
            s = int(r["cell_signed"])
            lsbs = [b & -b for b in bound]
            assert any(
                b - (l - 1) <= s <= b + (l - 1) for b, l in zip(bound, lsbs)
            ), "index cell outside bound"
    finally:
        idx1.unpersist()

    two = [
        ("a", Polygon([Loop.make_regular(10.0, 10.0, 2.0, 6)], "a")),
        ("b", Polygon([Loop.make_regular(10.0, 130.0, 2.0, 6)], "b")),
    ]
    idx2 = unified_shape_index(polys_df=polygons_dataframe(spark, two)).persist()
    try:
        bound = index_cell_union_bound(idx2)
        assert 2 <= len(bound) <= 6
        rows = idx2.select("cell_signed").collect()
        for r in rows:
            s = int(r["cell_signed"])
            assert any(
                b - ((b & -b) - 1) <= s <= b + ((b & -b) - 1) for b in bound
            )
        # per-face shrink: each bound cell must be far smaller than a face
        for b in bound:
            assert CellId(_unsigned(b)).level() >= 2
    finally:
        idx2.unpersist()


def test_empty_index_bound():
    pass  # index_cell_union_bound of an empty frame is covered below


def test_bound_of_empty_and_single_cell(spark):
    from pyspark.sql import types as T

    empty = spark.createDataFrame(
        [], "cell_signed long, cov_level int"
    )
    assert index_cell_union_bound(empty) == []
