"""Cell / cell-union area invariants vs closed forms (s2cell.d:237-292)."""

import math

import numpy as np
import pytest

from s2geometry_d_spark.s2core import cellid as ci
from s2geometry_d_spark.s2core import cellunion, metrics
from s2geometry_d_spark.s2core.cellid import CellId
from s2geometry_d_spark.s2core.regions import Cell


def test_face_areas_sum_to_sphere():
    faces = np.array([CellId.from_face(f).id for f in range(6)], dtype=np.uint64)
    total = ci.cells_exact_area(faces).sum()
    assert total == pytest.approx(4 * math.pi, rel=1e-12)
    # each face is exactly 1/6 of the sphere
    assert ci.cells_exact_area(faces) == pytest.approx(
        np.full(6, 4 * math.pi / 6), rel=1e-12
    )


@pytest.mark.parametrize("level", [1, 4, 9, 17])
def test_children_areas_sum_to_parent(level):
    rng = np.random.default_rng(level)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 20)))
    lng = rng.uniform(-180, 180, 20)
    parents = ci.parent(ci.from_latlng(lat, lng), level)
    for p in parents[:5]:
        kids = np.array([c.id for c in CellId(int(p)).children()], dtype=np.uint64)
        assert ci.cells_exact_area(kids).sum() == pytest.approx(
            float(ci.cells_exact_area(np.array([p]))[0]), rel=1e-12
        )


def test_scalar_matches_vector_and_approx_bound():
    rng = np.random.default_rng(2)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 50)))
    lng = rng.uniform(-180, 180, 50)
    for lvl in (3, 12):
        ids = ci.parent(ci.from_latlng(lat, lng), lvl)
        vec = ci.cells_exact_area(ids)
        for k in range(0, 50, 10):
            cell = Cell(CellId(int(ids[k])))
            assert cell.exact_area() == pytest.approx(float(vec[k]), rel=1e-12)
            # approx within 3% of exact (documented accuracy)
            assert cell.approx_area() == pytest.approx(cell.exact_area(), rel=0.03)
            # average-area metric within the min/max area bounds
            assert (
                metrics.MIN_AREA.get_value(lvl)
                <= cell.exact_area()
                <= metrics.MAX_AREA.get_value(lvl) * (1 + 1e-12)
            )


def test_union_area_stats():
    ids = [CellId.from_face(0).id, CellId.from_face(1).child(2).id]
    exact = cellunion.exact_area(ids)
    expected = 4 * math.pi / 6 + Cell(CellId(ids[1])).exact_area()
    assert exact == pytest.approx(expected, rel=1e-12)
    avg = cellunion.average_area(ids)
    assert avg == pytest.approx(
        metrics.AVG_AREA.get_value(0) + metrics.AVG_AREA.get_value(1), rel=1e-12
    )
    assert cellunion.exact_area([]) == 0.0
