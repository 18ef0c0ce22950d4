"""Vertex models OPEN / SEMI_OPEN / CLOSED (s2contains_point_query.d:50-72):
on-vertex points are excluded by OPEN, included by CLOSED; SEMI_OPEN keeps
crossing parity.  Both scalar and Spark-join paths."""

import numpy as np
import pytest

from s2geometry_d_spark.s2core import coords
from s2geometry_d_spark.s2core.loops import Loop, Polygon


@pytest.fixture(scope="module")
def poly():
    return Polygon([Loop.make_regular(10.0, 20.0, 8.0, 12)], "p")


def test_scalar_vertex_models(poly):
    v = poly.loops[0].vertices[3]
    assert poly.contains_point(v, model="open") is False
    assert poly.contains_point(v, model="closed") is True
    # semi_open on a vertex: deterministic parity (one of the two), and the
    # interior / exterior answers are model-independent
    center = poly.loops[0].vertices[0]
    import numpy as _np

    inside_pt = tuple(
        _np.array([0.0, 0.0, 0.0])
        + _np.mean(_np.asarray(poly.loops[0].vertices), axis=0)
    )
    inside_pt = tuple(_np.asarray(inside_pt) / _np.linalg.norm(inside_pt))
    for model in ("open", "semi_open", "closed"):
        assert poly.contains_point(inside_pt, model=model) is True
        assert poly.contains_point((0.0, 0.0, 1.0), model=model) is False


def test_vectorized_vertex_models(poly):
    verts = np.asarray(poly.loops[0].vertices)
    x, y, z = verts[:, 0], verts[:, 1], verts[:, 2]
    assert not poly.contains_points_vec(x, y, z, model="open").any()
    assert poly.contains_points_vec(x, y, z, model="closed").all()


def test_spark_join_vertex_models(spark, poly):
    from s2geometry_d_spark.functions import kernels
    from s2geometry_d_spark.operators.spatial_join import points_in_regions
    from pyspark.sql import functions as F

    # rows: every polygon vertex (as lat/lng) + one interior + one exterior
    rows = []
    for i, v in enumerate(poly.loops[0].vertices):
        lat, lng = coords.xyz_to_latlng(*[np.array([c]) for c in v])
        rows.append((i, float(lat[0]), float(lng[0])))
    rows.append((100, 10.0, 20.0))   # interior (polygon center)
    rows.append((101, -60.0, -100.0))  # exterior
    pts = spark.createDataFrame(rows, ["point_id", "lat", "lng"]).withColumn(
        "cell_id", kernels.cell_from_latlng(F.col("lat"), F.col("lng"))
    )

    def hit_ids(model):
        out = points_in_regions(pts, [("p", poly)], vertex_model=model)
        return {r.point_id for r in out.select("point_id").collect()}

    closed = hit_ids("closed")
    opened = hit_ids("open")
    assert 100 in closed and 100 in opened  # interior always in
    assert 101 not in closed and 101 not in opened  # exterior always out
    # vertices: all in for closed, none for open.  NOTE: lat/lng roundtrip
    # must reproduce the vertex exactly for the equality test — verify the
    # roundtrip first and only assert on exact-roundtrip vertices.
    exact = set()
    for i, v in enumerate(poly.loops[0].vertices):
        lat, lng = coords.xyz_to_latlng(*[np.array([c]) for c in v])
        x2, y2, z2 = coords.latlng_to_xyz(lat, lng)
        if (float(x2[0]), float(y2[0]), float(z2[0])) == v:
            exact.add(i)
    assert exact, "no vertex survives the latlng roundtrip exactly"
    assert exact <= closed
    assert not (exact & opened)
