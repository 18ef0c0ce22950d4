"""Distributed polygon-index TABLE path (S2ShapeIndex as rows) must agree
exactly with the driver-object broadcast path — same candidates, same
boundary parity decisions — and its plan must contain no driver geometry."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_DIR

from s2geometry_d_spark.operators.poly_index import (
    build_polygon_index,
    points_in_polygons_table,
    polygons_dataframe,
)
from s2geometry_d_spark.operators.spatial_join import points_in_regions
from s2geometry_d_spark.plans import demo
from s2geometry_d_spark.sources import tables


def test_table_path_matches_driver_object_path(spark):
    regions = demo.many_poly_regions()[:120]
    pts = tables.spatial_points(spark, SF_DIR)
    want = {
        (r["region_id"], r["point_id"])
        for r in points_in_regions(pts, regions).select("region_id", "point_id").collect()
    }
    idx = build_polygon_index(polygons_dataframe(spark, regions)).persist()
    jl = int(idx.agg(F.min("cov_level")).collect()[0][0])
    got = {
        (r["poly_id"], r["point_id"])
        for r in points_in_polygons_table(pts, idx, join_level=jl)
        .select("poly_id", "point_id")
        .collect()
    }
    idx.unpersist()
    assert got == want
    assert len(want) > 0


def test_index_rows_have_payload_only_on_boundary(spark):
    regions = demo.many_poly_regions()[:10]
    idx = build_polygon_index(polygons_dataframe(spark, regions))
    rows = idx.collect()
    assert any(r["is_interior"] for r in rows)
    for r in rows:
        if r["is_interior"]:
            assert r["ea"] is None
        else:
            assert r["ea"] is not None and len(r["ea"]) >= 1
            assert len(r["ea"]) == len(r["eb"])


def test_index_table_round_trips_through_parquet(spark, tmp_path):
    """The index is a persistable artifact: write parquet, read back, run
    the join — identical results (the build-once-reuse-everywhere model
    with the index as DATA, not driver state)."""
    regions = demo.many_poly_regions()[:60]
    path = str(tmp_path / "polyindex")
    build_polygon_index(polygons_dataframe(spark, regions)).write.parquet(path)
    idx = spark.read.parquet(path)
    jl = int(idx.agg(F.min("cov_level")).collect()[0][0])
    pts = tables.spatial_points(spark, SF_DIR)
    got = {
        (r["poly_id"], r["point_id"])
        for r in points_in_polygons_table(pts, idx, join_level=jl).collect()
    }
    want = {
        (r["region_id"], r["point_id"])
        for r in points_in_regions(pts, regions).select("region_id", "point_id").collect()
    }
    assert got == want


def test_index_table_multi_loop_holes(spark):
    """Polygons WITH HOLES through the index-TABLE path: the clipped-edge
    cells and contains-center bits are loop-agnostic, so an annulus indexes
    and joins like any polygon — parity against the driver-object path
    (points_in_regions over the same multi-loop polygon)."""
    import numpy as np
    from pyspark.sql import functions as F

    from s2geometry_d_spark.functions import kernels
    from s2geometry_d_spark.operators.poly_index import (
        build_polygon_index,
        points_in_polygons_table,
        polygons_dataframe_loops,
    )
    from s2geometry_d_spark.operators.spatial_join import points_in_regions
    from s2geometry_d_spark.s2core.loops import Loop, Polygon

    shell = Loop.make_regular(5.0, 40.0, 6.0, 12)
    hole = Loop(list(reversed(Loop.make_regular(5.2, 40.3, 2.5, 8).vertices)))
    annulus = Polygon([shell, hole], "annulus")

    rng = np.random.default_rng(21)
    rows = [
        (i, float(5.0 + rng.uniform(-8, 8)), float(40.0 + rng.uniform(-8, 8)))
        for i in range(4000)
    ]
    pts = spark.createDataFrame(rows, ["point_id", "lat", "lng"]).withColumn(
        "cell_id", kernels.cell_from_latlng(F.col("lat"), F.col("lng"))
    )

    idx = build_polygon_index(polygons_dataframe_loops(spark, [("annulus", annulus)]))
    got = {
        r["point_id"]
        for r in points_in_polygons_table(pts, idx).select("point_id").collect()
    }
    want = {
        r["point_id"]
        for r in points_in_regions(pts, [("annulus", annulus)])
        .select("point_id")
        .collect()
    }
    assert got == want
    # the hole is actually exercised: some sampled points fall inside it
    from s2geometry_d_spark.s2core.regions import latlng_point

    in_hole = [
        i for i, la, ln in rows
        if shell.contains_point(latlng_point(la, ln))
        and not annulus.contains_point(latlng_point(la, ln))
    ]
    assert in_hole and not (set(in_hole) & got)


def test_explicit_join_level_validation_is_opt_in(spark):
    """ADVICE round-4: an explicitly-supplied join_level must not trigger
    the min(cov_level) aggregate (it re-executes the index build once per
    PIP call); validation is opt-in and still catches a too-fine level."""
    import pytest

    from s2geometry_d_spark.s2core.loops import Loop, Polygon

    polys = [
        ("a", Loop.make_regular(0.0, 0.0, 5.0, 8)),
    ]
    idx = build_polygon_index(
        polygons_dataframe(spark, [(p, Polygon([lp], p)) for p, lp in polys])
    )
    min_cov = idx.agg(F.min("cov_level")).collect()[0][0]
    pts = tables.spatial_points(spark, SF_DIR)
    # memoized: a second default-level call must reuse the cached min
    points_in_polygons_table(pts, idx).columns
    assert getattr(idx, "_s2_min_cov_level") == min_cov
    # explicit + validate_level=True rejects a finer-than-coarsest level
    with pytest.raises(ValueError, match="finer"):
        points_in_polygons_table(pts, idx, join_level=min_cov + 1, validate_level=True)
    # explicit without validation: no aggregate, plan still builds
    fresh = build_polygon_index(
        polygons_dataframe(spark, [(p, Polygon([lp], p)) for p, lp in polys])
    )
    df = points_in_polygons_table(pts, fresh, join_level=min_cov)
    assert "poly_id" in df.columns
    assert getattr(fresh, "_s2_min_cov_level", None) is None
