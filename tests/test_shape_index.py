"""Unified mixed-shape index (s2shape_index.d:34-148 contract): one table
holds points, polylines and polygons; every consumer (PIP, crossing, range
scan) probes the same artifact with hash parity vs the split paths."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_DIR

from s2geometry_d_spark.functions import kernels
from s2geometry_d_spark.operators.crossing import crossing_edges_join
from s2geometry_d_spark.operators.knn import register_edges
from s2geometry_d_spark.operators.poly_index import (
    build_polygon_index,
    points_in_polygons_table,
    polygons_dataframe,
)
from s2geometry_d_spark.operators.shape_index import (
    crossing_edges_unified,
    points_in_shapes,
    shapes_in_cell_range,
    unified_shape_index,
)
from s2geometry_d_spark.plans import demo
from s2geometry_d_spark.sources import tables


def _fixture(spark):
    from pyspark.sql import Window as W

    regions = demo.many_poly_regions()[:80]
    polys_df = polygons_dataframe(spark, regions)
    pts = tables.spatial_points(spark, SF_DIR).limit(500)
    w = W.orderBy("point_id")
    edges_df = (
        pts.limit(200)
        .withColumn("blat", F.lead("lat").over(w))
        .withColumn("blng", F.lead("lng").over(w))
        .filter(F.col("blat").isNotNull())
        .select(
            F.col("point_id").cast("string").alias("edge_id"),
            F.col("lat").alias("alat"),
            F.col("lng").alias("alng"),
            "blat",
            "blng",
        )
    )
    return pts, edges_df, polys_df, regions


def test_unified_pip_matches_split_path(spark):
    pts, edges_df, polys_df, regions = _fixture(spark)
    idx = unified_shape_index(
        points_df=pts, edges_df=edges_df, polys_df=polys_df
    ).persist()
    try:
        got = {
            (r["poly_id"], r["point_id"])
            for r in points_in_shapes(pts, idx)
            .select("poly_id", "point_id")
            .collect()
        }
        split = build_polygon_index(polys_df)
        want = {
            (r["poly_id"], r["point_id"])
            for r in points_in_polygons_table(pts, split)
            .select("poly_id", "point_id")
            .collect()
        }
        assert got == want and len(want) > 0
    finally:
        idx.unpersist()


def test_unified_crossing_matches_split_path(spark):
    pts, edges_df, polys_df, _ = _fixture(spark)
    idx = unified_shape_index(edges_df=edges_df, polys_df=polys_df).persist()
    targets = [
        ("t0", (-10.0, -40.0), (25.0, 60.0)),
        ("t1", (40.0, -120.0), (-35.0, 80.0)),
    ]
    try:
        got = {
            (r["target_id"], r["edge_id"])
            for r in crossing_edges_unified(idx, targets).collect()
        }
        reg = register_edges(edges_df)
        try:
            want = {
                (r["target_id"], str(r["edge_id"]))
                for r in crossing_edges_join(edges_df, targets, registered_df=reg)
                .select("target_id", "edge_id")
                .collect()
            }
        finally:
            reg.unpersist()
        assert got == want and len(want) > 0
    finally:
        idx.unpersist()


def test_range_scan_returns_mixed_dimensions(spark):
    """A cell-range locate over the unified table surfaces shapes of every
    dimension in one query — the heterogeneous-index contract."""
    pts, edges_df, polys_df, _ = _fixture(spark)
    idx = unified_shape_index(
        points_df=pts, edges_df=edges_df, polys_df=polys_df
    ).persist()
    try:
        # full-sphere range: every shape of every family
        lo, hi = -(1 << 63), (1 << 63) - 1
        dims = {
            r["dim"]
            for r in shapes_in_cell_range(idx, lo, hi).select("dim").distinct().collect()
        }
        assert dims == {0, 1, 2}
        n_shapes = shapes_in_cell_range(idx, lo, hi).count()
        n_pts = pts.count()
        n_edges = edges_df.count()
        assert n_shapes == n_pts + n_edges + 80
    finally:
        idx.unpersist()


def test_unified_index_from_text_source(spark):
    """The s2text_format index string as a distributed index SOURCE: one of
    each dimension, then every consumer family probes the result."""
    from s2geometry_d_spark.operators.shape_index import unified_index_from_text

    s = "5:5 # 6:6, 7:7 # 0:0, 0:4, 4:0"
    src = spark.createDataFrame([("ix0", s)], ["index_id", "text"])
    idx = unified_index_from_text(src).cache()
    dims = {r.dim for r in idx.select("dim").distinct().collect()}
    assert dims == {0, 1, 2}
    sids = {r.shape_id for r in idx.select("shape_id").distinct().collect()}
    assert sids == {"ix0:p0", "ix0:l0e0", "ix0:g0"}

    # PIP through the unified table: a probe inside the triangle hits g0
    probe = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 40.0, 40.0)], ["point_id", "lat", "lng"]
    ).withColumn("cell_id", kernels.cell_from_latlng(F.col("lat"), F.col("lng")))
    hits = points_in_shapes(probe, idx).select("point_id", "poly_id").collect()
    assert {(r.point_id, r.poly_id) for r in hits} == {(1, "ix0:g0")}

    # heterogeneous range scan over the whole sphere finds every shape
    from s2geometry_d_spark.operators.shape_index import shapes_in_cell_range
    all_rows = shapes_in_cell_range(idx, -(1 << 63), (1 << 63) - 1).collect()
    assert {r.shape_id for r in all_rows} == sids
    idx.unpersist()


def test_text_source_two_loop_polygon_and_multi_shape(spark):
    from s2geometry_d_spark.operators.shape_index import index_tables_from_text

    s = "1:2 | 3:4 # 0:0, 1:1, 2:2 | 3:3, 4:4 # 0:0, 0:9, 9:0; 1:1, 1:2, 2:1"
    src = spark.createDataFrame([("a", s)], ["index_id", "text"])
    pts, edges, polys = index_tables_from_text(src)
    assert pts.count() == 2
    assert {r.edge_id for r in edges.collect()} == {"a:l0e0", "a:l0e1", "a:l1e0"}
    prows = polys.collect()
    assert len(prows) == 1 and len(prows[0].loops) == 2
    # hole semantics survive the build: probe in the hole misses, outside hits
    from s2geometry_d_spark.operators.shape_index import (
        points_in_shapes,
        unified_shape_index,
    )
    idx = unified_shape_index(points_df=pts, edges_df=edges, polys_df=polys)
    probe = spark.createDataFrame(
        [(1, 1.3, 1.3), (2, 4.0, 1.0)], ["point_id", "lat", "lng"]
    ).withColumn("cell_id", kernels.cell_from_latlng(F.col("lat"), F.col("lng")))
    hits = {r.point_id for r in points_in_shapes(probe, idx).collect()}
    assert hits == {2}


def test_incremental_update_equals_rebuild(spark):
    """MutableS2ShapeIndex contract (mutable_s2shape_index.d:100-180):
    add + release then lazy apply must equal a from-scratch build — here
    exactly, row for row, because per-shape rows are independent."""
    pts, edges_df, polys_df, regions = _fixture(spark)
    half = len(regions) // 2
    polys_a = polygons_dataframe(spark, regions[:half])
    polys_b = polygons_dataframe(spark, regions[half:])

    base = unified_shape_index(edges_df=edges_df, polys_df=polys_a)
    # add the second polygon half + the points family; release 3 polygons
    # and every odd edge id
    removed = [regions[i][0] for i in (0, 7, 23)] + [
        r["edge_id"]
        for r in edges_df.select("edge_id").collect()
        if int(r["edge_id"]) % 2 == 1
    ]
    from s2geometry_d_spark.operators.shape_index import update_shape_index

    upd = update_shape_index(
        base, add_points=pts, add_polys=polys_b, remove_shape_ids=removed
    )

    keep = set(r for r, _ in regions) - set(removed)
    scratch = unified_shape_index(
        points_df=pts,
        edges_df=edges_df.filter(F.col("edge_id").cast("long") % 2 == 0),
        polys_df=polygons_dataframe(spark, [p for p in regions if p[0] in keep]),
    )

    def key(df):
        return {
            tuple(
                (tuple(map(tuple, x)) if isinstance(x, list) else x) for x in r
            )
            for r in df.select(
                "shape_id", "dim", "cell_signed", "cov_level", "is_interior",
                "ccx", "ccy", "ccz", "c_bit", "ea", "eb",
            ).collect()
        }

    got, want = key(upd), key(scratch)
    assert got == want and len(want) > 0
    # consumer parity through the SAME join machinery
    got_pip = {
        (r["poly_id"], r["point_id"])
        for r in points_in_shapes(pts, upd).select("poly_id", "point_id").collect()
    }
    want_pip = {
        (r["poly_id"], r["point_id"])
        for r in points_in_shapes(pts, scratch)
        .select("poly_id", "point_id")
        .collect()
    }
    assert got_pip == want_pip
    # removed shapes are gone from the artifact
    assert upd.filter(F.col("shape_id").isin(removed[:3])).count() == 0


def test_update_remove_accepts_dataframe_and_broadcasts(spark):
    """Removal set as a one-column DataFrame; the anti-join must broadcast
    (edit-sized side never shuffles the index)."""
    _, edges_df, polys_df, regions = _fixture(spark)
    idx = unified_shape_index(edges_df=edges_df, polys_df=polys_df)
    from s2geometry_d_spark.operators.shape_index import update_shape_index

    rm = spark.createDataFrame([(regions[0][0],)], ["sid"])
    upd = update_shape_index(idx, remove_shape_ids=rm)
    plan = upd._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert upd.filter(F.col("shape_id") == regions[0][0]).count() == 0
