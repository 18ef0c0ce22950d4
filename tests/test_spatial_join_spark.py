"""End-to-end Spark spatial joins vs brute-force oracles on testdata
(the reference cross-validation pattern, SURVEY.md §5.1)."""

import pytest
from pyspark.sql import functions as F

from s2geometry_d_spark.operators import knn as knn_ops
from s2geometry_d_spark.operators.spatial_join import points_in_regions
from s2geometry_d_spark.s2core.loops import Loop, Polygon
from s2geometry_d_spark.s2core.regions import Cap, LatLngRect
from s2geometry_d_spark.sources import tables

from conftest import SF_DIR


@pytest.fixture(scope="module")
def points(spark):
    df = tables.spatial_points(spark, SF_DIR).cache()
    df.count()
    return df


REGIONS = [
    ("cap_paris", Cap.from_latlng_radius(48.85, 2.35, 25.0)),
    ("cap_sydney", Cap.from_latlng_radius(-33.86, 151.21, 18.0)),
    ("rect_dateline", LatLngRect.from_degrees(-20.0, 25.0, 160.0, -160.0)),
    ("poly_andes", Polygon([Loop.make_regular(-20.0, -65.0, 12.0, 16)], "poly_andes")),
]


class TestPipJoin:
    def test_matches_brute_force(self, spark, points):
        got = (
            points_in_regions(points, REGIONS)
            .select("region_id", "point_id")
            .distinct()
            .collect()
        )
        got_set = {(r.region_id, r.point_id) for r in got}

        # brute-force oracle: exact predicate on every (point, region) pair
        rows = points.select("point_id", "lat", "lng").collect()
        from s2geometry_d_spark.s2core.regions import latlng_point

        want = set()
        for rid, region in REGIONS:
            for row in rows:
                p = latlng_point(row.lat, row.lng)
                if isinstance(region, Polygon):
                    inside = region.contains_point(p)
                elif isinstance(region, Cap):
                    inside = region.contains_point(p)
                else:
                    inside = region.contains_point(p)
                if inside:
                    want.add((rid, row.point_id))
        assert got_set == want

    def test_anti_join(self, spark, points):
        from s2geometry_d_spark.operators.spatial_join import points_not_in_regions

        n_total = points.count()
        n_in = (
            points_in_regions(points, REGIONS).select("point_id").distinct().count()
        )
        n_out = points_not_in_regions(points, REGIONS, ["point_id"]).count()
        assert n_in + n_out == n_total


class TestKnnJoin:
    QUERIES = [
        ("q1", 48.85, 2.35),
        ("q2", -33.86, 151.21),
        ("q3", 0.0, 0.0),
        ("q4", 89.0, 10.0),   # near pole
        ("q5", 10.0, 179.9),  # near dateline
    ]

    def test_matches_brute_force(self, spark, points):
        k = 7
        n = points.count()
        got = knn_ops.knn_join(points, self.QUERIES, k, n_points_hint=n)
        brute = knn_ops.knn_brute_force(points, self.QUERIES, k)
        g = {(r.query_id, r.rank): r.point_id for r in got.collect()}
        b = {(r.query_id, r.rank): r.point_id for r in brute.collect()}
        assert g == b


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_tile_assignment_covers_face_seams(spark):
    """Face-straddling tiles (seams, cube corner, pole, antimeridian) must
    cover every point of the footprint — the per-face padded-bbox union."""
    import numpy as np
    from pyspark.sql import functions as F

    from s2geometry_d_spark.operators import tiling
    from s2geometry_d_spark.s2core import cellid as ci

    rows = [(1, 0.0, 45.0, 8.0), (2, 35.264, 45.0, 8.0), (3, 88.0, 10.0, 8.0), (4, 0.0, 180.0, 8.0)]
    imgs = spark.createDataFrame(rows, ["image_id", "lat", "lng", "extent_deg"])
    out = tiling.image_tile_assignment(imgs, known_extents=[8.0]).toPandas()
    for img_id, clat, clng, ext in rows:
        sub = out[out.image_id == img_id]
        cells = ci.from_signed(sub["cell_id"].to_numpy())
        rmin, rmax = ci.range_min(cells), ci.range_max(cells)
        gl = np.clip(np.linspace(clat - ext / 2, clat + ext / 2, 25), -89.9, 89.9)
        gn = np.linspace(clng - ext / 2, clng + ext / 2, 25)
        LA, LO = np.meshgrid(gl, gn)
        LO = ((LO + 180.0) % 360.0) - 180.0
        leafs = ci.from_latlng(LA.ravel(), LO.ravel())
        for lf in leafs:
            assert ((rmin <= lf) & (lf <= rmax)).any(), (img_id, lf)
