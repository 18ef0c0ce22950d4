"""Measures (areas/centroids/edge geometry), flood-fill coverings,
within-distance join, group bounds, SMJ covering-join parity."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2geometry_d_spark.s2core import measures as m
from s2geometry_d_spark.s2core.cellid import CellId
from s2geometry_d_spark.s2core.loops import Loop
from s2geometry_d_spark.s2core.regions import Cap, Cell, latlng_point

rnd = random.Random(5)


class TestMeasures:
    def test_octant_triangle(self):
        # the (+x, +y, +z) octant triangle has area pi/2
        a, b, c = (1, 0, 0), (0, 1, 0), (0, 0, 1)
        assert abs(m.triangle_area(a, b, c) - math.pi / 2) < 1e-12
        assert m.signed_triangle_area(a, b, c) > 0
        assert m.signed_triangle_area(a, c, b) < 0

    def test_loop_area_matches_cap(self):
        # regular loops converge to the cap area as n grows
        for radius in (5.0, 20.0, 60.0):
            loop = Loop.make_regular(30.0, 50.0, radius, 512)
            cap_a = m.cap_area(math.radians(radius))
            assert abs(m.loop_area(loop.vertices) - cap_a) / cap_a < 1e-3

    def test_cell_area_sums(self):
        # 6 face cells cover the sphere: total area 4*pi via loop fans
        total = 0.0
        for f in range(6):
            cell = Cell(CellId.from_face(f))
            vs = [cell.get_vertex(k) for k in range(4)]
            total += m.loop_area(vs)
        assert abs(total - 4 * math.pi) < 1e-9

    def test_interpolate_endpoints(self):
        a = latlng_point(0.0, 0.0)
        b = latlng_point(0.0, 90.0)
        mid = m.interpolate(a, b, 0.5)
        lat = math.degrees(math.atan2(mid[2], math.hypot(mid[0], mid[1])))
        lng = math.degrees(math.atan2(mid[1], mid[0]))
        assert abs(lat) < 1e-12 and abs(lng - 45.0) < 1e-9
        assert np.allclose(m.interpolate(a, b, 0.0), a)
        assert np.allclose(m.interpolate(a, b, 1.0), b, atol=1e-12)

    def test_project_and_distance(self):
        a = latlng_point(0.0, 0.0)
        b = latlng_point(0.0, 10.0)
        p = latlng_point(1.0, 5.0)  # above the middle of the edge
        q = m.project_to_edge(p, a, b)
        lat_q = math.degrees(math.atan2(q[2], math.hypot(q[0], q[1])))
        assert abs(lat_q) < 1e-9  # projection lies on the equator edge
        # beyond the endpoint -> clamps to the endpoint
        p2 = latlng_point(0.0, 20.0)
        q2 = m.project_to_edge(p2, a, b)
        assert np.allclose(q2, b)

    def test_vectorized_edge_distance_matches_scalar(self):
        loop = Loop.make_regular(10.0, 10.0, 5.0, 16)
        edges = loop.edges()
        pts = [latlng_point(rnd.uniform(0, 20), rnd.uniform(0, 20)) for _ in range(200)]
        px = np.array([p[0] for p in pts])
        py = np.array([p[1] for p in pts])
        pz = np.array([p[2] for p in pts])
        vec = m.point_edges_min_dist2(px, py, pz, edges)
        for i, p in enumerate(pts):
            want = min(m.point_edge_distance2(p, a, b) for a, b in edges)
            assert abs(vec[i] - want) < 1e-12

    def test_polyline(self):
        vs = [latlng_point(0.0, k * 10.0) for k in range(4)]  # 30 deg total
        assert abs(m.polyline_length(vs) - math.radians(30)) < 1e-9
        p = m.polyline_interpolate(vs, 0.5)
        lng = math.degrees(math.atan2(p[1], p[0]))
        assert abs(lng - 15.0) < 1e-9


class TestFloodFill:
    def test_simple_covering_matches_coverer_membership(self):
        from s2geometry_d_spark.s2core import cellunion as cu
        from s2geometry_d_spark.s2core.coverer import get_simple_covering

        cap = Cap.from_latlng_radius(10.0, 20.0, 3.0)
        level = 8
        cells = sorted(get_simple_covering(cap, cap.center, level))
        assert cells
        for cid in cells:
            assert CellId(cid).level() == level
            assert cap.may_intersect_cell(Cell(CellId(cid)))
        # complete: sample points inside the cap are covered
        for _ in range(300):
            lat = 10.0 + rnd.uniform(-3.2, 3.2)
            lng = 20.0 + rnd.uniform(-3.3, 3.3)
            p = latlng_point(lat, lng)
            if cap.contains_point(p):
                assert cu.contains_id(cells, CellId.from_point(*p).id)


class TestDistanceOps:
    def test_within_distance_matches_bruteforce(self, spark):
        from s2geometry_d_spark.operators.distance import within_distance_join
        from s2geometry_d_spark.s2core.regions import chord2_from_radians
        from s2geometry_d_spark.sources import tables
        from conftest import SF_DIR

        pts = tables.spatial_points(spark, SF_DIR).cache()
        queries = [("q1", 48.85, 2.35), ("q2", -10.0, 179.5)]
        radius = 8.0
        got = {
            (r.query_id, r.point_id)
            for r in within_distance_join(pts, queries, radius).collect()
        }
        r2 = chord2_from_radians(math.radians(radius))
        want = set()
        for row in pts.collect():
            p = latlng_point(row.lat, row.lng)
            for qid, qlat, qlng in queries:
                q = latlng_point(qlat, qlng)
                d = sum((p[i] - q[i]) ** 2 for i in range(3))
                if d <= r2:
                    want.add((qid, row.point_id))
        assert got == want

    def test_group_cap_bounds(self, spark):
        from s2geometry_d_spark.operators.distance import group_cap_bounds
        from s2geometry_d_spark.functions import kernels
        from s2geometry_d_spark.sources import tables
        from conftest import SF_DIR

        pts = tables.spatial_points(spark, SF_DIR).withColumn(
            "grp", kernels.parent_signed(F.col("cell_id"), 2)
        )
        bounds = group_cap_bounds(pts, "grp").collect()
        assert bounds
        rows = pts.collect()
        by_grp = {}
        for r in rows:
            by_grp.setdefault(r.grp, []).append(latlng_point(r.lat, r.lng))
        for b in bounds:
            members = by_grp[b.grp]
            assert b.n == len(members)
            # every member within max_chord2 of the centroid
            for p in members:
                d = (p[0] - b.cx) ** 2 + (p[1] - b.cy) ** 2 + (p[2] - b.cz) ** 2
                assert d <= b.max_chord2 + 1e-12


class TestSmjParity:
    def test_smj_matches_kernel_path(self, spark):
        from s2geometry_d_spark.operators.spatial_join import (
            candidate_join,
            candidate_join_smj,
            candidate_match_kernel,
            compute_coverings,
        )
        from s2geometry_d_spark.plans import demo
        from s2geometry_d_spark.sources import tables
        from conftest import SF_DIR

        pts = tables.spatial_points(spark, SF_DIR).cache()
        covs = compute_coverings(demo.all_regions(), max_cells=32)
        key = lambda df: {
            (r.region_id, r.point_id, r.is_interior)
            for r in df.select("region_id", "point_id", "is_interior").collect()
        }
        a = key(candidate_match_kernel(pts, covs))
        b = key(candidate_join(pts, covs))
        c = key(candidate_join_smj(pts, covs))
        assert a == b == c


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_group_rect_bounds_pathological_dense_bin(spark):
    """Round-3 verdict #5: refinement must stay aggregate-only even when a
    group packs thousands of distinct longitudes into single bins with a
    tiny best gap (the old path collected every distinct value).  Checked
    against the brute-force sort construction."""
    import numpy as np
    from pyspark.sql import functions as F

    from s2geometry_d_spark.operators.distance import group_rect_bounds

    rng = np.random.default_rng(3)
    rows = []
    # group "dense": 4000 longitudes inside ~2 bin widths (bin width =
    # 360/4096 ~ 0.0879 deg) -> every between-bin gap is tiny, the winning
    # gap lives INSIDE a bin and needs multi-level sub-binning to find
    base = 10.0
    lngs = np.sort(rng.uniform(base, base + 0.17, 4000))
    # carve a deliberate interior gap much smaller than a bin width
    lngs = lngs[(lngs < base + 0.1) | (lngs > base + 0.13)]
    for ln in lngs:
        rows.append(("dense", float(rng.uniform(-5, 5)), float(ln)))
    # control group: ordinary spread
    for ln in rng.uniform(-170, 170, 500):
        rows.append(("spread", float(rng.uniform(-5, 5)), float(ln)))
    df = spark.createDataFrame(rows, ["g", "lat", "lng"])
    got = {
        r["g"]: (r["lng_lo"], r["lng_hi"])
        for r in group_rect_bounds(df, "g").collect()
    }
    # brute force: largest circular gap over the sorted longitudes
    import collections

    by_g = collections.defaultdict(list)
    for g, _, ln in rows:
        by_g[g].append(ln)
    for g, ls in by_g.items():
        ls = sorted(set(ls))
        gaps = [(b - a, a, b) for a, b in zip(ls, ls[1:])]
        gaps.append((ls[0] + 360.0 - ls[-1], ls[-1], ls[0]))
        gap, start, end = min(gaps, key=lambda t: (-t[0], t[1]))
        want = (round(end, 6), round(start, 6))
        assert got[g] == want, (g, got[g], want)
