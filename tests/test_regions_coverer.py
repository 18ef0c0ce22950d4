"""Covering + cell-union invariants mirroring the reference test strategy
(SURVEY.md §5; reference corpus: s2region_coverer_test.d:61-114,
s2cell_union_test.d:98-229, s2testing.d:424-449)."""

import math
import random

import numpy as np
import pytest

from s2geometry_d_spark.s2core import cellunion as cu
from s2geometry_d_spark.s2core.cellid import CellId
from s2geometry_d_spark.s2core.coverer import CovererOptions, RegionCoverer
from s2geometry_d_spark.s2core.regions import Cap, Cell, LatLngRect, latlng_point

rnd = random.Random(1)


def random_cap(min_area, max_area):
    """Random cap with log-uniform area (s2testing.d:356-362 semantics)."""
    cap_area = max_area * (min_area / max_area) ** rnd.random()
    height = cap_area / (2 * math.pi)
    z = rnd.uniform(-1, 1)
    theta = rnd.uniform(0, 2 * math.pi)
    r = math.sqrt(1 - z * z)
    center = (r * math.cos(theta), r * math.sin(theta), z)
    return Cap.from_center_height(center, height)


def check_covering(region, covering_ids, interior: bool, seed_points):
    """Complete-coverage + tightness check (s2testing.d:424-449 shape)."""
    # Coverage: every sample point in the region must be in the covering
    # (for exterior coverings).
    if not interior:
        for p in seed_points:
            if region.contains_point(p):
                assert cu.contains_id(covering_ids, CellId.from_point(*p).id)
    else:
        # every interior covering cell must be contained in the region
        for cid in covering_ids:
            assert region.contains_cell(Cell(CellId(cid)))
    # cells must intersect the region
    for cid in covering_ids:
        assert region.may_intersect_cell(Cell(CellId(cid)))


def sample_points_in_cap(cap, n):
    out = [cap.center]
    # points on rings inside the cap
    cz = np.array(cap.center)
    # gram-schmidt frame
    a = np.array([1.0, 0.0, 0.0]) if abs(cz[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    u = np.cross(cz, a)
    u /= np.linalg.norm(u)
    v = np.cross(cz, u)
    radius = cap.radius_radians()
    for _ in range(n):
        ang = rnd.uniform(0, radius)
        phi = rnd.uniform(0, 2 * math.pi)
        p = (
            math.cos(ang) * cz
            + math.sin(ang) * (math.cos(phi) * u + math.sin(phi) * v)
        )
        out.append(tuple(p / np.linalg.norm(p)))
    return out


class TestCapCoverings:
    def test_random_caps_valid(self):
        for _ in range(60):
            opts = CovererOptions(max_cells=rnd.randint(1, 10))
            level = rnd.randint(0, 20)
            opts.max_level = min(30, level + 4)
            cap = random_cap(0.1 * (2.6 / 4**opts.max_level), 2 * math.pi)
            coverer = RegionCoverer(opts)
            covering = coverer.get_covering(cap)
            interior = coverer.get_interior_covering(cap)

            assert len(covering) <= max(opts.max_cells, 6)
            pts = sample_points_in_cap(cap, 50)
            check_covering(cap, covering, False, pts)
            check_covering(cap, interior, True, pts)
            # determinism
            again = RegionCoverer(opts).get_covering(cap)
            assert again == covering
            # normalized output
            assert cu.is_normalized(covering)

    def test_single_cell_covering_of_cell(self):
        # covering any S2Cell with max_cells=1 returns that cell
        # (s2region_coverer_test.d:47-59)
        for _ in range(20):
            lat, lng = rnd.uniform(-80, 80), rnd.uniform(-180, 180)
            cid = CellId.from_latlng(lat, lng).parent(rnd.randint(0, 20))
            region = _CellRegion(cid)
            covering = RegionCoverer(CovererOptions(max_cells=1)).get_covering(region)
            assert covering == [cid.id]

    def test_min_level_and_level_mod(self):
        cap = Cap.from_latlng_radius(40.0, -70.0, 1.0)
        opts = CovererOptions(max_cells=8, min_level=4, level_mod=2)
        covering = RegionCoverer(opts).get_covering(cap)
        for cid in covering:
            lvl = CellId(cid).level()
            assert lvl >= 4
            assert (lvl - 4) % 2 == 0

    def test_interior_subset_of_exterior(self):
        cap = Cap.from_latlng_radius(-25.0, 130.0, 3.0)
        coverer = RegionCoverer(CovererOptions(max_cells=12))
        cov = coverer.get_covering(cap)
        interior = coverer.get_interior_covering(cap)
        for cid in interior:
            assert cu.contains_id(cov, cid) or cu.intersects_id(cov, cid)


class _CellRegion:
    def __init__(self, cid: CellId):
        self.cid = cid

    def contains_cell(self, cell: Cell) -> bool:
        return self.cid.contains(cell.cell_id)

    def may_intersect_cell(self, cell: Cell) -> bool:
        return self.cid.intersects(cell.cell_id)

    def contains_point(self, p) -> bool:
        return self.cid.contains(CellId.from_point(*p))

    def cell_union_bound(self):
        return [self.cid]


class TestRectCoverings:
    def test_rect_covering_valid(self):
        rect = LatLngRect.from_degrees(10.0, 20.0, 170.0, -170.0)  # dateline wrap
        coverer = RegionCoverer(CovererOptions(max_cells=10))
        covering = coverer.get_covering(rect)
        assert 0 < len(covering) <= 10
        # sample points inside the rect must be covered
        for _ in range(200):
            lat = rnd.uniform(10.0, 20.0)
            lng = rnd.choice([rnd.uniform(170, 180), rnd.uniform(-180, -170)])
            p = latlng_point(lat, lng)
            assert rect.contains_point(p)
            assert cu.contains_id(covering, CellId.from_point(*p).id)


class TestCellUnion:
    def _random_descendants(self, base: CellId, target: list[int], expected: list[int], depth=0):
        # selected-descendants generation (s2cell_union_test.d:98-164 spirit)
        if base.level() >= 14 or rnd.random() < 0.3:
            expected.append(base.id)
            # add the cell or a few of its descendants to the input
            for _ in range(rnd.randint(1, 3)):
                c = base
                while c.level() < min(30, base.level() + 4) and rnd.random() < 0.7:
                    c = c.child(rnd.randint(0, 3))
                target.append(c.id)
            return
        for child in base.children():
            if rnd.random() < 0.8:
                self._random_descendants(child, target, expected, depth + 1)

    def test_normalize_matches_construction(self):
        for _ in range(30):
            face = rnd.randint(0, 5)
            inputs, expected = [], []
            self._random_descendants(CellId.from_face(face), inputs, expected)
            if not inputs:
                continue
            got = cu.normalize(inputs)
            want = cu.normalize(expected)
            # every input id must be contained, and the normalized set of the
            # chosen cells equals the normalized set of their descendants
            # union only if descendants cover... check containment instead:
            for cid in inputs:
                assert cu.contains_id(want, cid)
            for cid in got:
                assert cu.contains_id(want, cid)

    def test_sibling_merge(self):
        c = CellId.from_latlng(1.0, 2.0).parent(10)
        kids = [ch.id for ch in c.children()]
        assert cu.normalize(kids) == [c.id]
        # three siblings don't merge
        assert len(cu.normalize(kids[:3])) == 3

    def test_set_algebra(self):
        for _ in range(20):
            base = CellId.from_face(rnd.randint(0, 5))
            x_in, x_exp, y_in, y_exp = [], [], [], []
            self._random_descendants(base, x_in, x_exp)
            self._random_descendants(base, y_in, y_exp)
            x = cu.normalize(x_in)
            y = cu.normalize(y_in)
            u = cu.union(x, y)
            it = cu.intersection(x, y)
            d = cu.difference(x, y)
            assert cu.is_normalized(u)
            assert cu.is_normalized(it)
            assert cu.is_normalized(d)
            # probe with random leaf cells
            for _ in range(100):
                lat = math.degrees(math.asin(rnd.uniform(-1, 1)))
                lng = rnd.uniform(-180, 180)
                leaf = CellId.from_latlng(lat, lng).id
                in_x = cu.contains_id(x, leaf)
                in_y = cu.contains_id(y, leaf)
                assert cu.contains_id(u, leaf) == (in_x or in_y)
                assert cu.contains_id(it, leaf) == (in_x and in_y)
                assert cu.contains_id(d, leaf) == (in_x and not in_y)

    def test_denormalize(self):
        c = CellId.from_latlng(5.0, 5.0).parent(6)
        out = cu.denormalize([c.id], 8, 1)
        assert len(out) == 16
        for cid in out:
            assert CellId(cid).level() == 8

    def test_from_begin_end(self):
        c = CellId.from_latlng(10.0, 20.0).parent(8)
        begin = c.range_min().id
        end = c.range_max().id + 2  # leaf-iterator sentinel (= child_end(30))
        assert end == c.child_end(30).id
        ids = cu.from_begin_end(begin, end)
        assert ids == [c.id]
        # a shifted/truncated range produces a valid normalized tiling
        ids2 = cu.from_begin_end(begin + 4, end)
        assert cu.is_normalized(ids2)
        assert cu.leaf_count(ids2) == (end - (begin + 4)) // 2


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestCoveringQualityStats:
    def test_cap_area_ratio_matches_reference_table(self, ):
        """The reference PUBLISHES covering-quality numbers
        (s2region_coverer.d:102-106): for random caps at max_cells=8 the
        covering/region area ratio has median ~1.98, worst ~3.91 (over
        100k caps).  Re-measuring over 200 seeded caps pins our priority
        heuristic to the same quality band — coverings that are merely
        VALID but sloppy (e.g. a greedy heuristic) would blow the median."""
        import math
        import random
        import statistics

        from s2geometry_d_spark.s2core.coverer import CovererOptions, RegionCoverer
        from s2geometry_d_spark.s2core.regions import Cap, Cell, chord2_from_radians
        from s2geometry_d_spark.s2core.cellid import CellId
        from s2geometry_d_spark.s2core.measures import cap_area

        rnd = random.Random(20)
        ratios = []
        coverer = RegionCoverer(CovererOptions(max_cells=8))
        for _ in range(200):
            lat = math.degrees(math.asin(rnd.uniform(-1, 1)))
            lng = rnd.uniform(-180, 180)
            # log-uniform radius 0.1..30 deg (the reference sweeps sizes)
            r_deg = 10 ** rnd.uniform(-1, math.log10(30.0))
            cap = Cap.from_latlng_radius(lat, lng, r_deg)
            cov = coverer.get_covering(cap)
            area = sum(Cell(CellId(c)).exact_area() for c in cov)
            ratios.append(area / cap_area(math.radians(r_deg)))
        med = statistics.median(ratios)
        assert 1.3 <= med <= 2.6, f"median covering/area ratio {med}"
        assert max(ratios) <= 6.0, f"worst ratio {max(ratios)}"


def test_covering_udf_matches_driver_coverer(spark):
    """covering(region_spec) as a COLUMN kernel (SURVEY §2.11's last UDF):
    a table of region specs covers in parallel; every row must equal the
    driver-side RegionCoverer on the same region, in the same order."""
    import pyspark.sql.functions as F

    from s2geometry_d_spark.functions.covering import covering_cells
    from s2geometry_d_spark.s2core.cellid import CellId
    from s2geometry_d_spark.s2core.coverer import CovererOptions, RegionCoverer
    from s2geometry_d_spark.s2core.regions import Cap, LatLngRect

    specs = [
        ("c1", "cap", [48.85, 2.35, 5.0], 16),
        ("c2", "cap", [-33.86, 151.21, 0.5], 8),
        ("c3", "cap", [89.5, 0.0, 2.0], 16),              # polar
        ("r1", "rect", [-20.0, 25.0, 160.0, -160.0], 16),  # dateline wrap
        ("r2", "rect", [10.0, 12.0, 30.0, 34.0], 12),
        ("x1", "unknown", [0.0], 8),                       # unknown kind -> []
    ]
    df = spark.createDataFrame(specs, ["region_id", "kind", "params", "max_cells"])
    got = {
        r["region_id"]: list(r["cov"])
        for r in df.withColumn(
            "cov", covering_cells(F.col("kind"), F.col("params"), F.col("max_cells"))
        ).collect()
    }
    import numpy as np

    for rid, kind, p, mc in specs:
        if kind == "cap":
            region = Cap.from_latlng_radius(*p)
        elif kind == "rect":
            region = LatLngRect.from_degrees(*p)
        else:
            assert got[rid] == []
            continue
        cov = RegionCoverer(CovererOptions(max_cells=mc)).get_covering(region)
        want = [int(np.int64(np.uint64(c) ^ np.uint64(1 << 63))) for c in cov]
        assert got[rid] == want, rid
