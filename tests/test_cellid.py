"""Cell-id invariants mirroring the reference test strategy (SURVEY.md §5):
round-trips, containment lattice, Hilbert continuity, token round-trips,
scalar-vs-vectorized cross-checks.  Reference corpus:
test/s2/s2cell_id_test.d:277-432.
"""

import numpy as np
import pytest

from s2geometry_d_spark.s2core import cellid as ci
from s2geometry_d_spark.s2core import coords, metrics

RNG = np.random.default_rng(42)


def random_ids(n, rng=None):
    rng = rng or RNG
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180, 180, n)
    ids = ci.from_latlng(lat, lng)
    lvls = rng.integers(0, 31, n)
    return ci.parent(ids, lvls)


class TestRoundTrips:
    def test_latlng_to_cell_and_back(self):
        # leaf cell -> center latlng -> leaf cell is the identity
        # (s2cell_id_test.d:277-287, 200k random cells; we use 50k)
        n = 50_000
        lat = np.degrees(np.arcsin(RNG.uniform(-1, 1, n)))
        lng = RNG.uniform(-180, 180, n)
        ids = ci.from_latlng(lat, lng)
        clat, clng = ci.to_latlng(ids)
        ids2 = ci.from_latlng(clat, clng)
        assert np.array_equal(ids, ids2)

    def test_face_ij_roundtrip(self):
        n = 20_000
        face = RNG.integers(0, 6, n)
        i = RNG.integers(0, ci.MAX_SIZE, n)
        j = RNG.integers(0, ci.MAX_SIZE, n)
        ids = ci.from_face_ij(face, i, j)
        f2, i2, j2 = ci.to_face_ij(ids)
        assert np.array_equal(face, f2)
        assert np.array_equal(i, i2)
        assert np.array_equal(j, j2)

    def test_token_roundtrip(self):
        ids = random_ids(5_000)
        for v in ids.tolist()[:2000]:
            tok = ci.token_of(v)
            assert ci.token_to_id(tok) == v
        # invalid / special
        assert ci.token_of(0) == "X"
        assert ci.token_to_id("X") == 0
        assert ci.token_to_id("") == 0
        assert ci.token_to_id("zz") == 0

    def test_known_tokens(self):
        # independently derivable anchors: face cells have ids
        # (f<<61)+(1<<60) -> tokens 1,3,5,7,9,b
        for f, tok in zip(range(6), ["1", "3", "5", "7", "9", "b"]):
            assert ci.CellId.from_face(f).token() == tok

    def test_scalar_matches_vector(self):
        n = 5_000
        lat = np.degrees(np.arcsin(RNG.uniform(-1, 1, n)))
        lng = RNG.uniform(-180, 180, n)
        vec = ci.from_latlng(lat, lng)
        for k in range(0, n, 97):
            assert ci.CellId.from_latlng(lat[k], lng[k]).id == int(vec[k])


class TestHierarchy:
    def test_containment_lattice(self):
        # exhaustive contains/intersects vs parent-maps to level 3 on all
        # faces (s2cell_id_test.d:352-406)
        cells = []
        parent_map = {}

        def expand(cell, depth):
            cells.append(cell)
            if depth < 3:
                for child in cell.children():
                    parent_map[child.id] = cell.id
                    expand(child, depth + 1)

        for f in range(6):
            expand(ci.CellId.from_face(f), 0)

        def ancestors(c):
            out = {c.id}
            cur = c.id
            while cur in parent_map:
                cur = parent_map[cur]
                out.add(cur)
            return out

        anc = {c.id: ancestors(c) for c in cells}
        import random

        random.seed(7)
        sample = random.sample(cells, 120)
        for a in sample:
            for b in sample:
                expect_contains = a.id in anc[b.id]
                assert a.contains(b) == expect_contains
                expect_intersects = expect_contains or b.id in anc[a.id]
                assert a.intersects(b) == expect_intersects

    def test_parent_child(self):
        ids = random_ids(2_000)
        lv = ci.level(ids)
        for lvl in range(0, 31, 5):
            m = lv >= lvl
            par = ci.parent(ids[m], lvl)
            assert np.all(ci.level(par) == lvl)
            assert np.all(ci.range_min(par) <= ids[m])
            assert np.all(ids[m] <= ci.range_max(par))

    def test_child_positions(self):
        c = ci.CellId.from_face(3)
        for pos in range(4):
            ch = c.child(pos)
            assert ch.parent(0).id == c.id
            assert ch.child_position(1) == pos

    def test_range_is_contiguous(self):
        c = ci.CellId.from_latlng(12.3, 45.6).parent(10)
        b = c.child_begin(30)
        e = c.child_end(30)
        assert b.id == c.range_min().id
        assert e.prev().id == c.range_max().id


class TestHilbertContinuity:
    def test_adjacent_centers_close(self):
        # consecutive level-8 ids are within MAX_EDGE(8) of each other
        # (s2cell_id_test.d:410-432); random walk instead of full traversal
        max_edge = metrics.MAX_EDGE.get_value(8)
        c = ci.CellId.begin(8)
        prev_xyz = np.array(c.to_point())
        for _ in range(2000):
            c = c.next()
            if not c.is_valid():
                break
            xyz = np.array(c.to_point())
            ang = 2 * np.arcsin(0.5 * np.linalg.norm(xyz - prev_xyz))
            assert ang <= max_edge + 1e-12
            prev_xyz = xyz


class TestNeighbors:
    def test_edge_neighbors_level(self):
        c = ci.CellId.from_latlng(48.85, 2.35).parent(12)
        nbrs = c.get_edge_neighbors()
        assert len(nbrs) == 4
        assert len({n.id for n in nbrs}) == 4
        for n in nbrs:
            assert n.level() == 12
            assert n.id != c.id

    def test_face_cell_edge_neighbors_wrap(self):
        # neighbors of a face cell live on 4 distinct other faces
        c = ci.CellId.from_face(2)
        faces = {n.face() for n in c.get_edge_neighbors()}
        assert len(faces) == 4
        assert 2 not in faces

    def test_vertex_neighbors(self):
        c = ci.CellId.from_latlng(-33.8, 151.2)  # leaf
        nbrs = c.append_vertex_neighbors(5)
        assert len(nbrs) in (3, 4)
        assert len({n.id for n in nbrs}) == len(nbrs)
        for n in nbrs:
            assert n.level() == 5

    def test_all_neighbors_count(self):
        c = ci.CellId.from_latlng(10.0, 10.0).parent(10)
        nbrs = c.append_all_neighbors(10)
        # interior cell: exactly 8 distinct neighbors
        assert len({n.id for n in nbrs}) == 8


class TestSignedStorage:
    def test_order_preserved(self):
        ids = np.sort(random_ids(10_000))
        signed = ci.to_signed(ids)
        assert np.array_equal(np.sort(signed), signed)
        assert np.array_equal(ci.from_signed(signed), ids)

    def test_high_faces_covered(self):
        ids = ci.from_latlng(np.array([-89.0]), np.array([0.0]))
        assert int(ids[0]) >> 63 in (0, 1)  # well-defined
        s = ci.to_signed(ids)
        assert np.array_equal(ci.from_signed(s), ids)


class TestSTtoIJRounding:
    def test_lround_semantics(self):
        # floor(x+0.5) at the half-way points (SURVEY hard part: lround
        # vs banker's rounding)
        s = np.array([0.0, 0.5, 1.0, 2.5 / coords.LIMIT_IJ, 1.5 / coords.LIMIT_IJ])
        ij = coords.st_to_ij(s)
        assert ij[0] == 0
        assert ij[1] == coords.LIMIT_IJ // 2
        assert ij[2] == coords.LIMIT_IJ - 1
        assert ij[3] == 2
        assert ij[4] == 1


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
