"""Crossing-edge join vs brute-force crossingSign over random edge sets."""

import numpy as np

from s2geometry_d_spark.operators.crossing import crossing_edges_join
from s2geometry_d_spark.s2core import predicates as pred
from s2geometry_d_spark.s2core.regions import latlng_point


def _random_edges(n, seed, spread=8.0, lat0=20.0, lng0=30.0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        la, ln = rng.uniform(-spread, spread, 2)
        lb, lnb = rng.uniform(-spread, spread, 2)
        out.append(
            (i, float(lat0 + la), float(lng0 + ln), float(lat0 + lb), float(lng0 + lnb))
        )
    return out


def test_crossing_join_matches_bruteforce(spark):
    table = _random_edges(300, seed=1)
    targets_raw = _random_edges(6, seed=2)
    edges = spark.createDataFrame(table, ["edge_id", "alat", "alng", "blat", "blng"])
    targets = [
        (f"t{i}", (la, ln), (lb, lnb)) for i, la, ln, lb, lnb in targets_raw
    ]

    got = {
        (r.target_id, r.edge_id)
        for r in crossing_edges_join(edges, targets).select("target_id", "edge_id").collect()
    }

    want = set()
    for tid, (la, ln), (lb, lnb) in targets:
        c, d = latlng_point(la, ln), latlng_point(lb, lnb)
        for i, ea, el, eb, elb in table:
            a, b = latlng_point(ea, el), latlng_point(eb, elb)
            if pred.crossing_sign(a, b, c, d) > 0:
                want.add((tid, i))
    assert want, "fixture produced no crossings — not a useful test"
    assert got == want


def test_crossing_sign_pairs_matches_scalar():
    rng = np.random.default_rng(9)
    n = 2000
    def rand_pts():
        lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
        lng = rng.uniform(-180, 180, n)
        from s2geometry_d_spark.s2core import coords
        x, y, z = coords.latlng_to_xyz(lat, lng)
        return np.stack([x, y, z], axis=1)
    A, B, C, D = rand_pts(), rand_pts(), rand_pts(), rand_pts()
    # inject shared-vertex and degenerate rows
    C[0] = A[0]
    D[1] = B[1]
    B[2] = A[2]
    vec = pred.crossing_sign_pairs(A, B, C, D)
    for i in range(0, n, 97):
        assert vec[i] == pred.crossing_sign(
            tuple(A[i]), tuple(B[i]), tuple(C[i]), tuple(D[i])
        ), i
    for i in (0, 1, 2):
        assert vec[i] == pred.crossing_sign(
            tuple(A[i]), tuple(B[i]), tuple(C[i]), tuple(D[i])
        ), i
