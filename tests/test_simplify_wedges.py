"""Polyline subsampling (wedge-interval greedy) + wedge relations +
embedding near-dup pairs."""

import math

import numpy as np
import pytest

from s2geometry_d_spark.s2core import measures, wedges
from s2geometry_d_spark.s2core.polyline import Polyline
from s2geometry_d_spark.s2core.regions import latlng_point


def test_subsample_collinear_collapses():
    # points along one meridian: everything between the ends is redundant
    pl = Polyline.from_latlngs([(float(k), 10.0) for k in range(0, 21, 2)])
    idx = pl.subsample_vertices(math.radians(0.01))
    assert idx[0] == 0 and idx[-1] == len(pl.vertices) - 1
    assert len(idx) == 2


def test_subsample_zero_tolerance_keeps_all():
    pl = Polyline.from_latlngs([(0.0, 0.0), (1.0, 5.0), (0.0, 10.0), (2.0, 15.0)])
    assert pl.subsample_vertices(0.0) == [0, 1, 2, 3]


def test_subsample_within_tolerance():
    # noisy arc: every dropped vertex stays within tolerance of the
    # simplified polyline
    rng = np.random.default_rng(8)
    lats = 0.05 * rng.standard_normal(40)
    lngs = np.linspace(0.0, 40.0, 40)
    pl = Polyline.from_latlngs(list(zip(lats, lngs)))
    tol = math.radians(0.2)
    idx = pl.subsample_vertices(tol)
    assert len(idx) < 40
    simple = Polyline([pl.vertices[i] for i in idx])
    chord_tol = (2 * math.sin(tol / 2)) ** 2
    for v in pl.vertices:
        assert simple.min_chord2(v) <= chord_tol * (1 + 1e-9)


def test_wedge_relations_concrete():
    # wedges run CLOCKWISE from (ab1,x0) to (ab1,x2) — left of the chain
    hub = latlng_point(0.0, 0.0)
    e = latlng_point(0.0, 10.0)
    n = latlng_point(10.0, 0.0)
    w = latlng_point(0.0, -10.0)
    ne = latlng_point(7.0, 7.0)
    # (e->w clockwise through s) = southern half, inside (ne->n clockwise),
    # a 315-degree wedge missing only the n..ne slice
    assert wedges.wedge_contains(ne, hub, n, e, w)
    assert wedges.get_wedge_relation(ne, hub, n, e, w) == wedges.WEDGE_PROPERLY_CONTAINS
    assert (
        wedges.get_wedge_relation(e, hub, w, ne, n) == wedges.WEDGE_IS_PROPERLY_CONTAINED
    )
    assert wedges.get_wedge_relation(e, hub, n, e, n) == wedges.WEDGE_EQUALS
    # disjoint: (n->ne clockwise) is the narrow slice the (ne->n) wedge skips
    assert wedges.get_wedge_relation(e, hub, w, n, ne) == wedges.WEDGE_IS_DISJOINT
    assert not wedges.wedge_intersects(e, hub, w, n, ne)


def test_wedge_relations_consistency():
    """get_wedge_relation vs wedge_contains/wedge_intersects over random
    wedge pairs at one hub (the documented equivalences)."""
    rng = np.random.default_rng(12)
    hub = latlng_point(20.0, 30.0)

    def ray(az_deg):
        return latlng_point(
            20.0 + 5.0 * math.cos(math.radians(az_deg)),
            30.0 + 5.0 * math.sin(math.radians(az_deg)),
        )

    for _ in range(200):
        a0, a2, b0, b2 = (ray(float(a)) for a in rng.uniform(0, 360, 4))
        rel = wedges.get_wedge_relation(a0, hub, a2, b0, b2)
        c = wedges.wedge_contains(a0, hub, a2, b0, b2)
        i = wedges.wedge_intersects(a0, hub, a2, b0, b2)
        # contains <=> relation in {EQUALS, PROPERLY_CONTAINS}
        assert c == (rel in (wedges.WEDGE_EQUALS, wedges.WEDGE_PROPERLY_CONTAINS)), rel
        # disjoint <=> not intersects
        assert (rel == wedges.WEDGE_IS_DISJOINT) == (not i), rel
        # symmetry: swapping A and B flips containment direction
        rel_ba = wedges.get_wedge_relation(b0, hub, b2, a0, a2)
        flip = {
            wedges.WEDGE_PROPERLY_CONTAINS: wedges.WEDGE_IS_PROPERLY_CONTAINED,
            wedges.WEDGE_IS_PROPERLY_CONTAINED: wedges.WEDGE_PROPERLY_CONTAINS,
        }
        assert rel_ba == flip.get(rel, rel)


def test_embedding_near_dup_pairs(spark):
    from pyspark.sql import functions as F

    from s2geometry_d_spark.operators import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = e.unionByName(e.withColumn("vec_id", F.col("vec_id") + 1000))
    out = similarity.embedding_near_dup_pairs(corpus, threshold=0.99).collect()
    n = e.count()
    # every injected duplicate is found (identical vectors share all buckets)
    assert {(r.id_a, r.id_b) for r in out} == {(i, i + 1000) for i in range(n)}
    assert all(r.sim == 1.0 for r in out)
