"""Property-based cell-id invariants (hypothesis): encode/decode roundtrips,
hierarchy algebra, token order preservation — over the whole input domain,
not just fixture points."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from s2geometry_d_spark.s2core import cellid as ci
from s2geometry_d_spark.s2core.cellid import MAX_LEVEL, CellId

lat_st = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
lng_st = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
level_st = st.integers(min_value=0, max_value=MAX_LEVEL)


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st)
def test_latlng_cell_roundtrip_stays_in_cell(lat, lng):
    """The leaf cell of a point, converted to its center and re-encoded,
    yields the SAME leaf cell (center is the canonical representative)."""
    leaf = ci.from_latlng(np.array([lat]), np.array([lng]))
    lat2, lng2 = ci.to_latlng(leaf)
    leaf2 = ci.from_latlng(lat2, lng2)
    assert int(leaf2[0]) == int(leaf[0])


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st, level_st)
def test_parent_child_range_algebra(lat, lng, level):
    leaf = CellId.from_latlng(lat, lng)
    p = leaf.parent(level)
    assert p.level() == level
    assert p.contains(leaf)
    assert p.range_min().id <= leaf.id <= p.range_max().id
    if level > 0:
        gp = leaf.parent(level - 1)
        assert gp.contains(p)
        assert p.parent(level - 1) == gp
    if level < MAX_LEVEL:
        kids = p.children()
        assert sum(k.contains(leaf) for k in kids) == 1
        # children tile the parent's range exactly
        assert kids[0].range_min().id == p.range_min().id
        assert kids[3].range_max().id == p.range_max().id


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st, level_st)
def test_token_roundtrip_and_vector_scalar_parity(lat, lng, level):
    c = CellId.from_latlng(lat, lng).parent(level)
    assert CellId.from_token(c.token()).id == c.id
    # vectorized layer agrees with the scalar layer
    arr = np.array([c.id], dtype=np.uint64)
    assert int(ci.level(arr)[0]) == level
    assert int(ci.range_min(arr)[0]) == c.range_min().id
    assert int(ci.range_max(arr)[0]) == c.range_max().id
    assert int(ci.parent(arr, max(0, level - 1))[0]) == c.parent(max(0, level - 1)).id


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(lat_st, lng_st), min_size=2, max_size=6), level_st)
def test_token_order_preserves_id_order(pts, level):
    ids = sorted(CellId.from_latlng(la, ln).parent(level).id for la, ln in pts)
    toks = [ci.token_of(i) for i in ids]
    assert toks == sorted(toks)


@settings(max_examples=100, deadline=None)
@given(lat_st, lng_st)
def test_signed_flip_preserves_order(lat, lng):
    a = ci.from_latlng(np.array([lat]), np.array([lng]))
    b = ci.from_latlng(np.array([-lat if lat else 1.0]), np.array([lng / 2 + 1]))
    sa, sb = ci.to_signed(a)[0], ci.to_signed(b)[0]
    assert (int(a[0]) < int(b[0])) == (int(sa) < int(sb))
    assert int(ci.from_signed(np.array([sa]))[0]) == int(a[0])
