"""Polygon x polygon relations: intersects / contains_polygon, including
the even-odd hole cases that defeat the naive all-vertices-inside test."""

from s2geometry_d_spark.s2core.loops import Loop, Polygon


def disk(lat, lng, r, n=24, name=""):
    return Polygon([Loop.make_regular(lat, lng, r, n)], name)


def test_disjoint_disks():
    a = disk(0.0, 0.0, 5.0)
    b = disk(0.0, 30.0, 5.0)
    assert not a.intersects(b)
    assert not b.intersects(a)
    assert not a.contains_polygon(b)


def test_nested_disks():
    outer = disk(10.0, 10.0, 15.0)
    inner = disk(10.0, 10.0, 5.0)
    assert outer.intersects(inner) and inner.intersects(outer)
    assert outer.contains_polygon(inner)
    assert not inner.contains_polygon(outer)


def test_overlapping_disks():
    a = disk(0.0, 0.0, 8.0)
    b = disk(0.0, 10.0, 8.0)
    assert a.intersects(b)
    assert not a.contains_polygon(b)
    assert not b.contains_polygon(a)


def test_annulus_cases():
    shell = Loop.make_regular(0.0, 0.0, 15.0, 24)
    hole = Loop.make_regular(0.0, 0.0, 6.0, 24)
    annulus = Polygon([shell, hole], "ring")

    # disk fully inside the HOLE: boundaries disjoint, but the annulus does
    # NOT contain it (even-odd excludes the hole)
    in_hole = disk(0.0, 0.0, 3.0)
    assert not annulus.contains_polygon(in_hole)
    assert not annulus.intersects(in_hole)

    # disk inside the ring region: contained
    in_ring = disk(0.0, 10.0, 1.5)
    assert annulus.contains_polygon(in_ring)
    assert annulus.intersects(in_ring)

    # disk covering the hole entirely (vertices in the ring, hole strictly
    # inside the disk): all disk vertices are inside the annulus but the
    # disk's region includes the hole -> NOT contained (the a-vertex-in-b
    # condition catches it)
    covering_hole = disk(0.0, 0.0, 10.0)
    assert not annulus.contains_polygon(covering_hole)
    assert annulus.intersects(covering_hole)

    # big disk contains the whole annulus
    big = disk(0.0, 0.0, 20.0)
    assert big.contains_polygon(annulus)
    assert not annulus.contains_polygon(big)


def test_island_in_hole():
    shell = Loop.make_regular(0.0, 0.0, 20.0, 24)
    hole = Loop.make_regular(0.0, 0.0, 10.0, 24)
    island = Loop.make_regular(0.0, 0.0, 4.0, 24)
    poly = Polygon([shell, hole, island], "archipelago")
    # a disk on the island is contained
    on_island = disk(0.0, 0.0, 2.0)
    assert poly.contains_polygon(on_island)
    # a disk in the moat (between island and hole) is not
    in_moat = disk(0.0, 6.5, 0.8)
    assert not poly.contains_polygon(in_moat)
    assert not poly.intersects(in_moat)
