"""Reference wire-format round trips + golden byte layout
(s2cell_union.d:697-733, s2polyline.d:707-731)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from s2geometry_d_spark.s2core import cellunion, encoding
from s2geometry_d_spark.s2core.cellid import CellId
from s2geometry_d_spark.s2core.loops import Loop


def test_cell_union_round_trip():
    ids = cellunion.normalize(
        [CellId.from_latlng(la, ln).parent(10).id for la, ln in
         [(10.0, 20.0), (10.1, 20.2), (-45.0, 170.0), (80.0, -30.0)]]
    )
    data = encoding.encode_cell_union(ids)
    back = encoding.decode_cell_union(data)
    assert list(back) == list(np.asarray(ids, dtype=np.uint64))


def test_cell_union_golden_bytes():
    """Pin the exact layout: u8 version=1, u64 LE count, u64 LE ids —
    byte-compatible with the reference encoder (native little-endian
    fixed-width puts, util/coding/coder.d)."""
    ids = [0x1234567890ABCDEF, 0x0000000000000001]
    data = encoding.encode_cell_union(ids)
    assert data[0] == 1
    assert struct.unpack_from("<Q", data, 1)[0] == 2
    assert struct.unpack_from("<Q", data, 9)[0] == ids[0]
    assert struct.unpack_from("<Q", data, 17)[0] == ids[1]
    assert len(data) == 1 + 8 + 16


def test_cell_union_decode_guards():
    with pytest.raises(ValueError):
        encoding.decode_cell_union(b"\x01\x00")  # short
    bad_version = struct.pack("<BQ", 9, 0)
    with pytest.raises(ValueError):
        encoding.decode_cell_union(bad_version)
    huge = struct.pack("<BQ", 1, encoding.DECODE_MAX_NUM_CELLS + 1)
    with pytest.raises(ValueError):
        encoding.decode_cell_union(huge)
    truncated = struct.pack("<BQ", 1, 3) + b"\x00" * 8
    with pytest.raises(ValueError):
        encoding.decode_cell_union(truncated)


def test_polyline_round_trip_exact():
    verts = Loop.make_regular(12.0, 34.0, 5.0, 9).vertices
    data = encoding.encode_polyline(verts)
    back = encoding.decode_polyline(data)
    # bit-exact float64 round trip
    assert back.shape == (9, 3)
    assert (back == np.asarray(verts, dtype=np.float64)).all()


def test_polyline_golden_bytes():
    verts = [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0)]
    data = encoding.encode_polyline(verts)
    assert data[0] == 1
    assert struct.unpack_from("<I", data, 1)[0] == 2
    assert struct.unpack_from("<d", data, 5)[0] == 1.0
    assert len(data) == 1 + 4 + 2 * 24


def test_loop_polygon_round_trip():
    from s2geometry_d_spark.s2core.loops import Polygon

    shell = Loop.make_regular(5.0, 40.0, 6.0, 10)
    hole = Loop(list(reversed(Loop.make_regular(5.2, 40.3, 2.0, 7).vertices)))
    poly = Polygon([shell, hole], "p")
    data = encoding.encode_polygon(
        [lp.vertices for lp in poly.loops],
        [lp.origin_inside for lp in poly.loops],
        depths=[0, 1],
    )
    (loops, bound), end = encoding.decode_polygon(data)
    assert end == len(data)
    assert len(loops) == 2
    for lp, (verts, oi, depth, lb) in zip(poly.loops, loops):
        assert (verts == np.asarray(lp.vertices, dtype=np.float64)).all()
        assert oi == lp.origin_inside
    assert loops[0][2] == 0 and loops[1][2] == 1
    # has_holes flag written for the odd-depth loop
    assert data[2] == 1
    # bound contains every vertex (radians)
    lat_lo, lat_hi, lng_lo, lng_hi = bound
    import math

    for lp in poly.loops:
        for x, y, z in lp.vertices:
            la = math.asin(max(-1.0, min(1.0, z)))
            assert lat_lo - 1e-12 <= la <= lat_hi + 1e-12


def test_loop_golden_header():
    verts = [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)]
    data = encoding.encode_loop(verts, origin_inside=False, depth=3)
    assert data[0] == 1
    assert struct.unpack_from("<I", data, 1)[0] == 3
    pos = 5 + 3 * 24
    oi, depth = struct.unpack_from("<BI", data, pos)
    assert oi == 0 and depth == 3
    # trailing rect: version byte + 4 doubles
    assert len(data) == pos + 5 + 33


def test_encoded_polygon_column_drives_index_build(spark):
    """Interop end-to-end: polygons arrive as a BINARY column in the
    reference wire format, are decoded inside the distributed index build,
    and the resulting index-table PIP matches the direct path."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from s2geometry_d_spark.functions import kernels
    from s2geometry_d_spark.operators.poly_index import (
        build_polygon_index,
        points_in_polygons_table,
        polygons_dataframe_loops,
    )
    from s2geometry_d_spark.s2core.loops import Polygon

    polys = []
    for k in range(4):
        shell = Loop.make_regular(10.0 * k - 15.0, 25.0 * k - 40.0, 5.0, 10)
        polys.append((f"p{k}", Polygon([shell], f"p{k}")))

    # ship as wire-format bytes, decode back into the loops DataFrame shape
    enc_rows = [
        (
            rid,
            encoding.encode_polygon(
                [lp.vertices for lp in poly.loops],
                [lp.origin_inside for lp in poly.loops],
            ),
        )
        for rid, poly in polys
    ]
    enc_df = spark.createDataFrame(enc_rows, ["poly_id", "blob"])

    @F.udf(T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType()))))
    def decode_loops(blob):
        (loops, _), _ = encoding.decode_polygon(bytes(blob))
        return [
            [[float(c) for c in v] for v in verts] for verts, _, _, _ in loops
        ]

    decoded = enc_df.select("poly_id", decode_loops("blob").alias("loops"))
    idx_from_bytes = build_polygon_index(decoded)

    import numpy as np

    rng = np.random.default_rng(8)
    rows = [
        (i, float(np.degrees(np.arcsin(rng.uniform(-0.8, 0.8)))), float(rng.uniform(-90, 90)))
        for i in range(3000)
    ]
    pts = spark.createDataFrame(rows, ["point_id", "lat", "lng"]).withColumn(
        "cell_id", kernels.cell_from_latlng(F.col("lat"), F.col("lng"))
    )
    got = {
        (r["poly_id"], r["point_id"])
        for r in points_in_polygons_table(pts, idx_from_bytes).collect()
    }
    direct = build_polygon_index(polygons_dataframe_loops(spark, polys))
    want = {
        (r["poly_id"], r["point_id"])
        for r in points_in_polygons_table(pts, direct).collect()
    }
    assert got == want and want


def test_loop_polygon_decode_short_buffer_guards():
    """ADVICE round-4: truncated buffers must raise ValueError (not
    struct.error / numpy ValueError from deep inside), and hostile count
    fields must hit the decode caps before any allocation."""
    shell = Loop.make_regular(5.0, 40.0, 6.0, 10)
    data = encoding.encode_polygon([shell.vertices], [shell.origin_inside])
    # truncate at every prefix boundary class: header, vertices, trailer, bound
    for cut in (0, 3, 6, 20, len(data) - 40, len(data) - 1):
        with pytest.raises(ValueError):
            encoding.decode_polygon(data[:cut])
    lp_bytes = encoding.encode_loop(shell.vertices, shell.origin_inside)
    for cut in (0, 3, 10, len(lp_bytes) - 30, len(lp_bytes) - 1):
        with pytest.raises(ValueError):
            encoding.decode_loop(lp_bytes[:cut])
    with pytest.raises(ValueError):
        encoding.decode_rect(encoding.encode_rect(0.0, 0.1, 0.0, 0.1)[:-1])
    # hostile counts: huge vertex count / loop count caps
    bad_loop = struct.pack("<BI", 1, encoding.DECODE_MAX_NUM_VERTICES + 1)
    with pytest.raises(ValueError, match="cap"):
        encoding.decode_loop(bad_loop + b"\x00" * 64)
    bad_poly = struct.pack("<BBBI", 1, 1, 0, encoding.DECODE_MAX_NUM_LOOPS + 1)
    with pytest.raises(ValueError, match="cap"):
        encoding.decode_polygon(bad_poly + b"\x00" * 64)


def test_encode_polygon_mismatched_lengths_raises():
    shell = Loop.make_regular(5.0, 40.0, 6.0, 10)
    with pytest.raises(ValueError, match="mismatched"):
        encoding.encode_polygon([shell.vertices], [True, False])
    with pytest.raises(ValueError, match="mismatched"):
        encoding.encode_polygon([shell.vertices], [True], depths=[0, 1])
