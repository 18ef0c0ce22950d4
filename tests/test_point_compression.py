"""Compressed cell-center point streams (s2point_compression.d:16-45
documented layout): exact round-trips, off-center lossless escape, face
run-length behavior, and the compression-size property the reference
quotes (~4 bytes/vertex on geographically-local chains)."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_d_spark.s2core import cellid as ci
from s2geometry_d_spark.s2core import point_compression as pc
from s2geometry_d_spark.s2core.regions import latlng_point


def _chain_cells(level: int, n: int, lat0=37.0, lng0=-122.0):
    """n level-L cell centers along a local chain (adjacent-ish cells)."""
    ids = []
    for k in range(n):
        cell = ci.from_latlng(
            np.array([lat0 + 0.002 * k]), np.array([lng0 + 0.003 * k])
        )
        ids.append(int(ci.parent(cell, np.array([level]))[0]))
    x, y, z = ci.to_xyz(np.array(ids, dtype=np.uint64))
    return np.stack([x, y, z], axis=1)


@pytest.mark.parametrize("level", [10, 17, 23, 30])
def test_round_trip_exact(level):
    pts = _chain_cells(level, 40)
    data = pc.encode_points_compressed(pts, level)
    got = pc.decode_points_compressed(data, level, len(pts))
    assert (got == pts).all()  # bit-identical


def test_off_center_lossless_escape():
    level = 20
    pts = _chain_cells(level, 10)
    # replace two points with arbitrary (non-center) unit vectors
    pts[3] = latlng_point(12.3456789, -45.6789123)
    pts[7] = latlng_point(-67.89, 123.456)
    data = pc.encode_points_compressed(pts, level)
    got = pc.decode_points_compressed(data, level, len(pts))
    assert (got == pts).all()


def test_face_run_length_across_faces():
    level = 12
    a = _chain_cells(level, 5, 10.0, 10.0)  # one face
    b = _chain_cells(level, 5, 10.0, 100.0)  # another face
    pts = np.concatenate([a, b])
    data = pc.encode_points_compressed(pts, level)
    got = pc.decode_points_compressed(data, level, len(pts))
    assert (got == pts).all()
    fst = pc.points_to_face_si_ti(pts)
    assert len({f for f, _, _, _ in fst}) == 2


def test_compression_size_property():
    """Second-derivative + varint coding on a local chain: the reference
    quotes ~3.8 bytes per additional leaf vertex; allow slack but pin the
    order of magnitude (raw xyz is 24 bytes/vertex)."""
    level = 30
    pts = _chain_cells(level, 200)
    data = pc.encode_points_compressed(pts, level)
    per_vertex = (len(data) - 8) / (len(pts) - 1)
    assert per_vertex < 8.0, per_vertex


def test_truncated_buffers_raise():
    level = 15
    pts = _chain_cells(level, 8)
    data = pc.encode_points_compressed(pts, level)
    for cut in (0, 1, 3, len(data) // 2, len(data) - 1):
        with pytest.raises(ValueError):
            pc.decode_points_compressed(data[:cut], level, len(pts))


def test_cell_level_detection():
    level = 14
    pts = _chain_cells(level, 4)
    fst = pc.points_to_face_si_ti(pts)
    assert all(lvl == level for _, _, _, lvl in fst)
    off = pc.points_to_face_si_ti([latlng_point(1.234, 5.678)])
    assert off[0][3] == -1


def test_property_random_levels_round_trip():
    """Property corpus (hypothesis-style randomized, fixed seeds for
    determinism): arbitrary cell centers at mixed positions round-trip
    exactly at their own level; mixing in off-center points at any index
    keeps the stream lossless."""
    import random

    rnd = random.Random(20260817)
    for trial in range(25):
        level = rnd.randrange(1, 31)
        n = rnd.randrange(1, 30)
        lats = [rnd.uniform(-89.0, 89.0) for _ in range(n)]
        lngs = [rnd.uniform(-180.0, 180.0) for _ in range(n)]
        ids = []
        for la, ln in zip(lats, lngs):
            cell = ci.from_latlng(np.array([la]), np.array([ln]))
            ids.append(int(ci.parent(cell, np.array([level]))[0]))
        x, y, z = ci.to_xyz(np.array(ids, dtype=np.uint64))
        pts = np.stack([x, y, z], axis=1)
        # sprinkle off-center points
        for _ in range(rnd.randrange(0, 3)):
            pts[rnd.randrange(n)] = latlng_point(
                rnd.uniform(-89, 89), rnd.uniform(-180, 180)
            )
        data = pc.encode_points_compressed(pts, level)
        got = pc.decode_points_compressed(data, level, n)
        assert (got == pts).all(), (trial, level, n)


def test_compressed_geometry_column_round_trip(spark):
    """The codec as a Spark column kernel: per-row polyline chains compress
    to binary and decompress bit-identically — the storage path for
    geometry columns at scale (compressed parquet/shuffle payloads)."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from s2geometry_d_spark.functions.kernels import (
        compress_cell_points_udf,
        decompress_cell_points_udf,
    )

    level = 22
    rows = []
    for r in range(6):
        pts = _chain_cells(level, 12 + r, 5.0 * r - 10.0, 17.0 * r - 60.0)
        rows.append((r, [[float(c) for c in v] for v in pts], len(pts)))
    schema = T.StructType(
        [
            T.StructField("chain_id", T.IntegerType(), False),
            T.StructField("pts", T.ArrayType(T.ArrayType(T.DoubleType())), False),
            T.StructField("n", T.IntegerType(), False),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    enc = df.withColumn("blob", compress_cell_points_udf(level)(F.col("pts")))
    dec = enc.withColumn(
        "back", decompress_cell_points_udf(level)(F.col("blob"), F.col("n"))
    )
    got = dec.select("chain_id", "pts", "back", F.length("blob").alias("nbytes")).collect()
    for r in got:
        assert r["pts"] == r["back"], r["chain_id"]
        assert r["nbytes"] < 24 * len(r["pts"]) / 2  # beats half of raw xyz
