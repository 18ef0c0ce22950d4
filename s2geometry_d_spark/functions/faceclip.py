"""Column kernels over the UV edge-clipping core (s2edge_clipping.d:46-120
getFaceSegments as a distributed per-edge transform).

``edge_face_span`` emits (first_face, last_face, n_segments, n_faces) per
edge — the SQL-checkable half (first/last face are pure endpoint argmax
math the oracle reproduces) plus the walk-dependent counts (pinned by
tests/test_edgeclip.py invariants).  ``edge_face_segments_rows`` explodes
the full per-face UV geometry for rasterization-style consumers.

Most edges take the single-face fast path (no walk), so the per-row Python
loop is dominated by two argmax/divide operations; Arrow-batched transfer
keeps it one kernel stage at scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..s2core import edgeclip as ec
from ..s2core.coords import latlng_to_xyz

_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("first_face", T.IntegerType()),
        T.StructField("last_face", T.IntegerType()),
        T.StructField("n_segments", T.IntegerType()),
        T.StructField("n_faces", T.IntegerType()),
    ]
)


def _batch_xyz(lat: pd.Series, lng: pd.Series):
    x, y, z = latlng_to_xyz(lat.to_numpy(), lng.to_numpy())
    return x, y, z


@F.pandas_udf(_SPAN_SCHEMA)
def edge_face_span(
    alat: pd.Series, alng: pd.Series, blat: pd.Series, blng: pd.Series
) -> pd.DataFrame:
    ax, ay, az = _batch_xyz(alat, alng)
    bx, by, bz = _batch_xyz(blat, blng)
    rows = []
    for i in range(len(alat)):
        a = (float(ax[i]), float(ay[i]), float(az[i]))
        b = (float(bx[i]), float(by[i]), float(bz[i]))
        segs = ec.face_segments(a, b)
        rows.append(
            (
                segs[0][0],
                segs[-1][0],
                len(segs),
                len({f for f, _, _ in segs}),
            )
        )
    return pd.DataFrame(rows, columns=[f.name for f in _SPAN_SCHEMA])


_SEG_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("face", T.IntegerType()),
            T.StructField("au", T.DoubleType()),
            T.StructField("av", T.DoubleType()),
            T.StructField("bu", T.DoubleType()),
            T.StructField("bv", T.DoubleType()),
        ]
    )
)


@F.pandas_udf(_SEG_SCHEMA)
def edge_face_segments_list(
    alat: pd.Series, alng: pd.Series, blat: pd.Series, blng: pd.Series
) -> pd.Series:
    ax, ay, az = _batch_xyz(alat, alng)
    bx, by, bz = _batch_xyz(blat, blng)
    out = []
    for i in range(len(alat)):
        a = (float(ax[i]), float(ay[i]), float(az[i]))
        b = (float(bx[i]), float(by[i]), float(bz[i]))
        out.append(
            [
                (f, auv[0], auv[1], buv[0], buv[1])
                for f, auv, buv in ec.face_segments(a, b)
            ]
        )
    return pd.Series(out)


def edge_face_segments_rows(edges_df: DataFrame) -> DataFrame:
    """One row per (edge, face segment): edge columns + (face, au, av, bu,
    bv).  The UDF call is exploded INLINE (no intermediate column) so the
    kernel evaluates once per row (the round-4 tile_cells lesson)."""
    seg = F.explode(
        edge_face_segments_list(
            F.col("alat"), F.col("alng"), F.col("blat"), F.col("blng")
        )
    ).alias("seg")
    return edges_df.select("*", seg).select(
        *edges_df.columns,
        F.col("seg.face").alias("face"),
        F.col("seg.au").alias("au"),
        F.col("seg.av").alias("av"),
        F.col("seg.bu").alias("bu"),
        F.col("seg.bv").alias("bv"),
    )
