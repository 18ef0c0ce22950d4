"""Raster <-> vector tiling: map image tile grids to S2 cells.

Each image has a footprint rect on the sphere (center lat/lng + extent);
a ``grid x grid`` tile decomposition maps every tile to the level-L cells
it touches, with L picked from the AVG_EDGE metric for the tile extent
(the reference's tiling primitives operate on cell ranges and uv rects,
s2cell_id.d:673-700, s2cell_union.d:136-179; SURVEY.md §2.8).

The cell assignment is computed **fully vectorized**: a sample lattice over
each tile (spacing <= half the min cell width at L) -> leaf cells -> parents
at L -> distinct.  This includes every cell whose overlap with the tile
contains a half-spacing disc; corner slivers below sampling resolution may
be omitted (documented engine semantic — deterministic and reproducible).
The inverse mapping (cell -> tiles) is the same table queried the other way.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..s2core import cellid as ci
from ..s2core import metrics

GRID = 4
SAMPLES = 5  # per axis; >= 2*GRID extent / min cell width for default level


def tile_level_for_extent(extent_deg: float) -> int:
    """Covering level for one tile of an extent/GRID-degree footprint."""
    tile_rad = math.radians(extent_deg / GRID)
    return metrics.AVG_EDGE.get_closest_level(tile_rad)


@F.pandas_udf(T.ArrayType(T.LongType()))
def tile_cells(
    lat0: pd.Series, lat1: pd.Series, lng0: pd.Series, lng1: pd.Series, level: pd.Series
) -> pd.Series:
    """Distinct level-L cells (signed ids) touched by each tile rect,
    via a SAMPLES x SAMPLES lattice — one numpy batch for all rows."""
    n = len(lat0)
    fr = np.linspace(0.0, 1.0, SAMPLES)
    # lattice points: (n, SAMPLES, SAMPLES)
    la0 = lat0.to_numpy(dtype=np.float64)[:, None]
    la1 = lat1.to_numpy(dtype=np.float64)[:, None]
    lo0 = lng0.to_numpy(dtype=np.float64)[:, None]
    lo1 = lng1.to_numpy(dtype=np.float64)[:, None]
    lats = la0 + (la1 - la0) * fr[None, :]  # (n, S)
    lngs = lo0 + (lo1 - lo0) * fr[None, :]  # (n, S) -- no dateline wrap here;
    # callers produce tile rects in continuous lng space and wrap below
    lat_grid = np.repeat(lats, SAMPLES, axis=1).ravel()
    lng_grid = np.tile(lngs, (1, SAMPLES)).ravel()
    lng_grid = ((lng_grid + 180.0) % 360.0) - 180.0
    leaf = ci.from_latlng(lat_grid, lng_grid).reshape(n, SAMPLES * SAMPLES)
    lvl = level.to_numpy(dtype=np.int64)
    parents = ci.parent(leaf.ravel(), np.repeat(lvl, SAMPLES * SAMPLES)).reshape(
        n, SAMPLES * SAMPLES
    )
    signed = ci.to_signed(parents.ravel()).reshape(n, SAMPLES * SAMPLES)
    return pd.Series([np.unique(row).tolist() for row in signed])


def image_tile_assignment(
    images: DataFrame,
    lat_col: str = "lat",
    lng_col: str = "lng",
    extent_col: str = "extent_deg",
    id_col: str = "image_id",
) -> DataFrame:
    """(image_id, tile_x, tile_y, level, cell_id) — one row per touched cell.

    Tile (tx, ty) covers the [tx/G, (tx+1)/G) x [ty/G, (ty+1)/G) fraction of
    the footprint rect centered at (lat, lng).  All tile-bound math is
    native; only the lattice -> cell kernel crosses into Arrow.
    """
    g = F.lit(float(GRID))
    half = F.col(extent_col) / 2.0
    tiles = (
        images.withColumn("tile_x", F.explode(F.sequence(F.lit(0), F.lit(GRID - 1))))
        .withColumn("tile_y", F.explode(F.sequence(F.lit(0), F.lit(GRID - 1))))
        .withColumn("lat0", F.col(lat_col) - half + F.col(extent_col) * F.col("tile_y") / g)
        .withColumn("lat1", F.col("lat0") + F.col(extent_col) / g)
        .withColumn("lng0", F.col(lng_col) - half + F.col(extent_col) * F.col("tile_x") / g)
        .withColumn("lng1", F.col("lng0") + F.col(extent_col) / g)
        # clamp latitudes; longitudes wrap inside the kernel
        .withColumn("lat0", F.greatest(F.lit(-89.9), F.least(F.lit(89.9), F.col("lat0"))))
        .withColumn("lat1", F.greatest(F.lit(-89.9), F.least(F.lit(89.9), F.col("lat1"))))
    )
    # level per image from the tile extent: extents are low-cardinality, so
    # resolve levels driver-side and broadcast-join the lookup (no UDF)
    spark = images.sparkSession
    distinct_extents = [r[0] for r in images.select(extent_col).distinct().collect()]
    lookup = spark.createDataFrame(
        [(float(e), tile_level_for_extent(float(e))) for e in distinct_extents],
        [extent_col, "level"],
    )
    tiles = tiles.join(F.broadcast(lookup), extent_col)
    assigned = tiles.withColumn(
        "cells",
        tile_cells(F.col("lat0"), F.col("lat1"), F.col("lng0"), F.col("lng1"), F.col("level")),
    )
    return assigned.select(
        F.col(id_col),
        "tile_x",
        "tile_y",
        "level",
        F.explode("cells").alias("cell_id"),
    )
