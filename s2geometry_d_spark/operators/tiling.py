"""Raster <-> vector tiling: map image tile grids to S2 cells.

Each image has a footprint rect on the sphere (center lat/lng + extent);
a ``grid x grid`` tile decomposition maps every tile to the level-L cells
it touches, with L picked from the AVG_EDGE metric for the tile extent
(the reference's tiling primitives operate on cell ranges and uv rects,
s2cell_id.d:673-700, s2cell_union.d:136-179; SURVEY.md §2.8).

Physical plan (all JVM-native except one Arrow kernel):

  explode tile grid -> explode SAMPLES x SAMPLES lattice (native sequence)
  -> cell_from_latlng pandas UDF (one vectorized batch pass)
  -> ancestor at the per-row level (native bit math via expr)
  -> dropDuplicates (map-side combine, shuffle on high-cardinality key)

The sample lattice (spacing <= half the min cell width at L) includes every
cell whose overlap with the tile contains a half-spacing disc; corner
slivers below sampling resolution may be omitted (documented, deterministic
engine semantic).  The inverse mapping (cell -> tiles) is the same table
queried the other way.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import kernels
from ..s2core import metrics

GRID = 4
SAMPLES = 5  # per axis; >= 2*tile extent / min cell width at the level used


def tile_level_for_extent(extent_deg: float) -> int:
    """Covering level for one tile of an extent/GRID-degree footprint."""
    tile_rad = math.radians(extent_deg / GRID)
    return metrics.AVG_EDGE.get_closest_level(tile_rad)


def image_tile_assignment(
    images: DataFrame,
    lat_col: str = "lat",
    lng_col: str = "lng",
    extent_col: str = "extent_deg",
    id_col: str = "image_id",
    known_extents: list[float] | None = None,
) -> DataFrame:
    """(image_id, tile_x, tile_y, level, cell_id) — one row per touched cell.

    Tile (tx, ty) covers the [tx/G, (tx+1)/G) x [ty/G, (ty+1)/G) fraction of
    the footprint rect centered at (lat, lng).
    """
    g = F.lit(float(GRID))
    half = F.col(extent_col) / 2.0
    # project away payload columns (bytes!) BEFORE the 16x tile explode —
    # otherwise every tile row drags the full image binary through the plan
    images = images.select(id_col, lat_col, lng_col, extent_col)
    tiles = (
        images.withColumn("tile_x", F.explode(F.sequence(F.lit(0), F.lit(GRID - 1))))
        .withColumn("tile_y", F.explode(F.sequence(F.lit(0), F.lit(GRID - 1))))
        .withColumn("lat0", F.col(lat_col) - half + F.col(extent_col) * F.col("tile_y") / g)
        .withColumn("lng0", F.col(lng_col) - half + F.col(extent_col) * F.col("tile_x") / g)
        .withColumn("dlat", F.col(extent_col) / g)
        .withColumn("dlng", F.col(extent_col) / g)
    )

    # level per image from the tile extent: extents are low-cardinality, so
    # resolve levels driver-side and broadcast-join the lookup (no UDF).
    # Pass known_extents when the source is generated (a distinct() here
    # would force a full extra evaluation of the source just for the lookup).
    spark = images.sparkSession
    distinct_extents = known_extents or [
        r[0] for r in images.select(extent_col).distinct().collect()
    ]
    lookup = spark.createDataFrame(
        [(float(e), tile_level_for_extent(float(e))) for e in distinct_extents],
        [extent_col, "level"],
    )
    tiles = tiles.join(F.broadcast(lookup), extent_col)

    # SAMPLES x SAMPLES lattice, fully native; longitude wraps, latitude clamps
    frac = [k / (SAMPLES - 1) for k in range(SAMPLES)]
    samples = (
        tiles.withColumn("fi", F.explode(F.array(*[F.lit(f) for f in frac])))
        .withColumn("fj", F.explode(F.array(*[F.lit(f) for f in frac])))
        .withColumn(
            "s_lat",
            F.greatest(F.lit(-89.9), F.least(F.lit(89.9), F.col("lat0") + F.col("dlat") * F.col("fj"))),
        )
        .withColumn(
            "s_lng",
            F.pmod(F.col("lng0") + F.col("dlng") * F.col("fi") + F.lit(180.0), F.lit(360.0))
            - F.lit(180.0),
        )
    )
    leafed = samples.withColumn(
        "s_cell", kernels.cell_from_latlng(F.col("s_lat"), F.col("s_lng"))
    )
    # ancestor at the per-row level: native bit math with a column level
    with_cell = leafed.withColumn(
        "lsb", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(2*(30 - level) AS INT))")
    ).withColumn("cell_id", F.expr("(s_cell & -lsb) | lsb"))

    return with_cell.select(
        F.col(id_col), "tile_x", "tile_y", "level", "cell_id"
    ).dropDuplicates([id_col, "tile_x", "tile_y", "cell_id"])
