"""Driver contract for the spark-graft builder (PySpark target).

Engine: s2geometry_d_spark — PySpark-native S2 spatial-join + tiling engine
(SURVEY.md).  Each ``queries()`` entry is a DataFrame plan over the driver
testdata; ``oracle_sql()`` states the identical computation in ANSI SQL for
DuckDB.  Cell-id-dependent operators (coverings, tiling, roundtrips) have no
SQL form — they are pinned by the pytest invariant suites instead and get
the driver's rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from s2geometry_d_spark.functions import kernels
from s2geometry_d_spark.operators import dedup, knn, similarity, text, tiling
from s2geometry_d_spark.operators.spatial_join import (
    points_in_regions,
    points_not_in_regions,
)
from s2geometry_d_spark.plans import demo
from s2geometry_d_spark.sources import tables
from s2geometry_d_spark.sources.images import synth_images_cached as synth_images


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.spatial_points(spark, sf_dir)


_NPOINTS_CACHE: dict = {}


def _n_points(spark: SparkSession, sf_dir: str) -> int:
    """Session-memoized row count of the points fixture (== orders rows):
    a size HINT consumed by the kNN seed formulas.  Every kNN-family query
    paid a count job per evaluation for a number that is constant per
    (session, sf_dir)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    n = _NPOINTS_CACHE.get(key)
    if n is None:
        n = _points(spark, sf_dir).count()
        _NPOINTS_CACHE[key] = n
    return n


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# deterministic edge fixture shared with the SQL oracle: chain points in
# (floor(lat), lng, point_id) order -> latitude-banded short edges.  The
# global window is fixture GENERATION only (fine at test scale); production
# edge tables arrive as data.  Both the edge table and its registered-cell
# index are session-cached (the reference's build-once index model,
# s2loop.d:1078-1093) so the kNN, crossing and polyline queries share ONE
# fixture build + ONE registration instead of re-running both per query.
_EDGE_ORDER = "ORDER BY floor(lat), lng, point_id"
_EDGES_CACHE: dict = {}
_REGISTERED_CACHE: dict = {}


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _EDGES_CACHE.get(key)
    if cached is not None:
        return cached
    pts = _points(spark, sf_dir).select("point_id", "lat", "lng")
    w = W.orderBy(F.floor("lat"), F.col("lng"), F.col("point_id"))
    df = (
        pts.withColumn("blat", F.lead("lat").over(w))
        .withColumn("blng", F.lead("lng").over(w))
        .filter(F.col("blat").isNotNull())
        .select(
            F.col("point_id").alias("edge_id"),
            F.col("lat").alias("alat"),
            F.col("lng").alias("alng"),
            "blat",
            "blng",
        )
        # the global fixture window collapses to ONE partition; spread the
        # persisted table so every consumer (probes, brute fallbacks, clip
        # walks) gets full parallelism instead of a serialized scan
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    _EDGES_CACHE[key] = df
    return df


def _edges_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _REGISTERED_CACHE.get(key)
    if cached is not None:
        return cached
    df = knn.register_edges(_edges(spark, sf_dir))
    _REGISTERED_CACHE[key] = df
    return df


_REGISTERED_PL_CACHE: dict = {}


def _polyline_edges_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _REGISTERED_PL_CACHE.get(key)
    if cached is not None:
        return cached
    df = knn.register_edges(_polyline_edges(spark, sf_dir))
    _REGISTERED_PL_CACHE[key] = df
    return df


def release_caches(spark: SparkSession | None = None) -> int:
    """Unpersist and evict every session-cached fixture/index DataFrame
    (edges, registered-cell indexes, polygon index).  Long-lived sessions
    touching many sf_dirs or ad-hoc edge tables would otherwise accumulate
    pinned storage for the application lifetime (ADVICE round-3).  Pass a
    SparkSession to release only that application's entries.  Returns the
    number of DataFrames unpersisted."""
    app_id = spark.sparkContext.applicationId if spark is not None else None
    for key in list(_NPOINTS_CACHE):
        if app_id is None or key[0] == app_id:
            _NPOINTS_CACHE.pop(key)
    released = 0
    for cache in (
        _EDGES_CACHE,
        _REGISTERED_CACHE,
        _REGISTERED_PL_CACHE,
        _POLY_INDEX_CACHE,
        _POLYLINE_EDGES_CACHE,
    ):
        for key in list(cache):
            if app_id is not None and key[0] != app_id:
                continue
            val = cache.pop(key)
            for df in val if isinstance(val, tuple) else (val,):
                if isinstance(df, DataFrame):
                    df.unpersist()
                    released += 1
    return released


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: point-in-cap spatial join on sf0.001."""
    return queries()["pip_cap_join"](spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# spark-side queries
# ---------------------------------------------------------------------------


def _q_pip_cap(spark, sf_dir):
    pts = _points(spark, sf_dir)
    # covering cells are disjoint: at most one candidate row per
    # (point, region), so no distinct / shuffle is needed
    return points_in_regions(pts, demo.cap_regions()).select("region_id", "point_id")


def _q_pip_rect(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return points_in_regions(pts, demo.rect_regions()).select("region_id", "point_id")


def _q_pip_poly(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return points_in_regions(pts, [demo.poly_region()]).select("point_id")


def _q_pip_bigpoly(spark, sf_dir):
    """PIP against a 10,000-edge polygon: exercises the per-cell
    clipped-edge index (boundary candidates test <=16 edges each)."""
    pts = _points(spark, sf_dir)
    return points_in_regions(pts, [demo.bigpoly_region()]).select("point_id")


def _q_pip_many_poly(spark, sf_dir):
    """PIP against 1000 hash-placed hexagons — the many-region covering
    join at 100x the demo-region cardinality (north-rule broadcast-vs-SMJ
    evidence at real region counts); the oracle evaluates each polygon's
    closed-form convex predicate over every point."""
    pts = _points(spark, sf_dir)
    return points_in_regions(pts, demo.many_poly_regions()).select(
        "region_id", "point_id"
    )


_POLY_INDEX_CACHE: dict = {}


def _q_pip_many_poly_table(spark, sf_dir):
    """Same 1000-polygon PIP through the DISTRIBUTED index-table path
    (S2ShapeIndex as rows, SURVEY §1.3): applyInPandas builds the index as
    a table, candidates come from a prefix equi-join + residual range, and
    boundary parity reads each candidate row's own payload — no
    driver-held geometry in the plan.  Same oracle as pip_many_poly_join."""
    from s2geometry_d_spark.operators.poly_index import (
        build_polygon_index,
        points_in_polygons_table,
        polygons_dataframe,
    )

    key = (spark.sparkContext.applicationId, "many_poly_index")
    cached = _POLY_INDEX_CACHE.get(key)
    if cached is None:
        polys_df = polygons_dataframe(spark, demo.many_poly_regions())
        idx = build_polygon_index(polys_df).persist()
        jl = idx.agg(F.min("cov_level")).collect()[0][0]
        cached = _POLY_INDEX_CACHE[key] = (idx, int(jl))
    idx, jl = cached
    pts = _points(spark, sf_dir)
    out = points_in_polygons_table(pts, idx, join_level=jl)
    return out.select(F.col("poly_id").alias("region_id"), "point_id")


def _q_pip_unified_index(spark, sf_dir):
    """Same 1000-polygon PIP probed through the UNIFIED mixed-shape index
    (s2shape_index.d:34-148: points/polylines/polygons in ONE table) — the
    dim=2 slice routes through the identical join machinery, so the oracle
    (and hash) are shared with pip_many_poly_table while the artifact also
    carries dim=0/1 rows."""
    from s2geometry_d_spark.operators.shape_index import points_in_shapes

    idx, jl = _unified_index(spark, sf_dir)
    pts = _points(spark, sf_dir)
    out = points_in_shapes(pts, idx, join_level=jl)
    return out.select(F.col("poly_id").alias("region_id"), "point_id")


def _q_pip_text_index(spark, sf_dir):
    """Same 1000-polygon PIP, but the index is built from s2text_format
    STRINGS (s2text_format.d:358-395 "points # polylines # polygons" —
    the reference's debug text as a distributed SOURCE): format each demo
    polygon with the reference's %.15g, parse the column back with
    mapInPandas, build the unified index, probe.  The oracle (and hash)
    are shared with pip_many_poly_table, so the whole
    format→parse→index→join pipeline is hash-gated end-to-end."""
    from s2geometry_d_spark.operators.shape_index import (
        points_in_shapes,
        unified_index_from_text,
    )
    from s2geometry_d_spark.s2core import textformat as tf

    key = (spark.sparkContext.applicationId, "text_index")
    cached = _POLY_INDEX_CACHE.get(key)
    if cached is None:
        rows = [
            (rid, "# # " + tf.polygon_to_string(poly))
            for rid, poly in demo.many_poly_regions()
        ]
        src = spark.createDataFrame(rows, ["index_id", "text"])
        idx = unified_index_from_text(src).persist()
        jl = (
            idx.filter(F.col("dim") == 2).agg(F.min("cov_level")).collect()[0][0]
        )
        cached = _POLY_INDEX_CACHE[key] = (idx, int(jl))
    idx, jl = cached
    pts = _points(spark, sf_dir)
    out = points_in_shapes(pts, idx, join_level=jl)
    return out.select(
        F.regexp_replace("poly_id", ":g0$", "").alias("region_id"), "point_id"
    )


def _unified_index(spark, sf_dir):
    """Session-cached unified mixed-shape index shared with
    pip_unified_index (same cache key → build-once across the suite)."""
    from s2geometry_d_spark.operators.shape_index import unified_shape_index
    from s2geometry_d_spark.operators.poly_index import polygons_dataframe

    key = (spark.sparkContext.applicationId, "unified_index")
    cached = _POLY_INDEX_CACHE.get(key)
    if cached is None:
        polys_df = polygons_dataframe(spark, demo.many_poly_regions())
        edges = _edges(spark, sf_dir).limit(2000)
        idx = unified_shape_index(edges_df=edges, polys_df=polys_df).persist()
        jl = (
            idx.filter(F.col("dim") == 2).agg(F.min("cov_level")).collect()[0][0]
        )
        cached = _POLY_INDEX_CACHE[key] = (idx, int(jl))
    return cached


def _q_pip_incremental_index(spark, sf_dir):
    """Same 1000-polygon PIP through an INCREMENTALLY MAINTAINED index
    (mutable_s2shape_index.d:100-180 add/release/applyUpdates): start from
    half the polygons PLUS 50 decoys that are exact geometric copies of
    mp0000-mp0049 (they match real points, so a failed removal breaks the
    hash), then add the other half and release the decoys via
    update_shape_index.  The oracle is shared with pip_many_poly_table —
    update == rebuild is hash-gated end-to-end."""
    from s2geometry_d_spark.operators.poly_index import polygons_dataframe
    from s2geometry_d_spark.operators.shape_index import (
        points_in_shapes,
        unified_shape_index,
        update_shape_index,
    )

    key = (spark.sparkContext.applicationId, "incremental_index")
    cached = _POLY_INDEX_CACHE.get(key)
    if cached is None:
        regions = demo.many_poly_regions()
        half = len(regions) // 2
        decoys = [("rm:" + rid, poly) for rid, poly in regions[:50]]
        base = unified_shape_index(
            polys_df=polygons_dataframe(spark, regions[:half] + decoys)
        )
        idx = update_shape_index(
            base,
            add_polys=polygons_dataframe(spark, regions[half:]),
            remove_shape_ids=[rid for rid, _ in decoys],
        ).persist()
        jl = (
            idx.filter(F.col("dim") == 2).agg(F.min("cov_level")).collect()[0][0]
        )
        cached = _POLY_INDEX_CACHE[key] = (idx, int(jl))
    idx, jl = cached
    pts = _points(spark, sf_dir)
    out = points_in_shapes(pts, idx, join_level=jl)
    return out.select(F.col("poly_id").alias("region_id"), "point_id")


def _q_index_region_check(spark, sf_dir):
    """S2ShapeIndexRegion contains/mayIntersect over a TABLE of target
    cells (s2shape_index_region.d:175-240), verified against ground truth
    the SQL oracle derives from the polygon predicates alone: every
    SQL-matched point must land in a may_intersect=true target (a shape
    that truly intersects a cell may never report false, d:285-300), and
    no unmatched point may land in a contains=true target (contains=true
    requires one dim-2 shape to truly contain the whole cell, d:169-199).
    Targets are the distinct level-{4,8,12} ancestors of the point cells,
    so the check sweeps coarse (< join_level), equal and subdivided
    relation branches in one query.  Probes are the deterministic mod-10
    decimation of the point table (same predicate in the oracle) — branch
    coverage is identical and the full-density relation is pinned by
    tests/test_index_region.py."""
    from s2geometry_d_spark.operators.index_region import cells_region_relation
    from s2geometry_d_spark.operators.shape_index import points_in_shapes

    idx, jl = _unified_index(spark, sf_dir)
    # lazy localCheckpoints at every fan-out frame: the final plan consumes
    # pts twice (ancestor explode + PIP), ptsL twice (targets + the match
    # join) and targets four times (fine/coarse/out-join inside
    # cells_region_relation + the relation output) — as plain Datasets each
    # consumer re-evaluated the whole scan+cell-kernel lineage (measured
    # 13.7s for the assembled query vs ~4s of unique work); checkpointed
    # RDDs are SHARED nodes in the physical DAG, so each computes once.
    # All three frames are decimation-sized (15k/45k/32k rows).
    pts = (
        _points(spark, sf_dir)
        .filter(F.col("point_id") % 10 == 0)
        .localCheckpoint(eager=False)
    )
    levels = [4, 8, 12]

    # ONE pass: (point, level, ancestor-cell) via a 3-wide explode — every
    # downstream stage (relation, match join, per-level aggregate) runs
    # once over the union instead of once per level
    ptsL = (
        pts.select(
            "point_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(lvl).alias("level"),
                            kernels.parent_signed(F.col("cell_id"), lvl).alias(
                                "tcell"
                            ),
                        )
                        for lvl in levels
                    ]
                )
            ).alias("lt"),
        )
        .select("point_id", "lt.level", "lt.tcell")
        .localCheckpoint(eager=False)
    )

    targets = ptsL.select("tcell", "level").distinct().localCheckpoint(eager=False)
    rel = cells_region_relation(targets, idx, join_level=jl, broadcast_index=True)

    matched = (
        points_in_shapes(pts, idx, join_level=jl)
        .select("point_id")
        .distinct()
        .withColumn("_m", F.lit(True))
    )

    j = ptsL.join(
        rel.select("tcell", "contains", "may_intersect"), "tcell", "left"
    ).join(matched, "point_id", "left")
    return (
        j.groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.when(F.col("_m"), 1).otherwise(0)).alias("n_matched"),
            F.sum(
                F.when(F.col("_m") & F.col("may_intersect"), 1).otherwise(0)
            ).alias("n_matched_in_may"),
            F.sum(
                F.when(F.col("contains") & F.col("_m").isNull(), 1).otherwise(0)
            ).alias("n_unmatched_in_contains"),
        )
        .orderBy("level")
    )


def _q_index_union_bound_check(spark, sf_dir):
    """getCellUnionBound of the whole unified index
    (s2shape_index_region.d:111-166, <= 6 cells from two metadata-sized
    aggregates) — conservative direction pinned by data: every SQL-matched
    point lies inside a polygon, hence inside the index's covering cells,
    hence inside the bound; the oracle derives (n_matched, 0 outside) from
    the polygon predicates."""
    from s2geometry_d_spark.operators.index_region import index_cell_union_bound
    from s2geometry_d_spark.operators.shape_index import points_in_shapes

    idx, jl = _unified_index(spark, sf_dir)
    pts = _points(spark, sf_dir)
    bound = index_cell_union_bound(idx)
    arr = "array(" + ",".join(f"{c}L" for c in bound) + ")"
    covered = F.expr(
        f"exists({arr}, c -> cell_id >= c - (c & -c) + 1"
        f" AND cell_id <= c + (c & -c) - 1)"
    )
    matched = (
        points_in_shapes(pts, idx, join_level=jl)
        .select("point_id")
        .distinct()
        .join(pts.select("point_id", "cell_id"), "point_id")
    )
    return matched.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum(F.when(covered, 0).otherwise(1)).alias("n_outside"),
    )


def _q_spatial_antijoin(spark, sf_dir):
    pts = _points(spark, sf_dir)
    out = points_not_in_regions(pts, demo.all_regions(), ["point_id"])
    return out.agg(F.count("*").alias("n_outside"))


def _q_knn(spark, sf_dir):
    pts = _points(spark, sf_dir)
    n = _n_points(spark, sf_dir)
    res = knn.knn_join(
        pts, demo.knn_queries(), k=5, n_points_hint=n, tie_col="point_id"
    )
    return res.select("query_id", "rank", "point_id")


def _q_knn_maxdist(spark, sf_dir):
    """Closest-POINT kNN with the max_distance option
    (s2closest_point_query.d:58-97 setMaxDistance): the ring never grows
    past the limit and fewer than k results there is a complete answer."""
    pts = _points(spark, sf_dir)
    n = _n_points(spark, sf_dir)
    res = knn.knn_join(
        pts,
        demo.knn_queries(),
        k=5,
        n_points_hint=n,
        tie_col="point_id",
        max_distance_deg=1.0,
    )
    return res.select("query_id", "rank", "point_id")


def _q_knn_maxerror(spark, sf_dir):
    """Closest-POINT kNN with the max_error early-exit option
    (s2closest_point_query.d:110-111 setMaxError).  As with the edge
    variant, the chosen max_error (0.02 deg) sits far below the fixture's
    kth/(k+1)th distance gaps, so the approximate result provably
    coincides with the exact top-k and the exact SQL oracle verifies the
    option end-to-end; the genuinely-approximate regime is covered by the
    tolerance flip in tests/test_knn_options.py."""
    pts = _points(spark, sf_dir)
    n = _n_points(spark, sf_dir)
    res = knn.knn_join(
        pts,
        demo.knn_queries(),
        k=5,
        n_points_hint=n,
        tie_col="point_id",
        max_error_deg=0.02,
    )
    return res.select("query_id", "rank", "point_id")


def _q_knn_region(spark, sf_dir):
    """Closest-POINT kNN restricted to a region (setRegion option,
    s2closest_point_query.d Options): results are the k nearest points
    INSIDE cap_paris — for far-away queries the ring must expand into the
    cap and the brute fallback must inherit the PIP pre-filter, both of
    which the shared exact oracle verifies."""
    from s2geometry_d_spark.s2core.regions import Cap

    _, la, ln, r = demo.CAPS[0]
    pts = _points(spark, sf_dir)
    n = _n_points(spark, sf_dir)
    res = knn.knn_join(
        pts,
        demo.knn_queries(),
        k=5,
        n_points_hint=n,
        tie_col="point_id",
        region=Cap.from_latlng_radius(la, ln, r),
    )
    return res.select("query_id", "rank", "point_id")


def _q_knn_edges(spark, sf_dir):
    """Closest-edge kNN (the reference's flagship query class)."""
    e = _edges(spark, sf_dir)
    # edge count = orders count - 1; parquet metadata count is free
    n = _n_points(spark, sf_dir) - 1
    res = knn.knn_edges_join(
        e,
        demo.knn_queries(),
        k=5,
        n_edges_hint=n,
        registered_df=_edges_registered(spark, sf_dir),
    )
    return res.select("query_id", "rank", "edge_id")


def _q_knn_unified(spark, sf_dir):
    """Closest-edge kNN probed through the UNIFIED mixed-shape index — the
    third consumer of the one-artifact-many-queries contract
    (s2shape_index.d); shares the brute-force-derivable oracle with
    knn_edges_join."""
    from s2geometry_d_spark.operators.shape_index import knn_edges_unified

    key = (spark.sparkContext.applicationId, "unified_edges_index", sf_dir)
    cached = _POLY_INDEX_CACHE.get(key)
    if cached is None:
        from s2geometry_d_spark.operators.shape_index import unified_shape_index

        idx = unified_shape_index(edges_df=_edges(spark, sf_dir)).persist()
        cached = _POLY_INDEX_CACHE[key] = (idx, None)
    idx, _ = cached
    n = _n_points(spark, sf_dir) - 1
    res = knn_edges_unified(idx, demo.knn_queries(), k=5, n_edges_hint=n)
    return res.select(
        "query_id", "rank", F.col("edge_id").cast("long").alias("edge_id")
    )


_POLYLINE_CHAIN = 100  # consecutive fixture edges per polyline


_POLYLINE_EDGES_CACHE: dict = {}


def _polyline_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polyline TABLE fixture: consecutive fixture edges chained into
    polylines of _POLYLINE_CHAIN edges each (SQL-reproducible numbering:
    row_number over the a-endpoint's original sort key).  Session-cached
    and persisted like ``_edges``: the global row_number is a single-
    partition sort of the whole edge table, and without the cache every
    consumer (clip walk, polyline kNN brute side, within-distance) re-ran
    it per action."""
    from pyspark.sql import Window as W

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _POLYLINE_EDGES_CACHE.get(key)
    if cached is not None:
        return cached
    e = _edges(spark, sf_dir)
    w = W.orderBy(F.floor("alat"), F.col("alng"), F.col("edge_id"))
    rn = F.row_number().over(w)
    df = (
        e.withColumn("seq", rn)
        .withColumn(
            "polyline_id",
            F.floor((rn - 1) / _POLYLINE_CHAIN).cast("long"),
        )
        # spread the single-partition window output (see _edges)
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    _POLYLINE_EDGES_CACHE[key] = df
    return df


def _q_nearest_polyline(spark, sf_dir):
    """k nearest POLYLINES per query — polylines as a first-class TABLE
    side (VERDICT #10)."""
    from s2geometry_d_spark.operators.polyline_join import nearest_polyline_join

    pe = _polyline_edges(spark, sf_dir)
    n_pl = (_n_points(spark, sf_dir) - 1) // _POLYLINE_CHAIN + 1
    res = nearest_polyline_join(
        pe,
        demo.knn_queries(),
        k=3,
        n_polylines_hint=n_pl,
        registered_df=_polyline_edges_registered(spark, sf_dir),
    )
    return res.select(
        "query_id", "rank", "polyline_id", F.round("dist2", 9).alias("dist2")
    )


_PL_WITHIN_DEG = 2.0


def _q_polyline_within_distance(spark, sf_dir):
    """Polylines within a distance limit of each query (nearest_polyline
    with max_distance — the within-distance special case of the options
    parity; partial answers are complete answers)."""
    from s2geometry_d_spark.operators.polyline_join import nearest_polyline_join

    pe = _polyline_edges(spark, sf_dir)
    res = nearest_polyline_join(
        pe,
        demo.knn_queries(),
        k=5,
        n_polylines_hint=1000,
        registered_df=_polyline_edges_registered(spark, sf_dir),
        max_distance_deg=_PL_WITHIN_DEG,
    )
    return res.select(
        "query_id", "rank", "polyline_id", F.round("dist2", 9).alias("dist2")
    )


def _q_knn_edges_maxdist(spark, sf_dir):
    """Closest-edge kNN with a max_distance option (reference options
    parity, s2closest_edge_query.d:199-272): fewer than k results at the
    limit is a complete answer."""
    e = _edges(spark, sf_dir)
    n = _n_points(spark, sf_dir) - 1
    res = knn.knn_edges_join(
        e,
        demo.knn_queries(),
        k=5,
        n_edges_hint=n,
        max_distance_deg=1.0,
        registered_df=_edges_registered(spark, sf_dir),
    )
    return res.select("query_id", "rank", "edge_id")


def _q_knn_edges_maxerror(spark, sf_dir):
    """Closest-edge kNN with the max_error early-exit option
    (s2closest_edge_query.d:199-272 setMaxError).  The chosen max_error
    (0.02 deg) is far below the fixture's kth/(k+1)th distance gaps, so the
    approximate result provably COINCIDES with the exact top-k — which is
    what lets the exact SQL oracle verify the option end-to-end (the
    brute-force tolerance flip in tests/test_knn_options.py covers the
    genuinely-approximate regime)."""
    e = _edges(spark, sf_dir)
    n = _n_points(spark, sf_dir) - 1
    res = knn.knn_edges_join(
        e,
        demo.knn_queries(),
        k=5,
        n_edges_hint=n,
        max_error_deg=0.02,
        registered_df=_edges_registered(spark, sf_dir),
    )
    return res.select("query_id", "rank", "edge_id")


def _q_furthest(spark, sf_dir):
    """k furthest points per query (max-distance family) via the exact
    antipodal reduction chord2(p,q) = 4 - chord2(p,-q)."""
    pts = _points(spark, sf_dir)
    n = _n_points(spark, sf_dir)
    res = knn.furthest_points_join(
        pts, demo.knn_queries(), k=5, n_points_hint=n, tie_col="point_id"
    )
    return res.select("query_id", "rank", "point_id")


def _crossing_targets():
    wp = demo.POLYLINE_WAYPOINTS
    return [(f"t{i}", wp[i], wp[i + 1]) for i in range(len(wp) - 1)]


def _q_edge_face_span(spark, sf_dir):
    """getFaceSegments (s2edge_clipping.d:68-120) over the edge table: the
    first/last face of each edge's face-segment chain, SQL-oracled (the
    chain endpoints are the largestAbsComponent faces of the edge
    endpoints, which DuckDB reproduces in closed form); the walk-dependent
    segment counts and UV geometry are pinned by tests/test_edgeclip.py."""
    from s2geometry_d_spark.functions.faceclip import edge_face_span

    e = _edges(spark, sf_dir)
    # explode-the-UDF-call-inline so the kernel evaluates ONCE even though
    # two struct fields are projected (the round-4 doubled-Arrow lesson:
    # CollapseProject would otherwise clone the UDF per extracted field)
    span = F.explode(
        F.array(
            edge_face_span(
                F.col("alat"), F.col("alng"), F.col("blat"), F.col("blng")
            )
        )
    ).alias("s")
    return e.select("edge_id", span).select(
        "edge_id",
        F.col("s.first_face").alias("first_face"),
        F.col("s.last_face").alias("last_face"),
    )


def _q_crossing_edges(spark, sf_dir):
    """Which data edges properly cross the route polyline's edges."""
    from s2geometry_d_spark.operators.crossing import crossing_edges_join

    e = _edges(spark, sf_dir)
    out = crossing_edges_join(
        e, _crossing_targets(), registered_df=_edges_registered(spark, sf_dir)
    )
    return out.select("target_id", "edge_id")


def _q_crossing_unified(spark, sf_dir):
    """Same crossing-edge query probed through the UNIFIED mixed-shape
    index (dim=1 slice reconstructs the registered-edge view) — shares the
    det-product oracle with crossing_edges_join, so hash parity across
    artifacts is driver-checked every round."""
    from s2geometry_d_spark.operators.shape_index import (
        crossing_edges_unified,
        unified_shape_index,
    )

    key = (spark.sparkContext.applicationId, "unified_edges_index", sf_dir)
    cached = _POLY_INDEX_CACHE.get(key)
    if cached is None:
        idx = unified_shape_index(edges_df=_edges(spark, sf_dir)).persist()
        cached = _POLY_INDEX_CACHE[key] = (idx, None)
    idx, _ = cached
    out = crossing_edges_unified(idx, _crossing_targets())
    return out.select("target_id", F.col("edge_id").cast("long").alias("edge_id"))


# jittered chords: each point gets a CLOSED-FORM second endpoint (+-2 deg
# hash jitter in lat and lng) — a map-only derivation (no window, no sort),
# short at every sf, and dense criss-crossing wherever points are dense.
# Consecutive-point sweep edges would be lng-DISJOINT within a strip
# (~0 crossings); long strided chords defeat the cell pruning.  No two
# jittered chords share a vertex, so every reported pair is a PROPER cross.
_SELF_PAIRS_MOD = 3
_SELF_JLAT = "(((point_id * 1103515245 + 98765) % 1000003) / 1000003e0 - 0.5e0) * 4e0"
_SELF_JLNG = "(((point_id * 1597334677 + 424242) % 1000003) / 1000003e0 - 0.5e0) * 4e0"


def _chord_edges(spark, sf_dir):
    return (
        _points(spark, sf_dir)
        .selectExpr(
            "point_id AS edge_id",
            "lat AS alat",
            "lng AS alng",
            f"greatest(-89.95e0, least(89.95e0, lat + {_SELF_JLAT})) AS blat",
            f"lng + {_SELF_JLNG} AS blng",
        )
        .filter(F.col("edge_id") % _SELF_PAIRS_MOD == 0)
    )


# a second, independently-jittered chord table (disjoint point subset) for
# the TABLE-to-TABLE crossing join
_SELF_JLAT2 = "(((point_id * 1566083941 + 13579) % 1000003) / 1000003e0 - 0.5e0) * 4e0"
_SELF_JLNG2 = "(((point_id * 1812433253 + 246801) % 1000003) / 1000003e0 - 0.5e0) * 4e0"


def _chord_edges_b(spark, sf_dir):
    return (
        _points(spark, sf_dir)
        .selectExpr(
            "point_id AS edge_id",
            "lat AS alat",
            "lng AS alng",
            f"greatest(-89.95e0, least(89.95e0, lat + {_SELF_JLAT2})) AS blat",
            f"lng + {_SELF_JLNG2} AS blng",
        )
        .filter(F.col("edge_id") % _SELF_PAIRS_MOD == 1)
    )


def _q_crossing_pairs_tables(spark, sf_dir):
    """TABLE-to-TABLE crossing join (S2CrossingEdgeQuery with an indexed
    edge collection as the query side): every (a, b) proper crossing
    between two independently-jittered chord tables over disjoint point
    subsets — both sides DataFrames end to end, candidates from the
    two-direction cell/ancestor equi-join, never all-pairs."""
    from s2geometry_d_spark.operators.crossing import crossing_pairs_join
    from s2geometry_d_spark.operators import knn as _knn

    a = _chord_edges(spark, sf_dir)
    b = _chord_edges_b(spark, sf_dir)
    rega_key = (spark.sparkContext.applicationId, sf_dir, "selfpairs_reg")
    rega = _REGISTERED_CACHE.get(rega_key)
    if rega is None:
        rega = _knn.register_edges(a)
        _REGISTERED_CACHE[rega_key] = rega
    regb_key = (spark.sparkContext.applicationId, sf_dir, "tablepairs_regb")
    regb = _REGISTERED_CACHE.get(regb_key)
    if regb is None:
        regb = _knn.register_edges(b)
        _REGISTERED_CACHE[regb_key] = regb
    out = crossing_pairs_join(a, b, a_registered=rega, b_registered=regb)
    return out.select("id_a", "id_b")


def _q_crossing_pairs_self(spark, sf_dir):
    """Single-TABLE crossing sweep (shapeutil/visit_crossing_edge_pairs.d):
    every properly-crossing unordered edge pair within one edge table,
    reported once, via the registered-cell ancestor join — never all-pairs.
    The DuckDB oracle forms the subset's explicit pair join with the same
    det-product condition; the engine never does."""
    from s2geometry_d_spark.operators.crossing import crossing_pairs_self

    e = _chord_edges(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, "selfpairs_reg")
    reg = _REGISTERED_CACHE.get(key)
    if reg is None:
        from s2geometry_d_spark.operators import knn as _knn

        reg = _knn.register_edges(e)
        _REGISTERED_CACHE[key] = reg
    out = crossing_pairs_self(e, registered_df=reg)
    return out.select("id_a", "id_b")


WITHIN_QUERIES = [("q1", 48.85, 2.35), ("q2", -33.86, 151.21), ("q3", 10.0, 179.9)]
WITHIN_RADIUS = 8.0


def _q_polygon_relations(spark, sf_dir):
    """polygon x polygon relations over a pairs table (s2boolean_operation
    contains/intersects, s2polygon.d:651-722) via the engine's generic
    boundary sweep; the oracle re-derives each relation by the convex
    characterization (vertex containment + proper crossings)."""
    import pandas as pd
    from pyspark.sql import types as T

    from s2geometry_d_spark.operators.overlay import pairs_dataframe
    from s2geometry_d_spark.s2core.loops import Loop, Polygon

    df = pairs_dataframe(spark, demo.relation_pairs())
    schema = T.StructType(
        [
            T.StructField("pair_id", T.IntegerType(), False),
            T.StructField("intersects", T.BooleanType(), False),
            T.StructField("a_contains_b", T.BooleanType(), False),
            T.StructField("b_contains_a", T.BooleanType(), False),
        ]
    )

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            a = Polygon([Loop([tuple(v) for v in row["a_verts"]])], "a")
            b = Polygon([Loop([tuple(v) for v in row["b_verts"]])], "b")
            out.append(
                (
                    row["pair_id"],
                    a.intersects(b),
                    a.contains_polygon(b),
                    b.contains_polygon(a),
                )
            )
        return pd.DataFrame(
            out, columns=["pair_id", "intersects", "a_contains_b", "b_contains_a"]
        )

    return df.groupBy("pair_id").applyInPandas(run, schema)


def _q_polygon_union_many(spark, sf_dir):
    """N-way polygon union per group (S2Polygon.destructiveUnion shape):
    applyInPandas folds the pairwise overlay; the oracle re-derives the
    union boundary independently (a point is on ∂(∪P) iff on some ∂P_i and
    strictly inside no other)."""
    from s2geometry_d_spark.operators.overlay import (
        union_groups_dataframe,
        union_vertices,
    )

    df = union_groups_dataframe(spark, demo.union_groups())
    out = union_vertices(df)
    return out.select(
        "group_id",
        F.round("vx", 6).alias("vx"),
        F.round("vy", 6).alias("vy"),
        F.round("vz", 6).alias("vz"),
    )


def _q_clip_polylines(spark, sf_dir):
    """Clip the polyline TABLE to a convex polygon (the 1D boolean
    operand): one row per clipped-chain vertex; the oracle re-derives the
    vertex multiset (interior polyline vertices by det containment +
    closed-form boundary crossings)."""
    from s2geometry_d_spark.operators.overlay import clip_polylines_to_polygon

    _, poly = demo.poly_region()
    pe = _polyline_edges(spark, sf_dir)
    out = clip_polylines_to_polygon(
        pe, poly, registered_df=_polyline_edges_registered(spark, sf_dir)
    )
    return out.select(
        "polyline_id",
        F.round("vx", 6).alias("vx"),
        F.round("vy", 6).alias("vy"),
        F.round("vz", 6).alias("vz"),
    )


def _q_knn_edge_targets(spark, sf_dir):
    """EDGE-target closest-edge query: k nearest table edges to each route
    segment (reference target kinds, s2min_distance_targets.d)."""
    e = _edges(spark, sf_dir)
    res = knn.knn_edges_to_edges(
        e,
        _crossing_targets(),
        k=5,
        registered_df=_edges_registered(spark, sf_dir),
    )
    return res.select("query_id", "rank", "edge_id")


def _q_knn_table_join(spark, sf_dir):
    """TABLE-to-TABLE closest-edge join (ShapeIndexTarget,
    s2min_distance_targets.d): the query side is the mod-300 decimation of
    the edge table itself — every query DataFrame row gets its 5 nearest
    index edges (rank 1 is itself at distance 0) with both sides staying
    distributed end to end; the oracle is the exact cross-join top-k over
    the same decimation."""
    e = _edges(spark, sf_dir)
    qdf = e.filter(F.col("edge_id") % 300 == 0).select(
        F.col("edge_id").alias("query_id"), "alat", "alng", "blat", "blng"
    )
    res = knn.knn_edges_join_tables(
        qdf, e, k=5, registered_df=_edges_registered(spark, sf_dir)
    )
    return res.select("query_id", "rank", "edge_id")


def _cell_targets():
    from s2geometry_d_spark.s2core.cellid import CellId

    return [
        ("cell_paris_l8", CellId.from_latlng(48.85, 2.35).parent(8)),
        ("cell_sydney_l6", CellId.from_latlng(-33.86, 151.21).parent(6)),
        ("cell_andes_l11", CellId.from_latlng(-20.0, -65.0).parent(11)),
        ("cell_nordic_l4", CellId.from_latlng(65.0, 18.0).parent(4)),
    ]


def _q_knn_cell_targets(spark, sf_dir):
    """CELL-target closest-edge query (the fourth reference target kind,
    s2min_distance_targets.d:184-208): k nearest table edges to each query
    cell — 0 for edges touching/inside the cell (the big level-4 target
    exercises the tie regime), else min pair distance against the cell's
    four boundary edges, via the engine-shared SQL fragment."""
    e = _edges(spark, sf_dir)
    res = knn.knn_edges_to_cells(
        e,
        _cell_targets(),
        k=5,
        registered_df=_edges_registered(spark, sf_dir),
    )
    return res.select("query_id", "rank", "edge_id")


def _q_polygon_overlay_op(op):
    """Polygon boolean overlay (∩/∪/−) over a table of polygon pairs — the
    reference's largest module (s2boolean_operation.d:225-481) as a
    dimension-side applyInPandas kernel; the oracle re-derives the boundary
    vertex multiset independently (convex det containment + closed-form
    crossing points)."""

    def q(spark, sf_dir):
        from s2geometry_d_spark.operators.overlay import (
            overlay_vertices,
            pairs_dataframe,
        )

        df = pairs_dataframe(spark, demo.overlay_pairs())
        out = overlay_vertices(df, op)
        return out.select(
            "pair_id",
            F.round("vx", 6).alias("vx"),
            F.round("vy", 6).alias("vy"),
            F.round("vz", 6).alias("vz"),
        )

    return q


def _q_snap_polygons(spark, sf_dir):
    """Distributed snap-rounding ingestion (builder v2: s2builder.d:100-700
    + IntLatLngSnapFunction of builder/util/snap_functions.d): a table of
    DIRTY polygons (near-duplicate vertices) is repaired per group; the
    oracle re-derives the E4 snap-site set with SQL rounding on the same
    vertex literals."""
    from s2geometry_d_spark.operators.overlay import (
        dirty_polygons_dataframe,
        snap_polygons_table,
    )

    df = dirty_polygons_dataframe(spark, demo.snap_fixture_polys())
    return snap_polygons_table(df, exponent=demo.SNAP_EXPONENT)


def _q_validate_polygons(spark, sf_dir):
    """Distributed ingestion validation (s2loop.d findValidationError as a
    table operator): clean loops, bowties and multi-crossing zigzags; the
    oracle re-derives the self-crossing count with the det-product proper-
    crossing form over the same vertex literals (adjacent pairs excluded —
    shared-vertex dets are exact zeros that float as noise)."""
    from s2geometry_d_spark.operators.overlay import (
        dirty_polygons_dataframe,
        validate_polygons_table,
    )

    df = dirty_polygons_dataframe(spark, demo.validation_fixture_polys())
    out = validate_polygons_table(df)
    return out.select(
        "poly_id",
        (F.col("n_self_crossings") == 0).alias("is_valid_by_crossings"),
        "n_self_crossings",
    )


def _q_polygon_overlay_holes(op, flip=False):
    """Overlay over polygons WITH HOLES (annulus vs disc across the five
    topological configurations; s2polygon.d:129+ nesting over
    s2boolean_operation.d) — the round-3 verdict's #1 missing item.  The
    oracle re-derives hole-vertex containment with the REVERSED det sign
    (max over CW hole edges)."""

    def q(spark, sf_dir):
        from s2geometry_d_spark.operators.overlay import (
            loop_pairs_dataframe,
            overlay_vertices_loops,
        )

        df = loop_pairs_dataframe(spark, demo.overlay_holes_pairs(flip=flip))
        out = overlay_vertices_loops(df, op)
        return out.select(
            "pair_id",
            F.round("vx", 6).alias("vx"),
            F.round("vy", 6).alias("vy"),
            F.round("vz", 6).alias("vz"),
        )

    return q


def _q_within_distance(spark, sf_dir):
    from s2geometry_d_spark.operators.distance import within_distance_join

    pts = _points(spark, sf_dir)
    out = within_distance_join(pts, WITHIN_QUERIES, WITHIN_RADIUS)
    return out.select("query_id", "point_id")


def _q_within_polyline(spark, sf_dir):
    from s2geometry_d_spark.operators.distance import within_distance_polyline

    pts = _points(spark, sf_dir)
    out = within_distance_polyline(
        pts, demo.POLYLINE_WAYPOINTS, demo.POLYLINE_RADIUS_DEG
    )
    return out.select("point_id")


def _q_group_bounds(spark, sf_dir):
    from s2geometry_d_spark.operators.distance import group_cap_bounds

    pts = _points(spark, sf_dir).withColumn("band", F.floor(F.col("lat") / 10.0))
    b = group_cap_bounds(pts, "band")
    return b.select(
        F.col("band").cast("long").alias("band"),
        F.col("n").alias("n_points"),
        F.round("cx", 6).alias("cx"),
        F.round("cy", 6).alias("cy"),
        F.round("cz", 6).alias("cz"),
        F.round("max_chord2", 6).alias("max_chord2"),
    )


def _q_group_rect_bounds(spark, sf_dir):
    from s2geometry_d_spark.operators.distance import group_rect_bounds

    pts = _points(spark, sf_dir).withColumn(
        "band", F.floor(F.col("lat") / 15.0).cast("long")
    )
    # bin-count sizing rule: the driver collect is bounded by
    # n_groups x n_bins rows regardless of fact size; with 12 bands,
    # 65536 bins keeps that under 1M rows while making per-bin occupancy
    # << 1 at any realistic density — the in-bin refinement pass (an
    # extra full-scan job) then never triggers (round-5: 6.4s -> 1.2s)
    return group_rect_bounds(pts, "band", n_bins=65536)


def _q_text_format_roundtrip(spark, sf_dir):
    """s2text_format as a column pipeline: format every point %.15g
    (appendVertex parity) and re-parse the text — DuckDB's C-style printf
    emits byte-identical strings, so the formatted text itself is part of
    the oracled output, not just the parsed-back doubles."""
    from s2geometry_d_spark.s2core import textformat as tf

    # libm-free placement (pure %, /, *, - : IEEE exact-rounded, so the
    # doubles are BIT-identical across engines): the spherical points table
    # goes through asin/degrees, which differ by 1 ulp between JVM and
    # DuckDB libm on ~0.5% of rows — invisible to the 9-digit float hash,
    # but the 15-digit formatted TEXT is itself the data here.
    pts = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_orderkey").alias("point_id"))
        # the test parquet is one split: without a spread the whole %.15g
        # format+parse pipeline runs as a single task (guide §2.6; job
        # profile: 1-task 1.2 s stage).  No-op at production split counts,
        # and row order is irrelevant to the (sorted) oracle hash.
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn(
            "lat",
            F.expr(
                "(((point_id * 2654435761 + 12345) % 1000003) / 1000003e0) * 180e0 - 90e0"
            ),
        )
        .withColumn(
            "lng",
            F.expr(
                "(((point_id * 2246822519 + 678901) % 1000003) / 1000003e0) * 360e0 - 180e0"
            ),
        )
    )
    out = pts.withColumn(
        "vertex_text", tf.format_latlng_col(F.col("lat"), F.col("lng"))
    ).withColumn("parsed", tf.parse_latlngs_col(F.col("vertex_text")))
    return out.select(
        "point_id",
        "vertex_text",
        F.col("parsed")[0]["lat"].alias("lat_rt"),
        F.col("parsed")[0]["lng"].alias("lng_rt"),
    )


def _q_cell_roundtrip(spark, sf_dir):
    pts = _points(spark, sf_dir)
    back = pts.withColumn("lat2", kernels.cell_to_lat(F.col("cell_id"))).withColumn(
        "lng2", kernels.cell_to_lng(F.col("cell_id"))
    )
    rt = back.withColumn(
        "cell2", kernels.cell_from_latlng(F.col("lat2"), F.col("lng2"))
    )
    return rt.select(
        "point_id",
        kernels.cell_token(F.col("cell_id")).alias("token"),
        (F.col("cell2") == F.col("cell_id")).alias("roundtrip_ok"),
    )


def _q_covering_cells(spark, sf_dir):
    from s2geometry_d_spark.operators.spatial_join import (
        compute_coverings,
        covering_dataframe,
    )

    covs = compute_coverings(demo.all_regions(), max_cells=64)
    df = covering_dataframe(spark, covs)
    return df.select(
        "region_id",
        "cov_level",
        kernels.cell_token(F.col("cov_cell")).alias("cell_token"),
        "is_interior",
    )


def _q_cell_roundtrip_check(spark, sf_dir):
    """The roundtrip identity as a HASH-MATCHED gate: cell -> latlng ->
    cell must reproduce every id; the oracle states the invariant
    (ok = true per point) independent of the engine's cell math."""
    rt = _q_cell_roundtrip(spark, sf_dir)
    return rt.select("point_id", F.col("roundtrip_ok").alias("ok"))


_GRID_STEP = 2  # degrees; 90 x 180 probe lattice


def _q_covering_containment(spark, sf_dir):
    """checkCovering for the REGION coverings (s2testing.d:424-449, the
    same discipline as tile_containment_check): every probe-lattice point a
    region's own SQL predicate selects must fall inside some covering cell
    of that region.  The oracle derives (region_id, n_inside, 0 missed)
    from the predicates alone."""
    from s2geometry_d_spark.operators.spatial_join import compute_coverings

    n_lat, n_lng = 90, 180
    grid = spark.range(0, n_lat * n_lng).select(
        (F.lit(-89.0) + float(_GRID_STEP) * (F.col("id") % n_lat)).alias("lat"),
        (F.lit(-179.0) + float(_GRID_STEP) * F.floor(F.col("id") / n_lat)).alias("lng"),
    )
    grid = grid.withColumn(
        "leaf", kernels.cell_from_latlng(F.col("lat"), F.col("lng"))
    ).persist()

    preds = {rid: demo.cap_predicate_sql(la, ln, r) for rid, la, ln, r in demo.CAPS}
    preds.update(
        {rid: demo.rect_predicate_sql(a, b, c, d) for rid, a, b, c, d in demo.RECTS}
    )
    preds[demo.POLY_SPEC[0]] = demo.poly_predicate_sql()

    covs = {
        rc.region_id: [c for c, _ in rc.cells]
        for rc in compute_coverings(demo.all_regions(), max_cells=64)
    }
    import numpy as np

    out = None
    for rid, pred_sql in preds.items():
        signed = [int(np.int64(np.uint64(c) ^ np.uint64(1 << 63))) for c in covs[rid]]
        arr = "array(" + ",".join(f"{c}L" for c in signed) + ")"
        covered = F.expr(
            f"exists({arr}, c -> leaf >= c - (c & -c) + 1 AND leaf <= c + (c & -c) - 1)"
        )
        agg = (
            grid.filter(F.expr(pred_sql))
            .select(F.when(covered, 0).otherwise(1).alias("miss"))
            .agg(F.count(F.lit(1)).alias("n_inside"), F.sum("miss").alias("n_missed"))
            .select(F.lit(rid).alias("region_id"), "n_inside", "n_missed")
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def _q_cell_partition_stats(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return (
        pts.withColumn("parent5", kernels.parent_signed(F.col("cell_id"), 5))
        .groupBy("parent5")
        .agg(F.count("*").alias("n_points"))
        .select(kernels.cell_token(F.col("parent5")).alias("cell_token"), "n_points")
    )


def _q_cell_area_stats(spark, sf_dir):
    """Area-weighted aggregate: per level-5 ancestor cell, point count,
    exact cell area (steradians) and point density.  Cell-id-dependent ->
    rows-only check; areas pinned by tests/test_cell_areas.py invariants
    (face sum = 4*pi, children sum = parent)."""
    pts = _points(spark, sf_dir)
    return (
        pts.withColumn("parent5", kernels.parent_signed(F.col("cell_id"), 5))
        .groupBy("parent5")
        .agg(F.count("*").alias("n_points"))
        .withColumn("area_sr", F.round(kernels.cell_exact_area(F.col("parent5")), 12))
        .withColumn(
            "density", F.round(F.col("n_points") / F.col("area_sr"), 6)
        )
        .select(
            kernels.cell_token(F.col("parent5")).alias("cell_token"),
            "n_points",
            "area_sr",
            "density",
        )
    )


def _q_tile_assignment(spark, sf_dir):
    imgs = synth_images(spark, sf_dir)
    extents = [0.5 + k / 10.0 for k in range(10)]  # generation rule, known
    assigned = tiling.image_tile_assignment(imgs, known_extents=extents)
    return assigned.select(
        "image_id",
        "tile_x",
        "tile_y",
        "level",
        kernels.cell_token(F.col("cell_id")).alias("cell_token"),
    )


def _q_tile_assignment_stats(spark, sf_dir):
    """Tightness counterpart of tile_containment_check (which proves only
    completeness): per-tile cell count and covered-area/tile-area ratio,
    mirroring the reference's published covering-ratio discipline
    (s2region_coverer.d:102-106).  Pinned by a pytest bound; quiet
    over-assignment regressions become visible here."""
    imgs = synth_images(spark, sf_dir)
    extents = [0.5 + k / 10.0 for k in range(10)]
    stats = tiling.tile_assignment_stats(imgs, known_extents=extents)
    return stats.select(
        "image_id",
        "tile_x",
        "tile_y",
        "n_cells",
        F.round("area_ratio", 4).alias("area_ratio"),
    )


def _q_tile_containment(spark, sf_dir):
    """Independent semantic oracle for the tile assignment (checkCovering
    discipline, s2testing.d:424-449): a 9x9 probe lattice per tile —
    strictly finer than the kernel's own 4x4 samples — must find ZERO probe
    points whose containing cell is not covered by the tile's assigned
    cells.  The oracle states the expected invariant (81 probes, 0 missed
    per tile) from the image-id derivation alone, fully independent of the
    engine's geometry."""
    imgs = synth_images(spark, sf_dir)
    extents = [0.5 + k / 10.0 for k in range(10)]
    return tiling.tile_containment_check(imgs, known_extents=extents)


def _q_image_verify(spark, sf_dir):
    from s2geometry_d_spark.operators.multimodal import verify_images

    return verify_images(synth_images(spark, sf_dir)).select(
        "image_id", "fmt", "psnr_ok", "caption_ok"
    )


def _q_tile_pixel_stats(spark, sf_dir):
    """Raster-side tiling: per-tile decoded-pixel channel means.  The ONLY
    image-DECODE operator with a true hash-matched oracle — the stub codec
    is a pure integer hash, so DuckDB re-derives every pixel from
    (doc_id, y, x, c) arithmetic and aggregates the same means."""
    from s2geometry_d_spark.operators.multimodal import tile_pixel_stats

    out = tile_pixel_stats(synth_images(spark, sf_dir))
    return out.select(
        "image_id",
        "tile_x",
        "tile_y",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


def _q_image_resize_stats(spark, sf_dir):
    """Dataset-prep RESIZE over the binary image column: 2x area-average
    downsample with integer floor semantics, then per-image channel means
    + a positional checksum of the RESIZED payload — the checksum pins
    every output pixel's value AND position, and the stats kernel decodes
    the resized bytes through the normal codec path, closing the artifact
    round-trip.  Oracle re-derives the downsampled pixels from the integer-
    hash codec in SQL (block sum // 4)."""
    from s2geometry_d_spark.operators.multimodal import (
        image_checksum_stats,
        resize_images,
    )

    out = image_checksum_stats(resize_images(synth_images(spark, sf_dir), 2))
    return out.select(
        "image_id",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        "checksum",
    )


def _q_video_frame_sample(spark, sf_dir):
    """VIDEO modality: sample every 3rd frame of each synthetic video as an
    image row (opaque binary container -> per-frame lossless re-encode),
    then per-frame channel means + positional checksum through the normal
    image codec path.  Oracle re-derives every sampled frame's pixels from
    the closed-form frame seed (video_frame_seed) in SQL."""
    from s2geometry_d_spark.operators.multimodal import (
        frame_sample,
        image_checksum_stats,
    )
    from s2geometry_d_spark.sources.images import synth_videos

    frames = frame_sample(synth_videos(spark, sf_dir), every=3)
    out = image_checksum_stats(frames)
    return out.select(
        "image_id",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        "checksum",
    )


def _q_image_features(spark, sf_dir):
    from s2geometry_d_spark.operators.multimodal import image_features

    out = image_features(synth_images(spark, sf_dir))
    return out.select(
        "image_id",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("brightness", 6).alias("brightness"),
    )


def _q_image_dedup(spark, sf_dir):
    """Content-based image dedup over DECODED pixels (quantized tile-mean
    signatures): the corpus is the image table plus renamed copies, so
    every group is a true pixel-content duplicate pair; the oracle
    re-derives signatures from the codec formula end-to-end."""
    from s2geometry_d_spark.operators.multimodal import image_tile_signature

    imgs = synth_images(spark, sf_dir)
    corpus = imgs.unionByName(
        imgs.withColumn("image_id", F.concat(F.lit("dup_"), F.col("image_id")))
    )
    sigs = image_tile_signature(corpus)
    return (
        sigs.groupBy("sig")
        .agg(F.count("*").alias("n_images"), F.min("image_id").alias("min_image_id"))
        .filter(F.col("n_images") > 1)
    )


def _q_phash_neardup(spark, sf_dir):
    """Perceptual-hash near-dup over the image table plus deterministic
    re-encode variants.  sha256-derived phashes are uniform (the raw table
    has no near pairs), so every 50th image gets a copy with <=3 planted
    bit flips — a stand-in for the re-encoded copies a crawler ingests.
    The pair construction is part of the operator definition and the oracle
    states it identically (phash re-derived from sha256 hex end-to-end)."""
    from s2geometry_d_spark.operators.dedup import phash_neardup_pairs

    imgs = synth_images(spark, sf_dir).select("image_id", "phash")
    i = "cast(substring(image_id, 4, 12) as bigint)"
    flips = " ^ ".join(
        f"shiftleft(cast(1 as bigint), cast(({i}) * {m} % 60 as int))"
        for m in (7, 11, 27)
    )
    variants = imgs.filter(F.expr(f"({i}) % 50 = 0")).select(
        F.concat(F.col("image_id"), F.lit("_v")).alias("image_id"),
        F.expr(f"phash ^ {flips}").alias("phash"),
    )
    return phash_neardup_pairs(imgs.unionByName(variants))


def _q_ann_lsh(spark, sf_dir):
    return similarity.cosine_topk_lsh(_embeddings(spark, sf_dir))


def _q_ann_ivf(spark, sf_dir):
    return similarity.cosine_topk_ivf(_embeddings(spark, sf_dir))


def _q_ann_recall_stats(spark, sf_dir):
    """Recall@5 of LSH and IVF vs the brute-force oracle as per-round DATA
    (round-4 ask #10); lower bounds pinned in tests/test_similarity.py."""
    return similarity.ann_recall_stats(_embeddings(spark, sf_dir))


def _q_dedup_embedding(spark, sf_dir):
    """Embedding near-dup over a corpus with injected exact duplicates (the
    raw table has no near-dup pairs at 0.99)."""
    e = _embeddings(spark, sf_dir).select("vec_id", "embedding")
    corpus = e.unionByName(e.withColumn("vec_id", F.col("vec_id") + 1000000))
    return similarity.embedding_near_dup_pairs(corpus, threshold=0.99)


SAMPLE_RATES = {"en": 0.25, "de": 0.5, "fr": 0.75}
MIXTURE_WEIGHTS = {"src0": 2.5, "src1": 0.5, "src2": 0.0, "src3": 1.75}
SHARD_TOKEN_BUDGET = 2000


def _q_sample_stratified(spark, sf_dir):
    """Deterministic per-language Bernoulli sample (training-data
    rebalancing stage); md5-hex-threshold draw identical in both engines."""
    from s2geometry_d_spark.operators import sampling

    return sampling.sample_stratified(_docs(spark, sf_dir), SAMPLE_RATES)


def _q_dataset_mixture(spark, sf_dir):
    """Deterministic per-source mixture weighting (floor(w) copies + one
    more with prob frac(w)); map-only explode."""
    from s2geometry_d_spark.operators import sampling

    return sampling.dataset_mixture(_docs(spark, sf_dir), MIXTURE_WEIGHTS)


def _q_shard_tokens(spark, sf_dir):
    """Fixed-token-budget shard assignment via per-source prefix sums."""
    from s2geometry_d_spark.operators import sampling

    return sampling.shard_by_token_budget(_docs(spark, sf_dir), SHARD_TOKEN_BUDGET)


def _q_snap_polylines(spark, sf_dir):
    """Builder POLYLINE layer over a dirty-polyline table (s2builder.d +
    builder/util/s2polyline_layer.d default options); oracle re-derives the
    E4 snap + consecutive-duplicate collapse on the same vertex literals."""
    from s2geometry_d_spark.operators.overlay import (
        dirty_polylines_dataframe,
        snap_polylines_table,
    )

    df = dirty_polylines_dataframe(spark, demo.snap_fixture_lines())
    return snap_polylines_table(df, exponent=demo.SNAP_EXPONENT)


def _q_assemble_polylines(spark, sf_dir):
    """Builder POLYLINE layer PATH assembly (PolylineType::PATH,
    builder/graph.d:1453-1487): directed edge soup -> maximal polylines
    splitting at non-interior vertices, leftover cycles canonicalized to
    start at their min edge id.  Spark side is pointer-doubling list
    ranking (pure Catalyst joins); the oracle re-derives the semantics
    with a recursive walk over the same edge literals."""
    from s2geometry_d_spark.operators import chains

    df = spark.createDataFrame(
        demo.chain_fixture_edges(), "edge_id long, src long, dst long"
    )
    return chains.assemble_polylines(df)


def _q_event_chains(spark, sf_dir):
    """SCALED PATH assembly over real table data: each user's event
    sequence becomes a directed edge soup (event -> next event by id),
    and the pointer-doubling assembly recovers one ordered chain per
    user.  At sf0.1: ~1500 chains of ~67 edges — ceil(log2 67) = 7
    doubling rounds where min-label propagation would need ~67.  The
    oracle is closed-form (each user IS one chain), so it pins the
    ranking on 100k-row data without recursive SQL."""
    from pyspark.sql import Window

    from s2geometry_d_spark.operators import chains

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    edges = (
        ev.withColumn("nxt", F.lead("event_id").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            F.col("event_id").alias("edge_id"),
            F.col("event_id").alias("src"),
            F.col("nxt").alias("dst"),
        )
    )
    return chains.assemble_polylines(edges)


def _q_audio_chunk_stats(spark, sf_dir):
    """Audio leg of the multimodal triad: synthetic PCM clips (one per
    document, integer-hash samples) -> decode stub -> per-chunk
    mean |amplitude| / peak / zero-crossings via mapInPandas; the oracle
    re-derives every sample value and the window-based crossing count in
    SQL."""
    from s2geometry_d_spark.operators.multimodal import audio_chunk_stats
    from s2geometry_d_spark.sources.audio import synth_audio

    return audio_chunk_stats(synth_audio(spark, sf_dir))


def _q_id_set_lexicon(spark, sf_dir):
    """IdSetLexicon over PIP membership sets (id_set_lexicon.d:32-120 —
    the reference dictionary-encodes per-cell shape-id sets; here the
    per-point containing-region sets of the 1000-hexagon join): points
    sharing a region set share a dense set_id.  Output stringifies the
    set for engine-neutral hashing; region ids are fixed-width so the
    joined-string order equals the array order the lexicon ranks by."""
    from s2geometry_d_spark.operators.lexicon import id_set_lexicon

    # membership pairs via the session-cached unified-index PIP: row-for-row
    # identical to _q_pip_many_poly (shared oracle, both driver-hash-green —
    # CORRECTNESS_r05), but the index-table path probes a persisted artifact
    # (~1.0s steady state) where the driver-object path re-ran a 2.5s
    # broadcast-kernel join and, in a fresh session, a ~20s one-time
    # PolygonCellIndex build for the 1000 hexagons (measured round 6)
    pairs = _q_pip_unified_index(spark, sf_dir)
    enc, _lex = id_set_lexicon(pairs, "point_id", "region_id")
    return enc.select(
        "point_id", F.concat_ws("|", F.col("id_set")).alias("regions"), "set_id"
    )


def _q_assemble_walks(spark, sf_dir):
    """PolylineType::WALK assembly (graph.d:1489-1560 buildWalks): Euler
    walks with excess-degree starts and loop splicing, one applyInPandas
    group per graph_id.  Sequential within a graph by nature, so no SQL
    oracle — semantics are pinned by tests/test_chains.py walk-property
    and splice cases."""
    from s2geometry_d_spark.operators import chains

    edges = [(g, *t) for g in (0, 1) for t in demo.chain_fixture_edges()]
    df = spark.createDataFrame(
        edges, "graph_id int, edge_id long, src long, dst long"
    )
    return chains.assemble_walks_per_graph(df)


def _q_build_polyline_graph(spark, sf_dir):
    """Composed builder pipeline: snap dirty polylines to ONE shared E4
    site set, emit the global directed edge soup, PATH-assemble — chains
    merge across input lines at shared sites and split at junction sites
    (the defining multi-input S2Builder behavior).  Oracle re-derives
    snap + site keys + the recursive walk over the same vertex literals."""
    from s2geometry_d_spark.operators.chains import build_polyline_graph
    from s2geometry_d_spark.operators.overlay import dirty_polylines_dataframe

    df = dirty_polylines_dataframe(spark, demo.graph_fixture_lines())
    # stride 10^6 matches the oracle's edge-id literals (fixture lines
    # are tiny); the operator default is the collision-proof 2^32
    return build_polyline_graph(
        df, exponent=demo.SNAP_EXPONENT, id_stride=1_000_000
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # -- pipeline text/ANN ops FIRST: these four were green in the
        # round-3 driver run but silently absent from CORRECTNESS_r04
        # (driver-side sampling) — early ordering keeps a green row
        # visible every round (round-4 verdict ask #8); they are also
        # cheap, so they cost the sampler nothing
        "token_count": lambda s, d: text.token_count(_docs(s, d)),
        "quality_score": lambda s, d: text.quality_score(_docs(s, d)),
        "fingerprint": lambda s, d: text.fingerprint(_docs(s, d)),
        "ann_cosine_topk": lambda s, d: similarity.cosine_topk_bruteforce(
            _embeddings(s, d)
        ),
        # -- round-6 rotation (round-5 verdict ask #3): these fifteen have
        # never had a row in any driver CORRECTNESS artifact (the driver
        # samples ~50 of 90) — front position gives them their first
        # driver-side green rows; all are green in the committed
        # check_oracles gate, so the rotation changes visibility only
        "ann_recall_stats": _q_ann_recall_stats,
        "assemble_walks": _q_assemble_walks,
        "audio_chunk_stats": _q_audio_chunk_stats,
        "dataset_mixture": _q_dataset_mixture,
        "dedup_clusters": lambda s, d: dedup.dedup_clusters(
            dedup.dedup_minhash_lsh(_docs(s, d))
        ),
        "dedup_keep_best": lambda s, d: dedup.dedup_keep_best(
            _docs(s, d),
            text.quality_score(_docs(s, d)),
            dedup.dedup_minhash_lsh(_docs(s, d)),
        ),
        "event_chains": _q_event_chains,
        "id_set_lexicon": _q_id_set_lexicon,
        "image_resize_stats": _q_image_resize_stats,
        "phash_neardup": _q_phash_neardup,
        "sample_stratified": _q_sample_stratified,
        "shard_by_token_budget": _q_shard_tokens,
        "text_format_roundtrip": _q_text_format_roundtrip,
        "validate_polygons": _q_validate_polygons,
        "video_frame_sample": _q_video_frame_sample,
        # -- spatial joins (SQL-oracled) --------------------------------
        "pip_cap_join": _q_pip_cap,
        "pip_rect_join": _q_pip_rect,
        "pip_poly_join": _q_pip_poly,
        "pip_bigpoly_join": _q_pip_bigpoly,
        "pip_many_poly_join": _q_pip_many_poly,
        "pip_many_poly_table": _q_pip_many_poly_table,
        "pip_unified_index": _q_pip_unified_index,
        "pip_text_index": _q_pip_text_index,
        "pip_incremental_index": _q_pip_incremental_index,
        "index_region_check": _q_index_region_check,
        "index_union_bound_check": _q_index_union_bound_check,
        "spatial_antijoin": _q_spatial_antijoin,
        "knn_join": _q_knn,
        "knn_maxdist": _q_knn_maxdist,
        "knn_maxerror": _q_knn_maxerror,
        "knn_region": _q_knn_region,
        "knn_edges_join": _q_knn_edges,
        "knn_unified_index": _q_knn_unified,
        "knn_edges_maxdist": _q_knn_edges_maxdist,
        "knn_edges_maxerror": _q_knn_edges_maxerror,
        "knn_edge_targets": _q_knn_edge_targets,
        "knn_cell_targets": _q_knn_cell_targets,
        "knn_table_join": _q_knn_table_join,
        "furthest_join": _q_furthest,
        "nearest_polyline_join": _q_nearest_polyline,
        "polyline_within_distance": _q_polyline_within_distance,
        "edge_face_span": _q_edge_face_span,
        "crossing_edges_join": _q_crossing_edges,
        "crossing_unified_index": _q_crossing_unified,
        "crossing_pairs_self": _q_crossing_pairs_self,
        "crossing_pairs_tables": _q_crossing_pairs_tables,
        "polygon_overlay": _q_polygon_overlay_op("intersection"),
        "clip_polylines": _q_clip_polylines,
        "polygon_union_many": _q_polygon_union_many,
        "polygon_relations": _q_polygon_relations,
        "polygon_overlay_union": _q_polygon_overlay_op("union"),
        "polygon_overlay_diff": _q_polygon_overlay_op("difference"),
        "polygon_overlay_symdiff": _q_polygon_overlay_op("symmetric_difference"),
        "polygon_overlay_holes": _q_polygon_overlay_holes("intersection"),
        "polygon_overlay_holes_diff": _q_polygon_overlay_holes("difference", flip=True),
        "polygon_overlay_holes_union": _q_polygon_overlay_holes("union"),
        "polygon_overlay_holes_symdiff": _q_polygon_overlay_holes("symmetric_difference"),
        "snap_polygons": _q_snap_polygons,
        "snap_polylines": _q_snap_polylines,
        "assemble_polylines": _q_assemble_polylines,
        "build_polyline_graph": _q_build_polyline_graph,
        "within_distance_join": _q_within_distance,
        "within_distance_polyline": _q_within_polyline,
        "group_cap_bounds": _q_group_bounds,
        "group_rect_bounds": _q_group_rect_bounds,
        # -- cell-id operators (rows-only; pinned by pytest invariants) --
        "cell_roundtrip": _q_cell_roundtrip,
        "cell_roundtrip_check": _q_cell_roundtrip_check,
        "covering_containment_check": _q_covering_containment,
        "covering_cells": _q_covering_cells,
        "cell_partition_stats": _q_cell_partition_stats,
        "cell_area_stats": _q_cell_area_stats,
        "tile_assignment": _q_tile_assignment,
        "tile_assignment_stats": _q_tile_assignment_stats,
        "tile_containment_check": _q_tile_containment,
        "image_verify": _q_image_verify,
        "image_features": _q_image_features,
        "tile_pixel_stats": _q_tile_pixel_stats,
        "image_dedup": _q_image_dedup,
        "ann_cosine_lsh": _q_ann_lsh,
        "ann_cosine_ivf": _q_ann_ivf,
        "dedup_embedding_cosine": _q_dedup_embedding,
        # -- training-data pipeline ops (SQL-oracled) ---------------------
        # exact dedup over a corpus with injected duplicates (the raw
        # documents table has none, which would test nothing)
        "dedup_exact": lambda s, d: dedup.dedup_exact(
            _docs(s, d).unionByName(
                _docs(s, d).withColumn("doc_id", F.col("doc_id") + 1000000)
            )
        ),
        "dedup_minhash_lsh": lambda s, d: dedup.dedup_minhash_lsh(_docs(s, d)),
        "ngram_jaccard": lambda s, d: dedup.ngram_jaccard_pairs(_docs(s, d)),
        "simhash16": lambda s, d: dedup.simhash16(_docs(s, d)),
        "lang_id": lambda s, d: text.lang_id(_docs(s, d)),
        # token_count / quality_score / fingerprint / ann_cosine_topk are
        # at the TOP of this dict (driver-sampling visibility, ask #8)
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------


def _sample_stratified_sql() -> str:
    from s2geometry_d_spark.operators.sampling import rate_threshold

    cases = " ".join(
        f"WHEN lang = '{s}' THEN '{rate_threshold(r)}'"
        for s, r in sorted(SAMPLE_RATES.items())
    )
    return (
        "SELECT doc_id, lang, source, n_chars FROM documents "
        "WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 8) < "
        f"(CASE {cases} ELSE 'g' END)"
    )


def _dataset_mixture_sql() -> str:
    from s2geometry_d_spark.operators.sampling import rate_threshold

    base = " ".join(
        f"WHEN source = '{s}' THEN {int(w)}"
        for s, w in sorted(MIXTURE_WEIGHTS.items())
    )
    frac = " ".join(
        f"WHEN source = '{s}' THEN '{rate_threshold(w - int(w))}'"
        for s, w in sorted(MIXTURE_WEIGHTS.items())
    )
    return f"""
WITH m AS (
  SELECT doc_id, source,
         (CASE {base} ELSE 1 END)
         + (CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8)
                      < (CASE {frac} ELSE '{rate_threshold(0.0)}' END)
                 THEN 1 ELSE 0 END) AS n_copies
  FROM documents
),
x AS (
  SELECT doc_id, source, unnest(generate_series(1, n_copies)) AS copy
  FROM m WHERE n_copies > 0
)
SELECT doc_id, source, CAST(copy AS BIGINT) AS copy FROM x
"""


def _shard_tokens_sql() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, source, n_tokens,
       CAST(floor((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) / {SHARD_TOKEN_BUDGET}.0) AS BIGINT) AS shard
FROM t
"""


def _pip_cap_sql() -> str:
    parts = [
        f"SELECT '{rid}' AS region_id, point_id FROM points WHERE "
        + demo.cap_predicate_sql(lat, lng, r)
        for rid, lat, lng, r in demo.CAPS
    ]
    return f"WITH points AS ({demo.points_cte()}) " + " UNION ALL ".join(parts)


def _pip_rect_sql() -> str:
    parts = [
        f"SELECT '{rid}' AS region_id, point_id FROM points WHERE "
        + demo.rect_predicate_sql(a, b, c, d)
        for rid, a, b, c, d in demo.RECTS
    ]
    return f"WITH points AS ({demo.points_cte()}) " + " UNION ALL ".join(parts)


def _pip_poly_sql() -> str:
    return (
        f"WITH points AS ({demo.points_cte()}) "
        f"SELECT point_id FROM points WHERE {demo.poly_predicate_sql()}"
    )


def _pip_bigpoly_sql() -> str:
    return f"WITH points AS ({demo.points_cte()}), {demo.bigpoly_predicate_sql()}"


def _index_region_check_sql() -> str:
    """Ground truth from the polygon predicates alone: with conservative
    relation flags, every SQL-matched point is in a may_intersect target
    (n_matched_in_may == n_matched) and no unmatched point is in a
    contains target (0)."""
    return f"""
WITH pip AS ({demo.many_poly_sql()}),
m AS (SELECT count(DISTINCT point_id) AS nm FROM pip WHERE point_id % 10 = 0),
np AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 10 = 0)
SELECT CAST(l.level AS INTEGER) AS level,
       np.n AS n_points,
       m.nm AS n_matched,
       m.nm AS n_matched_in_may,
       CAST(0 AS BIGINT) AS n_unmatched_in_contains
FROM (VALUES (4), (8), (12)) AS l(level), m, np
ORDER BY level
"""


def _index_union_bound_sql() -> str:
    return f"""
WITH pip AS ({demo.many_poly_sql()})
SELECT count(DISTINCT point_id) AS n_matched, CAST(0 AS BIGINT) AS n_outside
FROM pip
"""


def _spatial_antijoin_sql() -> str:
    preds = [demo.cap_predicate_sql(lat, lng, r) for _, lat, lng, r in demo.CAPS]
    preds += [demo.rect_predicate_sql(a, b, c, d) for _, a, b, c, d in demo.RECTS]
    preds.append(demo.poly_predicate_sql())
    anyof = " OR ".join(f"({p})" for p in preds)
    return (
        f"WITH points AS ({demo.points_cte()}) "
        f"SELECT count(*) AS n_outside FROM points WHERE NOT ({anyof})"
    )


def _knn_sql() -> str:
    return f"""
WITH points AS ({demo.points_cte()}),
q AS (SELECT * FROM {demo.knn_queries_values_sql()}),
scored AS (
  SELECT q.query_id, p.point_id,
         (cos(radians(p.lng))*cos(radians(p.lat)) - q.qx)*(cos(radians(p.lng))*cos(radians(p.lat)) - q.qx)
       + (sin(radians(p.lng))*cos(radians(p.lat)) - q.qy)*(sin(radians(p.lng))*cos(radians(p.lat)) - q.qy)
       + (sin(radians(p.lat)) - q.qz)*(sin(radians(p.lat)) - q.qz) AS dist2
  FROM points p CROSS JOIN q
)
SELECT query_id, rank, point_id FROM (
  SELECT query_id, point_id,
         row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, point_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def _knn_maxdist_sql() -> str:
    import math as _math

    from s2geometry_d_spark.s2core.regions import chord2_from_radians

    r2 = chord2_from_radians(_math.radians(1.0))
    return f"""
WITH points AS ({demo.points_cte()}),
q AS (SELECT * FROM {demo.knn_queries_values_sql()}),
scored AS (
  SELECT q.query_id, p.point_id,
         (cos(radians(p.lng))*cos(radians(p.lat)) - q.qx)*(cos(radians(p.lng))*cos(radians(p.lat)) - q.qx)
       + (sin(radians(p.lng))*cos(radians(p.lat)) - q.qy)*(sin(radians(p.lng))*cos(radians(p.lat)) - q.qy)
       + (sin(radians(p.lat)) - q.qz)*(sin(radians(p.lat)) - q.qz) AS dist2
  FROM points p CROSS JOIN q
)
SELECT query_id, rank, point_id FROM (
  SELECT query_id, point_id,
         row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, point_id ASC) AS rank
  FROM scored WHERE dist2 <= {r2!r}
) WHERE rank <= 5
"""


def _knn_region_sql() -> str:
    pred = demo.cap_predicate_sql(demo.CAPS[0][1], demo.CAPS[0][2], demo.CAPS[0][3])
    return f"""
WITH points AS ({demo.points_cte()}),
q AS (SELECT * FROM {demo.knn_queries_values_sql()}),
scored AS (
  SELECT q.query_id, p.point_id,
         (cos(radians(p.lng))*cos(radians(p.lat)) - q.qx)*(cos(radians(p.lng))*cos(radians(p.lat)) - q.qx)
       + (sin(radians(p.lng))*cos(radians(p.lat)) - q.qy)*(sin(radians(p.lng))*cos(radians(p.lat)) - q.qy)
       + (sin(radians(p.lat)) - q.qz)*(sin(radians(p.lat)) - q.qz) AS dist2
  FROM (SELECT * FROM points p WHERE {pred}) p CROSS JOIN q
)
SELECT query_id, rank, point_id FROM (
  SELECT query_id, point_id,
         row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, point_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def _knn_edges_sql() -> str:
    from s2geometry_d_spark.functions import edgedist

    a_cols = ",\n       ".join(edgedist.xyz_exprs("alat", "alng", "a"))
    b_cols = ",\n       ".join(edgedist.xyz_exprs("blat", "blng", "b"))
    inner = (
        f"SELECT query_id, edge_id, qx, qy, qz,\n       {a_cols},\n       {b_cols}\n"
        "FROM e CROSS JOIN q"
    )
    scored = edgedist.dist2_select_sql(inner, "query_id, edge_id")
    return f"""
WITH points AS ({demo.points_cte()}),
edges_all AS (
  SELECT point_id AS edge_id, lat AS alat, lng AS alng,
         lead(lat) OVER ({_EDGE_ORDER}) AS blat,
         lead(lng) OVER ({_EDGE_ORDER}) AS blng
  FROM points
),
e AS (SELECT * FROM edges_all WHERE blat IS NOT NULL),
q AS (SELECT * FROM {demo.knn_queries_values_sql()}),
scored AS ({scored})
SELECT query_id, rank, edge_id FROM (
  SELECT query_id, edge_id,
         row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, edge_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def _knn_edges_maxdist_sql() -> str:
    import math as _math

    from s2geometry_d_spark.functions import edgedist
    from s2geometry_d_spark.s2core.regions import chord2_from_radians

    r2 = chord2_from_radians(_math.radians(1.0))
    a_cols = ",\n       ".join(edgedist.xyz_exprs("alat", "alng", "a"))
    b_cols = ",\n       ".join(edgedist.xyz_exprs("blat", "blng", "b"))
    inner = (
        f"SELECT query_id, edge_id, qx, qy, qz,\n       {a_cols},\n       {b_cols}\n"
        "FROM e CROSS JOIN q"
    )
    scored = edgedist.dist2_select_sql(inner, "query_id, edge_id")
    return f"""
WITH points AS ({demo.points_cte()}),
edges_all AS (
  SELECT point_id AS edge_id, lat AS alat, lng AS alng,
         lead(lat) OVER ({_EDGE_ORDER}) AS blat,
         lead(lng) OVER ({_EDGE_ORDER}) AS blng
  FROM points
),
e AS (SELECT * FROM edges_all WHERE blat IS NOT NULL),
q AS (SELECT * FROM {demo.knn_queries_values_sql()}),
scored AS ({scored})
SELECT query_id, rank, edge_id FROM (
  SELECT query_id, edge_id,
         row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, edge_id ASC) AS rank
  FROM scored WHERE dist2 <= {r2!r}
) WHERE rank <= 5
"""


def _furthest_sql() -> str:
    return f"""
WITH points AS ({demo.points_cte()}),
q AS (SELECT * FROM {demo.knn_queries_values_sql()}),
scored AS (
  SELECT q.query_id, p.point_id,
         (cos(radians(p.lng))*cos(radians(p.lat)) - q.qx)*(cos(radians(p.lng))*cos(radians(p.lat)) - q.qx)
       + (sin(radians(p.lng))*cos(radians(p.lat)) - q.qy)*(sin(radians(p.lng))*cos(radians(p.lat)) - q.qy)
       + (sin(radians(p.lat)) - q.qz)*(sin(radians(p.lat)) - q.qz) AS dist2
  FROM points p CROSS JOIN q
)
SELECT query_id, rank, point_id FROM (
  SELECT query_id, point_id,
         row_number() OVER (PARTITION BY query_id ORDER BY dist2 DESC, point_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def _nearest_polyline_sql(k: int = 3, max_dist_deg: float | None = None) -> str:
    import math as _math

    from s2geometry_d_spark.functions import edgedist
    from s2geometry_d_spark.s2core.regions import chord2_from_radians

    dist_filter = (
        ""
        if max_dist_deg is None
        else f" WHERE dist2 <= {chord2_from_radians(_math.radians(max_dist_deg))!r}"
    )

    a_cols = ",\n       ".join(edgedist.xyz_exprs("alat", "alng", "a"))
    b_cols = ",\n       ".join(edgedist.xyz_exprs("blat", "blng", "b"))
    inner = (
        f"SELECT query_id, polyline_id, qx, qy, qz,\n       {a_cols},\n       {b_cols}\n"
        "FROM pe CROSS JOIN q"
    )
    scored = edgedist.dist2_select_sql(inner, "query_id, polyline_id")
    return f"""
WITH points AS ({demo.points_cte()}),
edges_all AS (
  SELECT point_id AS edge_id, lat AS alat, lng AS alng,
         lead(lat) OVER ({_EDGE_ORDER}) AS blat,
         lead(lng) OVER ({_EDGE_ORDER}) AS blng
  FROM points
),
e AS (SELECT * FROM edges_all WHERE blat IS NOT NULL),
pe AS (
  SELECT *, CAST(floor((row_number() OVER (ORDER BY floor(alat), alng, edge_id) - 1)
                 / {_POLYLINE_CHAIN}) AS BIGINT) AS polyline_id
  FROM e
),
q AS (SELECT * FROM {demo.knn_queries_values_sql()}),
scored AS ({scored}),
agg AS (
  SELECT query_id, polyline_id, min(dist2) AS dist2
  FROM scored GROUP BY query_id, polyline_id
)
SELECT query_id, rank, polyline_id, round(dist2, 9) AS dist2 FROM (
  SELECT query_id, polyline_id, dist2,
         row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, polyline_id ASC) AS rank
  FROM agg{dist_filter}
) WHERE rank <= {k}
"""


def _clip_polylines_sql() -> str:
    """Clipped-vertex multiset re-derived independently: interior polyline
    vertices by the convex det conjunction, boundary crossings by det
    products + the closed-form intersection point (same expression order as
    s2core.boolean.edge_intersection)."""
    from s2geometry_d_spark.functions import edgedist

    _, poly = demo.poly_region()
    v = poly.loops[0].vertices
    n = len(v)

    def lit(x):
        return format(x, ".17e")

    # interior test: conjunction of per-edge normal dots (normals as python
    # literals — independent of the kernel's parity containment)
    conds = []
    pedge_rows = []
    for i in range(n):
        c, d = v[i], v[(i + 1) % n]
        nx = c[1] * d[2] - c[2] * d[1]
        ny = c[2] * d[0] - c[0] * d[2]
        nz = c[0] * d[1] - c[1] * d[0]
        conds.append(f"({lit(nx)}*x + {lit(ny)}*y + {lit(nz)}*z > 0)")
        pedge_rows.append(
            f"({', '.join(lit(t) for t in (*c, *d, nx, ny, nz))})"
        )
    inside = " AND ".join(conds)
    pedges = ", ".join(pedge_rows)

    a_cols = ",\n       ".join(edgedist.xyz_exprs("alat", "alng", "a"))
    b_cols = ",\n       ".join(edgedist.xyz_exprs("blat", "blng", "b"))
    return f"""
WITH points AS ({demo.points_cte()}),
edges_all AS (
  SELECT point_id AS edge_id, lat AS alat, lng AS alng,
         lead(lat) OVER ({_EDGE_ORDER}) AS blat,
         lead(lng) OVER ({_EDGE_ORDER}) AS blng
  FROM points
),
e AS (SELECT * FROM edges_all WHERE blat IS NOT NULL),
pe AS (
  SELECT *, row_number() OVER (ORDER BY floor(alat), alng, edge_id) AS rn
  FROM e
),
exyz AS (
  SELECT CAST(floor((rn - 1) / {_POLYLINE_CHAIN}) AS BIGINT) AS polyline_id,
         rn, {a_cols}, {b_cols}
  FROM pe
),
pverts AS (
  SELECT polyline_id, ax AS x, ay AS y, az AS z FROM exyz
  UNION ALL
  SELECT polyline_id, bx, by, bz FROM exyz e1
  WHERE rn = (SELECT max(rn) FROM exyz e2 WHERE e2.polyline_id = e1.polyline_id)
),
inside AS (SELECT polyline_id, x, y, z FROM pverts WHERE {inside}),
pedge(ex, ey, ez, fx, fy, fz, mx, my, mz) AS (VALUES {pedges}),
cand AS (
  SELECT polyline_id, ax, ay, az, bx, by, bz,
         ay*bz - az*by AS n1x, az*bx - ax*bz AS n1y, ax*by - ay*bx AS n1z,
         ex, ey, ez, fx, fy, fz, mx, my, mz
  FROM exyz CROSS JOIN pedge
),
xpt AS (
  SELECT polyline_id,
         n1y*mz - n1z*my AS xx, n1z*mx - n1x*mz AS xy, n1x*my - n1y*mx AS xz,
         ax, ay, az, bx, by, bz
  FROM cand
  WHERE (n1x*ex + n1y*ey + n1z*ez)*(n1x*fx + n1y*fy + n1z*fz) < 0
    AND (n1x*ex + n1y*ey + n1z*ez)*(mx*ax + my*ay + mz*az) < 0
    AND (n1x*ex + n1y*ey + n1z*ez)*(mx*bx + my*by + mz*bz) > 0
),
xsigned AS (
  SELECT polyline_id,
         CASE WHEN xx*(ax+bx) + xy*(ay+by) + xz*(az+bz) < 0 THEN -xx ELSE xx END AS sx,
         CASE WHEN xx*(ax+bx) + xy*(ay+by) + xz*(az+bz) < 0 THEN -xy ELSE xy END AS sy,
         CASE WHEN xx*(ax+bx) + xy*(ay+by) + xz*(az+bz) < 0 THEN -xz ELSE xz END AS sz
  FROM xpt
),
allv AS (
  SELECT polyline_id, x, y, z FROM inside
  UNION ALL
  SELECT polyline_id, sx / sqrt(sx*sx + sy*sy + sz*sz),
         sy / sqrt(sx*sx + sy*sy + sz*sz),
         sz / sqrt(sx*sx + sy*sy + sz*sz)
  FROM xsigned
)
SELECT polyline_id, round(x, 6) AS vx, round(y, 6) AS vy, round(z, 6) AS vz FROM allv
"""


def _knn_edge_targets_sql() -> str:
    from s2geometry_d_spark.functions import edgedist, edgepair
    from s2geometry_d_spark.s2core.regions import latlng_point

    a_cols = ",\n       ".join(edgedist.xyz_exprs("alat", "alng", "a"))
    b_cols = ",\n       ".join(edgedist.xyz_exprs("blat", "blng", "b"))
    rows = []
    for tid, (la, ln), (lb, lnb) in _crossing_targets():
        c = latlng_point(la, ln)
        d = latlng_point(lb, lnb)
        lits = ", ".join(format(v, ".17e") for v in (*c, *d))
        rows.append(f"('{tid}', {lits})")
    targets = ", ".join(rows)
    inner = (
        f"SELECT query_id, edge_id, cx, cy, cz, dx, dy, dz,\n"
        f"       {a_cols},\n       {b_cols}\n"
        "FROM e CROSS JOIN q"
    )
    scored = edgepair.pair_dist2_select_sql(inner, "query_id, edge_id")
    return f"""
WITH points AS ({demo.points_cte()}),
edges_all AS (
  SELECT point_id AS edge_id, lat AS alat, lng AS alng,
         lead(lat) OVER ({_EDGE_ORDER}) AS blat,
         lead(lng) OVER ({_EDGE_ORDER}) AS blng
  FROM points
),
e AS (SELECT * FROM edges_all WHERE blat IS NOT NULL),
q AS (SELECT * FROM (VALUES {targets}) AS q(query_id, cx, cy, cz, dx, dy, dz)),
scored AS ({scored})
SELECT query_id, rank, edge_id FROM (
  SELECT query_id, edge_id,
         row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, edge_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def _knn_table_join_sql() -> str:
    from s2geometry_d_spark.functions import edgedist, edgepair

    a_cols = ",\n       ".join(edgedist.xyz_exprs("alat", "alng", "a"))
    c_cols = ",\n       ".join(edgedist.xyz_exprs("qalat", "qalng", "c"))
    d_cols = ",\n       ".join(edgedist.xyz_exprs("qblat", "qblng", "d"))
    b_cols = ",\n       ".join(edgedist.xyz_exprs("blat", "blng", "b"))
    inner = (
        f"SELECT qe.query_id, e.edge_id,\n"
        f"       {a_cols},\n       {b_cols},\n       {c_cols},\n       {d_cols}\n"
        "FROM e CROSS JOIN qe"
    )
    scored = edgepair.pair_dist2_select_sql(inner, "query_id, edge_id")
    return f"""
WITH points AS ({demo.points_cte()}),
edges_all AS (
  SELECT point_id AS edge_id, lat AS alat, lng AS alng,
         lead(lat) OVER ({_EDGE_ORDER}) AS blat,
         lead(lng) OVER ({_EDGE_ORDER}) AS blng
  FROM points
),
e AS (SELECT * FROM edges_all WHERE blat IS NOT NULL),
qe AS (SELECT edge_id AS query_id, alat AS qalat, alng AS qalng,
              blat AS qblat, blng AS qblng
       FROM e WHERE edge_id % 300 = 0),
scored AS ({scored})
SELECT query_id, rank, edge_id FROM (
  SELECT query_id, edge_id,
         row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, edge_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def _knn_cell_targets_sql() -> str:
    from s2geometry_d_spark.functions import edgedist, edgepair
    from s2geometry_d_spark.s2core.regions import Cell

    a_cols = ",\n       ".join(edgedist.xyz_exprs("alat", "alng", "a"))
    b_cols = ",\n       ".join(edgedist.xyz_exprs("blat", "blng", "b"))
    vn_cols = [f"v{k}{ax}" for k in range(4) for ax in ("x", "y", "z")] + [
        f"n{k}{ax}" for k in range(4) for ax in ("x", "y", "z")
    ]
    rows = []
    for tid, cid in _cell_targets():
        cell = Cell(cid)
        vals = [c for k in range(4) for c in cell.get_vertex(k)] + [
            c for k in range(4) for c in cell.get_edge_raw(k)
        ]
        lits = ", ".join(format(v, ".17e") for v in vals)
        rows.append(f"('{tid}', {lits})")
    targets = ", ".join(rows)
    inner = (
        f"SELECT query_id, edge_id, {', '.join(vn_cols)},\n"
        f"       {a_cols},\n       {b_cols}\n"
        "FROM e CROSS JOIN q"
    )
    scored = edgepair.cell_dist2_select_sql(inner, "query_id, edge_id")
    return f"""
WITH points AS ({demo.points_cte()}),
edges_all AS (
  SELECT point_id AS edge_id, lat AS alat, lng AS alng,
         lead(lat) OVER ({_EDGE_ORDER}) AS blat,
         lead(lng) OVER ({_EDGE_ORDER}) AS blng
  FROM points
),
e AS (SELECT * FROM edges_all WHERE blat IS NOT NULL),
q AS (SELECT * FROM (VALUES {targets}) AS q(query_id, {', '.join(vn_cols)})),
scored AS ({scored})
SELECT query_id, rank, edge_id FROM (
  SELECT query_id, edge_id,
         row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, edge_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def _face_case_sql(x: str, y: str, z: str) -> str:
    """largestAbsComponent face id (s2coords.d xyzToFaceUV semantics) as a
    closed-form CASE over endpoint xyz."""
    return f"""CASE WHEN abs({x}) > abs({y}) THEN
       CASE WHEN abs({x}) > abs({z}) THEN CASE WHEN {x} < 0 THEN 3 ELSE 0 END
            ELSE CASE WHEN {z} < 0 THEN 5 ELSE 2 END END
     ELSE CASE WHEN abs({y}) > abs({z}) THEN CASE WHEN {y} < 0 THEN 4 ELSE 1 END
          ELSE CASE WHEN {z} < 0 THEN 5 ELSE 2 END END END"""


def _edge_face_span_sql() -> str:
    from s2geometry_d_spark.functions import edgedist

    a_cols = ",\n       ".join(edgedist.xyz_exprs("alat", "alng", "a"))
    b_cols = ",\n       ".join(edgedist.xyz_exprs("blat", "blng", "b"))
    return f"""
WITH points AS ({demo.points_cte()}),
edges_all AS (
  SELECT point_id AS edge_id, lat AS alat, lng AS alng,
         lead(lat) OVER ({_EDGE_ORDER}) AS blat,
         lead(lng) OVER ({_EDGE_ORDER}) AS blng
  FROM points
),
e AS (SELECT * FROM edges_all WHERE blat IS NOT NULL),
exyz AS (
  SELECT edge_id,
       {a_cols},
       {b_cols}
  FROM e
)
SELECT edge_id,
       CAST({_face_case_sql("ax", "ay", "az")} AS INTEGER) AS first_face,
       CAST({_face_case_sql("bx", "by", "bz")} AS INTEGER) AS last_face
FROM exyz
"""


def _crossing_edges_sql() -> str:
    """Proper great-circle segment crossing in det-product form: with
    s1=det(A,B,C), s2=det(A,B,D), s3=det(C,D,A), s4=det(C,D,B), crossing
    iff s1*s2 < 0 AND s2*s3 > 0 AND s3*s4 < 0 (all four orientation signs
    equal and nonzero — the same condition crossingSign evaluates; exact
    only in generic position, which random fixtures are)."""
    from s2geometry_d_spark.functions import edgedist
    from s2geometry_d_spark.s2core.regions import latlng_point

    a_cols = ",\n       ".join(edgedist.xyz_exprs("alat", "alng", "a"))
    b_cols = ",\n       ".join(edgedist.xyz_exprs("blat", "blng", "b"))

    def det_sql(c):
        # det(A, B, c) with A=(ax..), B=(bx..) columns and c literal
        return (
            f"((ay*bz - az*by)*({c[0]!r}) + (az*bx - ax*bz)*({c[1]!r})"
            f" + (ax*by - ay*bx)*({c[2]!r}))"
        )

    def det_cd_sql(c, d, px, py, pz):
        # det(c, d, P) with c,d literals and P a column triple
        nx = c[1] * d[2] - c[2] * d[1]
        ny = c[2] * d[0] - c[0] * d[2]
        nz = c[0] * d[1] - c[1] * d[0]
        return f"(({nx!r})*{px} + ({ny!r})*{py} + ({nz!r})*{pz})"

    pieces = []
    for tid, (la, ln), (lb, lnb) in _crossing_targets():
        c = latlng_point(la, ln)
        d = latlng_point(lb, lnb)
        s1 = det_sql(c)
        s2 = det_sql(d)
        s3 = det_cd_sql(c, d, "ax", "ay", "az")
        s4 = det_cd_sql(c, d, "bx", "by", "bz")
        pieces.append(
            f"SELECT '{tid}' AS target_id, edge_id FROM exyz WHERE "
            f"({s1})*({s2}) < 0 AND ({s2})*({s3}) > 0 AND ({s3})*({s4}) < 0"
        )
    union = "\nUNION ALL\n".join(pieces)
    return f"""
WITH points AS ({demo.points_cte()}),
edges_all AS (
  SELECT point_id AS edge_id, lat AS alat, lng AS alng,
         lead(lat) OVER ({_EDGE_ORDER}) AS blat,
         lead(lng) OVER ({_EDGE_ORDER}) AS blng
  FROM points
),
e AS (SELECT * FROM edges_all WHERE blat IS NOT NULL),
exyz AS (SELECT edge_id, {a_cols}, {b_cols} FROM e)
{union}
"""


def _crossing_pairs_self_sql() -> str:
    """Self-pair proper crossings over the edge_id % 7 subset, det-product
    form with BOTH edges as columns (n_a = A x B per edge computed once):
    s1 = n_a.C, s2 = n_a.D, s3 = n_b.A, s4 = n_b.B; crossing iff
    s1*s2 < 0 AND s2*s3 > 0 AND s3*s4 < 0 — the same four-orientation
    condition crossingSign evaluates, exact in generic position.  The pair
    join is explicit here (oracle-only, ~2.1k-edge subset at sf0.01); the
    engine never forms it."""
    from s2geometry_d_spark.functions import edgedist

    a_cols = ",\n       ".join(edgedist.xyz_exprs("alat", "alng", "a"))
    b_cols = ",\n       ".join(edgedist.xyz_exprs("blat", "blng", "b"))
    s1 = "(a.nx*b.ax + a.ny*b.ay + a.nz*b.az)"
    s2 = "(a.nx*b.bx + a.ny*b.by + a.nz*b.bz)"
    s3 = "(b.nx*a.ax + b.ny*a.ay + b.nz*a.az)"
    s4 = "(b.nx*a.bx + b.ny*a.by + b.nz*a.bz)"
    return f"""
WITH points AS ({demo.points_cte()}),
-- jittered chords, every {_SELF_PAIRS_MOD}rd point: see _chord_edges
-- (closed-form +-2deg endpoints => short local edges, dense crossings)
e AS (
  SELECT point_id AS edge_id, lat AS alat, lng AS alng,
         greatest(-89.95e0, least(89.95e0, lat + {_SELF_JLAT})) AS blat,
         lng + {_SELF_JLNG} AS blng
  FROM points
  WHERE point_id % {_SELF_PAIRS_MOD} = 0
),
exyz AS (SELECT edge_id, {a_cols}, {b_cols} FROM e),
cr AS (
  SELECT edge_id, ax, ay, az, bx, by, bz,
         ay*bz - az*by AS nx, az*bx - ax*bz AS ny, ax*by - ay*bx AS nz
  FROM exyz
)
SELECT a.edge_id AS id_a, b.edge_id AS id_b
FROM cr a JOIN cr b ON a.edge_id < b.edge_id
WHERE {s1}*{s2} < 0 AND {s2}*{s3} > 0 AND {s3}*{s4} < 0
  -- shared-vertex pairs are NOT proper crossings (crossingSign == 0); the
  -- real s-values are exactly 0 there but float residuals (~1e-17) have
  -- arbitrary sign, so exclude them the way the engine kernel does
  AND NOT (a.ax = b.ax AND a.ay = b.ay AND a.az = b.az)
  AND NOT (a.ax = b.bx AND a.ay = b.by AND a.az = b.bz)
  AND NOT (a.bx = b.ax AND a.by = b.ay AND a.bz = b.az)
  AND NOT (a.bx = b.bx AND a.by = b.by AND a.bz = b.bz)
"""


def _crossing_pairs_tables_sql() -> str:
    """Cross-TABLE proper crossings between the two disjoint jittered chord
    tables, same det-product form as _crossing_pairs_self_sql (no
    shared-vertex clause needed: the point subsets are disjoint)."""
    from s2geometry_d_spark.functions import edgedist

    a_cols = ",\n       ".join(edgedist.xyz_exprs("alat", "alng", "a"))
    b_cols = ",\n       ".join(edgedist.xyz_exprs("blat", "blng", "b"))
    s1 = "(a.nx*b.ax + a.ny*b.ay + a.nz*b.az)"
    s2 = "(a.nx*b.bx + a.ny*b.by + a.nz*b.bz)"
    s3 = "(b.nx*a.ax + b.ny*a.ay + b.nz*a.az)"
    s4 = "(b.nx*a.bx + b.ny*a.by + b.nz*a.bz)"
    return f"""
WITH points AS ({demo.points_cte()}),
ea AS (
  SELECT point_id AS edge_id, lat AS alat, lng AS alng,
         greatest(-89.95e0, least(89.95e0, lat + {_SELF_JLAT})) AS blat,
         lng + {_SELF_JLNG} AS blng
  FROM points
  WHERE point_id % {_SELF_PAIRS_MOD} = 0
),
eb AS (
  SELECT point_id AS edge_id, lat AS alat, lng AS alng,
         greatest(-89.95e0, least(89.95e0, lat + {_SELF_JLAT2})) AS blat,
         lng + {_SELF_JLNG2} AS blng
  FROM points
  WHERE point_id % {_SELF_PAIRS_MOD} = 1
),
cra AS (
  SELECT edge_id, ax, ay, az, bx, by, bz,
         ay*bz - az*by AS nx, az*bx - ax*bz AS ny, ax*by - ay*bx AS nz
  FROM (SELECT edge_id, {a_cols}, {b_cols} FROM ea)
),
crb AS (
  SELECT edge_id, ax, ay, az, bx, by, bz,
         ay*bz - az*by AS nx, az*bx - ax*bz AS ny, ax*by - ay*bx AS nz
  FROM (SELECT edge_id, {a_cols}, {b_cols} FROM eb)
)
SELECT a.edge_id AS id_a, b.edge_id AS id_b
FROM cra a JOIN crb b
  ON {s1}*{s2} < 0 AND {s2}*{s3} > 0 AND {s3}*{s4} < 0
"""


_SHINGLES_CTE = (
    "shingles AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 8) AS sh "
    "FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(1, length(text) - 7))) AS i "
    "FROM documents))"
)


def _minhash_ctes() -> str:
    """Shared CTE chain: shingles -> banded minima (b x r) -> capped buckets
    -> candidate pairs; definitions identical to dedup.dedup_minhash_lsh."""
    b, r, cap = dedup.LSH_BANDS, dedup.LSH_ROWS, dedup.BUCKET_CAP
    bands_values = ",".join(f"({i})" for i in range(b))
    mins = ", ".join(
        f"min(md5(sh || '#' || CAST(band*{r}+{j} AS VARCHAR))) AS m{j}" for j in range(r)
    )
    concat = " || ".join(f"m{j}" for j in range(r))
    return f"""{_SHINGLES_CTE},
mins AS (
  SELECT doc_id, band, {mins}
  FROM shingles CROSS JOIN (VALUES {bands_values}) AS bb(band)
  GROUP BY doc_id, band
),
sig AS (SELECT doc_id, band, {concat} AS sig FROM mins),
ok AS (SELECT band, sig FROM sig GROUP BY band, sig
       HAVING count(*) <= {cap} AND count(*) > 1),
capped AS (SELECT sig.doc_id, sig.band, sig.sig FROM sig JOIN ok USING (band, sig)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)"""


def _minhash_sql() -> str:
    return f"WITH {_minhash_ctes()} SELECT doc_a, doc_b FROM cand"


def _dedup_clusters_sql() -> str:
    """Connected components of the SAME candidate-pair graph, re-derived
    independently: a recursive min-label walk (every node's cluster_id is
    the smallest doc id it can reach) — DuckDB's UNION-dedup recursion
    terminates because the reachable-label sets are finite."""
    return f"""
WITH RECURSIVE {_minhash_ctes()},
nodes AS (
  SELECT DISTINCT doc FROM (
    SELECT doc_a AS doc FROM cand UNION ALL SELECT doc_b FROM cand
  )
),
ed AS (
  SELECT doc_a AS u, doc_b AS v FROM cand
  UNION ALL
  SELECT doc_b, doc_a FROM cand
),
walk(doc, lbl) AS (
  SELECT doc, doc AS lbl FROM nodes
  UNION
  SELECT ed.u, w.lbl FROM walk w JOIN ed ON ed.v = w.doc
)
SELECT doc AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY doc
"""


def _dedup_keep_best_sql() -> str:
    """Composition of the cluster walk and the quality score on the same
    literals: per cluster keep the highest-score doc (ties -> lowest id);
    unclustered docs represent themselves."""
    return f"""
WITH RECURSIVE {_minhash_ctes()},
nodes AS (
  SELECT DISTINCT doc FROM (
    SELECT doc_a AS doc FROM cand UNION ALL SELECT doc_b FROM cand
  )
),
ed AS (
  SELECT doc_a AS u, doc_b AS v FROM cand
  UNION ALL
  SELECT doc_b, doc_a FROM cand
),
walk(doc, lbl) AS (
  SELECT doc, doc AS lbl FROM nodes
  UNION
  SELECT ed.u, w.lbl FROM walk w JOIN ed ON ed.v = w.doc
),
comp AS (SELECT doc AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY doc),
m AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) AS n_spaces
  FROM documents
),
q AS (
  SELECT doc_id,
         round(least(1e0, n_tokens / 100e0)
               * (1e0 - abs((n_chars - n_spaces) / n_tokens - 5e0) / 10e0), 6) AS score
  FROM m
),
cl AS (
  SELECT q.doc_id, coalesce(comp.cluster_id, q.doc_id) AS cluster_id, q.score
  FROM q LEFT JOIN comp ON q.doc_id = comp.doc_id
),
r AS (
  SELECT doc_id, cluster_id, score,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY score DESC, doc_id) AS rn
  FROM cl
)
SELECT doc_id, cluster_id, score FROM r WHERE rn = 1
"""


def _jaccard_sql() -> str:
    return f"""
WITH {_minhash_ctes()},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jac
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5
"""


def _simhash_sql() -> str:
    sums = ",\n  ".join(
        "SUM(CASE WHEN substr(h, {p}, 1) IN ('8','9','a','b','c','d','e','f') "
        "THEN 1 ELSE -1 END) AS s{b}".format(p=b + 1, b=b)
        for b in range(16)
    )
    bits = " + ".join(
        f"(CASE WHEN s{b} >= 0 THEN {1 << b} ELSE 0 END)" for b in range(16)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
h AS (SELECT doc_id, md5(tok) AS h FROM toks),
s AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id)
SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM s
"""


def _langid_sql() -> str:
    def cnt(markers):
        return " + ".join(
            f"(length(t) - length(replace(t, '{m}', ''))) / {len(m)}" for m in markers
        )

    return f"""
WITH padded AS (SELECT doc_id, ' ' || text || ' ' AS t FROM documents),
s AS (SELECT doc_id,
  {cnt(text.LANG_MARKERS['de'])} AS s_de,
  {cnt(text.LANG_MARKERS['en'])} AS s_en,
  {cnt(text.LANG_MARKERS['es'])} AS s_es,
  {cnt(text.LANG_MARKERS['fr'])} AS s_fr
 FROM padded)
SELECT doc_id, CASE
  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
  WHEN s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
  WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
  WHEN s_fr > 0 THEN 'fr'
  ELSE 'und' END AS pred_lang
FROM s
"""


def _quality_sql() -> str:
    return """
WITH m AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) AS n_spaces
  FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round((n_chars - n_spaces) / n_tokens, 6) AS avg_token_len,
       round(n_spaces / n_chars, 6) AS space_ratio,
       round(least(1e0, n_tokens / 100e0)
             * (1e0 - abs((n_chars - n_spaces) / n_tokens - 5e0) / 10e0), 6) AS score
FROM m
"""


def _dedup_embedding_sql() -> str:
    return """
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]) FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.99
"""


def _ann_sql() -> str:
    return """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 8
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.qv, q.qv))), 6) AS sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, rank, neighbor_id, sim FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def _within_distance_sql() -> str:
    import math as _math

    from s2geometry_d_spark.s2core.regions import chord2_from_radians

    r2 = chord2_from_radians(_math.radians(WITHIN_RADIUS))
    rows = []
    for qid, lat, lng in WITHIN_QUERIES:
        la, ln = _math.radians(lat), _math.radians(lng)
        rows.append(
            f"('{qid}', {_math.cos(ln) * _math.cos(la)!r}, "
            f"{_math.sin(ln) * _math.cos(la)!r}, {_math.sin(la)!r})"
        )
    values = ", ".join(rows)
    return f"""
WITH points AS ({demo.points_cte()}),
q AS (SELECT * FROM (VALUES {values}) AS q(query_id, qx, qy, qz))
SELECT q.query_id, p.point_id
FROM points p CROSS JOIN q
WHERE (cos(radians(p.lng))*cos(radians(p.lat)) - q.qx)*(cos(radians(p.lng))*cos(radians(p.lat)) - q.qx)
    + (sin(radians(p.lng))*cos(radians(p.lat)) - q.qy)*(sin(radians(p.lng))*cos(radians(p.lat)) - q.qy)
    + (sin(radians(p.lat)) - q.qz)*(sin(radians(p.lat)) - q.qz) <= {r2!r}
"""


def _within_polyline_sql() -> str:
    import math as _math

    from s2geometry_d_spark.functions import edgedist
    from s2geometry_d_spark.s2core.regions import chord2_from_radians

    r2 = chord2_from_radians(_math.radians(demo.POLYLINE_RADIUS_DEG))
    q_cols = ",\n       ".join(edgedist.xyz_exprs("p.lat", "p.lng", "q"))
    a_cols = ",\n       ".join(edgedist.xyz_exprs("alat", "alng", "a"))
    b_cols = ",\n       ".join(edgedist.xyz_exprs("blat", "blng", "b"))
    inner = (
        f"SELECT p.point_id, {q_cols},\n       {a_cols},\n       {b_cols}\n"
        f"FROM points p CROSS JOIN {demo.polyline_edges_values_sql()}"
    )
    scored = edgedist.dist2_select_sql(inner, "point_id")
    return f"""
WITH points AS ({demo.points_cte()}),
scored AS ({scored})
SELECT DISTINCT point_id FROM scored WHERE dist2 <= {r2!r}
"""


def _group_rect_bounds_sql() -> str:
    return f"""
WITH points AS ({demo.points_cte()}),
x AS (SELECT CAST(floor(lat / 15e0) AS BIGINT) AS band, lat, lng FROM points),
s AS (
  SELECT band, lat, lng,
         lead(lng) OVER (PARTITION BY band ORDER BY lng ASC, lat ASC) AS nxt,
         min(lng) OVER (PARTITION BY band) AS mn
  FROM x
),
g AS (
  SELECT band, lat, lng,
         coalesce(nxt, mn + 360e0) - lng AS gap,
         coalesce(nxt, mn) AS b
  FROM s
),
best AS (
  SELECT band, b, lng,
         row_number() OVER (PARTITION BY band ORDER BY gap DESC, lng ASC) AS rn
  FROM g
),
lats AS (
  SELECT band, count(*) AS n_points,
         round(min(lat), 6) AS lat_lo, round(max(lat), 6) AS lat_hi
  FROM x GROUP BY band
)
SELECT l.band, l.n_points, l.lat_lo, l.lat_hi,
       round(best.b, 6) AS lng_lo, round(best.lng, 6) AS lng_hi
FROM lats l JOIN best ON best.band = l.band AND best.rn = 1
"""


def _group_bounds_sql() -> str:
    return f"""
WITH points AS ({demo.points_cte()}),
xyz AS (
  SELECT CAST(floor(lat / 10e0) AS BIGINT) AS band,
         cos(radians(lng))*cos(radians(lat)) AS px,
         sin(radians(lng))*cos(radians(lat)) AS py,
         sin(radians(lat)) AS pz
  FROM points
),
sums AS (
  SELECT band, count(*) AS n_points, sum(px) AS sx, sum(py) AS sy, sum(pz) AS sz
  FROM xyz GROUP BY band
),
cent AS (
  SELECT band, n_points,
         sx / sqrt(sx*sx + sy*sy + sz*sz) AS cx,
         sy / sqrt(sx*sx + sy*sy + sz*sz) AS cy,
         sz / sqrt(sx*sx + sy*sy + sz*sz) AS cz
  FROM sums
)
SELECT c.band, c.n_points,
       round(c.cx, 6) AS cx, round(c.cy, 6) AS cy, round(c.cz, 6) AS cz,
       round(max((x.px-c.cx)*(x.px-c.cx) + (x.py-c.cy)*(x.py-c.cy) + (x.pz-c.cz)*(x.pz-c.cz)), 6) AS max_chord2
FROM xyz x JOIN cent c USING (band)
GROUP BY c.band, c.n_points, c.cx, c.cy, c.cz
"""


def _tile_containment_sql() -> str:
    """The completeness invariant stated independently of the engine: every
    (image, tile) must report 81 probes and 0 misses; image ids derive from
    doc ids by construction (sources/images.py)."""
    return """
SELECT 'img' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS image_id,
       tx.tile_x, ty.tile_y,
       CAST(81 AS BIGINT) AS n_probes, CAST(0 AS BIGINT) AS n_missed
FROM documents
CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS tile_x) tx
CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS tile_y) ty
"""


def _tile_pixels_sql() -> str:
    """Exact re-derivation of the stub codec's pixels (sources/images.py
    fake_pixels: uint32 hash of (seed, y, x, c); jpeg payloads 6-bit
    quantized) and their per-tile channel means — decoded-pixel
    verification as a hash-matched gate."""
    m32 = 4294967296
    # HUGEINT for the second multiply: (x % 2^32) * 2246822519 overflows INT64
    pix = (
        f"CAST(((CAST((doc_id * 2654435761 + y * 7919 + x * 104729 + c * 1299709) % {m32} AS HUGEINT)"
        f" * 2246822519) % {m32}) AS BIGINT) // 65536 % 256"
    )
    return f"""
WITH imgs AS (
  SELECT doc_id, 'img' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS image_id
  FROM documents
),
coords AS (
  SELECT yy.y, xx.x, cc.c
  FROM (SELECT unnest(generate_series(0, 63)) AS y) yy
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS x) xx
  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS c) cc
),
px AS (
  SELECT image_id,
         CAST(x // 16 AS INTEGER) AS tile_x,
         CAST(y // 16 AS INTEGER) AS tile_y,
         c,
         CASE WHEN doc_id % 2 = 1 THEN ({pix}) // 4 * 4 ELSE {pix} END AS p
  FROM imgs CROSS JOIN coords
)
SELECT image_id, tile_x, tile_y,
       round(sum(CASE WHEN c = 0 THEN p END) / 256e0, 6) AS mean_r,
       round(sum(CASE WHEN c = 1 THEN p END) / 256e0, 6) AS mean_g,
       round(sum(CASE WHEN c = 2 THEN p END) / 256e0, 6) AS mean_b
FROM px GROUP BY image_id, tile_x, tile_y
"""


def _image_resize_stats_sql() -> str:
    """The 2x floor-mean downsample re-derived in SQL: base pixels from the
    integer-hash codec (jpeg rows 6-bit quantized first, exactly as the
    payload stores them), grouped into 2x2 blocks with sum // 4, then the
    same means + positional checksum the engine computes on the RESIZED
    payload."""
    m32 = 4294967296
    pix = (
        f"CAST(((CAST((doc_id * 2654435761 + y * 7919 + x * 104729 + c * 1299709) % {m32} AS HUGEINT)"
        f" * 2246822519) % {m32}) AS BIGINT) // 65536 % 256"
    )
    return f"""
WITH imgs AS (
  SELECT doc_id, 'img' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS image_id
  FROM documents
),
coords AS (
  SELECT yy.y, xx.x, cc.c
  FROM (SELECT unnest(generate_series(0, 63)) AS y) yy
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS x) xx
  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS c) cc
),
px AS (
  SELECT image_id, y // 2 AS y2, x // 2 AS x2, c,
         CASE WHEN doc_id % 2 = 1 THEN ({pix}) // 4 * 4 ELSE {pix} END AS p
  FROM imgs CROSS JOIN coords
),
small AS (
  SELECT image_id, y2, x2, c, CAST(sum(p) // 4 AS BIGINT) AS p2
  FROM px GROUP BY image_id, y2, x2, c
)
SELECT image_id,
       round(sum(CASE WHEN c = 0 THEN p2 END) / 1024e0, 6) AS mean_r,
       round(sum(CASE WHEN c = 1 THEN p2 END) / 1024e0, 6) AS mean_g,
       round(sum(CASE WHEN c = 2 THEN p2 END) / 1024e0, 6) AS mean_b,
       CAST(sum(p2 * (1 + (y2*31 + x2*17 + c*7) % 97)) AS BIGINT) AS checksum
FROM small GROUP BY image_id
"""


def _video_frame_sample_sql() -> str:
    """Sampled-frame stats re-derived from the closed-form frame seed:
    s = doc_id*131 + 9973*t for t in 0..n_frames-1 step 3 (n_frames =
    6 + doc_id % 7), pixels from the same integer-hash codec, means +
    positional checksum per frame."""
    m32 = 4294967296
    pix = (
        f"CAST(((CAST((s * 2654435761 + y * 7919 + x * 104729 + c * 1299709) % {m32} AS HUGEINT)"
        f" * 2246822519) % {m32}) AS BIGINT) // 65536 % 256"
    )
    return f"""
WITH vids AS (
  SELECT doc_id, 6 + doc_id % 7 AS n_frames FROM documents
),
frames AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), 3)) AS t
  FROM vids
),
seeds AS (
  SELECT doc_id, t, doc_id * 131 + 9973 * t AS s FROM frames
),
coords AS (
  SELECT yy.y, xx.x, cc.c
  FROM (SELECT unnest(generate_series(0, 63)) AS y) yy
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS x) xx
  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS c) cc
),
px AS (
  SELECT doc_id, t, y, x, c, {pix} AS p
  FROM seeds CROSS JOIN coords
)
SELECT 'vid' || lpad(CAST(doc_id AS VARCHAR), 12, '0') || '#' || CAST(t AS VARCHAR) AS image_id,
       round(sum(CASE WHEN c = 0 THEN p END) / 4096e0, 6) AS mean_r,
       round(sum(CASE WHEN c = 1 THEN p END) / 4096e0, 6) AS mean_g,
       round(sum(CASE WHEN c = 2 THEN p END) / 4096e0, 6) AS mean_b,
       CAST(sum(p * (1 + (y*31 + x*17 + c*7) % 97)) AS BIGINT) AS checksum
FROM px GROUP BY doc_id, t
"""


def _covering_containment_sql() -> str:
    """The covering-completeness invariant per region: every probe-lattice
    point the region's predicate selects is covered (n_missed = 0), with
    n_inside derived from the predicate alone."""
    preds = {rid: demo.cap_predicate_sql(la, ln, r) for rid, la, ln, r in demo.CAPS}
    preds.update(
        {rid: demo.rect_predicate_sql(a, b, c, d) for rid, a, b, c, d in demo.RECTS}
    )
    preds[demo.POLY_SPEC[0]] = demo.poly_predicate_sql()
    parts = [
        f"SELECT '{rid}' AS region_id, count(*) AS n_inside, CAST(0 AS BIGINT) AS n_missed "
        f"FROM grid WHERE {p}"
        for rid, p in preds.items()
    ]
    return (
        "WITH grid AS (SELECT -89e0 + 2e0*i.i AS lat, -179e0 + 2e0*j.j AS lng "
        "FROM (SELECT unnest(generate_series(0, 89)) AS i) i "
        "CROSS JOIN (SELECT unnest(generate_series(0, 179)) AS j) j) "
        + " UNION ALL ".join(parts)
    )


def _image_features_sql() -> str:
    """Whole-image channel means re-derived from the integer-hash codec
    (the grid=1 case of _tile_pixels_sql); brightness = mean of the three
    raw channel means in the same float order the kernel evaluates."""
    m32 = 4294967296
    pix = (
        f"CAST(((CAST((doc_id * 2654435761 + y * 7919 + x * 104729 + c * 1299709) % {m32} AS HUGEINT)"
        f" * 2246822519) % {m32}) AS BIGINT) // 65536 % 256"
    )
    ch = "sum(CASE WHEN c = {c} THEN p END) / 4096e0"
    r, g, b = ch.format(c=0), ch.format(c=1), ch.format(c=2)
    return f"""
WITH imgs AS (
  SELECT doc_id, 'img' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS image_id
  FROM documents
),
coords AS (
  SELECT yy.y, xx.x, cc.c
  FROM (SELECT unnest(generate_series(0, 63)) AS y) yy
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS x) xx
  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS c) cc
),
px AS (
  SELECT image_id, c,
         CASE WHEN doc_id % 2 = 1 THEN ({pix}) // 4 * 4 ELSE {pix} END AS p
  FROM imgs CROSS JOIN coords
)
SELECT image_id,
       round({r}, 6) AS mean_r,
       round({g}, 6) AS mean_g,
       round({b}, 6) AS mean_b,
       round(({r} + {g} + {b}) / 3e0, 6) AS brightness
FROM px GROUP BY image_id
"""


def _image_dedup_sql() -> str:
    """Signatures re-derived end-to-end from the codec formula: pixels ->
    per-tile means (same float op order: sum/256 then /quant) -> quantized
    tokens -> sorted concat -> md5; duplicate groups from the renamed-copy
    corpus construction."""
    m32 = 4294967296
    pix = (
        f"CAST(((CAST((doc_id * 2654435761 + y * 7919 + x * 104729 + c * 1299709) % {m32} AS HUGEINT)"
        f" * 2246822519) % {m32}) AS BIGINT) // 65536 % 256"
    )
    q = "CAST(floor((sum(CASE WHEN c = {c} THEN p END) / 256e0) / 16e0) AS INTEGER)"
    return f"""
WITH imgs AS (
  SELECT doc_id, 'img' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS image_id
  FROM documents
),
coords AS (
  SELECT yy.y, xx.x, cc.c
  FROM (SELECT unnest(generate_series(0, 63)) AS y) yy
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS x) xx
  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS c) cc
),
px AS (
  SELECT doc_id,
         CAST(x // 16 AS INTEGER) AS tile_x,
         CAST(y // 16 AS INTEGER) AS tile_y,
         c,
         CASE WHEN doc_id % 2 = 1 THEN ({pix}) // 4 * 4 ELSE {pix} END AS p
  FROM imgs CROSS JOIN coords
),
tiles AS (
  SELECT doc_id, tile_x, tile_y,
         {q.format(c=0)} AS qr, {q.format(c=1)} AS qg, {q.format(c=2)} AS qb
  FROM px GROUP BY doc_id, tile_x, tile_y
),
toks AS (
  SELECT doc_id,
         CAST(tile_y AS VARCHAR) || ':' || CAST(tile_x AS VARCHAR) || ':' ||
         CAST(qr AS VARCHAR) || ':' || CAST(qg AS VARCHAR) || ':' || CAST(qb AS VARCHAR) AS tok
  FROM tiles
),
sigs AS (
  SELECT doc_id, md5(string_agg(tok, '|' ORDER BY tok)) AS sig
  FROM toks GROUP BY doc_id
),
corpus AS (
  SELECT i.image_id, s.sig FROM sigs s JOIN imgs i USING (doc_id)
  UNION ALL
  SELECT 'dup_' || i.image_id, s.sig FROM sigs s JOIN imgs i USING (doc_id)
)
SELECT sig, count(*) AS n_images, min(image_id) AS min_image_id
FROM corpus GROUP BY sig HAVING count(*) > 1
"""


def _text_format_roundtrip_sql() -> str:
    """printf('%.15g') is C-style in DuckDB (verified byte-identical to the
    engine's formatter); parse-back via split + cast — both engines'
    correctly-rounded strtod yields identical doubles from identical text."""
    return """
WITH points AS (
  SELECT o_orderkey AS point_id,
         (((o_orderkey * 2654435761 + 12345) % 1000003) / 1000003e0) * 180e0 - 90e0 AS lat,
         (((o_orderkey * 2246822519 + 678901) % 1000003) / 1000003e0) * 360e0 - 180e0 AS lng
  FROM orders
),
fmt AS (
  SELECT point_id, printf('%.15g:%.15g', lat, lng) AS vertex_text FROM points
)
SELECT point_id, vertex_text,
       CAST(string_split(vertex_text, ':')[1] AS DOUBLE) AS lat_rt,
       CAST(string_split(vertex_text, ':')[2] AS DOUBLE) AS lng_rt
FROM fmt
"""


def _phash_neardup_sql() -> str:
    """phash re-derived end-to-end: first 8 bytes of sha256(image_id),
    big-endian signed (sources/images.py struct '>q'); identical planted
    flips, banding, cap and Hamming confirm as the Spark plan."""
    return """
WITH imgs AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         'img' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS image_id
  FROM documents
),
ph0 AS (
  SELECT i, image_id,
         CAST('0x' || substr(sha256(image_id), 1, 16) AS UBIGINT) AS u
  FROM imgs
),
ph AS (
  SELECT i, image_id,
         CAST(CAST(u AS HUGEINT)
              - CASE WHEN u >= CAST(9223372036854775808 AS UBIGINT)
                     THEN CAST(18446744073709551616 AS HUGEINT)
                     ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS phash
  FROM ph0
),
corpus AS (
  SELECT image_id, phash FROM ph
  UNION ALL
  SELECT image_id || '_v',
         xor(xor(xor(phash, CAST(1 AS BIGINT) << CAST(i*7 % 60 AS INT)),
                 CAST(1 AS BIGINT) << CAST(i*11 % 60 AS INT)),
             CAST(1 AS BIGINT) << CAST(i*27 % 60 AS INT))
  FROM ph WHERE i % 50 = 0
),
banded AS (
  SELECT image_id, phash, b.band, (phash >> (16*b.band)) & 65535 AS bv
  FROM corpus, (SELECT unnest([0,1,2,3]) AS band) b
),
capped AS (
  SELECT *, count(*) OVER (PARTITION BY band, bv) AS bn FROM banded
),
pairs AS (
  SELECT DISTINCT a.image_id AS img_a, b.image_id AS img_b,
         a.phash AS pa, b.phash AS pb
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.bv = b.bv AND a.image_id < b.image_id
  WHERE a.bn > 1 AND a.bn <= 200 AND b.bn > 1 AND b.bn <= 200
)
SELECT img_a, img_b, CAST(bit_count(xor(pa, pb)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(pa, pb)) <= 6
"""


def _image_verify_sql() -> str:
    """Per-row payload invariant as a gate: every image decodes above the
    PSNR threshold with a matching caption; fmt follows the id parity
    (sources/images.py)."""
    return """
SELECT 'img' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS image_id,
       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
       true AS psnr_ok, true AS caption_ok
FROM documents
"""


def oracle_sql() -> dict[str, str]:
    return {
        "pip_cap_join": _pip_cap_sql(),
        "tile_containment_check": _tile_containment_sql(),
        "tile_pixel_stats": _tile_pixels_sql(),
        "image_resize_stats": _image_resize_stats_sql(),
        "video_frame_sample": _video_frame_sample_sql(),
        "image_features": _image_features_sql(),
        "image_verify": _image_verify_sql(),
        "image_dedup": _image_dedup_sql(),
        "phash_neardup": _phash_neardup_sql(),
        "text_format_roundtrip": _text_format_roundtrip_sql(),
        "cell_roundtrip_check": (
            f"SELECT o_orderkey AS point_id, true AS ok FROM orders"
        ),
        "covering_containment_check": _covering_containment_sql(),
        "within_distance_join": _within_distance_sql(),
        "within_distance_polyline": _within_polyline_sql(),
        "group_cap_bounds": _group_bounds_sql(),
        "group_rect_bounds": _group_rect_bounds_sql(),
        "pip_rect_join": _pip_rect_sql(),
        "pip_poly_join": _pip_poly_sql(),
        "pip_bigpoly_join": _pip_bigpoly_sql(),
        "pip_many_poly_join": demo.many_poly_sql(),
        "pip_many_poly_table": demo.many_poly_sql(),
        "pip_unified_index": demo.many_poly_sql(),
        "pip_text_index": demo.many_poly_sql(),
        "pip_incremental_index": demo.many_poly_sql(),
        "index_region_check": _index_region_check_sql(),
        "index_union_bound_check": _index_union_bound_sql(),
        "spatial_antijoin": _spatial_antijoin_sql(),
        "knn_join": _knn_sql(),
        "knn_maxdist": _knn_maxdist_sql(),
        "knn_maxerror": _knn_sql(),
        "knn_region": _knn_region_sql(),
        "knn_edges_join": _knn_edges_sql(),
        "knn_unified_index": _knn_edges_sql(),
        "knn_edges_maxdist": _knn_edges_maxdist_sql(),
        "knn_edges_maxerror": _knn_edges_sql(),
        "knn_edge_targets": _knn_edge_targets_sql(),
        "knn_cell_targets": _knn_cell_targets_sql(),
        "knn_table_join": _knn_table_join_sql(),
        "edge_face_span": _edge_face_span_sql(),
        "furthest_join": _furthest_sql(),
        "nearest_polyline_join": _nearest_polyline_sql(),
        "polyline_within_distance": _nearest_polyline_sql(k=5, max_dist_deg=_PL_WITHIN_DEG),
        "crossing_edges_join": _crossing_edges_sql(),
        "crossing_unified_index": _crossing_edges_sql(),
        "crossing_pairs_self": _crossing_pairs_self_sql(),
        "crossing_pairs_tables": _crossing_pairs_tables_sql(),
        "polygon_overlay": demo.overlay_sql("intersection"),
        "polygon_overlay_union": demo.overlay_sql("union"),
        "polygon_overlay_diff": demo.overlay_sql("difference"),
        "polygon_overlay_symdiff": demo.overlay_sql("symmetric_difference"),
        "polygon_overlay_holes": demo.overlay_holes_sql("intersection"),
        "polygon_overlay_holes_diff": demo.overlay_holes_sql("difference", flip=True),
        "polygon_overlay_holes_union": demo.overlay_holes_sql("union"),
        "polygon_overlay_holes_symdiff": demo.overlay_holes_sql("symmetric_difference"),
        "snap_polygons": demo.snap_polygons_sql(),
        "validate_polygons": demo.validation_sql(),
        "clip_polylines": _clip_polylines_sql(),
        "polygon_union_many": demo.union_many_sql(),
        "polygon_relations": demo.polygon_relations_sql(),
        "dedup_exact": (
            "WITH corpus AS (SELECT doc_id, text FROM documents "
            "UNION ALL SELECT doc_id + 1000000, text FROM documents) "
            "SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS min_doc_id "
            "FROM corpus GROUP BY md5(text) HAVING count(*) > 1"
        ),
        "dedup_minhash_lsh": _minhash_sql(),
        "dedup_clusters": _dedup_clusters_sql(),
        "dedup_keep_best": _dedup_keep_best_sql(),
        "ngram_jaccard": _jaccard_sql(),
        "simhash16": _simhash_sql(),
        "lang_id": _langid_sql(),
        "token_count": (
            "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens "
            "FROM documents"
        ),
        "quality_score": _quality_sql(),
        "fingerprint": (
            "SELECT doc_id, substr(md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))), 1, 16) AS fp "
            "FROM documents"
        ),
        "ann_cosine_topk": _ann_sql(),
        "dedup_embedding_cosine": _dedup_embedding_sql(),
        "sample_stratified": _sample_stratified_sql(),
        "dataset_mixture": _dataset_mixture_sql(),
        "shard_by_token_budget": _shard_tokens_sql(),
        "snap_polylines": demo.snap_polylines_sql(),
        "assemble_polylines": demo.assemble_polylines_sql(),
        "build_polyline_graph": demo.build_polyline_graph_sql(),
        "audio_chunk_stats": """
WITH ids AS (
  SELECT doc_id, 'aud' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS audio_id
  FROM documents
),
idx AS (SELECT unnest(generate_series(0, 4095)) AS i),
raw AS (
  SELECT audio_id, i,
         CAST(((CAST((doc_id * 2654435761 + i * 7919) % 4294967296 AS HUGEINT)
                * 2246822519) % 4294967296) AS BIGINT) // 65536 AS u
  FROM ids CROSS JOIN idx
),
sm AS (
  SELECT audio_id, i // 512 AS chunk_id, i % 512 AS j,
         CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
  FROM raw
),
flags AS (
  SELECT audio_id, chunk_id, j, s, (s >= 0) AS nonneg,
         lag(s >= 0) OVER (PARTITION BY audio_id, chunk_id ORDER BY j) AS pn
  FROM sm
)
SELECT audio_id,
       CAST(chunk_id AS INT) AS chunk_id,
       round(sum(abs(s)) / 512e0, 6) AS mean_abs,
       CAST(max(abs(s)) AS INT) AS peak,
       CAST(sum(CASE WHEN pn IS NOT NULL AND nonneg <> pn THEN 1 ELSE 0 END)
            AS INT) AS zero_crossings
FROM flags
GROUP BY audio_id, chunk_id
""",
        "event_chains": """
WITH o AS (
  SELECT user_id, event_id,
         lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS nxt
  FROM events
),
ed AS (
  SELECT user_id, event_id AS eid, event_id AS src, nxt AS dst
  FROM o WHERE nxt IS NOT NULL
)
SELECT CAST(min(eid) OVER (PARTITION BY user_id) AS BIGINT) AS polyline_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY eid) - 1 AS INT) AS seq,
       CAST(eid AS BIGINT) AS edge_id,
       CAST(src AS BIGINT) AS src,
       CAST(dst AS BIGINT) AS dst
FROM ed
""",
        "id_set_lexicon": f"""
WITH pip AS ({demo.many_poly_sql()}),
sets AS (
  SELECT point_id,
         array_to_string(list_sort(list(DISTINCT region_id)), '|') AS regions
  FROM pip GROUP BY point_id
),
lex AS (
  SELECT regions,
         CAST(row_number() OVER (ORDER BY regions) - 1 AS INT) AS set_id
  FROM (SELECT DISTINCT regions FROM sets)
)
SELECT s.point_id, s.regions, l.set_id
FROM sets s JOIN lex l USING (regions)
""",
    }
