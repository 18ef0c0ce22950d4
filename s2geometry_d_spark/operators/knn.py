"""Distributed kNN join: closest points to a small query set.

The reference's best-first search over the cell B-tree
(s2closest_point_query_base.d:372-463) becomes an **iterative ring-expansion
candidate join** (SURVEY.md §2.4):

1. per query, a search cap of radius r seeds a covering (driver, tiny);
2. candidates = broadcast-covering membership probe (one Arrow pass, no
   fact-table shuffle; see spatial_join.candidate_match_kernel);
3. exact squared-chord distance fully native (codegen), window top-k;
4. completeness proof per query: the k-th distance must be <= chord2(r),
   else the true k-th neighbour could lie outside the ring -> double r and
   retry only the unresolved queries (a shrinking frontier).

Correctness anchor: brute-force cross join comparison, the same oracle the
reference tests use (s2closest_edge_query_test.d:380-416).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..s2core.regions import Cap, chord2_from_radians
from .spatial_join import candidate_match_kernel, compute_coverings


def _chord2_to_query_expr(lat_col: str, lng_col: str):
    lat_r = F.radians(F.col(lat_col))
    lng_r = F.radians(F.col(lng_col))
    px = F.cos(lng_r) * F.cos(lat_r)
    py = F.sin(lng_r) * F.cos(lat_r)
    pz = F.sin(lat_r)
    dx = px - F.col("qx")
    dy = py - F.col("qy")
    dz = pz - F.col("qz")
    return dx * dx + dy * dy + dz * dz


def knn_join(
    points_df: DataFrame,
    queries: list[tuple[str, float, float]],
    k: int,
    lat_col: str = "lat",
    lng_col: str = "lng",
    cell_col: str = "cell_id",
    initial_radius_deg: float | None = None,
    max_rounds: int = 6,
    n_points_hint: int | None = None,
    tie_col: str | None = None,
) -> DataFrame:
    """Returns (query_id, rank, dist2, <point columns>) with rank 1..k.

    ``queries``: [(query_id, lat_deg, lng_deg)] — small (broadcast side).
    ``tie_col``: deterministic tie-break column for equal distances
    (defaults to the cell column).
    """
    spark = points_df.sparkSession
    tie_col = tie_col or cell_col

    if initial_radius_deg is None:
        # expected radius containing ~4k points under uniform density
        n = n_points_hint or 100_000
        frac = min(1.0, 4.0 * k / max(n, 1))
        initial_radius_deg = max(0.2, math.degrees(2.0 * math.asin(math.sqrt(frac))))

    pending = {qid: (lat, lng) for qid, lat, lng in queries}
    radius = {qid: initial_radius_deg for qid in pending}
    results = None

    for _ in range(max_rounds):
        if not pending:
            break
        regions = [
            (qid, Cap.from_latlng_radius(lat, lng, min(radius[qid], 170.0)))
            for qid, (lat, lng) in pending.items()
        ]
        coverings = compute_coverings(regions, max_cells=24)
        cand = candidate_match_kernel(points_df, coverings, cell_col=cell_col).drop("is_interior")
        cand = cand.withColumnRenamed("region_id", "query_id")

        qrows = [
            (qid, *_xyz(lat, lng), chord2_from_radians(math.radians(min(radius[qid], 170.0))))
            for qid, (lat, lng) in pending.items()
        ]
        qdf = spark.createDataFrame(qrows, ["query_id", "qx", "qy", "qz", "r2"])
        cand = cand.join(F.broadcast(qdf), "query_id")

        scored = cand.withColumn("dist2", _chord2_to_query_expr(lat_col, lng_col)).filter(
            F.col("dist2") <= F.col("r2")
        )
        w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col(tie_col).asc())
        topk = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .drop("qx", "qy", "qz", "r2")
        )

        # completeness check: need k results AND k-th distance within the ring
        stats = (
            topk.groupBy("query_id")
            .agg(F.count("*").alias("cnt"), F.max("dist2").alias("kth"))
            .collect()
        )
        done = set()
        for row in stats:
            r2_ring = chord2_from_radians(math.radians(min(radius[row.query_id], 170.0)))
            if row.cnt >= k and row.kth <= r2_ring:
                done.add(row.query_id)
            elif radius[row.query_id] >= 170.0:
                done.add(row.query_id)  # ring covers the sphere; accept
        done_df = topk.filter(F.col("query_id").isin(list(done))) if done else None
        if done_df is not None:
            results = done_df if results is None else results.unionByName(done_df)
        for qid in done:
            del pending[qid]
        for qid in pending:
            radius[qid] = radius[qid] * 2.0

    if pending:
        # brute-force fallback for stragglers: tiny query set x all points
        qrows = [(qid, *_xyz(lat, lng)) for qid, (lat, lng) in pending.items()]
        qdf = spark.createDataFrame(qrows, ["query_id", "qx", "qy", "qz"])
        cand = points_df.crossJoin(F.broadcast(qdf))
        scored = cand.withColumn("dist2", _chord2_to_query_expr(lat_col, lng_col))
        w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col(tie_col).asc())
        topk = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k).drop(
            "qx", "qy", "qz"
        )
        results = topk if results is None else results.unionByName(topk)

    return results


def knn_brute_force(
    points_df: DataFrame,
    queries: list[tuple[str, float, float]],
    k: int,
    lat_col: str = "lat",
    lng_col: str = "lng",
    cell_col: str = "cell_id",
    tie_col: str | None = None,
) -> DataFrame:
    """Oracle: exact cross-join top-k (reference setUseBruteForce analogue)."""
    spark = points_df.sparkSession
    tie_col = tie_col or cell_col
    qdf = spark.createDataFrame(
        [(qid, *_xyz(lat, lng)) for qid, lat, lng in queries],
        ["query_id", "qx", "qy", "qz"],
    )
    scored = points_df.crossJoin(F.broadcast(qdf)).withColumn(
        "dist2", _chord2_to_query_expr(lat_col, lng_col)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col(tie_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k).drop(
        "qx", "qy", "qz"
    )


def _xyz(lat_deg: float, lng_deg: float):
    lat = math.radians(lat_deg)
    lng = math.radians(lng_deg)
    return (math.cos(lng) * math.cos(lat), math.sin(lng) * math.cos(lat), math.sin(lat))
