"""Crossing-edge join: which edges of a big table cross a target edge set.

The reference's S2CrossingEdgeQuery (s2crossing_edge_query.d:78-160) asks a
shape index for the edges crossing a query edge; distributed, this becomes:

1. register every table edge under the <=4 cells of its bounding cap
   (knn.edge_register_cells_udf — shared with closest-edge kNN);
2. per target edge, a covering from ITS bounding cap; candidates via the
   two-way broadcast covering probe (registered cells may be coarser or
   finer than the target covering cells) — map-only, no fact shuffle;
3. exact crossingSign (vectorized triage -> exact fallback) on candidates.

This is the door to polygon overlays: boolean ops need exactly "which
edges of A cross edges of B".
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..s2core.regions import Cap, chord2_between, normalize
from .spatial_join import RegionCovering, candidate_match_kernel


def _edge_cap_cells(a, b) -> list[tuple[int, bool]]:
    mid = normalize((a[0] + b[0], a[1] + b[1], a[2] + b[2]))
    r2 = max(chord2_between(mid, a), chord2_between(mid, b))
    cap = Cap(mid, r2 * (1.0 + 1e-12) + 1e-15)
    return [(c.id, False) for c in cap.cell_union_bound()]


def _crossing_udf(targets: dict[str, tuple[tuple, tuple]]):
    """(target_id, alat, alng, blat, blng) -> crossingSign > 0, vectorized
    per target group."""

    @F.pandas_udf(T.BooleanType())
    def crosses(
        target_id: pd.Series,
        alat: pd.Series,
        alng: pd.Series,
        blat: pd.Series,
        blng: pd.Series,
    ) -> pd.Series:
        from ..s2core import coords
        from ..s2core import predicates as pred

        ax, ay, az = coords.latlng_to_xyz(
            alat.to_numpy(dtype=np.float64), alng.to_numpy(dtype=np.float64)
        )
        bx, by, bz = coords.latlng_to_xyz(
            blat.to_numpy(dtype=np.float64), blng.to_numpy(dtype=np.float64)
        )
        A = np.stack([ax, ay, az], axis=1)
        B = np.stack([bx, by, bz], axis=1)
        out = np.zeros(A.shape[0], dtype=bool)
        for tid in target_id.unique():
            if tid not in targets:
                continue
            c, d = targets[tid]
            m = (target_id == tid).to_numpy()
            C = np.broadcast_to(np.asarray(c), (int(m.sum()), 3))
            D = np.broadcast_to(np.asarray(d), (int(m.sum()), 3))
            out[m] = pred.crossing_sign_pairs(A[m], B[m], C, D) > 0
        return pd.Series(out)

    return crosses


def crossing_edges_join(
    edges_df: DataFrame,
    target_edges: list[tuple[str, tuple[float, float], tuple[float, float]]],
    edge_id_col: str = "edge_id",
    registered_df: DataFrame | None = None,
) -> DataFrame:
    """(target_id, <edge columns>) for every table edge PROPERLY crossing a
    target edge.  ``target_edges``: [(target_id, (alat, alng), (blat, blng))]
    — the small/broadcast side (a polyline, a polygon boundary).
    ``registered_df`` shares a prebuilt registered-cell table (knn.register_edges)."""
    from ..s2core.regions import latlng_point
    from .knn import register_edges

    registered = registered_df if registered_df is not None else register_edges(edges_df)

    coverings = []
    payload = {}
    for tid, (la, ln), (lb, lnb) in target_edges:
        a = latlng_point(la, ln)
        b = latlng_point(lb, lnb)
        payload[tid] = (a, b)
        coverings.append(RegionCovering(tid, None, _edge_cap_cells(a, b)))

    cand = candidate_match_kernel(
        registered, coverings, cell_col="ecell", two_way=True
    ).drop("is_interior", "ecell")
    cand = cand.withColumnRenamed("region_id", "target_id").dropDuplicates(
        ["target_id", edge_id_col]
    )
    crosses = _crossing_udf(payload)
    return cand.filter(
        crosses(
            F.col("target_id"),
            F.col("alat"),
            F.col("alng"),
            F.col("blat"),
            F.col("blng"),
        )
    )


def _pair_crossing_udf():
    """(ax..az, bx..bz, cx..cz, dx..dz) -> proper-crossing boolean over edge
    PAIRS, vectorized (triage + exact fallback — predicates.crossing_sign_pairs)."""

    @F.pandas_udf(T.BooleanType())
    def crosses(
        ax: pd.Series, ay: pd.Series, az: pd.Series,
        bx: pd.Series, by: pd.Series, bz: pd.Series,
        cx: pd.Series, cy: pd.Series, cz: pd.Series,
        dx: pd.Series, dy: pd.Series, dz: pd.Series,
    ) -> pd.Series:
        from ..s2core import predicates as pred

        A = np.column_stack([ax, ay, az])
        B = np.column_stack([bx, by, bz])
        C = np.column_stack([cx, cy, cz])
        D = np.column_stack([dx, dy, dz])
        return pd.Series(pred.crossing_sign_pairs(A, B, C, D) > 0)

    return crosses


def crossing_pairs_self(
    edges_df: DataFrame,
    edge_id_col: str = "edge_id",
    registered_df: DataFrame | None = None,
) -> DataFrame:
    """All PROPERLY-crossing edge pairs WITHIN one table — the reference's
    single-index crossing sweep (shapeutil/visit_crossing_edge_pairs.d:
    visitCrossingEdgePairs over a ShapeIndex visits each candidate pair in
    the smallest index cell both edges occupy).  Returns (id_a, id_b) with
    id_a < id_b, one row per unordered pair with crossingSign > 0.

    Distributed shape (never all-pairs):

    1. every edge is registered under its <=4/6 covering cells
       (knn.register_edges — the shared index artifact);
    2. if two edges cross at p, p lies in one registered cell of EACH, and
       S2 cells at any two levels containing a common point are nested — so
       every crossing pair shares an (ancestor cell == cell) relation.
       Candidates come from ONE equi-join: side A keyed at each cell's own
       id, side B exploding each cell's ancestors at every level present in
       the index (a small driver-collected set), so coarse-vs-fine pairs
       meet at the coarse key.  Over-generation is scored away;
    3. unordered dedup (least/greatest + distinct), then the exact pair
       kernel (vectorized det triage, exact scalar fallback) on candidates.

    Per-pair output is reported once regardless of how many shared cells
    produced it.  Plan: one cell-keyed shuffle + one pair-distinct shuffle +
    two broadcast-or-shuffle id joins + ONE ArrowEvalPython — no crossJoin;
    survives 100x because candidates are bounded by cell co-occupancy, not
    table size (hot cells are bounded by the registration levels; salt the
    cell key if a single cell dominates)."""
    from ..functions import edgedist, kernels
    from .knn import register_edges

    registered = (
        registered_df if registered_df is not None else register_edges(edges_df)
    )
    lvl = F.lit(30) - (
        F.log2(F.col("ecell").bitwiseAND(-F.col("ecell")).cast("double"))
        / F.lit(2.0)
    ).cast("int")
    reg = registered.select(edge_id_col, "ecell").withColumn("_lvl", lvl)
    levels = sorted(
        int(r["_lvl"]) for r in reg.select("_lvl").distinct().collect()
    )
    if not levels:
        return (
            edges_df.select(F.col(edge_id_col).alias("id_a"))
            .withColumn("id_b", F.col("id_a"))
            .filter(F.lit(False))
        )

    a_side = reg.select(
        F.col("ecell").alias("_key"), F.col(edge_id_col).alias("_ida")
    )
    ancestors = F.array(
        *[
            F.when(F.col("_lvl") >= l, kernels.parent_signed(F.col("ecell"), l))
            for l in levels
        ]
    )
    b_side = (
        reg.select(
            F.col(edge_id_col).alias("_idb"),
            F.explode(ancestors).alias("_key"),
        )
        .filter(F.col("_key").isNotNull())
    )

    cand = (
        a_side.join(b_side, "_key")
        .filter(F.col("_ida") != F.col("_idb"))
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
        )
        .distinct()
    )

    geom = edges_df.selectExpr(
        edge_id_col,
        *edgedist.xyz_exprs("alat", "alng", "a"),
        *edgedist.xyz_exprs("blat", "blng", "b"),
    )
    ga = geom.toDF("id_a", "ax", "ay", "az", "bx", "by", "bz")
    gb = geom.toDF("id_b", "cx", "cy", "cz", "dx", "dy", "dz")
    crosses = _pair_crossing_udf()
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .filter(
            crosses(
                "ax", "ay", "az", "bx", "by", "bz",
                "cx", "cy", "cz", "dx", "dy", "dz",
            )
        )
        .select("id_a", "id_b")
    )
