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
