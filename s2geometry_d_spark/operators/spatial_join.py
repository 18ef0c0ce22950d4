"""Covering-based spatial joins: point-in-region (cap / rect / polygon).

The distributed plan (SURVEY.md §2.4):

1. driver: regions (small) -> interior+exterior coverings via RegionCoverer,
   one row per covering cell ``(region_id, level, cell_signed, is_interior)``;
2. points: leaf ``cell_signed`` column (pandas-UDF kernel, computed once);
3. **equi-join, not theta-join**: a point lies in covering cell c iff
   ``parent(point_cell, level(c)) == c``, so the point side explodes a tiny
   array of native-computed ancestors (one per distinct covering level) and
   the join is a broadcast hash join on ``(level, cell)`` — no
   BroadcastNestedLoopJoin, no range predicate, survives any point count;
4. interior hits are accepted with **no further math**; boundary hits run the
   exact predicate (native SQL for cap/rect, Arrow-batched parity UDF for
   polygons) — the same two-tier structure as the reference's indexed
   contains (s2contains_point_query.d:147-156,248-278).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from ..functions.localdf import local_df
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import kernels
from ..s2core import cellid as ci
from ..s2core.cellid import CellId
from ..s2core.coverer import CovererOptions, RegionCoverer
from ..s2core.loops import Polygon
from ..s2core.regions import Cap, Cell, LatLngRect
from ..s2core.shapeindex import PolygonCellIndex


@dataclass
class RegionCovering:
    region_id: str
    region: object
    cells: list  # [(cell_id_unsigned, is_interior)]


from functools import lru_cache


@lru_cache(maxsize=65536)
def buffered_segment_covering(
    la: float, ln: float, lb: float, lnb: float, radius_rad: float, max_cells: int = 24
) -> tuple:
    """Memoized covering cells of ONE buffered edge segment — the
    (cell_id, is_interior) tuples compute_coverings would produce for
    ``BufferedRegion(Polyline([a, b]), radius)``.  A pure function of five
    floats, and the dominant DRIVER cost of the edge-target kNN rounds
    (~0.5 s per evaluation for 41 route segments, re-paid on every
    evaluation without this cache; ring radii repeat across evaluations,
    so the cache hits from the second evaluation on)."""
    from ..s2core.polyline import BufferedRegion, Polyline

    pl = Polyline.from_latlngs([(float(la), float(ln)), (float(lb), float(lnb))])
    region = BufferedRegion(pl, float(radius_rad))
    coverer = RegionCoverer(CovererOptions(max_cells=max_cells))
    return tuple(
        (cid, region.contains_cell(Cell(CellId(cid))))
        for cid in coverer.get_covering(region)
    )


def compute_coverings(regions: list[tuple[str, object]], max_cells: int = 64) -> list[RegionCovering]:
    """Exterior covering per region; each cell classified interior/boundary.

    Interior cells admit points with no exact test, so more covering cells
    (deeper max_cells) trades driver time for executor work — the analogue
    of the reference's index-once-reuse-everywhere tradeoff
    (s2loop.d:1078-1093: index build ~50x one query)."""
    out = []
    for rid, region in regions:
        coverer = RegionCoverer(CovererOptions(max_cells=max_cells))
        cov = coverer.get_covering(region)
        cells = []
        for cid in cov:
            cells.append((cid, region.contains_cell(Cell(CellId(cid)))))
        out.append(RegionCovering(rid, region, cells))
    return out


def covering_dataframe(spark, coverings: list[RegionCovering]) -> DataFrame:
    rows = []
    for rc in coverings:
        for cid, is_interior in rc.cells:
            level = CellId(cid).level()
            signed = int(np.int64(np.uint64(cid) ^ np.uint64(1 << 63)))
            rows.append((rc.region_id, level, signed, bool(is_interior)))
    schema = T.StructType(
        [
            T.StructField("region_id", T.StringType(), False),
            T.StructField("cov_level", T.IntegerType(), False),
            T.StructField("cov_cell", T.LongType(), False),
            T.StructField("is_interior", T.BooleanType(), False),
        ]
    )
    return local_df(spark, rows, schema)


def candidate_join(
    points_df: DataFrame,
    coverings: list[RegionCovering],
    cell_col: str = "cell_id",
) -> DataFrame:
    """Broadcast equi-join of points against covering cells.

    Returns points columns + (region_id, is_interior).  The point side
    computes one native ``parent_signed`` per distinct covering level and
    explodes — bounded fan-out (#levels, typically <= 8), all codegen'd.
    """
    spark = points_df.sparkSession
    levels = sorted({CellId(cid).level() for rc in coverings for cid, _ in rc.cells})
    cov_df = covering_dataframe(spark, coverings)

    ancestors = F.array(
        *[
            F.struct(
                F.lit(lvl).alias("cov_level"),
                kernels.parent_signed(F.col(cell_col), lvl).alias("cov_cell"),
            )
            for lvl in levels
        ]
    )
    exploded = points_df.withColumn("_anc", F.explode(ancestors)).withColumn(
        "cov_level", F.col("_anc.cov_level")
    ).withColumn("cov_cell", F.col("_anc.cov_cell")).drop("_anc")

    return exploded.join(F.broadcast(cov_df), ["cov_level", "cov_cell"], "inner").drop(
        "cov_level", "cov_cell"
    )


# Above this many covering rows the broadcast hash join stops being the
# right physical plan (the reference's brute-force-below-threshold analogue,
# s2closest_edge_query.d:207-271; SURVEY.md §4) — switch to a shuffled
# sort-merge join on a fixed-level ancestor prefix.
BROADCAST_COVERING_LIMIT = 100_000


def covering_match_udf(coverings: list[RegionCovering], two_way: bool = False):
    """Broadcast-covering candidate matcher as ONE vectorized Arrow kernel.

    For small region sets the declarative alternative (explode ~13 native
    ancestors per point + broadcast hash join) materializes billions of
    exploded rows at 10^8+ points; measured 10x slower than doing the
    ancestor-chain membership probe inside the cell kernel's address space.
    This is still idiomatic Spark — a broadcast variable consulted in a
    map-only stage — and it keeps the fact table un-shuffled and un-exploded.

    ``two_way=True`` additionally matches covering cells that are
    DESCENDANTS of the input cell — required when the input column holds
    non-leaf cells (e.g. an edge index registered at adaptive levels) whose
    own cell may be coarser than a covering cell.

    Returns a pandas UDF: cell_id (signed) -> array<int> of codes
    ``region_idx * 2 + is_interior`` (empty for the vast majority of rows).
    """
    # per-level sorted covering arrays (signed domain preserves order)
    by_level: dict[int, list[tuple[int, int, int]]] = {}
    region_ids = []
    for ridx, rc in enumerate(coverings):
        region_ids.append(rc.region_id)
        for cid, interior in rc.cells:
            lvl = CellId(cid).level()
            signed = int(np.int64(np.uint64(cid) ^ np.uint64(1 << 63)))
            by_level.setdefault(lvl, []).append((signed, ridx, int(interior)))
    tables = []
    for lvl, rows in sorted(by_level.items()):
        rows.sort()
        cells = np.array([r[0] for r in rows], dtype=np.int64)
        codes = np.array([r[1] * 2 + r[2] for r in rows], dtype=np.int64)
        nl = np.int64(1 << (2 * (30 - lvl)))
        tables.append((nl, cells, codes))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def match(cell_signed: pd.Series) -> pd.Series:
        ids = cell_signed.to_numpy(dtype=np.int64)
        n = ids.shape[0]
        lsb_in = ids & -ids  # valid in the signed-flipped domain (bit 63 untouched)
        hit_rows: list[np.ndarray] = []
        hit_codes: list[np.ndarray] = []
        for nl, cells, codes in tables:
            # ancestor probe: input at least as fine as this covering level
            fine = lsb_in <= nl
            parents = np.where(fine, (ids & -nl) | nl, np.int64(0))
            left = np.searchsorted(cells, parents, side="left")
            right = np.searchsorted(cells, parents, side="right")
            cnt = np.where(fine, right - left, 0)
            if two_way:
                # descendant probe: covering cells inside the input cell's
                # leaf range (input strictly coarser than this level)
                coarse = lsb_in > nl
                rmin = ids - (lsb_in - 1)
                rmax = ids + (lsb_in - 1)
                lo = np.searchsorted(cells, rmin, side="left")
                hi = np.searchsorted(cells, rmax, side="right")
                cnt = cnt + np.where(coarse, hi - lo, 0)
                left = np.where(fine, left, lo)
            nz = np.nonzero(cnt)[0]
            if nz.size == 0:
                continue
            # expand duplicates (same covering cell used by several regions)
            reps = cnt[nz]
            rows = np.repeat(nz, reps)
            offs = np.concatenate([np.arange(c) for c in reps])
            hit_rows.append(rows)
            hit_codes.append(codes[left[rows] + offs])
        out = [()] * n
        if hit_rows:
            all_rows = np.concatenate(hit_rows)
            all_codes = np.concatenate(hit_codes)
            order = np.argsort(all_rows, kind="stable")
            all_rows = all_rows[order]
            all_codes = all_codes[order]
            starts = np.searchsorted(all_rows, np.arange(n), side="left")
            ends = np.searchsorted(all_rows, np.arange(n), side="right")
            for i in np.nonzero(ends > starts)[0]:
                out[i] = tuple(int(c) for c in all_codes[starts[i] : ends[i]])
        return pd.Series(out)

    return match, region_ids


# Above this many covering cells the coarse-prefix InSet literal list stops
# being a sensible plan node — skip the native prefilter and let the Arrow
# kernel see every row (its own cost is O(rows * log cells) regardless).
PREFILTER_CELL_LIMIT = 8192


def coarse_prefix_filter(
    coverings: list[RegionCovering], cell_col: str, two_way: bool = False
):
    """Catalyst-native NECESSARY condition for the Arrow match kernel.

    A row can only match some covering cell if their leaf ranges intersect,
    i.e. one is an ancestor of the other.  With L = the coarsest covering
    level, that splits exactly into two codegen-able cases:

    * input at least as fine as L: its level-L ancestor must equal the
      level-L ancestor of some covering cell (``parent_L(cell) IN P``);
    * input strictly coarser than L (two-way probes only): the input cell
      must itself BE a strict ancestor (levels 0..L-1) of some covering
      cell (``cell IN A``) — there are at most L * |cells| such ids.

    Both tests are pure bit math + InSet, so rows the kernel would map to
    an empty match array never cross the Arrow boundary at all.  Returns
    None (caller skips the filter) for empty or oversized coverings.

    ONLY apply this to inputs whose cell column is a stored/persisted
    column (e.g. a registered edge index): on a column computed by a
    pandas UDF in the same plan, predicate pushdown would substitute the
    alias into this filter and evaluate the cell kernel twice (the
    round-3 doubled-kernel bug class).
    """
    cells = [cid for rc in coverings for cid, _ in rc.cells]
    if not cells or len(cells) > PREFILTER_CELL_LIMIT:
        return None
    L = min(CellId(cid).level() for cid in cells)
    nl = kernels.lsb_for_level(L)

    def signed(cid: int) -> int:
        return int(np.int64(np.uint64(cid) ^ np.uint64(1 << 63)))

    parents = sorted({(signed(cid) & -nl) | nl for cid in cells})
    cell = F.col(cell_col)
    lsb = cell.bitwiseAND(-cell)
    fine_hit = (lsb <= F.lit(nl)) & kernels.parent_signed(cell, L).isin(parents)
    if not two_way or L == 0:
        return fine_hit
    ancestors: set[int] = set()
    for cid in cells:
        c = CellId(cid)
        for lvl in range(L):
            ancestors.add(signed(c.parent(lvl).id))
    coarse_hit = (lsb > F.lit(nl)) & cell.isin(sorted(ancestors))
    return fine_hit | coarse_hit


def candidate_match_kernel(
    points_df: DataFrame,
    coverings: list[RegionCovering],
    cell_col: str = "cell_id",
    two_way: bool = False,
    prefilter: bool = False,
) -> DataFrame:
    """Map-only candidate generation: returns points columns +
    (region_id, is_interior), like candidate_join, without the explode.

    ``prefilter=True`` adds the :func:`coarse_prefix_filter` native filter
    ahead of the Arrow kernel — opt-in, and only safe when ``cell_col`` is
    a stored column (see that function's pushdown caveat).  Frames whose
    producer guarantees that (the persisted point fixture materializes
    ``cell_id`` in its cache, so a filter on it never re-runs the cell
    kernel) opt in by carrying a ``_s2_cell_stored`` attribute."""
    spark = points_df.sparkSession
    if not prefilter:
        prefilter = bool(getattr(points_df, "_s2_cell_stored", False))
    if prefilter:
        cond = coarse_prefix_filter(coverings, cell_col, two_way=two_way)
        if cond is not None:
            points_df = points_df.filter(cond)
    match, region_ids = covering_match_udf(coverings, two_way=two_way)
    mapping = local_df(spark, 
        [(i, rid) for i, rid in enumerate(region_ids)], ["_ridx", "region_id"]
    )
    # NOTE: no size-filter before the explode — explode already drops rows
    # whose match array is empty, and a filter between the UDF and the
    # explode makes Spark evaluate the Arrow kernel TWICE per fact row (it
    # cannot deduplicate a Python UDF across the Filter barrier; round-3
    # verdict finding #1).  test_plan_shapes asserts a single ArrowEvalPython.
    cand = (
        points_df.withColumn("_code", F.explode(match(F.col(cell_col))))
        .withColumn("_ridx", (F.col("_code") / 2).cast("int"))
        .withColumn("is_interior", (F.col("_code") % 2) == 1)
        .drop("_code")
    )
    return cand.join(F.broadcast(mapping), "_ridx").drop("_ridx")


def _lsb_expr(col):
    return col.bitwiseAND(-col)


def candidate_join_smj(
    points_df: DataFrame,
    coverings: list[RegionCovering],
    cell_col: str = "cell_id",
) -> DataFrame:
    """Shuffled covering join for LARGE region sets (millions of polygons).

    Both sides shuffle on the level-L ancestor (L = the coarsest covering
    level), then a native residual range test
    ``point_cell BETWEEN range_min(cov) AND range_max(cov)`` keeps exact
    containment.  All keys/bounds are codegen'd bit math — no UDF.
    """
    spark = points_df.sparkSession
    cov_df = covering_dataframe(spark, coverings)
    join_level = min(CellId(cid).level() for rc in coverings for cid, _ in rc.cells)

    cov_keyed = cov_df.withColumn(
        "join_key", kernels.parent_signed(F.col("cov_cell"), join_level)
    ).withColumn("cov_lsb", _lsb_expr(F.col("cov_cell")))
    pts_keyed = points_df.withColumn(
        "join_key", kernels.parent_signed(F.col(cell_col), join_level)
    )
    joined = pts_keyed.join(cov_keyed, "join_key", "inner")
    residual = (F.col(cell_col) >= F.col("cov_cell") - (F.col("cov_lsb") - 1)) & (
        F.col(cell_col) <= F.col("cov_cell") + (F.col("cov_lsb") - 1)
    )
    return joined.filter(residual).drop("join_key", "cov_lsb", "cov_level", "cov_cell")


def candidate_join_auto(
    points_df: DataFrame,
    coverings: list[RegionCovering],
    cell_col: str = "cell_id",
) -> DataFrame:
    """Strategy chooser: broadcast-kernel match for small covering tables,
    shuffled prefix join beyond BROADCAST_COVERING_LIMIT."""
    total = sum(len(rc.cells) for rc in coverings)
    if total <= BROADCAST_COVERING_LIMIT:
        return candidate_match_kernel(points_df, coverings, cell_col)
    return candidate_join_smj(points_df, coverings, cell_col)


def _cell_index(poly: Polygon, max_edges_per_cell: int) -> PolygonCellIndex:
    """Build (or reuse a cached) cell index for a polygon.  The index is the
    expensive driver-side artifact (index-once-reuse-everywhere,
    s2loop.d:1078-1093) — cache it on the polygon object."""
    cache = getattr(poly, "_cell_index_cache", None)
    if cache is None:
        cache = poly._cell_index_cache = {}
    if max_edges_per_cell not in cache:
        cache[max_edges_per_cell] = PolygonCellIndex(
            poly, max_edges_per_cell=max_edges_per_cell
        )
    return cache[max_edges_per_cell]


def _polygon_pip_udf(indexes: dict[str, PolygonCellIndex], vertex_model: str = "semi_open"):
    """Arrow-batched exact PIP for boundary candidates via the per-cell
    clipped-edge index: each candidate point counts crossings from ITS OWN
    boundary cell's center against only that cell's <= max_edges_per_cell
    clipped edges (the reference's contains-center structure,
    s2contains_point_query.d:248-278 over mutable_s2shape_index.d cells) —
    never the whole polygon edge list."""
    payload = {}
    for rid, idx in indexes.items():
        by_level: dict[int, list[tuple[int, int]]] = {}
        records = []
        for ordinal, (cid, center, c_bit, near) in enumerate(idx.boundary):
            lvl = CellId(cid).level()
            signed = int(np.int64(np.uint64(cid) ^ np.uint64(1 << 63)))
            by_level.setdefault(lvl, []).append((signed, ordinal))
            # numpy-array edge storage: ~48 bytes/edge serialized vs ~200+
            # for python tuple floats — matters at 10^6-edge coastlines
            ea = np.asarray([idx.edges_a[e] for e in near], dtype=np.float64).reshape(-1, 3)
            eb = np.asarray([idx.edges_b[e] for e in near], dtype=np.float64).reshape(-1, 3)
            records.append((tuple(center), bool(c_bit), ea, eb))
        tables = []
        for lvl, rows in sorted(by_level.items()):
            rows.sort()
            nl = np.int64(1 << (2 * (30 - lvl)))
            cells = np.array([r[0] for r in rows], dtype=np.int64)
            ords = np.array([r[1] for r in rows], dtype=np.int64)
            tables.append((nl, cells, ords))
        payload[rid] = (tables, records)

    # ship the per-cell edge payload as a broadcast variable — ONE transfer
    # per executor — instead of pickling it into every task's UDF closure
    # (for a 10^6-edge polygon the closure would be tens of MB per stage)
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    bc_payload = spark.sparkContext.broadcast(payload)

    @F.pandas_udf(T.BooleanType())
    def pip_exact(
        region_id: pd.Series, cell_signed: pd.Series, lat: pd.Series, lng: pd.Series
    ) -> pd.Series:
        from ..s2core import coords
        from ..s2core import predicates as pred

        local_payload = bc_payload.value
        ids = cell_signed.to_numpy(dtype=np.int64)
        lat_np = lat.to_numpy(dtype=np.float64)
        lng_np = lng.to_numpy(dtype=np.float64)
        out = np.zeros(ids.shape[0], dtype=bool)
        for rid in region_id.unique():
            if rid not in local_payload:
                # UDFs in a disjunction are evaluated for every candidate
                # row, including non-polygon regions: those stay False here
                # (their own native predicate decides acceptance).
                continue
            tables, records = local_payload[rid]
            m = (region_id == rid).to_numpy()
            sub = ids[m]
            found = np.full(sub.shape[0], -1, dtype=np.int64)
            # boundary cells are disjoint subdivision leaves: at most one
            # level's ancestor matches per point
            for nl, cells, ords in tables:
                parents = (sub & -nl) | nl
                pos = np.searchsorted(cells, parents)
                pos_c = np.clip(pos, 0, cells.shape[0] - 1)
                hit = (pos < cells.shape[0]) & (cells[pos_c] == parents) & (found < 0)
                found[hit] = ords[pos_c[hit]]
            if (found >= 0).any():
                x, y, z = coords.latlng_to_xyz(lat_np[m], lng_np[m])
                res = np.zeros(sub.shape[0], dtype=bool)
                for o in np.unique(found[found >= 0]):
                    g = found == o
                    center, c_bit, ea, eb = records[int(o)]
                    # stored numpy arrays flow straight into the vectorized
                    # kernel — no per-batch tuple rebuild (round-3 finding #3)
                    counts = pred.crossings_with_edge_arrays(
                        center[0], center[1], center[2], x[g], y[g], z[g], ea, eb
                    )
                    r = ((counts & 1).astype(bool)) ^ c_bit
                    if vertex_model != "semi_open":
                        # a polygon vertex inside this cell is necessarily an
                        # endpoint of one of its clipped edges
                        from ..s2core.loops import _apply_vertex_model

                        verts = {tuple(v) for arr in (ea, eb) for v in arr}
                        r = _apply_vertex_model(
                            r, x[g], y[g], z[g], verts, vertex_model
                        )
                    res[g] = r
                out[m] = res
        return pd.Series(out)

    return pip_exact


def points_in_regions(
    points_df: DataFrame,
    regions: list[tuple[str, object]],
    lat_col: str = "lat",
    lng_col: str = "lng",
    cell_col: str = "cell_id",
    max_cells: int = 64,
    max_edges_per_cell: int = 16,
    vertex_model: str = "semi_open",
) -> DataFrame:
    """Full PIP join: returns points rows + region_id for every containment.

    Two-tier: interior covering hits pass through untested; boundary hits run
    the exact predicate for their region kind.  Caps/rects cover via the
    RegionCoverer; polygons use their cell index (clipped edge lists), whose
    interior/boundary cells double as the covering.
    """
    caps = {rid: r for rid, r in regions if isinstance(r, Cap)}
    rects = {rid: r for rid, r in regions if isinstance(r, LatLngRect)}
    polys = {rid: r for rid, r in regions if isinstance(r, Polygon)}

    simple = [(rid, r) for rid, r in regions if not isinstance(r, Polygon)]
    coverings = compute_coverings(simple, max_cells=max_cells) if simple else []
    poly_indexes = {}
    for rid, poly in polys.items():
        idx = _cell_index(poly, max_edges_per_cell)
        poly_indexes[rid] = idx
        coverings.append(RegionCovering(rid, poly, idx.covering_cells()))

    cand = candidate_join_auto(points_df, coverings, cell_col=cell_col)

    # SINGLE-PASS acceptance: interior hits pass untested; boundary hits run
    # the exact predicate for their region kind — all in one filter so the
    # point subtree (parquet scan + cell-id UDF) is evaluated exactly once
    # (a union of interior/boundary branches would recompute it per branch).
    lat_r = F.radians(F.col(lat_col))
    lng_r = F.radians(F.col(lng_col))
    px = F.cos(lng_r) * F.cos(lat_r)
    py = F.sin(lng_r) * F.cos(lat_r)
    pz = F.sin(lat_r)

    accept = F.col("is_interior")
    for rid, cap in caps.items():
        cx, cy, cz = cap.center
        d2 = (
            (px - F.lit(cx)) * (px - F.lit(cx))
            + (py - F.lit(cy)) * (py - F.lit(cy))
            + (pz - F.lit(cz)) * (pz - F.lit(cz))
        )
        accept = accept | ((F.col("region_id") == rid) & (d2 <= F.lit(cap.radius2)))
    for rid, rect in rects.items():
        lat_ok = (lat_r >= F.lit(rect.lat_lo)) & (lat_r <= F.lit(rect.lat_hi))
        if rect.lng.is_inverted():
            lng_ok = (lng_r >= F.lit(rect.lng.lo)) | (lng_r <= F.lit(rect.lng.hi))
        else:
            lng_ok = (lng_r >= F.lit(rect.lng.lo)) & (lng_r <= F.lit(rect.lng.hi))
        accept = accept | ((F.col("region_id") == rid) & lat_ok & lng_ok)
    if polys:
        pip = _polygon_pip_udf(poly_indexes, vertex_model=vertex_model)
        accept = accept | (
            F.col("region_id").isin(list(polys))
            & pip(F.col("region_id"), F.col(cell_col), F.col(lat_col), F.col(lng_col))
        )

    return cand.filter(accept).drop("is_interior")


def points_not_in_regions(
    points_df: DataFrame,
    regions: list[tuple[str, object]],
    key_cols: list[str],
    **kwargs,
) -> DataFrame:
    """Spatial anti-join: points contained by no region (left_anti on keys)."""
    hits = points_in_regions(points_df, regions, **kwargs).select(*key_cols).distinct()
    return points_df.join(hits, key_cols, "left_anti")
