"""Plan-shape regression tests: the 100 TB arguments, pinned.

Each test asserts a physical-plan property that the design relies on at
scale — these would not fail on correctness, only on a silent plan
regression (a reintroduced fact-table sort, a lost broadcast, a lost
filter pushdown), which is exactly why they are tested explicitly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _analyzed(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as e

    return e


def test_group_rect_bounds_has_no_window_over_fact(spark, entrymod):
    """Round-2 finding: per-band sort windows over the fact table are a
    scale-killer on low-cardinality group keys.  The binned-gap rewrite
    must keep Window out of the plan entirely."""
    df = entrymod.queries()["group_rect_bounds"](spark, SF_DIR)
    plan = _plan(df)
    assert "Window" not in plan, plan


def test_pip_join_does_not_shuffle_fact_table(spark, entrymod):
    """The covering join must be map-only on the point side: a broadcast
    membership probe + filter, no Exchange of the fact table (broadcast
    exchanges of the tiny dimension/mapping tables are fine)."""
    df = entrymod.queries()["pip_cap_join"](spark, SF_DIR)
    plan = _plan(df)
    for line in plan.splitlines():
        if "Exchange" not in line or "Broadcast" in line:
            continue
        # the loader's RoundRobin repartition spreads the single-split TEST
        # parquet across cores (a no-op on a real multi-split table) — any
        # hash/range exchange, i.e. a real join/agg shuffle, is a failure
        if "RoundRobinPartitioning" in line:
            continue
        raise AssertionError(f"fact-side shuffle in PIP plan: {line}\n{plan}")


def test_pip_join_evaluates_match_kernel_once(spark, entrymod):
    """Round-3 verdict finding #1: a size-filter between the covering-match
    Arrow kernel and the explode made Spark evaluate the UDF TWICE per fact
    row (no UDF dedup across the Filter barrier).  The plan must contain
    exactly ONE evaluation of ``match`` — the explode alone drops the
    empty-array rows."""
    df = entrymod.queries()["pip_cap_join"](spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("match(") == 1, plan


def test_pip_join_uses_broadcast_hash_join(spark, entrymod):
    df = entrymod.queries()["pip_cap_join"](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_column_pruning_reaches_scan(spark):
    """A two-column projection over the orders parquet must not read every
    column (ReadSchema pruned to the selected columns)."""
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey")
    plan = _plan(df)
    assert "ReadSchema: struct<o_orderkey" in plan
    # no other o_ columns in the read schema
    schema_line = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "o_custkey" not in schema_line


def test_filter_pushdown_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderkey") > 100)
        .select("o_orderkey")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(o_orderkey), GreaterThan(o_orderkey,100)]" in plan or (
        "GreaterThan(o_orderkey" in plan
    )


def test_dedup_lsh_has_single_signature_aggregation(spark, entrymod):
    """The minhash plan must evaluate the shingle->minima subtree ONCE: no
    self-join on the bucket keys (collect_list buckets), and the bucket cap
    window must reuse the (band, sig) hash partitioning — exactly one
    non-broadcast Exchange below the window+aggregate pair."""
    df = entrymod.queries()["dedup_minhash_lsh"](spark, SF_DIR)
    plan = _plan(df)
    all_shuffles = [
        ln for ln in plan.splitlines() if "Exchange" in ln and "Broadcast" not in ln
    ]
    # round 6: dedup._spread round-robins the raw doc rows across cores
    # BEFORE the shingle fan-out (the fixture parquet is one split, which
    # serialized the whole signature stage on one core).  That exchange
    # carries only (doc_id, text) pre-explode rows and is excluded from the
    # structural pin below; at most one such spread exchange may appear.
    spread = [ln for ln in all_shuffles if "roundrobinpartitioning" in ln.lower()]
    assert len(spread) <= 1, plan
    shuffles = [ln for ln in all_shuffles if ln not in spread]
    # exactly three shuffles: per-doc minima groupBy (doc_id), ONE (band,
    # sig) exchange shared by the cap window AND the bucket groupBy, and the
    # final pair distinct (tiny: candidates only)
    assert len(shuffles) <= 3, plan
    band_sig = [ln for ln in shuffles if "band" in ln and "sig" in ln]
    assert len(band_sig) == 1, plan
    assert plan.count("SortMergeJoin") == 0


def test_knn_result_is_local_relation(spark, entrymod):
    """Round-2 finding: kNN results re-executed every round's probe when
    consumed.  Driver-side assembly means the final result is a local
    relation (scan of pre-collected rows), not a live lineage."""
    df = entrymod.queries()["knn_join"](spark, SF_DIR)
    plan = _analyzed(df)
    # createDataFrame over collected rows shows as LogicalRDD/LocalRelation;
    # a live probe+window lineage would show Window/Join operators instead
    assert ("LocalRelation" in plan) or ("LogicalRDD" in plan), plan
    assert "Window" not in plan and "Join" not in plan, plan


def test_cell_partitioned_write_prunes_partitions(spark, tmp_path):
    """Cell-range partitioning must let a cell-range predicate prune
    partitions at the source (PartitionFilters on the hive-style layout)."""
    from s2geometry_d_spark.operators.partitioning import write_cell_partitioned
    from s2geometry_d_spark.sources.tables import spatial_points

    pts = spatial_points(spark, SF_DIR)
    path = str(tmp_path / "cellpart")
    write_cell_partitioned(pts, path)
    back = spark.read.parquet(path)
    tok = back.select("part_cell").distinct().limit(1).collect()[0][0]
    filtered = back.filter(F.col("part_cell") == tok)
    plan = _plan(filtered)
    assert "PartitionFilters" in plan and "part_cell" in plan


def test_bucketed_index_join_has_no_exchange(spark, tmp_path):
    """SURVEY §2.7's sort-order promise, demonstrated: when the polygon
    index table AND the point table are bucketed+sorted on the same stored
    join_key, the prefix join compiles with NO Exchange on either side
    (bucket-local SMJ), and the result matches the unbucketed path."""
    from s2geometry_d_spark.functions import kernels
    from s2geometry_d_spark.operators.poly_index import (
        build_polygon_index,
        points_in_polygons_bucketed,
        points_in_polygons_table,
        polygons_dataframe,
        write_bucketed_index,
    )
    from s2geometry_d_spark.plans import demo
    from s2geometry_d_spark.sources.tables import spatial_points

    regions = demo.many_poly_regions()[:50]
    idx = build_polygon_index(polygons_dataframe(spark, regions))
    jl = write_bucketed_index(
        idx, "t_idx_bucketed", n_buckets=8, path=str(tmp_path / "idx")
    )
    pts = spatial_points(spark, SF_DIR).withColumn(
        "join_key", kernels.parent_signed(F.col("cell_id"), jl)
    )
    (
        pts.write.format("parquet")
        .mode("overwrite")
        .bucketBy(8, "join_key")
        .sortBy("join_key")
        .option("path", str(tmp_path / "pts"))
        .saveAsTable("t_pts_bucketed")
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the join to be a real SMJ so bucketing (not a broadcast)
        # is what eliminates the shuffles
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = points_in_polygons_bucketed(
            spark.table("t_pts_bucketed"), spark.table("t_idx_bucketed")
        )
        plan = _plan(out)
        assert "SortMergeJoin" in plan, plan
        exchanges = [
            ln
            for ln in plan.splitlines()
            if "Exchange" in ln and "Broadcast" not in ln
        ]
        assert not exchanges, plan
        got = {(r["poly_id"], r["point_id"]) for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_pts_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_idx_bucketed")
    want = {
        (r["poly_id"], r["point_id"])
        for r in points_in_polygons_table(
            spatial_points(spark, SF_DIR), idx, join_level=jl
        ).collect()
    }
    assert got == want


def test_tile_assignment_evaluates_kernel_once(spark, entrymod):
    """Round-4 verdict finding #1: materializing tile_cells via withColumn
    before the explode let InferFiltersFromGenerate slip a size-filter
    between the Arrow kernel and the Generate, so the kernel evaluated
    TWICE per tile row (same bug class as the round-3 covering-match
    doubling).  Both tiling queries must evaluate ``tile_cells`` exactly
    once.

    The pin is about the UN-CACHED plan shape: if an earlier test cached a
    tile-assignment lineage, the substituted InMemoryRelation's stored
    build plan adds a second TEXTUAL tile_cells occurrence that is never
    re-executed — clear the cache so the count means evaluations."""
    spark.catalog.clearCache()
    for q in ("tile_assignment", "tile_assignment_stats"):
        df = entrymod.queries()[q](spark, SF_DIR)
        plan = _plan(df)
        assert plan.count("tile_cells(") == 1, (q, plan)


def test_edge_face_span_evaluates_kernel_once(spark, entrymod):
    """The span kernel is a struct-returning pandas UDF projected into two
    fields — the explode-inline pattern must keep it at ONE ArrowEvalPython
    (CollapseProject would otherwise clone the UDF per field)."""
    spark.catalog.clearCache()
    df = entrymod.queries()["edge_face_span"](spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("edge_face_span(") == 1, plan


def test_crossing_pairs_self_single_kernel_no_cartesian(spark, entrymod):
    """The single-table crossing sweep must stay candidate-driven: exactly
    ONE pair-kernel ArrowEvalPython (triage + exact fallback), and never a
    cartesian/nested-loop pair join — the all-pairs form is the oracle's
    job, not the engine's."""
    df = entrymod.queries()["crossing_pairs_self"](spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("crosses(") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_crossing_pairs_tables_single_kernel_no_cartesian(spark, entrymod):
    """Two-table crossing join: same discipline as the self sweep — one
    pair-kernel evaluation, candidates only from equi-joins."""
    df = entrymod.queries()["crossing_pairs_tables"](spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("crosses(") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_path_assembly_is_pure_catalyst(spark, entrymod):
    """PATH polyline assembly (pointer-doubling list ranking) claims to
    need no Python kernel anywhere — degrees, links, doubling rounds and
    the final rank join are all Catalyst equi-joins/aggregates.  Pin it:
    no Arrow/Batch Python evaluation in the final plan, and no cartesian
    product from the self-joins."""
    df = entrymod.queries()["assemble_polylines"](spark, SF_DIR)
    plan = _plan(df)
    assert "ArrowEvalPython" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
