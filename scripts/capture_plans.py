"""Regenerate docs/PLANS.md: executed physical plans of flagship queries
captured at sf0.001 (plan SHAPE is scale-invariant; the load-bearing
properties are additionally asserted by tests/test_plan_shapes.py on every
run).  Run:  python scripts/capture_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

SECTIONS = [
    (
        "pip_cap_join",
        "the flagship covering join: broadcast membership probe, map-only on "
        "the fact side; the match kernel evaluates ONCE (plan-pinned since "
        "round 4)",
    ),
    (
        "group_rect_bounds",
        "binned gap scan: single fact scan (lat stats folded into the same "
        "aggregate), no Window; round-5 rewrite folds the driver phase with "
        "numpy and sizes bins so refinement never scans twice at this "
        "density — the result is a LocalRelation select",
    ),
    (
        "dedup_minhash_lsh",
        "one (band, sig) exchange shared by cap window and bucket groupBy",
    ),
    (
        "knn_join",
        "driver-assembled result: LocalRelation, no live probe lineage",
    ),
    (
        "pip_many_poly_table",
        "index-table PIP: prefix equi-join + row-payload parity, no driver "
        "geometry",
    ),
    (
        "tile_assignment",
        "round-5 shape: per-tile area level (pure expressions, no lookup "
        "join) and ONE ArrowEvalPython for tile_cells — the explode consumes "
        "the UDF call inline, so InferFiltersFromGenerate cannot split it "
        "into a doubled kernel (the round-4 finding)",
    ),
    (
        "tile_containment_check",
        "single-exchange ancestor equi-join, no interpreted exists(), no "
        "per-probe array duplication; the per-tile aggregate subtree is "
        "localCheckpointed so three consumers read it once",
    ),
    (
        "edge_face_span",
        "round-5: struct-returning pandas UDF projected into two fields via "
        "the explode-inline pattern — ONE ArrowEvalPython even though "
        "CollapseProject would clone the UDF per extracted field",
    ),
    (
        "index_region_check",
        "round-5: index-as-region contains/mayIntersect for a 3-level "
        "target-cell table — broadcast-hash index joins (the target side "
        "never exchanges), Arrow kernels only on the boundary slice, one "
        "exploded pass for all levels",
    ),
    (
        "knn_table_join",
        "round-5: table-to-table closest-edge join result — the round "
        "pipeline retires queries by anti-join with per-round lineage "
        "truncation, so the returned plan reads checkpointed round outputs, "
        "not a re-executable probe cascade",
    ),
    (
        "crossing_pairs_self",
        "round-5: single-TABLE crossing sweep (visit_crossing_edge_pairs) — "
        "candidates from ONE cell/ancestor equi-join over the registered "
        "index, unordered distinct, ONE exact pair kernel; no cartesian "
        "or nested-loop pair join anywhere",
    ),
    (
        "assemble_polylines",
        "round-5: builder POLYLINE layer PATH assembly by pointer-doubling "
        "list ranking — the final plan is checkpointed-round scans + "
        "equi-joins + one groupBy, NO Python evaluation node anywhere "
        "(plan-pinned); min-label propagation would instead burn rounds "
        "proportional to chain length",
    ),
]


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.python.unix.domain.socket.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out = [
        "# PLANS — executed physical plans of flagship queries",
        "",
        "Captured with `explain` at sf0.001 (plans are scale-invariant in "
        "shape); tests/test_plan_shapes.py asserts the load-bearing "
        "properties on every run.  Regenerate with "
        "`python scripts/capture_plans.py`.",
        "",
    ]
    for name, note in SECTIONS:
        df = qs[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # clip very long lines (plans embed full literal lists)
        lines = [ln[:160] for ln in plan.splitlines()]
        out += [f"## {name}", f"*{note}*", "", "```", *lines, "```", ""]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "docs", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote docs/PLANS.md")
    spark.stop()
    os._exit(0)


if __name__ == "__main__":
    main()
