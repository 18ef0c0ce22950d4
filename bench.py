"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "spatial_rows_per_sec": ...}

The authoritative target (BASELINE.json) is spatial-join rows/sec over
PIP + kNN + tile-assignment; scaling-efficiency evidence between two
parallelism levels is produced by scripts/scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# queries counted in the headline spatial-join throughput metric
SPATIAL = [
    "pip_cap_join",
    "pip_rect_join",
    "pip_poly_join",
    "pip_bigpoly_join",
    "knn_join",
    "knn_edges_join",
    "tile_assignment",
]
# additional engine coverage included in total wall time
EXTRA = [
    "cell_roundtrip",
    "within_distance_polyline",
    "crossing_edges_join",
    "knn_edges_maxdist",
    "knn_edge_targets",
    "furthest_join",
    "nearest_polyline_join",
    "polygon_overlay",
    "clip_polylines",
    "polygon_union_many",
    "polygon_relations",
    "tile_containment_check",
    "tile_pixel_stats",
    "image_dedup",
    "group_rect_bounds",
    "cell_area_stats",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "simhash16",
    "ann_cosine_topk",
    "ann_cosine_ivf",
    "fingerprint",
    "dedup_exact",
    "lang_id",
    # round 4
    "polygon_overlay_holes",
    "knn_edges_maxerror",
    "tile_assignment_stats",
    # round 5
    "polygon_overlay_symdiff",
    "snap_polygons",
    "pip_unified_index",
    "crossing_unified_index",
    "knn_unified_index",
    "polygon_overlay_holes_symdiff",
    "ann_recall_stats",
    "validate_polygons",
    "phash_neardup",
    "text_format_roundtrip",
    "pip_text_index",
    # round 5, final sweep
    "pip_incremental_index",
    "index_region_check",
    "index_union_bound_check",
    "knn_maxdist",
    "knn_maxerror",
    "knn_region",
    "knn_cell_targets",
    "knn_table_join",
    "edge_face_span",
    "crossing_pairs_self",
    "crossing_pairs_tables",
    "image_resize_stats",
    "video_frame_sample",
    "dedup_clusters",
    # round 5, continuation batch
    "sample_stratified",
    "dataset_mixture",
    "shard_by_token_budget",
    "snap_polylines",
    "assemble_polylines",
    "build_polyline_graph",
    "id_set_lexicon",
    "dedup_keep_best",
    "event_chains",
    "audio_chunk_stats",
]


def force(df) -> int:
    """Force full evaluation of every column (count() alone would let
    Catalyst prune the expensive projections)."""
    from pyspark.sql import functions as F

    hashed = df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("_h"))
    row = hashed.agg(
        F.count(F.lit(1)).alias("n"), F.expr("bit_xor(_h)").alias("h")
    ).collect()[0]
    return int(row["n"])


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("s2spark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.unix.domain.socket.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    # warm the JVM + Arrow path AND the Python UDF workers once (excluded
    # from timings).  token_count is pure SQL expressions — it never starts
    # a Python worker, so without a pandas-UDF warmup the FIRST spatial
    # query pays the full 32-worker import storm (~6s of fixed overhead
    # that has nothing to do with the engine; measured round 4:
    # points+cell-kernel 7.2s cold vs 0.8s warm at sf0.1).
    force(qs["token_count"](spark, SF_DIR))
    force(qs["cell_roundtrip"](spark, SF_DIR))

    # min over 2 runs per query: the sandbox shows 10-30x scheduler noise on
    # identical jobs; min-of-N is the standard way to report the engine's
    # actual cost rather than the machine's worst hiccup
    for name in SPATIAL + EXTRA:
        best = None
        for _ in range(2):
            t0 = time.time()
            rows[name] = force(qs[name](spark, SF_DIR))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        # incremental per-query evidence on stderr (round-4 lesson: the
        # final JSON line alone is a single point of failure if teardown
        # garbles the stream — BENCH_r04 was lost exactly that way)
        print(
            json.dumps({"query": name, "sec": timings[name], "rows": rows[name]}),
            file=sys.stderr,
            flush=True,
        )

    # spatial throughput: input rows driven through the three join families
    import duckdb

    n_points = duckdb.sql(
        f"select count(*) from read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchone()[0]
    n_docs = duckdb.sql(
        f"select count(*) from read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    spatial_rows_in = 6 * n_points + n_docs * 16  # 4 PIP + 2 kNN scans + tiles
    spatial_secs = sum(timings[q] for q in SPATIAL)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline query wall time (spatial joins + pipeline ops)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "rows": rows,
        "spatial_rows_per_sec": round(spatial_rows_in / spatial_secs, 1),
        "spatial_secs": round(spatial_secs, 3),
        "spatial_rows_in": spatial_rows_in,
    }
    # write the artifact to disk BEFORE printing / stopping: a garbled
    # teardown (pyspark daemon BrokenPipeError spam ate the round-4 driver
    # artifact) can no longer zero the round's bench evidence
    line = json.dumps(out)
    try:
        os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"), exist_ok=True)
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "last_run.json"), "w"
        ) as f:
            f.write(line + "\n")
    except OSError:
        pass
    # stdout is BLOCK-buffered when piped: without an explicit flush the
    # JSON line sits in the buffer until interpreter exit and flushes
    # interleaved with worker-shutdown stderr spam.  Flush NOW, atomically.
    print(line, flush=True)
    try:
        spark.stop()
    except Exception:
        pass
    # skip atexit/py4j teardown that can raise after the work is done
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
