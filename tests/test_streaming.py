"""Structured Streaming cell-occupancy rollup: AvailableNow micro-batch run
must equal the identical batch plan."""

import pytest
from pyspark.sql import functions as F

from s2geometry_d_spark.streaming.cell_stream import (
    cell_occupancy_batch,
    cell_occupancy_stream,
)

from conftest import SF_DIR


class TestCellStream:
    def test_stream_equals_batch(self, spark, tmp_path):
        events = spark.read.parquet(f"{SF_DIR}/events.parquet")
        schema = events.schema

        # the streaming file source requires a directory of files
        import shutil

        src = tmp_path / "events_src"
        src.mkdir()
        shutil.copy(f"{SF_DIR}/events.parquet", src / "part-0.parquet")

        stream_df = cell_occupancy_stream(spark, str(src), schema)
        q = (
            stream_df.writeStream.format("memory")
            .queryName("occ")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = {
            (str(r.window_start), r.parent_cell, r.n_events, r.sum_value)
            for r in spark.sql("select * from occ").collect()
        }
        want = {
            (str(r.window_start), r.parent_cell, r.n_events, r.sum_value)
            for r in cell_occupancy_batch(events).collect()
        }
        assert got == want
        assert len(want) > 0


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestStatefulDistinct:
    def test_stateful_stream_equals_batch(self, spark, tmp_path):
        """applyInPandasWithState distinct-entity state across MULTIPLE
        micro-batches (maxFilesPerTrigger=1 forces one batch per file):
        the last emission per cell must equal the batch distinct count."""
        from s2geometry_d_spark.streaming.cell_stream import (
            cell_distinct_entities_batch,
            cell_distinct_entities_stream,
        )

        events = spark.read.parquet(f"{SF_DIR}/events.parquet")
        schema = events.schema
        src = tmp_path / "events_src2"
        src.mkdir()
        # split events into 3 files -> 3 micro-batches, state must carry over
        parts = events.randomSplit([1.0, 1.0, 1.0], seed=7)
        for i, p in enumerate(parts):
            p.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"tmp{i}"))
            import glob
            import shutil

            f = glob.glob(str(tmp_path / f"tmp{i}" / "part-*.parquet"))[0]
            shutil.copy(f, src / f"part-{i}.parquet")

        stream_df = cell_distinct_entities_stream(
            spark, str(src), schema, level=3, max_files_per_trigger=1
        )
        q = (
            stream_df.writeStream.format("memory")
            .queryName("ent")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        import pandas as pd

        emitted = spark.sql("select * from ent").toPandas()
        assert len(emitted) > 0
        # last (running-total) emission per cell == max n_events per cell
        last = emitted.sort_values("n_events").groupby("parent_cell").tail(1)
        got = {
            (int(r.parent_cell), int(r.n_distinct), int(r.n_events))
            for _, r in last.iterrows()
        }
        want = {
            (r.parent_cell, r.n_distinct, r.n_events)
            for r in cell_distinct_entities_batch(events, level=3).collect()
        }
        assert got == want
        # state really carried across batches: some cell must have been
        # updated in more than one micro-batch
        assert (emitted.groupby("parent_cell").size() > 1).any()


class TestStreamingPIP:
    def test_pip_stream_equals_batch(self, spark, tmp_path):
        """The covering PIP join runs UNCHANGED on a stream (map-only on
        the fact side: broadcast kernel + native predicates, no shuffle) —
        append-mode micro-batches must reproduce the batch join exactly."""
        import shutil

        from s2geometry_d_spark.plans import demo
        from s2geometry_d_spark.streaming.cell_stream import pip_batch, pip_stream

        events = spark.read.parquet(f"{SF_DIR}/events.parquet")
        schema = events.schema
        src = tmp_path / "events_pip"
        src.mkdir()
        shutil.copy(f"{SF_DIR}/events.parquet", src / "part-0.parquet")

        regions = demo.all_regions()
        stream_df = pip_stream(spark, str(src), schema, regions)
        q = (
            stream_df.writeStream.format("memory")
            .queryName("pipstream")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_pip"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = {
            (r.region_id, r.event_id)
            for r in spark.sql("select * from pipstream").collect()
        }
        want = {(r.region_id, r.event_id) for r in pip_batch(events, regions).collect()}
        assert got == want
        assert len(want) > 0


class TestStreamingIndexMaintenance:
    def test_streamed_index_equals_scratch_build(self, spark, tmp_path):
        """Two micro-batches of shape edits (adds then adds+removes) must
        leave the SAME index a from-scratch build produces, row for row,
        and the same PIP answers through points_in_shapes."""
        from s2geometry_d_spark.operators.poly_index import polygons_dataframe
        from s2geometry_d_spark.operators.shape_index import (
            points_in_shapes,
            unified_shape_index,
        )
        from s2geometry_d_spark.plans import demo
        from s2geometry_d_spark.sources import tables
        from s2geometry_d_spark.streaming.index_stream import (
            SHAPE_OPS_SCHEMA,
            read_streamed_index,
            shape_index_update_stream,
        )

        regions = demo.many_poly_regions()[:60]
        half = len(regions) // 2

        def ops_rows(rs, op):
            return [
                (op, rid, [list(v) for v in poly.loops[0].vertices])
                for rid, poly in rs
            ]

        src = tmp_path / "edits"
        src.mkdir()
        # batch file 1: first half plus 5 decoys (copies of the first 5)
        decoys = [("rm:" + rid, poly) for rid, poly in regions[:5]]
        b1 = ops_rows(regions[:half] + decoys, "add")
        spark.createDataFrame(b1, SHAPE_OPS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / "f1.parquet"))
        # batch file 2: second half, and release the decoys
        b2 = ops_rows(regions[half:], "add") + [
            ("remove", rid, None) for rid, _ in decoys
        ]
        spark.createDataFrame(b2, SHAPE_OPS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / "f2.parquet"))

        out = tmp_path / "index"
        q = shape_index_update_stream(
            spark,
            f"{src}/*/",
            str(out),
            str(tmp_path / "ckpt"),
            max_files_per_trigger=1,
        )
        q.awaitTermination(180)

        live = read_streamed_index(spark, str(out))
        scratch = unified_shape_index(
            polys_df=polygons_dataframe(spark, regions)
        )

        def key(df):
            return {
                tuple(
                    (tuple(map(tuple, x)) if isinstance(x, list) else x)
                    for x in r
                )
                for r in df.select(
                    "shape_id", "dim", "cell_signed", "cov_level",
                    "is_interior", "ccx", "ccy", "ccz", "c_bit", "ea", "eb",
                ).collect()
            }

        got, want = key(live), key(scratch)
        assert got == want and len(want) > 0

        pts = tables.spatial_points(spark, SF_DIR).limit(2000)
        got_pip = {
            (r["poly_id"], r["point_id"])
            for r in points_in_shapes(pts, live)
            .select("poly_id", "point_id")
            .collect()
        }
        want_pip = {
            (r["poly_id"], r["point_id"])
            for r in points_in_shapes(pts, scratch)
            .select("poly_id", "point_id")
            .collect()
        }
        assert got_pip == want_pip


class TestCrossingStream:
    def test_crossing_stream_equals_batch_sweep(self, spark, tmp_path):
        """Three micro-batches of edges through crossing_pairs_stream must
        emit exactly the pairs the one-shot self sweep finds on the full
        table — each unordered pair once (within-batch pairs by the batch's
        own sweep, cross-batch pairs when the later edge arrives)."""
        import glob
        import shutil

        import numpy as np

        from s2geometry_d_spark.operators.crossing import crossing_pairs_self
        from s2geometry_d_spark.streaming.crossing_stream import (
            EDGE_STREAM_SCHEMA,
            crossing_pairs_stream,
            read_crossing_pairs,
        )

        rng = np.random.default_rng(77)
        rows = []
        for i in range(240):
            la, ln, lb, lnb = rng.uniform(-6.0, 6.0, 4)
            rows.append(
                (i, float(20 + la), float(30 + ln), float(20 + lb), float(30 + lnb))
            )

        src = tmp_path / "edges_src"
        src.mkdir()
        for i in range(3):
            chunk = rows[i * 80 : (i + 1) * 80]
            tmp = tmp_path / f"chunk{i}"
            spark.createDataFrame(chunk, EDGE_STREAM_SCHEMA).coalesce(
                1
            ).write.mode("overwrite").parquet(str(tmp))
            f = glob.glob(str(tmp / "part-*.parquet"))[0]
            shutil.copy(f, str(src / f"b{i}.parquet"))

        out = tmp_path / "out"
        q = crossing_pairs_stream(
            spark,
            str(src),
            str(out),
            str(tmp_path / "ckpt_cross"),
            max_files_per_trigger=1,
        )
        q.awaitTermination(240)

        got = {
            (r.id_a, r.id_b) for r in read_crossing_pairs(spark, str(out)).collect()
        }
        every = spark.createDataFrame(rows, EDGE_STREAM_SCHEMA)
        want = {(r.id_a, r.id_b) for r in crossing_pairs_self(every).collect()}
        assert want, "fixture produced no crossings"
        assert got == want
        # the accumulated artifact holds every edge exactly once
        assert spark.read.parquet(str(out / "edges")).count() == len(rows)


class TestDedupStream:
    def test_dedup_stream_equals_batch_pairs(self, spark, tmp_path):
        """Three micro-batches of documents through dedup_pairs_stream must
        emit exactly the candidate pairs the one-shot batch operator finds
        on the full corpus (no bucket exceeds the cap here, so the two cap
        policies coincide) — cross-batch duplicates land in the batch where
        the LATER document arrived, each pair exactly once."""
        import glob
        import shutil

        from s2geometry_d_spark.operators import dedup
        from s2geometry_d_spark.streaming.dedup_stream import (
            DOC_STREAM_SCHEMA,
            dedup_pairs_stream,
            read_dedup_pairs,
        )

        base = [
            f"the quick brown fox jumps over the lazy dog variant {i} "
            f"with some shared boilerplate text that makes shingles collide"
            for i in range(12)
        ]
        rows = []
        did = 0
        for rep in range(4):  # 4 near-copies of each base text
            for i, t in enumerate(base):
                rows.append((did, t + (f" rev{rep}" if rep else "")))
                did += 1
        rows += [(did + i, f"unique document {i} " + "x" * (40 + i)) for i in range(12)]

        src = tmp_path / "docs_src"
        src.mkdir()
        per = (len(rows) + 2) // 3
        for i in range(3):
            chunk = rows[i * per : (i + 1) * per]
            tmp = tmp_path / f"dchunk{i}"
            spark.createDataFrame(chunk, DOC_STREAM_SCHEMA).coalesce(
                1
            ).write.mode("overwrite").parquet(str(tmp))
            f = glob.glob(str(tmp / "part-*.parquet"))[0]
            shutil.copy(f, str(src / f"b{i}.parquet"))

        out = tmp_path / "dedup_out"
        q = dedup_pairs_stream(
            spark,
            str(src),
            str(out),
            str(tmp_path / "ckpt_dedup"),
            max_files_per_trigger=1,
        )
        q.awaitTermination(240)

        got = {
            (r.doc_a, r.doc_b)
            for r in read_dedup_pairs(spark, str(out)).collect()
        }
        every = spark.createDataFrame(rows, DOC_STREAM_SCHEMA)
        want = {
            (r.doc_a, r.doc_b)
            for r in dedup.dedup_minhash_lsh(every).collect()
        }
        assert want, "fixture produced no near-dup candidates"
        assert got == want


class TestChainStream:
    def test_incremental_chains_equal_batch(self, spark, tmp_path):
        """Two micro-batches of edge appends: batch 2 extends one chain,
        merges two others through a new bridge edge, turns an interior
        vertex into a junction (splitting), and adds a standalone chain.
        The live artifact must equal a from-scratch PATH assembly over
        all edges, and the untouched chain's rows must NOT be rewritten."""
        from s2geometry_d_spark.operators.chains import assemble_polylines
        from s2geometry_d_spark.streaming.chain_stream import (
            EDGE_SCHEMA,
            chain_update_stream,
            read_live_chains,
        )

        b1 = [(0, 0, 1), (1, 1, 2), (10, 10, 11), (11, 11, 12),
              (20, 20, 21), (30, 30, 31)]
        b2 = [(2, 2, 3), (15, 12, 20), (40, 11, 41), (50, 50, 51)]
        src = tmp_path / "edges"
        src.mkdir()
        for name, rows in (("f1", b1), ("f2", b2)):
            spark.createDataFrame(rows, EDGE_SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(src / f"{name}.parquet"))

        out = tmp_path / "out"
        q = chain_update_stream(
            spark,
            f"{src}/*/",
            str(out),
            str(tmp_path / "ckpt"),
            max_files_per_trigger=1,
        )
        q.awaitTermination(180)

        def key(df):
            return {
                (r.polyline_id, r.seq, r.edge_id, r.src, r.dst)
                for r in df.collect()
            }

        live = read_live_chains(spark, str(out))
        scratch = assemble_polylines(
            spark.createDataFrame(b1 + b2, EDGE_SCHEMA)
        )
        assert key(live) == key(scratch)
        # chain 30-31 touches no batch-2 vertex: its single row still
        # carries batch 0's tag (never rewritten)
        raw = spark.read.parquet(str(out / "chains"))
        rows30 = raw.filter(F.col("polyline_id") == 30).collect()
        assert len(rows30) == 1 and rows30[0].batch_id == 0
        # the junction split re-created pid 10 in batch 1 over its own
        # tombstone; the merged chain's old pid 20 stays dead
        live_pids = {r.polyline_id for r in live.select("polyline_id").distinct().collect()}
        assert 10 in live_pids and 20 not in live_pids

    def test_junction_shared_with_unaffected_chains(self, spark, tmp_path):
        """A batch touching two of the four chains meeting at a junction
        must NOT merge through it: the rebuild subgraph is vertex-closed,
        pulling in the other two incident chains so the junction keeps
        its true degree (review finding: partial-degree merge)."""
        from s2geometry_d_spark.operators.chains import assemble_polylines
        from s2geometry_d_spark.streaming.chain_stream import (
            EDGE_SCHEMA,
            chain_update_stream,
            read_live_chains,
        )

        b1 = [(100, 1, 10), (101, 2, 10), (102, 10, 3), (103, 10, 4)]
        b2 = [(200, 5, 1), (201, 3, 6)]
        src = tmp_path / "edges"
        src.mkdir()
        for name, rows in (("f1", b1), ("f2", b2)):
            spark.createDataFrame(rows, EDGE_SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(src / f"{name}.parquet"))
        out = tmp_path / "out"
        q = chain_update_stream(
            spark,
            f"{src}/*/",
            str(out),
            str(tmp_path / "ckpt"),
            max_files_per_trigger=1,
        )
        q.awaitTermination(180)

        def key(df):
            return {
                (r.polyline_id, r.seq, r.edge_id, r.src, r.dst)
                for r in df.collect()
            }

        live = read_live_chains(spark, str(out))
        scratch = assemble_polylines(
            spark.createDataFrame(b1 + b2, EDGE_SCHEMA)
        )
        assert key(live) == key(scratch)
        pids = {r.polyline_id for r in live.collect()}
        assert pids == {100, 101, 102, 103}  # junction did NOT merge
