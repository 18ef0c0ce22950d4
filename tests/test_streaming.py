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
