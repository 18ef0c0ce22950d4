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
