"""Checkpoint/resume: kill after a partial stage, re-run, identical final
output, completed partitions skipped (FIXTURES.md F9 resume test)."""

import os

import pytest
from pyspark.sql import functions as F

from s2geometry_d_spark.operators.partitioning import (
    repartition_by_cell_range,
    salt_hot_cells,
    with_partition_token,
)
from s2geometry_d_spark.sources import tables
from s2geometry_d_spark.streaming.checkpoint import PipelineContext

from conftest import SF_DIR


@pytest.fixture()
def points(spark):
    return tables.spatial_points(spark, SF_DIR)


class TestResume:
    def test_partial_then_resume(self, spark, points, tmp_path):
        df = with_partition_token(points, level=1).cache()
        parts = sorted(r[0] for r in df.select("part_cell").distinct().collect())
        assert len(parts) >= 3

        root = str(tmp_path / "pipe")
        ctx = PipelineContext(spark, root, "run1")

        # simulate a crash: run only the first two partitions, "kill"
        for p in parts[:2]:
            import time

            t0 = time.time()
            path = os.path.join(ctx.stage_path("stage1"), f"part_cell={p}")
            df.filter(F.col("part_cell") == p).drop("part_cell").write.mode(
                "overwrite"
            ).parquet(path)
            ctx.record("stage1", str(p), "done", 0, int(1000 * (time.time() - t0)))

        assert ctx.completed_partitions("stage1") == {str(p) for p in parts[:2]}

        # resume: a fresh context over the same root runs only the remainder
        ctx2 = PipelineContext(spark, root, "run2")
        out = ctx2.run_stage("stage1", df)
        assert out.count() == df.count()
        # all partitions are now complete, and a third run does no work
        assert ctx2.completed_partitions("stage1") == {str(p) for p in parts}
        before = {
            f for f in os.listdir(ctx2._lineage_dir())
        }
        ctx3 = PipelineContext(spark, root, "run3")
        out3 = ctx3.run_stage("stage1", df)
        assert out3.count() == df.count()
        after = {f for f in os.listdir(ctx3._lineage_dir())}
        assert before == after  # no new lineage records -> nothing re-ran

    def test_lineage_table(self, spark, points, tmp_path):
        df = with_partition_token(points, level=0)
        ctx = PipelineContext(spark, str(tmp_path / "p2"), "runx")
        ctx.run_stage("s", df)
        lin = ctx.lineage()
        assert lin.filter(F.col("status") == "done").count() >= 1
        assert set(lin.columns) >= {"run_id", "stage", "partition_id", "status", "rows_out", "wall_ms"}


class TestPartitioning:
    def test_range_partitioning_locality(self, spark, points):
        df = repartition_by_cell_range(points, 8)
        # each partition owns a contiguous cell range: min/max ranges of
        # different partitions must not interleave
        stats = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.min("cell_id").alias("lo"), F.max("cell_id").alias("hi"))
            .collect()
        )
        spans = sorted([(r.lo, r.hi) for r in stats])
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2

    def test_salting_splits_hot_cells(self, spark, points):
        salted = salt_hot_cells(points, level=0, threshold=100, n_salts=4)
        dist = (
            salted.groupBy("parent_cell", "salt")
            .count()
            .groupBy("parent_cell")
            .agg(F.countDistinct("salt").alias("n_salts"), F.sum("count").alias("n"))
            .collect()
        )
        hot = [r for r in dist if r.n > 100]
        assert hot
        for r in hot:
            assert r.n_salts > 1  # hot cells actually split
        # salting preserves row count
        assert salted.count() == points.count()


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_salted_cell_join_matches_unsalted(spark):
    """A pathologically hot cell (most of the fact in one level-2 cell):
    the salted join must return the identical row set as the plain join
    while splitting the hot key across n_salts shuffle groups."""
    import numpy as np
    from pyspark.sql import functions as F

    from s2geometry_d_spark.functions import kernels
    from s2geometry_d_spark.operators.partitioning import salted_cell_join

    rng = np.random.default_rng(4)
    rows = []
    # 80% of points inside a ~1-degree blob (one hot coarse cell), the rest global
    for i in range(8000):
        rows.append((i, float(20 + rng.uniform(-0.5, 0.5)), float(30 + rng.uniform(-0.5, 0.5))))
    for i in range(8000, 10000):
        rows.append((i, float(np.degrees(np.arcsin(rng.uniform(-1, 1)))), float(rng.uniform(-180, 180))))
    fact = spark.createDataFrame(rows, ["point_id", "lat", "lng"]).withColumn(
        "cell_id", kernels.cell_from_latlng(F.col("lat"), F.col("lng"))
    )
    level = 2
    dim = (
        fact.select(kernels.parent_signed(F.col("cell_id"), level).alias("parent_cell"))
        .distinct()
        .withColumn("payload", F.col("parent_cell") % 97)
    )

    salted = salted_cell_join(fact, dim, level=level, threshold=1000, n_salts=8)
    plain = fact.withColumn(
        "parent_cell", kernels.parent_signed(F.col("cell_id"), level)
    ).join(dim, "parent_cell")
    key = lambda df: sorted(
        (r["point_id"], r["parent_cell"], r["payload"]) for r in df.collect()
    )
    assert key(salted) == key(plain)

    # the salting actually splits the hot key: max (parent_cell, salt) group
    # is several times smaller than the unsalted hot cell
    from s2geometry_d_spark.operators.partitioning import cell_histogram, salt_hot_cells

    hot_max = (
        cell_histogram(fact, level).agg(F.max("n_rows")).collect()[0][0]
    )
    salted_max = (
        salt_hot_cells(fact, level=level, threshold=1000, n_salts=8)
        .groupBy("parent_cell", "salt")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    # the blob straddles a level-2 cell boundary in this fixture; the
    # hottest cell still holds >half the blob
    assert hot_max >= 5000
    assert salted_max <= hot_max / 4  # 8 salts, allow hash imbalance


def test_salted_cell_join_rejects_outer_joins(spark):
    """ADVICE round-4: hot-cell dim rows are replicated across salts, so
    right/full outer joins would emit duplicate unmatched dim rows — the
    join must refuse those modes instead of silently breaking the
    unsalted-join equivalence."""
    import pytest

    from s2geometry_d_spark.operators.partitioning import salted_cell_join

    fact = spark.range(10).selectExpr("id", "cast(id + 1 as long) as cell_id")
    dim = spark.range(4).selectExpr("cast(id as long) as parent_cell", "id as payload")
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="unsupported"):
            salted_cell_join(fact, dim, level=10, threshold=2, how=how)
