"""Streaming shape-index maintenance: the MutableS2ShapeIndex
add/release contract (mutable_s2shape_index.d:100-180) fed by a
Structured Streaming source instead of driver calls.

Spark-first shape: each micro-batch indexes ONLY its delta shapes
(per-shape index rows are independent — operators/shape_index.py), appends
them to a parquet artifact, and records releases as tombstones; readers
reconstruct the live index with a broadcast anti-join (the standard
LSM/upsert pattern — base files are never rewritten, applyUpdates
compaction is poly_index.write_bucketed_index over the read view).

Source schema: ``op string (add|remove), poly_id string,
verts array<array<double>>`` — one row per shape edit, arriving in any
number of micro-batches.  Exactly-once: the foreachBatch append is
idempotent per batch_id via the streaming checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SHAPE_OPS_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("poly_id", T.StringType(), False),
        T.StructField("verts", T.ArrayType(T.ArrayType(T.DoubleType())), True),
    ]
)


def shape_index_update_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Start (unawaited) an availableNow stream applying shape edits to
    the index artifact at ``out_dir`` (rows/ + tombstones/)."""
    from ..operators.shape_index import polygons_index_rows

    reader = spark.readStream.schema(SHAPE_OPS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        adds = batch_df.filter(F.col("op") == "add").select("poly_id", "verts")
        rows = polygons_index_rows(adds)
        rows.write.mode("append").parquet(f"{out_dir}/rows")
        tombs = batch_df.filter(F.col("op") == "remove").select(
            F.col("poly_id").alias("shape_id")
        )
        tombs.write.mode("append").parquet(f"{out_dir}/tombstones")

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_streamed_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """Live index view over the streamed artifact: base rows minus
    tombstoned shapes (broadcast anti-join — the removal set is
    edit-sized).  Same schema as unified_shape_index, so every consumer
    (points_in_shapes, kNN, crossing) probes it unchanged."""
    rows = spark.read.parquet(f"{out_dir}/rows")
    tombs = spark.read.parquet(f"{out_dir}/tombstones").distinct()
    return rows.join(F.broadcast(tombs), "shape_id", "left_anti")
