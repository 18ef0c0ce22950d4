"""Streaming polyline-chain maintenance: PATH assembly under appends.

The builder's S2PolylineVectorLayer (operators/chains.py) as a
continuously-maintained artifact: edges arrive in micro-batches, and each
batch re-assembles ONLY the chains it can affect.  An appended edge
changes vertex degrees only at its own endpoints, so exactly the chains
touching a batch vertex can merge, extend, or split — every other chain
is untouched and its rows are never rewritten.

LSM artifact shape (the same discipline as streaming shape-index
maintenance, index_stream.py): each batch appends re-assembled rows
tagged with its batch id to ``chains/`` and writes one tombstone
(polyline_id, batch_id) per superseded chain; the live view keeps rows
whose batch tag is >= the chain's latest tombstone.  Chain ids are
CONTENT-DEFINED (minimum edge id of the component), so the incremental
result is row-for-row identical to a from-scratch assembly over all
edges seen — pinned by tests/test_streaming.py.

Exactly-once: the foreachBatch append is idempotent per batch_id via the
streaming checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("edge_id", T.LongType(), False),
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)


def read_live_chains(spark: SparkSession, out_dir: str) -> DataFrame:
    """Live chain view: rows whose batch tag is >= their chain's newest
    tombstone (chains never superseded have none).  The tombstone side is
    edit-sized — broadcast."""
    rows = spark.read.parquet(f"{out_dir}/chains")
    tombs = (
        spark.read.parquet(f"{out_dir}/tombstones")
        .groupBy("polyline_id")
        .agg(F.max("batch_id").alias("t_max"))
    )
    return (
        rows.join(F.broadcast(tombs), "polyline_id", "left")
        .filter(F.col("t_max").isNull() | (F.col("batch_id") >= F.col("t_max")))
        .select("polyline_id", "seq", "edge_id", "src", "dst")
    )


def chain_update_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Start (unawaited) an availableNow stream folding edge appends into
    the chain artifact at ``out_dir`` (chains/ + tombstones/)."""
    import os

    from ..operators.chains import assemble_polylines

    reader = spark.readStream.schema(EDGE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        new_edges = batch_df.select("edge_id", "src", "dst").localCheckpoint(
            eager=True
        )
        have_artifact = os.path.isdir(f"{out_dir}/chains")
        if have_artifact:
            # NOT checkpointed: materializing the whole artifact per batch
            # would scan everything eagerly; as lazy scans, the semi-join
            # and the affected-edge join stay prunable, and both are
            # consumed by eager checkpoints (affected below, and
            # assemble_polylines' input checkpoint) BEFORE this batch
            # appends to chains/, so no lineage re-reads the files it is
            # about to write.
            live = read_live_chains(spark, out_dir)
            batch_verts = (
                new_edges.select(F.col("src").alias("v"))
                .unionByName(new_edges.select(F.col("dst").alias("v")))
                .distinct()
            )
            # two broadcast equi-semi-joins, NOT one OR-condition join
            # (an OR predicate degrades to a nested-loop join)
            touched_src = live.join(
                F.broadcast(batch_verts.withColumnRenamed("v", "src")),
                "src",
                "left_semi",
            )
            touched_dst = live.join(
                F.broadcast(batch_verts.withColumnRenamed("v", "dst")),
                "dst",
                "left_semi",
            )
            affected = (
                touched_src.select("polyline_id")
                .unionByName(touched_dst.select("polyline_id"))
                .distinct()
                .localCheckpoint(eager=True)
            )
            old_edges = live.join(affected, "polyline_id").select(
                "edge_id", "src", "dst"
            )
            work = old_edges.unionByName(new_edges)
        else:
            affected = None
            work = new_edges
        rebuilt = assemble_polylines(work).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        rebuilt.write.mode("append").parquet(f"{out_dir}/chains")
        if affected is not None:
            affected.withColumn(
                "batch_id", F.lit(batch_id).cast("long")
            ).write.mode("append").parquet(f"{out_dir}/tombstones")
        else:
            # batch 0: create an empty tombstone table so readers always
            # find both sides of the artifact
            spark.createDataFrame(
                [], "polyline_id long, batch_id long"
            ).write.mode("append").parquet(f"{out_dir}/tombstones")

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
