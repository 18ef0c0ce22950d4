"""Streaming polyline-chain maintenance: PATH assembly under appends.

The builder's S2PolylineVectorLayer (operators/chains.py) as a
continuously-maintained artifact: edges arrive in micro-batches, and each
batch re-assembles ONLY the chains it can affect.  An appended edge
changes vertex degrees only at its own endpoints — but correctness needs
the rebuilt subgraph to be VERTEX-CLOSED: every live edge incident to
any vertex of the working set must join the working set, or a junction
vertex shared with an untouched chain would look interior inside the
partial subgraph and chains would wrongly merge across it.  The closure
is computed by a short fixpoint loop (touched chains pull in their
vertices, which pull in further chains); if it has not stabilized after
a bounded number of rounds, the batch falls back to a full rebuild.

LSM artifact shape (the same discipline as streaming shape-index
maintenance, index_stream.py), made idempotent per batch: each batch
OVERWRITES its own partition directory ``chains/batch_id=<b>`` (and
``tombstones/batch_id=<b>``), so a retried batch replaces its previous
partial output instead of appending duplicates, and the in-batch read
view only trusts partitions with batch_id < current (a crashed attempt's
own rows are invisible to its retry).  The live view keeps rows whose
batch tag is >= the chain's newest tombstone.  Chain ids are
CONTENT-DEFINED (minimum edge id of the component), so the incremental
result is row-for-row identical to a from-scratch assembly over all
edges seen — pinned by tests/test_streaming.py.
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

CLOSURE_MAX_ROUNDS = 10


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe through the Hadoop FileSystem API, so non-local
    artifact locations (hdfs://, s3a://) behave the same as local dirs
    (a driver-local os.path check would silently report them absent)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def read_live_chains(
    spark: SparkSession, out_dir: str, before_batch: int | None = None
) -> DataFrame:
    """Live chain view: rows whose batch tag is >= their chain's newest
    tombstone (chains never superseded have none).  ``before_batch``
    restricts both sides to partitions written by earlier batches — the
    in-batch read view, which must not see a crashed attempt of the
    CURRENT batch.  The tombstone side is edit-sized — broadcast."""
    rows = spark.read.parquet(f"{out_dir}/chains")
    # a crashed batch may have written chains/ but died before its first
    # tombstones/ partition existed (most acutely batch 0): the retry must
    # see an EMPTY tombstone set, not a PATH_NOT_FOUND that permanently
    # wedges the stream's documented idempotent-retry contract
    if _fs_exists(spark, f"{out_dir}/tombstones"):
        tombs = spark.read.parquet(f"{out_dir}/tombstones")
    else:
        tombs = spark.createDataFrame(
            [], "polyline_id long, batch_id long"
        )
    if before_batch is not None:
        rows = rows.filter(F.col("batch_id") < before_batch)
        tombs = tombs.filter(F.col("batch_id") < before_batch)
    tombs = tombs.groupBy("polyline_id").agg(F.max("batch_id").alias("t_max"))
    return (
        rows.join(F.broadcast(tombs), "polyline_id", "left")
        .filter(F.col("t_max").isNull() | (F.col("batch_id") >= F.col("t_max")))
        .select("polyline_id", "seq", "edge_id", "src", "dst")
    )


def _vertex_closed_affected(live: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Chain ids whose edges must be re-assembled with this batch: the
    fixpoint of 'chains incident to any working-set vertex'.  Returns
    None-equivalent (all chains) via the caller's fallback if the loop
    does not stabilize in CLOSURE_MAX_ROUNDS."""
    new_verts = (
        new_edges.select(F.col("src").alias("v"))
        .unionByName(new_edges.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def chains_touching(verts: DataFrame) -> DataFrame:
        t_src = live.join(
            verts.withColumnRenamed("v", "src"), "src", "left_semi"
        )
        t_dst = live.join(
            verts.withColumnRenamed("v", "dst"), "dst", "left_semi"
        )
        return (
            t_src.select("polyline_id")
            .unionByName(t_dst.select("polyline_id"))
            .distinct()
        )

    affected = chains_touching(new_verts).localCheckpoint(eager=True)
    n = affected.count()
    for _ in range(CLOSURE_MAX_ROUNDS):
        w_edges = live.join(affected, "polyline_id")
        w_verts = (
            w_edges.select(F.col("src").alias("v"))
            .unionByName(w_edges.select(F.col("dst").alias("v")))
            .unionByName(new_verts)
            .distinct()
        )
        bigger = chains_touching(w_verts).localCheckpoint(eager=True)
        m = bigger.count()
        if m == n:
            return bigger
        affected, n = bigger, m
    return None  # not closed — caller rebuilds everything


def chain_update_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Start (unawaited) an availableNow stream folding edge appends into
    the chain artifact at ``out_dir`` (chains/ + tombstones/, one
    partition directory per batch)."""
    from ..operators.chains import assemble_polylines

    reader = spark.readStream.schema(EDGE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        new_edges = batch_df.select("edge_id", "src", "dst").localCheckpoint(
            eager=True
        )
        affected = None
        have_artifact = _fs_exists(spark, f"{out_dir}/chains")
        if have_artifact:
            # lazy, prunable scans; every consumer is checkpointed (or
            # feeds assemble_polylines' eager input checkpoint) BEFORE
            # this batch writes, so no lineage re-reads its own output
            live = read_live_chains(spark, out_dir, before_batch=batch_id)
            affected = _vertex_closed_affected(live, new_edges)
            if affected is None:  # closure did not stabilize: full rebuild
                affected = live.select("polyline_id").distinct().localCheckpoint(
                    eager=True
                )
            old_edges = live.join(affected, "polyline_id").select(
                "edge_id", "src", "dst"
            )
            work = old_edges.unionByName(new_edges)
        else:
            work = new_edges
        rebuilt = assemble_polylines(work)
        # idempotent per batch: OVERWRITE this batch's own partition dir —
        # a retry replaces its crashed attempt instead of appending dupes
        rebuilt.write.mode("overwrite").parquet(
            f"{out_dir}/chains/batch_id={batch_id}"
        )
        tombs = (
            affected
            if affected is not None
            else spark.createDataFrame([], "polyline_id long")
        )
        tombs.write.mode("overwrite").parquet(
            f"{out_dir}/tombstones/batch_id={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
