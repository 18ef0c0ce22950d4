"""Streaming near-duplicate detection: each micro-batch of NEW documents
is LSH-checked against the accumulated signature artifact and against
itself, then its signatures join the artifact — incremental corpus dedup,
the training-data-pipeline shape of dedup_minhash_lsh.

Artifact layout at ``out_dir``:
  sigs/    (doc_id, band, sig)   one row per banded min-hash signature
  counts/  (band, sig, cnt)      per-batch bucket-count deltas (summed on read)
  pairs/   (doc_a, doc_b)        every emitted candidate pair, doc_a < doc_b

Pairs are emitted for a bucket only while its ACCUMULATED size stays
within ``bucket_cap`` — once a bucket grows past the cap it stops
producing (a hot shingle pattern, same protection as the batch operator).
A pair found earlier is never re-emitted: the new side of every join is
the current batch, so (a, b) can only appear in the batch where the LATER
document arrived (or their shared batch, deduped there).  Equals the
one-shot batch operator whenever no bucket ever exceeds the cap (pinned
by the stream==batch parity test); for capped buckets the stream keeps
the pairs it emitted before the cap hit, where batch drops the whole
bucket — disclosed divergence, both are valid cap policies.

The accumulated artifact is only ever scanned with a broadcast-bucket
semi-join on (band, sig) — at 100 TB that key is the artifact's
partition-pruning key; history is never re-shingled or re-hashed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


def dedup_pairs_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    bucket_cap: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Start (unawaited) an availableNow stream over (doc_id, text) rows,
    emitting near-dup candidate pairs to ``out_dir``/pairs and maintaining
    the signature artifact."""
    from ..operators import dedup

    cap = bucket_cap if bucket_cap is not None else dedup.BUCKET_CAP

    reader = spark.readStream.schema(DOC_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select("doc_id", "text").localCheckpoint(eager=True)
        new_sigs = dedup.minhash_signatures(batch).localCheckpoint(eager=True)
        new_cnt = new_sigs.groupBy("band", "sig").agg(
            F.count(F.lit(1)).alias("ncnt")
        )
        try:
            acc_cnt = (
                spark.read.parquet(f"{out_dir}/counts")
                .groupBy("band", "sig")
                .agg(F.sum("cnt").alias("acnt"))
            )
            acc_sigs = spark.read.parquet(f"{out_dir}/sigs")
        except Exception:
            acc_cnt = None
            acc_sigs = None

        if acc_cnt is not None:
            tot = new_cnt.join(acc_cnt, ["band", "sig"], "left").select(
                "band",
                "sig",
                (F.col("ncnt") + F.coalesce(F.col("acnt"), F.lit(0))).alias(
                    "tot"
                ),
            )
        else:
            tot = new_cnt.select("band", "sig", F.col("ncnt").alias("tot"))
        ok = tot.filter((F.col("tot") > 1) & (F.col("tot") <= cap)).select(
            "band", "sig"
        )

        a_side = new_sigs.join(F.broadcast(ok), ["band", "sig"]).select(
            "band", "sig", F.col("doc_id").alias("doc_a")
        )
        b_new = new_sigs.select("band", "sig", F.col("doc_id").alias("doc_b"))
        b_all = (
            b_new.unionByName(
                acc_sigs.join(F.broadcast(ok), ["band", "sig"]).select(
                    "band", "sig", F.col("doc_id").alias("doc_b")
                )
            )
            if acc_sigs is not None
            else b_new
        )
        pairs = (
            a_side.join(b_all, ["band", "sig"])
            .filter(F.col("doc_a") != F.col("doc_b"))
            .select(
                F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"),
            )
            .distinct()
        )

        pairs.write.mode("append").parquet(f"{out_dir}/pairs")
        new_sigs.write.mode("append").parquet(f"{out_dir}/sigs")
        new_cnt.select(
            "band", "sig", F.col("ncnt").alias("cnt")
        ).write.mode("append").parquet(f"{out_dir}/counts")

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_dedup_pairs(spark: SparkSession, out_dir: str) -> DataFrame:
    """All candidate pairs emitted so far: (doc_a, doc_b), doc_a < doc_b."""
    return spark.read.parquet(f"{out_dir}/pairs").distinct()
