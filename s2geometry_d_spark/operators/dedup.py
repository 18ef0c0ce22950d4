"""Deduplication operators over the ``documents`` table.

All variants are pure DataFrame plans (no UDFs) built from engine-portable
primitives (md5, substr, integer arithmetic) so the DuckDB oracle can state
the identical computation:

* exact dedup           — hash-groupBy on md5(text)
* MinHash + LSH         — shingle -> per-band min-hash signature -> bucket
                          self-join -> candidate pairs (banding theory)
* SimHash (16-bit)      — per-token md5 nibble sign-sum
* n-gram Jaccard        — shingle self-join, |A∩B| / (|A|+|B|-|A∩B|)

At 100 TB scale: the shingle explode is a flatMap (no shuffle); the LSH
bucket join shuffles on (band, signature) — high-cardinality keys, so it
partitions evenly; exact Jaccard runs only on LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHINGLE_LEN = 8
LSH_BANDS = 4


def shingles(docs: DataFrame) -> DataFrame:
    # single-pass variant (no re-join): explode positions carried with text
    return (
        docs.select(
            "doc_id",
            F.expr(
                f"explode(transform(sequence(1, greatest(1, length(text) - {SHINGLE_LEN - 1})),"
                f" p -> substring(text, p, {SHINGLE_LEN})))"
            ).alias("sh"),
        )
        .distinct()
    )


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups: (text_hash, n_docs, min_doc_id), n_docs > 1."""
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(docs: DataFrame, bands: int = LSH_BANDS) -> DataFrame:
    """Per-(doc, band) min-hash: min over shingles of md5(sh || '#' || band).
    md5-hex min is a valid uniform min-hash and is engine-portable.

    One groupBy pass computes all band minima as separate aggregates (one
    shuffle of the shingle set instead of a bands-x row explode), then
    unpivots — map-side partial aggregation keeps the shuffle tiny."""
    sh = shingles(docs)
    aggs = [
        F.min(F.md5(F.concat(F.col("sh"), F.lit(f"#{b}")).cast("binary"))).alias(f"sig{b}")
        for b in range(bands)
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    stack = ", ".join(f"{b}, sig{b}" for b in range(bands))
    return wide.selectExpr(
        "doc_id", f"stack({bands}, {stack}) AS (band, sig)"
    )


def dedup_minhash_lsh(docs: DataFrame, bands: int = LSH_BANDS) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any (band, signature)
    bucket; returns distinct (doc_a, doc_b) with doc_a < doc_b."""
    sigs = minhash_signatures(docs, bands)
    a = sigs.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = sigs.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit SimHash over space-separated tokens.

    Bit b = sign of sum over tokens of (+1 if the b-th hex nibble of
    md5(token) has its high bit set else -1); >=0 counts as set.  The nibble
    high-bit trick keeps the definition portable to ANSI SQL.
    """
    toks = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    toks = toks.withColumn("h", F.md5(F.col("tok").cast("binary")))
    bit_cols = []
    for b in range(16):
        nib = F.substring(F.col("h"), b + 1, 1)
        bit_cols.append(
            F.sum(
                F.when(nib.isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1)
            ).alias(f"s{b}")
        )
    agg = toks.groupBy("doc_id").agg(*bit_cols)
    sim = None
    for b in range(16):
        term = F.when(F.col(f"s{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else (sim + term)
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity >= threshold via shingle self-join.
    Returns (doc_a, doc_b, jac) with jac rounded for engine portability."""
    sh = shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jac",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jac") >= threshold)
        .select("doc_a", "doc_b", "jac")
    )
