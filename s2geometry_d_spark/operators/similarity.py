"""Similarity search over the ``embeddings`` table (array<float> column).

* brute-force cosine top-k — the correctness baseline: native
  ``zip_with``/``aggregate`` dot products (JVM-side, no Python);
* LSH-bucketed variant — deterministic random-hyperplane signatures reduce
  the candidate set; the scale path for 10^12 rows (bucket equi-join
  instead of a cross join).

Scores are rounded before ranking so result order is reproducible across
engines (float sums may differ in the last ulp between systems).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROUND_DIGITS = 6


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """Top-k cosine neighbours of the first ``n_queries`` vectors.
    Returns (query_id, rank, neighbor_id, sim)."""
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cand = embeddings.select(F.col("vec_id").alias("neighbor_id"), "embedding").crossJoin(
        F.broadcast(q)
    )
    cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    sim = F.round(
        _dot(F.col("embedding"), F.col("qv"))
        / (_norm(F.col("embedding")) * _norm(F.col("qv"))),
        ROUND_DIGITS,
    )
    scored = cand.withColumn("sim", sim)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def hyperplane_signatures(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Deterministic LSH: plane p has components sin((i+1)*(p+1)) over dims i
    (pseudo-random, engine-reproducible); signature bit = dot >= 0."""
    sig = None
    for p in range(n_planes):
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.sequence(F.lit(1), F.size("embedding")),
                lambda x, i: x.cast("double") * F.sin(i.cast("double") * float(p + 1)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = bit if sig is None else (sig + bit)
    return embeddings.select("vec_id", "embedding", sig.cast("int").alias("bucket"))


def cosine_topk_lsh(
    embeddings: DataFrame, n_queries: int = 8, k: int = 5, n_planes: int = 6
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket (plus
    brute-force fallback is NOT applied — this is the approximate variant)."""
    sigs = hyperplane_signatures(embeddings, n_planes)
    q = sigs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket"),
    )
    cand = sigs.select(F.col("vec_id").alias("neighbor_id"), "embedding", "bucket").join(
        F.broadcast(q), "bucket"
    )
    cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    sim = F.round(
        _dot(F.col("embedding"), F.col("qv"))
        / (_norm(F.col("embedding")) * _norm(F.col("qv"))),
        ROUND_DIGITS,
    )
    scored = cand.withColumn("sim", sim)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )
