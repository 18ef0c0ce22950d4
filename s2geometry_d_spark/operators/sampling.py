"""Training-data sampling / sharding / mixture operators over ``documents``.

A 100 TB corpus prep pipeline needs deterministic, *engine-portable*
randomness: re-running the job (or auditing it in another engine) must
select the same rows.  The trick used throughout: ``u = substr(md5(key),
1, 8)`` compared LEXICOGRAPHICALLY against a lowercase-hex threshold.
Lowercase-hex ordering is monotone in the encoded integer (equal length,
alphabet '0'-'9' < 'a'-'f'), so ``u < format(round(rate * 16^8), '08x')``
accepts an (almost exactly) ``rate`` fraction — identically in Spark and
DuckDB, with no engine-specific hash() and no float in the accept test.
``rate >= 1`` uses the sentinel threshold ``'g'`` ('g' sorts after every
hex digit, so all rows pass without a 9-char threshold breaking the
equal-length ordering argument).

All three operators are pure Catalyst expressions (no UDF):

* ``sample_stratified`` — per-stratum Bernoulli sampling: map-only, no
  shuffle; at 100 TB this is a scan + filter that AQE coalesces.
* ``dataset_mixture`` — per-source up/down-weighting via deterministic
  fractional replication (floor(w) copies + one more with prob frac(w)):
  map-only explode, output size = sum(w_s * n_s), no shuffle.
* ``shard_by_token_budget`` — fixed-token-budget shard assignment: one
  window per ``source`` partition (parallel across sources; no global
  ordering bottleneck — the 100 TB version would sub-split giant sources
  by a hash prefix and offset the partial sums, same two-phase trick as
  any distributed prefix sum).

The trailing ``orderBy`` each operator applies is for DETERMINISTIC OUTPUT
ORDER only (the oracle-hash contract of the bundled queries); it adds a
range-partitioning sort over the output, so the map-only scale claims
above describe the operators WITHOUT it — a 100 TB caller that does not
need ordered output should drop the sort (it is the last plan node and
changes no row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SIXTEEN_POW_8 = 16**8


def rate_threshold(rate: float) -> str:
    """Lowercase-hex accept threshold for ``u8 < threshold`` sampling."""
    if rate >= 1.0:
        return "g"  # sorts after 'f': accepts every 8-hex-digit u
    n = max(0, min(SIXTEEN_POW_8, int(round(rate * SIXTEEN_POW_8))))
    return format(n, "08x")


def _u8(key_col, salt: str):
    """First 8 hex digits of md5(key || ':' || salt) — the portable
    uniform draw (Spark md5 takes binary; utf-8 cast matches DuckDB's
    md5(varchar))."""
    return F.substring(
        F.md5(F.concat(key_col.cast("string"), F.lit(":" + salt)).cast("binary")),
        1,
        8,
    )


def sample_stratified(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    stratum_col: str = "lang",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample of ``documents``.

    Returns (doc_id, <stratum_col>, source, n_chars) for kept rows.  The
    reference corpus analogue is the point-index sampling the S2 tests do
    per-level; here the stratifier is the training-data rebalancer (keep
    25% of English, all of the tail languages, ...).
    """
    u = _u8(F.col("doc_id"), "strat")
    thr = F.lit(rate_threshold(default_rate))
    for stratum in sorted(rates):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(rate_threshold(rates[stratum]))
        ).otherwise(thr)
    return (
        docs.where(u < thr)
        .select("doc_id", stratum_col, "source", "n_chars")
        .orderBy("doc_id")
    )


def dataset_mixture(docs: DataFrame, weights: dict[str, float]) -> DataFrame:
    """Deterministic per-source mixture weighting: each doc appears
    ``floor(w)`` times plus one more iff its uniform draw < frac(w).

    Output (doc_id, source, copy) with copy in 1..n_copies; sources
    absent from ``weights`` default to weight 1.0.  Map-only: the explode
    multiplies rows locally, nothing shuffles.
    """
    base = F.lit(1)
    frac_thr = F.lit(rate_threshold(0.0))
    for source in sorted(weights):
        w = weights[source]
        base = F.when(F.col("source") == source, F.lit(int(w))).otherwise(base)
        frac_thr = F.when(
            F.col("source") == source, F.lit(rate_threshold(w - int(w)))
        ).otherwise(frac_thr)
    u = _u8(F.col("doc_id"), "mix")
    n_copies = base + F.when(u < frac_thr, F.lit(1)).otherwise(F.lit(0))
    return (
        docs.select("doc_id", "source", n_copies.alias("n_copies"))
        .where(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy"),
        )
        .withColumn("copy", F.col("copy").cast("long"))
        .orderBy("doc_id", "copy")
    )


def shard_by_token_budget(docs: DataFrame, budget: int) -> DataFrame:
    """Assign each document to a fixed-token-budget shard within its
    ``source`` stream: shard = floor(starting_token_offset / budget) over
    the doc_id-ordered per-source prefix sum.

    Output (doc_id, source, n_tokens, shard).  The window partitions by
    source, so sources pack in parallel; no global sort.
    """
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.floor((cum - F.col("n_tokens")) / F.lit(budget)).alias("shard"),
        )
        .orderBy("doc_id")
    )
