"""Deduplication operators over the ``documents`` table.

All variants are pure DataFrame plans (no UDFs) built from engine-portable
primitives (md5, substr, integer arithmetic) so the DuckDB oracle can state
the identical computation:

* exact dedup           — hash-groupBy on md5(text)
* MinHash + LSH         — shingle -> b bands x r rows min-hash signature
                          (concatenated minima per band) -> capped bucket
                          self-join -> candidate pairs (banding theory)
* SimHash (16-bit)      — per-token md5 nibble sign-sum
* n-gram Jaccard        — exact Jaccard computed ONLY over LSH candidate
                          pairs (no shingle self-join anywhere in the plan)

At 100 TB scale: the shingle explode is a flatMap (no shuffle); the LSH
bucket join shuffles on (band, signature) — high-cardinality keys, so it
partitions evenly.  With r>=2 rows per band the candidate probability is
1-(1-j^r)^b (a sharp S-curve: j=0.5 -> 0.68, j=0.15 -> 0.09 at b=4,r=2)
instead of the near-linear 1-(1-j)^b of r=1, so weakly-similar documents
stop flooding the bucket join.  BUCKET_CAP drops degenerate buckets
(boilerplate shingle sets) before the quadratic within-bucket pairing —
both engines state the cap identically, so it is part of the operator's
definition, not an approximation of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHINGLE_LEN = 8
LSH_BANDS = 4
LSH_ROWS = 2  # minima concatenated per band
BUCKET_CAP = 200  # buckets larger than this are dropped entirely
# label tables at or below this row count use broadcast rounds in
# dedup_clusters (see the strategy note there); above it, shuffle joins
BROADCAST_LABELS_ROWS = 1_000_000


def _spread(df: DataFrame) -> DataFrame:
    """Ensure at least defaultParallelism partitions before a high-fanout
    projection (shingle/token explode + per-shingle hashing).

    The heavy work in this module is CPU *per input row* (explode to
    ~300 shingles/doc, then bands*rows md5s per shingle) and partial
    aggregation keeps it all in the scan stage — so the stage's
    parallelism is the *input split count*.  A corpus arriving as a few
    small files (the test fixture: one file = one split) serializes the
    whole signature computation on one core.  At production scale the
    corpus has >= cores splits and this is a no-op (the partition-count
    check below skips the shuffle), so nothing extra is shuffled at
    100 TB; when it does fire it round-robins only the raw doc rows —
    the cheapest point in the plan, before any fan-out."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if n < target else df


def shingles(docs: DataFrame, distinct: bool = True) -> DataFrame:
    """Character shingles per doc (single-pass explode, no re-join).

    ``distinct=False`` skips the dedup shuffle — correct for any
    duplicate-insensitive consumer (min-hash: min over a multiset equals
    min over its set), and the largest single saving in the LSH plan."""
    docs = _spread(docs)
    out = docs.select(
        "doc_id",
        F.expr(
            f"explode(transform(sequence(1, greatest(1, length(text) - {SHINGLE_LEN - 1})),"
            f" p -> substring(text, p, {SHINGLE_LEN})))"
        ).alias("sh"),
    )
    return out.distinct() if distinct else out


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups: (text_hash, n_docs, min_doc_id), n_docs > 1."""
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(
    docs: DataFrame, bands: int = LSH_BANDS, rows: int = LSH_ROWS
) -> DataFrame:
    """Per-(doc, band) banded min-hash: the band signature is the
    CONCATENATION of ``rows`` independent minima
    ``min over shingles of md5(sh || '#' || (band*rows + j))``.
    md5-hex min is a valid uniform min-hash and is engine-portable.

    One groupBy pass computes all bands*rows minima as separate aggregates
    (one shuffle of the shingle set instead of a bands*rows row explode),
    then unpivots — map-side partial aggregation keeps the shuffle tiny.
    Shingles are NOT deduplicated first (min is duplicate-insensitive), so
    the only shuffle in this plan is the per-doc partial-agg merge."""
    sh = shingles(docs, distinct=False)
    aggs = [
        F.min(
            F.md5(F.concat(F.col("sh"), F.lit(f"#{b * rows + j}")).cast("binary"))
        ).alias(f"m{b}_{j}")
        for b in range(bands)
        for j in range(rows)
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    band_sigs = [
        F.concat(*[F.col(f"m{b}_{j}") for j in range(rows)]).alias(f"sig{b}")
        for b in range(bands)
    ]
    wide = wide.select("doc_id", *band_sigs)
    stack = ", ".join(f"{b}, sig{b}" for b in range(bands))
    return wide.selectExpr("doc_id", f"stack({bands}, {stack}) AS (band, sig)")


def dedup_minhash_lsh(
    docs: DataFrame,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    bucket_cap: int = BUCKET_CAP,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any (band, signature)
    bucket of size <= bucket_cap; returns distinct (doc_a, doc_b),
    doc_a < doc_b.

    Buckets are materialized as collected id arrays rather than a bucket
    self-join: a self-join would evaluate the whole shingle->minhash subtree
    once per join side, and with the cap in place the double explode is
    bounded at bucket_cap^2 rows per bucket — one subtree evaluation, one
    shuffle on the (band, sig) keys."""
    from pyspark.sql import Window

    sigs = minhash_signatures(docs, bands, rows)
    # enforce the cap BEFORE collect_list: a window count shuffles once on
    # (band, sig) — spill-backed, so a degenerate hot bucket never builds an
    # unbounded array in a single aggregation buffer — and the follow-up
    # groupBy on the same keys reuses the partitioning (no second shuffle)
    wb = Window.partitionBy("band", "sig")
    capped = (
        sigs.withColumn("_bn", F.count(F.lit(1)).over(wb))
        .filter((F.col("_bn") > 1) & (F.col("_bn") <= bucket_cap))
        .drop("_bn")
    )
    buckets = capped.groupBy("band", "sig").agg(F.collect_list("doc_id").alias("ids"))
    return (
        buckets.select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )


PHASH_BANDS = 4  # 4 x 16-bit bands over the 64-bit perceptual hash
PHASH_HAMMING_MAX = 6
PHASH_BUCKET_CAP = 200


def phash_neardup_pairs(
    images: DataFrame,
    hamming_max: int = PHASH_HAMMING_MAX,
    bucket_cap: int = PHASH_BUCKET_CAP,
) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance.

    The input-table contract (BASELINE.json input_hint) carries a
    ``phash:int64`` column — the standard cheap near-dup signal for
    re-encoded / resized copies of the same picture (a re-encode perturbs a
    few phash bits).  The operator is the phash analogue of
    :func:`dedup_minhash_lsh`:

    * band the 64 bits into ``PHASH_BANDS`` 16-bit keys
      (``shiftright(phash, 16*b) & 0xFFFF`` — arithmetic-shift fill bits are
      masked off, so signed semantics are engine-portable),
    * bucket on (band, key) with the same windowed ``bucket_cap`` guard
      (a constant-phash corpus — black thumbnails — cannot detonate the
      within-bucket pairing),
    * confirm candidates with the exact distance
      ``bit_count(phash_a ^ phash_b) <= hamming_max``.

    Everything is native JVM expressions (no UDF anywhere).  Pigeonhole
    guarantee: any pair with Hamming distance < PHASH_BANDS shares at least
    one untouched band and is ALWAYS caught; pairs in
    [PHASH_BANDS, hamming_max] are caught unless the flips spread across
    all bands (the standard banding trade-off, stated identically by the
    oracle).  At 100 TB: one shuffle on high-cardinality (band, key), the
    per-bucket explode bounded at bucket_cap^2; phashes ride inside the
    bucket structs so no join back to the corpus is needed.

    Returns distinct (img_a, img_b, hamming) with img_a < img_b.
    """
    from pyspark.sql import Window

    ph = images.select("image_id", "phash")
    stack_args = ", ".join(
        f"{b}, shiftright(phash, {16 * b}) & 65535" for b in range(PHASH_BANDS)
    )
    banded = ph.selectExpr(
        "image_id", "phash", f"stack({PHASH_BANDS}, {stack_args}) AS (band, bv)"
    )
    wb = Window.partitionBy("band", "bv")
    capped = (
        banded.withColumn("_bn", F.count(F.lit(1)).over(wb))
        .filter((F.col("_bn") > 1) & (F.col("_bn") <= bucket_cap))
        .drop("_bn")
    )
    buckets = capped.groupBy("band", "bv").agg(
        F.collect_list(F.struct("image_id", "phash")).alias("members")
    )
    pairs = (
        buckets.select(F.explode("members").alias("a"), "members")
        .select("a", F.explode("members").alias("b"))
        .filter(F.col("a.image_id") < F.col("b.image_id"))
        .select(
            F.col("a.image_id").alias("img_a"),
            F.col("b.image_id").alias("img_b"),
            F.col("a.phash").alias("pa"),
            F.col("b.phash").alias("pb"),
        )
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).cast("int")
        )
        .filter(F.col("hamming") <= hamming_max)
        .select("img_a", "img_b", "hamming")
    )


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit SimHash over space-separated tokens.

    Bit b = sign of sum over tokens of (+1 if the b-th hex nibble of
    md5(token) has its high bit set else -1); >=0 counts as set.  The nibble
    high-bit trick keeps the definition portable to ANSI SQL.
    """
    toks = _spread(docs).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
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
    """Exact n-gram Jaccard >= threshold over the LSH CANDIDATE pairs.

    There is deliberately no shingle self-join anywhere in this plan: the
    quadratic blowup of joining two full shingle tables through a hot
    shingle is the classic 100-TB killer.  Instead the candidate pairs from
    :func:`dedup_minhash_lsh` (already bucket-capped) are joined to the
    per-doc shingle sets twice — each join is linear in
    |candidates| x |avg shingles per doc| — and the intersection size is a
    count over matching shingles.  The operator's definition is therefore
    "exact Jaccard of every LSH candidate pair", which the DuckDB oracle
    states identically.

    Returns (doc_a, doc_b, jac) with jac rounded for engine portability."""
    cand = dedup_minhash_lsh(docs)
    sh = shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "sh"])
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


def dedup_clusters(pairs: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Duplicate-CLUSTER assignment: connected components over the near-dup
    pair graph — (doc_id, cluster_id) with cluster_id = the component's
    minimum doc id.  This is the step AFTER pair generation in a dedup
    pipeline: keep one representative per cluster instead of reasoning
    about pairs.

    Hook + compress: per round every node takes min(own label, neighbors'
    labels) (one equi-join + one groupBy, both shuffled on node id so AQE
    reuses the partitioning), then a pointer-jumping shortcut folds in
    the label OF its label (one more equi-join) — label chains halve each
    round, so convergence is O(log diameter) rounds, not O(diameter)
    (pinned by the 81-node-chain test — diameter 80 > max_rounds, so
    plain propagation would fail it), while LSH near-cliques still exit
    in 2-3 rounds via the changed-count check.  Every round is
    localCheckpointed so round t+1's plan never nests round t's.  Never
    materializes a component in one task — scales to any cluster size."""
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    edges = (
        edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select("u")
        .distinct()
        .select(F.col("u").alias("doc_id"), F.col("u").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    # self-loops fuse the hook step's two joins into one: with (u, u) in
    # the edge set, min over neighbors' labels INCLUDES the own label, so
    # the round needs no separate labels-side join to combine them — and
    # the self row (v == u) carries the round-start label out of the same
    # aggregation for the convergence flag.  One shuffle join less per
    # round on the 100 TB path, one broadcast build less per round here.
    edges_self = edges.unionByName(
        labels.select(F.col("doc_id").alias("u"), F.col("doc_id").alias("v"))
    ).localCheckpoint(eager=True)
    # strategy chooser (same pattern as chains.BROADCAST_STATE_ROWS): when
    # the label table is broadcast-sized, every round join hashes the tiny
    # side map-side — one or two stages per round instead of a 4-exchange
    # shuffle cascade (AQE launches a job per exchange, so this halves the
    # per-round latency).  Past the limit the shuffle joins are unchanged —
    # the 100 TB path never broadcasts the label table.
    n_nodes = labels.count()
    small = n_nodes <= BROADCAST_LABELS_ROWS
    bcast = F.broadcast if small else (lambda df: df)
    # right-size round partitions in broadcast mode (see chains._state_parts):
    # a 5k-label table otherwise runs every round as 32 near-empty tasks
    n_parts = max(1, (n_nodes + 65_535) // 65_536) if small else None
    changed = None
    for _ in range(max_rounds):
        # hook: one join + one aggregation (self-loops make min-over-
        # neighbors the whole step, and the v == u row is the round-start
        # label, carried out as _prev for the convergence flag)
        stepped = (
            edges_self.join(bcast(labels), edges_self["v"] == labels["doc_id"])
            .groupBy("u")
            .agg(
                F.min("lbl").alias("lbl"),
                F.min(F.when(F.col("v") == F.col("u"), F.col("lbl"))).alias(
                    "_prev"
                ),
            )
            .withColumnRenamed("u", "doc_id")
        )
        # pointer jumping (path compression): lbl <- min(lbl, label OF lbl)
        # — without it convergence needs component-DIAMETER rounds (shingle
        # chains make long paths); with it, O(log diameter)
        ptr = stepped.select(
            F.col("doc_id").alias("_d2"), F.col("lbl").alias("_l2")
        )
        new_labels = (
            stepped.join(bcast(ptr), stepped["lbl"] == ptr["_d2"], "left")
            .withColumn(
                "_new",
                F.least(F.col("lbl"), F.coalesce(F.col("_l2"), F.col("lbl"))),
            )
            .select(
                "doc_id",
                F.col("_new").alias("lbl"),
                (F.col("_new") != F.col("_prev")).cast("int").alias("_chg"),
            )
        )
        if n_parts is not None:
            new_labels = new_labels.coalesce(n_parts)
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = int(
            new_labels.agg(F.sum("_chg").alias("c")).collect()[0]["c"] or 0
        )
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    else:
        import warnings

        if changed is None:
            changed = "all"  # max_rounds == 0: no round ever ran
        warnings.warn(
            f"dedup_clusters: not converged after {max_rounds} rounds "
            f"({changed} labels still changing) — raise max_rounds"
        )
    return labels.select("doc_id", F.col("lbl").alias("cluster_id"))


def dedup_keep_best(
    docs: DataFrame, scores: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Terminal dedup stage: ONE representative per near-duplicate
    cluster — the highest-``score`` member, ties broken by lowest doc id.
    Documents in no cluster represent themselves.

    This is what a production pipeline actually ships: pairs
    (:func:`dedup_minhash_lsh`) -> clusters (:func:`dedup_clusters`) ->
    representatives.  Scale shape: clusters' label table joins the doc
    ids (shuffle on doc_id), then ONE window partitioned by cluster_id —
    partitions are cluster-sized, never corpus-sized, and the score/text
    payload is projected before the shuffle."""
    from pyspark.sql import Window

    clusters = dedup_clusters(pairs)
    scored = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
        .join(scores.select("doc_id", "score"), "doc_id")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "cluster_id", "score")
    )
