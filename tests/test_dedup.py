"""Dedup operator invariants: banded minhash, bucket cap, candidate-only
Jaccard, and the no-shingle-self-join plan property (the 100-TB guard)."""

import pytest
from pyspark.sql import functions as F

from s2geometry_d_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


BASE = "the quick brown fox jumps over the lazy dog again and again " * 4


def test_identical_docs_are_candidates(spark):
    docs = _docs(spark, [(1, BASE), (2, BASE), (3, "x" * 80)])
    pairs = dedup.dedup_minhash_lsh(docs).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}


def test_disjoint_docs_are_not_candidates(spark):
    docs = _docs(spark, [(1, "abcdefgh" * 12), (2, "ijklmnop" * 12)])
    assert dedup.dedup_minhash_lsh(docs).count() == 0


def test_bucket_cap_drops_degenerate_buckets(spark):
    # cap+2 identical docs land in one bucket per band -> dropped entirely
    n = 6
    docs = _docs(spark, [(i, BASE) for i in range(n)])
    assert dedup.dedup_minhash_lsh(docs, bucket_cap=n - 1).count() == 0
    # under the cap the full pair set appears
    assert dedup.dedup_minhash_lsh(docs, bucket_cap=n).count() == n * (n - 1) // 2


def test_jaccard_exact_on_candidates(spark):
    # two docs sharing a long prefix: verify jac matches a python computation
    a = BASE + "unique tail one that diverges here"
    b = BASE + "unique tail two that diverges here"
    docs = _docs(spark, [(1, a), (2, b)])
    out = dedup.ngram_jaccard_pairs(docs, threshold=0.1).collect()

    def sh_set(t):
        return {t[i : i + dedup.SHINGLE_LEN] for i in range(len(t) - dedup.SHINGLE_LEN + 1)}

    sa, sb = sh_set(a), sh_set(b)
    expected = round(len(sa & sb) / len(sa | sb), 6)
    assert len(out) == 1
    assert out[0].jac == pytest.approx(expected, abs=1e-9)


def test_jaccard_plan_has_no_shingle_self_join(spark):
    """Every join touching the shingle column must also key on a doc id —
    a join on `sh` alone is the quadratic all-pairs blowup."""
    docs = _docs(spark, [(1, BASE), (2, BASE)])
    plan = dedup.ngram_jaccard_pairs(docs)._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "Join" in line and "sh#" in line:
            assert "doc_" in line, f"shingle-only join key in plan line: {line}"


def test_banding_definition_matches_rows_param(spark):
    # signature per band is the concatenation of `rows` 32-hex-char minima
    docs = _docs(spark, [(1, BASE)])
    sig = dedup.minhash_signatures(docs, bands=2, rows=3).collect()
    assert len(sig) == 2
    assert all(len(r.sig) == 3 * 32 for r in sig)


def test_minhash_lsh_planted_near_duplicates(spark):
    """Planted near-dup corpus with KNOWN similarity (each base doc has a
    ~10%-mutated copy, char-shingle Jaccard ~0.7): the b=4 x r=2 banding
    curve predicts ~93% candidate recovery there, so a healthy pipeline
    must recover >= 80% of the planted pairs — separating 'the fixture has
    no near-dups' from 'the banding is broken'."""
    import random

    from s2geometry_d_spark.operators import dedup as D

    rnd = random.Random(3)
    words = [f"w{i:03d}" for i in range(500)]
    rows, pairs = [], []
    for i in range(100):
        base = [rnd.choice(words) for _ in range(60)]
        mut = list(base)
        for _ in range(6):
            mut[rnd.randrange(60)] = rnd.choice(words)
        rows.append((i, " ".join(base)))
        rows.append((i + 1000, " ".join(mut)))
        pairs.append((i, i + 1000))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.doc_a, r.doc_b) for r in D.dedup_minhash_lsh(docs).collect()}
    hit = sum(1 for p in pairs if p in got)
    assert hit / len(pairs) >= 0.8, f"planted near-dup recovery {hit}/100"


def test_degenerate_boilerplate_corpus_is_capped_not_quadratic(spark):
    """All-identical docs: every (band, sig) bucket holds the whole corpus,
    exceeding BUCKET_CAP — the cap DEFINES these buckets away (dropped
    before collect_list materializes anything), so the LSH pair output is
    empty while exact dedup still finds the single duplicate group."""
    from s2geometry_d_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(i, "the same boilerplate text repeated everywhere " * 3) for i in range(300)],
        ["doc_id", "text"],
    )
    assert D.dedup_minhash_lsh(docs).count() == 0
    groups = D.dedup_exact(docs).collect()
    assert len(groups) == 1 and groups[0]["n_docs"] == 300


# -- phash Hamming near-dup (input_hint phash:int64) ------------------------


def _phash_tbl(spark, rows):
    return spark.createDataFrame(rows, ["image_id", "phash"])


def test_phash_planted_flips_found_with_exact_hamming(spark):
    # originals with uniform-ish phashes; one variant 3 bit-flips away
    base = 0x123456789ABCDEF0
    rows = [(f"img{i:03d}", base + i * 0x1111111111111) for i in range(8)]
    flipped = rows[0][1] ^ (1 << 5) ^ (1 << 21) ^ (1 << 47)
    rows.append(("img000_v", flipped))
    out = dedup.phash_neardup_pairs(_phash_tbl(spark, rows)).collect()
    assert {(r.img_a, r.img_b, r.hamming) for r in out} == {("img000", "img000_v", 3)}


def test_phash_pigeonhole_guarantee_under_bands(spark):
    # any pair with hamming < 4 bands shares an untouched 16-bit band:
    # flips concentrated in ONE band must still be caught (3 flips, 1 band)
    base = -0x7FEDCBA987654321  # negative: signed shift/mask path
    variant = base ^ (1 << 16) ^ (1 << 18) ^ (1 << 30)  # all in band 1
    out = dedup.phash_neardup_pairs(
        _phash_tbl(spark, [("a", base), ("b", variant)])
    ).collect()
    assert [(r.img_a, r.img_b, r.hamming) for r in out] == [("a", "b", 3)]


def test_phash_distant_pairs_rejected_even_when_banded(spark):
    # sharing band 0 but hamming 48 elsewhere -> candidate, not a hit
    a = 0x0000000000001234
    b = 0x7FFFFFFFFFFF1234  # same low band, wildly different high bits
    assert dedup.phash_neardup_pairs(_phash_tbl(spark, [("a", a), ("b", b)])).count() == 0


def test_phash_bucket_cap_and_pure_jvm_plan(spark):
    n = 6
    rows = [(f"c{i}", 42) for i in range(n)]  # constant-phash corpus
    assert dedup.phash_neardup_pairs(_phash_tbl(spark, rows), bucket_cap=n - 1).count() == 0
    full = dedup.phash_neardup_pairs(_phash_tbl(spark, rows), bucket_cap=n)
    assert full.count() == n * (n - 1) // 2
    # no Python anywhere in the plan: native shift/mask/bit_count end-to-end
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_dedup_clusters_matches_union_find(spark):
    """Connected components over an adversarial pair graph (long chains —
    the case plain min-label propagation without pointer jumping needs
    diameter rounds for) vs a driver union-find."""
    import numpy as np

    from s2geometry_d_spark.operators.dedup import dedup_clusters

    rng = np.random.default_rng(5)
    pairs = [(i, i + 1) for i in range(80)]            # one 81-node chain
    pairs += [(100 + 2 * i, 101 + 2 * i) for i in range(20)]  # 20 doubletons
    extra = rng.integers(200, 260, size=(40, 2))       # random clumps
    pairs += [(int(min(a, b)), int(max(a, b))) for a, b in extra if a != b]

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in parent}

    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(df).collect()}
    assert got == want


def test_dedup_keep_best_representatives(spark):
    from s2geometry_d_spark.operators.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [(i, "") for i in range(8)], "doc_id long, text string"
    ).select("doc_id")
    # scores: cluster {0,1,2} best is 1; cluster {3,4} ties -> lowest id 3;
    # 5,6,7 unclustered keep themselves
    scores = spark.createDataFrame(
        [(0, 0.2), (1, 0.9), (2, 0.5), (3, 0.7), (4, 0.7),
         (5, 0.1), (6, 0.0), (7, 1.0)],
        "doc_id long, score double",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    got = {
        r.cluster_id: (r.doc_id, r.score)
        for r in dedup_keep_best(docs.selectExpr("doc_id"), scores, pairs).collect()
    }
    assert got == {
        0: (1, 0.9), 3: (3, 0.7), 5: (5, 0.1), 6: (6, 0.0), 7: (7, 1.0)
    }
