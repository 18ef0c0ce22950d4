"""Training-data sampling / mixture / sharding operators + the builder
POLYLINE layer (s2builder.d:100-700; builder/util/s2polyline_layer.d)."""

import math

import pytest

from s2geometry_d_spark.operators import sampling
from s2geometry_d_spark.s2core.builder import IntLatLngSnapFunction, build_polyline

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_rate_threshold_monotone_and_sentinels():
    assert sampling.rate_threshold(0.0) == "00000000"
    assert sampling.rate_threshold(1.0) == "g"
    assert sampling.rate_threshold(1.5) == "g"
    prev = ""
    for r in [0.0, 0.1, 0.25, 0.5, 0.75, 0.999]:
        t = sampling.rate_threshold(r)
        assert t > prev
        prev = t
    # threshold is the exact integer fraction of the 16^8 draw space
    assert int(sampling.rate_threshold(0.25), 16) == 16**8 // 4


def test_sample_stratified_deterministic_and_calibrated(docs):
    rates = {"en": 0.25, "de": 0.5}
    out = sampling.sample_stratified(docs, rates).collect()
    again = sampling.sample_stratified(docs, rates).collect()
    assert out == again  # deterministic: same rows, same order
    from collections import Counter

    kept = Counter(r["lang"] for r in out)
    full = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    # md5 draw is uniform: accept rate within a loose binomial band
    for lang, rate in rates.items():
        if full.get(lang, 0) >= 40:
            frac = kept[lang] / full[lang]
            assert abs(frac - rate) < 0.18, (lang, frac, rate)
    # default rate 1.0: unlisted strata keep every row
    for lang, n in full.items():
        if lang not in rates:
            assert kept[lang] == n


def test_dataset_mixture_copy_counts(docs):
    weights = {"src0": 2.5, "src1": 0.5, "src2": 0.0}
    out = sampling.dataset_mixture(docs, weights).collect()
    from collections import Counter

    per_doc = Counter((r["doc_id"], r["source"]) for r in out)
    full = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    for (doc_id, source), n in per_doc.items():
        w = weights.get(source, 1.0)
        assert n in (int(w), int(w) + 1)
        # copy column is 1..n contiguous
    n_by_src = Counter()
    for (doc_id, source), n in per_doc.items():
        n_by_src[source] += n
    src_tot = Counter(full.values())
    for source, w in weights.items():
        if src_tot[source] >= 40:
            eff = n_by_src[source] / src_tot[source]
            assert abs(eff - w) < 0.35, (source, eff, w)
    assert n_by_src["src2"] == 0  # weight 0 drops the source entirely


def test_shard_by_token_budget_invariants(docs):
    budget = 500
    rows = sampling.shard_by_token_budget(docs, budget).collect()
    # group by source, replay the prefix sum: shard boundaries exact
    from collections import defaultdict

    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    for source, rs in by_src.items():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            assert r["shard"] == cum // budget
            cum += r["n_tokens"]
        shards = [r["shard"] for r in rs]
        assert shards == sorted(shards)  # monotone within source
        assert shards[0] == 0


def _xyz(lat, lng):
    la, lo = math.radians(lat), math.radians(lng)
    return (
        math.cos(la) * math.cos(lo),
        math.cos(la) * math.sin(lo),
        math.sin(la),
    )


def test_build_polyline_merges_and_collapses():
    sf = IntLatLngSnapFunction(4)
    # near-duplicate consecutive vertices merge to one site
    line = [_xyz(5.000040, 20.000040), _xyz(5.000020, 20.000010), _xyz(6.0, 21.0)]
    out = build_polyline(line, sf)
    assert out is not None and len(out) == 2
    # all-in-one-cell line vanishes
    tiny = [_xyz(12.000010, -50.000010), _xyz(12.000030, -50.000030)]
    assert build_polyline(tiny, sf) is None
    # spike (A->B->A) is KEPT by the polyline layer (PATH semantics)
    spike = [_xyz(-3.0, 40.0), _xyz(-3.5, 40.5), _xyz(-3.0, 40.0)]
    out = build_polyline(spike, sf)
    assert out is not None and len(out) == 3 and out[0] == out[2]


def test_snap_polylines_table_matches_local(spark):
    from s2geometry_d_spark.operators.overlay import (
        dirty_polylines_dataframe,
        snap_polylines_table,
    )
    from s2geometry_d_spark.plans import demo

    lines = demo.snap_fixture_lines()
    df = dirty_polylines_dataframe(spark, lines)
    got = {
        (r["line_id"], r["seq"]): (r["vlat"], r["vlng"])
        for r in snap_polylines_table(df, exponent=demo.SNAP_EXPONENT).collect()
    }
    sf = IntLatLngSnapFunction(demo.SNAP_EXPONENT)
    want = {}
    for lid, verts in lines:
        snapped = build_polyline(list(verts), sf)
        if snapped is None:
            continue
        for seq, v in enumerate(snapped):
            lat = round(math.degrees(math.asin(max(-1.0, min(1.0, v[2])))), 6) + 0.0
            lng = round(math.degrees(math.atan2(v[1], v[0])), 6) + 0.0
            want[(lid, seq)] = (lat, lng)
    assert got == want
    assert 3 not in {k[0] for k in got}  # collapsed line vanished
