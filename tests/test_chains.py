"""Polyline assembly from an edge soup (builder's S2PolylineVectorLayer).

PATH semantics: builder/graph.d:1453-1487 (buildPaths) — chains pass
through a vertex only if it is interior (ind == 1 == outd); leftover
cycles start at their minimum input edge id (canonicalizeLoopOrder).
WALK semantics: builder/graph.d:1489-1560 (buildWalks) — Euler-walk
extraction with excess-degree starts and loop splicing.
"""

import random

import pytest

from s2geometry_d_spark.operators import chains
from s2geometry_d_spark.plans import demo


def _ref_paths(edges):
    """Straightforward sequential re-derivation of buildPaths for the
    test oracle: walk from every non-interior source through interior
    vertices; remaining edges are cycles started at their min edge id."""
    from collections import defaultdict

    ind, outd = defaultdict(int), defaultdict(int)
    by_src = defaultdict(list)
    for eid, s, d in edges:
        ind[d] += 1
        outd[s] += 1
        by_src[s].append((eid, s, d))

    def interior(v):
        return ind[v] == 1 and outd[v] == 1

    used = set()
    chains_out = []
    for eid, s, d in sorted(edges):
        if eid in used or interior(s):
            continue
        chain = [(eid, s, d)]
        used.add(eid)
        cur = d
        while interior(cur):
            (e2,) = [t for t in by_src[cur] if t[0] not in used]
            chain.append(e2)
            used.add(e2[0])
            cur = e2[2]
        chains_out.append(chain)
    # leftover: pure cycles; start at min edge id
    for eid, s, d in sorted(edges):
        if eid in used:
            continue
        chain = [(eid, s, d)]
        used.add(eid)
        cur = d
        while True:
            cands = [t for t in by_src[cur] if t[0] not in used]
            if not cands:
                break
            (e2,) = cands
            chain.append(e2)
            used.add(e2[0])
            cur = e2[2]
        chains_out.append(chain)
    return {
        min(t[0] for t in ch): [(i, t[0], t[1], t[2]) for i, t in enumerate(ch)]
        for ch in chains_out
    }


def _spark_paths(spark, edges):
    df = spark.createDataFrame(edges, "edge_id long, src long, dst long")
    rows = chains.assemble_polylines(df).collect()
    out = {}
    for r in rows:
        out.setdefault(r.polyline_id, []).append((r.seq, r.edge_id, r.src, r.dst))
    return {k: sorted(v) for k, v in out.items()}


def test_fixture_matches_reference_walk(spark):
    edges = demo.chain_fixture_edges()
    assert _spark_paths(spark, edges) == _ref_paths(edges)


def test_fixture_expected_chain_count(spark):
    got = _spark_paths(spark, demo.chain_fixture_edges())
    # clean chain, 3 junction chains, 2 lollipop chains, cycle, 2 dup
    # edges, isolated edge, stem + loop at the non-interior return vertex
    assert set(got) == {0, 10, 11, 12, 20, 21, 30, 40, 41, 50, 60, 61}
    assert [t[1] for t in got[0]] == [0, 1, 2, 3]
    # pure cycle canonicalized to start at min edge id 30 (edge 30 first)
    assert [t[1] for t in got[30]] == [30, 32, 31]
    assert [t[1] for t in got[61]] == [61, 62, 63]


def test_long_chain_beyond_label_propagation(spark):
    # a 300-edge path and a 257-edge cycle: min-label propagation would
    # need ~300 rounds; pointer doubling needs ~9.  Ids are shuffled so
    # edge id order carries no positional information.
    rng = random.Random(7)
    ids = list(range(1000, 1300))
    rng.shuffle(ids)
    path = [(ids[i], 5000 + i, 5000 + i + 1) for i in range(300)]
    cyc_ids = list(range(2000, 2257))
    rng.shuffle(cyc_ids)
    cyc = [(cyc_ids[i], 9000 + i, 9000 + (i + 1) % 257) for i in range(257)]
    edges = path + cyc
    rng.shuffle(edges)
    got = _spark_paths(spark, edges)
    ref = _ref_paths(edges)
    assert got == ref
    assert len(got) == 2
    # the path chain is ordered by position, not by edge id
    pid = min(ids)
    assert [t[1] for t in got[pid]] == [ids[i] for i in range(300)]
    # the cycle starts at its min edge id
    cyc_pid = min(cyc_ids)
    assert got[cyc_pid][0][1] == cyc_pid


def test_self_loop_edge(spark):
    got = _spark_paths(spark, [(5, 7, 7)])
    assert got == {5: [(0, 5, 7, 7)]}


def test_random_soups_match_reference(spark):
    rng = random.Random(42)
    for trial in range(3):
        n_v = 40
        edges = []
        eid = trial * 1000
        for _ in range(60):
            edges.append((eid, rng.randrange(n_v), rng.randrange(n_v)))
            eid += 1
        assert _spark_paths(spark, edges) == _ref_paths(edges)


def test_oracle_sql_matches_spark(spark):
    import duckdb

    got = _spark_paths(spark, demo.chain_fixture_edges())
    rel = duckdb.sql(demo.assemble_polylines_sql()).fetchall()
    oracle = {}
    for pid, seq, eid, s, d in rel:
        oracle.setdefault(pid, []).append((seq, eid, s, d))
    assert {k: sorted(v) for k, v in oracle.items()} == got


# -- composed snap + assemble pipeline -------------------------------------


@pytest.fixture(scope="module")
def graph_rows(spark):
    from s2geometry_d_spark.operators.overlay import dirty_polylines_dataframe

    df = dirty_polylines_dataframe(spark, demo.graph_fixture_lines())
    return chains.build_polyline_graph(df, exponent=4, id_stride=1_000_000).collect()


def _by_chain(rows):
    out = {}
    for r in rows:
        out.setdefault(r.polyline_id, []).append(
            (r.seq, r.src_lat, r.src_lng, r.dst_lat, r.dst_lng)
        )
    return {k: sorted(v) for k, v in out.items()}


def test_graph_merges_across_lines(graph_rows):
    got = _by_chain(graph_rows)
    # lines 10 (1 edge) + 11 (2 edges) merge into ONE chain C->D->E->F
    pid = 10 * 1_000_000
    assert pid in got and len(got[pid]) == 3
    assert got[pid][0][1:3] == (0.0, -30.0)
    assert got[pid][-1][3:5] == (3.0, -27.0)
    assert not any(p // 1_000_000 == 11 for p in got)


def test_graph_splits_at_junction(graph_rows):
    got = _by_chain(graph_rows)
    # H has outdegree 2: lines 12, 13, 14 stay three separate chains
    for line in (12, 13, 14):
        pid = line * 1_000_000
        assert pid in got and len(got[pid]) == 1


def test_graph_spike_becomes_cycle(graph_rows):
    got = _by_chain(graph_rows)
    # line 2's A->B->A spike: both vertices degree 1/1 -> a 2-cycle
    pid = 2 * 1_000_000
    assert pid in got and len(got[pid]) == 2
    assert got[pid][0][1:3] == got[pid][1][3:5]  # closes on itself


def test_graph_collapsed_line_vanishes(graph_rows):
    # line 3 collapses inside one E4 cell during snap
    assert not any(p // 1_000_000 == 3 for p in _by_chain(graph_rows))


def test_graph_oracle_sql_matches_spark(graph_rows):
    import duckdb

    oracle = {}
    for pid, seq, sla, slo, dla, dlo in duckdb.sql(
        demo.build_polyline_graph_sql()
    ).fetchall():
        oracle.setdefault(pid, []).append((seq, sla, slo, dla, dlo))
    assert {k: sorted(v) for k, v in oracle.items()} == _by_chain(graph_rows)


# -- WALK ------------------------------------------------------------------


def _walk_props(edges, walks):
    all_used = [t[0] for w in walks for t in w]
    assert sorted(all_used) == sorted(t[0] for t in edges), "each edge once"
    for w in walks:
        for a, b in zip(w, w[1:]):
            assert a[2] == b[1], "walk continuity"


def test_build_walks_covers_all_edges_once():
    edges = sorted(demo.chain_fixture_edges())
    walks = chains._build_walks(edges)
    _walk_props(edges, walks)


def test_build_walks_splices_figure_eight():
    # figure-eight: two loops sharing vertex 0 — WALK emits ONE walk
    # (loops spliced), PATH would emit two cycles
    edges = [(0, 0, 1), (1, 1, 0), (2, 0, 2), (3, 2, 0)]
    walks = chains._build_walks(edges)
    _walk_props(edges, walks)
    assert len(walks) == 1
    assert walks[0][0][1] == walks[0][-1][2] == 0


def test_build_walks_excess_degree_start():
    # out-excess at vertex 0: the walk must start there, and the attached
    # loop at vertex 1 gets spliced into it rather than emitted separately
    edges = [(0, 0, 1), (1, 1, 2), (2, 2, 1), (3, 1, 3)]
    walks = chains._build_walks(edges)
    _walk_props(edges, walks)
    assert len(walks) == 1
    assert walks[0][0][1] == 0 and walks[0][-1][2] == 3


def test_build_walks_random_props():
    rng = random.Random(3)
    for _ in range(5):
        edges = sorted(
            (i, rng.randrange(10), rng.randrange(10)) for i in range(25)
        )
        _walk_props(edges, chains._build_walks(edges))


def test_assemble_walks_per_graph(spark):
    edges = [(g, *t) for g in (0, 1) for t in demo.chain_fixture_edges()]
    df = spark.createDataFrame(
        edges, "graph_id int, edge_id long, src long, dst long"
    )
    rows = chains.assemble_walks_per_graph(df).collect()
    for g in (0, 1):
        walks = {}
        for r in rows:
            if r.graph_id == g:
                walks.setdefault(r.walk_id, []).append(
                    (r.seq, r.edge_id, r.src, r.dst)
                )
        rebuilt = [
            [(eid, s, d) for _, eid, s, d in sorted(w)] for w in walks.values()
        ]
        _walk_props(demo.chain_fixture_edges(), rebuilt)


def test_empty_edge_soup(spark):
    df = spark.createDataFrame([], "edge_id long, src long, dst long")
    assert chains.assemble_polylines(df).count() == 0


def test_comb_graph(spark):
    # spine 0->1->...->20 with a tooth hanging off every spine vertex:
    # every spine vertex has outdegree 2 -> all single-edge chains except
    # none; exercises many junctions at once
    spine = [(i, 1000 + i, 1000 + i + 1) for i in range(20)]
    teeth = [(100 + i, 1000 + i, 2000 + i) for i in range(21)]
    edges = spine + teeth
    assert _spark_paths(spark, edges) == _ref_paths(edges)


def test_build_walks_early_stop_at_shared_deficit_vertex():
    # v has in-excess; the walk arriving via edge 0 must stop at v because
    # unused incoming edge 1 (id <= best outgoing id 2) continues there
    # (graph.d:1608-1619 idempotency rule)
    edges = [(0, 7, 5), (1, 8, 5), (2, 5, 9)]
    walks = chains._build_walks(edges)
    _walk_props(edges, walks)
    assert [[t[0] for t in w] for w in walks] == [[0], [1, 2]]
