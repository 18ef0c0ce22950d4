"""Polyline assembly from an edge soup — the builder's S2PolylineVectorLayer.

Reference: builder/util/s2polyline_vector_layer.d:36-48 (layer contract)
and builder/graph.d:1436-1560 (``PolylineBuilder.buildPaths`` /
``buildWalks``).  The layer assembles directed edges into maximal
polylines; with ``PolylineType::PATH`` (the default) a polyline may pass
*through* a vertex only if that vertex is interior (indegree == 1 and
outdegree == 1), so chains split at junctions, merge points and path
endpoints, and any edges left over after path extraction form pure
cycles that are emitted starting from their minimum input edge id
(``canonicalizeLoopOrder``).

Spark-first decomposition of PATH assembly (``assemble_polylines``) —
pure Catalyst joins, no Python kernel and no driver-side graph:

1. **Vertex degrees** — one groupBy per side unioned; interior =
   (ind == 1 AND outd == 1).  Shuffles on the vertex key.
2. **Predecessor links** — edge e2 is preceded by the unique e with
   e.dst == e2.src iff that vertex is interior (ind == 1 makes the
   predecessor unique, outd == 1 makes the successor unique), so the
   link relation is a partial bijection and components are simple
   chains or simple cycles.
3. **List ranking by pointer doubling** — each edge carries
   (ptr, d, root): ptr = 2^k-th predecessor, d = distance walked,
   root = the chain-start edge once reached.  One self-join per round;
   after ceil(log2 L) rounds every path edge knows its start edge and
   its offset ``seq`` from it.  A parallel min-id accumulator detects
   pure cycles (ptr never nulls but the running component-min goes
   stable); the cycle's min-id edge then cuts its own incoming link —
   exactly ``canonicalizeLoopOrder``'s start — and one more doubling
   pass ranks the cycle edges.  O(log L) rounds of equi-joins,
   localCheckpointed so round t+1's plan never nests round t's; NEVER
   O(chain length) rounds (min-label propagation over a path is the
   worst-case-diameter graph) and never a whole chain in one task.
4. **Chain identity** — groupBy(root).min(edge_id) + one join back:
   ``polyline_id`` is the minimum input edge id of the chain.

``PolylineType::WALK`` (backtracking allowed, Eulerian-walk extraction
with excess-degree starts and loop splicing, graph.d:1489-1560) is
genuinely sequential *within* a connected multigraph, so it is exposed
per-graph: :func:`assemble_walks_per_graph` runs the reference algorithm
inside one ``applyInPandas`` group per ``graph_id`` — the builder
invocation is the unit of parallelism, exactly like
``snap_polygons_table``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Below this many state rows the pointer-doubling round joins use an
# explicit broadcast hash join: the per-round state (edge_id, ptr, d, root,
# minid = 5 longs/row, ~40 MB at the limit) is collected once per round and
# the round collapses to ONE map stage instead of a 3-stage shuffle join —
# with AQE launching a job per exchange stage, that is the difference
# between ~2 and ~6 jobs per doubling round.  Above the limit the shuffle
# join is kept unchanged (the 100 TB path: state is never broadcast).
BROADCAST_STATE_ROWS = 1_000_000
# in broadcast mode the round state is also coalesced to ~this many rows
# per partition: a 20-row fixture otherwise runs every round's map stage
# as 32 near-empty tasks whose launch overhead dwarfs the work
STATE_ROWS_PER_PARTITION = 65_536


def _state_parts(n_rows: int) -> int:
    return max(1, (n_rows + STATE_ROWS_PER_PARTITION - 1) // STATE_ROWS_PER_PARTITION)


CHAIN_SCHEMA = T.StructType(
    [
        T.StructField("polyline_id", T.LongType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("edge_id", T.LongType(), False),
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)


def _rank_to_roots(state: DataFrame, max_rounds: int) -> tuple[DataFrame, int]:
    """Pointer-doubling list ranking over a functional predecessor graph.

    ``state`` columns: edge_id, ptr (nullable long — predecessor edge id),
    d (long — distance to ptr), root (nullable long — terminal edge id,
    set iff ptr is null), minid (long — running min edge id over self and
    all predecessors within 2^k hops).

    Terminates when a full round changes no row's minid and nulls no
    row's ptr: on a path some unfinished row nulls its ptr every round
    (the unfinished row nearest the start always lands on a finished
    target), and a globally minid-stable round is a monotone fixpoint
    (round k+1's new window half is a round-(k-1) window that round k
    already proved adds nothing) — so at exit every path row is ranked
    (ptr null, root = chain-start edge id, d = offset from the start)
    and the rows with ptr still set are exactly the pure-cycle rows,
    their minid = the cycle minimum; the caller uses that to cut.

    Returns ``(state, n_live)`` where ``n_live`` is the number of rows
    whose ptr is still set (== the pure-cycle row count), so callers
    never re-scan for cycles.  ONE Spark job per round: the old/new
    comparison rides inside the round's join as ``_chg``/``_live`` flag
    columns, and the lazy localCheckpoint is materialized by the same
    aggregate action that reads the two counters (the previous shape
    paid three jobs per round — a live probe, an eager checkpoint and a
    join-based change count)."""
    state = state.localCheckpoint(eager=False)
    # ONE job materializes the checkpoint and reads both counters: total
    # rows pick the round-join strategy, live rows seed the loop guard
    row0 = state.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("ptr").isNotNull().cast("int")).alias("l"),
    ).collect()[0]
    n_rows = int(row0["n"] or 0)
    n_live = int(row0["l"] or 0)
    broadcast_rounds = n_rows <= BROADCAST_STATE_ROWS
    coalesce_to = _state_parts(n_rows) if broadcast_rounds else None
    for _ in range(max_rounds):
        if n_live == 0:
            break
        p = state.select(
            F.col("edge_id").alias("p_id"),
            F.col("ptr").alias("p_ptr"),
            F.col("d").alias("p_d"),
            F.col("root").alias("p_root"),
            F.col("minid").alias("p_minid"),
        )
        hop = F.col("p_id").isNotNull()
        new_ptr = F.when(~hop, F.col("ptr")).otherwise(F.col("p_ptr"))
        new_minid = F.when(~hop, F.col("minid")).otherwise(
            F.least(F.col("minid"), F.col("p_minid"))
        )
        p_side = F.broadcast(p) if broadcast_rounds else p
        nxt = (
            state.join(p_side, state["ptr"] == p_side["p_id"], "left")
            .select(
                "edge_id",
                new_ptr.alias("ptr"),
                F.when(~hop, F.col("d"))
                .otherwise(F.col("d") + F.col("p_d"))
                .alias("d"),
                F.when(~hop, F.col("root"))
                .otherwise(F.col("p_root"))
                .alias("root"),
                new_minid.alias("minid"),
                (
                    (new_ptr.isNull() != F.col("ptr").isNull())
                    | (new_minid != F.col("minid"))
                )
                .cast("int")
                .alias("_chg"),
                new_ptr.isNotNull().cast("int").alias("_live"),
            )
        )
        if coalesce_to is not None:
            nxt = nxt.coalesce(coalesce_to)
        nxt = nxt.localCheckpoint(eager=False)
        row = nxt.agg(
            F.sum("_chg").alias("c"), F.sum("_live").alias("l")
        ).collect()[0]
        changed = int(row["c"] or 0)
        n_live = int(row["l"] or 0)
        state = nxt.drop("_chg", "_live")
        if changed == 0:
            break
    return state, n_live


def assemble_polylines(
    edges_df: DataFrame,
    edge_id: str = "edge_id",
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
) -> DataFrame:
    """Directed PATH polyline assembly (graph.d:1453-1487 semantics).

    ``edges_df`` columns: ``edge_id`` (long, the input edge id whose
    minimum canonicalizes cycle starts), ``src`` / ``dst`` (long vertex
    keys — post-snap site ids, so vertex identity is exact).  Returns
    (polyline_id, seq, edge_id, src, dst) where ``polyline_id`` is the
    minimum edge id of the chain and ``seq`` orders its edges from the
    chain start (the unique non-interior-source edge for a path, the
    minimum-id edge for a pure cycle).  ``max_rounds`` bounds the
    doubling loop — 64 covers any chain that fits in a long.
    """
    e = edges_df.select(
        F.col(edge_id).cast("long").alias("edge_id"),
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    ).localCheckpoint(eager=True)
    # broadcast-sized edge soup: hash the derived dimension frames
    # (interior vertices, predecessor links, chain ids) map-side so the
    # construction and assembly joins stop cascading exchanges; above the
    # limit every join below stays a shuffle join (the 100 TB path)
    bc = (
        F.broadcast
        if e.count() <= BROADCAST_STATE_ROWS
        else (lambda df: df)
    )
    deg = (
        e.select(F.col("src").alias("v"), F.lit(0).alias("i"), F.lit(1).alias("o"))
        .unionByName(
            e.select(F.col("dst").alias("v"), F.lit(1).alias("i"), F.lit(0).alias("o"))
        )
        .groupBy("v")
        .agg(F.sum("i").alias("ind"), F.sum("o").alias("outd"))
    )
    interior = deg.filter((F.col("ind") == 1) & (F.col("outd") == 1)).select("v")

    # pred(e2) = the unique e with e.dst == e2.src, defined iff e2.src
    # is interior (ind==1 → unique pred; outd==1 → unique succ)
    preds = (
        e.join(bc(interior), e["src"] == interior["v"])
        .select(F.col("edge_id").alias("to_id"), F.col("src").alias("via"))
        .join(
            bc(e.select(F.col("edge_id").alias("pred_id"), F.col("dst").alias("pv"))),
            F.col("via") == F.col("pv"),
        )
        .select("to_id", "pred_id")
    )
    state = e.join(bc(preds), e["edge_id"] == preds["to_id"], "left").select(
        "edge_id",
        F.col("pred_id").alias("ptr"),
        F.when(F.col("pred_id").isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("d"),
        F.when(F.col("pred_id").isNull(), F.col("edge_id")).alias("root"),
        F.col("edge_id").alias("minid"),
    )
    ranked, n_cyc = _rank_to_roots(state, max_rounds)

    # pure cycles: ptr still set, minid = cycle min.  Cut the incoming
    # link of the min-id edge (canonicalizeLoopOrder start) and re-rank.
    # (_rank_to_roots already reports the live/cycle row count — no extra
    # probe job here.)
    if n_cyc > 0:
        cyc = ranked.filter(F.col("ptr").isNotNull())
        cyc_ids = cyc.select("edge_id", F.col("minid").alias("cyc_min"))
        cut_state = (
            e.join(bc(cyc_ids), "edge_id")
            .join(bc(preds), F.col("edge_id") == preds["to_id"], "left")
            .select(
                "edge_id",
                F.when(F.col("edge_id") == F.col("cyc_min"), F.lit(None))
                .otherwise(F.col("pred_id"))
                .cast("long")
                .alias("ptr"),
                F.when(F.col("edge_id") == F.col("cyc_min"), F.lit(0))
                .otherwise(F.lit(1))
                .cast("long")
                .alias("d"),
                F.when(
                    F.col("edge_id") == F.col("cyc_min"), F.col("edge_id")
                ).alias("root"),
                F.col("edge_id").alias("minid"),
            )
        )
        cyc_ranked, _ = _rank_to_roots(cut_state, max_rounds)
        ranked = ranked.filter(F.col("ptr").isNull()).unionByName(cyc_ranked)

    chain_ids = ranked.groupBy("root").agg(F.min("edge_id").alias("polyline_id"))
    return (
        ranked.join(bc(chain_ids), "root")
        .join(bc(e), "edge_id")
        .select(
            F.col("polyline_id").cast("long"),
            F.col("d").cast("int").alias("seq"),
            F.col("edge_id").cast("long"),
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
        )
    )


def build_polyline_graph(
    lines_df: DataFrame,
    exponent: int = 4,
    max_rounds: int = 64,
    id_stride: int = 1 << 32,
) -> DataFrame:
    """The full builder pipeline for polyline input: S2Builder snap +
    S2PolylineVectorLayer PATH assembly (s2builder.d:100-700 +
    builder/util/s2polyline_vector_layer.d) as one composed operator.

    All input polylines share ONE snap-site set (IntLatLng E{exponent}
    sites), so a vertex where two lines meet becomes the same site and
    chains merge ACROSS input lines (or split, if the site turns into a
    junction) — the defining behavior of feeding many polylines through
    one builder, which per-line snapping alone cannot produce.

    Stages: per-line snap (map-only applyInPandas) -> integer site keys
    (exact E4 grid arithmetic, no float equality) -> consecutive-vertex
    edges via a per-line window -> pointer-doubling PATH assembly.
    ``edge_id = line_id * id_stride + seq``, so chain/cycle
    canonicalization prefers lower input line ids, matching the
    reference's input-edge ordering.  The default stride 2^32 cannot
    collide (``seq`` is an int, always < 2^32; line ids must then be
    < 2^31); a caller passing a smaller stride asserts its lines have
    fewer snapped vertices than that stride.

    Returns (polyline_id, seq, src_lat, src_lng, dst_lat, dst_lng).
    """
    from pyspark.sql import Window

    from .overlay import snap_polylines_table

    e = 10**exponent
    width = 360 * e + 1
    snapped = snap_polylines_table(lines_df, exponent=exponent)
    verts = snapped.select(
        "line_id",
        "seq",
        F.round(F.col("vlat") * e).cast("long").alias("lat_e"),
        F.round(F.col("vlng") * e).cast("long").alias("lng_e"),
    ).withColumn(
        "site",
        (F.col("lat_e") + F.lit(90 * e)) * F.lit(width)
        + (F.col("lng_e") + F.lit(180 * e)),
    )
    w = Window.partitionBy("line_id").orderBy("seq")
    edges = (
        verts.withColumn("nsite", F.lead("site").over(w))
        .filter(F.col("nsite").isNotNull())
        .select(
            (F.col("line_id").cast("long") * F.lit(id_stride) + F.col("seq")).alias(
                "edge_id"
            ),
            F.col("site").alias("src"),
            F.col("nsite").alias("dst"),
        )
    )
    chains = assemble_polylines(edges, max_rounds=max_rounds)

    def lat(c):  # integer div/mod only — sites are exact grid keys
        return ((F.expr(f"{c} div {width}") - 90 * e) / float(e)).alias(f"{c}_lat")

    def lng(c):
        return ((F.col(c) % width - 180 * e) / float(e)).alias(f"{c}_lng")

    return chains.select(
        "polyline_id", "seq", lat("src"), lng("src"), lat("dst"), lng("dst")
    )


WALK_SCHEMA = T.StructType(
    [
        T.StructField("graph_id", T.IntegerType(), False),
        T.StructField("walk_id", T.IntegerType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("edge_id", T.LongType(), False),
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)


def _build_walks(edges: list) -> list:
    """Reference ``buildWalks`` (graph.d:1489-1560), directed edges:
    ``edges`` = [(edge_id, src, dst)] sorted by input edge id.  Returns a
    list of walks, each a list of edge tuples.  Starts at vertices with
    outdegree > indegree (consuming one unit of excess per start), then
    splices remaining loops into existing walks (``maximizeWalk``), then
    assembles leftover loops from their min-edge-id chain starts."""
    from collections import defaultdict

    out_edges: dict = defaultdict(list)
    in_edges: dict = defaultdict(list)
    ind: dict = defaultdict(int)
    outd: dict = defaultdict(int)
    for t in edges:
        out_edges[t[1]].append(t)
        in_edges[t[2]].append(t)
        outd[t[1]] += 1
        ind[t[2]] += 1
    used: set = set()
    excess_used: dict = defaultdict(int)

    def next_unused(v):
        best = None
        for t in out_edges[v]:
            if t[0] not in used and (best is None or t[0] < best[0]):
                best = t
        return best

    def build_walk(v):
        walk = []
        while True:
            t = next_unused(v)
            if t is None:
                return walk
            # reference early-stop (graph.d:1608-1619): if v has remaining
            # in-excess and an unused INCOMING edge with id <= the best
            # outgoing id, that outgoing edge continues a DIFFERENT walk —
            # stop here for idempotency across shared vertices
            if outd[v] - ind[v] - excess_used[v] < 0 and any(
                t2[0] not in used and t2[0] <= t[0] for t2 in in_edges[v]
            ):
                return walk
            used.add(t[0])
            walk.append(t)
            v = t[2]

    def maximize_walk(walk):
        # splice unused loops at any vertex already on the walk
        i = 0
        while i <= len(walk):
            v = walk[i][1] if i < len(walk) else walk[-1][2]
            t = next_unused(v)
            if t is None:
                i += 1
                continue
            loop = build_walk(v)
            if not loop:  # defensive: avoid an infinite splice loop
                i += 1
                continue
            # the reference debug-enforces loop closure at this exact
            # point (graph.d enforce(edge(loop.back())[1] == v)): a loop
            # that early-stopped elsewhere would splice a non-contiguous
            # walk silently — fail loudly instead
            assert loop[-1][2] == v, (
                f"maximize_walk: splice loop ends at {loop[-1][2]}, not {v}"
            )
            walk[i:i] = loop
        return walk

    walks = []
    for t in edges:
        if t[0] in used:
            continue
        v = t[1]
        raw = outd[v] - ind[v]
        if raw <= 0:  # reference checks raw excess BEFORE the used offset
            continue
        excess = raw - excess_used[v]
        if excess <= 0:
            continue
        excess_used[v] += 1
        w = build_walk(v)
        if not w:  # defensive: early-stop cannot fire at a start vertex,
            excess_used[v] -= 1  # but never index an empty walk
            continue
        excess_used[w[-1][2]] -= 1
        walks.append(w)
    if len(used) < len(edges):
        for w in walks:
            maximize_walk(w)
    for t in edges:
        if t[0] in used:
            continue
        # after excess-start peeling the unused subgraph is balanced
        # (every vertex ind == outd), i.e. disjoint circuits unreachable
        # from any existing walk; emit each from its min unused edge id
        walks.append(maximize_walk(build_walk(t[1])))
    return walks


def assemble_walks_per_graph(edges_df: DataFrame) -> DataFrame:
    """``PolylineType::WALK`` assembly, one group per ``graph_id``
    (columns: graph_id int, edge_id long, src long, dst long).  The walk
    extraction is sequential within a graph (Euler-walk splicing), so the
    builder invocation — not the edge — is the parallel unit."""

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(key[0])
        edges = sorted(
            (int(r.edge_id), int(r.src), int(r.dst)) for r in pdf.itertuples()
        )
        out = []
        for wid, walk in enumerate(_build_walks(edges)):
            for seq, (eid, s, d) in enumerate(walk):
                out.append((gid, wid, seq, eid, s, d))
        return pd.DataFrame(
            out, columns=["graph_id", "walk_id", "seq", "edge_id", "src", "dst"]
        )

    return edges_df.groupBy("graph_id").applyInPandas(run, WALK_SCHEMA)
