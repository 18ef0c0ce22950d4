"""Edge-PAIR min squared-chord distance as engine-shared ANSI SQL.

Same discipline as functions/edgedist.py: ONE expression text consumed by
Spark via ``F.expr`` and embedded verbatim in the DuckDB oracle, so both
engines evaluate identical IEEE trees and rankings agree bit-for-bit.

Semantics (reference s2edge_distances.d:280-283, mirrored by
s2core.measures.edge_pair_min_dist2): the distance between two geodesic
edges is 0 when they properly cross, else the min of the four
endpoint-to-other-edge distances (an interior-interior minimum of the
distance function between non-crossing arcs does not exist).

The proper-crossing test is the det-sign-product form (generic position —
the same condition crossingSign's triage evaluates; fixtures assert their
dets clear the triage band, tests/test_crossing.py).
"""

from __future__ import annotations

import re

from . import edgedist

# edge columns: first edge (ax..bz) = the TABLE edge; second (cx..dz) = the
# QUERY edge.  Names chosen so the four point-edge instances can't collide.
_P = ("x", "y", "z")


def _renamed(text: str, mapping: dict[str, str]) -> str:
    # ONE simultaneous pass — sequential substitution would re-rewrite
    # freshly inserted names (qx -> ax followed by ax -> cx)
    pat = re.compile(r"\b(" + "|".join(sorted(mapping, key=len, reverse=True)) + r")\b")
    return pat.sub(lambda m: mapping[m.group(1)], text)


def point_edge_exprs(point: str, ea: str, eb: str, tag: str) -> tuple[list[tuple[str, str]], str]:
    """(intermediates, dist2_expr) computing the point-to-edge squared
    chord for point columns ``{point}x..`` against edge ``{ea}*``->``{eb}*``,
    with every intermediate name prefixed by ``tag`` (instance isolation)."""
    mapping = {}
    for ax in _P:
        mapping[f"q{ax}"] = f"{point}{ax}"
        mapping[f"a{ax}"] = f"{ea}{ax}"
        mapping[f"b{ax}"] = f"{eb}{ax}"
    for name, _ in edgedist.INTERMEDIATES:
        mapping[name] = f"{tag}_{name}"
    for extra in ("d_a", "d_b"):
        mapping[extra] = f"{tag}_{extra}"
    inters = [
        (f"{tag}_{name}", _renamed(expr, mapping)) for name, expr in edgedist.INTERMEDIATES
    ]
    dist2 = _renamed(edgedist.DIST2, mapping)
    return inters, dist2


def pair_dist2_parts() -> tuple[list[tuple[str, str]], str]:
    """(intermediates, expr) for the edge-pair distance over columns
    (ax..bz = table edge, cx..dz = query edge)."""
    inters: list[tuple[str, str]] = []
    dists = []
    for point, ea, eb, tag in (
        ("a", "c", "d", "p1"),
        ("b", "c", "d", "p2"),
        ("c", "a", "b", "p3"),
        ("d", "a", "b", "p4"),
    ):
        i, d = point_edge_exprs(point, ea, eb, tag)
        inters.extend(i)
        dists.append(d)
    # proper-crossing dets (raw cross products, generic position)
    inters.extend(
        [
            ("x_n1x", "ay*bz - az*by"),
            ("x_n1y", "az*bx - ax*bz"),
            ("x_n1z", "ax*by - ay*bx"),
            ("x_n2x", "cy*dz - cz*dy"),
            ("x_n2y", "cz*dx - cx*dz"),
            ("x_n2z", "cx*dy - cy*dx"),
            ("x_d1", "x_n1x*cx + x_n1y*cy + x_n1z*cz"),
            ("x_d2", "x_n1x*dx + x_n1y*dy + x_n1z*dz"),
            ("x_d3", "x_n2x*ax + x_n2y*ay + x_n2z*az"),
            ("x_d4", "x_n2x*bx + x_n2y*by + x_n2z*bz"),
        ]
    )
    least = "least(" + ", ".join(f"({d})" for d in dists) + ")"
    expr = (
        "CASE WHEN x_d1*x_d2 < 0 AND x_d1*x_d3 < 0 AND x_d1*x_d4 > 0 "
        f"THEN 0e0 ELSE {least} END"
    )
    return inters, expr


def with_pair_dist2(df):
    """Spark mirror: add dist2 = edge-pair min squared chord to a DataFrame
    carrying (ax..bz, cx..dz).

    Intermediates are added in dependency LAYERS (~6 selects) rather than
    ~54 chained withColumns — chained single-column projections hit the
    analyzer's quadratic plan-rewrite cost and dominated the per-round wall
    time of the edge-target kNN loop.  Expression text is unchanged, so the
    oracle hash parity is unaffected."""
    from pyspark.sql import functions as F

    inters, expr = pair_dist2_parts()
    level: dict[str, int] = {}
    layers: list[list[tuple[str, str]]] = []
    for name, e in inters:
        deps = [n for n in level if re.search(rf"\b{n}\b", e)]
        lvl = 1 + max((level[d] for d in deps), default=0)
        level[name] = lvl
        while len(layers) < lvl:
            layers.append([])
        layers[lvl - 1].append((name, e))
    for layer in layers:
        df = df.select("*", *[F.expr(e).alias(n) for n, e in layer])
    df = df.select("*", F.expr(expr).alias("dist2"))
    return df.drop(*[n for n, _ in inters])


def pair_dist2_select_sql(inner: str, keep: str) -> str:
    """Nested-select SQL computing dist2 over ``inner`` (which must provide
    ax..bz, cx..dz and the ``keep`` columns)."""
    inters, expr = pair_dist2_parts()
    q = f"({inner})"
    cols = "ax, ay, az, bx, by, bz, cx, cy, cz, dx, dy, dz"
    for name, e in inters:
        q = f"(SELECT {keep}, {cols}, {e} AS {name} FROM {q})"
        cols += f", {name}"
    return f"SELECT {keep}, {expr} AS dist2 FROM {q}"
