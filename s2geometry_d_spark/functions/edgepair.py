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


def _pair_parts(c: str, d: str, tag: str) -> tuple[list[tuple[str, str]], str]:
    """(intermediates, expr) for the pair distance between the table edge
    (ax..bz) and the edge ``{c}* -> {d}*``; all instance names prefixed by
    ``tag`` so several query edges can score in one projection."""
    inters: list[tuple[str, str]] = []
    dists = []
    for point, ea, eb, ptag in (
        ("a", c, d, f"{tag}p1"),
        ("b", c, d, f"{tag}p2"),
        (c, "a", "b", f"{tag}p3"),
        (d, "a", "b", f"{tag}p4"),
    ):
        i, dd = point_edge_exprs(point, ea, eb, ptag)
        inters.extend(i)
        dists.append(dd)
    # proper-crossing dets (raw cross products, generic position)
    inters.extend(
        [
            (f"{tag}x_n1x", "ay*bz - az*by"),
            (f"{tag}x_n1y", "az*bx - ax*bz"),
            (f"{tag}x_n1z", "ax*by - ay*bx"),
            (f"{tag}x_n2x", f"{c}y*{d}z - {c}z*{d}y"),
            (f"{tag}x_n2y", f"{c}z*{d}x - {c}x*{d}z"),
            (f"{tag}x_n2z", f"{c}x*{d}y - {c}y*{d}x"),
            (f"{tag}x_d1", f"{tag}x_n1x*{c}x + {tag}x_n1y*{c}y + {tag}x_n1z*{c}z"),
            (f"{tag}x_d2", f"{tag}x_n1x*{d}x + {tag}x_n1y*{d}y + {tag}x_n1z*{d}z"),
            (f"{tag}x_d3", f"{tag}x_n2x*ax + {tag}x_n2y*ay + {tag}x_n2z*az"),
            (f"{tag}x_d4", f"{tag}x_n2x*bx + {tag}x_n2y*by + {tag}x_n2z*bz"),
        ]
    )
    least = "least(" + ", ".join(f"({d})" for d in dists) + ")"
    expr = (
        f"CASE WHEN {tag}x_d1*{tag}x_d2 < 0 AND {tag}x_d1*{tag}x_d3 < 0 "
        f"AND {tag}x_d1*{tag}x_d4 > 0 THEN 0e0 ELSE {least} END"
    )
    return inters, expr


def pair_dist2_parts() -> tuple[list[tuple[str, str]], str]:
    """(intermediates, expr) for the edge-pair distance over columns
    (ax..bz = table edge, cx..dz = query edge)."""
    return _pair_parts("c", "d", "")


def cell_dist2_parts() -> tuple[list[tuple[str, str]], str]:
    """(intermediates, expr) for table-edge-to-CELL min squared chord over
    columns (ax..bz = table edge; v0x..v3z = cell vertices in CCW order;
    n0x..n3z = the cell's INWARD boundary-edge normals).

    Semantics (s2cell.d getDistance(v0, v1) via
    s2min_distance_targets.d:184-208 CellTarget): 0 when either endpoint
    lies inside the cell (covers edge-fully-inside; a boundary crossing
    zeroes its pair term anyway), else the min pair distance against the
    four boundary edges."""
    inters: list[tuple[str, str]] = []
    dists = []
    for k in range(4):
        i, e = _pair_parts(f"v{k}", f"v{(k + 1) % 4}", f"c{k}")
        inters.extend(i)
        dists.append(e)
    def inside(p: str) -> str:
        return " AND ".join(
            f"({p}x*n{k}x + {p}y*n{k}y + {p}z*n{k}z >= 0e0)" for k in range(4)
        )
    least = "least(" + ", ".join(f"({d})" for d in dists) + ")"
    expr = f"CASE WHEN ({inside('a')}) OR ({inside('b')}) THEN 0e0 ELSE {least} END"
    return inters, expr


def _with_parts(df, inters, expr):
    """Add dist2 from (intermediates, expr) in dependency LAYERS (~6
    selects) rather than chained withColumns — chained single-column
    projections hit the analyzer's quadratic plan-rewrite cost and
    dominated the per-round wall time of the edge-target kNN loop.
    Expression text is unchanged, so oracle hash parity is unaffected."""
    from pyspark.sql import functions as F

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


def with_pair_dist2(df):
    """Spark mirror: add dist2 = edge-pair min squared chord to a DataFrame
    carrying (ax..bz, cx..dz)."""
    inters, expr = pair_dist2_parts()
    return _with_parts(df, inters, expr)


def with_cell_dist2(df):
    """Spark mirror: add dist2 = edge-to-cell min squared chord to a
    DataFrame carrying (ax..bz, v0x..v3z, n0x..n3z)."""
    inters, expr = cell_dist2_parts()
    return _with_parts(df, inters, expr)


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


def cell_dist2_select_sql(inner: str, keep: str) -> str:
    """SQL computing the edge-to-cell dist2 over ``inner`` (must provide
    ax..bz, v0x..v3z, n0x..n3z and the ``keep`` columns).

    Uses DuckDB's LATERAL column aliases (each intermediate referencing
    earlier ones in the SAME select) instead of the nested-select chain the
    pair fragment uses — with 248 intermediates the nested form's repeated
    column lists grow quadratically (~350 KB) and exhaust the parser."""
    inters, expr = cell_dist2_parts()
    alias_list = ",\n       ".join(f"{e} AS {name}" for name, e in inters)
    vn = ", ".join(
        f"{p}{k}{ax}" for p in ("v", "n") for k in range(4) for ax in ("x", "y", "z")
    )
    return (
        f"SELECT {keep}, {expr} AS dist2 FROM (\n"
        f"SELECT {keep}, ax, ay, az, bx, by, bz, {vn},\n       {alias_list}\n"
        f"FROM ({inner})\n)"
    )
