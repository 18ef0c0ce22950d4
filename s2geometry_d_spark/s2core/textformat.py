"""Reference s2text_format parity (s2text_format.d:48-520).

Parsers accept the reference's "lat:lng, lat:lng" dictionary format
(strings/serialize.d:30-42 dictionaryParse: split on ',', each entry split
on ':' into exactly two fields, whitespace stripped).  Loops and polygons
accept the "empty"/"full" sentinels (empty = [(0,0,1)], full = [(0,0,-1)],
s2loop.d:1374-1379) and ';'-separated loops; make_polygon normalizes each
non-full loop by inversion so it encloses at most half the sphere
(internalMakePolygon, s2text_format.d:260-280), make_verbatim_polygon does
not.  make_index parses the "points # polylines # polygons" format with
'|'-separated shapes (s2text_format.d:358-395) and lax-polygon loop
semantics (per-loop "full" -> zero-vertex loop, s2text_format.d:320-340).

Formatters emit %.15g per coordinate (appendVertex, s2text_format.d:403),
deliberately NOT full double precision — same caveat as the reference's
header comment (line 22).  DuckDB's printf('%.15g') produces the identical
strings (verified), so formatted output is oracle-able.

Spark-first surface: format_latlng_col / parse_latlngs_col are Arrow-
batched column kernels, and make_index_rows feeds the text format straight
into the unified shape-index table builder (operators/shape_index.py) —
the reference's debug format becomes a distributed SOURCE, not a
driver-side object walk.
"""

from __future__ import annotations

import math

import pandas as pd

from .loops import Loop, Polygon
from .measures import loop_area
from .polyline import Polyline
from .regions import LatLngRect

EMPTY_LOOP_VERTEX = (0.0, 0.0, 1.0)
FULL_LOOP_VERTEX = (0.0, 0.0, -1.0)


# ------------------------------------------------------------------ parsing


def parse_latlngs(s: str) -> list[tuple[float, float]]:
    """dictionaryParse + per-field float conversion; ValueError on any
    malformed entry (the reference's OrDie contract)."""
    s = s.strip()
    if not s:
        return []
    out = []
    for entry in s.split(","):
        fields = entry.split(":")
        if len(fields) != 2:
            raise ValueError(f"bad lat:lng entry {entry!r} in {s!r}")
        out.append((float(fields[0].strip()), float(fields[1].strip())))
    return out


def _ll_to_xyz(lat: float, lng: float) -> tuple[float, float, float]:
    phi, theta = math.radians(lat), math.radians(lng)
    c = math.cos(phi)
    return (math.cos(theta) * c, math.sin(theta) * c, math.sin(phi))


def parse_points(s: str) -> list[tuple[float, float, float]]:
    return [_ll_to_xyz(lat, lng) for lat, lng in parse_latlngs(s)]


def make_latlng(s: str) -> tuple[float, float]:
    lls = parse_latlngs(s)
    if len(lls) != 1:
        raise ValueError(f"expected exactly one lat:lng in {s!r}")
    return lls[0]


def make_point(s: str) -> tuple[float, float, float]:
    pts = parse_points(s)
    if len(pts) != 1:
        raise ValueError(f"expected exactly one point in {s!r}")
    return pts[0]


def make_latlng_rect(s: str) -> LatLngRect:
    lls = parse_latlngs(s)
    if not lls:
        raise ValueError(f"expected at least one lat:lng in {s!r}")
    rect = LatLngRect.from_degrees(lls[0][0], lls[0][1], lls[0][0], lls[0][1])
    for lat, lng in lls[1:]:
        rect = rect.add_point_degrees(lat, lng)
    return rect


def make_loop(s: str) -> Loop:
    s = s.strip()
    if s == "empty":
        return Loop([EMPTY_LOOP_VERTEX])
    if s == "full":
        return Loop([FULL_LOOP_VERTEX])
    return Loop(parse_points(s))


def loop_is_empty(loop: Loop) -> bool:
    return len(loop.vertices) == 1 and loop.vertices[0] == EMPTY_LOOP_VERTEX


def loop_is_full(loop: Loop) -> bool:
    return len(loop.vertices) == 1 and loop.vertices[0] == FULL_LOOP_VERTEX


def normalize_loop(loop: Loop) -> Loop:
    """Invert (reverse vertex order) if the loop encloses more than half the
    sphere — S2Loop.normalize()'s contract (area <= 2*pi after the call)."""
    if len(loop.vertices) < 3:
        return loop
    if loop_area(loop.vertices) > 2.0 * math.pi:
        return Loop(list(reversed(loop.vertices)))
    return loop


def make_polyline(s: str) -> Polyline:
    return Polyline.from_latlngs(parse_latlngs(s))


def make_polygon(s: str, normalize_loops: bool = True) -> Polygon:
    s = s.strip()
    if s == "empty":
        s = ""
    loops: list[Loop] = []
    for loop_str in s.split(";"):
        loop_str = loop_str.strip()
        if not loop_str:
            break
        loop = make_loop(loop_str)
        if normalize_loops and not loop_is_full(loop):
            loop = normalize_loop(loop)
        loops.append(loop)
    return Polygon(loops)


def make_verbatim_polygon(s: str) -> Polygon:
    return make_polygon(s, normalize_loops=False)


def make_lax_polygon(s: str) -> list[list[tuple[float, float, float]]]:
    """Loops as raw vertex lists; per-loop "full" -> zero-vertex loop,
    per-loop "empty" skipped (s2text_format.d makeLaxPolygon)."""
    loops: list[list[tuple[float, float, float]]] = []
    for loop_str in s.split(";"):
        loop_str = loop_str.strip()
        if not loop_str:
            break
        if loop_str == "full":
            loops.append([])
        elif loop_str != "empty":
            loops.append(parse_points(loop_str))
    return loops


def make_index(s: str) -> dict:
    """Parse "points # polylines # polygons" into plain geometry lists:
    {'points': [(lat,lng)...], 'polylines': [[(lat,lng)...]...],
     'polygons': [loops-of-latlngs ...]} (lax semantics, latlng degrees —
    ready for the distributed index builder)."""
    parts = s.split("#")
    if len(parts) != 3:
        raise ValueError(f"index format needs exactly two '#': {s!r}")
    points: list[tuple[float, float]] = []
    for p in parts[0].strip().split("|"):
        p = p.strip()
        if not p:
            break
        points.append(make_latlng(p))
    polylines = []
    for ln in parts[1].strip().split("|"):
        ln = ln.strip()
        if not ln:
            continue
        polylines.append(parse_latlngs(ln))
    polygons = []
    for pg in parts[2].strip().split("|"):
        pg = pg.strip()
        if not pg:
            continue
        loops = []
        for loop_str in pg.split(";"):
            loop_str = loop_str.strip()
            if not loop_str:
                break
            if loop_str == "full":
                loops.append([])
            elif loop_str != "empty":
                loops.append(parse_latlngs(loop_str))
        polygons.append(loops)
    return {"points": points, "polylines": polylines, "polygons": polygons}


# --------------------------------------------------------------- formatting


def _fmt(v: float) -> str:
    return "%.15g" % v


def _xyz_to_ll(p) -> tuple[float, float]:
    x, y, z = p
    return (
        math.degrees(math.atan2(z, math.hypot(x, y))),
        math.degrees(math.atan2(y, x)),
    )


def latlng_to_string(lat: float, lng: float) -> str:
    return f"{_fmt(lat)}:{_fmt(lng)}"


def point_to_string(p) -> str:
    return latlng_to_string(*_xyz_to_ll(p))


def latlngs_to_string(lls) -> str:
    return ", ".join(latlng_to_string(lat, lng) for lat, lng in lls)


def points_to_string(pts) -> str:
    return ", ".join(point_to_string(p) for p in pts)


def rect_to_string(rect: LatLngRect) -> str:
    return (
        f"{latlng_to_string(*rect.lo_degrees())}, "
        f"{latlng_to_string(*rect.hi_degrees())}"
    )


def loop_to_string(loop: Loop) -> str:
    if loop_is_empty(loop):
        return "empty"
    if loop_is_full(loop):
        return "full"
    return points_to_string(loop.vertices)


def polyline_to_string(pl: Polyline) -> str:
    return points_to_string(pl.vertices)


def polygon_to_string(poly: Polygon) -> str:
    if not poly.loops:
        return "empty"
    if len(poly.loops) == 1 and loop_is_full(poly.loops[0]):
        return "full"
    return ";\n".join(points_to_string(lp.vertices) for lp in poly.loops)


def index_to_string(idx: dict) -> str:
    """Inverse of make_index with the reference's exact spacing (trailing
    space after a non-empty dim 0 and always after dim 1 — the examples
    "# #", "0:0 # #", "# # 0:0, 0:1, 1:0" all round-trip)."""
    val = ""
    if idx["points"]:
        val += " | ".join(latlng_to_string(*p) for p in idx["points"]) + " "
    val += "#"
    if idx["polylines"]:
        val += " " + " | ".join(latlngs_to_string(ln) for ln in idx["polylines"])
    val += " #"
    if idx["polygons"]:
        val += " " + " | ".join(
            "; ".join(latlngs_to_string(lp) for lp in pg) for pg in idx["polygons"]
        )
    return val


# ------------------------------------------------------------ Spark kernels


def format_latlng_col(lat_col, lng_col):
    """Arrow-batched %.15g formatter: (lat, lng) -> 'lat:lng' string column
    (byte-identical to DuckDB printf('%.15g:%.15g', lat, lng))."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _k(lat: pd.Series, lng: pd.Series) -> pd.Series:
        return pd.Series(
            ["%.15g:%.15g" % t for t in zip(lat.values, lng.values)], dtype=object
        )

    return _k(lat_col, lng_col)


def parse_latlngs_col(text_col):
    """Arrow-batched dictionaryParse: text -> array<struct<lat,lng>>
    (malformed entries -> null element-free empty array would hide bugs, so
    malformed input raises — OrDie semantics, same as the scalar parser)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<lat:double,lng:double>>")
    def _k(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [{"lat": lat, "lng": lng} for lat, lng in parse_latlngs(t)]
                for t in texts
            ],
            dtype=object,
        )

    return _k(text_col)
