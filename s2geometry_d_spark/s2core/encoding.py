"""Reference wire-format encode/decode for cell unions and polylines.

Parquet subsumes serialization inside this engine, but interop with data
serialized by the reference library needs its exact byte layout
(s2cell_union.d:697-733, s2polyline.d:707-731 over util/coding/coder.d —
native little-endian fixed-width fields):

* cell union:  u8 version (=1) | u64 count | count x u64 cell ids
* polyline:    u8 version (=1) | u32 count | count x 3 x f64 xyz vertices

Decode mirrors the reference's guards: version must not exceed the current
one, the cell count is capped (S2CELL_UNION_DECODE_MAX_NUM_CELLS =
1,000,000, s2cell_union.d:36) and short buffers fail — here with
ValueError instead of a bool, the idiomatic Python surface.
"""

from __future__ import annotations

import struct

import numpy as np

CELL_UNION_ENCODING_VERSION = 1
POLYLINE_ENCODING_VERSION = 1
DECODE_MAX_NUM_CELLS = 1_000_000
# analogous sanity caps for loop/polygon decode (the reference caps cells
# but trusts loop counts; a cap here keeps a hostile 4-byte count field
# from driving a giant allocation before the length check)
DECODE_MAX_NUM_VERTICES = 50_000_000
DECODE_MAX_NUM_LOOPS = 10_000_000


def encode_cell_union(cell_ids) -> bytes:
    """Serialize normalized (or raw) uint64 cell ids to the reference's
    lossless format (s2cell_union.d:702-712)."""
    ids = np.asarray(cell_ids, dtype=np.uint64)
    return (
        struct.pack("<BQ", CELL_UNION_ENCODING_VERSION, ids.shape[0])
        + ids.astype("<u8").tobytes()
    )


def decode_cell_union(data: bytes) -> np.ndarray:
    """Inverse of encode_cell_union (s2cell_union.d:715-733 guards)."""
    if len(data) < 9:
        raise ValueError("buffer too short for version + count")
    version, count = struct.unpack_from("<BQ", data, 0)
    if version > CELL_UNION_ENCODING_VERSION:
        raise ValueError(f"unsupported cell-union encoding version {version}")
    if count > DECODE_MAX_NUM_CELLS:
        raise ValueError(f"cell count {count} exceeds decode cap")
    need = 9 + 8 * count
    if len(data) < need:
        raise ValueError("buffer truncated")
    return np.frombuffer(data, dtype="<u8", count=count, offset=9).astype(np.uint64)


LOOP_ENCODING_VERSION = 1
POLYGON_ENCODING_VERSION = 1


def encode_rect(lat_lo: float, lat_hi: float, lng_lo: float, lng_hi: float) -> bytes:
    """LatLngRect wire format (s2latlng_rect.d:836-845): u8 version + 4 f64
    (radians)."""
    return struct.pack("<Bdddd", LOOP_ENCODING_VERSION, lat_lo, lat_hi, lng_lo, lng_hi)


def decode_rect(data: bytes, offset: int = 0):
    if len(data) < offset + 33:
        raise ValueError("buffer too short for rect (version + 4 f64)")
    version = data[offset]
    if version > LOOP_ENCODING_VERSION:
        raise ValueError(f"unsupported rect encoding version {version}")
    vals = struct.unpack_from("<dddd", data, offset + 1)
    return vals, offset + 33


def encode_loop(vertices, origin_inside: bool, depth: int = 0, bound=None) -> bytes:
    """Loop wire format (s2loop.d:1113-1124): u8 version, u32 count, raw
    f64 xyz vertices, u8 origin_inside, u32 depth, rect bound.  When
    ``bound`` (radians 4-tuple) is omitted it is derived with the engine's
    edge-aware bounder — a valid conservative superset (the reference only
    requires the encoded bound to CONTAIN the loop)."""
    v = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    if bound is None:
        from .rectbounder import chain_rect_bound

        r = chain_rect_bound([tuple(x) for x in v], closed=True)
        bound = (r.lat_lo, r.lat_hi, r.lng.lo, r.lng.hi)
    return (
        struct.pack("<BI", LOOP_ENCODING_VERSION, v.shape[0])
        + v.astype("<f8").tobytes()
        + struct.pack("<BI", int(bool(origin_inside)), depth)
        + encode_rect(*bound)
    )


def decode_loop(data: bytes, offset: int = 0):
    """Returns ((vertices, origin_inside, depth, bound), next_offset).

    Short buffers raise ValueError (the module-docstring guard promise,
    matching decode_cell_union/decode_polyline); the vertex count is capped
    so a hostile count field cannot drive a giant allocation."""
    if len(data) < offset + 5:
        raise ValueError("buffer too short for loop version + count")
    version = data[offset]
    if version > LOOP_ENCODING_VERSION:
        raise ValueError(f"unsupported loop encoding version {version}")
    (count,) = struct.unpack_from("<I", data, offset + 1)
    if count > DECODE_MAX_NUM_VERTICES:
        raise ValueError(f"loop vertex count {count} exceeds decode cap")
    pos = offset + 5
    # vertices + origin/depth trailer must fit before any allocation
    if len(data) < pos + 24 * count + 5:
        raise ValueError("buffer truncated inside loop vertices")
    verts = (
        np.frombuffer(data, dtype="<f8", count=3 * count, offset=pos)
        .astype(np.float64)
        .reshape(count, 3)
    )
    pos += 24 * count
    origin_inside, depth = struct.unpack_from("<BI", data, pos)
    pos += 5
    bound, pos = decode_rect(data, pos)
    return (verts, bool(origin_inside), depth, bound), pos


def encode_polygon(loops, origin_inside_flags, depths=None) -> bytes:
    """Polygon lossless wire format (s2polygon.d:2080-2098): u8 version,
    u8 owns_loops (always 1, compatibility), u8 has_holes, u32 num_loops,
    loop encodings, rect bound.  ``depths`` defaults to all-shells (0);
    a loop with odd depth is a hole (s2loop.d isHole semantics)."""
    from .rectbounder import chain_rect_bound, rect_union

    loops = list(loops)
    origin_inside_flags = list(origin_inside_flags)
    depths = list(depths) if depths is not None else [0] * len(loops)
    if not (len(loops) == len(origin_inside_flags) == len(depths)):
        raise ValueError(
            f"encode_polygon: mismatched lengths — {len(loops)} loops, "
            f"{len(origin_inside_flags)} origin flags, {len(depths)} depths"
        )
    has_holes = any(d & 1 for d in depths)
    body = struct.pack(
        "<BBBI", POLYGON_ENCODING_VERSION, 1, int(has_holes), len(loops)
    )
    bounds = []
    for vs, oi, d in zip(loops, origin_inside_flags, depths):
        # compute each loop's bound ONCE and hand it to encode_loop (it
        # would otherwise re-derive the same bound internally)
        r = chain_rect_bound(
            [tuple(x) for x in np.asarray(vs).reshape(-1, 3)], closed=True
        )
        body += encode_loop(vs, oi, d, bound=(r.lat_lo, r.lat_hi, r.lng.lo, r.lng.hi))
        bounds.append(r)
    total = bounds[0]
    for b in bounds[1:]:
        total = rect_union(total, b)
    return body + encode_rect(total.lat_lo, total.lat_hi, total.lng.lo, total.lng.hi)


def decode_polygon(data: bytes, offset: int = 0):
    """Returns ((loops, bound), next_offset) with loops =
    [(vertices, origin_inside, depth, loop_bound), ...]."""
    if len(data) < offset + 7:
        raise ValueError("buffer too short for polygon header")
    version = data[offset]
    if version > POLYGON_ENCODING_VERSION:
        raise ValueError(f"unsupported polygon encoding version {version}")
    (num_loops,) = struct.unpack_from("<I", data, offset + 3)
    if num_loops > DECODE_MAX_NUM_LOOPS:
        raise ValueError(f"loop count {num_loops} exceeds decode cap")
    pos = offset + 7
    loops = []
    for _ in range(num_loops):
        lp, pos = decode_loop(data, pos)
        loops.append(lp)
    bound, pos = decode_rect(data, pos)
    return (loops, bound), pos


def encode_polyline(vertices) -> bytes:
    """Serialize xyz vertices to the reference's lossless polyline format
    (s2polyline.d:707-714): u8 version, u32 count, raw float64 triples."""
    v = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    return (
        struct.pack("<BI", POLYLINE_ENCODING_VERSION, v.shape[0])
        + v.astype("<f8").tobytes()
    )


def decode_polyline(data: bytes) -> np.ndarray:
    """Inverse of encode_polyline (s2polyline.d:717-731 guards)."""
    if len(data) < 5:
        raise ValueError("buffer too short for version + count")
    version, count = struct.unpack_from("<BI", data, 0)
    if version > POLYLINE_ENCODING_VERSION:
        raise ValueError(f"unsupported polyline encoding version {version}")
    need = 5 + 24 * count
    if len(data) < need:
        raise ValueError("buffer truncated")
    return (
        np.frombuffer(data, dtype="<f8", count=3 * count, offset=5)
        .astype(np.float64)
        .reshape(count, 3)
    )
