"""Compressed point encoding for cell-center sequences — the reference's
s2point_compression format (s2point_compression.d:16-45, the documented
stream layout; the D port leaves the body as TODO so the layout comment IS
the contract):

* decompose points into (face, si, ti);
* run-length encode faces, each run as varint(face + 6 * (count - 1));
* right-shift (si, ti) by (31 - level) to the (pi, qi) space (the low
  bits are constant for level-k cell centers);
* second-derivative (linear-prediction) encode the pi and qi sequences;
* zig-zag encode every derivative but the first;
* BIT-INTERLEAVE each (pi_enc, qi_enc) pair into one integer;
* first interleaved value fixed-length little-endian in
  ceil(2 * level / 8) bytes (varint would enlarge it); the rest varint64;
* then varint(num_off_center) and, per off-center point,
  varint(index) + 24 raw little-endian xyz bytes — the lossless escape for
  points that are NOT level-k cell centers.

Round-trips are exact: cell-center points reconstruct bit-identically from
(face, pi, qi) and off-center points from their raw doubles.  The
"~3.8 bytes per additional vertex" figure quoted by the reference for
geographic chains is reproduced by the locality test.
"""

from __future__ import annotations

import struct

import numpy as np

from . import cellid as ci
from . import coords

MAX_LEVEL = 30


# ----------------------------------------------------------- primitives


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _put_varint(out: bytearray, v: int) -> None:
    if v < 0:
        raise ValueError("varint must be non-negative")
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _get_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        if pos >= len(data):
            raise ValueError("buffer truncated inside varint")
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not (b & 0x80):
            return v, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _interleave(pi: int, qi: int, level: int) -> int:
    out = 0
    for bit in range(level):
        out |= ((pi >> bit) & 1) << (2 * bit)
        out |= ((qi >> bit) & 1) << (2 * bit + 1)
    return out


def _deinterleave(v: int, level: int) -> tuple[int, int]:
    pi = qi = 0
    for bit in range(level):
        pi |= ((v >> (2 * bit)) & 1) << bit
        qi |= ((v >> (2 * bit + 1)) & 1) << bit
    return pi, qi


# ----------------------------------------------------------- face / si-ti


def points_to_face_si_ti(points):
    """(face, si, ti, cell_level) per point — cell_level is the level whose
    cell center the point exactly equals, or -1 (S2XYZFaceSiTi,
    s2point_compression.d:52-61)."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    out = []
    for x, y, z in pts:
        face, u, v = coords.xyz_to_face_uv(
            np.array([x]), np.array([y]), np.array([z])
        )
        s = coords.uv_to_st(u)[0]
        t = coords.uv_to_st(v)[0]
        si = int(coords.st_to_si_ti(np.array([s]))[0])
        ti = int(coords.st_to_si_ti(np.array([t]))[0])
        f = int(face[0])
        # the point is a level-k center iff si and ti both have exactly
        # (30 - k) trailing zeros after an odd part (si = (2i+1) << (30-k))
        lvl = -1
        if si != 0 and ti != 0:
            tz_s = (si & -si).bit_length() - 1
            tz_t = (ti & -ti).bit_length() - 1
            if tz_s == tz_t and tz_s <= MAX_LEVEL:
                k = MAX_LEVEL - tz_s
                # verify exact reconstruction (floating error guard)
                cx, cy, cz = _center_xyz(f, si, ti)
                if cx == x and cy == y and cz == z:
                    lvl = k
        out.append((f, si, ti, lvl))
    return out


def _center_xyz(face: int, si: int, ti: int) -> tuple[float, float, float]:
    s = coords.si_ti_to_st(np.array([si], dtype=np.float64))[0]
    t = coords.si_ti_to_st(np.array([ti], dtype=np.float64))[0]
    u = coords.st_to_uv_scalar(float(s))
    v = coords.st_to_uv_scalar(float(t))
    x, y, z = coords.face_uv_to_xyz_scalar(face, u, v)
    import math

    n = math.sqrt(x * x + y * y + z * z)
    return (x / n, y / n, z / n)


# ----------------------------------------------------------- encode/decode


def encode_points_compressed(points, level: int) -> bytes:
    """Compress a point sequence assuming most points are level-``level``
    cell centers; others ride the lossless raw escape."""
    fst = points_to_face_si_ti(points)
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    out = bytearray()

    # faces, run-length encoded
    runs: list[tuple[int, int]] = []
    for f, _, _, _ in fst:
        if runs and runs[-1][0] == f:
            runs[-1] = (f, runs[-1][1] + 1)
        else:
            runs.append((f, 1))
    _put_varint(out, len(runs))
    for f, count in runs:
        _put_varint(out, f + 6 * (count - 1))

    # pi/qi second-derivative + zigzag + interleave
    shift = MAX_LEVEL + 1 - level
    pi = [si >> shift for _, si, _, _ in fst]
    qi = [ti >> shift for _, _, ti, _ in fst]

    def derivs(vs: list[int]) -> list[int]:
        ds = []
        prev = prev_d = 0
        for i, v in enumerate(vs):
            if i == 0:
                ds.append(v)
            elif i == 1:
                prev_d = v - prev
                ds.append(_zigzag(prev_d))
            else:
                d = v - prev
                ds.append(_zigzag(d - prev_d))
                prev_d = d
            prev = v
        return ds

    dp, dq = derivs(pi), derivs(qi)
    inter = [_interleave(p, q, 64) for p, q in zip(dp, dq)]
    if inter:
        nbytes = (2 * level + 7) // 8
        out += int(inter[0]).to_bytes(nbytes, "little")
        for v in inter[1:]:
            _put_varint(out, v)

    # off-center lossless escape
    off = [i for i, (_, _, _, lvl) in enumerate(fst) if lvl != level]
    _put_varint(out, len(off))
    for i in off:
        _put_varint(out, i)
        out += struct.pack("<ddd", *pts[i])
    return bytes(out)


def decode_points_compressed(data: bytes, level: int, n: int):
    """Inverse of :func:`encode_points_compressed`; returns an (n, 3)
    float64 array.  Truncated buffers raise ValueError."""
    pos = 0
    n_runs, pos = _get_varint(data, pos)
    faces: list[int] = []
    for _ in range(n_runs):
        v, pos = _get_varint(data, pos)
        faces.extend([v % 6] * (v // 6 + 1))
    if len(faces) < n:
        raise ValueError("face runs cover fewer points than requested")

    inter: list[int] = []
    if n:
        nbytes = (2 * level + 7) // 8
        if len(data) < pos + nbytes:
            raise ValueError("buffer truncated in first point")
        inter.append(int.from_bytes(data[pos : pos + nbytes], "little"))
        pos += nbytes
        for _ in range(n - 1):
            v, pos = _get_varint(data, pos)
            inter.append(v)

    def undo(ds: list[int]) -> list[int]:
        vs: list[int] = []
        prev = prev_d = 0
        for i, e in enumerate(ds):
            if i == 0:
                vs.append(e)
                prev = e
            elif i == 1:
                prev_d = _unzigzag(e)
                prev = prev + prev_d
                vs.append(prev)
            else:
                prev_d = prev_d + _unzigzag(e)
                prev = prev + prev_d
                vs.append(prev)
        return vs

    dp = [_deinterleave(v, 64)[0] for v in inter]
    dq = [_deinterleave(v, 64)[1] for v in inter]
    pi, qi = undo(dp), undo(dq)

    shift = MAX_LEVEL + 1 - level
    pts = np.empty((n, 3), dtype=np.float64)
    for i in range(n):
        si = (pi[i] << shift) | (1 << (shift - 1))
        ti = (qi[i] << shift) | (1 << (shift - 1))
        pts[i] = _center_xyz(faces[i], si, ti)

    n_off, pos = _get_varint(data, pos)
    for _ in range(n_off):
        idx, pos = _get_varint(data, pos)
        if len(data) < pos + 24:
            raise ValueError("buffer truncated in off-center point")
        pts[idx] = struct.unpack_from("<ddd", data, pos)
        pos += 24
    return pts
