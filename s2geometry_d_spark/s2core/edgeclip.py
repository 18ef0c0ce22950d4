"""UV-space edge clipping (s2edge_clipping.d:46-573): subdivide an edge at
cube-face boundaries (getFaceSegments), clip it to a (padded) face
(clipToPaddedFace), and clip/bound it against R2 rectangles (clipEdge,
clipEdgeBound, intersectsRect) with the reference's published error bounds.

These are the primitives the reference's index build and rasterization use
to turn great-circle edges into per-face 2D geometry.  The engine's own
index registration uses a chord-distance criterion instead, so this module
exists for API parity and for exact per-face rasterization of edges
(operators that need "which face(s)/how much of the UV square does this
edge touch").  The guarantees preserved from the reference:

* segments form a continuous path from A to B, every vertex within
  FACE_CLIP_ERROR_UV_DIST of the true line AB, all inside [-1,1]^2;
* the walk is driven by ONE normal (robust_cross_prod(a, b)) so results
  are consistent with predicates.sign even for difficult edges;
* the face-square intersection tests (|Nu|+|Nv| >= |Nw| and
  ||Nu|-|Nv|| >= |Nw|) are evaluated EXACTLY in floating point via the
  sum-comparison identities (s2edge_clipping.d:497-543);
* interval clipping (clip_edge_bound) clamps interpolations so the result
  is exact whenever the clip boundary is axis-aligned with an endpoint.
"""

from __future__ import annotations

import math

from .coords import face_uv_to_xyz_scalar
from .predicates import robust_cross_prod

__all__ = [
    "FACE_CLIP_ERROR_RADIANS",
    "FACE_CLIP_ERROR_UV_DIST",
    "FACE_CLIP_ERROR_UV_COORD",
    "INTERSECTS_RECT_ERROR_UV_DIST",
    "EDGE_CLIP_ERROR_UV_COORD",
    "EDGE_CLIP_ERROR_UV_DIST",
    "face_segments",
    "clip_to_face",
    "clip_to_padded_face",
    "intersects_rect",
    "clip_edge",
    "clip_edge_bound",
    "clipped_edge_bound",
    "interpolate_double",
]

_EPS = 2.0 ** -52  # IEEE double epsilon (reference double.epsilon)

FACE_CLIP_ERROR_RADIANS = 3.0 * _EPS
FACE_CLIP_ERROR_UV_DIST = 9.0 * _EPS
FACE_CLIP_ERROR_UV_COORD = 9.0 * math.sqrt(0.5) * _EPS
INTERSECTS_RECT_ERROR_UV_DIST = 3.0 * math.sqrt(2.0) * _EPS
EDGE_CLIP_ERROR_UV_COORD = 2.25 * _EPS
EDGE_CLIP_ERROR_UV_DIST = 2.25 * _EPS

_MAX_SAFE_UV = 1.0 - FACE_CLIP_ERROR_UV_COORD


# ------------------------------------------------------------- face frames

def _face_of(p) -> int:
    """largestAbsComponent with the reference's tie rules (x beats y,z; y
    beats z), negated axes -> faces 3..5."""
    x, y, z = p
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        axis = 0 if ax > az else 2
    else:
        axis = 1 if ay > az else 2
    comp = (x, y, z)[axis]
    return axis + 3 if comp < 0 else axis


def _valid_face_uv(face: int, p) -> tuple[float, float]:
    """ValidFaceXYZtoUV (s2coords.d:193-204) — requires dot(p, norm) > 0."""
    x, y, z = p
    if face == 0:
        return y / x, z / x
    if face == 1:
        return -x / y, z / y
    if face == 2:
        return -x / z, -y / z
    if face == 3:
        return z / x, y / x
    if face == 4:
        return z / y, -x / y
    return -y / z, -x / z


def _face_xyz_to_uvw(face: int, p) -> tuple[float, float, float]:
    """Components of p along the face's (u, v, w) axes (s2coords.d:213-224)."""
    x, y, z = p
    if face == 0:
        return y, z, x
    if face == 1:
        return -x, z, y
    if face == 2:
        return -x, -y, z
    if face == 3:
        return -z, -y, -x
    if face == 4:
        return -z, x, -y
    return y, x, -z


def _uvw_axis(face: int, axis: int) -> tuple[float, float, float]:
    """The face's u/v/w axis as an xyz unit vector — derived from the UVW
    transform rows rather than a literal table (self-verifying: the dot
    product of any p with this vector is _face_xyz_to_uvw(face, p)[axis])."""
    basis = [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)]
    return tuple(_face_xyz_to_uvw(face, e)[axis] for e in basis)


def _uvw_face(face: int, axis: int, direction: int) -> int:
    """GetUVWFace: the face adjacent in the given axis direction — the face
    whose outward normal is (+/-) this face's axis vector."""
    v = _uvw_axis(face, axis)
    if not direction:
        v = (-v[0], -v[1], -v[2])
    return _face_of(v)


# -------------------------------------------------- exact square/line tests

def _sum_equals(u: float, v: float, w: float) -> bool:
    return (u + v == w) and (u == w - v) and (v == w - u)


def _intersects_face(n) -> bool:
    """Line (normal n, face UVW frame) meets the [-1,1]^2 square exactly
    when |Nu| + |Nv| >= |Nw|, evaluated exactly (s2edge_clipping.d:545)."""
    u, v, w = abs(n[0]), abs(n[1]), abs(n[2])
    return (v >= w - u) and (u >= w - v)


def _intersects_opposite_edges(n) -> bool:
    """||Nu| - |Nv|| >= |Nw|, evaluated exactly (s2edge_clipping.d:559)."""
    u, v, w = abs(n[0]), abs(n[1]), abs(n[2])
    if abs(u - v) != w:
        return abs(u - v) >= w
    return (u - w >= v) if (u >= v) else (v - w >= u)


def _exit_axis(n) -> int:
    if _intersects_opposite_edges(n):
        return 1 if abs(n[0]) >= abs(n[1]) else 0
    # adjacent edges: exits v=+/-1 iff an even number of components negative
    neg = (n[0] < 0) ^ (n[1] < 0) ^ (n[2] < 0)
    return 0 if neg else 1


def _exit_point(n, axis: int) -> tuple[float, float]:
    if axis == 0:
        u = 1.0 if n[1] > 0 else -1.0
        return u, (-u * n[0] - n[2]) / n[1]
    v = 1.0 if n[0] < 0 else -1.0
    return (-v * n[1] - n[2]) / n[0], v


def _next_face(face: int, exit_uv, axis: int, n, target_face: int) -> int:
    """Advance past the exit point; an EXACT corner exit whose other-axis
    neighbor is the target face jumps straight there
    (s2edge_clipping.d:452-477)."""
    other = exit_uv[1 - axis]
    if (
        abs(other) == 1.0
        and _uvw_face(face, 1 - axis, 1 if other > 0 else 0) == target_face
        and _sum_equals(exit_uv[0] * n[0], exit_uv[1] * n[1], -n[2])
    ):
        return target_face
    return _uvw_face(face, axis, 1 if exit_uv[axis] > 0 else 0)


def _move_origin_to_valid_face(face, a, ab, a_uv):
    """Nudge an endpoint's face so the line AB actually intersects it
    (s2edge_clipping.d:423-451)."""
    if max(abs(a_uv[0]), abs(a_uv[1])) <= _MAX_SAFE_UV:
        return face, a_uv
    n = _face_xyz_to_uvw(face, ab)
    if _intersects_face(n):
        exit_xyz = face_uv_to_xyz_scalar(face, *_exit_point(n, _exit_axis(n)))
        nn = math.sqrt(ab[0] ** 2 + ab[1] ** 2 + ab[2] ** 2)
        abn = (ab[0] / nn, ab[1] / nn, ab[2] / nn)
        tangent = (
            abn[1] * a[2] - abn[2] * a[1],
            abn[2] * a[0] - abn[0] * a[2],
            abn[0] * a[1] - abn[1] * a[0],
        )
        d = sum((exit_xyz[i] - a[i]) * tangent[i] for i in range(3))
        if d >= -FACE_CLIP_ERROR_RADIANS:
            return face, a_uv
    if abs(a_uv[0]) >= abs(a_uv[1]):
        face = _uvw_face(face, 0, 1 if a_uv[0] > 0 else 0)
    else:
        face = _uvw_face(face, 1, 1 if a_uv[1] > 0 else 0)
    u, v = _valid_face_uv(face, a)
    return face, (max(-1.0, min(1.0, u)), max(-1.0, min(1.0, v)))


# ------------------------------------------------------------ face segments

def face_segments(a, b) -> list[tuple[int, tuple[float, float], tuple[float, float]]]:
    """Subdivide edge AB at every cube-face boundary crossing; returns
    [(face, a_uv, b_uv)] in order from A toward B (getFaceSegments,
    s2edge_clipping.d:68-120).  Inputs are unit xyz tuples."""
    a_face = _face_of(a)
    b_face = _face_of(b)
    a_uv = _valid_face_uv(a_face, a)
    b_uv = _valid_face_uv(b_face, b)
    if a_face == b_face:
        return [(a_face, a_uv, b_uv)]

    ab = robust_cross_prod(a, b)
    nab = (-ab[0], -ab[1], -ab[2])
    a_face, a_uv = _move_origin_to_valid_face(a_face, a, ab, a_uv)
    b_face, b_uv = _move_origin_to_valid_face(b_face, b, nab, b_uv)

    out = []
    face, cur_a = a_face, a_uv
    while face != b_face:
        n = _face_xyz_to_uvw(face, ab)
        axis = _exit_axis(n)
        exit_uv = _exit_point(n, axis)
        out.append((face, cur_a, exit_uv))
        exit_xyz = face_uv_to_xyz_scalar(face, *exit_uv)
        face = _next_face(face, exit_uv, axis, n, b_face)
        eu, ev, _ = _face_xyz_to_uvw(face, exit_xyz)
        cur_a = (eu, ev)
    out.append((face, cur_a, b_uv))
    return out


# -------------------------------------------------------- clip to one face

def _clip_destination(a, b, scaled_n, a_tan, b_tan, scale_uv):
    """Clipped destination B' of AB on the face implied by the UVW frame,
    plus the 0..3 intersection score (s2edge_clipping.d:122-190)."""
    if b[2] > 0:
        uv = (b[0] / b[2], b[1] / b[2])
        if max(abs(uv[0]), abs(uv[1])) <= _MAX_SAFE_UV:
            return 0, uv
    ep = _exit_point(scaled_n, _exit_axis(scaled_n))
    uv = (scale_uv * ep[0], scale_uv * ep[1])
    p = (uv[0], uv[1], 1.0)
    score = 0
    if sum((p[i] - a[i]) * a_tan[i] for i in range(3)) < 0:
        score = 2  # B' on the wrong side of A
    elif sum((p[i] - b[i]) * b_tan[i] for i in range(3)) < 0:
        score = 1  # B' on the wrong side of B
    if score > 0:
        if b[2] <= 0:
            score = 3  # B not projectable onto this face
        else:
            uv = (b[0] / b[2], b[1] / b[2])
    return score, uv


def clip_to_padded_face(a_xyz, b_xyz, face: int, padding: float = 0.0):
    """(u,v) endpoints of the portion of AB meeting face (padded to
    [-R,R]^2, R=1+padding), or None (clipToPaddedFace,
    s2edge_clipping.d:199-262)."""
    if _face_of(a_xyz) == face and _face_of(b_xyz) == face:
        return _valid_face_uv(face, a_xyz), _valid_face_uv(face, b_xyz)
    n = _face_xyz_to_uvw(face, robust_cross_prod(a_xyz, b_xyz))
    a = _face_xyz_to_uvw(face, a_xyz)
    b = _face_xyz_to_uvw(face, b_xyz)
    scale_uv = 1.0 + padding
    scaled_n = (scale_uv * n[0], scale_uv * n[1], n[2])
    if not _intersects_face(scaled_n):
        return None
    # guard against denormalized normals before normalizing
    m = max(abs(n[0]), abs(n[1]), abs(n[2]))
    if m < math.ldexp(1.0, -511):
        n = tuple(c * math.ldexp(1.0, 563) for c in n)
    nn = math.sqrt(n[0] ** 2 + n[1] ** 2 + n[2] ** 2)
    n = (n[0] / nn, n[1] / nn, n[2] / nn)
    a_tan = (
        n[1] * a[2] - n[2] * a[1],
        n[2] * a[0] - n[0] * a[2],
        n[0] * a[1] - n[1] * a[0],
    )
    b_tan = (
        b[1] * n[2] - b[2] * n[1],
        b[2] * n[0] - b[0] * n[2],
        b[0] * n[1] - b[1] * n[0],
    )
    neg_n = (-scaled_n[0], -scaled_n[1], -scaled_n[2])
    a_score, a_uv = _clip_destination(b, a, neg_n, b_tan, a_tan, scale_uv)
    b_score, b_uv = _clip_destination(a, b, scaled_n, a_tan, b_tan, scale_uv)
    if a_score + b_score >= 3:
        return None
    return a_uv, b_uv


def clip_to_face(a_xyz, b_xyz, face: int):
    return clip_to_padded_face(a_xyz, b_xyz, face, 0.0)


# --------------------------------------------------------- R2 rect clipping

def interpolate_double(x: float, a: float, b: float, a1: float, b1: float) -> float:
    """Value at x of the line through (a, a1), (b, b1), exact at x == a/b
    (s2edge_clipping.d:399)."""
    if a == b:
        return a1
    if abs(a - x) <= abs(b - x):
        return a1 + (b1 - a1) * ((x - a) / (b - a))
    return b1 + (a1 - b1) * ((x - b) / (a - b))


def intersects_rect(a, b, rect) -> bool:
    """Does segment AB meet rect = ((u_lo, u_hi), (v_lo, v_hi))?  Bound
    check, then the four corners must straddle the extended line AB
    (intersectsRect, s2edge_clipping.d:270-286)."""
    (ulo, uhi), (vlo, vhi) = rect
    if max(a[0], b[0]) < ulo or min(a[0], b[0]) > uhi:
        return False
    if max(a[1], b[1]) < vlo or min(a[1], b[1]) > vhi:
        return False
    n = (-(b[1] - a[1]), b[0] - a[0])  # ortho of b - a
    iu = uhi if n[0] >= 0 else ulo
    iv = vhi if n[1] >= 0 else vlo
    ju = ulo if n[0] >= 0 else uhi
    jv = vlo if n[1] >= 0 else vhi
    hi = n[0] * (iu - a[0]) + n[1] * (iv - a[1])
    lo = n[0] * (ju - a[0]) + n[1] * (jv - a[1])
    return hi >= 0 and lo <= 0


def _update_endpoint(lo, hi, end, value):
    """Clip one end of an R1 interval; None if the interval empties."""
    if end == 0:
        if hi < value:
            return None
        return (max(lo, value), hi)
    if lo > value:
        return None
    return (lo, min(hi, value))


def _clip_bound_axis(a0, b0, bound0, a1, b1, bound1, diag, clip0):
    """One axis pass of clipEdgeBound (s2edge_clipping.d:359-376): clamp
    bound0 into clip0 and update the matching endpoint of bound1 via exact
    interpolation; ``diag`` pairs the interval endpoints (0 = positive
    slope: lo0 with lo1).  Returns (bound0, bound1) or None if empty."""
    lo, hi = bound0
    if lo < clip0[0]:
        if hi < clip0[0]:
            return None
        lo = clip0[0]
        bound1 = _update_endpoint(
            bound1[0], bound1[1], diag, interpolate_double(clip0[0], a0, b0, a1, b1)
        )
        if bound1 is None:
            return None
    if hi > clip0[1]:
        if lo > clip0[1]:
            return None
        hi = clip0[1]
        bound1 = _update_endpoint(
            bound1[0], bound1[1], 1 - diag, interpolate_double(clip0[1], a0, b0, a1, b1)
        )
        if bound1 is None:
            return None
    return (lo, hi), bound1


def clip_edge_bound(a, b, clip, bound):
    """Tighten ``bound`` (a tight bound of some portion of AB) to its
    intersection with ``clip``; None if empty (clipEdgeBound,
    s2edge_clipping.d:344-352).  Rects are ((u_lo,u_hi),(v_lo,v_hi))."""
    diag = 1 if (a[0] > b[0]) != (a[1] > b[1]) else 0
    bu, bv = bound
    r = _clip_bound_axis(a[0], b[0], bu, a[1], b[1], bv, diag, clip[0])
    if r is None:
        return None
    bu, bv = r
    r = _clip_bound_axis(a[1], b[1], bv, a[0], b[0], bu, diag, clip[1])
    if r is None:
        return None
    bv, bu = r
    return bu, bv


def clipped_edge_bound(a, b, clip):
    bound = (
        (min(a[0], b[0]), max(a[0], b[0])),
        (min(a[1], b[1]), max(a[1], b[1])),
    )
    return clip_edge_bound(a, b, clip, bound)


def clip_edge(a, b, clip):
    """The portion of AB inside rect ``clip`` as endpoint pair, or None
    (clipEdge, s2edge_clipping.d:309-321)."""
    bound = clipped_edge_bound(a, b, clip)
    if bound is None:
        return None
    (ulo, uhi), (vlo, vhi) = bound
    ai = 1 if a[0] > b[0] else 0
    aj = 1 if a[1] > b[1] else 0
    def vert(i, j):
        return ((ulo, uhi)[i], (vlo, vhi)[j])
    return vert(ai, aj), vert(1 - ai, 1 - aj)
