"""Robust spherical orientation and edge-crossing predicates.

Three-tier sign: vectorized numpy triage over whole columns, exact
rational-arithmetic fallback (python Fraction — exact for float inputs),
and Simulation-of-Simplicity symbolic perturbation for truly degenerate
triples.  Semantics studied from the reference (vnayar/s2geometry-d
src/s2/s2predicates.d:93-180,1437-1600, s2edge_crosser.d:120-330,
s2edge_crossings.d:105-150); independent python/numpy re-expression.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

DBL_EPSILON = 2.220446049250313e-16
MAX_DET_ERROR = 1.8274 * DBL_EPSILON  # triage uncertainty band

# Fixed reference point for containment parity counting ("about 66km from
# the north pole towards the East Siberian Sea") — chosen off every low-level
# cell boundary (s2pointutil.d:36-53).
ORIGIN = (-0.0099994664350250197, 0.0025924542609324121, 0.99994664350250195)


# ---------------------------------------------------------------- scalar

def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def triage_sign(a, b, c) -> int:
    det = _dot(_cross(a, b), c)
    if det > MAX_DET_ERROR:
        return 1
    if det < -MAX_DET_ERROR:
        return -1
    return 0


def _sgn(x) -> int:
    return (x > 0) - (x < 0)


def _symbolically_perturbed_sign(a, b, c, b_cross_c) -> int:
    """SoS tie-break; REQUIRES a < b < c lexicographically.  The cascade of
    perturbation terms follows the published S2 scheme exactly."""
    s = _sgn(b_cross_c[2])
    if s:
        return s
    s = _sgn(b_cross_c[1])
    if s:
        return s
    s = _sgn(b_cross_c[0])
    if s:
        return s
    s = _sgn(c[0] * a[1] - c[1] * a[0])
    if s:
        return s
    s = _sgn(c[0])
    if s:
        return s
    s = -_sgn(c[1])
    if s:
        return s
    s = _sgn(c[2] * a[0] - c[0] * a[2])
    if s:
        return s
    s = _sgn(c[2])
    if s:
        return s
    s = _sgn(a[0] * b[1] - a[1] * b[0])
    if s:
        return s
    s = -_sgn(b[0])
    if s:
        return s
    s = _sgn(b[1])
    if s:
        return s
    s = _sgn(a[0])
    if s:
        return s
    return 1


def exact_sign(a, b, c, perturb: bool = True) -> int:
    """Exact determinant sign via rational arithmetic + SoS perturbation."""
    if a == b or b == c or c == a:
        return 0
    pts = [a, b, c]
    perm_sign = 1
    if pts[0] > pts[1]:
        pts[0], pts[1] = pts[1], pts[0]
        perm_sign = -perm_sign
    if pts[1] > pts[2]:
        pts[1], pts[2] = pts[2], pts[1]
        perm_sign = -perm_sign
    if pts[0] > pts[1]:
        pts[0], pts[1] = pts[1], pts[0]
        perm_sign = -perm_sign
    xa = tuple(Fraction(v) for v in pts[0])
    xb = tuple(Fraction(v) for v in pts[1])
    xc = tuple(Fraction(v) for v in pts[2])
    bxc = _cross(xb, xc)
    det = _dot(xa, bxc)
    det_sign = _sgn(det)
    if det_sign == 0 and perturb:
        det_sign = _symbolically_perturbed_sign(xa, xb, xc, bxc)
    return perm_sign * det_sign


def sign(a, b, c) -> int:
    s = triage_sign(a, b, c)
    if s == 0:
        s = exact_sign(a, b, c)
    return s


def ortho(a):
    """Unit vector orthogonal to a, avoiding degenerate-prone choices."""
    ax = [abs(a[0]), abs(a[1]), abs(a[2])]
    k = ax.index(max(ax)) - 1
    if k < 0:
        k = 2
    temp = [0.012, 0.0053, 0.00457]
    temp[k] = 1.0
    v = _cross(a, temp)
    n = (v[0] * v[0] + v[1] * v[1] + v[2] * v[2]) ** 0.5
    return (v[0] / n, v[1] / n, v[2] / n)


def robust_cross_prod(a, b):
    """Unit normal of the great circle through a and b, stable for nearly
    identical or nearly antipodal points: (b+a) x (b-a) = 2 a x b has
    magnitude ~|a x b| but cancels the error terms (s2pointutil
    robustCrossProd semantics); exactly equal/antipodal inputs fall back to
    a deterministic orthogonal vector."""
    x = (b[0] + a[0], b[1] + a[1], b[2] + a[2])
    y = (b[0] - a[0], b[1] - a[1], b[2] - a[2])
    v = _cross(x, y)
    n = (v[0] * v[0] + v[1] * v[1] + v[2] * v[2]) ** 0.5
    if n != 0.0:
        return (v[0] / n, v[1] / n, v[2] / n)
    return ortho(a)


def rotate(p, axis, angle_radians: float):
    """Rotate p by the given angle around the unit-vector axis (Rodrigues;
    s2pointutil rotate semantics — CCW when viewed from the axis tip)."""
    import math

    c = math.cos(angle_radians)
    s = math.sin(angle_radians)
    d = _dot(axis, p)
    ax = _cross(axis, p)
    return tuple(
        p[i] * c + ax[i] * s + axis[i] * d * (1.0 - c) for i in range(3)
    )


def get_frame(z):
    """Right-handed orthonormal frame (x, y, z) with the given unit z axis
    (s2pointutil getFrame): x = ortho(z), y = z x x."""
    x = ortho(z)
    y = _cross(z, x)
    return x, y, tuple(z)


def from_frame(frame, p):
    """Map frame-local coordinates p to world coordinates."""
    x, y, z = frame
    return tuple(x[i] * p[0] + y[i] * p[1] + z[i] * p[2] for i in range(3))


def to_frame(frame, q):
    """Map world coordinates q into the frame's local coordinates."""
    x, y, z = frame
    return (_dot(x, q), _dot(y, q), _dot(z, q))


def ordered_ccw(a, b, c, o) -> bool:
    """True if (a,b,c) occur in CCW order around o."""
    total = 0
    if sign(b, o, a) >= 0:
        total += 1
    if sign(c, o, b) >= 0:
        total += 1
    if sign(a, o, c) > 0:
        total += 1
    return total >= 2


def crossing_sign(a, b, c, d) -> int:
    """+1 interior crossing, 0 shared vertex, -1 no crossing."""
    # shared-vertex / degenerate handling
    if a == c or a == d or b == c or b == d:
        return 0
    if a == b or c == d:
        return -1
    acb = -sign(a, b, c)
    bda = sign(a, b, d)
    if acb != bda or acb == 0:
        return -1
    cbd = -sign(c, d, b)
    if cbd != acb:
        return -1
    dac = sign(c, d, a)
    return 1 if dac == acb else -1


def vertex_crossing(a, b, c, d) -> bool:
    if a == b or c == d:
        return False
    if a == c:
        return (b == d) or ordered_ccw(ortho(a), d, b, a)
    if b == d:
        return ordered_ccw(ortho(b), c, a, b)
    if a == d:
        return (b == c) or ordered_ccw(ortho(a), c, b, a)
    if b == c:
        return ordered_ccw(ortho(b), d, a, b)
    return False


def edge_or_vertex_crossing(a, b, c, d) -> bool:
    crossing = crossing_sign(a, b, c, d)
    if crossing < 0:
        return False
    if crossing > 0:
        return True
    return vertex_crossing(a, b, c, d)


def compare_distances(x, a, b) -> int:
    """Sign of d(x,a) - d(x,b), exact: float triage with a conservative
    error bound, then rational arithmetic on the squared-chord difference
    (the reference's triage->exact cascade, s2predicates.d:309-397; the SoS
    stage is unnecessary because equality is a meaningful answer here)."""
    da = (x[0] - a[0]) ** 2 + (x[1] - a[1]) ** 2 + (x[2] - a[2]) ** 2
    db = (x[0] - b[0]) ** 2 + (x[1] - b[1]) ** 2 + (x[2] - b[2]) ** 2
    diff = da - db
    # |error| <= ~5.5 ulps of the larger magnitude for this expression shape
    err = 8.0 * DBL_EPSILON * max(da, db)
    if diff > err:
        return 1
    if diff < -err:
        return -1
    xf = tuple(Fraction(v) for v in x)
    af = tuple(Fraction(v) for v in a)
    bf = tuple(Fraction(v) for v in b)
    da_e = sum((xf[i] - af[i]) ** 2 for i in range(3))
    db_e = sum((xf[i] - bf[i]) ** 2 for i in range(3))
    return _sgn(da_e - db_e)


# ---------------------------------------------------------------- vectorized

def triage_sign_vec(det: np.ndarray) -> np.ndarray:
    """Triage a vector of determinants: +1/-1 certain, 0 uncertain."""
    out = np.zeros(det.shape, dtype=np.int8)
    out[det > MAX_DET_ERROR] = 1
    out[det < -MAX_DET_ERROR] = -1
    return out


def _det_vec(ax, ay, az, bx, by, bz, cx, cy, cz):
    return (
        (ay * bz - az * by) * cx
        + (az * bx - ax * bz) * cy
        + (ax * by - ay * bx) * cz
    )


def crossing_sign_pairs(A, B, C, D) -> np.ndarray:
    """Vectorized crossingSign over edge PAIRS: A,B,C,D are (n,3) arrays of
    edge endpoints; returns int8 (+1 proper crossing, 0 shared vertex,
    -1 none) — triage with the float error band, exact scalar fallback for
    uncertain rows (same cascade as the scalar path)."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    C = np.asarray(C, dtype=np.float64)
    D = np.asarray(D, dtype=np.float64)
    acb = -triage_sign_vec(_det_vec(*A.T, *B.T, *C.T))
    bda = triage_sign_vec(_det_vec(*A.T, *B.T, *D.T))
    cbd = -triage_sign_vec(_det_vec(*C.T, *D.T, *B.T))
    dac = triage_sign_vec(_det_vec(*C.T, *D.T, *A.T))
    out = np.full(A.shape[0], -1, dtype=np.int8)
    crossing = (acb != 0) & (acb == bda) & (cbd == acb) & (dac == acb)
    out[crossing] = 1
    # shared vertices decide 0 regardless of triage
    shared = (
        (A == C).all(axis=1)
        | (A == D).all(axis=1)
        | (B == C).all(axis=1)
        | (B == D).all(axis=1)
    )
    out[shared] = 0
    # uncertain rows (any triage zero, not shared): exact scalar cascade
    uncertain = (
        ((acb == 0) | (bda == 0) | (cbd == 0) | (dac == 0)) & ~shared & ~crossing
    )
    for i in np.nonzero(uncertain)[0]:
        out[i] = crossing_sign(tuple(A[i]), tuple(B[i]), tuple(C[i]), tuple(D[i]))
    return out


def crossings_with_edge_arrays(ax, ay, az, bx, by, bz, ea, eb) -> np.ndarray:
    """Same contract as :func:`crossings_with_fixed_edges` but the edge set
    arrives as (m, 3) numpy arrays and the edge loop is vectorized too —
    one (n, m) broadcast per determinant instead of m passes.  This is the
    hot path of the boundary-cell PIP UDFs: the stored per-cell payload IS
    these arrays, so no per-batch tuple rebuild exists (round-3 verdict
    finding #3)."""
    ea = np.asarray(ea, dtype=np.float64).reshape(-1, 3)
    eb = np.asarray(eb, dtype=np.float64).reshape(-1, 3)
    n = bx.shape[0]
    m = ea.shape[0]
    counts = np.zeros(n, dtype=np.int64)
    if m == 0 or n == 0:
        return counts
    a = (float(ax), float(ay), float(az))
    abx = ay * bz - az * by
    aby = az * bx - ax * bz
    abz = ax * by - ay * bx
    det_c = abx[:, None] * ea[None, :, 0] + aby[:, None] * ea[None, :, 1] + abz[:, None] * ea[None, :, 2]
    det_d = abx[:, None] * eb[None, :, 0] + aby[:, None] * eb[None, :, 1] + abz[:, None] * eb[None, :, 2]
    s_abc = triage_sign_vec(det_c)
    s_abd = triage_sign_vec(det_d)
    acb = -s_abc
    possible = (acb == s_abd) & (acb != 0)
    uncertain = (s_abc == 0) | (s_abd == 0)
    cd = np.cross(ea, eb)  # (m, 3)
    det_b = bx[:, None] * cd[None, :, 0] + by[:, None] * cd[None, :, 1] + bz[:, None] * cd[None, :, 2]
    s_cdb = triage_sign_vec(det_b)
    cbd = -s_cdb
    dac = np.array(
        [sign(tuple(ea[j]), tuple(eb[j]), a) for j in range(m)], dtype=np.int8
    )
    crossing = possible & (cbd == acb) & (dac[None, :] == acb)
    uncertain |= possible & (s_cdb == 0)
    counts = (crossing & ~uncertain).sum(axis=1).astype(np.int64)
    if uncertain.any():
        for i, j in zip(*np.nonzero(uncertain)):
            bi = (float(bx[i]), float(by[i]), float(bz[i]))
            if edge_or_vertex_crossing(a, bi, tuple(ea[j]), tuple(eb[j])):
                counts[i] += 1
    return counts


def crossings_with_fixed_edges(ax, ay, az, bx, by, bz, edges) -> np.ndarray:
    """Count edge-or-vertex crossings of arcs (A, B_i) against a fixed edge
    list, vectorized over the B points.

    A = (ax,ay,az) fixed scalar anchor; B = arrays; ``edges`` = list of
    ((cx,cy,cz),(dx,dy,dz)) tuples.  Returns int64 crossing counts.
    Uncertain rows (any triage 0) are resolved with the exact scalar path.
    """
    n = bx.shape[0]
    # a x b per point
    abx = ay * bz - az * by
    aby = az * bx - ax * bz
    abz = ax * by - ay * bx
    counts = np.zeros(n, dtype=np.int64)
    a = (ax, ay, az)
    for c, d in edges:
        det_c = abx * c[0] + aby * c[1] + abz * c[2]
        det_d = abx * d[0] + aby * d[1] + abz * d[2]
        s_abc = triage_sign_vec(det_c)
        s_abd = triage_sign_vec(det_d)
        # crossing possible only when C and D straddle AB: acb == bda != 0
        acb = -s_abc
        possible = (acb == s_abd) & (acb != 0)
        uncertain = (s_abc == 0) | (s_abd == 0)
        if possible.any():
            cd = _cross(c, d)
            det_b = cd[0] * bx + cd[1] * by + cd[2] * bz
            s_cdb = triage_sign_vec(det_b)
            cbd = -s_cdb
            dac = sign(c, d, a)  # fixed per edge, exact
            crossing = possible & (cbd == acb) & (dac == acb)
            uncertain |= possible & (s_cdb == 0)
            counts += crossing & ~uncertain
        if uncertain.any():
            idx = np.nonzero(uncertain)[0]
            for i in idx:
                bi = (float(bx[i]), float(by[i]), float(bz[i]))
                if edge_or_vertex_crossing(a, bi, c, d):
                    counts[i] += 1
    return counts
