"""Edge-aware lat/lng rect bounds (reference: s2latlng_rect_bounder.d).

A geodesic edge can bulge past its endpoint latitudes (two points at lat 45
and 90 deg of longitude apart are joined by an arc peaking at ~54.7 deg; at
180 deg apart it grazes the pole).  Vertex-only bounds therefore UNDER-cover
polylines/polygons.  This module computes the exact per-edge latitude
extremum: with n = a x b (the edge's great-circle normal), the extreme
latitude attainable on the circle is atan2(hypot(nx, ny), |nz|), and it is
attained inside the arc iff m . a and m . b differ in sign, where m = n x z
(dz/dt along the arc is -(m . P)).

Also provides the sound rect -> cap conversion (S2LatLngRect.getCapBound
semantics: the smaller of a pole-centered cap and a center-through-corners
cap), which replaces the full-sphere fallback for hemisphere-scale polygons.
"""

from __future__ import annotations

import math

from .predicates import robust_cross_prod
from .regions import LatLngRect, S1Interval, chord2_between, chord2_from_radians, normalize

_POLE_EPS = 1e-12


def _lat(p) -> float:
    return math.atan2(p[2], math.hypot(p[0], p[1]))


def _lng(p) -> float:
    return math.atan2(p[1], p[0])


def _positive_distance(a: float, b: float) -> float:
    d = (b - a) % (2.0 * math.pi)
    return d


def lng_from_point_pair(a: float, b: float) -> S1Interval:
    """Minimal S1 interval containing both longitudes (<= pi wide)."""
    if a == -math.pi:
        a = math.pi
    if b == -math.pi:
        b = math.pi
    if _positive_distance(a, b) <= math.pi:
        return S1Interval(a, b)
    return S1Interval(b, a)


def lng_union(x: S1Interval, y: S1Interval) -> S1Interval:
    """Smallest interval containing both (standard S1Interval::Union)."""
    if y.is_empty():
        return x
    if x.is_empty():
        return y
    if x.is_full() or y.is_full():
        return S1Interval.full()
    if x.contains_interval(y):
        return x
    if y.contains_interval(x):
        return y
    if x.intersects(y):
        # overlap: try both hulls, keep the shorter one that contains both
        cand = []
        for lo_, hi_ in ((x.lo, y.hi), (y.lo, x.hi)):
            iv = S1Interval(lo_, hi_)
            if iv.contains_interval(x) and iv.contains_interval(y):
                cand.append(iv)
        if not cand:
            return S1Interval.full()
        return min(cand, key=lambda iv: iv.get_length())
    # disjoint: choose the side with the smaller gap
    gap_xy = _positive_distance(x.hi, y.lo)
    gap_yx = _positive_distance(y.hi, x.lo)
    if gap_xy <= gap_yx:
        return S1Interval(x.lo, y.hi)
    return S1Interval(y.lo, x.hi)


def edge_rect_bound(a, b) -> LatLngRect:
    """Tight rect bound of the geodesic edge a->b (both unit xyz)."""
    lat_a, lat_b = _lat(a), _lat(b)
    lat_lo, lat_hi = min(lat_a, lat_b), max(lat_a, lat_b)
    lng = lng_from_point_pair(_lng(a), _lng(b))

    n = robust_cross_prod(a, b)
    m = (n[1], -n[0], 0.0)  # n x z
    m_a = m[0] * a[0] + m[1] * a[1]
    m_b = m[0] * b[0] + m[1] * b[1]
    # Error-bound handling mirroring the reference bounder
    # (s2latlngrect_bounder semantics): when an interior extremum exists OR
    # m_a / m_b are within rounding error of zero (extremum within ulps of a
    # vertex), expand the corresponding side by a few ulps so the rect stays
    # a true superset — downstream cap/covering completeness relies on it.
    _DBL_EPS = 2.220446049250313e-16
    m_error = 1e-15 * math.hypot(m[0], m[1])
    if m_a * m_b < 0.0 or abs(m_a) <= m_error or abs(m_b) <= m_error:
        max_abs = min(
            math.atan2(math.hypot(n[0], n[1]), abs(n[2])) + 3.0 * _DBL_EPS,
            math.pi / 2,
        )
        if m_a <= m_error and m_b >= -m_error:
            lat_hi = max(lat_hi, max_abs)
        if m_b <= m_error and m_a >= -m_error:
            lat_lo = min(lat_lo, -max_abs)
        if max_abs >= math.pi / 2 - _POLE_EPS:
            # the arc grazes a pole: every longitude is reachable
            lng = S1Interval.full()
    return LatLngRect(lat_lo, lat_hi, lng)


def rect_union(x: LatLngRect, y: LatLngRect) -> LatLngRect:
    if x.is_empty():
        return y
    if y.is_empty():
        return x
    return LatLngRect(
        min(x.lat_lo, y.lat_lo), max(x.lat_hi, y.lat_hi), lng_union(x.lng, y.lng)
    )


def chain_rect_bound(vertices, closed: bool) -> LatLngRect:
    """Union of edge bounds over a vertex chain (edge-aware)."""
    if not vertices:
        return LatLngRect.empty()
    out = LatLngRect.empty()
    n = len(vertices)
    last = n if closed else n - 1
    for i in range(last):
        out = rect_union(out, edge_rect_bound(vertices[i], vertices[(i + 1) % n]))
    if n == 1:
        p = vertices[0]
        out = LatLngRect(_lat(p), _lat(p), S1Interval.from_point(_lng(p)))
    return out


def rect_cap_bound(rect: LatLngRect) -> "object":
    """Sound bounding cap of a lat/lng rect (S2LatLngRect.getCapBound):
    the smaller of a pole-centered cap (always sound) and a cap centered at
    the rect's center latlng through its corners (sound because a rect's
    farthest points from its center are its corners)."""
    from .regions import Cap

    if rect.is_empty():
        return Cap.empty()
    # pole cap
    if rect.lat_lo + rect.lat_hi < 0.0:
        pole = (0.0, 0.0, -1.0)
        pole_angle = math.pi / 2 + rect.lat_hi
    else:
        pole = (0.0, 0.0, 1.0)
        pole_angle = math.pi / 2 - rect.lat_lo
    pole_cap = Cap(pole, chord2_from_radians(min(math.pi, pole_angle * (1 + 1e-15))))

    # center-through-corners cap is sound only for lng spans <= pi (the
    # reference's remainder() guard): beyond that the farthest rect point
    # from the center can sit at an interior latitude of a lng edge
    if rect.lng.is_full() or rect.lng.get_length() > math.pi:
        return pole_cap
    mid_lat = 0.5 * (rect.lat_lo + rect.lat_hi)
    mid_lng = rect.lng.lo + 0.5 * rect.lng.get_length()
    c = (
        math.cos(mid_lng) * math.cos(mid_lat),
        math.sin(mid_lng) * math.cos(mid_lat),
        math.sin(mid_lat),
    )
    c = normalize(c)
    r2 = 0.0
    for lat in (rect.lat_lo, rect.lat_hi):
        for lng in (rect.lng.lo, rect.lng.hi):
            v = (
                math.cos(lng) * math.cos(lat),
                math.sin(lng) * math.cos(lat),
                math.sin(lat),
            )
            r2 = max(r2, chord2_between(c, v))
    mid_cap = Cap(c, min(4.0, r2 * (1 + 1e-12) + 1e-15))
    return mid_cap if mid_cap.radius2 < pole_cap.radius2 else pole_cap
