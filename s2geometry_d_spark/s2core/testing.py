"""Adversarial test-geometry generators (reference s2testing.d).

The reference's kNN / PIP / crossing tests draw query shapes from three
generator families, the hardest being FRACTAL loops (s2testing.d Fractal,
used at s2closest_edge_query_test.d:302-334): Koch-style boundaries whose
edge lengths span several orders of magnitude and whose near-tangent
vertex angles stress clipped-edge indexes and the triage->exact sign
cascade.  This is an independent re-expression of that generator: a Koch
subdivision in the tangent plane at a chosen center, projected to the
sphere through the exponential map.

Fractal dimension D in (1, 2) maps to the Koch segment ratio
r = 4^(-1/D) (each level replaces an edge with 4 edges of r times its
length; D = log 4 / log(1/r)).  r in [1/4, 1/3] keeps the classic
snowflake construction simple (non-self-intersecting); the generator
enforces that range.
"""

from __future__ import annotations

import math

import numpy as np

from .predicates import get_frame


def koch_ratio(dimension: float) -> float:
    """Koch segment ratio for a target fractal dimension."""
    r = 4.0 ** (-1.0 / dimension)
    if not 0.25 <= r <= 1.0 / 3.0 + 1e-12:
        raise ValueError(
            f"dimension {dimension} -> ratio {r:.4f} outside the simple-curve "
            "range [0.25, 1/3] (D in [1.0, ~1.2619])"
        )
    return r


def _koch_subdivide(pts: np.ndarray, r: float) -> np.ndarray:
    """One Koch level over a closed 2D polygon (n,2) -> (4n,2); the middle
    triangle bulges OUTWARD (right of each CCW edge's direction)."""
    a = pts
    b = np.roll(pts, -1, axis=0)
    d = b - a
    # right perpendicular of the edge direction = outward for a CCW loop
    perp = np.stack([d[:, 1], -d[:, 0]], axis=1)
    h = math.sqrt(max(r * r - (0.5 - r) ** 2, 0.0))
    p1 = a + r * d
    p2 = a + 0.5 * d + h * perp
    p3 = b - r * d
    out = np.stack([a, p1, p2, p3], axis=1).reshape(-1, 2)
    return out


def make_fractal_loop(
    center_lat: float,
    center_lng: float,
    nominal_radius_deg: float,
    dimension: float,
    max_level: int,
) -> list[tuple]:
    """CCW fractal loop vertices (unit xyz) around (center_lat, center_lng).

    Construction: equilateral triangle of circumradius ``nominal_radius_deg``
    in the tangent plane, ``max_level`` Koch subdivisions at ratio
    ``koch_ratio(dimension)``, exponential-map projection to the sphere.
    Vertex count = 3 * 4^max_level.
    """
    r = koch_ratio(dimension)
    rad = math.radians(nominal_radius_deg)
    ang = np.array([math.pi / 2 + 2 * math.pi * k / 3 for k in range(3)])
    pts = rad * np.stack([np.cos(ang), np.sin(ang)], axis=1)
    for _ in range(max_level):
        pts = _koch_subdivide(pts, r)

    # exponential map through an orthonormal frame at the center
    lat = math.radians(center_lat)
    lng = math.radians(center_lng)
    z = (
        math.cos(lng) * math.cos(lat),
        math.sin(lng) * math.cos(lat),
        math.sin(lat),
    )
    xv, yv, zv = get_frame(z)
    xv = np.array(xv)
    yv = np.array(yv)
    zv = np.array(zv)
    norms = np.linalg.norm(pts, axis=1)
    dirs = pts / norms[:, None]
    xyz = (
        np.cos(norms)[:, None] * zv[None, :]
        + np.sin(norms)[:, None]
        * (dirs[:, 0:1] * xv[None, :] + dirs[:, 1:2] * yv[None, :])
    )
    xyz /= np.linalg.norm(xyz, axis=1)[:, None]
    return [tuple(v) for v in xyz]


def fractal_loop_latlngs(
    center_lat: float,
    center_lng: float,
    nominal_radius_deg: float,
    dimension: float,
    max_level: int,
) -> list[tuple[float, float]]:
    """Same loop as (lat_deg, lng_deg) pairs — the edge-table fixture shape."""
    verts = make_fractal_loop(
        center_lat, center_lng, nominal_radius_deg, dimension, max_level
    )
    out = []
    for x, y, z in verts:
        out.append((math.degrees(math.asin(max(-1.0, min(1.0, z)))), math.degrees(math.atan2(y, x))))
    return out
