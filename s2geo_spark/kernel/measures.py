"""Spherical measures: triangle/loop areas, perimeters, centroids.

Reference semantics (src/s2/s2measures.h:35-70, s2measures.cc,
s2loop_measures.cc, s2centroids.cc):

  * Area(a,b,c) via Girard's theorem with L'Huilier stabilization
  * loop area = sum of signed triangle areas from an anchor vertex,
    normalized into [0, 4pi) for CCW loops
  * TrueCentroid = integral of position over the surface (triangle
    centroids weighted by area)

Vectorized over the vertex arrays; aggregations over exploded edges map to
groupBy(shape_id).sum in the Spark layer (SURVEY §2.8).
"""

from __future__ import annotations

import numpy as np


def _norm_rows(m):
    return m / np.linalg.norm(m, axis=-1, keepdims=True)


def angle(a, b):
    """Stable angle between unit vectors (rows)."""
    cross = np.linalg.norm(np.cross(a, b), axis=-1)
    dot = (a * b).sum(-1)
    return np.arctan2(cross, dot)


def triangle_area(a, b, c):
    """Signed-magnitude spherical triangle area via L'Huilier
    (s2measures.cc Area): stable for tiny triangles."""
    s_ab = angle(a, b)
    s_bc = angle(b, c)
    s_ca = angle(c, a)
    s = 0.5 * (s_ab + s_bc + s_ca)
    prod = np.maximum(
        0.0,
        np.tan(0.5 * s)
        * np.tan(0.5 * (s - s_ab))
        * np.tan(0.5 * (s - s_bc))
        * np.tan(0.5 * (s - s_ca)),
    )
    return 4.0 * np.arctan(np.sqrt(prod))


def signed_triangle_area(a, b, c):
    """Area with the orientation sign (positive = CCW)."""
    area = triangle_area(a, b, c)
    sign = np.sign(np.einsum("...i,...i->...", np.cross(a, b), c))
    return np.where(sign == 0, 0.0, sign) * area


def turn_angles(vertices: np.ndarray) -> np.ndarray:
    """Signed turning angle at every vertex (S2::TurnAngle,
    s2measures.cc: angle between the edge normals, signed by Sign(a,b,c))."""
    v = np.asarray(vertices, dtype=np.float64)
    prev = np.roll(v, 1, axis=0)
    nxt = np.roll(v, -1, axis=0)
    n1 = np.cross(prev, v)
    n2 = np.cross(v, nxt)
    ang = angle(_norm_rows(n1), _norm_rows(n2))
    sign = np.sign(np.einsum("ij,ij->i", n1, nxt))
    return np.where(sign == 0, 0.0, sign) * ang


def loop_area(vertices: np.ndarray) -> float:
    """Area of a CCW loop, in [0, 4pi), via Gauss-Bonnet:
    area = 2pi - curvature, curvature = sum of turn angles
    (S2Loop::GetArea / GetCurvature semantics; robust for loops whose
    triangle fans are degenerate, e.g. the equator hemisphere)."""
    curvature = float(turn_angles(vertices).sum())
    area = 2.0 * np.pi - curvature
    if area < 0:
        area += 4.0 * np.pi
    if area >= 4.0 * np.pi:
        area -= 4.0 * np.pi
    return area


def loop_perimeter(vertices: np.ndarray) -> float:
    """Sum of edge arc lengths (s2polyline_measures.cc GetLength analog)."""
    v = np.asarray(vertices, dtype=np.float64)
    return float(angle(v, np.roll(v, -1, axis=0)).sum())


def polyline_length(vertices: np.ndarray) -> float:
    v = np.asarray(vertices, dtype=np.float64)
    return float(angle(v[:-1], v[1:]).sum())


def true_triangle_centroid(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Exact (non-normalized) surface integral of position over oriented
    spherical triangles — the reference TrueCentroid formula
    (s2centroids.cc:27-71): with r_x = theta_x / sin(theta_x) for each
    vertex's opposite edge angle, centroid = 0.5 * det-combinations of the
    coordinate columns weighted by r. Antisymmetric in vertex order, so a
    fan sum over any anchor integrates the loop interior exactly.
    Vectorized over (n, 3) triangle batches."""
    a = np.atleast_2d(np.asarray(a, dtype=np.float64))
    b = np.atleast_2d(np.asarray(b, dtype=np.float64))
    c = np.atleast_2d(np.asarray(c, dtype=np.float64))

    def _r(p, q):
        ang = angle(p, q)
        s = np.sin(ang)
        return np.where(s == 0.0, 1.0, ang / np.where(s == 0.0, 1.0, s))

    ra = _r(b, c)
    rb = _r(c, a)
    rc = _r(a, b)
    # columns: x = (a_x, b_x, c_x), y = ..., z = ... per triangle
    x = np.stack([a[:, 0], b[:, 0], c[:, 0]], axis=1)
    y = np.stack([a[:, 1], b[:, 1], c[:, 1]], axis=1)
    z = np.stack([a[:, 2], b[:, 2], c[:, 2]], axis=1)
    r = np.stack([ra, rb, rc], axis=1)
    out = 0.5 * np.stack(
        [
            (np.cross(y, z) * r).sum(axis=1),
            (np.cross(z, x) * r).sum(axis=1),
            (np.cross(x, y) * r).sum(axis=1),
        ],
        axis=1,
    )
    return out


def loop_centroid(vertices: np.ndarray) -> np.ndarray:
    """True (area-weighted, non-normalized) centroid of the loop interior:
    exact TrueCentroid surface integral summed over the vertex-0 fan
    (s2centroids.cc:27-71; S2Loop::GetCentroid via GetSurfaceIntegral,
    s2loop.cc:333-352)."""
    v = np.asarray(vertices, dtype=np.float64)
    anchor = np.broadcast_to(v[0], v[1:-1].shape)
    return true_triangle_centroid(anchor, v[1:-1], v[2:]).sum(axis=0)
