"""Vectorized S2Cell geometry: bounds, vertices, edge normals, point tests.

Reimplements the cell-geometry pieces the coverer and join prefilters need:
  * IJLevelToBoundUV / GetBoundUV: src/s2/s2cell_id_v1.cc:407-429
  * vertices = uv-rect corners (CCW from (lo,lo)): src/s2/s2cell.cc GetVertexRaw
  * edge outward normals via GetUNorm/GetVNorm: src/s2/s2cell.cc:71-77,
    src/s2/s2coords.h:424-443
  * S2Cell::Contains(point): uv-rect test expanded by 2*DBL_EPSILON
    (src/s2/s2cell.cc:283-307)

All functions operate on uint64 cell-id arrays; outputs are stacked NumPy
arrays (n, 4, 3) etc.
"""

from __future__ import annotations

import numpy as np

from . import cellid_v1 as v1
from . import s2coords as sc

_DBL_EPSILON = np.finfo(np.float64).eps


def bound_uv(cell_id):
    """(n,) ids -> (u_lo, u_hi, v_lo, v_hi) arrays (IJLevelToBoundUV)."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    f, i, j = v1.to_face_ij_orientation(cell_id)
    size = v1.get_size_ij(v1.level(cell_id))
    i_lo = i & (-size)
    j_lo = j & (-size)
    u_lo = sc.st_to_uv(sc.ij_to_st_min(i_lo))
    u_hi = sc.st_to_uv(sc.ij_to_st_min(i_lo + size))
    v_lo = sc.st_to_uv(sc.ij_to_st_min(j_lo))
    v_hi = sc.st_to_uv(sc.ij_to_st_min(j_lo + size))
    return f, u_lo, u_hi, v_lo, v_hi


def vertices_raw(cell_id):
    """(n,) ids -> (n, 4, 3) un-normalized corner points, CCW from (lo,lo)."""
    f, u_lo, u_hi, v_lo, v_hi = bound_uv(cell_id)
    corners_u = (u_lo, u_hi, u_hi, u_lo)
    corners_v = (v_lo, v_lo, v_hi, v_hi)
    out = np.empty((np.asarray(cell_id).shape[0], 4, 3), dtype=np.float64)
    for k in range(4):
        x, y, z = sc.face_uv_to_xyz(f, corners_u[k], corners_v[k])
        out[:, k, 0] = x
        out[:, k, 1] = y
        out[:, k, 2] = z
    return out


def vertices(cell_id):
    """Normalized corners (n, 4, 3)."""
    raw = vertices_raw(cell_id)
    return raw / np.linalg.norm(raw, axis=2, keepdims=True)


def _u_norm(face, u):
    """GetUNorm (s2coords.h:424-432): outward normal of the plane through
    the u=const great circle."""
    one = np.ones_like(u)
    zero = np.zeros_like(u)
    conds = [face == k for k in range(6)]
    x = np.select(conds, [u, one, one, -u, zero, zero])
    y = np.select(conds, [-one, u, zero, zero, -u, -one])
    z = np.select(conds, [zero, zero, u, one, one, -u])
    return np.stack([x, y, z], axis=-1)


def _v_norm(face, v):
    """GetVNorm (s2coords.h:435-443)."""
    one = np.ones_like(v)
    zero = np.zeros_like(v)
    conds = [face == k for k in range(6)]
    x = np.select(conds, [-v, zero, zero, v, one, one])
    y = np.select(conds, [zero, -v, -one, -one, v, zero])
    z = np.select(conds, [one, one, -v, zero, zero, v])
    return np.stack([x, y, z], axis=-1)


def edge_normals_raw(cell_id):
    """(n, 4, 3) inward-facing edge normals, order [bottom, right, top, left]
    (S2Cell::GetEdgeRaw, s2cell.cc:71-77). Positive dot => interior side."""
    f, u_lo, u_hi, v_lo, v_hi = bound_uv(cell_id)
    out = np.empty((np.asarray(cell_id).shape[0], 4, 3), dtype=np.float64)
    out[:, 0, :] = _v_norm(f, v_lo)
    out[:, 1, :] = _u_norm(f, u_hi)
    out[:, 2, :] = -_v_norm(f, v_hi)
    out[:, 3, :] = -_u_norm(f, u_lo)
    return out


def contains_points(cell_id, px, py, pz):
    """Broadcast test: does cell[n] contain point[n]? (paired, not cross.)

    Mirrors S2Cell::Contains (s2cell.cc:283-307): project onto the cell's
    face (reject if on the back half), then uv-rect test expanded by
    2*DBL_EPSILON.
    """
    f, u_lo, u_hi, v_lo, v_hi = bound_uv(np.asarray(cell_id, dtype=np.uint64))
    # FaceXYZtoUV validity: the face-axis component must be positive
    comp = np.select(
        [f == 0, f == 1, f == 2, f == 3, f == 4, f == 5],
        [px, py, pz, -px, -py, -pz],
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        u, v = sc.valid_face_xyz_to_uv(f, px, py, pz)
    eps = 2 * _DBL_EPSILON
    inside = (
        (comp > 0)
        & (u >= u_lo - eps)
        & (u <= u_hi + eps)
        & (v >= v_lo - eps)
        & (v <= v_hi + eps)
    )
    return inside


def distance2_to_points(cell_id, px, py, pz):
    """Paired min squared-chord distance from point[n] to cell[n]
    (S2Cell::GetDistance, s2cell.cc:369-430): 0 when inside, else the min
    edge distance over the 4 boundary edges (vertex cases fall out of the
    edge-distance endpoint terms)."""
    from . import edges as ek

    cell_id = np.asarray(cell_id, dtype=np.uint64)
    pts = np.stack([np.asarray(px, float), np.asarray(py, float), np.asarray(pz, float)], axis=1)
    inside = contains_points(cell_id, pts[:, 0], pts[:, 1], pts[:, 2])
    verts = vertices(cell_id)  # (n, 4, 3)
    best = np.full(len(pts), np.inf)
    for k in range(4):
        a = verts[:, k, :]
        b = verts[:, (k + 1) & 3, :]
        # paired variant of edges.point_edge_chord2
        nvec = np.cross(a, b)
        nn = np.linalg.norm(nvec, axis=-1, keepdims=True)
        nu = nvec / np.maximum(nn, 1e-300)
        xn = (pts * nu).sum(1)
        ax_n = (nu * np.cross(a, pts)).sum(1)
        xb_n = (nu * np.cross(pts, b)).sum(1)
        interior = (ax_n > 0) & (xb_n > 0)
        sin2 = np.clip(xn * xn, 0.0, 1.0)
        perp = 2.0 - 2.0 * np.sqrt(np.maximum(0.0, 1.0 - sin2))
        endpoint = np.minimum(
            ((pts - a) ** 2).sum(1), ((pts - b) ** 2).sum(1)
        )
        d = np.where(interior, np.minimum(perp, endpoint), endpoint)
        best = np.minimum(best, d)
    return np.where(inside, 0.0, best)


def distance2_cell_to_cell(a_ids, b_ids):
    """Paired min squared-chord distance between cells (S2Cell::GetDistance
    (S2Cell), s2cell.cc:432-545): 0 when they intersect, else the min over
    the 16 vertex-to-edge combinations both ways."""
    a_ids = np.asarray(a_ids, dtype=np.uint64)
    b_ids = np.asarray(b_ids, dtype=np.uint64)
    inter = (
        (v1.range_min(a_ids) <= v1.range_max(b_ids))
        & (v1.range_max(a_ids) >= v1.range_min(b_ids))
    )
    va = vertices(a_ids)
    vb = vertices(b_ids)
    best = np.full(a_ids.shape[0], np.inf)
    for k in range(4):
        pa = va[:, k, :]
        best = np.minimum(
            best, distance2_to_points(b_ids, pa[:, 0], pa[:, 1], pa[:, 2])
        )
        pb = vb[:, k, :]
        best = np.minimum(
            best, distance2_to_points(a_ids, pb[:, 0], pb[:, 1], pb[:, 2])
        )
    return np.where(inter, 0.0, best)


def expanded_by_distance_uv(cell_id, distance_rad: float):
    """Conservative uv-rect expansion by a spherical distance
    (ExpandedByDistanceUV, s2cell_id_v1.cc:437-469 semantic anchor; this
    is a provably conservative variant rather than the reference's tight
    formula): any point within `distance_rad` of the cell lies inside the
    returned (u_lo, u_hi, v_lo, v_hi) on the same face.

    Bound: a gnomonic step of angular size d at plane radius r moves at
    most tan(theta + d) - tan(theta) in the plane; with m = max(|u|,|v|
    corner radius) the padding sin(d) * (1 + m^2) is an upper bound for
    d < pi/2 - theta. Returns padded bounds (may exceed [-1, 1]; callers
    clip — points beyond the face edge are handled by neighbor faces)."""
    f, u_lo, u_hi, v_lo, v_hi = bound_uv(np.asarray(cell_id, dtype=np.uint64))
    m2 = np.maximum(
        np.maximum(u_lo * u_lo, u_hi * u_hi),
        np.maximum(v_lo * v_lo, v_hi * v_hi),
    )
    # plane radius^2 of the farthest corner = mu^2 + mv^2 <= 2*max^2
    pad = np.sin(distance_rad) * (1.0 + 2.0 * m2)
    return f, u_lo - pad, u_hi + pad, v_lo - pad, v_hi + pad


def exact_area(cell_id) -> np.ndarray:
    """Per-cell exact (Girard) area from the 4 float vertices
    (S2Cell::ExactArea, s2cell.cc:347-355)."""
    from . import measures as m

    cell_id = np.asarray(cell_id, dtype=np.uint64)
    verts = vertices(cell_id)
    t1 = m.triangle_area(verts[:, 0], verts[:, 1], verts[:, 2])
    t2 = m.triangle_area(verts[:, 0], verts[:, 2], verts[:, 3])
    return t1 + t2


def average_area(level) -> np.ndarray:
    """Exact average area of cells at a level (S2Cell::AverageArea,
    s2cell.cc:330-333: the kAvgArea metric is exact by construction)."""
    from . import metrics

    return metrics.metric_value(metrics.AVG_AREA_DERIV, level, dim=2)


def approx_area(cell_id) -> np.ndarray:
    """Quadrilateral approximation of the cell area (S2Cell::ApproxArea,
    s2cell.cc:335-345): levels 0-1 fall back to the exact average; finer
    cells use the flat quadrilateral area (half the diagonal cross
    product) with the spherical-excess correction
    2 / (1 + sqrt(1 - min(flat/pi, 1))). Within ~3% of exact (tested)."""
    from . import cellid_v1 as v1

    cell_id = np.asarray(cell_id, dtype=np.uint64)
    verts = vertices(cell_id)
    d1 = verts[:, 2] - verts[:, 0]
    d2 = verts[:, 3] - verts[:, 1]
    flat = 0.5 * np.linalg.norm(np.cross(d1, d2), axis=1)
    corr = 2.0 / (1.0 + np.sqrt(1.0 - np.minimum(flat / np.pi, 1.0)))
    lv = v1.level(cell_id)
    return np.where(lv < 2, average_area(lv), flat * corr)
