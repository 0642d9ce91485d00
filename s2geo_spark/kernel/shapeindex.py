"""Per-cell edge clipping: the reference's shape index made columnar.

For each polygon (one or more XOR loops): start from the region covering,
classify cells interior / boundary / exterior, attach to each boundary
cell the indices of edges that may intersect it, and subdivide boundary
cells holding more than ``max_edges_per_cell`` edges (the reference
subdivides until <=10 edges per cell, mutable_s2shape_index.cc:69-76).

Residual containment for a point q that matched boundary cell c:

    inside(q) = contains_center(c) XOR parity of crossings of the
                geodesic (center(c), q) against c's clipped edge list

(s2shape_index.h interior tracker; indexed S2Loop::Contains walk,
s2loop.cc:549-601). Exactness argument:

  * cells are convex in gnomonic (u,v) coordinates and geodesics project
    to straight uv lines on the same face, so the segment center->q stays
    inside the cell whenever q is in the cell — only edges intersecting
    the cell can cross it;
  * the clip test below is conservative (float triage with a generous
    margin; "near" => include), so the per-cell edge list is a superset
    of the truly intersecting edges;
  * superfluous edges contribute zero crossings, and the per-point
    crossing tests reuse the exact Triage -> Exact -> Symbolic cascade
    (predicates.py), so the parity is bit-exact.

The build is a *per-polygon* computation (NumPy-vectorized over
cells x edges); the Spark layer maps it over a polygon DataFrame via
applyInPandas (SURVEY.md §3.2) — never a driver-side loop.
"""

from __future__ import annotations

import numpy as np

from . import cellid_v1 as v1
from . import cells as cl
from . import coverer
from . import loops as lps
from . import predicates as pred
from . import s2coords as sc

# Generous float margin for the conservative clip triage: dets between
# unit vectors carry ~32eps error; 1e-12 over-includes a few edges per
# cell near boundaries, which costs a handful of extra crossing tests and
# can never change the parity.
_CLIP_EPS = 1e-12
_UV_PAD = 1e-12

MAX_EDGES_PER_CELL = 16  # reference uses 10; 16 keeps builds shallower
MAX_INDEX_LEVEL = 20     # bounds the point-side ancestor fan-out


def _endpoints_in_cells(cell_ids: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """(nc, np) bool: point j inside (padded) cell i. Conservative via
    uv-rect test with padding (S2Cell::Contains, s2cell.cc:283-307)."""
    f, u_lo, u_hi, v_lo, v_hi = cl.bound_uv(cell_ids)
    nc, npts = cell_ids.shape[0], pts.shape[0]
    out = np.zeros((nc, npts), dtype=bool)
    px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
    for face in np.unique(f):
        rows = np.nonzero(f == face)[0]
        comp = [px, py, pz, -px, -py, -pz][int(face)]
        with np.errstate(divide="ignore", invalid="ignore"):
            u, vv = sc.valid_face_xyz_to_uv(
                np.full(npts, face, dtype=np.int64), px, py, pz
            )
        ok = comp > 0
        for r in rows:
            out[r] = (
                ok
                & (u >= u_lo[r] - _UV_PAD)
                & (u <= u_hi[r] + _UV_PAD)
                & (vv >= v_lo[r] - _UV_PAD)
                & (vv <= v_hi[r] + _UV_PAD)
            )
    return out


def edge_cell_matrix(
    cell_ids: np.ndarray, C: np.ndarray, D: np.ndarray
) -> np.ndarray:
    """(nc, m) bool: edge (C[j], D[j]) may intersect cell i.

    may_intersect = endpoint-inside-cell OR crosses-any-of-4-cell-edges,
    each with conservative float triage (uncertain => True). Over-inclusion
    is harmless (see module docstring); under-inclusion cannot happen
    because every definite "no" is backed by dets with |det| > margin.
    """
    cell_ids = np.asarray(cell_ids, dtype=np.uint64)
    nc, m = cell_ids.shape[0], C.shape[0]
    verts = cl.vertices(cell_ids)  # (nc, 4, 3)
    out = _endpoints_in_cells(cell_ids, C) | _endpoints_in_cells(cell_ids, D)
    cxd = np.cross(C, D)  # (m, 3)
    for k in range(4):
        a = verts[:, k, :]
        b = verts[:, (k + 1) & 3, :]
        axb = np.cross(a, b)  # (nc, 3)
        s_abc = axb @ C.T          # det(a, b, c)  (nc, m)
        s_abd = axb @ D.T          # det(a, b, d)
        s_cda = a @ cxd.T          # det(c, d, a)
        s_cdb = b @ cxd.T          # det(c, d, b)
        acb = -np.sign(s_abc)
        bda = np.sign(s_abd)
        cbd = -np.sign(s_cdb)
        dac = np.sign(s_cda)
        cross = (acb == bda) & (bda == cbd) & (cbd == dac) & (acb != 0)
        near = (
            (np.abs(s_abc) <= _CLIP_EPS)
            | (np.abs(s_abd) <= _CLIP_EPS)
            | (np.abs(s_cda) <= _CLIP_EPS)
            | (np.abs(s_cdb) <= _CLIP_EPS)
        )
        out |= cross | near
    return out


def build_polygon_index(
    loop_arrays: list[np.ndarray],
    min_level: int = 4,
    max_level: int = 16,
    max_cells: int = 8,
    max_edges_per_cell: int = MAX_EDGES_PER_CELL,
    max_index_level: int = MAX_INDEX_LEVEL,
):
    """One polygon (XOR loops) -> columnar shape index.

    Returns dict of equal-length arrays:
      cell            int64  covering/index cell id (disjoint per polygon)
      is_interior     bool   cell fully inside: candidates skip the residual
      contains_center bool   exact polygon.contains(cell center)
      edges           list of (e_i, 6) float64 [cx cy cz dx dy dz] rows
      ksigns          list of (e_i,) int8 Sign(c, d, center) per edge

    Interior cells carry empty edge lists. Exterior subdivision children
    (no edges, center outside) are dropped — they contain no polygon area.
    """
    poly = lps.PreparedPolygon(loop_arrays)
    C = np.concatenate([lp.edge_c for lp in poly.loops])
    D = np.concatenate([lp.edge_d for lp in poly.loops])
    cov = coverer.get_covering(
        poly, max_cells=max_cells, min_level=min_level, max_level=max_level
    )
    out_cell: list[int] = []
    out_int: list[bool] = []
    out_cc: list[bool] = []
    out_edges: list[np.ndarray] = []
    out_ks: list[np.ndarray] = []

    queue = np.asarray(cov, dtype=np.uint64)
    while queue.size:
        emat = edge_cell_matrix(queue, C, D)  # (nc, m)
        n_edges = emat.sum(axis=1)
        cx, cy, cz = v1.to_point(queue)
        centers = np.stack([cx, cy, cz], axis=1)
        center_in = poly.contains_points(centers)
        levels = v1.level(queue)
        next_queue: list[np.ndarray] = []
        for i in range(queue.shape[0]):
            cid = queue[i]
            if n_edges[i] == 0:
                if center_in[i]:
                    out_cell.append(int(np.int64(cid)))
                    out_int.append(True)
                    out_cc.append(True)
                    out_edges.append(np.empty((0, 6)))
                    out_ks.append(np.empty(0, dtype=np.int8))
                # else: exterior — drop
                continue
            if n_edges[i] > max_edges_per_cell and levels[i] < max_index_level:
                next_queue.append(
                    v1.child(np.repeat(np.array([cid], dtype=np.uint64), 4),
                             np.arange(4))
                )
                continue
            idx = np.nonzero(emat[i])[0]
            ec, ed = C[idx], D[idx]
            ctr = tuple(centers[i])
            ks = np.array(
                [pred.sign(tuple(ec[j]), tuple(ed[j]), ctr) for j in range(len(idx))],
                dtype=np.int8,
            )
            out_cell.append(int(np.int64(cid)))
            out_int.append(False)
            out_cc.append(bool(center_in[i]))
            out_edges.append(np.concatenate([ec, ed], axis=1))
            out_ks.append(ks)
        queue = (
            np.concatenate(next_queue) if next_queue else np.empty(0, dtype=np.uint64)
        )
    return {
        "cell": np.array(out_cell, dtype=np.int64),
        "is_interior": np.array(out_int, dtype=bool),
        "contains_center": np.array(out_cc, dtype=bool),
        "edges": out_edges,
        "ksigns": out_ks,
    }


def contains_from_anchor(
    anchor: np.ndarray,
    anchor_inside: bool,
    edges: np.ndarray,
    ksigns: np.ndarray,
    points: np.ndarray,
) -> np.ndarray:
    """Crossing parity from an arbitrary anchor against a small edge list.

    Same det formulation as PreparedLoop.contains_points (one matmul for
    all (point, edge) signs) with anchor `a` replacing S2::Origin; rows
    with any det inside the triage band fall back to the exact scalar
    cascade. edges is (m, 6) [c | d]; ksigns[j] = Sign(c_j, d_j, anchor).
    """
    points = np.asarray(points, dtype=np.float64)
    n = points.shape[0]
    m = edges.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    if m == 0:
        return np.full(n, anchor_inside, dtype=bool)
    c = edges[:, :3]
    d = edges[:, 3:]
    w1 = np.cross(c, anchor[None, :])   # det(a,b,c) = b . (c x a)
    w2 = np.cross(d, anchor[None, :])   # det(a,b,d) = b . (d x a)
    w3 = np.cross(c, d)                 # det(c,d,b) = b . (c x d)
    W = np.concatenate([w1, w2, w3], axis=1).reshape(3 * m, 3).T  # (3, 3m)
    dets = (points @ W).reshape(n, m, 3)
    s = np.sign(dets).astype(np.int8)
    uncertain = (np.abs(dets) <= lps._BATCH_DET_ERROR).any(axis=2)
    acb = -s[:, :, 0]
    bda = s[:, :, 1]
    cbd = -s[:, :, 2]
    k = ksigns[None, :]
    crossing = (acb == bda) & (bda == cbd) & (cbd == k) & (acb != 0)
    crossing &= ~uncertain
    parity = (crossing.sum(axis=1) & 1).astype(bool)
    inside = parity ^ anchor_inside
    a_t = tuple(anchor)
    for r in np.nonzero(uncertain.any(axis=1))[0]:
        ins = anchor_inside
        b_t = tuple(points[r])
        for j in range(m):
            ins ^= pred.edge_or_vertex_crossing(
                a_t, b_t, tuple(c[j]), tuple(d[j])
            )
        inside[r] = ins
    return inside
