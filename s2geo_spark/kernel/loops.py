"""Spherical loops & polygons: preparation, exact point containment
(vectorized crossing parity), and cell predicates for the coverer.

Containment algorithm = the reference's brute-force crossing parity
(src/s2/s2loop.cc:589-599): starting from the fixed S2::Origin with the
precomputed ``origin_inside`` bit, XOR EdgeOrVertexCrossing(origin, p, v_i,
v_{i+1}) over all loop edges. Our formulation vectorizes the four
orientation signs per (point, edge) pair into one (points x 3*edges) matmul:

    det(a,b,c) = b . (c x a)      a = origin (fixed), b = point, c,d = edge
    det(a,b,d) = b . (d x a)
    det(c,d,b) = b . (c x d)
    det(c,d,a) = const per edge

crossing  <=>  -s1 == s2 == -s3 == k  != 0   (s2edge_crosser.cc:40-110)

Pairs with any |det| below the triage bound (or with point == vertex) fall
back to the scalar exact predicates (predicates.py) — identical tie-breaks
to the reference's Triage -> Exact -> SymbolicPerturbation cascade.

Loop preparation (origin_inside via AngleContainsVertex + self-containment
check) follows S2Loop::InitOriginAndBound (src/s2/s2loop.cc:243-286).
Vertex model is SEMI_OPEN, the reference default
(src/s2/s2contains_point_query.h:62-65), which is what crossing-parity from
an exterior origin yields.
"""

from __future__ import annotations

import numpy as np

from . import cellid_v1 as v1
from . import cells as cl
from . import predicates as pred
from . import regions
from . import s2coords as sc

ORIGIN = regions.ORIGIN

# Conservative triage bound for the batched dets (slightly wider than the
# reference's 3.6548*eps because our dets reuse precomputed cross products).
_BATCH_DET_ERROR = 32 * pred.DBL_EPSILON


def _norm_rows(m):
    return m / np.linalg.norm(m, axis=-1, keepdims=True)


class PreparedLoop:
    """One spherical loop with precomputed containment machinery.

    vertices: (m, 3) float64 unit vectors, CCW order, implicit closing edge.
    """

    def __init__(self, vertices: np.ndarray):
        vertices = np.asarray(vertices, dtype=np.float64)
        if vertices.ndim != 2 or vertices.shape[1] != 3 or vertices.shape[0] < 3:
            raise ValueError("loop needs >= 3 xyz vertices")
        self.vertices = vertices
        m = vertices.shape[0]
        c = vertices
        d = np.roll(vertices, -1, axis=0)
        self.edge_c = c
        self.edge_d = d
        a = ORIGIN
        # W columns per edge: [c x a, d x a, c x d]
        w1 = np.cross(c, a[None, :])
        w2 = np.cross(d, a[None, :])
        w3 = np.cross(c, d)
        self.W = np.concatenate([w1, w2, w3], axis=1).reshape(m, 3, 3)
        # flat (3, 3m) layout for one BLAS dgemm per point chunk:
        # column 3*i+j holds W[i, j, :]
        self.W_flat = np.ascontiguousarray(
            self.W.reshape(3 * m, 3).T
        )
        # constant sign k = Sign(c, d, a) per edge, exact where uncertain
        k = np.empty(m, dtype=np.int8)
        for i in range(m):
            k[i] = pred.sign(tuple(c[i]), tuple(d[i]), tuple(a))
        self.k_sign = k
        self.origin_inside = self._compute_origin_inside()
        self.bound = self._compute_bound()

    # -- initialization ----------------------------------------------------
    def _compute_origin_inside(self) -> bool:
        """S2Loop::InitOriginAndBound (s2loop.cc:263-276)."""
        vs = self.vertices
        v0, vx1, v2 = tuple(vs[0]), tuple(vs[1]), tuple(vs[2 % len(vs)])
        v1_inside = (
            v0 != vx1
            and v2 != vx1
            and pred.angle_contains_vertex(v0, vx1, v2)
        )
        self.origin_inside = False  # temporarily, for the contains call
        got = bool(self.contains_points(vs[1][None, :])[0])
        return v1_inside != got

    def _compute_bound(self):
        """Conservative lat/lng bound incl. edge-latitude extrema and pole
        handling (model of S2Loop::InitBound, s2loop.cc:288-325)."""
        vs = self.vertices
        lat, lng = sc.xyz_to_latlng_degrees(vs[:, 0], vs[:, 1], vs[:, 2])
        lat_lo, lat_hi = float(lat.min()), float(lat.max())
        # edge latitude extrema: point of max |z| on each edge's great circle
        n = np.cross(self.edge_c, self.edge_d)
        nn = np.linalg.norm(n, axis=1)
        ok = nn > 0
        n_unit = n[ok] / nn[ok][:, None]
        zhat = np.array([0.0, 0.0, 1.0])
        zproj = zhat[None, :] - n_unit * n_unit[:, 2][:, None]
        zn = np.linalg.norm(zproj, axis=1)
        has_ext = zn > 1e-15
        if has_ext.any():
            e = zproj[has_ext] / zn[has_ext][:, None]
            cc = self.edge_c[ok][has_ext]
            dd = self.edge_d[ok][has_ext]
            nrm = n_unit[has_ext]
            for e_pt in (e, -e):
                within = (
                    (np.cross(cc, e_pt) * nrm).sum(1) >= -1e-15
                ) & ((np.cross(e_pt, dd) * nrm).sum(1) >= -1e-15)
                if within.any():
                    elat = np.degrees(np.arcsin(np.clip(e_pt[within][:, 2], -1, 1)))
                    lat_lo = min(lat_lo, float(elat.min()))
                    lat_hi = max(lat_hi, float(elat.max()))
        # longitude: union of edge spans; conservative full if wide
        dl = np.abs(((lng - np.roll(lng, -1)) + 180.0) % 360.0 - 180.0)
        lng_full = dl.sum() >= 360.0 - 1e-9
        north = bool(self.contains_points(np.array([[0.0, 0.0, 1.0]]))[0])
        south = bool(self.contains_points(np.array([[0.0, 0.0, -1.0]]))[0])
        if north:
            lat_hi = 90.0
            lng_full = True
        if south:
            lat_lo = -90.0
            lng_full = True
        if lng_full:
            return regions.LatLngRect(lat_lo, lat_hi, -180.0, 180.0)
        # Longitude hull = union of per-edge short-way intervals (a geodesic
        # edge spanning < 180 deg covers exactly the short-way longitude
        # interval between its endpoints — S2LatLngRectBounder,
        # s2latlng_rect_bounder.cc:58-106). The old vertex-only hull around
        # the circular mean could clip a sliver when an edge crossed the
        # meridian antipodal to the mean (ADVICE r1).
        l1 = lng
        l2 = np.roll(lng, -1)
        d = ((l2 - l1) + 180.0) % 360.0 - 180.0  # signed short-way delta
        starts = np.where(d >= 0, l1, l2) % 360.0
        widths = np.abs(d)
        # sweep on [0, 360): find the largest uncovered gap; the hull is its
        # complement. Intervals crossing 360 are split.
        ss, ee = [], []
        for s, w in zip(starts, widths):
            e = s + w
            if e <= 360.0:
                ss.append(s)
                ee.append(e)
            else:
                ss.append(s)
                ee.append(360.0)
                ss.append(0.0)
                ee.append(e - 360.0)
        order = np.argsort(np.asarray(ss))
        ssa = np.asarray(ss)[order]
        eea = np.asarray(ee)[order]
        # merge overlapping segments
        merged = []
        cs, ce = float(ssa[0]), float(eea[0])
        for s, e in zip(ssa[1:], eea[1:]):
            if s <= ce + 1e-12:
                ce = max(ce, float(e))
            else:
                merged.append((cs, ce))
                cs, ce = float(s), float(e)
        merged.append((cs, ce))
        # largest gap between consecutive merged segments (incl. wrap gap)
        best_gap, gap_end, gap_start = -1.0, 0.0, 0.0
        for idx in range(len(merged)):
            nxt = merged[(idx + 1) % len(merged)]
            g = (nxt[0] - merged[idx][1]) % 360.0 if len(merged) > 1 else (
                (merged[0][0] + 360.0 - merged[0][1]) % 360.0
            )
            if g > best_gap:
                best_gap = g
                gap_end = merged[idx][1]   # hull hi
                gap_start = nxt[0] if len(merged) > 1 else merged[0][0]
        if best_gap <= 1e-12:
            return regions.LatLngRect(lat_lo, lat_hi, -180.0, 180.0)
        lo = ((gap_start - 1e-9 + 180.0) % 360.0) - 180.0
        hi = ((gap_end + 1e-9 + 180.0) % 360.0) - 180.0
        return regions.LatLngRect(lat_lo - 1e-9, min(lat_hi + 1e-9, 90.0), lo, hi)

    # -- point containment --------------------------------------------------
    def points_on_boundary(self, points: np.ndarray) -> np.ndarray:
        """(n,) bool: point lies exactly ON some loop edge (closed arcs).

        Triage on |det(c, d, p)| (vectorized), exact un-perturbed Sign for
        the near-zero candidates, then a closed-arc span test
        (dot(c,p) >= dot(c,d) and dot(d,p) >= dot(c,d), valid for arcs
        < pi). The basis of the OPEN/CLOSED vertex models
        (s2contains_point_query.h:30-110)."""
        points = np.asarray(points, dtype=np.float64)
        n = points.shape[0]
        if n == 0:
            return np.zeros(0, dtype=bool)
        cxd = np.cross(self.edge_c, self.edge_d)  # (m, 3)
        dets = points @ cxd.T  # (n, m)
        cd = (self.edge_c * self.edge_d).sum(1)  # (m,)
        near = np.abs(dets) <= _BATCH_DET_ERROR
        out = np.zeros(n, dtype=bool)
        for r, e in zip(*np.nonzero(near)):
            p = points[r]
            c, d = self.edge_c[e], self.edge_d[e]
            if (p == c).all() or (p == d).all():
                out[r] = True
                continue
            if pred.exact_sign(tuple(c), tuple(d), tuple(p), perturb=False) != 0:
                continue
            if float(c @ p) >= cd[e] and float(d @ p) >= cd[e]:
                out[r] = True
        return out

    def contains_points(
        self, points: np.ndarray, model: str = "SEMI_OPEN"
    ) -> np.ndarray:
        """Vectorized crossing-parity containment for (n, 3) unit points.

        model selects the vertex model (s2contains_point_query.h:30-110):
        SEMI_OPEN (reference default — crossing parity from an exterior
        origin), OPEN (boundary points excluded), CLOSED (included).
        Off-boundary points agree across all three models."""
        if model not in ("SEMI_OPEN", "OPEN", "CLOSED"):
            raise ValueError(model)
        inside = self._contains_points_semi_open(points)
        if model != "SEMI_OPEN":
            boundary = self.points_on_boundary(points)
            inside = np.where(boundary, model == "CLOSED", inside)
        return inside

    def _contains_points_semi_open(self, points: np.ndarray) -> np.ndarray:
        """Crossing-parity containment (the SEMI_OPEN model)."""
        points = np.asarray(points, dtype=np.float64)
        n = points.shape[0]
        m = self.vertices.shape[0]
        if n == 0:
            return np.zeros(0, dtype=bool)
        inside = np.empty(n, dtype=bool)
        # chunked so the (chunk, 3m) det matrix stays cache/memory friendly
        chunk = max(256, min(n, (1 << 22) // max(m, 1)))
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            b = points[lo:hi]
            dets = b @ self.W_flat  # (nc, 3m) — one dgemm
            dets = dets.reshape(hi - lo, m, 3)
            s = np.sign(dets).astype(np.int8)
            uncertain = (np.abs(dets) <= _BATCH_DET_ERROR).any(axis=2)
            acb = -s[:, :, 0]
            bda = s[:, :, 1]
            cbd = -s[:, :, 2]
            k = self.k_sign[None, :]
            crossing = (acb == bda) & (bda == cbd) & (cbd == k) & (acb != 0)
            crossing &= ~uncertain
            parity = (crossing.sum(axis=1) & 1).astype(bool)
            ins = parity ^ self.origin_inside
            # exact residue: points with any uncertain (point, edge) pair
            for r in np.nonzero(uncertain.any(axis=1))[0]:
                ins[r] = self._contains_point_scalar(b[r])
            inside[lo:hi] = ins
        return inside

    def _contains_point_scalar(self, p) -> bool:
        """Reference-exact brute force for one point (s2loop.cc:589-599)."""
        a = tuple(ORIGIN)
        b = tuple(p)
        inside = self.origin_inside
        for i in range(self.vertices.shape[0]):
            c = tuple(self.edge_c[i])
            d = tuple(self.edge_d[i])
            inside ^= pred.edge_or_vertex_crossing(a, b, c, d)
        return bool(inside)

    # -- cell predicates for the coverer ------------------------------------
    def _edges_cross_cells(self, cell_ids: np.ndarray) -> np.ndarray:
        """For each cell: does any loop edge cross any of the 4 cell edges?
        Float triage only, 'uncertain -> True' (conservative for coverings)."""
        cell_ids = np.asarray(cell_ids, dtype=np.uint64)
        verts = cl.vertices(cell_ids)  # (nc, 4, 3)
        nc = cell_ids.shape[0]
        out = np.zeros(nc, dtype=bool)
        c = self.edge_c
        d = self.edge_d
        cxd = np.cross(c, d)  # (m, 3)
        for k in range(4):
            a = verts[:, k, :]
            b = verts[:, (k + 1) & 3, :]
            axb = np.cross(a, b)  # (nc, 3)
            # sign(det(a,b,c)) etc. over (nc, m)
            s_abc = np.einsum("ni,mi->nm", axb, c)
            s_abd = np.einsum("ni,mi->nm", axb, d)
            s_cda = np.einsum("mi,ni->nm", cxd, a)
            s_cdb = np.einsum("mi,ni->nm", cxd, b)
            eps = _BATCH_DET_ERROR
            # crossing requires opposite sides both ways (float, conservative)
            opp1 = (s_abc * s_abd) < 0
            opp2 = (s_cda * s_cdb) < 0
            # the proper arc test: acb == bda == cbd == dac pattern
            acb = -np.sign(s_abc)
            bda = np.sign(s_abd)
            cbd = -np.sign(s_cdb)
            dac = np.sign(s_cda)
            cross = (acb == bda) & (bda == cbd) & (cbd == dac) & (acb != 0)
            near = (
                (np.abs(s_abc) <= eps)
                | (np.abs(s_abd) <= eps)
                | (np.abs(s_cda) <= eps)
                | (np.abs(s_cdb) <= eps)
            )
            out |= ((cross & opp1 & opp2) | near).any(axis=1)
        return out

    def _vertex_in_cells(self, cell_ids: np.ndarray) -> np.ndarray:
        """Does any loop vertex lie inside each cell? (loop smaller than cell)"""
        cell_ids = np.asarray(cell_ids, dtype=np.uint64)
        # test only vertex 0: if no edge crosses the cell boundary and any
        # vertex is inside, then all are — vertex 0 suffices.
        p = self.vertices[0]
        n = cell_ids.shape[0]
        return cl.contains_points(
            cell_ids, np.full(n, p[0]), np.full(n, p[1]), np.full(n, p[2])
        )

    def may_intersect_cells(self, cell_ids: np.ndarray) -> np.ndarray:
        cell_ids = np.asarray(cell_ids, dtype=np.uint64)
        cx, cy, cz = v1.to_point(cell_ids)
        centers = np.stack([cx, cy, cz], axis=1)
        center_in = self.contains_points(centers)
        return center_in | self._edges_cross_cells(cell_ids) | self._vertex_in_cells(
            cell_ids
        )

    def contains_cells(self, cell_ids: np.ndarray) -> np.ndarray:
        cell_ids = np.asarray(cell_ids, dtype=np.uint64)
        cx, cy, cz = v1.to_point(cell_ids)
        centers = np.stack([cx, cy, cz], axis=1)
        center_in = self.contains_points(centers)
        return center_in & ~self._edges_cross_cells(cell_ids) & ~self._vertex_in_cells(
            cell_ids
        )

    def cell_union_bound(self):
        return self.bound.cell_union_bound()


class PreparedPolygon:
    """Multiple loops; containment = XOR of loop parities (S2Polygon
    semantics for properly nested shells/holes, src/s2/s2polygon.cc)."""

    def __init__(self, loops):
        self.loops = [
            lp if isinstance(lp, PreparedLoop) else PreparedLoop(lp) for lp in loops
        ]

    def contains_points(
        self, points: np.ndarray, model: str = "SEMI_OPEN"
    ) -> np.ndarray:
        points = np.asarray(points, dtype=np.float64)
        inside = np.zeros(points.shape[0], dtype=bool)
        for lp in self.loops:
            inside ^= lp._contains_points_semi_open(points)
        if model != "SEMI_OPEN":
            if model not in ("OPEN", "CLOSED"):
                raise ValueError(model)
            boundary = np.zeros(points.shape[0], dtype=bool)
            for lp in self.loops:
                boundary |= lp.points_on_boundary(points)
            inside = np.where(boundary, model == "CLOSED", inside)
        return inside

    def may_intersect_cells(self, cell_ids) -> np.ndarray:
        cell_ids = np.asarray(cell_ids, dtype=np.uint64)
        out = np.zeros(cell_ids.shape[0], dtype=bool)
        cx, cy, cz = v1.to_point(cell_ids)
        centers = np.stack([cx, cy, cz], axis=1)
        center_in = self.contains_points(centers)
        boundary = np.zeros(cell_ids.shape[0], dtype=bool)
        for lp in self.loops:
            boundary |= lp._edges_cross_cells(cell_ids) | lp._vertex_in_cells(cell_ids)
        return center_in | boundary

    def contains_cells(self, cell_ids) -> np.ndarray:
        cell_ids = np.asarray(cell_ids, dtype=np.uint64)
        cx, cy, cz = v1.to_point(cell_ids)
        centers = np.stack([cx, cy, cz], axis=1)
        center_in = self.contains_points(centers)
        boundary = np.zeros(cell_ids.shape[0], dtype=bool)
        for lp in self.loops:
            boundary |= lp._edges_cross_cells(cell_ids) | lp._vertex_in_cells(cell_ids)
        return center_in & ~boundary

    def cell_union_bound(self):
        # union of the loops' bound seeds, normalized by the caller (coverer)
        import numpy as _np

        from . import cellunion

        seeds = _np.concatenate([lp.cell_union_bound() for lp in self.loops])
        return cellunion.normalize(seeds)


def make_regular_loop(lat_deg: float, lon_deg: float, radius_deg: float, k: int):
    """Regular k-gon inscribed in a cap (test fixture, the reference's
    MakeRegularLoop pattern, s2loop_test.cc:1274). CCW seen from the center."""
    center = regions.latlng_to_unit(lat_deg, lon_deg)
    # orthonormal frame at center
    u = pred.ortho(center)
    v = np.cross(center, u)
    r = np.radians(radius_deg)
    ang = 2.0 * np.pi * np.arange(k) / k
    pts = (
        np.cos(r) * center[None, :]
        + np.sin(r) * (np.cos(ang)[:, None] * u[None, :] + np.sin(ang)[:, None] * v[None, :])
    )
    return _norm_rows(pts)


def parse_loop_text(text: str) -> np.ndarray:
    """Parse the reference text-format loop grammar '"lat:lng, lat:lng, ..."'
    (src/s2/s2text_format.h:62-201) into (m, 3) unit vectors."""
    pts = []
    for tok in text.split(","):
        tok = tok.strip()
        if not tok:
            continue
        lat_s, _, lng_s = tok.partition(":")
        pts.append((float(lat_s), float(lng_s)))
    arr = np.array(pts, dtype=np.float64)
    return regions.latlng_to_unit(arr[:, 0], arr[:, 1])
