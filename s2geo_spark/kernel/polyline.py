"""Polyline constructive ops: simplify, tessellate, align, buffer.

SURVEY §2.5 tail, reimplemented from the reference semantics:

  * simplify_polyline — S2Polyline::SubsampleVertices (s2polyline.cc:700+):
    greedy Douglas-Peucker-style subsampling; every dropped vertex stays
    within `tolerance` of the simplified chain.
  * tessellate_edge — S2EdgeTessellator (s2edge_tessellator.cc) for the
    plate-carree (lat/lng) projection: subdivide a geodesic until the
    projected polyline deviates from the projected geodesic by at most
    `tolerance` (checked at the recursive midpoint, the max-error point).
  * dtw_alignment — s2polyline_alignment.cc ExactVertexAlignment: dynamic
    time warping over squared chord distances, returning the optimal
    monotone vertex correspondence and its cost.
  * buffer_loop — S2BufferOperation semantics at grid precision: the
    buffered region is computed as covering -> expand_by_radius ->
    boundary reconstruction. The result is a conservative superset whose
    boundary is within one cell width (level chosen from the radius) of
    the exact offset curve; exact snap-rounded buffering is out of scope
    (documented in COVERAGE.md).
"""

from __future__ import annotations

import numpy as np

from . import cellunion, coverer, edges as ek, rastervec


def simplify_polyline(vertices: np.ndarray, tolerance_rad: float) -> np.ndarray:
    """Greedy subsample: keep the first vertex, then repeatedly extend the
    current edge as far as possible while every skipped vertex stays
    within tolerance (chord) of it."""
    v = np.asarray(vertices, dtype=np.float64)
    n = v.shape[0]
    if n <= 2:
        return v
    tol_chord2 = float((2.0 * np.sin(0.5 * tolerance_rad)) ** 2)
    keep = [0]
    i = 0
    while i < n - 1:
        # furthest j such that all vertices in (i, j) are within tolerance
        # of edge (v[i], v[j])
        j = i + 1
        best = j
        while j + 1 <= n - 1:
            j += 1
            mid = v[i + 1 : j]
            d2 = ek.point_edge_chord2(mid, v[i : i + 1], v[j : j + 1])[:, 0]
            if (d2 <= tol_chord2).all():
                best = j
            else:
                break
        keep.append(best)
        i = best
    return v[keep]


def _project_latlng(p: np.ndarray) -> np.ndarray:
    lat = np.arcsin(np.clip(p[..., 2], -1, 1))
    lng = np.arctan2(p[..., 1], p[..., 0])
    return np.stack([lat, lng], axis=-1)


def tessellate_edge(a: np.ndarray, b: np.ndarray, tolerance_rad: float,
                    max_depth: int = 20) -> np.ndarray:
    """Vertices of the tessellated geodesic (a .. b inclusive) such that
    the plate-carree projection of the chain stays within tolerance of
    the projected geodesic (error probed at the geodesic midpoint)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)

    out = [a]

    def rec(p, q, depth):
        m = p + q
        nm = np.linalg.norm(m)
        if nm < 1e-14:
            raise ValueError("antipodal edge cannot be tessellated")
        m = m / nm
        # projected midpoint of the straight (projected) segment
        pp, pq, pm = _project_latlng(p), _project_latlng(q), _project_latlng(m)
        dlng = pq[1] - pp[1]
        if dlng > np.pi:
            dlng -= 2 * np.pi
        if dlng < -np.pi:
            dlng += 2 * np.pi
        seg_mid = np.array([0.5 * (pp[0] + pq[0]), pp[1] + 0.5 * dlng])
        dlat = pm[0] - seg_mid[0]
        dmid = pm[1] - seg_mid[1]
        if dmid > np.pi:
            dmid -= 2 * np.pi
        if dmid < -np.pi:
            dmid += 2 * np.pi
        # projected error (radians, lat/lng metric at this latitude)
        err = np.hypot(dlat, dmid * np.cos(pm[0]))
        if err <= tolerance_rad or depth >= max_depth:
            out.append(q)
            return
        rec(p, m, depth + 1)
        rec(m, q, depth + 1)

    rec(a, b, 0)
    return np.array(out)


def dtw_alignment(a: np.ndarray, b: np.ndarray):
    """Exact dynamic-time-warping vertex alignment of two polylines
    (s2polyline_alignment.cc ExactVertexAlignment): monotone path through
    the (len(a) x len(b)) squared-chord cost matrix, steps right/down/
    diagonal. Returns (total_cost, path list of (i, j))."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    na, nb = a.shape[0], b.shape[0]
    cost = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)  # (na, nb)
    dp = np.full((na, nb), np.inf)
    dp[0, 0] = cost[0, 0]
    for i in range(na):
        for j in range(nb):
            if i == 0 and j == 0:
                continue
            best = np.inf
            if i > 0:
                best = min(best, dp[i - 1, j])
            if j > 0:
                best = min(best, dp[i, j - 1])
            if i > 0 and j > 0:
                best = min(best, dp[i - 1, j - 1])
            dp[i, j] = cost[i, j] + best
    # backtrack
    path = [(na - 1, nb - 1)]
    i, j = na - 1, nb - 1
    while (i, j) != (0, 0):
        cands = []
        if i > 0 and j > 0:
            cands.append((dp[i - 1, j - 1], (i - 1, j - 1)))
        if i > 0:
            cands.append((dp[i - 1, j], (i - 1, j)))
        if j > 0:
            cands.append((dp[i, j - 1], (i, j - 1)))
        _, (i, j) = min(cands, key=lambda t: t[0])
        path.append((i, j))
    path.reverse()
    return float(dp[na - 1, nb - 1]), path


def buffer_loop(vertices: np.ndarray, radius_rad: float,
                max_cells: int = 256) -> list[np.ndarray]:
    """Grid-quantized buffer of a loop (S2BufferOperation semantics at
    cell precision): covering of the loop, ring-expanded by the radius,
    boundary reconstructed. Conservative superset of the exact buffer;
    boundary within ~one cell width (the expansion level) of the exact
    offset curve."""
    from . import loops as lps
    from . import metrics

    lp = lps.PreparedLoop(np.asarray(vertices, dtype=np.float64))
    level = int(
        metrics.level_for_min_value(
            metrics.MIN_WIDTH_DERIV, np.array([radius_rad])
        )[0]
    )
    cov = coverer.get_covering(
        lp, max_cells=max_cells, min_level=0, max_level=level
    )
    grown = cellunion.expand_by_radius(cov, radius_rad)
    # union_boundary_loops denormalizes mixed-level unions internally
    return rastervec.union_boundary_loops(grown)


def clip_polyline_to_loop(vertices: np.ndarray, loop_verts: np.ndarray):
    """Split a polyline at its crossings with a loop and keep the INSIDE
    chains (S2CrossingEdgeQuery + clipping use; route-vs-boundary).

    Returns list of (m, 3) chains lying inside the loop (SEMI_OPEN
    membership for the non-crossing parts; crossing points computed with
    edges.get_intersection). General position (polyline vertices not on
    the boundary; degenerate touches raise via the exact predicates)."""
    from . import loops as lps

    v = np.asarray(vertices, dtype=np.float64)
    lp = lps.PreparedLoop(np.asarray(loop_verts, dtype=np.float64))
    c = lp.edge_c
    d = lp.edge_d
    n_seg = v.shape[0] - 1
    inside_v = lp.contains_points(v)
    chains = []
    cur = [v[0]] if inside_v[0] else None
    for s in range(n_seg):
        a, b = v[s], v[s + 1]
        sign = ek.crossing_signs_pairs(
            np.broadcast_to(a, c.shape), np.broadcast_to(b, c.shape), c, d
        )
        if (sign == 0).any():
            raise ValueError("polyline touches the loop boundary degenerately")
        hits = np.nonzero(sign == 1)[0]
        if len(hits):
            pts = ek.get_intersection(
                np.broadcast_to(a, (len(hits), 3)),
                np.broadcast_to(b, (len(hits), 3)),
                c[hits],
                d[hits],
            )
            order = np.argsort([float(np.arctan2(
                np.linalg.norm(np.cross(a, x)), float(a @ x))) for x in pts])
            pts = pts[order]
        else:
            pts = np.empty((0, 3))
        state = cur is not None
        for x in pts:
            if state:
                cur.append(x)
                chains.append(np.array(cur))
                cur = None
            else:
                cur = [x]
            state = not state
        if state:
            cur.append(v[s + 1])
    if cur is not None and len(cur) >= 2:
        chains.append(np.array(cur))
    return chains
