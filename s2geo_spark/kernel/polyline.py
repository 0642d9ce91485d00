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


def simplify_polyline(
    vertices: np.ndarray, tolerance_rad: float, return_indices: bool = False
):
    """Greedy subsample: keep the first vertex, then repeatedly extend the
    current edge as far as possible while every skipped vertex stays
    within tolerance (chord) of it. return_indices yields the kept
    vertex indices instead of the vertices (for integer oracles)."""
    v = np.asarray(vertices, dtype=np.float64)
    n = v.shape[0]
    if n <= 2:
        return np.arange(n) if return_indices else v
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
    if return_indices:
        return np.asarray(keep, dtype=np.int64)
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


def _dtw_dp(cost: np.ndarray, strides: np.ndarray | None = None) -> np.ndarray:
    """Row-vectorized min-plus DTW table fill (optionally restricted to
    per-row column windows [start, end)). The recurrence
    dp[i,j] = cost[i,j] + min(dp[i-1,j], dp[i,j-1], dp[i-1,j-1]) unrolls
    along each row into dp[i,j] = P[j+1] + min_{k<=j} (u[k] - P[k]) with
    u[j] = min(dp[i-1,j], dp[i-1,j-1]) and P the row's cost prefix sum —
    a running minimum (np.minimum.accumulate), so each row is O(nb)
    NumPy work instead of a per-cell Python loop. In quantum mode every
    value is an integer-valued float64 (|sums| << 2^53), so this is
    bit-identical to the sequential formulation; out-of-window cells stay
    +inf exactly as the scalar windowed loop left them."""
    na, nb = cost.shape
    dp = np.full((na, nb), np.inf)
    pref = np.empty(nb + 1)
    u = np.empty(nb)
    for i in range(na):
        s, e = (
            (0, nb) if strides is None else (int(strides[i, 0]), int(strides[i, 1]))
        )
        if e <= s:
            continue
        pref[0] = 0.0
        np.cumsum(cost[i, :e], out=pref[1 : e + 1])
        if i == 0:
            u[0] = 0.0  # virtual predecessor of (0, 0)
            u[1:e] = np.inf
        else:
            up = dp[i - 1]
            u[:e] = up[:e]
            np.minimum(up[1:e], up[: e - 1], out=u[1:e])
        seg = u[s:e] - pref[s:e]
        np.minimum.accumulate(seg, out=seg)
        dp[i, s:e] = pref[s + 1 : e + 1] + seg
    return dp


def dtw_alignment(a: np.ndarray, b: np.ndarray, cost_quantum: float | None = None):
    """Exact dynamic-time-warping vertex alignment of two polylines
    (s2polyline_alignment.cc ExactVertexAlignment): monotone path through
    the (len(a) x len(b)) squared-chord cost matrix, steps right/down/
    diagonal. Returns (total_cost, path list of (i, j)).

    cost_quantum quantizes each cell cost to integer QUANTUM COUNTS
    (round half-up) before the DP, and the returned total is in those
    quantum units — NOT chord-squared; multiply by cost_quantum to
    recover (ADVICE r3 low). Integer min-plus is association-free, so an
    independently-ordered implementation (e.g. a SQL oracle's prefix-sum
    formulation, which also consumes quantum counts) reproduces the
    total exactly."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    na, nb = a.shape[0], b.shape[0]
    cost = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)  # (na, nb)
    if cost_quantum is not None:
        # half-up (costs are non-negative), matching SQL round()
        cost = np.floor(cost / cost_quantum + 0.5)
    dp = _dtw_dp(cost)
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


def _window_from_path(path, rows: int, cols: int) -> np.ndarray:
    """Warp path -> per-row column strides [start, end) (the reference's
    Window(WarpPath) constructor, s2polyline_alignment.cc:51-77)."""
    strides = np.zeros((rows, 2), dtype=np.int64)
    prev_row = 0
    stride_start = 0
    stride_stop = 0
    for i, j in path:
        if i > prev_row:
            strides[prev_row] = (stride_start, stride_stop)
            stride_start = j
            prev_row = i
        stride_stop = j + 1
    strides[rows - 1] = (stride_start, stride_stop)
    return strides


def _upsample_window(strides: np.ndarray, new_rows: int, new_cols: int) -> np.ndarray:
    """Window::Upsample (s2polyline_alignment.cc:80-92), same rounding."""
    rows = strides.shape[0]
    cols = int(strides[-1, 1])
    row_scale = new_rows / rows
    col_scale = new_cols / cols
    out = np.zeros((new_rows, 2), dtype=np.int64)
    for row in range(new_rows):
        src = strides[int((row + 0.5) / row_scale)]
        out[row] = (int(col_scale * src[0] + 0.5), int(col_scale * src[1] + 0.5))
    return out


def _dilate_window(strides: np.ndarray, radius: int) -> np.ndarray:
    """Window::Dilate (s2polyline_alignment.cc:102-112)."""
    rows = strides.shape[0]
    cols = int(strides[-1, 1])
    out = np.zeros_like(strides)
    for row in range(rows):
        prev_row = max(0, row - radius)
        next_row = min(row + radius, rows - 1)
        out[row] = (
            max(0, int(strides[prev_row, 0]) - radius),
            min(int(strides[next_row, 1]) + radius, cols),
        )
    return out


def _windowed_dtw(a, b, strides, cost_quantum):
    """DTW restricted to a column-stride window; identical recurrence and
    diag>up>left tie-break as dtw_alignment (full window == exact — tests
    pin it). Returns (total_cost, path)."""
    na, nb = a.shape[0], b.shape[0]
    cost = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    if cost_quantum is not None:
        cost = np.floor(cost / cost_quantum + 0.5)
    dp = _dtw_dp(cost, strides)
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


def approx_dtw_alignment(
    a: np.ndarray,
    b: np.ndarray,
    radius: int | None = None,
    cost_quantum: float | None = None,
):
    """FastDTW approximate vertex alignment (GetApproxVertexAlignment,
    src/s2/s2polyline_alignment.h:139-156, .cc:304-341; Salvador & Chan):
    recursively halve both polylines, align at the coarse level, then
    solve the fine level restricted to the projected warp path's window
    upsampled and dilated by `radius`. O(max(A,B)) cells instead of
    O(A*B) — the path that makes long-trace alignment usable at scale.

    Same switchover constants as the reference (exact below 32 vertices
    or when the window would cover >= 85% of the table, so small inputs
    return the exact answer bit-for-bit). radius defaults to
    max(len)^0.25. Costs/quantum semantics identical to dtw_alignment."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    na, nb = a.shape[0], b.shape[0]
    if radius is None:
        radius = int(max(na, nb) ** 0.25)
    # reference switchover points (s2polyline_alignment.cc:308-328)
    if na - radius < 32 or nb - radius < 32:
        return dtw_alignment(a, b, cost_quantum=cost_quantum)
    if max(na, nb) * (2 * radius + 1) > na * nb * 0.85:
        return dtw_alignment(a, b, cost_quantum=cost_quantum)
    a_half = a[::2]
    b_half = b[::2]
    _, proj = approx_dtw_alignment(a_half, b_half, radius, cost_quantum)
    strides = _window_from_path(proj, a_half.shape[0], b_half.shape[0])
    strides = _dilate_window(_upsample_window(strides, na, nb), radius)
    return _windowed_dtw(a, b, strides, cost_quantum)


def medoid_polyline(
    lines: list,
    approx: bool = True,
    cost_quantum: float | None = None,
    return_costs: bool = False,
):
    """Index of the polyline minimizing summed alignment cost to all the
    others (GetMedoidPolyline, src/s2/s2polyline_alignment.h:83-87,
    .cc:351-368): lower-triangle pairwise costs mirrored across the
    diagonal, lowest index on ties. With return_costs, also returns the
    per-line summed-cost list (so callers don't re-run the N-1
    alignments the selection already computed)."""
    n = len(lines)
    if n == 0:
        raise ValueError("empty polyline collection")
    costs = [0.0] * n
    for i in range(n):
        for j in range(i + 1, n):
            if approx:
                c, _ = approx_dtw_alignment(
                    lines[i], lines[j], cost_quantum=cost_quantum
                )
            else:
                c, _ = dtw_alignment(lines[i], lines[j], cost_quantum=cost_quantum)
            costs[i] += c
            costs[j] += c
    med = int(np.argmin(costs))  # argmin returns the FIRST minimum
    return (med, costs) if return_costs else med


def consensus_polyline(
    lines: list,
    approx: bool = True,
    seed_medoid: bool = False,
    iteration_cap: int = 5,
) -> np.ndarray:
    """Dynamic Timewarp Barycenter Averaging consensus
    (GetConsensusPolyline, src/s2/s2polyline_alignment.h:90-156,
    .cc:383-430; Petitjean et al.): seed with the first line (or the
    medoid), then iteratively align the consensus to every input, sum
    the matched vertices per consensus index, and renormalize to the
    unit sphere; stop on convergence or at iteration_cap. The result
    keeps the seed's vertex count."""
    n = len(lines)
    if n == 0:
        raise ValueError("empty polyline collection")
    seed = medoid_polyline(lines, approx=approx) if seed_medoid else 0
    consensus = np.array(lines[seed], dtype=np.float64, copy=True)
    nc = consensus.shape[0]
    align = approx_dtw_alignment if approx else dtw_alignment
    for _ in range(iteration_cap):
        acc = np.zeros((nc, 3))
        for line in lines:
            _, path = align(consensus, np.asarray(line, dtype=np.float64))
            for ci, pi in path:
                acc[ci] += line[pi]
        acc /= np.linalg.norm(acc, axis=1, keepdims=True)
        if np.array_equal(acc, consensus):
            break
        consensus = acc
    return consensus


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


def buffer_loop_exact(vertices: np.ndarray, radius_rad: float,
                      max_error: float = 1e-6) -> list[np.ndarray]:
    """Offset-curve buffer (S2BufferOperation, s2buffer_operation.cc:771
    semantics): every boundary point moves exactly `radius_rad` outward
    along the surface normal of its edge, with ROUND JOINS (arcs of the
    vertex cap) between consecutive edges — tessellated so the emitted
    polyline stays within `max_error` radians of the true offset curve,
    which is the reference's arc-tolerance model.

    radius_rad > 0 grows the region, < 0 shrinks it. Returns the buffered
    region as a list of CCW loops ([] when shrinking annihilates it).
    Radii beyond the local feature size (trimmed curve fails or
    self-intersects) resolve through the winding arrangement of the RAW
    join-everywhere offset curve — grow = non_zero winding, shrink = the
    zero-winding side of the reversed curve — so regions that split into
    several components or annihilate entirely come out exact as well. The
    only failure mode left is a buffer covering (nearly) the whole sphere,
    which has no provably-outside anchor point and raises."""
    from . import loops as lps
    from . import measures as m
    from .booleanop import clean_chain, loop_is_simple
    from .predicates import sign as _sign

    v = np.asarray(vertices, dtype=np.float64)
    n = v.shape[0]
    r = abs(float(radius_rad))
    if r == 0.0:
        return [v.copy()]
    outward = radius_rad > 0
    cr, sr = np.cos(r), np.sin(r)
    s_off = -sr if outward else sr  # q . axis = s_off on the offset curve
    # step so the sampled chord stays within max_error of the arc
    # (sagitta <= step^2/8 for a unit-radius circle — conservative)
    step = np.sqrt(8.0 * max_error)
    nxt = np.roll(v, -1, axis=0)
    axes = np.cross(v, nxt)
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)  # interior side

    def offset(p, ax):
        q = cr * p + s_off * ax
        return q / np.linalg.norm(q)

    def offset_interior(ax, q0, q1):
        """Interior samples of the OFFSET SMALL CIRCLE (q . ax = s_off)
        from q0 to q1, azimuth increasing around ax (the edge's travel
        direction). Sampling the great circle between the endpoint offsets
        instead would sag off the true offset by ~edge_angle^2*tan(r)/8,
        far beyond max_error for long edges."""
        e1 = q0 - float(q0 @ ax) * ax
        e1 /= np.linalg.norm(e1)
        e2 = np.cross(ax, e1)
        phi1 = float(np.arctan2(q1 @ e2, q1 @ e1))
        if phi1 < 0:
            phi1 += 2.0 * np.pi
        k = int(np.ceil(phi1 / step))
        out = []
        for t in range(1, k):
            phi = phi1 * t / k
            q = s_off * ax + cr * (np.cos(phi) * e1 + np.sin(phi) * e2)
            out.append(q / np.linalg.norm(q))
        return out

    def join_arc(w, ax1, ax2):
        """Round-join samples: points of the radius-r circle around w,
        swept by rotating the offset normal from ax1 to ax2 within w's
        normal plane (NOT the geodesic between the endpoints, which cuts
        the vertex cap at sharp turns). Includes the final endpoint."""
        ang = np.arccos(float(np.clip(ax1 @ ax2, -1.0, 1.0)))
        if ang < 1e-12:
            return []
        # the swept curve is a small circle of 3D radius sin(r); INTERIOR
        # samples only — the neighboring edges supply the endpoints (a
        # re-normalized duplicate endpoint differs by 1 ulp and poisons
        # the turn-angle area sum downstream)
        k = max(1, int(np.ceil(ang / (step / max(sr, 1e-300) ** 0.5))))
        out = []
        sin_ang = np.sin(ang)
        for t in range(1, k):
            s = t / k
            mt = (np.sin((1 - s) * ang) * ax1 + np.sin(s * ang) * ax2) / sin_ang
            mt /= np.linalg.norm(mt)
            q = cr * w + s_off * mt
            out.append(q / np.linalg.norm(q))
        return out

    def offset_arc_intersection(ax1, ax2, near):
        """Intersection of the two offset small circles q.ax1 = q.ax2 =
        s_off nearest to `near` (the trim point at an opposite-turn
        vertex). None when the circles miss."""
        g = float(ax1 @ ax2)
        denom = 1.0 + g
        if abs(denom) < 1e-14:
            return None
        alpha = s_off / denom
        cx = np.cross(ax1, ax2)
        c2 = float(cx @ cx)
        if c2 < 1e-28:
            return None
        base = alpha * (ax1 + ax2)
        g2 = 1.0 - float(base @ base)
        if g2 < 0.0:
            return None
        gamma = np.sqrt(g2 / c2)
        q1, q2 = base + gamma * cx, base - gamma * cx
        return q1 if float(q1 @ near) >= float(q2 @ near) else q2

    def azimuth(q, ax, start):
        """Angle of q around ax measured from `start` (both ~on the
        offset circle); in (-pi, pi]."""
        e1 = start - float(start @ ax) * ax
        e1 /= np.linalg.norm(e1)
        e2 = np.cross(ax, e1)
        return float(np.arctan2(q @ e2, q @ e1))

    from .predicates import sign as _sign

    def build_chain(trim: bool):
        """The offset polyline. trim=True: round joins at same-turn
        vertices, exact trims at opposite turns (the fast path; returns
        None when a trim fails or consumes a whole edge). trim=False: the
        RAW curve — round joins at EVERY vertex, never trimmed (possibly
        self-intersecting; the winding fallback resolves it)."""
        joins = [None] * n   # samples inserted after edge i
        end_clip = [None] * n
        start_clip = [None] * n
        for i in range(n):
            j = (i + 1) % n
            u, w, x = v[i], nxt[i], nxt[j]
            turn = _sign(tuple(u), tuple(w), tuple(x))
            if turn == 0:
                continue
            wants_join = (turn > 0) if outward else (turn < 0)
            if wants_join or not trim:
                joins[i] = (w, axes[i], axes[j])
            else:
                xv = offset_arc_intersection(axes[i], axes[j], w)
                if xv is None:
                    return None
                end_clip[i] = xv
                start_clip[j] = xv
        pts = []
        for i in range(n):
            u, w, ax = v[i], nxt[i], axes[i]
            q0 = offset(u, ax) if start_clip[i] is None else start_clip[i]
            q1 = offset(w, ax) if end_clip[i] is None else end_clip[i]
            if trim and azimuth(q1, ax, offset(u, ax)) < azimuth(
                q0, ax, offset(u, ax)
            ) - 1e-15:
                return None  # trim consumed the whole edge
            pts.append(q0)
            pts.extend(offset_interior(ax, q0, q1))
            pts.append(q1)
            if joins[i] is not None:
                pts.extend(join_arc(*joins[i]))
        return clean_chain(np.asarray(pts))

    raw = build_chain(trim=True)
    if raw is not None and len(raw) >= 3 and loop_is_simple(raw):
        area = m.loop_area(raw)
        if not outward and area > 2.0 * np.pi:
            return []  # shrink annihilated the region (curve inverted)
        return [raw]

    # GLOBAL fallback (round 3): when |radius| exceeds the local feature
    # size the trimmed curve fails or self-intersects; resolve the RAW
    # (join-everywhere) curve with the winding arrangement instead —
    # grow = non_zero side of the raw curve, shrink = ZERO-winding side of
    # the reversed raw curve (the Clipper offset-resolution scheme on the
    # sphere). Exact to the same tessellation tolerance; handles regions
    # that split into several components or annihilate entirely.
    from . import edges as ek
    from . import overlay

    raw2 = build_chain(trim=False)
    if raw2 is None or len(raw2) < 3:
        return []
    lp = lps.PreparedLoop(v)
    anchor = None
    golden = 0.6180339887498949
    for k in range(1, 256):
        zc = 2.0 * ((k * golden) % 1.0) - 1.0
        th = 2.0 * np.pi * ((k * golden * golden) % 1.0)
        rad = np.sqrt(max(0.0, 1.0 - zc * zc))
        q = np.array([rad * np.cos(th), rad * np.sin(th), zc])
        if bool(lp.contains_points(q[None, :])[0]):
            continue
        d2 = float(ek.point_edge_chord2(q[None, :], v, nxt).min())
        if 2.0 * np.arcsin(min(1.0, np.sqrt(d2) / 2.0)) > r + 0.05:
            anchor = q
            break
    if anchor is None:
        raise ValueError(
            "buffer covers (nearly) the whole sphere: no anchor point "
            "provably outside it"
        )
    if outward:
        res = overlay.winding_operation(
            [raw2], "non_zero", ref_point=anchor, ref_winding=0
        )
    else:
        res = overlay.winding_operation(
            [raw2[::-1].copy()], "zero", ref_point=anchor, ref_winding=1
        )

    # Sphere-specific guard: past (total) annihilation the edges' offset
    # small circles re-converge on the far side of the region into a
    # spurious "core" face whose winding does not encode the distance
    # truth (great circles, unlike lines, meet again). Validate every
    # result component against the EXACT distance semantics at its
    # centroid probe and drop mismatches (the spurious core is an
    # intersection of half-spaces — convex — so the centroid is interior).
    def truth(p):
        ins = bool(lp.contains_points(p[None, :])[0])
        d2 = float(ek.point_edge_chord2(p[None, :], v, nxt).min())
        d = 2.0 * np.arcsin(min(1.0, np.sqrt(d2) / 2.0))
        return (ins or d <= r) if outward else (ins and d >= r)

    def xor_member(loop_set, p):
        got = False
        for l in loop_set:
            got ^= bool(
                lps.PreparedLoop(l)._contains_points_semi_open(p[None, :])[0]
            )
        return got

    kept_res = list(res)
    for l in list(kept_res):
        c = l.mean(axis=0)
        c /= np.linalg.norm(c)
        if not bool(lps.PreparedLoop(l)._contains_points_semi_open(c[None, :])[0]):
            continue  # non-star component: probe unusable, keep the loop
        if xor_member(kept_res, c) != truth(c):
            kept_res.remove(l)
    return kept_res


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
