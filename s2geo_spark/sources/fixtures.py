"""Shared fixture constants for the driver-contract queries.

The same cap / polygon / parameter constants feed BOTH the Spark query and
the DuckDB oracle SQL so results are comparable bit-for-bit. Geometry is
chosen to overlap the deterministic point derivations in sources/geo.py.
"""

from __future__ import annotations

import numpy as np

from s2geo_spark.kernel import loops, regions

# --- caps: (cap_id, lat, lon, radius_deg) ---------------------------------
CAPS = [
    (0, 40.0, -74.0, 12.0),
    (1, -25.0, 135.0, 20.0),
    (2, 70.0, 20.0, 8.0),
]


def cap_constants():
    """[(cap_id, cx, cy, cz, chord2)] as plain floats for SQL inlining."""
    out = []
    for cap_id, lat, lon, r in CAPS:
        cap = regions.Cap.from_latlng_radius_degrees(lat, lon, r)
        out.append(
            (cap_id, float(cap.center[0]), float(cap.center[1]), float(cap.center[2]), cap.length2)
        )
    return out


# --- convex polygons (CCW quads) for the PIP join -------------------------
PIP_POLYGONS = {
    1: "30:-90, 30:-60, 50:-60, 50:-90",   # North-America-ish box
    2: "-40:100, -40:140, -10:140, -10:100",  # Australia-ish box
    3: "40:-10, 40:30, 65:30, 65:-10",     # Europe-ish box
}


def pip_loops() -> dict[int, np.ndarray]:
    return {pid: loops.parse_loop_text(t) for pid, t in PIP_POLYGONS.items()}


def convex_edge_normals(pid: int):
    """For the oracle: inward normals w_k = v_k x v_{k+1} of the CCW loop —
    point strictly inside <=> w_k . p > 0 for all k."""
    vs = pip_loops()[pid]
    d = np.roll(vs, -1, axis=0)
    w = np.cross(vs, d)
    return [tuple(float(c) for c in row) for row in w]


# --- large convex polygons (regular k-gons) for the shape-index path -------
# (lat, lon, radius_deg, n_vertices): big enough that the per-cell edge
# clipping (max 16 edges/cell) matters — the index subdivides to dozens of
# boundary cells instead of testing all k edges per candidate.
LARGE_POLYGONS = {
    10: (40.0, -100.0, 9.0, 512),
    11: (-25.0, 135.0, 10.0, 1024),
}


def large_pip_loops() -> dict[int, np.ndarray]:
    return {
        pid: loops.make_regular_loop(la, lo, r, k)
        for pid, (la, lo, r, k) in LARGE_POLYGONS.items()
    }


def large_convex_edge_normals(pid: int):
    vs = large_pip_loops()[pid]
    d = np.roll(vs, -1, axis=0)
    w = np.cross(vs, d)
    return [tuple(float(c) for c in row) for row in w]


# --- rects: (rect_id, lat_lo, lat_hi, lng_lo, lng_hi) ----------------------
RECTS = [
    (0, 30.0, 55.0, -10.0, 40.0),
    (1, -40.0, 5.0, -80.0, -30.0),
]

KNN_K = 3
QUAD_LEVEL = 8      # quad-key rollup level (face, i>>22, j>>22)
TILE_LEVEL = 10


# --- overlapping convex quad pairs for the boolean-operation query ---------
BOOL_PAIRS = {
    0: ("10:-40, 10:-10, 35:-10, 35:-40", "20:-25, 20:5, 45:5, 45:-25"),
    1: ("-30:100, -30:130, -5:130, -5:100", "-20:115, -20:145, 5:145, 5:115"),
}

BOOL_OPS = ["intersection", "union", "difference"]


def bool_pair_loops(pair_id: int):
    a_txt, b_txt = BOOL_PAIRS[pair_id]
    return loops.parse_loop_text(a_txt), loops.parse_loop_text(b_txt)


def bool_pair_edge_normals(pair_id: int):
    """Inward normals of both CCW quads (for the half-space SQL oracle)."""
    out = []
    for vs in bool_pair_loops(pair_id):
        d = np.roll(vs, -1, axis=0)
        w = np.cross(vs, d)
        out.append([tuple(float(c) for c in row) for row in w])
    return out


# --- DEGENERATE quad pairs for the snap/overlay boolean query --------------
# pair 0: full shared border on the lng=-10 meridian — the admin-boundary
#         case (both layers carry the border with bitwise-equal vertices);
# pair 1: PARTIAL collinear overlap on the equator (z = sin(0.0) = 0.0 is
#         exact in the lat/lng -> xyz conversion, so the vertex-on-edge
#         incidences are exact and kernel/overlay.py resolves them exactly).
DEGEN_PAIRS = {
    0: ("10:-40, 10:-10, 35:-10, 35:-40", "10:-10, 10:20, 35:20, 35:-10"),
    1: ("-25:60, -25:85, 0:85, 0:60", "0:70, 0:95, 20:95, 20:70"),
}


def degen_pair_loops(pair_id: int):
    a_txt, b_txt = DEGEN_PAIRS[pair_id]
    return loops.parse_loop_text(a_txt), loops.parse_loop_text(b_txt)


def degen_pair_edge_normals(pair_id: int):
    out = []
    for vs in degen_pair_loops(pair_id):
        d = np.roll(vs, -1, axis=0)
        w = np.cross(vs, d)
        out.append([tuple(float(c) for c in row) for row in w])
    return out


# --- buffer-operation fixture (convex 8-gon, exact offset oracle) ----------
BUFFER_POLY = (20.0, 30.0, 6.0, 8)   # lat, lon, radius_deg, n_vertices
BUFFER_RADIUS_DEG = 3.0


def buffer_poly_loop() -> np.ndarray:
    lat, lon, rad, n = BUFFER_POLY
    return loops.make_regular_loop(lat, lon, rad, n)


def buffer_oracle_terms():
    """Per-edge constants for the SQL distance oracle: point-to-edge
    spherical distance d_i expressible as scalar arithmetic on (x,y,z):

      interior foot  iff p.c1 > 0 AND p.c2 > 0   (c1 = n x u, c2 = v x n)
      d_i = asin(|p.n| / |n|)         when interior
          = least(acos(p.u), acos(p.v)) otherwise
    """
    vs = buffer_poly_loop()
    nxt = np.roll(vs, -1, axis=0)
    out = []
    for u, v in zip(vs, nxt):
        n = np.cross(u, v)
        out.append(
            {
                "n": tuple(float(t) for t in n),
                "norm_n": float(np.linalg.norm(n)),
                "c1": tuple(float(t) for t in np.cross(n, u)),
                "c2": tuple(float(t) for t in np.cross(v, n)),
                "u": tuple(float(t) for t in u),
                "v": tuple(float(t) for t in v),
            }
        )
    return out
