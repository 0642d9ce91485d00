"""H3-style aperture-7 hexagonal indexing, vectorized NumPy.

Implemented from the PUBLIC H3 specification's published algorithms (Uber
H3: gnomonic projection onto icosahedron faces, Class II/III hex grids with
an asin(sqrt(3/28)) rotation per resolution, cube-coordinate hex rounding,
aperture-7 parent/child digit extraction, 64-bit index layout with mode /
resolution / base / 3-bit digits). H3 is NOT part of the reference repo —
see SURVEY.md §2.1 — the requirement comes from BASELINE.json's north_star.

Faithful-structure notes:
  * The 20 icosahedron face centers are derived from a canonical icosahedron
    (vertices (0, ±1, ±φ) cyclic, normalized) rather than H3's Dymaxion
    orientation constants, and each face roots its own hierarchy (base cell
    = face) instead of the 122-base-cell layout. Grid geometry (aperture-7,
    Class II/III rotations, hex shapes, areas) matches the spec; absolute
    cell ids differ from libh3 by the fixed orientation. All operations are
    self-consistent and deterministic.
  * Cells are assigned to the nearest face center; k_ring neighbors are
    face-local (cross-face rings are truncated — pentagon distortion and
    cross-face IJK rotation are out of scope this round).

Index layout (64 bits, following the spec's field order):
    [1 reserved=0][4 mode=1][3 reserved=0][4 res][7 base(face)][15 x 3-bit
    digit, unused digits = 7]
"""

from __future__ import annotations

import numpy as np

MAX_RES = 15
MODE_HEX = 1

_PHI = (1.0 + np.sqrt(5.0)) / 2.0

# aperture-7 rotation (Class III): asin(sqrt(3/28)), public constant
M_AP7_ROT_RADS = np.arcsin(np.sqrt(3.0 / 28.0))
# gnomonic scaling of the res-0 unit hexagon: chosen so ONE res-0 hexagon
# covers a whole face patch (the Voronoi region of a face center extends to
# the icosahedron vertices, gnomonic radius tan(37.377 deg) ~= 0.7639; a
# unit hex has inradius 0.5, so 1.6 gives inradius 0.8 > 0.7639). The face
# IS the res-0 cell — 20 base patches instead of H3's 122 base cells.
RES0_U_GNOMONIC = 1.6
_SQRT7 = np.sqrt(7.0)
_SIN60 = np.sqrt(3.0) / 2.0


def _icosahedron_faces():
    """20 face centers + per-face orthonormal tangent bases."""
    phi = _PHI
    verts = []
    for a in (-1.0, 1.0):
        for b in (-phi, phi):
            verts += [(0, a, b), (a, b, 0), (b, 0, a)]
    verts = np.array(verts, dtype=np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    # faces = triples of mutually-nearest vertices: find all triangles with
    # pairwise distance == edge length (min nonzero pairwise distance)
    d2 = ((verts[:, None, :] - verts[None, :, :]) ** 2).sum(-1)
    edge2 = np.min(d2[d2 > 1e-9])
    tris = []
    nv = len(verts)
    for i in range(nv):
        for j in range(i + 1, nv):
            if abs(d2[i, j] - edge2) > 1e-9:
                continue
            for k in range(j + 1, nv):
                if (
                    abs(d2[i, k] - edge2) < 1e-9
                    and abs(d2[j, k] - edge2) < 1e-9
                ):
                    tris.append((i, j, k))
    assert len(tris) == 20, len(tris)
    centers = np.array(
        [verts[list(t)].mean(axis=0) for t in tris], dtype=np.float64
    )
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # deterministic face order: sort by (z, y, x) descending
    order = np.lexsort((centers[:, 0], centers[:, 1], -centers[:, 2]))
    centers = centers[order]
    # tangent basis per face: u toward the first vertex projection, v = c x u
    us = np.empty_like(centers)
    vs = np.empty_like(centers)
    for f in range(20):
        c = centers[f]
        ref = verts[tris[order[f]][0]]
        u = ref - ref.dot(c) * c
        u /= np.linalg.norm(u)
        us[f] = u
        vs[f] = np.cross(c, u)
    return centers, us, vs


FACE_CENTERS, FACE_U, FACE_V = _icosahedron_faces()


# ---------------------------------------------------------------------------
# geo <-> face 2d (gnomonic)
# ---------------------------------------------------------------------------

def _latlng_to_xyz(lat_deg, lon_deg):
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    cp = np.cos(phi)
    return np.stack([np.cos(lam) * cp, np.sin(lam) * cp, np.sin(phi)], axis=-1)


def _nearest_face(xyz):
    dots = xyz @ FACE_CENTERS.T  # (n, 20)
    return np.argmax(dots, axis=-1), dots


def _geo_to_hex2d(lat_deg, lon_deg, res):
    """lat/lng -> (face, x, y) on the face's gnomonic plane, scaled to the
    resolution's hex grid (Class III rotation applied for odd res)."""
    xyz = _latlng_to_xyz(lat_deg, lon_deg)
    face, dots = _nearest_face(xyz)
    c = FACE_CENTERS[face]
    d = np.clip((xyz * c).sum(-1), -1.0, 1.0)
    # gnomonic: project along the ray to the tangent plane at the center
    scale_to_plane = 1.0 / np.maximum(d, 1e-15)
    p = xyz * scale_to_plane[..., None] - c
    x = (p * FACE_U[face]).sum(-1)
    y = (p * FACE_V[face]).sum(-1)
    # per-resolution scaling and Class III rotation
    r = np.hypot(x, y) / RES0_U_GNOMONIC
    theta = np.arctan2(y, x)
    res = int(res)
    r = r * (_SQRT7 ** res)
    theta = theta - M_AP7_ROT_RADS * res
    return face, r * np.cos(theta), r * np.sin(theta)


def _hex2d_to_geo(face, x, y, res):
    """Inverse of _geo_to_hex2d."""
    res = int(res)
    r = np.hypot(x, y) / (_SQRT7 ** res)
    theta = np.arctan2(y, x) + M_AP7_ROT_RADS * res
    gx = r * RES0_U_GNOMONIC * np.cos(theta)
    gy = r * RES0_U_GNOMONIC * np.sin(theta)
    p = (
        FACE_CENTERS[face]
        + gx[..., None] * FACE_U[face]
        + gy[..., None] * FACE_V[face]
    )
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    lat = np.degrees(np.arcsin(np.clip(p[..., 2], -1, 1)))
    lon = np.degrees(np.arctan2(p[..., 1], p[..., 0]))
    return lat, lon


# ---------------------------------------------------------------------------
# hex2d <-> IJK (cube coordinates), the spec's rounding algorithm
# ---------------------------------------------------------------------------

def _hex2d_to_ijk(x, y):
    """Published H3 _hex2dToCoordIJK: cartesian -> nearest hex center in
    normalized IJK coordinates (k >= 0 normalization at the end)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    a1 = np.abs(x)
    a2 = np.abs(y)
    x2 = a2 / _SIN60
    x1 = a1 + x2 / 2.0

    # Cell centers sit exactly on the rounding-region boundaries (r1, r2 in
    # {0, 0.5}); float noise from the geo round-trip (~1e-12 relative) would
    # flip floor() across the boundary. Snap near-integers first — the snap
    # window is far below half a cell, so only knife-edge ties move.
    def _snap(v):
        r = np.rint(v)
        tol = np.maximum(np.abs(v), 1.0) * 1e-11
        return np.where(np.abs(v - r) <= tol, r, v)

    x1 = _snap(x1)
    x2 = _snap(x2)
    m1 = np.floor(x1).astype(np.int64)
    m2 = np.floor(x2).astype(np.int64)
    r1 = x1 - m1
    r2 = x2 - m2

    # --- direct transliteration of the published rounding regions ---
    i = np.zeros_like(m1)
    j = np.zeros_like(m2)
    # region A: r1 < 0.5
    a_lo = r1 < 1.0 / 3.0
    i = np.where(a_lo & (r2 < (1.0 + r1) / 2.0), m1, i)
    j = np.where(a_lo & (r2 < (1.0 + r1) / 2.0), m2, j)
    i = np.where(a_lo & ~(r2 < (1.0 + r1) / 2.0), m1, i)
    j = np.where(a_lo & ~(r2 < (1.0 + r1) / 2.0), m2 + 1, j)
    a_hi = (r1 >= 1.0 / 3.0) & (r1 < 0.5)
    i = np.where(a_hi & (r2 < 1.0 - r1), m1, i)
    j = np.where(a_hi & (r2 < 1.0 - r1), m2, j)
    i = np.where(a_hi & (r2 >= 2.0 * r1 - 0.5) & ~(r2 < 1.0 - r1), m1, i)
    j = np.where(a_hi & (r2 >= 2.0 * r1 - 0.5) & ~(r2 < 1.0 - r1), m2 + 1, j)
    i = np.where(a_hi & ~(r2 >= 2.0 * r1 - 0.5) & ~(r2 < 1.0 - r1), m1 + 1, i)
    j = np.where(a_hi & ~(r2 >= 2.0 * r1 - 0.5) & ~(r2 < 1.0 - r1), m2, j)
    # region B: r1 >= 0.5
    b_lo = (r1 >= 0.5) & (r1 < 2.0 / 3.0)
    i = np.where(b_lo & (r2 < 1.0 - r1), m1, i)
    j = np.where(b_lo & (r2 < 1.0 - r1), m2, j)
    i = np.where(b_lo & (2.0 * r1 - 1.0 < r2) & ~(r2 < 1.0 - r1), m1, i)
    j = np.where(b_lo & (2.0 * r1 - 1.0 < r2) & ~(r2 < 1.0 - r1), m2 + 1, j)
    i = np.where(b_lo & ~(2.0 * r1 - 1.0 < r2) & ~(r2 < 1.0 - r1), m1 + 1, i)
    j = np.where(b_lo & ~(2.0 * r1 - 1.0 < r2) & ~(r2 < 1.0 - r1), m2, j)
    b_hi = r1 >= 2.0 / 3.0
    i = np.where(b_hi & (r2 < (r1 + 1.0) / 2.0), m1 + 1, i)
    j = np.where(b_hi & (r2 < (r1 + 1.0) / 2.0), m2, j)
    i = np.where(b_hi & ~(r2 < (r1 + 1.0) / 2.0), m1 + 1, i)
    j = np.where(b_hi & ~(r2 < (r1 + 1.0) / 2.0), m2 + 1, j)

    # fold negative axes back (published algorithm):
    # x<0, even j: i = 2*(j/2) - i ; odd j: i = 2*((j+1)/2) - i - 1
    neg_x = x < 0.0
    odd_j = (j % 2) == 1
    diff = np.where(odd_j, i - (j + 1) // 2, i - j // 2)
    i = np.where(neg_x, np.where(odd_j, i - (2 * diff + 1), i - 2 * diff), i)
    neg_y = y < 0.0
    i = np.where(neg_y, i - (2 * j + 1) // 2, i)
    j = np.where(neg_y, -j, j)
    # to IJK with k = 0 then normalize to non-negative
    k = np.zeros_like(i)
    return _ijk_normalize(i, j, k)


def _ijk_normalize(i, j, k):
    """Shift so min(i,j,k) == 0 (hex cube coords are translation-invariant
    along (1,1,1))."""
    m = np.minimum(np.minimum(i, j), k)
    return i - m, j - m, k - m


def _ijk_to_hex2d(i, j, k):
    """Center of an IJK cell on the grid plane (inverse of rounding)."""
    i = np.asarray(i, dtype=np.float64) - np.asarray(k, dtype=np.float64)
    j = np.asarray(j, dtype=np.float64) - np.asarray(k, dtype=np.float64)
    x = i - 0.5 * j
    y = j * _SIN60
    return x, y


# unit IJK vector per digit 0..6 (center + 6 neighbors), spec order
_UNIT_IJK = np.array(
    [
        [0, 0, 0],  # 0 CENTER
        [0, 0, 1],  # 1 K
        [0, 1, 0],  # 2 J
        [0, 1, 1],  # 3 JK
        [1, 0, 0],  # 4 I
        [1, 0, 1],  # 5 IK
        [1, 1, 0],  # 6 IJ
    ],
    dtype=np.int64,
)


def _digit_from_unit(i, j, k):
    """(i,j,k) in {0,1}^3 normalized -> digit 0..6; anything else -> 7
    (no silent clipping — out-of-range offsets must surface as invalid)."""
    in_range = (i >= 0) & (i <= 1) & (j >= 0) & (j <= 1) & (k >= 0) & (k <= 1)
    code = ((i & 1) << 2) | ((j & 1) << 1) | (k & 1)
    lut = np.full(8, 7, dtype=np.int64)
    for d, (ui, uj, uk) in enumerate(_UNIT_IJK):
        lut[(ui << 2) | (uj << 1) | uk] = d
    return np.where(in_range, lut[code], 7)


def _up_ap7(i, j, k, class_iii):
    """Aperture-7 parent (published _upAp7 / _upAp7r): axial coords,
    rounded. class_iii selects the counter-rotated variant."""
    a = (i - k).astype(np.float64)
    b = (j - k).astype(np.float64)
    if class_iii:
        ni = np.round((3.0 * a - b) / 7.0).astype(np.int64)
        nj = np.round((a + 2.0 * b) / 7.0).astype(np.int64)
    else:
        ni = np.round((2.0 * a + b) / 7.0).astype(np.int64)
        nj = np.round((3.0 * b - a) / 7.0).astype(np.int64)
    return _ijk_normalize(ni, nj, np.zeros_like(ni))


def _down_ap7(i, j, k, class_iii):
    """Aperture-7 center child — the exact integer inverse of _up_ap7:
    up uses M/7 with M = [[3,-1],[1,2]] (det 7), so down is M^-1 * 7 =
    [[2,1],[-1,3]] (and the transposed pair for the other rotation)."""
    a = i - k
    b = j - k
    if class_iii:
        ni = 2 * a + b
        nj = -a + 3 * b
    else:
        ni = 3 * a - b
        nj = a + 2 * b
    return _ijk_normalize(ni, nj, np.zeros_like(ni))


def _neighbor_ijk(i, j, k, digit):
    """Move one cell in the direction of `digit` (same res)."""
    d = _UNIT_IJK[digit]
    return _ijk_normalize(i + d[..., 0], j + d[..., 1], k + d[..., 2])


# ---------------------------------------------------------------------------
# index packing
# ---------------------------------------------------------------------------

def _pack(face, res, digits, root_digit=None):
    """face (n,), res int, digits (n, res) -> uint64 indexes.

    root_digit (0..6) occupies the 3 bits between mode and res: ~0.05% of
    points chain up to a res-0 cell that is a unit neighbor of the face
    origin ("children stick out" in aperture-7); the root digit keeps the
    index lossless."""
    n = face.shape[0]
    out = np.zeros(n, dtype=np.uint64)
    out |= np.uint64(MODE_HEX) << np.uint64(59)
    if root_digit is not None:
        out |= root_digit.astype(np.uint64) << np.uint64(56)
    out |= np.uint64(res) << np.uint64(52)
    out |= face.astype(np.uint64) << np.uint64(45)
    digit_field = np.full(n, 0, dtype=np.uint64)
    for r in range(1, MAX_RES + 1):
        if r <= res:
            d = digits[:, r - 1].astype(np.uint64)
        else:
            d = np.full(n, 7, dtype=np.uint64)
        digit_field |= d << np.uint64(3 * (MAX_RES - r))
    return out | digit_field


def get_resolution(h):
    return ((np.asarray(h, dtype=np.uint64) >> np.uint64(52)) & np.uint64(0xF)).astype(
        np.int64
    )


def get_root_digit(h):
    return ((np.asarray(h, dtype=np.uint64) >> np.uint64(56)) & np.uint64(7)).astype(
        np.int64
    )


def get_base(h):
    return ((np.asarray(h, dtype=np.uint64) >> np.uint64(45)) & np.uint64(0x7F)).astype(
        np.int64
    )


def get_digit(h, r):
    """Digit at res r (1-based)."""
    return (
        (np.asarray(h, dtype=np.uint64) >> np.uint64(3 * (MAX_RES - r)))
        & np.uint64(7)
    ).astype(np.int64)


def is_valid(h):
    h = np.asarray(h, dtype=np.uint64)
    mode_ok = ((h >> np.uint64(59)) & np.uint64(0xF)) == np.uint64(MODE_HEX)
    top_ok = (h >> np.uint64(63)) == np.uint64(0)
    res = get_resolution(h)
    base_ok = get_base(h) < 20
    root_ok = get_root_digit(h) < 7
    ok = mode_ok & top_ok & (res <= MAX_RES) & base_ok & root_ok
    for r in range(1, MAX_RES + 1):
        d = get_digit(h, r)
        ok &= np.where(r <= res, d < 7, d == 7)
    return ok


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def geo_to_h3(lat_deg, lon_deg, res: int):
    """(lat, lng) degrees -> hex index at resolution res."""
    lat_deg = np.asarray(lat_deg, dtype=np.float64)
    res = int(res)
    face, x, y = _geo_to_hex2d(lat_deg, lon_deg, res)
    i, j, k = _hex2d_to_ijk(x, y)
    n = face.shape[0] if face.ndim else 1
    digits = np.zeros((n, max(res, 1)), dtype=np.int64)
    ci, cj, ck = i, j, k
    for r in range(res, 0, -1):
        pi, pj, pk = _up_ap7(ci, cj, ck, True)
        # center child of the parent back at res r
        di, dj, dk = _down_ap7(pi, pj, pk, True)
        off_i, off_j, off_k = _ijk_normalize(ci - di, cj - dj, ck - dk)
        digits[:, r - 1] = _digit_from_unit(off_i, off_j, off_k)
        ci, cj, ck = pi, pj, pk
    if res == 0:
        digits = digits[:, :0]
    root = _digit_from_unit(*_ijk_normalize(ci, cj, ck))
    if np.any(root == 7):
        raise ValueError("point chained beyond the unit root ring")
    return _pack(np.atleast_1d(face), res, digits, root)


def h3_to_ijk(h):
    """Index -> (face, res, i, j, k) by descending the digit path."""
    h = np.asarray(h, dtype=np.uint64)
    res = int(get_resolution(h[:1])[0]) if h.size else 0
    face = get_base(h)
    n = h.shape[0]
    root = _UNIT_IJK[get_root_digit(h)]
    i = root[:, 0].copy()
    j = root[:, 1].copy()
    k = root[:, 2].copy()
    for r in range(1, res + 1):
        i, j, k = _down_ap7(i, j, k, True)
        d = get_digit(h, r)
        u = _UNIT_IJK[d]
        i, j, k = _ijk_normalize(i + u[:, 0], j + u[:, 1], k + u[:, 2])
    return face, res, i, j, k


def h3_to_geo(h):
    """Index -> center (lat, lng) degrees."""
    face, res, i, j, k = h3_to_ijk(h)
    x, y = _ijk_to_hex2d(i, j, k)
    return _hex2d_to_geo(face, x, y, res)


def h3_to_parent(h, parent_res: int):
    """Truncate the digit path."""
    h = np.asarray(h, dtype=np.uint64)
    res = get_resolution(h)
    parent_res = int(parent_res)
    out = h.copy()
    # set res field
    out &= ~(np.uint64(0xF) << np.uint64(52))
    out |= np.uint64(parent_res) << np.uint64(52)
    # blank digits beyond parent_res
    for r in range(parent_res + 1, MAX_RES + 1):
        out |= np.uint64(7) << np.uint64(3 * (MAX_RES - r))
    return np.where(res < parent_res, h, out)


def h3_to_center_child(h, child_res: int):
    """Center child at child_res (digit 0 path)."""
    h = np.asarray(h, dtype=np.uint64)
    res = get_resolution(h)
    child_res = int(child_res)
    out = h.copy()
    out &= ~(np.uint64(0xF) << np.uint64(52))
    out |= np.uint64(child_res) << np.uint64(52)
    for r in range(1, MAX_RES + 1):
        if r > child_res:
            continue
        mask = np.uint64(7) << np.uint64(3 * (MAX_RES - r))
        # digits past the original res become 0 (center)
        clear = res < r
        out = np.where(clear, out & ~mask, out)
    return np.where(res > child_res, h, out)


def k_ring(h, k: int):
    """All cells within hex-grid distance k (face-local).

    Returns (n, m) uint64 with m = 1 + 3k(k+1); cells whose IJK path would
    leave the face keep face-local coordinates (documented limitation).
    """
    h = np.asarray(h, dtype=np.uint64)
    face, res, i, j, k0 = h3_to_ijk(h)
    # hex offsets within distance k in axial coords
    offsets = []
    for di in range(-k, k + 1):
        for dj in range(max(-k, -di - k), min(k, -di + k) + 1):
            offsets.append((di, dj))
    out = np.empty((h.shape[0], len(offsets)), dtype=np.uint64)
    a = i - k0
    b = j - k0
    for idx, (di, dj) in enumerate(offsets):
        ni, nj, nk = _ijk_normalize(a + di, b + dj, np.zeros_like(a))
        out[:, idx] = _pack_from_ijk(face, res, ni, nj, nk)
    return out


def _pack_from_ijk(face, res, i, j, k):
    """(face, res, ijk) -> index via digit extraction (shared with encode)."""
    n = face.shape[0]
    digits = np.zeros((n, max(res, 1)), dtype=np.int64)
    ci, cj, ck = i, j, k
    for r in range(res, 0, -1):
        pi, pj, pk = _up_ap7(ci, cj, ck, True)
        di_, dj_, dk_ = _down_ap7(pi, pj, pk, True)
        off = _ijk_normalize(ci - di_, cj - dj_, ck - dk_)
        digits[:, r - 1] = _digit_from_unit(*off)
        ci, cj, ck = pi, pj, pk
    if res == 0:
        digits = digits[:, :0]
    root = _digit_from_unit(*_ijk_normalize(ci, cj, ck))
    return _pack(face, res, digits, np.where(root == 7, 0, root))
