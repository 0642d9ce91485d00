"""Robust orientation predicates: float triage -> exact rational arithmetic
-> symbolic perturbation.

Transliterated semantics from the reference:
  * Sign/TriageSign with kMaxDetError = 3.6548 * DBL_EPSILON
    (src/s2/s2predicates.h:330-419, s2predicates.cc:43-58)
  * ExactSign: lexicographic sort with permutation sign, exact 3x3
    determinant (src/s2/s2predicates.cc:225-262). Python ints/Fractions play
    the role of ExactFloat (doubles are exact rationals).
  * SymbolicallyPerturbedSign: the Simulation-of-Simplicity sequence
    (src/s2/s2predicates.cc:130-222) — so Sign never returns 0 for distinct
    points, bit-for-bit with the reference's tie-breaks.
  * OrderedCCW (src/s2/s2predicates.cc:298-310)
  * RefDir = Ortho (src/s2/s2pointutil.h:120-123, util/math/vector.h:483-488)

The batched path lives in pip.py; these scalar functions serve the rare
|det| <= error residue (and tests).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

DBL_EPSILON = float(np.finfo(np.float64).eps)
MAX_DET_ERROR = 3.6548 * DBL_EPSILON


def triage_sign(a, b, c) -> int:
    """Float-only sign of det(a,b,c) = (a x b) . c; 0 = uncertain."""
    det = (
        (a[1] * b[2] - a[2] * b[1]) * c[0]
        + (a[2] * b[0] - a[0] * b[2]) * c[1]
        + (a[0] * b[1] - a[1] * b[0]) * c[2]
    )
    if det > MAX_DET_ERROR:
        return 1
    if det < -MAX_DET_ERROR:
        return -1
    return 0


def _exact_det(a, b, c) -> Fraction:
    fa = [Fraction(x) for x in a]
    fb = [Fraction(x) for x in b]
    fc = [Fraction(x) for x in c]
    return (
        fa[0] * (fb[1] * fc[2] - fb[2] * fc[1])
        - fa[1] * (fb[0] * fc[2] - fb[2] * fc[0])
        + fa[2] * (fb[0] * fc[1] - fb[1] * fc[0])
    )


def _sgn(x) -> int:
    return (x > 0) - (x < 0)


def _symbolically_perturbed_sign(a, b, c) -> int:
    """SoS tie-break sequence (s2predicates.cc:130-222).
    REQUIRES a < b < c lexicographically and exact det == 0."""
    fa = [Fraction(x) for x in a]
    fb = [Fraction(x) for x in b]
    fc = [Fraction(x) for x in c]
    bxc = [
        fb[1] * fc[2] - fb[2] * fc[1],
        fb[2] * fc[0] - fb[0] * fc[2],
        fb[0] * fc[1] - fb[1] * fc[0],
    ]
    for v in (bxc[2], bxc[1], bxc[0]):  # da[2], da[1], da[0]
        s = _sgn(v)
        if s:
            return s
    s = _sgn(fc[0] * fa[1] - fc[1] * fa[0])  # db[2]
    if s:
        return s
    s = _sgn(fc[0])  # db[2]*da[1]
    if s:
        return s
    s = -_sgn(fc[1])  # db[2]*da[0]
    if s:
        return s
    s = _sgn(fc[2] * fa[0] - fc[0] * fa[2])  # db[1]
    if s:
        return s
    s = _sgn(fc[2])  # db[1]*da[0]
    if s:
        return s
    s = _sgn(fa[0] * fb[1] - fa[1] * fb[0])  # dc[2]
    if s:
        return s
    s = -_sgn(fb[0])  # dc[2]*da[1]
    if s:
        return s
    s = _sgn(fb[1])  # dc[2]*da[0]
    if s:
        return s
    s = _sgn(fa[0])  # dc[2]*db[1]
    if s:
        return s
    return 1  # dc[2]*db[1]*da[0]


def exact_sign(a, b, c, perturb: bool = True) -> int:
    """ExactSign (s2predicates.cc:225-262). Points must be distinct tuples."""
    pts = [tuple(a), tuple(b), tuple(c)]
    perm_sign = 1
    if pts[0] > pts[1]:
        pts[0], pts[1] = pts[1], pts[0]
        perm_sign = -perm_sign
    if pts[1] > pts[2]:
        pts[1], pts[2] = pts[2], pts[1]
        perm_sign = -perm_sign
    if pts[0] > pts[1]:
        pts[0], pts[1] = pts[1], pts[0]
        perm_sign = -perm_sign
    det = _exact_det(*pts)
    det_sign = _sgn(det)
    if det_sign == 0 and perturb:
        det_sign = _symbolically_perturbed_sign(*pts)
    return perm_sign * det_sign


def sign(a, b, c) -> int:
    """Full robust sign: triage then exact+perturb (never 0 for distinct)."""
    s = triage_sign(a, b, c)
    if s != 0:
        return s
    ta, tb, tc = tuple(a), tuple(b), tuple(c)
    if ta == tb or tb == tc or tc == ta:
        return 0
    return exact_sign(ta, tb, tc, True)


def ortho(a):
    """Vector3::Ortho (util/math/vector.h:483-488): cross with the unit axis
    following the largest-abs component, normalized."""
    ax = np.abs(np.asarray(a, dtype=np.float64))
    largest = 0 if ax[0] > ax[1] and ax[0] > ax[2] else (1 if ax[1] > ax[2] else 2)
    k = largest - 1
    if k < 0:
        k = 2
    temp = np.zeros(3)
    temp[k] = 1.0
    out = np.cross(a, temp)
    return out / np.linalg.norm(out)


def ref_dir(a):
    """S2::RefDir = Ortho (s2pointutil.h:120-123)."""
    return ortho(a)


def ordered_ccw(a, b, c, o) -> bool:
    """OrderedCCW (s2predicates.cc:298-310): edges OA, OB, OC encountered in
    that order sweeping CCW around O."""
    total = 0
    if sign(b, o, a) >= 0:
        total += 1
    if sign(c, o, b) >= 0:
        total += 1
    if sign(a, o, c) > 0:
        total += 1
    return total >= 2


def angle_contains_vertex(a, b, c) -> bool:
    """S2::AngleContainsVertex(a,b,c) via the S2ContainsVertexQuery algorithm
    (s2contains_vertex_query.cc:30-49 with edges {a: incoming, c: outgoing}).
    REQUIRES a != b != c."""
    r = tuple(ref_dir(b))
    best_pt, best_sign = r, 0
    # btree_map iterates in lexicographic point order
    for pt, sgn_ in sorted([(tuple(a), -1), (tuple(c), +1)]):
        if ordered_ccw(r, best_pt, pt, b):
            best_pt, best_sign = pt, sgn_
    return best_sign > 0


def vertex_crossing(a, b, c, d) -> bool:
    """VertexCrossing (s2edge_crossings.cc:366-386): shared-vertex tie-break."""
    a, b, c, d = tuple(a), tuple(b), tuple(c), tuple(d)
    if a == b or c == d:
        return False
    if a == c:
        return (b == d) or ordered_ccw(ref_dir(a), d, b, a)
    if b == d:
        return ordered_ccw(ref_dir(b), c, a, b)
    if a == d:
        return (b == c) or ordered_ccw(ref_dir(a), c, b, a)
    if b == c:
        return ordered_ccw(ref_dir(b), d, a, b)
    return False


def crossing_sign(a, b, c, d) -> int:
    """CrossingSign (s2edge_crosser logic, s2edge_crosser.cc:40-110):
    +1 = interior crossing, 0 = shared vertex, -1 = no crossing."""
    a, b, c, d = tuple(a), tuple(b), tuple(c), tuple(d)
    if a == c or a == d or b == c or b == d:
        return 0
    if a == b or c == d:
        return -1
    acb = -sign(a, b, c)
    bda = sign(a, b, d)
    if bda != acb or acb == 0:
        return -1
    cbd = -sign(c, d, b)
    if cbd != acb:
        return -1
    dac = sign(c, d, a)
    return 1 if dac == acb else -1


def edge_or_vertex_crossing(a, b, c, d) -> bool:
    """EdgeOrVertexCrossing (s2edge_crossings.cc:410-416)."""
    crossing = crossing_sign(a, b, c, d)
    if crossing < 0:
        return False
    if crossing > 0:
        return True
    return vertex_crossing(a, b, c, d)
