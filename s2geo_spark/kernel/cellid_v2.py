"""Fork "v2" S2 cell-id encoding — vectorized NumPy.

The reference fork re-defines the global ``S2CellId`` with a new layout
(src/s2/s2cell_id.h:30-43):

    [3-bit face][56-bit child path, 2 bits/level, right-justified][5-bit level]

max level 28 (kMaxLevel, s2cell_id.h:38). The special face-0/level-0 root
would encode to 0, so it is represented by the marker ``1 << 60``
(s2cell_id.h:106-116, 1044-1047). Ordering (operator<) delegates to the v1
Hilbert order (s2cell_id.h:846-849) — so the engine carries the v1 id as the
sort key and the v2 id as the exchange format.

Conversion insight (vectorized; the reference walks parent() per level,
s2cell_id.h:972-1039): in the v1 layout the child-position digits for levels
1..L are exactly bits [2*(30-L)+1, 61) of the id, most-significant digit
first. So

    path = (v1_id >> (2*(30-L)+1)) & ((1 << 2L) - 1)

and the inverse plants the path back and sets the trailing marker bit.
"""

from __future__ import annotations

import numpy as np

from . import cellid_v1 as v1

MAX_LEVEL = 28
FACE_BITS = 3
LEVEL_BITS = 5
PATH_BITS = 64 - FACE_BITS - LEVEL_BITS  # 56
LEVEL_MASK = np.uint64((1 << LEVEL_BITS) - 1)
FACE0_ROOT = np.uint64(1) << np.uint64(LEVEL_BITS + PATH_BITS - 1)  # 1 << 60

_U0 = np.uint64(0)
_U1 = np.uint64(1)


def from_v1(v1_id):
    """v1 id -> v2 id. Levels deeper than 28 truncate to the level-28
    ancestor first (s2cell_id.h:63-79). Invalid v1 (0) -> 0."""
    orig = np.asarray(v1_id, dtype=np.uint64)
    invalid = ~v1.is_valid(orig)
    # Compute on a sanitized copy (level() is undefined on id 0); mask at end.
    v1_id = np.where(invalid, np.uint64(1) << np.uint64(60), orig)
    lvl = v1.level(v1_id)
    deep = lvl > MAX_LEVEL
    if np.any(deep):
        v1_id = np.where(deep, v1.parent(v1_id, MAX_LEVEL), v1_id)
        lvl = np.where(deep, MAX_LEVEL, lvl)
    f = v1.face(v1_id).astype(np.uint64)
    shift = (2 * (v1.MAX_LEVEL - lvl) + 1).astype(np.uint64)
    path_mask = (_U1 << (2 * lvl).astype(np.uint64)) - _U1
    path = (v1_id >> shift) & path_mask
    out = (f << np.uint64(61)) | (path << np.uint64(LEVEL_BITS)) | lvl.astype(np.uint64)
    out = np.where(out == _U0, FACE0_ROOT, out)
    return np.where(invalid, _U0, out)


def to_v1(v2_id):
    """v2 id -> v1 id (inverse of :func:`from_v1`;
    reference ConvertToOldFormat, s2cell_id.h:1042-1090). Invalid -> 0."""
    v2_id = np.asarray(v2_id, dtype=np.uint64)
    lvl = level(v2_id)
    f = face(v2_id).astype(np.uint64)
    p = path(v2_id)
    shift = (2 * (v1.MAX_LEVEL - lvl) + 1).astype(np.uint64)
    out = (f << np.uint64(61)) | (p << shift) | (_U1 << (shift - _U1))
    return np.where(is_valid(v2_id), out, _U0)


def face(v2_id):
    """Top 3 bits (s2cell_id.h:265-278; the FACE0 marker maps to face 0)."""
    v2_id = np.asarray(v2_id, dtype=np.uint64)
    return np.where(v2_id == FACE0_ROOT, 0, (v2_id >> np.uint64(61)).astype(np.int64))


def level(v2_id):
    """Bottom 5 bits (s2cell_id.h:279-284; marker -> 0)."""
    v2_id = np.asarray(v2_id, dtype=np.uint64)
    return np.where(v2_id == FACE0_ROOT, 0, (v2_id & LEVEL_MASK).astype(np.int64))


def path(v2_id):
    """Child-position path, masked to 2*level bits (s2cell_id.h:286-302)."""
    v2_id = np.asarray(v2_id, dtype=np.uint64)
    lvl = level(v2_id)
    raw = (v2_id >> np.uint64(LEVEL_BITS)) & np.uint64((1 << PATH_BITS) - 1)
    mask = (_U1 << (2 * lvl).astype(np.uint64)) - _U1
    return np.where(lvl == 0, _U0, raw & mask)


def is_valid(v2_id):
    """face < 6, level <= 28, path high bits zero (s2cell_id.h:305-339)."""
    v2_id = np.asarray(v2_id, dtype=np.uint64)
    f = (v2_id >> np.uint64(61)).astype(np.int64)
    lvl = (v2_id & LEVEL_MASK).astype(np.int64)
    raw_path = (v2_id >> np.uint64(LEVEL_BITS)) & np.uint64((1 << PATH_BITS) - 1)
    used = (2 * lvl).astype(np.uint64)
    high_bits = np.where(
        lvl < MAX_LEVEL, raw_path & ~((_U1 << used) - _U1), _U0
    )
    ok = (v2_id != _U0) & (f < 6) & (lvl <= MAX_LEVEL) & (high_bits == _U0)
    return ok | (v2_id == FACE0_ROOT)


def parent(v2_id, target_level=None):
    """Immediate parent, or ancestor at target_level (s2cell_id.h:342-407),
    pure field arithmetic: drop 2-bit digits and decrement the level."""
    v2_id = np.asarray(v2_id, dtype=np.uint64)
    lvl = level(v2_id)
    if target_level is None:
        target = lvl - 1
    else:
        target = np.broadcast_to(np.asarray(target_level, dtype=np.int64), lvl.shape)
        target = np.minimum(target, lvl)
    f = face(v2_id).astype(np.uint64)
    drop = (2 * (lvl - target)).astype(np.uint64)
    new_path = path(v2_id) >> drop
    out = (
        (f << np.uint64(61))
        | (new_path << np.uint64(LEVEL_BITS))
        | np.maximum(target, 0).astype(np.uint64)
    )
    out = np.where(out == _U0, FACE0_ROOT, out)
    return np.where(target < 0, _U0, out)


def child(v2_id, position):
    """Append one 2-bit digit, increment level (s2cell_id.h:738-759)."""
    v2_id = np.asarray(v2_id, dtype=np.uint64)
    lvl = level(v2_id)
    f = face(v2_id).astype(np.uint64)
    pos = np.asarray(position, dtype=np.uint64)
    new_path = (path(v2_id) << np.uint64(2)) | pos
    out = (
        (f << np.uint64(61))
        | (new_path << np.uint64(LEVEL_BITS))
        | (lvl + 1).astype(np.uint64)
    )
    return np.where(lvl >= MAX_LEVEL, _U0, out)


def child_position(v2_id):
    """Last path digit (s2cell_id.h:737-745). Root -> -1."""
    lvl = level(v2_id)
    return np.where(lvl == 0, -1, (path(v2_id) & np.uint64(3)).astype(np.int64))


def to_string(v2_id):
    """"face/digits" debug strings (s2cell_id.h:762-784); invalid -> INVALID."""
    v2_id = np.asarray(v2_id, dtype=np.uint64)
    valid = is_valid(v2_id)
    f = face(v2_id)
    lvl = level(v2_id)
    p = path(v2_id)
    out = np.empty(v2_id.shape, dtype=object)
    flat_valid = valid.ravel()
    flat_f, flat_lvl, flat_p = f.ravel(), lvl.ravel(), p.ravel()
    flat_out = out.ravel()
    for idx in range(flat_out.shape[0]):
        if not flat_valid[idx]:
            flat_out[idx] = "INVALID"
            continue
        L = int(flat_lvl[idx])
        if L == 0:
            flat_out[idx] = str(int(flat_f[idx]))
        else:
            digits = "".join(
                str((int(flat_p[idx]) >> (2 * i)) & 3) for i in range(L - 1, -1, -1)
            )
            flat_out[idx] = f"{int(flat_f[idx])}/{digits}"
    return out


def from_string(strings):
    """Parse "face/digits" (s2cell_id.h:787-835). Invalid -> 0."""
    out = np.zeros(len(strings), dtype=np.uint64)
    for idx, s in enumerate(strings):
        if not s:
            continue
        head, _, digits = s.partition("/")
        try:
            f = int(head)
        except ValueError:
            continue
        if not (0 <= f <= 5) or len(digits) > MAX_LEVEL:
            continue
        if any(c not in "0123" for c in digits):
            continue
        L = len(digits)
        p = 0
        for c in digits:
            p = (p << 2) | int(c)
        val = (f << 61) | (p << LEVEL_BITS) | L
        out[idx] = np.uint64(val) if val != 0 else FACE0_ROOT
    return out


def to_token(v2_id):
    """Tokens delegate to the v1 hex token (s2cell_id.h:720-722)."""
    return v1.to_token(to_v1(v2_id))
