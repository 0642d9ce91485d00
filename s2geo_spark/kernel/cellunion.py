"""S2CellUnion algebra on sorted uint64 arrays.

Semantics anchors: Normalize (merge 4 siblings -> parent, drop contained)
src/s2/s2cell_union.cc:167-193; Denormalize src/s2/s2cell_union.cc:200-229;
Contains/Intersects binary search src/s2/s2cell_union.cc:281-341;
Expand src/s2/s2cell_union.cc:450-480. These power the per-region paths
(coverings are <= ~32 cells); the *relational* versions used in joins are
expressed as DataFrame ops in s2geo_spark.operators.
"""

from __future__ import annotations

import numpy as np

from . import cellid_v1 as v1

_U1 = np.uint64(1)


def sort_unsigned(ids: np.ndarray) -> np.ndarray:
    return np.sort(np.asarray(ids, dtype=np.uint64))


_MASK64 = (1 << 64) - 1


def _are_siblings(a: int, b: int, c: int, d: int) -> bool:
    """AreSiblings (s2cell_union.cc:120-139): XOR of the four ids is zero and
    the bits above the child-position pair agree; face cells excluded."""
    if (a ^ b ^ c) != d:
        return False
    lsb = d & (~d + 1) & _MASK64
    mask = (lsb << 1) & _MASK64
    mask = ~(mask + ((mask << 1) & _MASK64)) & _MASK64
    d_masked = d & mask
    return (
        (a & mask) == d_masked
        and (b & mask) == d_masked
        and (c & mask) == d_masked
        and lsb != (1 << 60)  # !d.is_face()
    )


def normalize(ids: np.ndarray) -> np.ndarray:
    """Sort, drop contained, pop swallowed, merge complete sibling quadruples
    (s2cell_union.cc:167-193)."""
    ids = sort_unsigned(ids)
    out: list[int] = []
    for cid in (int(x) for x in ids):
        # skip if contained by the previous output cell
        if out and bool(
            v1.contains(np.array([out[-1]], dtype=np.uint64), np.uint64(cid))[0]
        ):
            continue
        # discard previous cells contained by this one
        while out and bool(
            v1.contains(np.array([cid], dtype=np.uint64), np.uint64(out[-1]))[0]
        ):
            out.pop()
        # collapse complete sibling quadruples into the parent
        while len(out) >= 3 and _are_siblings(out[-3], out[-2], out[-1], cid):
            cid = int(v1.parent1(np.array([cid], dtype=np.uint64))[0])
            out = out[:-3]
        out.append(cid)
    return np.array(out, dtype=np.uint64)


def denormalize(ids: np.ndarray, min_level: int, level_mod: int) -> np.ndarray:
    """Re-expand to the (min_level, level_mod) grid (s2cell_union.cc:200-229)."""
    result: list[np.ndarray] = []
    ids = np.asarray(ids, dtype=np.uint64)
    levels = v1.level(ids)
    for cid, lvl in zip(ids, levels):
        new_level = max(min_level, int(lvl))
        if level_mod > 1:
            new_level += (v1.MAX_LEVEL - (new_level - min_level)) % level_mod
            new_level = min(v1.MAX_LEVEL, new_level)
        if new_level == lvl:
            result.append(np.array([cid], dtype=np.uint64))
        else:
            begin = v1.child_begin(np.array([cid]), new_level)[0]
            end = v1.child_end(np.array([cid]), new_level)[0]
            step = v1.lsb_for_level(np.array([new_level]))[0] << _U1
            count = int((end - begin) // step)
            result.append(begin + step * np.arange(count, dtype=np.uint64))
    return (
        np.concatenate(result) if result else np.array([], dtype=np.uint64)
    )


def contains_id(union_ids: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """Vectorized: does the (normalized, sorted) union contain each target cell?"""
    union_ids = np.asarray(union_ids, dtype=np.uint64)
    targets = np.asarray(targets, dtype=np.uint64)
    if union_ids.size == 0:
        return np.zeros(targets.shape, dtype=bool)
    rmins = v1.range_min(union_ids)
    rmaxs = v1.range_max(union_ids)
    t_min = v1.range_min(targets)
    t_max = v1.range_max(targets)
    # candidate = last union cell with range_min <= target range_min
    idx = np.searchsorted(rmins, t_min, side="right") - 1
    ok = idx >= 0
    idx = np.maximum(idx, 0)
    return ok & (t_max <= rmaxs[idx])


def intersects_id(union_ids: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """Does the union intersect each target cell? (range overlap search)."""
    union_ids = np.asarray(union_ids, dtype=np.uint64)
    targets = np.asarray(targets, dtype=np.uint64)
    if union_ids.size == 0:
        return np.zeros(targets.shape, dtype=bool)
    rmins = v1.range_min(union_ids)
    rmaxs = v1.range_max(union_ids)
    t_min = v1.range_min(targets)
    t_max = v1.range_max(targets)
    # any union cell with range_min <= t_max and range_max >= t_min
    idx = np.searchsorted(rmins, t_max, side="right") - 1
    ok = idx >= 0
    idx = np.maximum(idx, 0)
    return ok & (rmaxs[idx] >= t_min)


def difference(a_ids: np.ndarray, b_ids: np.ndarray) -> np.ndarray:
    """Cells covering A \\ B, by recursive subdivision of partially-covered
    cells (s2cell_union.cc:420-448 GetDifferenceInternal)."""
    a_ids = np.asarray(a_ids, dtype=np.uint64)
    b_ids = sort_unsigned(b_ids)
    out: list[np.uint64] = []

    def rec(cid: np.uint64):
        arr = np.array([cid], dtype=np.uint64)
        if not intersects_id(b_ids, arr)[0]:
            out.append(cid)
            return
        if contains_id(b_ids, arr)[0]:
            return
        if bool(v1.is_leaf(arr)[0]):
            # unreachable for valid unions: a leaf that intersects b is
            # contained by b (no cell is finer than a leaf)
            return
        for pos in range(4):
            rec(v1.child(arr, np.array([pos]))[0])

    for cid in a_ids:
        rec(np.uint64(cid))
    return normalize(np.array(out, dtype=np.uint64)) if out else np.array([], dtype=np.uint64)


def expand_by_level(ids: np.ndarray, expand_level: int) -> np.ndarray:
    """Add all neighbors at expand_level of every boundary cell, then
    normalize (s2cell_union.cc:450-466). Cells coarser than expand_level are
    first denormalized to it."""
    ids = np.asarray(ids, dtype=np.uint64)
    levels = v1.level(ids)
    # cells finer than expand_level are replaced by their expand_level parent
    # (s2cell_union.cc Expand: if id.lsb() < level_lsb -> parent)
    ring_src = np.where(levels > expand_level, v1.parent(ids, expand_level), ids)
    parts = [ring_src]
    src_levels = np.minimum(levels, expand_level)
    for lv in np.unique(src_levels):
        group = ring_src[src_levels == lv]
        rings = v1.append_all_neighbors(group, expand_level)
        parts.append(rings.ravel())
    return normalize(np.concatenate(parts))


def expand_by_radius(ids: np.ndarray, radius_rad: float,
                     max_level_diff: int = 8) -> np.ndarray:
    """Expand a union by a spherical distance (S2CellUnion::Expand(S1Angle,
    max_level_diff), s2cell_union.cc:468-480): pick the expansion level as
    min(finest-that-still-covers-radius, min_level + max_level_diff), then
    ring-expand at that level. Using a too-coarse level never under-covers
    (the ring at a coarser level covers strictly more)."""
    from . import metrics

    ids = np.asarray(ids, dtype=np.uint64)
    if ids.size == 0:
        return ids
    min_level = int(v1.level(ids).min())
    radius_level = int(
        metrics.level_for_min_value(metrics.MIN_WIDTH_DERIV,
                                    np.array([radius_rad]))[0]
    )
    if radius_level == 0 and radius_rad > metrics.metric_value(
        metrics.MIN_WIDTH_DERIV, 0
    ):
        # radius wider than any level-0 cell: one extra level-0 ring first,
        # mirroring s2cell_union.cc:474-478 — a single level-0 expansion
        # would under-cover (ADVICE r2)
        ids = expand_by_level(ids, 0)
    level = min(min_level + max_level_diff, radius_level)
    return expand_by_level(ids, level)


def leaf_cells_covered(ids: np.ndarray) -> int:
    """Total number of leaf cells covered (S2CellUnion::LeafCellsCovered,
    s2cell_union.cc:482-489). Max 6*4^30 fits in uint64."""
    ids = np.asarray(ids, dtype=np.uint64)
    if ids.size == 0:
        return 0
    lv = v1.level(ids).astype(np.uint64)
    return int(
        (np.uint64(1) << (np.uint64(2) * (np.uint64(30) - lv))).sum(dtype=np.uint64)
    )


def average_based_area(ids: np.ndarray) -> float:
    """Area assuming every cell has the average area for its level
    (S2CellUnion::AverageBasedArea, s2cell_union.cc:491-496): exact
    AVG_AREA metric times leaf count."""
    from . import metrics

    return metrics.metric_value(
        metrics.AVG_AREA_DERIV, 30, dim=2
    ) * leaf_cells_covered(ids)


def exact_area(ids: np.ndarray) -> float:
    """Sum of the cells' exact (Girard) areas
    (S2CellUnion::ExactArea / S2Cell::ExactArea, s2cell_union.cc:503-509)."""
    from . import cells as cl

    ids = np.asarray(ids, dtype=np.uint64)
    if ids.size == 0:
        return 0.0
    return float(cl.exact_area(ids).sum())
