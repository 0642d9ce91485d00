"""S2RegionCoverer: region -> canonical cell covering.

Faithful reimplementation of the priority-queue refinement algorithm
(src/s2/s2region_coverer.cc:90-331):

  * seed candidates from the region's cell-union bound (GetFastCovering)
  * refine the "worst" cell first — priority by (level, num_children,
    num_terminals) (s2region_coverer.cc:174-186)
  * a candidate is terminal when it is contained by the region or cannot be
    subdivided further within max_level (NewCandidate, :90-111)
  * optimization: 4 terminal children collapse to the parent (:163-171)
  * final Normalize + optional Denormalize (:292-303)

Defaults match the reference: max_cells=8 (s2region_coverer.h:106).

This is a *per-region* computation (bounded by max_cells*4 heap ops, inner
predicates NumPy-vectorized over 4 children at a time); the Spark layer maps
it over polygon/region batches via applyInPandas (SURVEY.md §3.2).
"""

from __future__ import annotations

import heapq
import itertools

import numpy as np

from . import cellid_v1 as v1
from . import cellunion

MAX_CELLS_DEFAULT = 8
_FACE_IDS = np.array([(2 * f + 1) << 60 for f in range(6)], dtype=np.uint64)


def _children(cell_id: np.uint64) -> np.ndarray:
    base = np.repeat(np.array([cell_id], dtype=np.uint64), 4)
    return v1.child(base, np.arange(4))


def get_covering(
    region,
    max_cells: int = MAX_CELLS_DEFAULT,
    min_level: int = 0,
    max_level: int = v1.MAX_LEVEL,
    level_mod: int = 1,
    interior: bool = False,
) -> np.ndarray:
    """Covering (or interior covering) of a region, sorted uint64 cell ids."""
    result: list[np.uint64] = []
    pq: list = []  # entries: (priority, tiebreak, cell_id, children, n_term)
    counter = itertools.count()

    def true_max_level() -> int:
        if level_mod == 1:
            return max_level
        return max_level - (max_level - min_level) % level_mod

    def new_candidates_batch(cells: np.ndarray):
        """Batched NewCandidate (:90-111) over same-level cells.
        Returns (list of (cell_id, is_terminal), num_terminals)."""
        cells = np.asarray(cells, dtype=np.uint64)
        if cells.size == 0:
            return [], 0
        mi = region.may_intersect_cells(cells)
        cells = cells[mi]
        if cells.size == 0:
            return [], 0
        lvl = int(v1.level(cells[:1])[0])
        out, n_term = [], 0
        if lvl < min_level:
            return [(c, False) for c in cells], 0
        if not interior and lvl + level_mod > max_level:
            return [(c, True) for c in cells], len(cells)
        contained = region.contains_cells(cells)
        for c, inside in zip(cells, contained):
            if interior:
                if inside:
                    out.append((c, True))
                    n_term += 1
                elif lvl + level_mod <= max_level:
                    out.append((c, False))
            else:
                terminal = inside or (lvl + level_mod > max_level)
                out.append((c, terminal))
                n_term += int(terminal)
        return out, n_term

    def new_candidate(cell_id: np.uint64):
        cands, _ = new_candidates_batch(np.array([cell_id], dtype=np.uint64))
        return cands[0] if cands else None

    def expand_children(cell_id: np.uint64, num_levels: int):
        """-> (children list of (id, is_terminal), num_terminals)."""
        num_levels -= 1
        kids = _children(cell_id)
        if num_levels > 0:
            out, n_term = [], 0
            hit = region.may_intersect_cells(kids)
            for k, ok in zip(kids, hit):
                if ok:
                    sub, sub_term = expand_children(k, num_levels)
                    out.extend(sub)
                    n_term += sub_term
            return out, n_term
        return new_candidates_batch(kids)

    def add_candidate(cand):
        if cand is None:
            return
        cell_id, is_terminal = cand
        if is_terminal:
            result.append(cell_id)
            return
        lvl = int(v1.level(np.array([cell_id], dtype=np.uint64))[0])
        num_levels = 1 if lvl < min_level else level_mod
        children, n_term = expand_children(cell_id, num_levels)
        if not children:
            return
        if (
            not interior
            and n_term == 4 ** level_mod
            and lvl >= min_level
        ):
            # all children terminal -> emit the parent instead (:163-171)
            result.append(cell_id)
            return
        priority = -(
            ((lvl << (2 * level_mod)) + len(children) << (2 * level_mod))
            + n_term
        )
        heapq.heappush(pq, (priority, next(counter), cell_id, children))

    # --- seed (GetInitialCandidates, :212-224) ---
    seeds = np.asarray(region.cell_union_bound(), dtype=np.uint64)
    seeds = cellunion.normalize(seeds)
    # clamp seed levels into the level grid (AdjustCellLevels)
    if level_mod > 1 and min_level > 0:
        lv = v1.level(seeds)
        adj = lv - np.where(lv > min_level, (lv - min_level) % level_mod, 0)
        seeds = np.unique(np.where(adj < lv, v1.parent(seeds, adj), seeds))
    for s in seeds:
        add_candidate(new_candidate(np.uint64(s)))

    # --- main loop (GetCoveringInternal, :226-283) ---
    while pq and (not interior or len(result) < max_cells):
        _, _, cell_id, children = heapq.heappop(pq)
        lvl = int(v1.level(np.array([cell_id], dtype=np.uint64))[0])
        if (
            interior
            or lvl < min_level
            or len(children) == 1
            or len(result) + len(pq) + len(children) <= max_cells
        ):
            for ch in children:
                if interior and len(result) >= max_cells:
                    break
                add_candidate(ch)
        else:
            result.append(cell_id)

    out = cellunion.normalize(np.array(result, dtype=np.uint64))
    if min_level > 0 or level_mod > 1:
        out = cellunion.denormalize(out, min_level, level_mod)
    return out


def is_canonical(
    ids: np.ndarray,
    max_cells: int = MAX_CELLS_DEFAULT,
    min_level: int = 0,
    max_level: int = v1.MAX_LEVEL,
    level_mod: int = 1,
) -> bool:
    """S2RegionCoverer::IsCanonicalCovering (s2region_coverer.cc:339-360):
    sorted, non-overlapping, level constraints satisfied, <= max_cells."""
    ids = np.asarray(ids, dtype=np.uint64)
    if ids.size > max_cells:
        return False
    if ids.size == 0:
        return True
    lv = v1.level(ids)
    if (lv < min_level).any() or (lv > max_level).any():
        return False
    if level_mod > 1 and (((lv - min_level) % level_mod) != 0).any():
        return False
    sk = cellunion.sort_unsigned(ids)
    if not (sk == ids).all():
        return False
    rmax = v1.range_max(ids[:-1])
    rmin = v1.range_min(ids[1:])
    return bool((rmax < rmin).all())


def canonicalize_covering(
    ids: np.ndarray,
    max_cells: int = MAX_CELLS_DEFAULT,
    min_level: int = 0,
    max_level: int = v1.MAX_LEVEL,
    level_mod: int = 1,
) -> np.ndarray:
    """Repair an arbitrary cell set into a canonical covering of a
    SUPERSET region (S2RegionCoverer::CanonicalizeCovering,
    s2region_coverer.cc:362-516): snap levels into [min_level ..
    max_level] / level_mod (by taking ancestors — never under-covers),
    normalize, then while over max_cells merge the adjacent pair whose
    common ancestor is DEEPEST (adds the least area), re-snapping after
    each merge."""
    ids = np.asarray(ids, dtype=np.uint64)
    if ids.size == 0:
        return ids

    def snap(arr):
        lv = v1.level(arr)
        target = np.minimum(lv, max_level)
        if level_mod > 1:
            target = min_level + ((target - min_level) // level_mod) * level_mod
        target = np.maximum(target, min_level)
        # cells coarser than min_level cannot be subdivided without
        # breaking the superset guarantee cheaply — denormalize them
        out = []
        for cid, l, t in zip(arr, lv, target):
            if l <= t:
                if l < min_level:
                    out.extend(
                        cellunion.denormalize(
                            np.array([cid], dtype=np.uint64), min_level, max(level_mod, 1)
                        )
                    )
                else:
                    out.append(cid)
            else:
                out.append(v1.parent(np.array([cid], dtype=np.uint64), int(t))[0])
        return np.array(out, dtype=np.uint64)

    cur = cellunion.normalize(snap(ids))
    while cur.size > max_cells:
        # merge the adjacent pair with the deepest common ancestor
        lv_anc = [
            int(v1.common_ancestor_level(cur[i : i + 1], cur[i + 1 : i + 2])[0])
            for i in range(cur.size - 1)
        ]
        best = int(np.argmax(lv_anc))
        anc_level = lv_anc[best]
        if level_mod > 1:
            anc_level = min_level + ((anc_level - min_level) // level_mod) * level_mod
        anc_level = max(min(anc_level, max_level), min_level)
        anc = v1.parent(cur[best : best + 1], anc_level)
        cur = cellunion.normalize(
            np.concatenate([cur[:best], anc, cur[best + 2 :]])
        )
        cur = cellunion.normalize(snap(cur))
    return cur


def simple_covering(region, start_lat: float, start_lon: float, level: int) -> np.ndarray:
    """Fixed-level BFS flood-fill covering (S2::GetSimpleCovering /
    FloodFill, s2region_coverer.cc:518-556): start from the cell containing
    the seed point, breadth-first over same-level neighbors, keep cells
    that may intersect the region."""
    import collections

    seed = v1.parent(
        v1.from_latlng(np.array([start_lat]), np.array([start_lon])), level
    )[0]
    seen = {int(seed)}
    queue = collections.deque([seed])
    out = []
    while queue:
        cid = queue.popleft()
        arr = np.array([cid], dtype=np.uint64)
        if not bool(region.may_intersect_cells(arr)[0]):
            continue
        out.append(cid)
        for nb in v1.append_all_neighbors(arr, level)[0]:
            if int(nb) not in seen:
                seen.add(int(nb))
                queue.append(np.uint64(nb))
    return cellunion.sort_unsigned(np.array(out, dtype=np.uint64))
