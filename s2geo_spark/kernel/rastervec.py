"""Raster -> vector: cell unions to boundary polygons.

Reconstructs the boundary loops of a same-level cell union (the raster
grid case — fixed-level tile sets; mixed-level unions are denormalized
first). Counterpart of the reference's region -> covering direction;
SURVEY §2.3's "cells -> boundary polygons" row.

Algorithm: every cell contributes its 4 CCW-directed boundary edges;
an edge shared by two union cells appears twice with opposite direction
and cancels (detected by an undirected corner-key count — adjacent
same-level cells on one face share bit-identical float vertices, and
cross-face duplicates are unified by quantized keys). The surviving
directed edges stitch into closed loops; holes come out CW and are
reversed to CCW with XOR-nesting semantics
(booleanop.region_contains_points / region_area compose them).

Corner-pinch configurations (two cells touching only at a corner) are
resolved deterministically (smallest end-key first) — both resolutions
describe the same point set.
"""

from __future__ import annotations

import numpy as np

from . import cellid_v1 as v1
from . import cells as cl
from . import cellunion
from . import measures


def _key(p: np.ndarray) -> tuple:
    return (round(float(p[0]), 12), round(float(p[1]), 12), round(float(p[2]), 12))


def union_boundary_loops(ids: np.ndarray, max_cells_after_denorm: int = 200_000):
    """Normalized cell union -> list of CCW boundary loops ((m, 3) arrays).

    Mixed-level unions are denormalized to their finest level first (an
    explicit error if that would exceed max_cells_after_denorm)."""
    ids = np.asarray(ids, dtype=np.uint64)
    if ids.size == 0:
        return []
    levels = v1.level(ids)
    top = int(levels.max())
    if (levels != top).any():
        est = int((4 ** (top - levels)).sum())
        if est > max_cells_after_denorm:
            raise ValueError(
                f"denormalizing to level {top} would produce ~{est} cells"
            )
        ids = cellunion.denormalize(ids, top, 1)
    verts = cl.vertices(ids)  # (n, 4, 3), CCW
    # undirected edge counts
    counts: dict = {}
    for c in range(verts.shape[0]):
        for k in range(4):
            a = _key(verts[c, k])
            b = _key(verts[c, (k + 1) & 3])
            und = (a, b) if a <= b else (b, a)
            counts[und] = counts.get(und, 0) + 1
    # surviving directed edges, grouped by start key
    outgoing: dict = {}
    for c in range(verts.shape[0]):
        for k in range(4):
            pa = verts[c, k]
            pb = verts[c, (k + 1) & 3]
            a, b = _key(pa), _key(pb)
            und = (a, b) if a <= b else (b, a)
            if counts[und] == 1:
                outgoing.setdefault(a, []).append((b, pa, pb))
    for lst in outgoing.values():
        lst.sort(key=lambda e: e[0])
    loops_out = []
    while outgoing:
        start = min(outgoing)
        pts = []
        node = start
        while True:
            edges_here = outgoing[node]
            b, pa, _pb = edges_here.pop(0)
            if not edges_here:
                del outgoing[node]
            pts.append(pa)
            node = b
            if node == start:
                break
            if node not in outgoing:
                raise ValueError("open boundary chain (non-manifold input)")
        loop = np.array(pts)
        # holes come out CW; normalize to CCW (XOR nesting at the caller)
        if measures.loop_area(loop) > 2.0 * np.pi:
            loop = loop[::-1]
        loops_out.append(loop)
    return loops_out
