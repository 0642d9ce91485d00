"""advance / distance_from_begin / common ancestor / maximum_tile
(reference semantics: s2cell_id_v1.cc:126-212)."""

import numpy as np

from s2geo_spark.kernel import cellid_v1 as v1

RNG = np.random.default_rng(4)


def _cells(n, level):
    v = RNG.normal(size=(3, n))
    v /= np.sqrt((v * v).sum(0))
    return v1.parent(v1.from_point(v[0], v[1], v[2]), level)


def test_advance_roundtrip_and_distance():
    cells = _cells(5000, 10)
    adv = v1.advance(cells, np.full(cells.shape, 5))
    assert (v1.advance(adv, np.full(cells.shape, -5)) == cells).all()
    d = v1.distance_from_begin(cells)
    assert (v1.distance_from_begin(adv) - d == 5).all()
    assert (v1.level(adv) == 10).all()


def test_advance_clamps_at_ends():
    f0 = np.array([(2 * 0 + 1) << 60], dtype=np.uint64)
    begin = v1.child_begin(f0, 5)
    back = v1.advance(begin, np.array([-100]))
    assert (back == begin).all()  # clamped at Begin


def test_common_ancestor_level():
    leaf = _cells(5000, 30)
    p7 = v1.parent(leaf, 7)
    assert (v1.common_ancestor_level(leaf, p7) == 7).all()
    assert (v1.common_ancestor_level(leaf, leaf) == 30).all()
    f0 = np.array([(2 * 0 + 1) << 60], dtype=np.uint64)
    f3 = np.array([(2 * 3 + 1) << 60], dtype=np.uint64)
    assert int(v1.common_ancestor_level(f0, f3)[0]) == -1
    # two children of the same parent -> parent's level
    p = _cells(1000, 12)
    c0 = v1.child(p, np.zeros(1000, dtype=np.int64))
    c3 = v1.child(p, np.full(1000, 3))
    assert (v1.common_ancestor_level(c0, c3) == 12).all()


def test_maximum_tile_tiles_ranges():
    """Tiling [range_min, limit) with maximum_tile covers each leaf exactly
    once (the Hilbert-range covering pattern, s2cell_id_v1.cc:175-196)."""
    base = _cells(10, 8)
    lo = v1.range_min(base)
    hi = v1.range_max(base)
    for n in range(6):
        start = np.uint64(lo[n])
        limit = np.uint64(hi[n] + np.uint64(2))  # next leaf = valid bound
        tiles, cur = [], start
        while cur < limit:
            t = v1.maximum_tile(np.array([cur]), np.array([limit]))[0]
            tiles.append(int(t))
            cur = v1.range_max(np.array([t]))[0] + np.uint64(2)
        assert tiles == [int(base[n])]  # aligned range -> the cell itself

    # unaligned: drop the first leaf; still tiles exactly, with more cells
    start = np.uint64(lo[0] + np.uint64(2))
    limit = np.uint64(hi[0] + np.uint64(2))
    tiles, cur = [], start
    while cur < limit:
        t = v1.maximum_tile(np.array([cur]), np.array([limit]))[0]
        tiles.append(int(t))
        cur = v1.range_max(np.array([t]))[0] + np.uint64(2)
    n_leaves = sum(
        (int(v1.range_max(np.array([np.uint64(t)]))[0])
         - int(v1.range_min(np.array([np.uint64(t)]))[0])) // 2 + 1
        for t in tiles
    )
    assert n_leaves == (int(limit) - int(start)) // 2
    assert len(tiles) > 1
