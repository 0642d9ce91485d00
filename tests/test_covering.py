"""Coverer + cell-union tests, mirroring the reference invariants:

  * coverings are valid cell unions, canonical, and cover the region
    (s2region_coverer_test.cc:73-543 RandomCaps/RandomCells pattern)
  * interior coverings are fully contained in the region
  * union algebra: normalize merges siblings, denormalize re-expands
    (s2cell_union_test.cc Normalize)
"""

import numpy as np
import pytest

from s2geo_spark.kernel import cellid_v1 as v1
from s2geo_spark.kernel import cellunion, coverer, regions

RNG = np.random.default_rng(42)


def random_point():
    p = RNG.normal(size=3)
    return p / np.linalg.norm(p)


def sample_in_cap(cap: regions.Cap, n: int):
    """Rejection-free sample: perturb around the center within the radius."""
    # random directions orthogonal-ish, scaled by random angle <= radius
    out = np.empty((n, 3))
    for k in range(n):
        angle = RNG.uniform(0, cap.radius_radians)
        axis = RNG.normal(size=3)
        axis -= axis.dot(cap.center) * cap.center
        axis /= np.linalg.norm(axis)
        out[k] = np.cos(angle) * cap.center + np.sin(angle) * axis
    return out / np.linalg.norm(out, axis=1, keepdims=True)


def check_valid_union(ids: np.ndarray):
    """S2CellUnion::IsValid (s2cell_union.cc:141-151): sorted, valid ids,
    non-overlapping ranges."""
    assert v1.is_valid(ids).all()
    if ids.size > 1:
        assert (v1.range_max(ids[:-1]) < v1.range_min(ids[1:])).all()


class TestCapCoverings:
    @pytest.mark.parametrize("radius_deg", [0.001, 0.01, 0.5, 5.0, 40.0, 120.0])
    def test_covering_covers_and_is_valid(self, radius_deg):
        for _ in range(5):
            c = random_point()
            lat = np.degrees(np.arcsin(np.clip(c[2], -1, 1)))
            lon = np.degrees(np.arctan2(c[1], c[0]))
            cap = regions.Cap.from_latlng_radius_degrees(lat, lon, radius_deg)
            cov = coverer.get_covering(cap, max_cells=8)
            check_valid_union(cov)
            assert len(cov) <= 8 or radius_deg > 30  # large caps may exceed via denorm rules
            # every sampled point of the cap falls in some covering cell
            pts = sample_in_cap(cap, 200)
            leaf = v1.from_point(pts[:, 0], pts[:, 1], pts[:, 2])
            assert cellunion.contains_id(cov, leaf).all(), f"r={radius_deg}"

    def test_interior_covering_is_contained(self):
        cap = regions.Cap.from_latlng_radius_degrees(47.0, 8.0, 3.0)
        interior = coverer.get_covering(cap, max_cells=8, interior=True)
        if interior.size:
            check_valid_union(interior)
            assert cap.contains_cells(interior).all()

    def test_fixed_level_covering(self):
        cap = regions.Cap.from_latlng_radius_degrees(-10.0, 100.0, 1.0)
        cov = coverer.get_covering(cap, max_cells=100, min_level=8, max_level=8)
        assert (v1.level(cov) == 8).all()
        pts = sample_in_cap(cap, 100)
        leaf = v1.from_point(pts[:, 0], pts[:, 1], pts[:, 2])
        assert cellunion.contains_id(cov, leaf).all()

    def test_small_cap_single_cell(self):
        # a 10m cap should cover with very few deep cells
        cap = regions.Cap.from_latlng_radius_degrees(47.3769, 8.5417, 0.0001)
        cov = coverer.get_covering(cap, max_cells=8)
        assert 1 <= len(cov) <= 8
        assert (v1.level(cov) >= 15).all()

    def test_max_cells_respected(self):
        for mc in [4, 8, 16]:
            cap = regions.Cap.from_latlng_radius_degrees(0.0, 0.0, 10.0)
            cov = coverer.get_covering(cap, max_cells=mc)
            assert len(cov) <= max(mc, 6)


class TestRectCoverings:
    def test_rect_covering_covers(self):
        rect = regions.LatLngRect(40.0, 42.0, -75.0, -72.0)
        cov = coverer.get_covering(rect, max_cells=12)
        check_valid_union(cov)
        lats = RNG.uniform(40.0, 42.0, 300)
        lons = RNG.uniform(-75.0, -72.0, 300)
        leaf = v1.from_latlng(lats, lons)
        assert cellunion.contains_id(cov, leaf).all()

    def test_antimeridian_rect(self):
        rect = regions.LatLngRect(-5.0, 5.0, 175.0, -175.0)
        cov = coverer.get_covering(rect, max_cells=12)
        lats = RNG.uniform(-5.0, 5.0, 200)
        lons = np.where(RNG.random(200) < 0.5, RNG.uniform(175, 180, 200), RNG.uniform(-180, -175, 200))
        leaf = v1.from_latlng(lats, lons)
        assert cellunion.contains_id(cov, leaf).all()


class TestCellUnion:
    def test_normalize_merges_siblings(self):
        f = np.array([(2 * 2 + 1) << 60], dtype=np.uint64)
        kids = v1.child(np.repeat(f, 4), np.arange(4))
        norm = cellunion.normalize(kids)
        assert norm.tolist() == f.tolist()

    def test_normalize_drops_contained(self):
        f = np.array([(2 * 1 + 1) << 60], dtype=np.uint64)
        deep = v1.child_begin(f, 5)
        norm = cellunion.normalize(np.concatenate([f, deep]))
        assert norm.tolist() == f.tolist()

    def test_denormalize_roundtrip(self):
        cap = regions.Cap.from_latlng_radius_degrees(10.0, 10.0, 2.0)
        cov = coverer.get_covering(cap, max_cells=8)
        denorm = cellunion.denormalize(cov, 10, 1)
        assert (v1.level(denorm) >= 10).all()
        # denormalized set covers the same leaves
        pts = sample_in_cap(cap, 100)
        leaf = v1.from_point(pts[:, 0], pts[:, 1], pts[:, 2])
        assert cellunion.contains_id(cellunion.normalize(denorm), leaf).all()

    def test_expand_adds_ring(self):
        cell = v1.parent(v1.from_latlng(np.array([20.0]), np.array([20.0])), 10)
        expanded = cellunion.expand_by_level(cell, 10)
        # original plus its 8 neighbors
        ring = v1.append_all_neighbors(cell, 10)
        want = cellunion.normalize(np.concatenate([cell, ring.ravel()]))
        assert expanded.tolist() == want.tolist()

    def test_contains_intersects_search(self):
        cap = regions.Cap.from_latlng_radius_degrees(0.0, 50.0, 5.0)
        cov = coverer.get_covering(cap, max_cells=8)
        inside = sample_in_cap(cap, 50)
        leaf_in = v1.from_point(inside[:, 0], inside[:, 1], inside[:, 2])
        assert cellunion.contains_id(cov, leaf_in).all()
        # antipodal points are not contained
        leaf_out = v1.from_point(-inside[:, 0], -inside[:, 1], -inside[:, 2])
        assert not cellunion.contains_id(cov, leaf_out).any()
        assert not cellunion.intersects_id(cov, leaf_out).any()


class TestCellUnionDifference:
    def test_difference_semantics(self):
        a = coverer.get_covering(
            regions.Cap.from_latlng_radius_degrees(40, -74, 3.0), max_cells=12
        )
        b = coverer.get_covering(
            regions.Cap.from_latlng_radius_degrees(41, -73, 3.0), max_cells=12
        )
        d = cellunion.difference(a, b)
        assert not cellunion.intersects_id(b, d).any()
        lat = 40 + RNG.uniform(-4, 4, 3000)
        lon = -74 + RNG.uniform(-4, 4, 3000)
        leaf = v1.from_latlng(lat, lon)
        in_a = cellunion.contains_id(a, leaf)
        in_b = cellunion.contains_id(b, leaf)
        in_d = cellunion.contains_id(d, leaf)
        assert (in_d == (in_a & ~in_b)).all()
        assert len(cellunion.difference(a, a)) == 0
        empty = np.array([], dtype=np.uint64)
        assert (cellunion.difference(a, empty) == cellunion.normalize(a)).all()


from s2geo_spark.kernel import s2coords as sc  # noqa: E402


class TestCompositeRegions:
    def test_union_region_covering_covers_both(self):
        from s2geo_spark.kernel import coverer, regions

        a = regions.Cap.from_latlng_radius_degrees(40, -70, 2.0)
        b = regions.Cap.from_latlng_radius_degrees(-30, 100, 3.0)
        u = regions.RegionUnion([a, b])
        cov = coverer.get_covering(u, max_cells=16)
        rng = np.random.default_rng(3)
        for cap, clat, clon in ((a, 40, -70), (b, -30, 100)):
            la = clat + rng.uniform(-3.5, 3.5, 2000)
            lo = clon + rng.uniform(-4, 4, 2000)
            x, y, z = sc.latlng_degrees_to_xyz(la, lo)
            inside = cap.contains_points(x, y, z)
            leaf = v1.from_latlng(la, lo)
            from s2geo_spark.kernel import cellunion

            covered = cellunion.contains_id(np.asarray(cov), leaf)
            assert not (inside & ~covered).any()

    def test_intersection_region_covering(self):
        from s2geo_spark.kernel import cellunion, coverer, regions

        a = regions.Cap.from_latlng_radius_degrees(0, 0, 10.0)
        b = regions.Cap.from_latlng_radius_degrees(0, 12, 10.0)
        inter = regions.RegionIntersection([a, b])
        cov = coverer.get_covering(inter, max_cells=24)
        rng = np.random.default_rng(4)
        la = rng.uniform(-12, 12, 4000)
        lo = rng.uniform(-12, 24, 4000)
        x, y, z = sc.latlng_degrees_to_xyz(la, lo)
        inside = a.contains_points(x, y, z) & b.contains_points(x, y, z)
        leaf = v1.from_latlng(la, lo)
        covered = cellunion.contains_id(np.asarray(cov), leaf)
        assert not (inside & ~covered).any()
