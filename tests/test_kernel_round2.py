"""Round-2 kernel additions: union area ops, expand-by-radius,
canonicalize/simple coverings, exact cell distances, ExpandedByDistanceUV,
raster->vector boundary reconstruction — each against an independent
oracle (closed forms, brute sampling, or the coverer itself)."""

import math

import numpy as np
import pytest

from s2geo_spark.kernel import (
    booleanop as bo,
    cellid_v1 as v1,
    cells as cl,
    cellunion as cu,
    coverer,
    rastervec as rv,
    regions,
    s2coords as sc,
)

RNG = np.random.default_rng(17)


class TestUnionOps:
    def test_leaf_cells_covered_full_sphere(self):
        faces = np.array([(2 * f + 1) << 60 for f in range(6)], dtype=np.uint64)
        assert cu.leaf_cells_covered(faces) == 6 * 4**30

    def test_areas_bound_the_region(self):
        cap = regions.Cap.from_latlng_radius_degrees(40, -70, 3.0)
        cov = coverer.get_covering(cap, max_cells=64)
        want = 2 * math.pi * (1 - math.cos(math.radians(3.0)))
        a_ex = cu.exact_area(cov)
        assert want <= a_ex <= 4.0 * want  # covering is a bounded superset
        assert abs(cu.average_based_area(cov) - a_ex) / a_ex < 0.2
        # full sphere exact area sums to 4*pi
        faces = np.array([(2 * f + 1) << 60 for f in range(6)], dtype=np.uint64)
        assert abs(cu.exact_area(faces) - 4 * math.pi) < 1e-9

    def test_expand_by_radius_covers_dilation(self):
        cap = regions.Cap.from_latlng_radius_degrees(40, -70, 3.0)
        cov = coverer.get_covering(cap, max_cells=24)
        big = cu.expand_by_radius(cov, math.radians(1.0))
        la = 40 + RNG.uniform(-4.2, 4.2, 5000)
        lo = -70 + RNG.uniform(-5.5, 5.5, 5000)
        leaf = v1.from_latlng(la, lo)
        x, y, z = sc.latlng_degrees_to_xyz(la, lo)
        dilated = regions.Cap.from_latlng_radius_degrees(40, -70, 3.95)
        assert not (
            dilated.contains_points(x, y, z) & ~cu.contains_id(big, leaf)
        ).any()


class TestCanonicalize:
    def test_canonicalize_superset_and_canonical(self):
        cap = regions.Cap.from_latlng_radius_degrees(40, -70, 2.0)
        cov = coverer.get_covering(cap, max_cells=64, max_level=12)
        canon = coverer.canonicalize_covering(
            cov, max_cells=6, min_level=2, max_level=10, level_mod=2
        )
        assert coverer.is_canonical(
            canon, max_cells=6, min_level=2, max_level=10, level_mod=2
        )
        assert cu.contains_id(canon, cov).all()

    def test_is_canonical_rejects(self):
        cell = v1.parent(v1.from_latlng(np.array([40.0]), np.array([-70.0])), 8)
        dup = np.concatenate([cell, cell])
        assert not coverer.is_canonical(dup)
        assert not coverer.is_canonical(cell, min_level=9)

    def test_simple_covering_matches_fixed_level(self):
        cap = regions.Cap.from_latlng_radius_degrees(40, -70, 2.0)
        simple = coverer.simple_covering(cap, 40.0, -70.0, 8)
        fixed = coverer.get_covering(cap, max_cells=10**9, min_level=8, max_level=8)
        assert set(simple.tolist()) == set(fixed.tolist())


class TestCellDistance:
    def test_point_distance_vs_boundary_sampling(self):
        la = RNG.uniform(-60, 60, 120)
        lo = RNG.uniform(-180, 180, 120)
        cells = v1.parent(
            v1.from_latlng(RNG.uniform(-60, 60, 120), RNG.uniform(-180, 180, 120)),
            6,
        )
        x, y, z = sc.latlng_degrees_to_xyz(la, lo)
        d2 = cl.distance2_to_points(cells, x, y, z)
        for i in range(30):
            f, ulo, uhi, vlo, vhi = cl.bound_uv(cells[i : i + 1])
            us = np.linspace(ulo[0], uhi[0], 80)
            vs = np.linspace(vlo[0], vhi[0], 80)
            bu = np.concatenate([us, us, np.full(80, ulo[0]), np.full(80, uhi[0])])
            bv = np.concatenate([np.full(80, vlo[0]), np.full(80, vhi[0]), vs, vs])
            px, py, pz = sc.face_uv_to_xyz(np.full(320, f[0]), bu, bv)
            P = np.stack([px, py, pz], 1)
            P /= np.linalg.norm(P, axis=1, keepdims=True)
            q = np.array([x[i], y[i], z[i]])
            brute = ((P - q) ** 2).sum(1).min()
            if cl.contains_points(cells[i : i + 1], x[i : i + 1], y[i : i + 1], z[i : i + 1])[0]:
                assert d2[i] == 0.0
            else:
                assert brute - 2e-3 <= d2[i] <= brute + 1e-12

    def test_cell_to_cell(self):
        cells = v1.parent(
            v1.from_latlng(RNG.uniform(-60, 60, 100), RNG.uniform(-180, 180, 100)),
            6,
        )
        par = v1.parent(cells[:50], 4)
        assert (cl.distance2_cell_to_cell(cells[:50], par) == 0).all()
        d_ab = cl.distance2_cell_to_cell(cells[:50], cells[50:])
        d_ba = cl.distance2_cell_to_cell(cells[50:], cells[:50])
        assert np.allclose(d_ab, d_ba)

    def test_expanded_uv_conservative(self):
        cells = v1.parent(
            v1.from_latlng(RNG.uniform(-60, 60, 50), RNG.uniform(-180, 180, 50)),
            7,
        )
        d = math.radians(0.7)
        f, ulo, uhi, vlo, vhi = cl.expanded_by_distance_uv(cells, d)
        # points at distance <= d of the cell center must land in the rect
        cx, cy, cz = v1.to_point(cells)
        for i in range(50):
            c = np.array([cx[i], cy[i], cz[i]])
            u = np.array([0.0, 0.0, 1.0]) - c[2] * c
            u /= np.linalg.norm(u)
            t = c * math.cos(d) + u * math.sin(d)
            comp = [t[0], t[1], t[2], -t[0], -t[1], -t[2]][int(f[i])]
            if comp <= 0:
                continue
            uu, vv = sc.valid_face_xyz_to_uv(
                np.array([f[i]]), np.array([t[0]]), np.array([t[1]]), np.array([t[2]])
            )
            assert ulo[i] <= uu[0] <= uhi[i] and vlo[i] <= vv[0] <= vhi[i]


class TestRasterToVector:
    def test_boundary_matches_union_membership(self):
        cap = regions.Cap.from_latlng_radius_degrees(40, -70, 4.0)
        cov = coverer.get_covering(cap, max_cells=10**9, min_level=7, max_level=7)
        loops_list = rv.union_boundary_loops(cov)
        la = 40 + RNG.uniform(-6, 6, 6000)
        lo = -70 + RNG.uniform(-8, 8, 6000)
        leaf = v1.from_latlng(la, lo)
        x, y, z = sc.latlng_degrees_to_xyz(la, lo)
        want = cu.contains_id(cov, leaf)
        got = bo.region_contains_points(loops_list, np.stack([x, y, z], 1))
        assert (got == want).all()
        assert abs(cu.exact_area(cov) - bo.region_area(loops_list)) < 1e-6

    def test_annulus_has_hole_loop(self):
        outer = coverer.get_covering(
            regions.Cap.from_latlng_radius_degrees(40, -70, 4.0),
            max_cells=10**9, min_level=7, max_level=7,
        )
        inner = coverer.get_covering(
            regions.Cap.from_latlng_radius_degrees(40, -70, 1.5),
            max_cells=10**9, min_level=7, max_level=7,
        )
        ann = cu.difference(outer, inner)
        loops_list = rv.union_boundary_loops(ann)
        assert len(loops_list) >= 2
        la = 40 + RNG.uniform(-6, 6, 4000)
        lo = -70 + RNG.uniform(-8, 8, 4000)
        leaf = v1.from_latlng(la, lo)
        x, y, z = sc.latlng_degrees_to_xyz(la, lo)
        got = bo.region_contains_points(loops_list, np.stack([x, y, z], 1))
        assert (got == cu.contains_id(ann, leaf)).all()

    def test_cross_face_union(self):
        cov = coverer.get_covering(
            regions.Cap.from_latlng_radius_degrees(41.0, 44.0, 6.0),
            max_cells=10**9, min_level=6, max_level=6,
        )
        loops_list = rv.union_boundary_loops(cov)
        la = 41 + RNG.uniform(-8, 8, 3000)
        lo = 44 + RNG.uniform(-9, 9, 3000)
        leaf = v1.from_latlng(la, lo)
        x, y, z = sc.latlng_degrees_to_xyz(la, lo)
        got = bo.region_contains_points(loops_list, np.stack([x, y, z], 1))
        mism = (got != cu.contains_id(cov, leaf)).sum()
        assert mism <= 3  # quantized cross-face stitch: ulp-band stragglers


class TestRegionApiAdditions:
    def test_advance_wrap(self):
        lvl = 5
        begin = v1.child_begin(
            np.array([(2 * 0 + 1) << 60], dtype=np.uint64), lvl
        )
        n_cells = 6 * 4**lvl
        assert (v1.advance_wrap(begin, np.array([n_cells])) == begin).all()
        last = v1.advance_wrap(begin, np.array([-1]))
        assert int(v1.distance_from_begin(last)[0]) == n_cells - 1
        assert (v1.advance_wrap(begin, np.array([1000])) ==
                v1.advance(begin, np.array([1000]))).all()
        cells = v1.parent(
            v1.from_latlng(RNG.uniform(-80, 80, 200), RNG.uniform(-180, 180, 200)), 8
        )
        ks = RNG.integers(-(10**7), 10**7, 200)
        assert (v1.advance_wrap(v1.advance_wrap(cells, ks), -ks) == cells).all()

    def test_cap_rect_bound(self):
        cap = regions.Cap.from_latlng_radius_degrees(40.0, -70.0, 5.0)
        b = cap.get_rect_bound()
        v = RNG.normal(size=(30000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        inside = cap.contains_points(v[:, 0], v[:, 1], v[:, 2])
        lat, lng = sc.xyz_to_latlng_degrees(v[:, 0], v[:, 1], v[:, 2])
        inb = (lat >= b.lat_lo) & (lat <= b.lat_hi) & b._lng_contains(lng)
        assert not (inside & ~inb).any()
        assert abs((b.lat_hi - b.lat_lo) - 10.0) < 1e-9
        polar = regions.Cap.from_latlng_radius_degrees(89.0, 0.0, 5.0).get_rect_bound()
        assert polar.lng_lo == -180.0 and polar.lat_hi == 90.0

    def test_rect_expanded_and_distance(self):
        r = regions.LatLngRect(10, 20, 170, -170)  # wraps the antimeridian
        e = r.expanded(5, 5)
        assert e.lat_lo == 5 and e.lat_hi == 25
        assert e._lng_contains(np.array([166.0]))[0]
        assert r.expanded(0, 180).lng_hi == 180.0
        d = r.get_distance_degrees(
            np.array([15.0, 25.0, 15.0]), np.array([175.0, 175.0, 160.0])
        )
        assert d[0] == 0.0
        assert abs(d[1] - 5.0) < 1e-12
        assert abs(d[2] - 10.0 * np.cos(np.radians(15.0))) < 1e-9


class TestCellAreaTrio:
    def test_exact_sums_to_sphere(self):
        faces = np.array([(2 * f + 1) << 60 for f in range(6)], dtype=np.uint64)
        assert abs(cl.exact_area(faces).sum() - 4 * math.pi) < 1e-9

    def test_approx_within_3pct(self):
        for lvl in (2, 3, 6, 12, 20):
            cells = np.unique(
                v1.parent(
                    v1.from_latlng(RNG.uniform(-80, 80, 300), RNG.uniform(-180, 180, 300)),
                    lvl,
                )
            )
            rel = np.abs(cl.approx_area(cells) / cl.exact_area(cells) - 1).max()
            assert rel < 0.03, (lvl, rel)

    def test_average_area_partition(self):
        # 6*4^lvl cells x average area == 4*pi exactly
        for lvl in (0, 5, 17):
            assert abs(6 * 4**lvl * cl.average_area(lvl) - 4 * math.pi) < 1e-6
