"""Spherical measures vs closed-form values (S2Loop::GetArea/GetCurvature,
s2measures.cc, s2centroids.cc semantics)."""

import numpy as np

from s2geo_spark.kernel import loops, measures, regions


def test_hemisphere_area_and_perimeter():
    eq = loops.parse_loop_text("0:0, 0:90, 0:180, 0:-90")
    assert abs(measures.loop_area(eq) - 2 * np.pi) < 1e-12
    assert abs(measures.loop_perimeter(eq) - 2 * np.pi) < 1e-12


def test_cap_area_closed_form():
    for r_deg, k in [(1.0, 512), (10.0, 1024)]:
        reg = loops.make_regular_loop(20.0, 30.0, r_deg, k)
        r = np.radians(r_deg)
        want = 2 * np.pi * (1 - np.cos(r))  # spherical cap area
        got = measures.loop_area(reg)
        # k-gon inscribed in the cap: slightly smaller, converging in k
        assert 0.99 * want < got <= want * (1 + 1e-9), (r_deg, got, want)


def test_complement_loop_area():
    reg = loops.make_regular_loop(-5.0, 100.0, 3.0, 64)
    cw = np.ascontiguousarray(reg[::-1])
    total = measures.loop_area(reg) + measures.loop_area(cw)
    assert abs(total - 4 * np.pi) < 1e-9


def test_triangle_area_girard():
    # octant triangle (three mutually orthogonal points): area = pi/2
    a = np.array([[1.0, 0.0, 0.0]])
    b = np.array([[0.0, 1.0, 0.0]])
    c = np.array([[0.0, 0.0, 1.0]])
    assert abs(measures.triangle_area(a, b, c)[0] - np.pi / 2) < 1e-12
    assert measures.signed_triangle_area(a, b, c)[0] > 0
    assert measures.signed_triangle_area(a, c, b)[0] < 0


def test_centroid_points_at_cap_center():
    reg = loops.make_regular_loop(42.0, -71.0, 2.0, 128)
    c = measures.loop_centroid(reg)
    c = c / np.linalg.norm(c)
    want = regions.latlng_to_unit(42.0, -71.0)
    assert float(c @ want) > 1 - 1e-9


def test_polyline_length():
    line = loops.parse_loop_text("0:0, 0:90, 90:90")
    assert abs(measures.polyline_length(line) - np.pi) < 1e-12


class TestTrueCentroid:
    """Exact TrueCentroid surface integral (s2centroids.cc:27-71) against
    the spherical-cap closed form: integral of z over a polar cap of
    radius r is pi*sin^2(r)."""

    def test_polar_cap_closed_form(self):
        for rad in (5.0, 30.0, 80.0):
            verts = loops.make_regular_loop(90.0, 0.0, rad, 1024)
            c = measures.loop_centroid(verts)
            want = np.pi * np.sin(np.radians(rad)) ** 2
            assert abs(c[2] - want) / want < 5e-3, (rad, c[2], want)
            assert abs(c[0]) < 1e-12 and abs(c[1]) < 1e-12

    def test_centroid_direction(self):
        verts = loops.make_regular_loop(45.0, 60.0, 20.0, 512)
        c = measures.loop_centroid(verts)
        cn = c / np.linalg.norm(c)
        lat = np.degrees(np.arcsin(cn[2]))
        lon = np.degrees(np.arctan2(cn[1], cn[0]))
        assert abs(lat - 45.0) < 0.01 and abs(lon - 60.0) < 0.01

    def test_antisymmetry(self):
        rng = np.random.default_rng(5)
        a, b, c = (v / np.linalg.norm(v) for v in rng.normal(size=(3, 3)))
        fwd = measures.true_triangle_centroid(a, b, c)[0]
        rev = measures.true_triangle_centroid(a, c, b)[0]
        assert np.allclose(fwd, -rev)


class TestBoundAntimeridian:
    def test_edge_crossing_mean_antipode(self):
        # loop straddling the dateline while the vertex circular mean sits
        # near 0: the per-edge short-way union must keep lng 180 inside
        verts = loops.parse_loop_text("10:179, 10:-179, 12:-179, 12:179")
        b = loops.PreparedLoop(verts).bound
        assert b.lng_lo > b.lng_hi  # wrapped interval
        assert b._lng_contains(np.array([180.0]))[0]
        assert not b._lng_contains(np.array([0.0]))[0]

    def test_tight_bound_normal_loop(self):
        verts = loops.parse_loop_text("46:7, 46:9, 48:9, 48:7")
        b = loops.PreparedLoop(verts).bound
        assert 6.9 < b.lng_lo < 7.01 and 8.99 < b.lng_hi < 9.1
