"""Hausdorff / interpolation / convex hull operator tests vs NumPy oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2geo_spark.kernel import s2coords as sc
from s2geo_spark.operators import geometry

RNG = np.random.default_rng(21)


def test_hausdorff_matches_bruteforce(spark):
    na, nb = 60, 400
    a_pdf = pd.DataFrame(
        {
            "set_a": np.repeat(np.arange(3, dtype=np.int64), na // 3),
            "point_id": np.arange(na, dtype=np.int64),
            "lat": 40 + RNG.uniform(-3, 3, na),
            "lon": -70 + RNG.uniform(-3, 3, na),
        }
    )
    b_pdf = pd.DataFrame(
        {
            "point_id": np.arange(nb, dtype=np.int64),
            "lat": 40 + RNG.uniform(-4, 4, nb),
            "lon": -70 + RNG.uniform(-4, 4, nb),
        }
    )
    got = (
        geometry.hausdorff_join(
            spark.createDataFrame(a_pdf), spark.createDataFrame(b_pdf)
        )
        .orderBy("set_a")
        .toPandas()
    )
    ax, ay, az = sc.latlng_degrees_to_xyz(a_pdf["lat"].to_numpy(), a_pdf["lon"].to_numpy())
    bx, by, bz = sc.latlng_degrees_to_xyz(b_pdf["lat"].to_numpy(), b_pdf["lon"].to_numpy())
    for g in range(3):
        mask = a_pdf["set_a"].to_numpy() == g
        d2 = (
            (ax[mask][:, None] - bx[None, :]) ** 2
            + (ay[mask][:, None] - by[None, :]) ** 2
            + (az[mask][:, None] - bz[None, :]) ** 2
        )
        want = d2.min(axis=1).max()
        gotv = float(got[got["set_a"] == g]["hausdorff_chord2"].iloc[0])
        assert abs(gotv - want) < 1e-12, (g, gotv, want)


def test_chain_interpolate_endpoints_and_mid(spark):
    line = [[0.0, 0.0], [0.0, 10.0], [10.0, 10.0]]
    pdf = pd.DataFrame(
        {
            "line_id": np.array([1, 2, 3], dtype=np.int64),
            "vertices": [line, line, line],
            "fraction": [0.0, 1.0, 0.5],
        }
    )
    got = (
        geometry.chain_interpolate(spark.createDataFrame(pdf))
        .orderBy("line_id")
        .toPandas()
    )
    assert abs(got.iloc[0]["lat"] - 0.0) < 1e-9 and abs(got.iloc[0]["lon"] - 0.0) < 1e-9
    assert abs(got.iloc[1]["lat"] - 10.0) < 1e-9 and abs(got.iloc[1]["lon"] - 10.0) < 1e-9
    # halfway: both segments are 10 deg arcs, so the midpoint is the corner
    assert abs(got.iloc[2]["lat"] - 0.0) < 1e-6 and abs(got.iloc[2]["lon"] - 10.0) < 1e-6


def test_convex_hull_contains_all_points(spark):
    from s2geo_spark.kernel import loops

    n = 300
    pdf = pd.DataFrame(
        {
            "group_id": np.repeat(np.arange(2, dtype=np.int64), n // 2),
            "lat": np.concatenate([20 + RNG.uniform(-2, 2, n // 2), -30 + RNG.uniform(-1, 1, n // 2)]),
            "lon": np.concatenate([50 + RNG.uniform(-2, 2, n // 2), 100 + RNG.uniform(-1, 1, n // 2)]),
        }
    )
    hull = (
        geometry.convex_hull(spark.createDataFrame(pdf))
        .orderBy("group_id", "hull_idx")
        .toPandas()
    )
    for g in range(2):
        hv = hull[hull["group_id"] == g]
        verts = np.stack(
            sc.latlng_degrees_to_xyz(hv["lat"].to_numpy(), hv["lon"].to_numpy()), axis=1
        )
        assert len(verts) >= 3
        lp = loops.PreparedLoop(verts)
        gp = pdf[pdf["group_id"] == g]
        # hull vertices themselves sit ON the boundary (SEMI_OPEN may assign
        # them outside); every non-vertex input must be strictly inside
        hull_keys = set(zip(hv["lat"].round(9), hv["lon"].round(9)))
        interior = gp[
            ~gp.apply(
                lambda r: (round(r["lat"], 9), round(r["lon"], 9)) in hull_keys,
                axis=1,
            )
        ]
        x, y, z = sc.latlng_degrees_to_xyz(
            interior["lat"].to_numpy(), interior["lon"].to_numpy()
        )
        inside = lp.contains_points(np.stack([x, y, z], axis=1))
        assert inside.all()
        # and must NOT contain a far-away point
        fx, fy, fz = sc.latlng_degrees_to_xyz(np.array([-80.0]), np.array([0.0]))
        assert not lp.contains_points(np.array([[fx[0], fy[0], fz[0]]]))[0]


class TestAlignmentOperators:
    """Grouped medoid/consensus DataFrame operators (r4)."""

    def _lines_df(self, spark):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(13)
        rows = []
        for g in range(3):
            base_lat = 40.0 + 5 * g + rng.normal(0, 0.01, 6)
            base_lon = 8.0 + 5 * g + np.linspace(0, 1, 6)
            for l in range(4):
                lat = base_lat + rng.normal(0, 0.02, 6)
                lon = base_lon + rng.normal(0, 0.02, 6)
                rows.append(
                    (g, l, [[float(a), float(b)] for a, b in zip(lat, lon)])
                )
        return spark.createDataFrame(
            rows, "group_id long, line_id long, verts array<array<double>>"
        )

    def test_medoid_matches_kernel(self, spark):
        import numpy as np

        from s2geo_spark.kernel import polyline as pk
        from s2geo_spark.operators import geometry as g

        df = self._lines_df(spark)
        out = g.polyline_medoid(df, approx=False).toPandas()
        assert len(out) == 3
        pdf = df.toPandas()
        for _, row in out.iterrows():
            grp = pdf[pdf["group_id"] == row["group_id"]].sort_values("line_id")
            xs = [g._verts_to_xyz(v) for v in grp["verts"]]
            assert pk.medoid_polyline(xs, approx=False) == row["medoid_line_id"]

    def test_consensus_shape_and_quality(self, spark):
        import numpy as np

        from s2geo_spark.kernel import polyline as pk
        from s2geo_spark.operators import geometry as g

        df = self._lines_df(spark)
        out = g.polyline_consensus(df, approx=False, iteration_cap=8).toPandas()
        # seed vertex count preserved per group
        for gid, grp in out.groupby("group_id"):
            assert sorted(grp["vertex_idx"]) == list(range(6))
        # consensus cost <= seed cost per group
        pdf = df.toPandas()
        for gid in (0, 1, 2):
            grp = pdf[pdf["group_id"] == gid].sort_values("line_id")
            xs = [g._verts_to_xyz(v) for v in grp["verts"]]
            cg = out[out["group_id"] == gid].sort_values("vertex_idx")
            from s2geo_spark.kernel import s2coords as sc2

            x, y, z = sc2.latlng_degrees_to_xyz(
                cg["lat"].to_numpy(), cg["lon"].to_numpy()
            )
            cons = np.stack([x, y, z], axis=1)
            c_cost = sum(pk.dtw_alignment(cons, l)[0] for l in xs)
            s_cost = sum(pk.dtw_alignment(xs[0], l)[0] for l in xs)
            assert c_cost <= s_cost + 1e-15
