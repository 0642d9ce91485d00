"""Relational cell-union algebra vs the kernel's per-union oracle."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2geo_spark.kernel import cellid_v1 as v1
from s2geo_spark.kernel import cellunion, coverer, regions
from s2geo_spark.operators import cellset

RNG = np.random.default_rng(33)

CAPS = [
    (0, 40.0, -74.0, 3.0),
    (1, 41.0, -73.0, 3.0),   # overlaps 0
    (2, -30.0, 100.0, 5.0),  # disjoint from 0/1
    (3, 40.5, -73.5, 0.5),   # inside 0 ∪ 1 region
]


@pytest.fixture(scope="module")
def unions():
    out = {}
    for cid, la, lo, r in CAPS:
        cap = regions.Cap.from_latlng_radius_degrees(la, lo, r)
        out[cid] = coverer.get_covering(cap, max_cells=12)
    return out


@pytest.fixture(scope="module")
def sets_df(spark, unions):
    rows = [
        (cid, int(np.int64(c))) for cid, cells in unions.items() for c in cells
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["set_id", "cell"])
    )


def test_set_intersections_matches_kernel(spark, unions, sets_df):
    a = sets_df.select(F.col("set_id").alias("a_id"), "cell")
    b = sets_df.select(F.col("set_id").alias("b_id"), "cell")
    got = {
        (r["a_id"], r["b_id"])
        for r in cellset.set_intersections(a, b).collect()
    }
    for i in unions:
        for j in unions:
            want = bool(cellunion.intersects_id(unions[i], unions[j]).any()) or bool(
                cellunion.intersects_id(unions[j], unions[i]).any()
            )
            assert ((i, j) in got) == want, (i, j, want)


def test_cells_contain_points(spark, unions, sets_df):
    pts = pd.DataFrame(
        {
            "point_id": np.arange(4, dtype=np.int64),
            "lat": [40.0, -30.0, 0.0, 40.8],
            "lon": [-74.0, 100.0, 0.0, -73.2],
        }
    )
    got = {
        (r["set_id"], r["point_id"])
        for r in cellset.cells_contain_points(
            sets_df, spark.createDataFrame(pts)
        ).collect()
    }
    for pid in range(4):
        leaf = v1.from_latlng(
            np.array([pts["lat"][pid]]), np.array([pts["lon"][pid]])
        )
        for sid, cells in unions.items():
            want = bool(cellunion.contains_id(cells, leaf)[0])
            assert ((sid, pid) in got) == want, (sid, pid)


def test_set_contains_set(spark, unions, sets_df):
    a = sets_df.select(F.col("set_id").alias("a_id"), "cell")
    b = sets_df.select(F.col("set_id").alias("b_id"), "cell")
    got = {(r["a_id"], r["b_id"]) for r in cellset.set_contains_set(a, b).collect()}
    for i in unions:
        for j in unions:
            want = bool(cellunion.contains_id(unions[i], unions[j]).all())
            # our relational version tests cell-wise containment (same as
            # the kernel's contains over each cell)
            assert ((i, j) in got) == want, (i, j, want)


def test_set_union_normalized(spark, unions, sets_df):
    merged = cellset.set_union(
        sets_df.filter(F.col("set_id") == 0),
        sets_df.filter(F.col("set_id") == 1).withColumn("set_id", F.lit(0).cast("long")),
    ).toPandas()
    want = cellunion.normalize(
        np.concatenate([unions[0], unions[1]])
    )
    got = np.sort(merged["cell"].to_numpy().view(np.uint64))
    assert (got == want).all()


def test_set_intersection_cells(spark, unions, sets_df):
    a = sets_df.filter(F.col("set_id") == 0).select(
        F.lit(0).cast("long").alias("a_id"), "cell"
    )
    b = sets_df.filter(F.col("set_id") == 3).select(
        F.lit(3).cast("long").alias("b_id"), "cell"
    )
    cells = cellset.set_intersection_cells(a, b).toPandas()
    got = cellunion.normalize(cells["cell"].to_numpy().view(np.uint64))
    # kernel oracle: cells of either union contained in the other
    u0, u3 = unions[0], unions[3]
    picks = []
    for c in u3:
        if cellunion.contains_id(u0, np.array([c]))[0]:
            picks.append(c)
    for c in u0:
        if cellunion.contains_id(u3, np.array([c]))[0]:
            picks.append(c)
    want = cellunion.normalize(np.array(picks, dtype=np.uint64))
    assert (got == want).all()


def test_set_difference_matches_kernel(spark, unions, sets_df):
    # A \ B for every ordered pair, aligned on a shared set_id per pair.
    for i in unions:
        for j in unions:
            if i == j:
                continue
            a = sets_df.filter(F.col("set_id") == i).withColumn(
                "set_id", F.lit(0).cast("long")
            )
            b = sets_df.filter(F.col("set_id") == j).withColumn(
                "set_id", F.lit(0).cast("long")
            )
            got = cellset.set_difference(a, b).toPandas()
            got_cells = cellunion.normalize(
                got["cell"].to_numpy().view(np.uint64)
            )
            want = cellunion.normalize(
                cellunion.difference(unions[i], unions[j])
            )
            assert (got_cells == want).all(), (i, j)


def test_set_intersection_cells_no_cartesian(spark, sets_df):
    a = sets_df.select(F.col("set_id").alias("a_id"), "cell")
    b = sets_df.select(F.col("set_id").alias("b_id"), "cell")
    plan = cellset.set_intersection_cells(a, b)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
