"""Spark-layer function tests: pandas UDFs vs the NumPy kernel, and the
JVM-side column expressions vs the kernel (parents, ranges, tokens, faces)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2geo_spark import functions as sf
from s2geo_spark.kernel import cellid_v1 as v1
from s2geo_spark.kernel import cellid_v2 as v2
from s2geo_spark.sources import pages as pages_src


@pytest.fixture(scope="module")
def point_df(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(5000),
            "lat": rng.uniform(-89.9, 89.9, 5000),
            "lon": rng.uniform(-180.0, 180.0, 5000),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_cell_id_udf_matches_kernel(point_df):
    df, pdf = point_df
    got = (
        df.select("pid", sf.s2_cell_id("lat", "lon").alias("cell"))
        .orderBy("pid")
        .toPandas()
    )
    expect = v1.from_latlng(pdf["lat"].to_numpy(), pdf["lon"].to_numpy())
    assert (got["cell"].to_numpy().view(np.uint64) == expect).all()


def test_column_parent_range_token_face(point_df):
    df, pdf = point_df
    out = (
        df.select("pid", sf.s2_cell_id("lat", "lon").alias("cell"))
        .select(
            "pid",
            "cell",
            sf.s2_parent("cell", 10).alias("p10"),
            sf.s2_range_min(sf.s2_parent("cell", 10)).alias("rmin"),
            sf.s2_range_max(sf.s2_parent("cell", 10)).alias("rmax"),
            sf.s2_token_expr("cell").alias("token"),
            sf.s2_face_expr("cell").alias("face"),
            sf.s2_level_expr(sf.s2_parent("cell", 7)).alias("lvl7"),
        )
        .orderBy("pid")
        .toPandas()
    )
    ids = v1.from_latlng(pdf["lat"].to_numpy(), pdf["lon"].to_numpy())
    assert (out["p10"].to_numpy().view(np.uint64) == v1.parent(ids, 10)).all()
    assert (
        out["rmin"].to_numpy().view(np.uint64) == v1.range_min(v1.parent(ids, 10))
    ).all()
    assert (
        out["rmax"].to_numpy().view(np.uint64) == v1.range_max(v1.parent(ids, 10))
    ).all()
    assert (out["token"].to_numpy() == v1.to_token(ids)).all()
    assert (out["face"].to_numpy() == v1.face(ids)).all()
    assert (out["lvl7"] == 7).all()


def test_v2_udf_matches_kernel(point_df):
    df, pdf = point_df
    out = (
        df.select("pid", sf.s2_v2_id(sf.s2_parent(sf.s2_cell_id("lat", "lon"), 12)).alias("v2"))
        .orderBy("pid")
        .toPandas()
    )
    ids = v1.parent(v1.from_latlng(pdf["lat"].to_numpy(), pdf["lon"].to_numpy()), 12)
    assert (out["v2"].to_numpy().view(np.uint64) == v2.from_v1(ids)).all()


def test_null_latlon_yields_invalid(spark):
    pdf = pd.DataFrame({"lat": [1.0, None, 3.0], "lon": [None, 2.0, 4.0]})
    out = spark.createDataFrame(pdf).select(sf.s2_cell_id("lat", "lon").alias("c")).toPandas()
    assert out["c"].tolist()[:2] == [0, 0]
    assert out["c"].tolist()[2] != 0


def test_sortkey_preserves_unsigned_order(point_df):
    df, pdf = point_df
    out = (
        df.select(sf.s2_cell_id("lat", "lon").alias("cell"))
        .orderBy(sf.s2_sortkey("cell"))
        .toPandas()
    )
    got = out["cell"].to_numpy().view(np.uint64)
    assert (np.sort(got) == got).all()


class TestPagesSource:
    def test_deterministic_and_extractable(self, spark):
        p1 = pages_src.synth_pages(spark, 2000, partitions=4).orderBy("url").toPandas()
        p2 = pages_src.synth_pages(spark, 2000, partitions=7).orderBy("url").toPandas()
        # identical regardless of partitioning (byte-identical text per url)
        assert (p1["text"] == p2["text"]).all()
        assert (p1["url"] == p2["url"]).all()

        df = pages_src.extract_geo(pages_src.synth_pages(spark, 2000))
        n_geo = df.filter(F.col("lat").isNotNull()).count()
        assert 0.88 < n_geo / 2000 < 0.97  # ~93% carry a geo token
        # round-trip: formatted coordinates parse back within 1e-6
        row = df.filter(F.col("lat").isNotNull()).first()
        assert abs(row["lat"]) <= 90 and abs(row["lon"]) <= 180

    def test_extract_text_byte_identical(self, spark):
        """The input_hint invariant: text extracted FROM the html binary
        is byte-identical per url to the carried text column, at every
        partitioning (r4 — extraction is now a real operator, not just a
        carried column)."""
        for parts in (1, 4, 9):
            df = pages_src.extract_text(
                pages_src.synth_pages(spark, 3000, partitions=parts)
            )
            mism = df.filter(
                F.col("extracted_text") != F.col("text")
            ).count()
            assert mism == 0
        # aggregate fingerprint equality (order-insensitive, JVM-side;
        # bit_xor — an ANSI-mode sum of hashes overflows long)
        agg = df.agg(
            F.expr("bit_xor(xxhash64(url, extracted_text))").alias("a"),
            F.expr("bit_xor(xxhash64(url, text))").alias("b"),
        ).first()
        assert agg["a"] == agg["b"]

    def test_html_wraps_text(self, spark):
        df = pages_src.synth_pages(spark, 50)
        row = df.first()
        assert bytes(row["html"]).decode("utf-8") == f"<html><body>{row['text']}</body></html>"
