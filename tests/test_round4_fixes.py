"""Round-4 scale/hygiene fixes (VERDICT r3 'next round' + ADVICE r3):
size-gated spatial broadcasts, distributed density partitioner, jaccard
cache release, media header-dimension validation."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2geo_spark.kernel import loops
from s2geo_spark.operators import spatial

RNG = np.random.default_rng(44)


def _pts(spark, n=300):
    pdf = pd.DataFrame(
        {
            "point_id": np.arange(n, dtype=np.int64),
            "lat": 47.0 + RNG.uniform(-2, 2, n),
            "lon": 8.0 + RNG.uniform(-2, 2, n),
        }
    )
    return spark.createDataFrame(pdf)


def _layer(spark):
    polys = {
        1: loops.make_regular_loop(47.0, 8.0, 1.0, 24),
        2: loops.make_regular_loop(46.5, 7.5, 0.6, 24),
    }
    return polys


class TestMediaHeaderValidation:
    """ADVICE r3 medium: decoders must validate untrusted header dims and
    payload lengths BEFORE allocating output buffers."""

    def test_bmp_hostile_dims(self):
        import struct

        from s2geo_spark.operators import multimodal as mm

        px = np.zeros((2, 2, 3), dtype=np.uint8)
        b = bytearray(mm.encode_bmp(px))
        struct.pack_into("<ii", b, 18, 60_000, 60_000)  # claim 3.6e9 px
        with pytest.raises(ValueError):
            mm.decode_bmp(bytes(b))
        b2 = bytearray(mm.encode_bmp(px))
        struct.pack_into("<ii", b2, 18, 2, -2)  # negative height
        with pytest.raises(ValueError):
            mm.decode_bmp(bytes(b2))
        b3 = bytearray(mm.encode_bmp(px))
        struct.pack_into("<ii", b3, 18, 40, 40)  # dims > actual pixel data
        with pytest.raises(ValueError):
            mm.decode_bmp(bytes(b3))

    def test_png_hostile_dims_and_truncation(self):
        import struct

        from s2geo_spark.operators import multimodal as mm

        px = np.zeros((4, 4, 3), dtype=np.uint8)
        b = bytearray(mm.encode_png(px))
        # IHDR starts at byte 16 (sig 8 + len 4 + type 4): patch W/H huge
        struct.pack_into(">II", b, 16, 90_000, 90_000)
        with pytest.raises(ValueError):
            mm.decode_png(bytes(b))
        b2 = bytearray(mm.encode_png(px))
        struct.pack_into(">II", b2, 16, 4, 5)  # one extra claimed row
        with pytest.raises(ValueError):
            mm.decode_png(bytes(b2))

    def test_ppm_truncated(self):
        from s2geo_spark.operators import multimodal as mm

        px = np.zeros((4, 4, 3), dtype=np.uint8)
        b = mm.encode_ppm(px)
        with pytest.raises(ValueError):
            mm.decode_ppm(b[: len(b) - 10])
        with pytest.raises(ValueError):
            mm.decode_ppm(b"P6\n60000 60000\n255\n\x00\x00")

    def test_gif_fps_from_gce_delay(self):
        from s2geo_spark.operators import multimodal as mm

        frames = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
        # encode_gif default delay_cs=4 -> 25 fps (ADVICE r3 low: was
        # silently falling back to the default 10)
        assert mm.decode_gif(mm.encode_gif(frames))["fps"] == 25
        assert mm.decode_gif(mm.encode_gif(frames, delay_cs=10))["fps"] == 10

    def test_gif_truncated_frame(self):
        from s2geo_spark.operators import multimodal as mm

        frames = np.zeros((1, 8, 8), dtype=np.uint8)
        b = bytearray(mm.encode_gif(frames))
        import struct

        # claim a larger frame than the LZW stream carries
        pos = 6 + 7 + 256 * 3 + 8  # header + GCT + GCE, at image descriptor
        assert b[pos] == 0x2C
        struct.pack_into("<HH", b, pos + 5, 16, 16)
        with pytest.raises(ValueError):
            mm.decode_gif(bytes(b))


class TestDensityPartitionerDistributed:
    """VERDICT r3 next-#3: adaptive_partitioning must not collect the
    fine-cell density to the driver — output identical to the old driver
    recursion, and the collected result is the bounded shard list."""

    def _points(self, spark, n=20_000):
        from s2geo_spark import functions as sf

        # hot cluster (80%) + uniform background
        hot = n * 8 // 10
        lat = np.concatenate(
            [47.37 + RNG.normal(0, 0.02, hot), RNG.uniform(-60, 60, n - hot)]
        )
        lon = np.concatenate(
            [8.54 + RNG.normal(0, 0.02, hot), RNG.uniform(-170, 170, n - hot)]
        )
        pdf = pd.DataFrame(
            {"pid": np.arange(n, dtype=np.int64), "lat": lat, "lon": lon}
        )
        return spark.createDataFrame(pdf).withColumn(
            "cell", sf.s2_cell_id("lat", "lon")
        )

    @staticmethod
    def _reference_recursion(dens_pdf, max_weight, start_level, max_level):
        from s2geo_spark.kernel import cellid_v1 as v1

        fine_cells = dens_pdf["dcell"].to_numpy().view(np.uint64)
        fine_w = dens_pdf["weight"].to_numpy()
        out = []

        def recurse(level, cells, weights):
            parents = v1.parent(cells, level)
            agg = {}
            for p, w in zip(parents.tolist(), weights.tolist()):
                agg[p] = agg.get(p, 0) + w
            for p, w in agg.items():
                if w <= max_weight or level >= max_level:
                    out.append((int(np.int64(np.uint64(p))), level, int(w)))
                else:
                    mask = parents == np.uint64(p)
                    recurse(
                        level + 2 if level + 2 <= max_level else max_level,
                        cells[mask],
                        weights[mask],
                    )

        recurse(start_level, fine_cells, fine_w)
        return sorted(out)

    def test_matches_driver_recursion(self, spark):
        from s2geo_spark.plans import density

        df = self._points(spark)
        got = density.adaptive_partitioning(
            df, max_weight=1500, start_level=2, max_level=10
        )
        dens = density.cell_density(df, 10).toPandas()
        want = self._reference_recursion(dens, 1500, 2, 10)
        got_t = sorted(
            (int(c), int(l), int(w))
            for c, l, w in zip(got["cell"], got["level"], got["weight"])
        )
        assert got_t == want
        # the collected frame is the SHARD LIST, not the fine density
        assert len(got) < len(dens)
        assert got["weight"].sum() == df.count()


class TestSpatialSizeGate:
    """VERDICT r3 next-#4: the quads/indexed join broadcasts must be
    size-gated (pattern: TestJaccardSizeGate) — parity both sides of the
    gate, plan-asserted."""

    def test_indexed_gate(self, spark):
        pts = _pts(spark)
        idx = spatial.build_index_df(
            spatial.polygons_to_df(spark, _layer(spark))
        ).cache()
        dflt = spatial.contains_join_indexed(pts, idx)
        opt = dflt._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" in opt or "broadcast" in opt.lower()  # small index -> broadcast by default
        base = sorted(
            (int(r["point_id"]), int(r["polygon_id"]))
            for r in dflt.select("point_id", "polygon_id").collect()
        )
        old = spatial.SPATIAL_BCAST_LIMIT
        spatial.SPATIAL_BCAST_LIMIT = 1  # force the shuffle fallback
        try:
            fb = spatial.contains_join_indexed(pts, idx)
            opt2 = fb._jdf.queryExecution().optimizedPlan().toString()
            assert "ResolvedHint" not in opt2 and "strategy=broadcast" not in opt2
            got = sorted(
                (int(r["point_id"]), int(r["polygon_id"]))
                for r in fb.select("point_id", "polygon_id").collect()
            )
        finally:
            spatial.SPATIAL_BCAST_LIMIT = old
        idx.unpersist()
        assert got == base and len(base) > 0

    def test_quads_gate(self, spark):
        pts = _pts(spark)
        cov_df, prepared = spatial.prepare_polygons(spark, _layer(spark))
        dflt = spatial.contains_join_quads(pts, cov_df, prepared)
        opt = dflt._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" in opt or "broadcast" in opt.lower()
        base = sorted(
            (int(r["point_id"]), int(r["polygon_id"]))
            for r in dflt.select("point_id", "polygon_id").collect()
        )
        old = spatial.SPATIAL_BCAST_LIMIT
        spatial.SPATIAL_BCAST_LIMIT = 1
        try:
            fb = spatial.contains_join_quads(pts, cov_df, prepared)
            opt2 = fb._jdf.queryExecution().optimizedPlan().toString()
            assert "ResolvedHint" not in opt2 and "strategy=broadcast" not in opt2
            got = sorted(
                (int(r["point_id"]), int(r["polygon_id"]))
                for r in fb.select("point_id", "polygon_id").collect()
            )
        finally:
            spatial.SPATIAL_BCAST_LIMIT = old
        assert got == base and len(base) > 0

    def test_contains_join_gate(self, spark):
        pts = _pts(spark)
        cov_df, prepared = spatial.prepare_polygons(spark, _layer(spark))
        base = sorted(
            (int(r["point_id"]), int(r["polygon_id"]))
            for r in spatial.contains_join(pts, cov_df, prepared)
            .select("point_id", "polygon_id")
            .collect()
        )
        old = spatial.SPATIAL_BCAST_LIMIT
        spatial.SPATIAL_BCAST_LIMIT = 1
        try:
            fb = spatial.contains_join(pts, cov_df, prepared)
            opt2 = fb._jdf.queryExecution().optimizedPlan().toString()
            assert "ResolvedHint" not in opt2 and "strategy=broadcast" not in opt2
            got = sorted(
                (int(r["point_id"]), int(r["polygon_id"]))
                for r in fb.select("point_id", "polygon_id").collect()
            )
        finally:
            spatial.SPATIAL_BCAST_LIMIT = old
        assert got == base and len(base) > 0
