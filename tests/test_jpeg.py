"""Baseline JPEG codec (operators/jpeg.py — VERDICT r3 next-#2): the
decode chain is pinned BIT-EXACTLY against an independent reference
reconstruction of the quantize->dequantize->IDCT pipeline, so any bug in
Huffman coding, zigzag, DC prediction, byte stuffing, or restart resync
shows up as a pixel mismatch, not a tolerance blur."""

import struct

import numpy as np
import pytest

from s2geo_spark.operators import jpeg
from s2geo_spark.operators import multimodal as mm

RNG = np.random.default_rng(19)


def _reference_gray(px: np.ndarray, quality: int) -> np.ndarray:
    """Independent reconstruction: what a correct decoder MUST output for
    a grayscale image our encoder wrote (float DCT path, no entropy
    coding involved)."""
    h, w = px.shape
    ql = jpeg.scaled_quant_table(jpeg.QUANT_LUMA, quality)
    plane = np.pad(
        px.astype(np.float64), ((0, -h % 8), (0, -w % 8)), mode="edge"
    )
    zz, by, bx = jpeg._quantize_plane(plane, ql)
    raster = np.zeros_like(zz)
    raster[:, jpeg.ZIGZAG] = zz
    sp = jpeg.idct2d((raster * ql).reshape(-1, 8, 8).astype(np.float64)) + 128
    out = np.clip(np.floor(sp + 0.5), 0, 255)
    out = out.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return out[:h, :w].astype(np.uint8)


class TestZigzag:
    def test_known_prefix_and_inverse(self):
        # T.81 figure A.6 first entries: (0,0)(0,1)(1,0)(2,0)(1,1)(0,2)...
        assert jpeg.ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
        assert jpeg.ZIGZAG[-1] == 63
        r = np.arange(64)
        assert np.array_equal(r[jpeg.ZIGZAG][jpeg.UNZIGZAG], r)


class TestGrayscale:
    def test_block_constant_lossless_at_q75(self):
        # quality 75 scales the luminance DC quantizer to exactly 8, so
        # constant 8x8 blocks survive the whole pipeline bit-for-bit —
        # the property the media_decode oracle builds on
        assert jpeg.scaled_quant_table(jpeg.QUANT_LUMA, 75)[0] == 8
        px = np.zeros((16, 24), dtype=np.uint8)
        for by in range(2):
            for bx in range(3):
                px[by * 8 :, bx * 8 : (bx + 1) * 8] = (91 * by + 37 * bx) % 256
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=75))
        assert out.shape == (16, 24, 1)
        assert np.array_equal(out[:, :, 0], px)

    @pytest.mark.parametrize("quality", [35, 75, 92])
    @pytest.mark.parametrize("shape", [(8, 8), (24, 17), (1, 1), (9, 40)])
    def test_random_bit_exact_vs_reference(self, quality, shape):
        px = RNG.integers(0, 256, shape).astype(np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=quality))
        assert np.array_equal(out[:, :, 0], _reference_gray(px, quality))

    def test_restart_markers_round_trip(self):
        px = RNG.integers(0, 256, (32, 48)).astype(np.uint8)
        b = jpeg.encode_jpeg(px, quality=75, restart_interval=3)
        assert b"\xff\xdd" in b  # DRI present
        out = jpeg.decode_jpeg(b)
        assert np.array_equal(out[:, :, 0], _reference_gray(px, 75))


class TestColor:
    def test_444_and_420_shapes_and_quality(self):
        yy, xx = np.meshgrid(np.arange(32), np.arange(40), indexing="ij")
        px = np.stack(
            [(yy * 3) % 256, (xx * 2) % 256, (yy + xx) % 256], axis=2
        ).astype(np.uint8)
        px = (px // 4 + 96).astype(np.uint8)
        for sub in ("444", "420"):
            out = jpeg.decode_jpeg(
                jpeg.encode_jpeg(px, quality=90, subsampling=sub)
            )
            assert out.shape == px.shape
            err = np.abs(out.astype(int) - px.astype(int)).mean()
            assert err < 2.0, f"{sub}: mean err {err}"

    def test_odd_dims_420(self):
        px = RNG.integers(0, 256, (13, 11, 3)).astype(np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=85, subsampling="420"))
        assert out.shape == (13, 11, 3)


class TestRobustness:
    def test_mode_confusion_rejected(self):
        # progressive now DECODES (TestProgressive); flipping a baseline
        # stream's SOF to SOF2 yields an ill-formed progressive scan
        # (Ss=0 with Se=63) that must be rejected, not misread
        px = np.zeros((8, 8), dtype=np.uint8)
        b = bytearray(jpeg.encode_jpeg(px))
        i = b.index(b"\xff\xc0")
        b[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(bytes(b))

    def test_arithmetic_coding_raises(self):
        px = np.zeros((8, 8), dtype=np.uint8)
        b = bytearray(jpeg.encode_jpeg(px))
        i = b.index(b"\xff\xc0")
        b[i + 1] = 0xC9  # arithmetic-coded sequential
        with pytest.raises(NotImplementedError):
            jpeg.decode_jpeg(bytes(b))

    def test_hostile_dims_rejected(self):
        px = np.zeros((8, 8), dtype=np.uint8)
        b = bytearray(jpeg.encode_jpeg(px))
        i = b.index(b"\xff\xc0")
        struct.pack_into(">HH", b, i + 5, 60_000, 60_000)  # h, w in SOF
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(bytes(b))

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(b"\x00\x01\x02\x03")


class TestDispatchAndPlumbing:
    def test_decode_media_dispatch(self):
        px = RNG.integers(0, 256, (16, 16)).astype(np.uint8)
        dec = mm.decode_media(jpeg.encode_jpeg(px, quality=75))
        assert dec["kind"] == "jpeg"
        assert (dec["width"], dec["height"]) == (16, 16)
        assert np.array_equal(dec["pixels"][:, :, 0], _reference_gray(px, 75))

    def test_sniff(self):
        px = np.zeros((8, 8), dtype=np.uint8)
        assert mm._sniff_format(jpeg.encode_jpeg(px)[:16]) == "jpeg"

    def test_resize_media_reencodes_jpeg(self, spark):
        px = RNG.integers(0, 256, (24, 24, 3)).astype(np.uint8)
        df = spark.createDataFrame(
            [("j", bytearray(jpeg.encode_jpeg(px, quality=85)))],
            "key string, payload binary",
        )
        out = mm.resize_media(df, "key", "payload", 8, 8).toPandas()
        assert len(out) == 1
        resized = mm.decode_media(bytes(out.iloc[0]["resized"]))
        assert resized["kind"] == "jpeg"
        assert (resized["width"], resized["height"]) == (8, 8)


class TestOracleFixtureMargins:
    """The media_decode color-JPEG oracle is closed-form ONLY when no
    quantize/reconstruct site lands on a floor boundary (where the
    decoder's ~1e-13 IDCT float error would decide the pixel). Pin the
    fixture constants' safety for every nation key the driver uses."""

    def test_color_fixture_boundary_margins(self):
        import math

        for n in range(25):
            for b in (0, 1):
                R = (n * 34 + b * 53 + 212) % 225 + 16
                G = (n * 31 + b * 59 + 4) % 225 + 16
                B = (n * 50 + b * 61 + 203) % 225 + 16
                y0 = 0.299 * R + 0.587 * G + 0.114 * B
                cb0 = 128.0 - 0.168735892 * R - 0.331264108 * G + 0.5 * B
                cr0 = 128.0 + 0.5 * R - 0.418687589 * G - 0.081312411 * B
                for p, q in ((y0, 8), (cb0, 9), (cr0, 9)):
                    x = abs(8 * (p - 128)) / q + 0.5
                    assert abs(x - round(x)) > 1e-6, (n, b, p, q)
                    dq = math.floor(abs(8 * (p - 128)) / q + 0.5) * (
                        1 if p >= 128 else -1
                    )
                    if q == 9:
                        # chroma DCq == 4 (mod 8) reconstructs to an
                        # exact integer boundary — must never occur
                        assert dq % 8 != 4, (n, b)

    def test_color_fixture_matches_decoder(self):
        """Closed-form pixel prediction == the real decoder, per key."""
        import math

        from s2geo_spark.operators import jpeg
        from s2geo_spark.operators import multimodal as mm

        def rec(p, q):
            dq = math.floor(abs(8 * (p - 128)) / q + 0.5) * (
                1 if p >= 128 else -1
            )
            return min(255, max(0, math.floor(dq * q / 8.0 + 128 + 0.5)))

        for n in range(25):
            cy, cx = np.meshgrid(np.arange(8), np.arange(16), indexing="ij")
            blk = cx // 8
            cpx = np.stack(
                [
                    (n * 34 + blk * 53 + 212) % 225 + 16,
                    (n * 31 + blk * 59 + 4) % 225 + 16,
                    (n * 50 + blk * 61 + 203) % 225 + 16,
                ],
                axis=2,
            ).astype(np.uint8)
            dec = mm.decode_media(
                jpeg.encode_jpeg(cpx, quality=75, subsampling="444")
            )["pixels"]
            for b in (0, 1):
                R, G, B = (int(cpx[0, 8 * b, c]) for c in range(3))
                y0 = 0.299 * R + 0.587 * G + 0.114 * B
                cb0 = 128.0 - 0.168735892 * R - 0.331264108 * G + 0.5 * B
                cr0 = 128.0 + 0.5 * R - 0.418687589 * G - 0.081312411 * B
                ry, rcb, rcr = rec(y0, 8), rec(cb0, 9), rec(cr0, 9)
                want = (
                    min(255, max(0, math.floor(ry + 1.402 * (rcr - 128.0) + 0.5))),
                    min(255, max(0, math.floor(
                        ry - 0.344136286 * (rcb - 128.0)
                        - 0.714136286 * (rcr - 128.0) + 0.5))),
                    min(255, max(0, math.floor(ry + 1.772 * (rcb - 128.0) + 0.5))),
                )
                assert tuple(int(v) for v in dec[0, 8 * b]) == want, (n, b)
                assert np.all(dec[:, 8 * b : 8 * b + 8] == np.array(want)), (n, b)


class TestProgressive:
    """SOF2 progressive DCT (r4 stretch): progressive only reorders the
    SAME quantized coefficients, so decode(progressive) must equal
    decode(baseline) BIT FOR BIT on the same image and quality."""

    @pytest.mark.parametrize("shape", [(8, 8), (16, 24), (9, 13), (40, 33)])
    @pytest.mark.parametrize("quality", [35, 75, 92])
    def test_gray_equals_baseline(self, shape, quality):
        px = RNG.integers(0, 256, shape).astype(np.uint8)
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=quality))
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(px, quality=quality)
        )
        assert np.array_equal(base, prog)

    @pytest.mark.parametrize("shape", [(16, 16, 3), (21, 19, 3), (40, 56, 3)])
    def test_color_equals_baseline(self, shape):
        px = RNG.integers(0, 256, shape).astype(np.uint8)
        base = jpeg.decode_jpeg(
            jpeg.encode_jpeg(px, quality=80, subsampling="444")
        )
        prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(px, quality=80))
        assert np.array_equal(base, prog)

    def test_sparse_high_frequency_refinement_runs(self):
        """Craft images from sparse DCT coefficients so the refinement
        scans must walk long zero-history runs (the ZRL-in-refinement
        and deep-skip paths)."""
        ql = jpeg.scaled_quant_table(jpeg.QUANT_LUMA, 75)
        for kpos in (40, 55, 63):
            coefs = np.zeros((1, 64))
            coefs[0, jpeg.ZIGZAG[kpos]] = 5.0 * ql[jpeg.ZIGZAG[kpos]]
            coefs[0, 0] = 8.0 * 16  # mild DC so pixels stay in range
            sp = jpeg.idct2d(coefs.reshape(1, 8, 8)) + 128
            px = np.clip(np.floor(sp + 0.5), 0, 255)[0].astype(np.uint8)
            base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=75))
            prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(px, quality=75))
            assert np.array_equal(base, prog), kpos

    def test_decode_media_dispatches_progressive(self):
        px = RNG.integers(0, 256, (16, 16)).astype(np.uint8)
        dec = mm.decode_media(jpeg.encode_jpeg_progressive(px, quality=75))
        assert dec["kind"] == "jpeg"
        assert np.array_equal(
            dec["pixels"],
            jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=75)),
        )

    def test_foreign_eobrun_gt1_path(self):
        """Hand-roll a progressive stream with a CUSTOM Huffman table
        containing EOBn (r>0) symbols — the accumulated-EOB-run decode
        path our encoder never emits (it uses per-block EOBs because the
        Annex-K tables lack EOBn codes)."""
        import struct as _st

        # image: 4 blocks wide, 1 tall, all-zero AC band; DC = 0
        w, h = 32, 8
        # custom AC table: symbols 0x00 (EOB1), 0x20 (EOB4), 0x01
        bits = [0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
        vals = [0x00, 0x20, 0x01]
        enc = jpeg._build_encoder(bits, vals)

        out = bytearray(b"\xff\xd8")
        ql = jpeg.scaled_quant_table(jpeg.QUANT_LUMA, 75)
        out += jpeg._segment(
            0xDB, bytes([0x00]) + bytes(ql[jpeg.ZIGZAG].tolist())
        )
        sof = _st.pack(">BHHB", 8, h, w, 1) + _st.pack(">BBB", 1, 0x11, 0)
        out += jpeg._segment(0xC2, sof)
        dcb, dcv = jpeg.HUFF_DC_LUMA
        out += jpeg._segment(
            0xC4, bytes([0x00]) + bytes(dcb) + bytes(dcv)
        )
        out += jpeg._segment(
            0xC4, bytes([0x10]) + bytes(bits) + bytes(vals)
        )
        # DC first scan: 4 blocks, all diffs zero
        out += jpeg._segment(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
        bw = jpeg._BitWriter()
        dctab = jpeg._build_encoder(*jpeg.HUFF_DC_LUMA)
        for _ in range(4):
            code, ln = dctab[0]
            bw.write(code, ln)
        out += bw.flush()
        # AC first scan 1..63 with ONE EOB4 covering all four blocks
        out += jpeg._segment(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
        bw = jpeg._BitWriter()
        code, ln = enc[0x20]  # EOBn with r=2 -> run = 4 + 2 appended bits
        bw.write(code, ln)
        bw.write(0, 2)  # EOBRUN = (1<<2) + 0 = 4
        out += bw.flush()
        out += b"\xff\xd9"
        dec = jpeg.decode_jpeg(bytes(out))
        # DC 0 everywhere -> flat 128 gray
        assert dec.shape == (8, 32, 1)
        assert np.all(dec == 128)

    def test_progressive_with_dri_decodes(self):
        # progressive + restart intervals (T.81 E.2.4): RST markers in
        # every scan, DC predictors and EOB runs reset at each boundary;
        # output must equal the baseline decode of the same image
        rng = np.random.default_rng(77)
        for px, dri in [
            (rng.integers(0, 256, (41, 33), dtype=np.uint8), 3),
            (rng.integers(0, 256, (24, 24, 3), dtype=np.uint8), 2),
        ]:
            base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=75))
            prog = jpeg.decode_jpeg(
                jpeg.encode_jpeg_progressive(px, quality=75,
                                             restart_interval=dri)
            )
            assert np.array_equal(base, prog)
        # the progressive stream must actually carry RST markers
        payload = jpeg.encode_jpeg_progressive(
            rng.integers(0, 256, (32, 32), dtype=np.uint8),
            restart_interval=2,
        )
        assert any(
            payload.find(bytes([0xFF, 0xD0 + i])) >= 0 for i in range(8)
        )

    def test_progressive_dri_without_rst_markers_rejected(self):
        # a DRI header promising restarts that never appear is corrupt:
        # the reader must fail loudly, not decode garbage
        px = np.zeros((24, 24), dtype=np.uint8)
        b = bytearray(jpeg.encode_jpeg_progressive(px))
        i = b.index(b"\xff\xda")
        dri = jpeg._segment(0xDD, struct.pack(">H", 2))
        b2 = bytes(b[:i]) + dri + bytes(b[i:])
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(b2)


class TestVectorizedScanDecode:
    """The lane-parallel (restart-interval) entropy decoder must be
    bit-identical to the scalar reader on every stream shape that can
    reach it, and must actually be selected when restarts are present."""

    def _roundtrip_both(self, px, sub, dri, quality=75):
        payload = jpeg.encode_jpeg(
            px, quality=quality, subsampling=sub, restart_interval=dri
        )
        orig = jpeg._decode_scan
        try:
            jpeg._decode_scan = jpeg._decode_scan_scalar
            ref = jpeg.decode_jpeg(payload)
        finally:
            jpeg._decode_scan = orig
        fast = jpeg.decode_jpeg(payload)
        assert np.array_equal(ref, fast)
        return ref

    def test_gray_bit_exact_across_dri(self):
        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, (120, 130), dtype=np.uint8)
        for dri in (1, 2, 3, 8, 64):
            self._roundtrip_both(px, "444", dri)

    def test_color_bit_exact_420_and_444(self):
        rng = np.random.default_rng(8)
        px = rng.integers(0, 256, (70, 90, 3), dtype=np.uint8)
        self._roundtrip_both(px, "420", 4)
        self._roundtrip_both(px, "444", 4)

    def test_partial_last_interval_and_edge_mcus(self):
        # 41x33: non-multiple-of-8 dims AND a short final restart interval
        rng = np.random.default_rng(9)
        px = rng.integers(0, 256, (41, 33), dtype=np.uint8)
        self._roundtrip_both(px, "444", 7)

    def test_extreme_quality_magnitude_bits(self):
        # quality 95 -> small quantizers -> wide magnitude fields; exercises
        # the 64-bit window's worst-case sh+len+size packing
        rng = np.random.default_rng(10)
        px = rng.integers(0, 256, (64, 64), dtype=np.uint8)
        self._roundtrip_both(px, "444", 2, quality=95)
        self._roundtrip_both(px, "444", 2, quality=5)

    def test_vector_path_selected(self, monkeypatch):
        called = {}
        orig = jpeg._decode_scan_vec

        def spy(*a, **kw):
            called["vec"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(jpeg, "_decode_scan_vec", spy)
        px = np.zeros((32, 32), dtype=np.uint8)
        jpeg.decode_jpeg(jpeg.encode_jpeg(px, restart_interval=2))
        assert called.get("vec")
        # no restarts -> scalar path, vec never called
        called.clear()
        jpeg.decode_jpeg(jpeg.encode_jpeg(px))
        assert not called

    def test_multiscan_sequential_444(self):
        # spec-legal non-interleaved sequential (one scan per component,
        # T.81 A.2.2) decodes bit-identically to the interleaved stream
        # of the same image
        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
        a = jpeg.decode_jpeg(jpeg.encode_jpeg(px, subsampling="444"))
        b = jpeg.decode_jpeg(
            jpeg.encode_jpeg(px, subsampling="444", multiscan=True)
        )
        assert np.array_equal(a, b)

    def test_multiscan_sequential_420_odd_dims(self):
        # 420 with odd dims: the full-res component's non-interleaved
        # grid is SMALLER than the MCU-padded grid (17 rows -> 3 block
        # rows vs mcuy*vmax = 4) — exercises the ceil-grid block order
        rng = np.random.default_rng(12)
        px = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
        a = jpeg.decode_jpeg(jpeg.encode_jpeg(px, subsampling="420"))
        b = jpeg.decode_jpeg(
            jpeg.encode_jpeg(px, subsampling="420", multiscan=True)
        )
        assert np.array_equal(a, b)

    def test_multiscan_sequential_restart_intervals(self):
        rng = np.random.default_rng(13)
        px = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
        a = jpeg.decode_jpeg(jpeg.encode_jpeg(px, subsampling="420"))
        b = jpeg.decode_jpeg(
            jpeg.encode_jpeg(
                px, subsampling="420", restart_interval=3, multiscan=True
            )
        )
        assert np.array_equal(a, b)

    def test_multiscan_missing_component_raises(self):
        # a multi-scan stream that never covers component 3 must raise,
        # not return a plausible-but-wrong image
        px = np.full((8, 8, 3), 90, dtype=np.uint8)
        b = bytes(jpeg.encode_jpeg(px, multiscan=True))
        # drop the last scan: truncate at the third SOS, re-append EOI
        third_sos = b.rindex(b"\xff\xda")
        b2 = b[:third_sos] + b"\xff\xd9"
        with pytest.raises(ValueError, match="missing component"):
            jpeg.decode_jpeg(b2)

    def test_multiscan_duplicate_component_raises(self):
        px = np.full((8, 8, 3), 90, dtype=np.uint8)
        b = bytes(jpeg.encode_jpeg(px, multiscan=True))
        # duplicate the first scan (up to the second SOS) after itself
        first = b.index(b"\xff\xda")
        second = b.index(b"\xff\xda", first + 2)
        b2 = b[:second] + b[first:second] + b[second:]
        with pytest.raises(ValueError, match="scanned twice"):
            jpeg.decode_jpeg(b2)


class Test12Bit:
    """12-bit extended-sequential grayscale (late r5): level shift 2048,
    uint16 output, generated Huffman tables (DC categories to 15, AC
    sizes to 14)."""

    def test_block_constant_exact(self):
        jy, jx = np.meshgrid(np.arange(16), np.arange(24), indexing="ij")
        px = ((7 * 53 + (jx // 8) * 173 + (jy // 8) * 311) % 4096).astype(
            np.uint16
        )
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=75, precision=12))
        assert dec.dtype == np.uint16
        assert (dec[:, :, 0] == px).all()

    def test_vectorized_matches_scalar_and_extremes(self):
        g = (
            (np.arange(32)[:, None] * 97 + np.arange(40)[None, :] * 13) % 4096
        ).astype(np.uint16)
        d0 = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90, precision=12))
        d1 = jpeg.decode_jpeg(
            jpeg.encode_jpeg(g, quality=90, precision=12, restart_interval=1)
        )
        assert (d0 == d1).all()
        e = np.repeat(
            np.repeat(np.array([[0, 4095], [4095, 0]], np.uint16), 8, 0), 8, 1
        )
        de = jpeg.decode_jpeg(jpeg.encode_jpeg(e, quality=75, precision=12))
        assert (de[:, :, 0] == e).all()  # full-range DC diffs survive

    def test_honest_raises(self):
        with pytest.raises(NotImplementedError):
            jpeg.encode_jpeg(np.zeros((8, 8, 3), np.uint16), precision=12)
        with pytest.raises(NotImplementedError):
            jpeg.encode_jpeg(np.zeros((8, 8), np.uint8), precision=10)
        with pytest.raises(ValueError):
            jpeg.encode_jpeg(
                np.full((8, 8), 5000, np.uint16), precision=12
            )

    def test_eight_bit_output_unchanged(self):
        p8 = (
            (np.arange(16)[:, None] * 7 + np.arange(16)[None, :] * 3) % 256
        ).astype(np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(p8, quality=75))
        assert out.dtype == np.uint8
