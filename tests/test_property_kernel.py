"""Hypothesis property tests over the kernel's algebraic laws — the
reference's own test strategy (randomized invariants, SURVEY §5) driven by
a shrinking fuzzer instead of fixed RNG sweeps."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from s2geo_spark.kernel import cellid_v1 as v1
from s2geo_spark.kernel import cellunion, h3, metrics

lat_st = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
lon_st = st.floats(min_value=-180.0, max_value=179.999, allow_nan=False)
level_st = st.integers(min_value=0, max_value=30)


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lon=lon_st)
def test_token_roundtrip(lat, lon):
    cid = v1.from_latlng(np.array([lat]), np.array([lon]))
    tok = v1.to_token(cid)
    assert (v1.from_token(tok) == cid).all()


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lon=lon_st, level=level_st)
def test_parent_contains_leaf(lat, lon, level):
    leaf = v1.from_latlng(np.array([lat]), np.array([lon]))
    par = v1.parent(leaf, level)
    assert v1.level(par)[0] == level
    assert v1.range_min(par)[0] <= leaf[0] <= v1.range_max(par)[0]
    # parent-of-parent laws
    if level > 0:
        gp = v1.parent(leaf, level - 1)
        assert (v1.parent(par, level - 1) == gp).all()


@settings(max_examples=100, deadline=None)
@given(lat=lat_st, lon=lon_st, level=st.integers(min_value=0, max_value=29))
def test_children_partition_parent(lat, lon, level):
    cell = v1.parent(v1.from_latlng(np.array([lat]), np.array([lon])), level)
    kids = v1.child(np.repeat(cell, 4), np.arange(4))
    assert (v1.parent(kids, level) == cell[0]).all()
    # children ranges tile the parent's range exactly
    rmins = np.sort(v1.range_min(kids))
    rmaxs = np.sort(v1.range_max(kids))
    assert rmins[0] == v1.range_min(cell)[0]
    assert rmaxs[-1] == v1.range_max(cell)[0]
    for a, b in zip(rmaxs[:-1], rmins[1:]):
        assert int(b) - int(a) == 2  # adjacent leaf step


@settings(max_examples=100, deadline=None)
@given(
    lats=st.lists(lat_st, min_size=1, max_size=10),
    lons=st.lists(lon_st, min_size=1, max_size=10),
    level=st.integers(min_value=2, max_value=12),
)
def test_normalize_idempotent_and_containing(lats, lons, level):
    n = min(len(lats), len(lons))
    cells = v1.parent(
        v1.from_latlng(np.array(lats[:n]), np.array(lons[:n])), level
    )
    norm = cellunion.normalize(cells)
    assert (cellunion.normalize(norm) == norm).all()
    assert cellunion.contains_id(norm, cells).all()


@settings(max_examples=100, deadline=None)
@given(lat=lat_st, lon=lon_st, res=st.integers(min_value=0, max_value=15))
def test_h3_roundtrip_property(lat, lon, res):
    h = h3.geo_to_h3(np.array([lat]), np.array([lon]), res)
    assert h3.is_valid(h).all()
    clat, clon = h3.h3_to_geo(h)
    assert (h3.geo_to_h3(clat, clon, res) == h).all()


@settings(max_examples=100, deadline=None)
@given(value=st.floats(min_value=1e-8, max_value=0.94, allow_nan=False))
def test_metric_level_inversion(value):
    # values above the level-0 metric clamp to 0 (reference behavior);
    # within range, level_for_min_value is the exact inversion
    lv = int(metrics.level_for_min_value(metrics.MIN_WIDTH_DERIV, np.array([value]))[0])
    assert metrics.metric_value(metrics.MIN_WIDTH_DERIV, lv) >= value or lv == 30
    if lv < 30:
        assert metrics.metric_value(metrics.MIN_WIDTH_DERIV, lv + 1) < value or lv == 0


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_ppm_round_trip_property(h, w, seed):
    from s2geo_spark.operators import multimodal as mm

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(mm.decode_bmp(mm.encode_bmp(px)), px)
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(px)), px)


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=500),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_round_trip_property(n, rate, seed):
    from s2geo_spark.operators import multimodal as mm

    s = (
        np.random.default_rng(seed)
        .integers(-32768, 32768, n)
        .astype(np.int16)
    )
    r2, s2 = mm.decode_wav(mm.encode_wav(s, rate=rate))
    assert r2 == rate and np.array_equal(s, s2)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=10),
    w=st.integers(min_value=1, max_value=10),
    th=st.integers(min_value=1, max_value=10),
    tw=st.integers(min_value=1, max_value=10),
)
def test_resize_nn_property(h, w, th, tw):
    from s2geo_spark.operators import multimodal as mm

    px = (np.arange(h * w * 3, dtype=np.int64) % 256).astype(np.uint8).reshape(h, w, 3)
    out = mm.resize_image_nn(px, tw, th)
    assert out.shape == (th, tw, 3)
    # every output pixel equals its floor-mapped source pixel
    for y in range(th):
        for x in range(tw):
            assert (out[y, x] == px[(y * h) // th, (x * w) // tw]).all()


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    quality=st.integers(min_value=20, max_value=95),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_gray_bit_exact_property(h, w, quality, seed):
    """Decoded grayscale JPEG == the independent quantize-dequantize-IDCT
    reference reconstruction, bit for bit, for arbitrary dims/quality —
    pins the whole Huffman/zigzag/DC-prediction/byte-stuffing chain."""
    from s2geo_spark.operators import jpeg

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w)).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=quality))[:, :, 0]

    ql = jpeg.scaled_quant_table(jpeg.QUANT_LUMA, quality)
    plane = np.pad(
        px.astype(np.float64), ((0, -h % 8), (0, -w % 8)), mode="edge"
    )
    zz, by, bx = jpeg._quantize_plane(plane, ql)
    raster = np.zeros_like(zz)
    raster[:, jpeg.ZIGZAG] = zz
    sp = jpeg.idct2d((raster * ql).reshape(-1, 8, 8).astype(np.float64)) + 128
    ref = np.clip(np.floor(sp + 0.5), 0, 255)
    ref = ref.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    assert np.array_equal(out, ref[:h, :w].astype(np.uint8))


@given(
    bh=st.integers(min_value=1, max_value=3),
    bw=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_block_constant_lossless_property(bh, bw, seed):
    """At quality 75 the scaled luminance DC quantizer is exactly 8, so
    8x8-block-constant images survive losslessly — the invariant the
    media_decode SQL oracle is built on."""
    from s2geo_spark.operators import jpeg

    rng = np.random.default_rng(seed)
    px = np.repeat(
        np.repeat(rng.integers(0, 256, (bh, bw)).astype(np.uint8), 8, 0), 8, 1
    )
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=75))
    assert np.array_equal(out[:, :, 0], px)
