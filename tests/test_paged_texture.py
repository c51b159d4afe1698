"""Paged virtual-texture sampler vs the gather-path oracle
(ops/paged_texture.py vs ops/texture.py sample_pool — identical
semantics: u wraps, taps clamp, shared mip; reference analog is bindless
texture sampling in lighting.hlsl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from chord_tpu.asset.texture import TexturePool
from chord_tpu.ops import paged_texture as pt
from chord_tpu.ops.texture import sample_pool


def _make_pool(n_layers=2, size=64, seed=0):
    tp = TexturePool(size)
    rng = np.random.default_rng(seed)
    for i in range(n_layers):
        tp.add(f"t{i}", rng.random((size, size, 4)).astype(np.float32))
    np_pool = np.asarray(tp.device_array())
    pages, meta, n_mips = pt.pack_paged_pool(
        np_pool, tp.mip_sizes, tp.mip_offsets)
    return tp, np_pool, pages, meta, n_mips


def _oracle(tp, np_pool, layers, uv, mip, bilinear=True):
    pool = jnp.asarray(np_pool)
    return np.stack([np.asarray(sample_pool(
        pool, tuple(tp.mip_sizes), tuple(tp.mip_offsets),
        jnp.asarray(layers[c]), jnp.asarray(uv), jnp.asarray(mip),
        bilinear=bilinear)) for c in range(layers.shape[0])])


def _coherent_field(H, W, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    u = xx / W * 1.7 + 0.1 * np.sin(yy / 17)
    v = yy / H * 1.3
    return np.stack([u, v], -1)


@pytest.mark.parametrize("bilinear", [True, False])
def test_parity_with_sample_pool(bilinear):
    tp, np_pool, pages, meta, n_mips = _make_pool()
    H, W = 32, 128
    uv = _coherent_field(H, W)
    layers = np.stack([np.zeros((H, W), np.int32),
                       np.ones((H, W), np.int32)])
    mip = np.full((H, W), 1, np.int32)
    out, cov = pt.paged_sample(
        pages, meta, n_mips, tp.mip_sizes, jnp.asarray(layers),
        jnp.asarray(uv), jnp.asarray(mip), bilinear=bilinear,
        block_h=16, k_pages=10, with_coverage=True)
    out = np.asarray(out)
    cov = np.asarray(cov)
    ref = _oracle(tp, np_pool, layers, uv, mip, bilinear=bilinear)
    assert cov.mean() > 0.95
    # covered pixels match within the u8 quantization of the filtered
    # result (nearest: exact — the tap IS a u8 texel)
    tol = (1.5 / 255.0) if bilinear else (1e-6)
    assert np.abs(out[cov] - ref[cov]).max() <= tol


@pytest.mark.slow
def test_untextured_identity_and_edges():
    tp, np_pool, pages, meta, n_mips = _make_pool()
    H, W = 16, 128
    uv = np.zeros((H, W, 2), np.float32)
    uv[:, :64, 0] = 0.999999           # clamp at the top edge
    uv[:, 64:, 0] = -0.25              # negative wraps
    uv[..., 1] = np.linspace(0, 1, H)[:, None]
    layers = np.full((1, H, W), -1, np.int32)   # all untextured
    mip = np.zeros((H, W), np.int32)
    out = np.asarray(pt.paged_sample(
        pages, meta, n_mips, tp.mip_sizes, jnp.asarray(layers),
        jnp.asarray(uv), jnp.asarray(mip), block_h=16))
    np.testing.assert_allclose(out, 1.0)        # multiplicative identity

    layers0 = np.zeros((1, H, W), np.int32)
    out = np.asarray(pt.paged_sample(
        pages, meta, n_mips, tp.mip_sizes, jnp.asarray(layers0),
        jnp.asarray(uv), jnp.asarray(mip), block_h=16))
    ref = _oracle(tp, np_pool, layers0, uv, mip)
    assert np.abs(out - ref).max() <= 1.5 / 255.0


def test_mip_variation_parity():
    tp, np_pool, pages, meta, n_mips = _make_pool()
    H, W = 32, 128
    uv = _coherent_field(H, W, seed=3)
    layers = np.zeros((1, H, W), np.int32)
    # every mip incl. the 1x1 tail appears
    mip = (np.arange(H)[:, None] * n_mips // H * np.ones(
        (1, W), np.int64)).astype(np.int32)
    out, cov = pt.paged_sample(
        pages, meta, n_mips, tp.mip_sizes, jnp.asarray(layers),
        jnp.asarray(uv), jnp.asarray(mip), block_h=16, k_pages=12,
        with_coverage=True)
    out = np.asarray(out)
    cov = np.asarray(cov)
    ref = _oracle(tp, np_pool, layers, uv, mip)
    assert cov.mean() > 0.9
    assert np.abs(out[cov] - ref[cov]).max() <= 1.5 / 255.0


def test_palette_overflow_falls_back_to_coarse_mip():
    """Adversarial incoherent uv: uncovered pixels sample the guaranteed
    single-page coarse mip (first size <= 16) — a blurrier texture read,
    same failure direction as trilinear's coarse end, never flat color,
    never garbage/NaN."""
    tp, np_pool, pages, meta, n_mips = _make_pool(n_layers=3)
    H, W = 16, 128
    rng = np.random.default_rng(7)
    uv = rng.random((H, W, 2)).astype(np.float32)
    layers = rng.integers(0, 3, (1, H, W)).astype(np.int32)
    mip = np.zeros((H, W), np.int32)
    out, cov = pt.paged_sample(
        pages, meta, n_mips, tp.mip_sizes, jnp.asarray(layers),
        jnp.asarray(uv), jnp.asarray(mip), block_h=16, k_pages=4,
        with_coverage=True)
    out = np.asarray(out)
    cov = np.asarray(cov)
    assert np.isfinite(out).all() and (out >= 0).all() and (out <= 1).all()
    miss = ~cov[0]
    assert miss.any()                   # the test is only honest if K overflows
    fb_idx = next(m for m, s in enumerate(tp.mip_sizes) if s <= 16)
    ref_fb = _oracle(tp, np_pool, layers, uv,
                     np.full((H, W), fb_idx, np.int32))
    assert np.abs(out[0][miss] - ref_fb[0][miss]).max() <= 1.5 / 255.0


def test_pool_packing_layout():
    tp, np_pool, pages, meta, n_mips = _make_pool(n_layers=1, size=64)
    # 64: 3x3 tiles; 32: 2x2; <=31: 1 each -> 9+4+1*5 = 18 pages
    assert np.asarray(pages).shape == (18 * 8, 128)
    base = np.asarray(meta)[0]
    assert base[0] == 0 and base[1] == 9 and base[2] == 13


# --- block-compressed pool (pack_paged_pool compress=True) ---------------

def test_compress_page_roundtrip_exactness():
    """Constant and two-color blocks are reproduced exactly; a smooth
    linear ramp stays within the 4-level quantization bound."""
    # constant page
    img = np.full((32, 32, 4), 173, np.uint8)
    dec = pt.decompress_page(pt.compress_page(img))
    np.testing.assert_array_equal(dec, img)
    # two-color checker (both colors are endpoints -> exact)
    img = np.zeros((32, 32, 4), np.uint8)
    img[::2, :, :] = np.array([200, 40, 10, 255], np.uint8)
    img[1::2, :, :] = np.array([20, 180, 90, 0], np.uint8)
    dec = pt.decompress_page(pt.compress_page(img))
    np.testing.assert_array_equal(dec, img)
    # smooth ramp along x: max error bounded by half a quantization step
    # of the 4-level ramp over each 4-texel block span (<= ~6 levels here)
    ramp = np.linspace(0, 255, 32).astype(np.uint8)
    img = np.broadcast_to(ramp[None, :, None], (32, 32, 4)).copy()
    dec = pt.decompress_page(pt.compress_page(img))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


def test_compressed_pool_kernel_matches_host_decode():
    """The Pallas stage-time decode is bit-identical to decompress_page:
    nearest sampling of the compressed pool == sample_pool over the
    host-decompressed texels."""
    tp, np_pool, _, _, _ = _make_pool(n_layers=2, size=64)
    pages_c, meta_c, n_mips = pt.pack_paged_pool(
        np_pool, tp.mip_sizes, tp.mip_offsets, compress=True)
    assert np.asarray(meta_c).shape[0] == 3           # format marker
    assert np.asarray(pages_c).shape == (18 * 2 * 2, 128)  # 4x smaller

    # host-decompress every page back into a flat pool for the oracle
    comp = np.asarray(pages_c).view(np.uint32)
    base = np.asarray(meta_c)[0]
    dec_pool = np.array(np_pool)
    for layer in range(2):
        for m, (s, off) in enumerate(zip(tp.mip_sizes, tp.mip_offsets)):
            e = layer * n_mips + m
            tcnt = pt._tiles(s)
            for ty in range(tcnt):
                for tx in range(tcnt):
                    p = base[e] + ty * tcnt + tx
                    dec = pt.decompress_page(comp[p * 2:(p + 1) * 2])
                    # usable texels only (apron duplicates neighbors)
                    for sy in range(min(pt.USABLE, s)):
                        gy = ty * pt.USABLE + sy
                        if gy >= s:
                            break
                        gx0 = tx * pt.USABLE
                        n = min(pt.USABLE, s - gx0)
                        dec_pool[layer, off + gy * s + gx0:
                                 off + gy * s + gx0 + n] = dec[sy, :n]

    H, W = 32, 128
    uv = _coherent_field(H, W, seed=5)
    layers = np.stack([np.zeros((H, W), np.int32),
                       np.ones((H, W), np.int32)])
    mip = np.full((H, W), 1, np.int32)
    out, cov = pt.paged_sample(
        pages_c, meta_c, n_mips, tp.mip_sizes, jnp.asarray(layers),
        jnp.asarray(uv), jnp.asarray(mip), bilinear=False,
        block_h=16, k_pages=10, with_coverage=True)
    out = np.asarray(out)
    cov = np.asarray(cov)
    ref = _oracle(tp, dec_pool, layers, uv, mip, bilinear=False)
    assert cov.mean() > 0.95
    assert np.abs(out[cov] - ref[cov]).max() <= 1e-6


@pytest.mark.slow
def test_compressed_pool_quality_gate():
    """Compression error on a coherent (texture-like) image stays small:
    PSNR >= 32 dB vs the raw paged sampler on the same taps."""
    size = 64
    tp = TexturePool(size)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.stack([0.5 + 0.4 * np.sin(xx * 9 + yy * 3),
                    0.5 + 0.4 * np.cos(yy * 7),
                    0.5 + 0.3 * np.sin((xx + yy) * 5),
                    np.ones_like(xx)], -1)
    tp.add("t", img.astype(np.float32))
    np_pool = np.asarray(tp.device_array())
    pages_r, meta_r, n_mips = pt.pack_paged_pool(
        np_pool, tp.mip_sizes, tp.mip_offsets)
    pages_c, meta_c, _ = pt.pack_paged_pool(
        np_pool, tp.mip_sizes, tp.mip_offsets, compress=True)
    H, W = 32, 128
    uv = _coherent_field(H, W, seed=9)
    layers = np.zeros((1, H, W), np.int32)
    mip = np.zeros((H, W), np.int32)
    a = np.asarray(pt.paged_sample(
        pages_r, meta_r, n_mips, tp.mip_sizes, jnp.asarray(layers),
        jnp.asarray(uv), jnp.asarray(mip), block_h=16, k_pages=10))
    b = np.asarray(pt.paged_sample(
        pages_c, meta_c, n_mips, tp.mip_sizes, jnp.asarray(layers),
        jnp.asarray(uv), jnp.asarray(mip), block_h=16, k_pages=10))
    mse = float(((a - b) ** 2).mean())
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 32.0, psnr
