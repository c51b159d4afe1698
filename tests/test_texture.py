"""Texture pipeline: mips, pool layout, sampling (reference:
asset/texture/asset_texture_helper.cpp import + mip chain)."""

import jax.numpy as jnp
import numpy as np
import pytest

from chord_tpu.asset.texture import TexturePool, build_mips
from chord_tpu.ops.texture import mip_from_uv_density, sample_pool


def test_mip_chain():
    img = np.random.default_rng(0).random((64, 32, 4)).astype(np.float32)
    mips = build_mips(img)
    assert mips[0].shape == (64, 32, 4)
    assert mips[-1].shape[0] == 1 or mips[-1].shape[1] == 1
    # box filter preserves the mean
    np.testing.assert_allclose(mips[0].mean(), mips[2].mean(), atol=1e-3)


def test_pool_layout_and_sampling():
    tp = TexturePool(64)
    red = np.zeros((64, 64, 4), np.float32)
    red[..., 0] = 1.0
    blue = np.zeros((32, 32, 4), np.float32)   # resized up to 64
    blue[..., 2] = 1.0
    l0 = tp.add("red", red)
    l1 = tp.add("blue", blue)
    assert (l0, l1) == (0, 1)
    assert tp.add("red", red) == 0   # dedup by name

    pool = tp.device_array()
    assert pool.shape[0] == 2
    layer = jnp.asarray([[0, 1, -1]])
    uv = jnp.asarray([[[0.5, 0.5], [0.25, 0.75], [0.5, 0.5]]])
    mip = jnp.zeros((1, 3), jnp.int32)
    out = np.asarray(sample_pool(pool, tuple(tp.mip_sizes),
                                 tuple(tp.mip_offsets), layer, uv, mip))
    assert out[0, 0, 0] > 0.9 and out[0, 0, 2] < 0.1      # red
    assert out[0, 1, 2] > 0.9 and out[0, 1, 0] < 0.1      # blue
    np.testing.assert_allclose(out[0, 2], 1.0)            # untextured -> 1

    # coarsest mip equals the average color
    top_mip = len(tp.mip_sizes) - 1
    out2 = np.asarray(sample_pool(
        pool, tuple(tp.mip_sizes), tuple(tp.mip_offsets),
        jnp.asarray([[0]]), jnp.asarray([[[0.5, 0.5]]]),
        jnp.asarray([[top_mip]], jnp.int32)))
    np.testing.assert_allclose(out2[0, 0, 0], 1.0, atol=0.02)


def _render_plane_debug_normal(normal_mapped: bool):
    """Flat +Y plane with a tangent-space normal map tilting toward +u."""
    from chord_tpu.asset.procedural import make_plane
    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  MeshletRenderer)
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.rhi.scene_arrays import MaterialData, SceneBuilder
    from chord_tpu.utils.camera import Camera

    tp = TexturePool(32)
    white = np.ones((32, 32, 4), np.float32)
    nrm = np.empty((32, 32, 4), np.float32)     # n_ts = texel*2-1
    nrm[..., 0] = 1.0                            # +1 along tangent (+u = +x)
    nrm[..., 1] = 0.5                            # 0 along bitangent
    nrm[..., 2] = 0.75                           # +0.5 along the face normal
    nrm[..., 3] = 1.0
    l_base = tp.add("white", white)
    l_nrm = tp.add("bump", nrm)

    b = SceneBuilder()
    mesh = b.add_mesh(make_plane(size=8.0))
    mat = b.add_material(MaterialData(
        base_color=(1, 1, 1, 1), roughness=0.8,
        base_color_texture=l_base, normal_texture=l_nrm))
    b.add_instance(mesh, mat)

    cam = Camera(width=96, height=64)
    cam.position = np.array([0.5, 6.0, 3.0])
    cam.look_at(np.array([0.0, 0.0, 0.0]))
    inst = b.frame_instances(cam)
    pools = build_meshlet_pools(b, texture_pool=tp)
    r = MeshletRenderer(
        RendererConfig(width=96, height=64, pair_capacity=256,
                       big_capacity=128, interpret=True,
                       enable_bloom=False, enable_tsr=False),
        MeshletFrameConfig(draw_capacity=128, textured=True,
                           normal_mapped=normal_mapped,
                           debug_mode="normal"))
    img, stats = r.render(pools, inst, cam.view_uniform(0))
    assert int(np.asarray(stats["bin_overflow"])) == 0
    return np.asarray(img).astype(np.float32)


@pytest.mark.slow
def test_normal_mapping_tilts_shading_normal():
    flat = _render_plane_debug_normal(False)
    bump = _render_plane_debug_normal(True)
    # interior pixels of the plane (avoid silhouette rows/cols)
    fz = flat[24:40, 32:64]
    bz = bump[24:40, 32:64]
    # debug view encodes n*0.5+0.5 (then tonemap, which compresses the
    # top end): flat plane normal is +Y => green saturated high
    assert fz[..., 1].mean() > 200.0
    # the tangent tilt pulls n.y down (tonemap-compressed but measurable)
    assert bz[..., 1].mean() < fz[..., 1].mean() - 8.0
    # and pushes n.x TOWARD +x (+u in glTF tangent space): red rises
    assert bz[..., 0].mean() > fz[..., 0].mean() + 25.0
    assert np.isfinite(bump).all()


def test_mip_density():
    # uv grid covering the whole texture over 8 pixels -> high mip
    uv_fast = jnp.stack(jnp.meshgrid(
        jnp.linspace(0, 8, 8), jnp.linspace(0, 8, 8), indexing="ij"), -1)
    m_fast = np.asarray(mip_from_uv_density(uv_fast, 256))
    # uv covering 1/100 of the texture per pixel -> mip 0-2
    uv_slow = uv_fast * 0.001
    m_slow = np.asarray(mip_from_uv_density(uv_slow, 256))
    assert m_fast.mean() > m_slow.mean() + 3


@pytest.mark.slow
def test_pbr_texture_modulation():
    """MR map (G=rough, B=metal) and emissive map modulate the material
    factors through the full textured resolve."""
    import jax.numpy as jnp

    from chord_tpu.asset.procedural import make_plane
    from chord_tpu.ops import shading
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.rhi.scene_arrays import MaterialData, SceneBuilder
    from chord_tpu.utils.camera import Camera

    tp = TexturePool(16)
    white = np.ones((16, 16, 4), np.float32)
    mr = np.zeros((16, 16, 4), np.float32)
    mr[..., 1] = 0.5                    # roughness x0.5
    mr[..., 2] = 1.0                    # metallic x1
    em = np.zeros((16, 16, 4), np.float32)
    em[..., 1] = 1.0                    # green emissive
    l_w = tp.add("w", white)
    l_mr = tp.add("mr", mr)
    l_em = tp.add("em", em)

    b = SceneBuilder()
    mesh = b.add_mesh(make_plane(size=8.0))
    mat = b.add_material(MaterialData(
        base_color=(1, 1, 1, 1), metallic=1.0, roughness=0.8,
        emissive=(2.0, 2.0, 2.0), base_color_texture=l_w,
        metal_rough_texture=l_mr, emissive_texture=l_em))
    b.add_instance(mesh, mat)
    pools = build_meshlet_pools(b, texture_pool=tp)

    cam = Camera(width=32, height=16)
    cam.position = np.array([0.5, 6.0, 3.0])
    cam.look_at(np.zeros(3))
    inst = b.frame_instances(cam)
    u = cam.view_uniform(0)
    vp = jnp.asarray(u.translated_world_to_clip_nojitter)
    inv = jnp.asarray(np.linalg.inv(
        u.translated_world_to_clip_nojitter.astype(np.float64)).astype(
        np.float32))
    h, w = 16, 32
    vis = jnp.full((h, w), (1 << 7), jnp.uint32)       # slot 0, tri 0
    depth = jnp.full((h, w), 0.5)
    one = jnp.ones((h, w))
    zero = jnp.zeros((h, w))
    uu = jnp.broadcast_to(jnp.linspace(0.1, 0.9, w)[None, :], (h, w))
    vv = jnp.broadcast_to(jnp.linspace(0.1, 0.9, h)[:, None], (h, w))
    g = shading.resolve_gbuffer_raster_rt(
        vis, depth, zero, one, zero, uu, vv, jnp.zeros((128,), jnp.int32),
        pools, inst, inv, vp, vp, textured=True, pbr_textures=True)
    m = np.asarray(g.metallic)[8, 16]
    r = np.asarray(g.roughness)[8, 16]
    e = np.asarray(g.emissive)[8, 16]
    assert abs(m - 1.0) < 0.02                  # 1.0 * B(=1)
    assert abs(r - 0.4) < 0.02                  # 0.8 * G(=0.5)
    # emissive factor (2,2,2) * green map -> green-dominant (sRGB green
    # lands in AP1 with a sizable red component, so only ~2.5x over red)
    assert e[1] > 2 * e[0] and e[1] > 4 * e[2]
    assert e[1] > 1.0


def test_stochastic_trilinear_expectation():
    """mip_dithered is an unbiased trilinear estimator: averaged over the
    64 IGN temporal phases, the selected mip converges to the fractional
    level (ops/texture.py mip_dithered; the reference gets trilinear from
    the texture unit — here the TSR chain resolves the dither)."""
    import jax.numpy as jnp

    from chord_tpu.ops.texture import (mip_dithered,
                                       mip_level_from_uv_density)

    H, W = 16, 64
    # uv field with smoothly varying density -> fractional levels
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    uv = np.stack([xx * (0.01 + 0.0008 * yy), yy * 0.013], -1)
    uvj = jnp.asarray(uv)
    lvl = np.asarray(mip_level_from_uv_density(uvj, 256))
    acc = np.zeros((H, W), np.float64)
    for f in range(64):
        acc += np.asarray(mip_dithered(uvj, 256, f))
    mean = acc / 64.0
    # interior pixels (the rolled differences wrap at row/col 0)
    m, l = mean[1:, 1:], lvl[1:, 1:]
    assert np.abs(m - l).max() < 0.26          # IGN phase equidistribution
    assert np.abs((m - l).mean()) < 0.02       # unbiased on average
    # integer levels never dither
    exact = np.abs(l - np.round(l)) < 1e-6
    assert np.all(np.abs(m[exact] - l[exact]) < 1e-6)
