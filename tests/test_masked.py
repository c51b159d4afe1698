"""Alpha-masked material bucket: pipeline-filter split + deferred alpha
punch-through (reference: pipeline_filter.hlsl buckets by alphaMode;
mesh_raster Masked permutation discards on texture alpha)."""

import numpy as np
import pytest
import jax.numpy as jnp

from chord_tpu.asset.texture import TexturePool
from chord_tpu.renderer.deferred import RendererConfig
from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                              MeshletRenderer)
from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
from chord_tpu.rhi.scene_arrays import MaterialData, MeshData, SceneBuilder
from chord_tpu.utils.camera import Camera


def _quad(z: float, half: float = 3.0) -> MeshData:
    return MeshData(
        positions=np.array([[-half, -half, z], [half, -half, z],
                            [half, half, z], [-half, half, z]], np.float32),
        indices=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        normals=np.tile([0, 0, 1], (4, 1)).astype(np.float32),
        uv0=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))


@pytest.mark.slow
def test_masked_punch_through():
    pool = TexturePool(64)
    # alpha 1 on the left half (u < 0.5), 0 on the right half
    img = np.ones((64, 64, 4), np.float32)
    img[:, 32:, 3] = 0.0
    img[..., 0] = 1.0
    img[..., 1] = 0.0
    img[..., 2] = 0.0
    layer = pool.add("mask", img)

    b = SceneBuilder()
    front = b.add_mesh(_quad(0.0))
    back = b.add_mesh(_quad(0.0, half=6.0))
    m_masked = b.add_material(MaterialData(
        base_color=(1, 0, 0, 1), alpha_mode="mask", alpha_cutoff=0.5,
        base_color_texture=layer, roughness=1.0))
    m_opaque = b.add_material(MaterialData(base_color=(0, 1, 0, 1),
                                           roughness=1.0))
    mf = np.eye(4); mf[3, 2] = -4.0
    mb = np.eye(4); mb[3, 2] = -6.0
    b.add_instance(front, m_masked, mf)
    b.add_instance(back, m_opaque, mb)
    pools = build_meshlet_pools(b, texture_pool=pool)

    cam = Camera(width=64, height=64, fovy_deg=60.0)
    inst = b.frame_instances(cam)
    r = MeshletRenderer(
        RendererConfig(width=64, height=64, pair_capacity=512,
                       big_capacity=16, interpret=True,
                       enable_bloom=False, enable_tsr=False),
        MeshletFrameConfig(draw_capacity=128, occlusion=False,
                           alpha_masked=True, masked_draw_capacity=128))
    img_out, stats = r.render(pools, inst, cam.view_uniform(0))
    img_out = np.asarray(img_out).astype(np.float32)
    assert int(np.asarray(stats["draw_overflow"])) == 0

    # left-center pixel: masked quad visible (red); right-center: punched
    # through to the green opaque quad behind
    left = img_out[32, 16]
    right = img_out[32, 48]
    assert left[0] > left[1] + 20, f"left should be red-ish: {left}"
    assert right[1] > right[0] + 20, f"right should be green-ish: {right}"


@pytest.mark.slow
def test_masked_all_rejected_shows_background():
    """A masked material whose alpha factor fails the cutoff everywhere
    disappears entirely."""
    b = SceneBuilder()
    front = b.add_mesh(_quad(0.0))
    m_masked = b.add_material(MaterialData(
        base_color=(1, 0, 0, 0.2), alpha_mode="mask", alpha_cutoff=0.5))
    mf = np.eye(4); mf[3, 2] = -4.0
    b.add_instance(front, m_masked, mf)
    pools = build_meshlet_pools(b)

    cam = Camera(width=64, height=64, fovy_deg=60.0)
    inst = b.frame_instances(cam)
    r = MeshletRenderer(
        RendererConfig(width=64, height=64, pair_capacity=512,
                       big_capacity=16, interpret=True,
                       enable_bloom=False, enable_tsr=False),
        MeshletFrameConfig(draw_capacity=128, occlusion=False,
                           alpha_masked=True, masked_draw_capacity=128))
    img_out, _stats = r.render(pools, inst, cam.view_uniform(0))
    img_out = np.asarray(img_out).astype(np.float32)
    center = img_out[28:36, 28:36]
    corner = img_out[:4, :4]
    assert np.abs(center.mean(axis=(0, 1)) -
                  corner.mean(axis=(0, 1))).max() < 8.0, \
        "masked quad should be fully punched through"


@pytest.mark.slow
def test_masked_shadow_casters_alpha_tested():
    """A fully-transparent masked plane must not cast a shadow when
    alpha_masked is on (reference: Masked depth permutation discards)."""
    import jax.numpy as jnp
    from chord_tpu.asset.procedural import make_plane
    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  MeshletRenderer)
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.rhi.scene_arrays import MaterialData, SceneBuilder
    from chord_tpu.utils import math as cmath
    from chord_tpu.utils.camera import Camera
    from chord_tpu.ops.shadow import ShadowConfig

    def build(alpha):
        b = SceneBuilder()
        plane = b.add_mesh(make_plane(1.0, segments=2))
        ground = b.add_material(MaterialData(
            base_color=(0.7, 0.7, 0.7, 1.0)))
        # masked material with constant base alpha (no texture):
        # alpha < cutoff = full transparent, > cutoff = solid
        caster = b.add_material(MaterialData(
            base_color=(0.5, 0.3, 0.2, alpha), alpha_mode="mask",
            alpha_cutoff=0.5, two_sided=True))
        b.add_instance(plane, ground,
                       cmath.compose_trs((0, 0, 0), scale=(30, 1, 30)))
        b.add_instance(plane, caster,
                       cmath.compose_trs((0, 4.0, 0), scale=(6, 1, 6)))
        return b

    def render(alpha):
        b = build(alpha)
        pools = build_meshlet_pools(b)
        cam = Camera(width=96, height=64)
        cam.position = np.array([0.0, 8.0, 14.0])
        cam.look_at(np.array([0.0, 0.0, 0.0]))
        inst = b.frame_instances(cam)
        r = MeshletRenderer(
            RendererConfig(width=96, height=64, pair_capacity=2048,
                           big_capacity=64, interpret=True,
                           enable_bloom=False, enable_tsr=False),
            MeshletFrameConfig(draw_capacity=256, occlusion=False,
                               alpha_masked=True, shadows=True,
                               shadow_cfg=ShadowConfig(
                                   cascade_count=1, resolution=128,
                                   temporal=False, jitter=False)))
        img, _ = r.render(pools, inst, cam.view_uniform(0))
        return np.asarray(img).astype(np.float32)

    solid = render(0.9)        # alpha above cutoff: casts shadow
    clear = render(0.1)        # below cutoff: no geometry, no shadow
    # the cast shadow darkens the ground where the sun direction projects
    # the pane (sun (0.3,0.8,0.5): a ground patch behind-left of the
    # pane, upper-middle rows on screen). The texel-exact PCSS places a
    # tight shadow there; assert a strong localized darkening instead of
    # a region mean (the old assertion was calibrated to the pre-PCSS
    # over-blurred penumbra that smeared into the foreground).
    d = (clear.mean(-1) - solid.mean(-1))
    assert d[16:34, 16:72].max() > 15.0
    # transparent pane: nothing rendered, so nothing darkens anywhere
    # (the pane region itself goes NEGATIVE in d — clear shows ground)
    assert (d[40:, :] < 8.0).all()


@pytest.mark.slow
def test_masked_second_layer_depth_peel():
    """masked_layers=2: a masked surface directly behind a FAILING masked
    texel shows through instead of falling back to opaque (the depth-peel
    pass — reference gets this free from per-pixel raster + discard)."""
    pool = TexturePool(64)
    # front: alpha 0 on the right half; back: blue-ish, alpha 1 everywhere
    img_f = np.ones((64, 64, 4), np.float32)
    img_f[:, 32:, 3] = 0.0
    img_f[..., 0] = 1.0; img_f[..., 1] = 0.0; img_f[..., 2] = 0.0
    l_front = pool.add("front", img_f)

    b = SceneBuilder()
    front = b.add_mesh(_quad(0.0))
    mid = b.add_mesh(_quad(0.0, half=4.0))
    back = b.add_mesh(_quad(0.0, half=6.0))
    m_front = b.add_material(MaterialData(
        base_color=(1, 0, 0, 1), alpha_mode="mask", alpha_cutoff=0.5,
        base_color_texture=l_front, roughness=1.0))
    m_mid = b.add_material(MaterialData(
        base_color=(0, 0, 1, 1), alpha_mode="mask", alpha_cutoff=0.5,
        roughness=1.0))                      # passes everywhere (factor 1)
    m_opaque = b.add_material(MaterialData(base_color=(0, 1, 0, 1),
                                           roughness=1.0))
    mf = np.eye(4); mf[3, 2] = -4.0
    mm = np.eye(4); mm[3, 2] = -5.0
    mb = np.eye(4); mb[3, 2] = -6.0
    b.add_instance(front, m_front, mf)
    b.add_instance(mid, m_mid, mm)
    b.add_instance(back, m_opaque, mb)
    pools = build_meshlet_pools(b, texture_pool=pool)

    cam = Camera(width=64, height=64, fovy_deg=60.0)
    inst = b.frame_instances(cam)

    def render(layers):
        r = MeshletRenderer(
            RendererConfig(width=64, height=64, pair_capacity=512,
                           big_capacity=16, interpret=True,
                           enable_bloom=False, enable_tsr=False),
            MeshletFrameConfig(draw_capacity=128, occlusion=False,
                               alpha_masked=True,
                               masked_draw_capacity=128,
                               masked_layers=layers))
        img_out, stats = r.render(pools, inst, cam.view_uniform(0))
        assert int(np.asarray(stats["draw_overflow"])) == 0
        return np.asarray(img_out).astype(np.float32)

    one = render(1)
    two = render(2)
    # left-center: front masked quad (red) in BOTH modes
    for img_out in (one, two):
        left = img_out[32, 16]
        assert left[0] > left[1] + 20 and left[0] > left[2] + 20, left
    # right-center: single layer falls back to opaque green; two layers
    # reveal the blue masked quad behind the failing front texel
    r1 = one[32, 44]
    r2 = two[32, 44]
    assert r1[1] > r1[2] + 20, f"1-layer should be green-ish: {r1}"
    assert r2[2] > r2[1] + 20, f"2-layer should be blue-ish: {r2}"
