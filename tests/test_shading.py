"""Deferred shading: barycentric reconstruction + BRDF sanity
(reference: lighting.hlsl:270-385, base.hlsli:449-497)."""

import jax.numpy as jnp
import numpy as np
import pytest

from chord_tpu.ops import shading
from chord_tpu.ops.raster import RasterConfig, rasterize
from chord_tpu.rhi.scene_arrays import (MaterialData, MeshData, SceneBuilder)
from chord_tpu.utils.camera import Camera


def _quad_scene():
    """One unit quad at z=-5 facing the camera."""
    b = SceneBuilder()
    quad = MeshData(
        positions=np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                           np.float32),
        indices=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        normals=np.tile([0, 0, 1], (4, 1)).astype(np.float32),
        uv0=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
    mid = b.add_mesh(quad)
    mat = b.add_material(MaterialData(base_color=(1.0, 0.0, 0.0, 1.0),
                                      metallic=0.0, roughness=0.5))
    m = np.eye(4)
    m[3, 2] = -5.0
    b.add_instance(mid, mat, m)
    return b


@pytest.mark.slow
def test_gbuffer_reconstruction():
    b = _quad_scene()
    pools = b.build_pools()
    cam = Camera(width=64, height=64, fovy_deg=60.0)
    inst = b.frame_instances(cam)
    u = cam.view_uniform(0)

    from chord_tpu.ops.transform import transform_to_clip
    clip = transform_to_clip(pools.positions, pools.vertex_object,
                             inst.object_to_tw,
                             jnp.asarray(u.translated_world_to_clip))
    payload = jnp.arange(pools.indices.shape[0], dtype=jnp.uint32) + 1
    cfg = RasterConfig(width=64, height=64, pair_capacity=256, big_capacity=16,
                       interpret=True)
    depth, vis, _ = rasterize(clip, pools.indices, pools.tri_valid, payload,
                              cfg)
    vis = np.asarray(vis)
    assert (vis > 0).sum() > 100, "quad should cover pixels"

    g = shading.resolve_gbuffer(
        jnp.asarray(vis), pools, inst,
        jnp.asarray(u.translated_world_to_clip_nojitter),
        jnp.asarray(u.prev_translated_world_to_clip_nojitter))

    valid = np.asarray(g.valid)
    pos = np.asarray(g.position_tw)
    nrm = np.asarray(g.normal)
    # Hit points lie on the quad plane z = -5 (camera at origin).
    assert np.allclose(pos[valid][:, 2], -5.0, atol=1e-3)
    assert np.allclose(np.abs(pos[valid][:, 0]) <= 1.01, True)
    # Normal is +Z toward the camera.
    assert np.allclose(nrm[valid], [0, 0, 1], atol=1e-4)
    # Base color converted to AP1 still mostly red.
    bc = np.asarray(g.base_color)[valid]
    assert (bc[:, 0] > bc[:, 1]).all() and (bc[:, 0] > bc[:, 2]).all()
    # Static scene: zero motion.
    assert np.abs(np.asarray(g.motion)[valid]).max() < 1e-4

    # Center pixel UV ~ (0.5, 0.5)
    uv = np.asarray(g.uv)
    assert np.allclose(uv[32, 32], [0.5, 0.5], atol=0.05)


def test_brdf_energy_sanity():
    h = w = 8
    g = shading.GBuffer(
        valid=jnp.ones((h, w), bool),
        position_tw=jnp.tile(jnp.asarray([0.0, 0.0, -5.0]), (h, w, 1)),
        normal=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 1)),
        base_color=jnp.full((h, w, 3), 0.5),
        metallic=jnp.zeros((h, w)),
        roughness=jnp.full((h, w), 0.7),
        emissive=jnp.zeros((h, w, 3)),
        uv=jnp.zeros((h, w, 2)),
        motion=jnp.zeros((h, w, 2)),
    )
    sun = shading.SunLight(
        direction=jnp.asarray([0.0, 0.0, 1.0]),
        radiance=jnp.asarray([1.0, 1.0, 1.0]),
        sky_ambient=jnp.zeros(3))
    out = np.asarray(shading.shade_pixels(g, sun))
    assert (out >= 0).all()
    # Lambertian bound: diffuse-only albedo 0.5 head-on < 0.5/pi + small spec
    assert out.max() < 0.5, f"energy blowup: {out.max()}"
    # Shadowed sun -> black
    out_sh = np.asarray(shading.shade_pixels(
        g, sun, sun_shadow=jnp.zeros((h, w))))
    assert out_sh.max() < 1e-6


def test_env_brdf_lut_properties():
    """Split-sum LUT (reference: shader/brdf_lut.hlsl): energy bounds and
    monotonicity sanity."""
    import numpy as np

    from chord_tpu.ops.brdf_lut import LUT_SIZE, build_env_brdf_lut

    lut = np.asarray(build_env_brdf_lut(samples=256))
    assert lut.shape == (LUT_SIZE, LUT_SIZE, 2)
    assert np.isfinite(lut).all()
    a, b = lut[..., 0], lut[..., 1]
    # F = f0*A + B must respect energy conservation for any f0 in [0,1]
    assert (a >= 0).all() and (b >= -1e-3).all()
    assert (a + b <= 1.0 + 1e-5).all()
    # at high NoV, smooth surfaces reflect more than rough ones (A+B)
    hi_nov = lut[-1]
    assert hi_nov[1, :2].sum() > hi_nov[-1, :2].sum()


@pytest.mark.slow
def test_per_object_motion_vectors():
    """A translated instance must produce per-object motion vectors from
    the rigid-delta reconstruction (reference computes motion from
    last-frame HS positions, lighting.hlsl)."""
    import jax
    from chord_tpu.ops.cull import cull_pairs
    from chord_tpu.ops.mesh_shader import mesh_shader_setup
    from chord_tpu.ops.raster import bin_windows, raster_queue
    from chord_tpu.renderer.deferred import DeviceView
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools

    b = _quad_scene()
    pools = build_meshlet_pools(b)
    cam = Camera(width=64, height=64, fovy_deg=60.0)
    # the quad sat 0.5 units to the right last frame
    l2w_prev = np.eye(4)
    l2w_prev[3, 2] = -5.0
    l2w_prev[3, 0] = 0.5
    inst = b.frame_instances(
        cam, prev_matrices={0: cam.rebase_matrix(l2w_prev)})
    u = cam.view_uniform(0)
    view = DeviceView.from_uniform(u)

    cap = 128
    cfg = RasterConfig(width=64, height=64, tile_h=32, pair_capacity=256,
                       big_capacity=16, with_attrs=True, interpret=True)
    proj_scale = jnp.float32(0.5 * 64 * u.translated_world_to_clip[1, 1])
    res = cull_pairs(pools, inst, view.frustum_planes, proj_scale, cap)
    setup = mesh_shader_setup(res.draws, pools, inst, view.tw_to_clip,
                              cap, 64, 64, interpret=True)
    q = bin_windows(setup, cfg)
    rt = raster_queue(q, setup, cfg)
    g = shading.resolve_gbuffer_raster_rt(
        rt[1], rt[0], rt[2], rt[3], rt[4], rt[5], rt[6],
        res.draws.object_id, pools, inst, view.clip_to_tw,
        view.tw_to_clip_nj, view.prev_tw_to_clip_nj)
    valid = np.asarray(g.valid)
    assert valid.sum() > 100

    # expected: ndc(p) - ndc(p + (0.5,0,0)) for any p on the quad (pure
    # translation, static camera) — compute analytically at the center
    vp = np.asarray(u.translated_world_to_clip_nojitter, np.float64)
    def ndc(p):
        c = np.append(p, 1.0) @ vp
        return c[:2] / c[3]
    expected = ndc([0, 0, -5.0]) - ndc([0.5, 0, -5.0])
    mot = np.asarray(g.motion)[valid]
    assert np.allclose(mot[:, 0], expected[0], atol=1e-3), \
        f"{mot[:, 0].mean()} vs {expected[0]}"
    assert np.allclose(mot[:, 1], expected[1], atol=1e-3)
