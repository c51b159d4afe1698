"""Meshlet building, HZB occlusion, culling, meshlet frame end-to-end."""

import jax.numpy as jnp
import numpy as np
import pytest

from chord_tpu.asset.procedural import build_sponza_like, make_uv_sphere
from chord_tpu.geometry.meshlet import (MESHLET_MAX_TRIS, MESHLET_MAX_VERTS,
                                        build_meshlets)
from chord_tpu.ops.hzb import build_hzb, hzb_layout, occlusion_test_spheres
from chord_tpu.renderer.deferred import RendererConfig
from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                              MeshletRenderer)
from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
from chord_tpu.utils.camera import Camera


def test_meshlet_builder_invariants():
    mesh = make_uv_sphere(1.0, rings=24, sectors=32)
    md, reordered = build_meshlets(mesh.positions, mesh.indices)
    t = len(mesh.indices)
    assert md.tri_count.sum() == t
    assert (md.tri_count <= MESHLET_MAX_TRIS).all()
    assert (md.tri_count > 0).all()
    # reordered is a permutation of the original triangle set
    orig = {tuple(sorted(tr)) for tr in mesh.indices.tolist()}
    new = {tuple(sorted(tr)) for tr in reordered.tolist()}
    assert orig == new
    # vertex budget + sphere containment
    for k in range(md.count):
        sl = slice(md.tri_offset[k], md.tri_offset[k] + md.tri_count[k])
        vids = np.unique(reordered[sl])
        assert len(vids) <= MESHLET_MAX_VERTS
        c, r = md.sphere[k, :3], md.sphere[k, 3]
        d = np.linalg.norm(mesh.positions[vids] - c, axis=1)
        assert (d <= r * 1.001 + 1e-5).all()


def test_hzb_layout_and_build():
    w, h = 256, 128
    ws, hs, offs = hzb_layout(w, h)
    assert ws[0] == 128 and hs[0] == 64
    depth = jnp.zeros((h, w), jnp.float32).at[32:64, 64:128].set(0.5)
    pyr = build_hzb(depth)
    flat = np.asarray(pyr.flat)
    # level 0: min over 2x2 — region interior keeps 0.5
    lvl0 = flat[offs[0]:offs[0] + ws[0] * hs[0]].reshape(hs[0], ws[0])
    assert lvl0[20, 40] == 0.5          # inside region
    assert lvl0[0, 0] == 0.0            # empty
    # top level is global min = 0
    assert flat[offs[-1]] == 0.0


def test_hzb_occlusion():
    w, h = 256, 128
    # full-screen occluder at depth 0.5 (reverse-Z: nearish)
    depth = jnp.full((h, w), 0.5, jnp.float32)
    pyr = build_hzb(depth)
    # simple forward-looking projection
    cam = Camera(width=w, height=h)
    vp = jnp.asarray(cam.view_uniform(0).translated_world_to_clip_nojitter)
    # sphere far away (z=-100 => z_ndc = 0.001/100 << 0.5) -> occluded
    far_c = jnp.asarray([[0.0, 0.0, -100.0]])
    far_r = jnp.asarray([1.0])
    vis = occlusion_test_spheres(pyr, far_c, far_r, vp)
    assert not bool(vis[0])
    # sphere very near (z_ndc ~ 0.001/0.01 = 0.1? nearer than 0.5 needs
    # dist < 0.002) -> visible
    near_c = jnp.asarray([[0.0, 0.0, -0.0015]])
    near_r = jnp.asarray([0.0005])
    vis2 = occlusion_test_spheres(pyr, near_c, near_r, vp)
    assert bool(vis2[0])
    # eye-plane crossing sphere -> conservatively visible
    cross_c = jnp.asarray([[0.0, 0.0, 0.0]])
    cross_r = jnp.asarray([1.0])
    assert bool(occlusion_test_spheres(pyr, cross_c, cross_r, vp)[0])
    # empty HZB (all zeros = far) never occludes
    pyr0 = build_hzb(jnp.zeros((h, w), jnp.float32))
    assert bool(occlusion_test_spheres(pyr0, far_c, far_r, vp)[0])


@pytest.mark.parametrize("occlusion", [False, True])
@pytest.mark.slow
def test_meshlet_frame_end_to_end(occlusion):
    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)
    cam = Camera(width=256, height=64)
    cam.position = np.array([-15.0, 4.0, 0.0])
    cam.look_at(np.array([10.0, 2.0, 0.0]))
    inst = b.frame_instances(cam)

    r = MeshletRenderer(
        RendererConfig(width=256, height=64, pair_capacity=4096,
                       big_capacity=128, interpret=True,
                       enable_bloom=False, enable_tsr=False),
        MeshletFrameConfig(draw_capacity=1024, occlusion=occlusion))
    img, stats = r.render(pools, inst, cam.view_uniform(0))
    img = np.asarray(img)
    assert img.shape == (64, 256, 3)
    assert int(np.asarray(stats["draw_overflow"])) == 0
    assert int(np.asarray(stats["bin_overflow"])) == 0
    assert int(np.asarray(stats["drawn_tris"])) > 100
    # scene covers most of the view; image must not be uniform
    assert img.std() > 8.0, f"std {img.std():.2f}"

    if occlusion:
        # frame 2 uses frame 1's HZB — still renders correctly
        img2, stats2 = r.render(pools, inst, cam.view_uniform(1))
        img2 = np.asarray(img2)
        diff = np.abs(img.astype(int) - img2.astype(int)).mean()
        assert diff < 6.0, f"temporal instability {diff}"
        assert int(np.asarray(stats2["draws_phase1"])) >= 0


@pytest.mark.slow
def test_mesh_shader_sort_no_phantom_from_invalid_lanes():
    """In-window sort keys must be collision-free: equal-rank lanes make
    the one-hot permutation matmul SUM columns, and two summed poison
    constants (-1.0 halves) become a huge-exponent plane that rasters
    full-tile phantom coverage at depth 1.0/payload 0 (hit via the
    shadow cascades on sponza). Sorted and unsorted setups must raster
    identically for windows with many invalid lanes."""
    import jax.numpy as jnp
    import numpy as np
    from chord_tpu.asset.procedural import build_sponza_like
    from chord_tpu.ops.raster import RasterConfig, bin_windows, raster_queue
    from chord_tpu.renderer import meshlet_frame as mf
    from chord_tpu.renderer.deferred import DeviceView
    from chord_tpu.renderer.meshlet_frame import MeshletFrameConfig
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.camera import Camera

    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)     # partial meshlets -> invalid lanes
    cam = Camera(width=256, height=256)
    cam.position = np.array([-15.0, 4.0, 3.0])
    cam.look_at(np.array([10.0, 2.0, -2.0]))
    inst = b.frame_instances(cam)
    scfg = MeshletFrameConfig(draw_capacity=256).shadow_cfg
    view = DeviceView.from_uniform(cam.view_uniform(0), shadow_cfg=scfg)
    r = 256
    m = view.shadow_tw_to_light[1]     # ortho light view, partial windows
    res = mf.cull_pairs(pools, inst, view.shadow_frustum_planes[1],
                        jnp.float32(0.5 * r * np.asarray(m)[1, 1]), 256,
                        lod_threshold=1.0, enable_cone=False)
    rc = RasterConfig(width=r, height=r, pair_capacity=4096,
                      big_capacity=64, interpret=True)
    outs = {}
    for sort in (True, False):
        setup = mf.mesh_shader_setup(res.draws, pools, inst, m, 256, r, r,
                                     backface_cull=False, sub_s=rc.sub_s,
                                     interpret=True, sort_tris=sort)
        # depth-only rc: the kernel reads just the first 16 coef lanes
        q = bin_windows(setup, rc)
        d, v = raster_queue(q, setup, rc)[:2]
        outs[sort] = (np.asarray(d), np.asarray(v))
    d_s, v_s = outs[True]
    d_n, v_n = outs[False]
    np.testing.assert_array_equal(d_s > 0, d_n > 0)
    np.testing.assert_allclose(d_s, d_n, atol=1e-5)
    # no phantom payload-0 coverage
    assert not ((v_s == 0) & (d_s > 0)).any()
