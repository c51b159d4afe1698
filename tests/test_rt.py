"""Software BVH ray traversal vs NumPy oracles (VERDICT round-1 item #4:
kernel-vs-NumPy-BVH oracle test)."""

import numpy as np
import pytest
import jax.numpy as jnp

from chord_tpu.ops import rt


def _random_scene(n=200, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-20, 20, (n, 3))
    r = rng.uniform(0.2, 1.5, (n, 1))
    return np.concatenate([c, r], 1).astype(np.float32)


def _random_rays(m=256, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-25, 25, (m, 3)).astype(np.float32)
    d = rng.normal(size=(m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_numpy_bvh_flatten_invariants():
    sph = _random_scene(100)
    bvh = rt.build_bvh_numpy(sph)
    n = len(bvh["count"])
    assert bvh["count"][0] == n            # root subtree = whole tree
    # every leaf appears exactly once
    leaves = bvh["leaf"][bvh["leaf"] >= 0]
    assert sorted(leaves.tolist()) == list(range(100))
    # DFS skip-pointer consistency: walking i += count[i] from any node's
    # first child lands back at i + count[i]
    for i in range(0, n, 7):
        j = i + 1
        end = i + bvh["count"][i]
        if bvh["leaf"][i] >= 0:
            assert bvh["count"][i] == 1
            continue
        while j < end:
            j += bvh["count"][j]
        assert j == end
    # every node's sphere contains all LEAF spheres in its subtree (the
    # invariant traversal correctness needs; sibling NODE spheres may
    # poke outside each other with centroid-based bounds)
    for i in range(0, n, 11):
        end = i + bvh["count"][i]
        p = bvh["sphere"][i]
        for j in range(i + 1, end):
            if bvh["leaf"][j] < 0:
                continue
            c = sph[bvh["leaf"][j]]
            d = np.linalg.norm(p[:3] - c[:3])
            assert d + c[3] <= p[3] + 1e-3


def test_native_bvh_matches_numpy_invariants():
    from chord_tpu.native import available, bvh_build
    if not available():
        import pytest
        pytest.skip("native toolchain unavailable")
    sph = _random_scene(150, seed=3)
    bvh = bvh_build(sph)
    n = len(bvh["count"])
    assert bvh["count"][0] == n
    leaves = bvh["leaf"][bvh["leaf"] >= 0]
    assert sorted(leaves.tolist()) == list(range(150))
    for i in range(0, n, 5):
        end = i + bvh["count"][i]
        p = bvh["sphere"][i]
        for j in range(i + 1, end):
            if bvh["leaf"][j] < 0:
                continue
            c = sph[bvh["leaf"][j]]
            assert (np.linalg.norm(p[:3] - c[:3]) + c[3]) <= p[3] + 1e-3


def _to_scene_bvh(bvh, n_leaves):
    return rt.SceneBVH(
        node_sphere=jnp.asarray(bvh["sphere"]),
        node_count=jnp.asarray(bvh["count"]),
        node_leaf=jnp.asarray(bvh["leaf"]),
        leaf_albedo=jnp.ones((n_leaves, 3)),
        leaf_emissive=jnp.zeros((n_leaves, 3)))


def test_traversal_matches_brute_force():
    sph = _random_scene(200)
    bvh = _to_scene_bvh(rt.build_bvh_numpy(sph), 200)
    o, d = _random_rays(512)
    t, leaf = rt.trace(jnp.asarray(o), jnp.asarray(d), bvh)
    t_ref, leaf_ref = rt.trace_brute_numpy(o, d, sph)
    t = np.asarray(t)
    leaf = np.asarray(leaf)
    hit = leaf >= 0
    hit_ref = leaf_ref >= 0
    np.testing.assert_array_equal(hit, hit_ref)
    np.testing.assert_allclose(t[hit], t_ref[hit_ref], rtol=1e-4)
    # >1% of random rays should hit something in this scene
    assert hit.sum() > 5


def test_traversal_native_bvh_matches_brute():
    from chord_tpu.native import available, bvh_build
    if not available():
        import pytest
        pytest.skip("native toolchain unavailable")
    sph = _random_scene(180, seed=7)
    bvh = _to_scene_bvh(bvh_build(sph), 180)
    o, d = _random_rays(256, seed=8)
    t, leaf = rt.trace(jnp.asarray(o), jnp.asarray(d), bvh)
    t_ref, leaf_ref = rt.trace_brute_numpy(o, d, sph)
    hit = np.asarray(leaf) >= 0
    np.testing.assert_array_equal(hit, leaf_ref >= 0)
    np.testing.assert_allclose(np.asarray(t)[hit], t_ref[hit], rtol=1e-4)


def test_scene_bvh_and_shading():
    """BVH over the procedural scene's coarse meshlets: rays toward the
    scene hit; shading returns finite AP1 radiance."""
    from chord_tpu.asset.procedural import build_sponza_like
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.camera import Camera

    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)
    cam = Camera(width=64, height=64)
    cam.position = np.array([-15.0, 4.0, 3.0])
    inst = b.frame_instances(cam)
    bvh = rt.build_scene_bvh(pools, inst)
    assert bvh.node_sphere.shape[0] >= 1
    o = jnp.zeros((64, 3))          # camera at TW origin
    rng = np.random.default_rng(2)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t, leaf = rt.trace(o, jnp.asarray(d), bvh)
    assert int((np.asarray(leaf) >= 0).sum()) > 0
    rad, conf = rt.shade_hits(
        t, leaf, o, jnp.asarray(d), bvh,
        jnp.asarray([0.3, 0.8, 0.5]) / np.linalg.norm([0.3, 0.8, 0.5]),
        jnp.asarray([8.0, 7.6, 7.0]), jnp.asarray([0.2, 0.25, 0.3]))
    assert np.isfinite(np.asarray(rad)).all()
    assert float(np.asarray(conf).max()) == 1.0


@pytest.mark.slow
def test_frame_with_rt_fallback_smoke():
    """Frame with gi_rt on: BVH probe rays + SSR miss fallback compile and
    produce finite output."""
    from chord_tpu.asset.procedural import build_sponza_like
    from chord_tpu.ops.screen_probe import ScreenProbeConfig
    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  MeshletRenderer)
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.camera import Camera

    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)
    cam = Camera(width=64, height=32)
    cam.position = np.array([-15.0, 4.0, 3.0])
    cam.look_at(np.array([10.0, 2.0, -2.0]))
    inst = b.frame_instances(cam)
    r = MeshletRenderer(
        RendererConfig(width=64, height=32, pair_capacity=2048,
                       big_capacity=64, interpret=True,
                       enable_bloom=False, enable_tsr=False),
        MeshletFrameConfig(draw_capacity=256, occlusion=False,
                           gi=True, gi_mode="probe", gi_rt=True,
                           rt_rays=2, ssr=True,
                           probe_cfg=ScreenProbeConfig(
                               tile=8, rays=4, steps=4, depth_div=2)))
    img, _ = r.render(pools, inst, cam.view_uniform(0))
    assert r._bvh is not None
    assert np.isfinite(np.asarray(r.history.probe_sh)).all()
    assert np.asarray(img).dtype == np.uint8


def test_dense_trace_matches_brute():
    """The MXU dense path returns the same closest hits as the O(R*N)
    oracle (and therefore the BVH path, tested above)."""
    sph = _random_scene(300, seed=11)
    o, d = _random_rays(512, seed=12)
    t, leaf = rt.trace_dense(jnp.asarray(o), jnp.asarray(d),
                             jnp.asarray(sph))
    t_ref, leaf_ref = rt.trace_brute_numpy(o, d, sph)
    hit = np.asarray(leaf) >= 0
    np.testing.assert_array_equal(hit, leaf_ref >= 0)
    np.testing.assert_allclose(np.asarray(t)[hit], t_ref[hit], rtol=1e-3)
    # identical closest LEAF too (strictly ordered ts in the random scene)
    np.testing.assert_array_equal(np.asarray(leaf)[hit], leaf_ref[hit])


# ---------------------------------------------------------------------------
# Triangle-exact mode (VERDICT r2 item 5; reference traces real geometry
# via ray query, gi_raytracing.hlsli:41-45)
# ---------------------------------------------------------------------------

def _random_tris(n=300, seed=3):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    e1 = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
    e2 = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
    return v0, e1, e2


def test_dense_tri_matches_moller_oracle():
    v0, e1, e2 = _random_tris(300)
    planes = rt._tri_planes_np(v0, e1, e2)
    o, d = _random_rays(512, seed=4)
    t, leaf = rt.trace_dense_tri(jnp.asarray(o), jnp.asarray(d),
                                 jnp.asarray(planes))
    t_ref, leaf_ref = rt.trace_brute_tri_numpy(o, d, v0, e1, e2)
    t = np.asarray(t)
    leaf = np.asarray(leaf)
    hit = leaf >= 0
    np.testing.assert_array_equal(hit, leaf_ref >= 0)
    np.testing.assert_allclose(t[hit], t_ref[hit], rtol=2e-3, atol=1e-3)
    np.testing.assert_array_equal(leaf[hit], leaf_ref[hit])
    assert hit.sum() > 10


def test_bvh_tri_traversal_matches_oracle():
    """Skip-pointer scan with triangle leaf tests == brute Moller."""
    v0, e1, e2 = _random_tris(220, seed=5)
    center = v0 + (e1 + e2) / 3.0
    rad = np.maximum(np.linalg.norm(v0 - center, axis=1), np.maximum(
        np.linalg.norm(v0 + e1 - center, axis=1),
        np.linalg.norm(v0 + e2 - center, axis=1)))
    sph = np.concatenate([center, rad[:, None]], 1).astype(np.float32)
    tree = rt.build_bvh_numpy(sph)
    planes = rt._tri_planes_np(v0, e1, e2)
    n = np.cross(e1, e2)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    bvh = rt.SceneBVH(
        node_sphere=jnp.asarray(tree["sphere"]),
        node_count=jnp.asarray(tree["count"]),
        node_leaf=jnp.asarray(tree["leaf"]),
        leaf_albedo=jnp.ones((220, 3)), leaf_emissive=jnp.zeros((220, 3)),
        leaf_sphere=jnp.asarray(sph),
        tri_planes=jnp.asarray(planes),
        leaf_normal=jnp.asarray(n.astype(np.float32)))
    o, d = _random_rays(256, seed=6)
    t, leaf = rt.trace_bvh(jnp.asarray(o), jnp.asarray(d), bvh,
                           max_steps=1000)
    t_ref, leaf_ref = rt.trace_brute_tri_numpy(o, d, v0, e1, e2)
    hit = np.asarray(leaf) >= 0
    np.testing.assert_array_equal(hit, leaf_ref >= 0)
    np.testing.assert_allclose(np.asarray(t)[hit], t_ref[hit],
                               rtol=2e-3, atol=1e-3)


def test_triangle_bvh_sees_through_doorway():
    """A wall with a doorway: sphere-proxy leaves are fat and BLOCK rays
    through the opening; triangle-exact leaves pass them — the fidelity
    gap the exact mode exists to close (offscreen bounce light through
    openings)."""
    # wall at x=0 spanning y,z in [-10,10] with a hole |y|<1.5, |z|<1.5,
    # built from 4 rectangular frames of 2 triangles each
    quads = []
    def quad(y0, y1, z0, z1):
        a = np.array([0, y0, z0]); b = np.array([0, y1, z0])
        c = np.array([0, y1, z1]); d_ = np.array([0, y0, z1])
        quads.append((a, b - a, c - a))
        quads.append((a, c - a, d_ - a))
    quad(-10, -1.5, -10, 10)
    quad(1.5, 10, -10, 10)
    quad(-1.5, 1.5, -10, -1.5)
    quad(-1.5, 1.5, 1.5, 10)
    v0 = np.stack([q[0] for q in quads]).astype(np.float32)
    e1 = np.stack([q[1] for q in quads]).astype(np.float32)
    e2 = np.stack([q[2] for q in quads]).astype(np.float32)
    planes = rt._tri_planes_np(v0, e1, e2)
    # through the doorway center vs into the wall
    o = np.array([[-5.0, 0.0, 0.0], [-5.0, 5.0, 0.0]], np.float32)
    d = np.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], np.float32)
    t, leaf = rt.trace_dense_tri(jnp.asarray(o), jnp.asarray(d),
                                 jnp.asarray(planes))
    leaf = np.asarray(leaf)
    assert leaf[0] == -1, "doorway ray must pass the opening"
    assert leaf[1] >= 0, "wall ray must hit"
    np.testing.assert_allclose(np.asarray(t)[1], 5.0, rtol=1e-4)
    # the sphere proxies of the same triangles are fat: they block the
    # doorway ray (why the exact mode exists)
    center = v0 + (e1 + e2) / 3.0
    rad = np.maximum(np.linalg.norm(v0 - center, axis=1), np.maximum(
        np.linalg.norm(v0 + e1 - center, axis=1),
        np.linalg.norm(v0 + e2 - center, axis=1)))
    sph = np.concatenate([center, rad[:, None]], 1).astype(np.float32)
    _, leaf_sph = rt.trace_dense(jnp.asarray(o), jnp.asarray(d),
                                 jnp.asarray(sph))
    assert np.asarray(leaf_sph)[0] >= 0, \
        "proxy spheres should block the doorway (the gap being tested)"


def test_scene_bvh_triangle_granularity():
    """Triangle BVH over the procedural scene: camera rays hit at the
    same depth the brute triangle oracle reports."""
    from chord_tpu.asset.procedural import build_sponza_like
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.camera import Camera

    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)
    cam = Camera(width=64, height=64)
    cam.position = np.array([-15.0, 4.0, 3.0])
    inst = b.frame_instances(cam)
    bvh = rt.build_scene_bvh(pools, inst, granularity="triangle")
    assert bvh.tri_planes is not None
    n_tri = int(bvh.tri_planes.shape[0])
    assert n_tri > 100
    rng = np.random.default_rng(9)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.zeros((128, 3), np.float32)
    t, leaf = rt.trace(jnp.asarray(o), jnp.asarray(d), bvh)
    # independent oracle: rebuild the same root-cut triangle soup
    pm = np.asarray(pools.pair_meshlet); po = np.asarray(pools.pair_object)
    keep = np.asarray(pools.pair_valid) & \
        (np.asarray(pools.meshlet_parent_error)[pm] > 1e30)
    ids = np.nonzero(keep)[0]
    tri = np.asarray(pools.tri_indices).reshape(-1, 128, 3)[pm[ids]]
    cnt = np.asarray(pools.meshlet_tri_count)[pm[ids]]
    tmask = np.arange(128)[None, :] < cnt[:, None]
    v = np.asarray(pools.positions)[tri]
    o2w = np.asarray(inst.object_to_tw)[po[ids]]
    vh = np.concatenate([v, np.ones(v.shape[:3] + (1,))], -1)
    vw = np.einsum("ktcj,kjl->ktcl", vh, o2w)[..., :3]
    v0 = vw[:, :, 0][tmask]
    e1 = (vw[:, :, 1] - vw[:, :, 0])[tmask]
    e2 = (vw[:, :, 2] - vw[:, :, 0])[tmask]
    ok = np.linalg.norm(np.cross(e1, e2), axis=1) > 1e-12
    t_ref, leaf_ref = rt.trace_brute_tri_numpy(o, d, v0[ok], e1[ok], e2[ok])
    hit = np.asarray(leaf) >= 0
    np.testing.assert_array_equal(hit, leaf_ref >= 0)
    np.testing.assert_allclose(np.asarray(t)[hit], t_ref[hit],
                               rtol=5e-3, atol=1e-2)


@pytest.mark.slow
def test_dynamic_bvh_follows_moving_occluder():
    """rt_dynamic rebuilds the scene BVH every frame from the live
    instance transforms (the reference's per-frame async TLAS rebuild,
    renderer/renderer.cpp:292-304): a moving occluder's RTAO darkening
    must FOLLOW it across frames instead of staying stale (VERDICT r3
    missing #2)."""
    import numpy as np

    from chord_tpu.asset.procedural import make_box, make_plane
    from chord_tpu.ops.gi import GIConfig
    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  MeshletRenderer)
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.rhi.scene_arrays import SceneBuilder
    from chord_tpu.utils.camera import Camera

    b = SceneBuilder()
    floor = b.add_mesh(make_plane(size=30.0))
    box = b.add_mesh(make_box((1.5, 0.4, 6.0)))   # long thin slab
    b.add_instance(floor)
    t = np.eye(4)
    t[3, :3] = [-6.0, 0.55, 0.0]                  # hovers above the floor
    slab = b.add_instance(box, local_to_world=t.copy())
    pools = build_meshlet_pools(b, nanite=False)

    w, h = 128, 64
    cam = Camera(width=w, height=h)
    cam.position = np.array([0.0, 14.0, 0.01])
    cam.look_at(np.array([0.0, 0.0, 0.0]))        # top-down view

    r = MeshletRenderer(
        RendererConfig(width=w, height=h, pair_capacity=2048,
                       big_capacity=64, interpret=True,
                       enable_bloom=False, enable_tsr=False),
        MeshletFrameConfig(draw_capacity=512, occlusion=False,
                           gi=True, gi_mode="probe", gi_rt=True,
                           rt_dynamic=True, rt_granularity="triangle",
                           gi_cfg=GIConfig(ao_mode="rtao", rtao_rays=6,
                                           ao_radius=3.0, ao_res_div=2)))

    def ao_argmin_col(x_pos):
        tt = np.eye(4)
        tt[3, :3] = [x_pos, 0.55, 0.0]
        b.instances[slab] = (b.instances[slab][0], b.instances[slab][1],
                             tt)
        img, _ = r.render(pools, b.frame_instances(cam),
                          cam.view_uniform(0),
                          sun_direction=(0.0, 1.0, 0.0))
        img = np.asarray(img).astype(np.float32).mean(-1)
        # floor rows just past the slab's z extent (the slab hides the
        # floor directly beneath it from this top-down camera; the RTAO
        # penumbra around its footprint is what moves): the darkest
        # COLUMN there tracks the occluder
        rows = img[18:22].mean(0)
        return int(rows.argmin())

    cols = [ao_argmin_col(x) for x in (-6.0, 0.0, 6.0)]
    # leaf/node shapes stayed constant => no retrace, only values moved
    assert cols[0] < cols[1] < cols[2], \
        f"RTAO dark spot did not follow the occluder: {cols}"
    assert cols[2] - cols[0] > w // 4, cols
