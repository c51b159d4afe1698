"""Culling kernels vs oracles (reference: instance_culling.hlsl,
nanite_shared.hlsli) — frustum, cone, compaction, error projection."""

import jax.numpy as jnp
import numpy as np

from chord_tpu.ops.cull import (compact_draws, frustum_visible,
                                project_error_px)
from chord_tpu.utils import math as cmath
from chord_tpu.utils.camera import Camera


class _PoolsStub:
    def __init__(self, obj, mesh):
        self.pair_object = jnp.asarray(obj, jnp.int32)
        self.pair_meshlet = jnp.asarray(mesh, jnp.int32)


def test_frustum_visible_oracle():
    cam = Camera(width=320, height=180)
    cam.position = np.zeros(3)
    cam.look_at(np.array([0.0, 0.0, -1.0]))
    u = cam.view_uniform(0)
    planes = jnp.asarray(u.frustum_planes)
    rng = np.random.default_rng(0)
    centers = rng.uniform(-50, 50, (256, 3)).astype(np.float32)
    radii = rng.uniform(0.1, 2.0, 256).astype(np.float32)
    vis = np.asarray(frustum_visible(jnp.asarray(centers),
                                     jnp.asarray(radii), planes))
    # oracle: all plane distances + r >= 0
    p = np.asarray(u.frustum_planes)
    d = centers @ p[:, :3].T + p[None, :, 3]
    expect = (d + radii[:, None] >= 0).all(1)
    np.testing.assert_array_equal(vis, expect)
    # sanity: points straight ahead visible, behind culled
    ahead = frustum_visible(jnp.asarray([[0.0, 0.0, -10.0]]),
                            jnp.asarray([0.5]), planes)
    behind = frustum_visible(jnp.asarray([[0.0, 0.0, 10.0]]),
                             jnp.asarray([0.5]), planes)
    assert bool(ahead[0]) and not bool(behind[0])


def test_compact_draws_order_and_overflow():
    n = 512
    rng = np.random.default_rng(1)
    visible = rng.random(n) < 0.3
    pools = _PoolsStub(np.arange(n), np.arange(n) * 7)
    d = compact_draws(jnp.asarray(visible), pools, capacity=32)
    total = int(visible.sum())
    assert int(d.count) == min(total, 32)
    assert int(d.overflow) == max(total - 32, 0)
    # compaction preserves order of the visible subset
    expect = np.arange(n)[visible][:32]
    np.testing.assert_array_equal(np.asarray(d.object_id)[:int(d.count)],
                                  expect[:int(d.count)])
    np.testing.assert_array_equal(np.asarray(d.meshlet_id)[:int(d.count)],
                                  expect[:int(d.count)] * 7)


def test_error_projection_monotone_in_distance():
    scale = jnp.float32(540.0)   # 0.5*h*P11-ish
    err = jnp.asarray([0.01, 0.01, 0.01])
    centers = jnp.asarray([[0, 0, -2.0], [0, 0, -8.0], [0, 0, -32.0]])
    px = np.asarray(project_error_px(centers, err, scale))
    assert px[0] > px[1] > px[2], px
    # eye inside the error sphere -> forced huge
    inside = project_error_px(jnp.asarray([[0.0, 0.0, 0.001]]),
                              jnp.asarray([1.0]), scale)
    assert float(inside[0]) > 1e8


def test_object_precull_equivalence():
    """With capacity covering every pair, the object-preculled frame
    culls to the same visible draw SET as the brute-force path
    (reference: object pre-cull only removes frustum-out objects)."""
    import jax.numpy as jnp
    import numpy as np
    from chord_tpu.asset.procedural import build_sponza_like
    from chord_tpu.ops.cull import build_active_pairs, cull_pairs
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.camera import Camera

    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)
    cam = Camera(width=128, height=64)
    cam.position = np.array([-15.0, 4.0, 3.0])
    cam.look_at(np.array([10.0, 2.0, -2.0]))
    inst = b.frame_instances(cam)
    u = cam.view_uniform(0)
    planes = jnp.asarray(u.frustum_planes)
    proj_scale = jnp.float32(0.5 * 64 * u.view_to_clip[1, 1])

    res_full = cull_pairs(pools, inst, planes, proj_scale, 512)
    active = build_active_pairs(pools, inst, planes, pools.num_pairs)
    assert int(active.overflow) == 0
    res_act = cull_pairs(pools, inst, planes, proj_scale, 512,
                         active=active)
    nf = int(res_full.draws.count)
    na = int(res_act.draws.count)
    a = set(zip(np.asarray(res_full.draws.object_id[:nf]).tolist(),
                np.asarray(res_full.draws.meshlet_id[:nf]).tolist()))
    bset = set(zip(np.asarray(res_act.draws.object_id[:na]).tolist(),
                   np.asarray(res_act.draws.meshlet_id[:na]).tolist()))
    # the preculled set is a subset: its object-level OBB test is tighter
    # than the brute path's per-pair sphere tests. Anything it drops must
    # belong to an object whose OBB is fully outside the frustum.
    assert bset <= a
    if bset != a:
        obb = np.asarray(inst.object_obb_tw)
        p = np.asarray(u.frustum_planes)
        for oid, _m in a - bset:
            c = obb[oid, 0:3]
            axes = obb[oid, 3:12].reshape(3, 3)
            d = c @ p[:, :3].T + p[:, 3]
            r = np.abs(axes @ p[:, :3].T).sum(0)
            assert (d + r < 0).any(), f"object {oid} dropped but OBB visible"


def test_object_precull_drops_out_of_frustum_objects():
    import jax.numpy as jnp
    import numpy as np
    from chord_tpu.asset.procedural import build_sponza_like
    from chord_tpu.ops.cull import build_active_pairs
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.camera import Camera

    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)
    cam = Camera(width=128, height=64)
    cam.position = np.array([-15.0, 4.0, 3.0])
    cam.look_at(np.array([-100.0, 4.0, 3.0]))   # look AWAY from the scene
    inst = b.frame_instances(cam)
    u = cam.view_uniform(0)
    active = build_active_pairs(pools, inst, jnp.asarray(u.frustum_planes),
                                pools.num_pairs)
    # far fewer active pairs than the full table
    assert int(active.count) < pools.num_pairs // 2


def test_object_precull_obb_tighter_than_sphere():
    """The object pre-cull tests the instance OBB (reference
    instance_culling.hlsl:48-131), not the bounding sphere: a long thin
    plate lying just outside a frustum plane is culled even though its
    bounding sphere pokes in; on-screen objects always survive."""
    import jax.numpy as jnp
    import numpy as np
    from chord_tpu.asset.procedural import make_box
    from chord_tpu.ops.cull import build_active_pairs
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.rhi.scene_arrays import SceneBuilder
    from chord_tpu.utils.camera import Camera

    b = SceneBuilder()
    plate = b.add_mesh(make_box(extents=(40.0, 0.2, 0.2)))  # sphere r≈20
    cube = b.add_mesh(make_box(extents=(1.0, 1.0, 1.0)))

    cam = Camera(width=128, height=64)
    cam.position = np.zeros(3)
    cam.look_at(np.array([0.0, 0.0, -1.0]))

    def at(x, y, z):
        m = np.eye(4, dtype=np.float64)
        m[3, :3] = (x, y, z)
        return m

    # plate parallel to the right frustum plane's x-extent, just outside
    # the frustum at z=-5 (x ~ +7 is far outside a 90-ish deg frustum at
    # that depth); its 20-unit bounding sphere still crosses the plane
    b.add_instance(plate, 0, at(12.0, 0.0, 5.0))   # behind the camera too
    b.add_instance(cube, 0, at(0.0, 0.0, -5.0))    # dead center on screen
    pools = build_meshlet_pools(b)
    inst = b.frame_instances(cam)
    u = cam.view_uniform(0)
    planes = jnp.asarray(u.frustum_planes)

    act = build_active_pairs(pools, inst, planes, pools.num_pairs)
    n = int(act.count)
    objs = set(np.asarray(act.pair_object)[:n].tolist())
    assert 1 in objs          # visible cube survives
    assert 0 not in objs      # thin plate OBB-culled (sphere would pass)

    # sanity: the sphere test alone would have kept the plate
    s = np.asarray(inst.object_sphere_tw)
    p = np.asarray(u.frustum_planes)
    d = s[0, :3] @ p[:, :3].T + p[:, 3]
    assert (d + s[0, 3] >= 0).all()
