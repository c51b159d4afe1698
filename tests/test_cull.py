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
