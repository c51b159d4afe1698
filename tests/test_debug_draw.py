"""Debug line overlay (reference: renderer/debugline.cpp GPU line pass)."""

import jax.numpy as jnp
import numpy as np

from chord_tpu.ops.debug_draw import (aabb_segments, overlay_lines,
                                      project_segments, sphere_segments)


def test_shape_helpers():
    box = aabb_segments([0, 0, 0], [1, 2, 3])
    assert box.shape == (12, 2, 3)
    # total edge length = 4*(1+2+3)
    lens = np.linalg.norm(box[:, 1] - box[:, 0], axis=-1)
    assert abs(lens.sum() - 24.0) < 1e-4

    sph = sphere_segments([1, 0, 0], 2.0, segs=16)
    assert sph.shape == (48, 2, 3)
    r = np.linalg.norm(sph[:, 0] - [1, 0, 0], axis=-1)
    np.testing.assert_allclose(r, 2.0, atol=1e-4)


def test_overlay_lines_draws_and_masks():
    img = jnp.zeros((32, 64, 3))
    segs = jnp.asarray([
        [[4.0, 16.0], [60.0, 16.0]],     # horizontal line at y=16
        [[4.0, 4.0], [60.0, 4.0]],       # masked out
    ])
    valid = jnp.asarray([True, False])
    out = np.asarray(overlay_lines(img, segs, valid, color=(0, 1, 0),
                                   width_px=1.0))
    assert out[16, 30, 1] > 0.9            # on the line
    assert out[25, 30].max() < 1e-6        # far away untouched
    assert out[4, 30].max() < 1e-6         # masked segment not drawn
    assert np.isfinite(out).all()


def test_project_segments_rejects_behind():
    from chord_tpu.utils.camera import Camera

    cam = Camera(width=64, height=32)
    cam.look_at(np.array([0.0, 0.0, -1.0]))      # looking down -z
    vp = jnp.asarray(cam.view_uniform(0).translated_world_to_clip_nojitter)
    segs = jnp.asarray([
        [[-1.0, 0.0, -5.0], [1.0, 0.0, -5.0]],   # in front
        [[-1.0, 0.0, 5.0], [1.0, 0.0, 5.0]],     # behind
    ])
    px, ok = project_segments(segs, vp, 64, 32)
    ok = np.asarray(ok)
    assert ok.tolist() == [True, False]
    p = np.asarray(px)[0]
    # centered segment projects around screen center
    assert abs(p[:, 1].mean() - 16.0) < 1.0
    assert 0 < p[0, 0] < 32 < p[1, 0] < 64
