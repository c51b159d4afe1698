"""Screen-space reflections (reference: specular GI trace,
screen_probe_gather.cpp — here a depth-buffer march, ops/ssr.py)."""

import jax.numpy as jnp
import numpy as np

from chord_tpu.ops.ssr import SSRConfig, trace
from chord_tpu.utils.camera import Camera


def test_floor_reflects_wall():
    """A camera over a floor facing a lit wall: floor pixels' mirror rays
    must hit the wall region of the screen."""
    h, w = 64, 128
    cam = Camera(width=w, height=h)
    cam.position = np.zeros(3)
    cam.look_at(np.array([0.0, -0.2, -1.0]))
    u = cam.view_uniform(0)
    vp = jnp.asarray(u.translated_world_to_clip_nojitter)

    # synthetic scene: floor y=-2 for z in [-1,-20]; wall at z=-20
    ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                         indexing="ij")
    # build positions by unprojecting rays onto the analytic scene
    ndc_x = xs / w * 2 - 1
    ndc_y = 1 - ys / h * 2
    inv = np.linalg.inv(np.asarray(vp, np.float64))
    pts = np.stack([ndc_x, ndc_y, np.full_like(ndc_x, 0.5),
                    np.ones_like(ndc_x)], -1) @ inv
    dirs = pts[..., :3] / pts[..., 3:4]
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    # intersect floor (y=-2) and wall (z=-20); nearest positive t wins
    t_floor = np.where(dirs[..., 1] < -1e-6, -2.0 / dirs[..., 1], np.inf)
    t_wall = np.where(dirs[..., 2] < -1e-6, -20.0 / dirs[..., 2], np.inf)
    t = np.minimum(t_floor, t_wall)
    pos = dirs * t[..., None]
    is_floor = t_floor < t_wall
    nrm = np.where(is_floor[..., None], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0])

    # depth buffer from positions
    clip = np.concatenate([pos, np.ones((h, w, 1))], -1) @ np.asarray(vp)
    depth = (clip[..., 2] / clip[..., 3]).astype(np.float32)

    # previous color: wall pixels glow red
    color_prev = np.zeros((h, w, 3), np.float32)
    color_prev[~is_floor] = [5.0, 0.1, 0.1]

    col, conf = trace(jnp.asarray(depth), jnp.asarray(color_prev),
                      jnp.asarray(pos, jnp.float32),
                      jnp.asarray(nrm, jnp.float32), vp,
                      SSRConfig(steps=16, max_distance=50.0))
    col = np.asarray(col)
    conf = np.asarray(conf)
    # floor pixels in the lower half should reflect the red wall
    floor_hits = conf[is_floor] > 0.3
    assert floor_hits.mean() > 0.2, f"few hits: {floor_hits.mean():.3f}"
    hit_red = col[is_floor][floor_hits]
    assert (hit_red[:, 0] > hit_red[:, 1]).mean() > 0.9, "reflection not red"
