"""Multi-chip strip rendering consistency (parallel/sharded.py): the
sharded frame must reproduce the single-chip image (strip seams invisible
up to per-strip exposure/TSR state, which we disable here)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from chord_tpu.asset.procedural import build_sponza_like
from chord_tpu.parallel.sharded import AXIS, ShardedRenderer
from chord_tpu.renderer.deferred import RendererConfig
from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                              MeshletRenderer)
from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
from chord_tpu.utils.camera import Camera


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
@pytest.mark.slow
def test_strips_match_single_chip():
    n_dev = 4
    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)
    h, w = 64, 128
    cam = Camera(width=w, height=h)
    cam.position = np.array([-15.0, 4.0, 3.0])
    cam.look_at(np.array([10.0, 2.0, -2.0]))
    inst = b.frame_instances(cam)

    config = RendererConfig(width=w, height=h, pair_capacity=2048,
                            big_capacity=64, interpret=True,
                            enable_bloom=False, enable_tsr=False)
    mcfg = MeshletFrameConfig(draw_capacity=256, occlusion=False)

    single = MeshletRenderer(config, mcfg)
    img_one, _ = single.render(pools, inst, cam.view_uniform(0))
    img_one = np.asarray(img_one)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), (AXIS,))
    sharded = ShardedRenderer(config, mesh, path="meshlet", mcfg=mcfg)
    img_n, stats = sharded.render(pools, inst, cam.view_uniform(0))
    img_n = np.asarray(img_n)

    assert img_n.shape == img_one.shape
    diff = np.abs(img_one.astype(int) - img_n.astype(int))
    frac_off = (diff.max(-1) > 8).mean()
    # strip frusta clip geometry at slightly different precision along
    # seam rows; everything else must match
    assert frac_off < 0.02, f"{frac_off:.4f} of pixels differ"
    # no strip may be empty (all strips saw geometry)
    for k in range(n_dev):
        strip = img_n[k * h // n_dev:(k + 1) * h // n_dev]
        assert strip.std() > 1.0, f"strip {k} empty"
