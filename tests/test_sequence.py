"""render_sequence_meshlet: scanned multi-frame path + with_stats audit.

The bench's timed region IS this function (bench.py), and the r5
active-table overflow showed why per-frame stats must ride the scan: a
fresh-history audit frame recorded overflow 0 while every timed frame
dropped ~8000 pairs. This test guards the with_stats contract the bench
relies on (reference analog: per-frame GPU query readback,
reference/source/graphics/query.cpp:5-124).
"""

import jax
import numpy as np
import pytest

from chord_tpu.asset.procedural import build_sponza_like
from chord_tpu.ops.gi import GIConfig
from chord_tpu.renderer.deferred import DeviceView, RendererConfig
from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                              render_sequence_meshlet)
from chord_tpu.rhi.framebuffer import FrameHistory
from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
from chord_tpu.utils.camera import Camera

N_FRAMES = 3


def _tiny_sequence_inputs():
    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)
    cam = Camera(width=128, height=64)
    cam.position = np.array([-15.0, 4.0, 0.0])
    cam.look_at(np.array([10.0, 2.0, 0.0]))
    inst = b.frame_instances(cam)
    dviews = []
    for i in range(N_FRAMES):
        cam.position = np.array([-15.0 + 0.5 * i, 4.0, 0.0])
        dviews.append(DeviceView.from_uniform(cam.view_uniform(i)))
    views = jax.tree.map(lambda *xs: jax.numpy.stack(xs), *dviews)
    history = FrameHistory.empty(64, 128)
    return pools, inst, views, history


def test_sequence_with_stats_matches_plain_and_audits_every_frame():
    pools, inst, views, history = _tiny_sequence_inputs()
    config = RendererConfig(width=128, height=64, pair_capacity=4096,
                            big_capacity=128, interpret=True,
                            enable_bloom=False, enable_tsr=False)
    mcfg = MeshletFrameConfig(draw_capacity=1024, occlusion=True)

    imgs, hist, seq = render_sequence_meshlet(
        pools, inst, views, history, config=config, mcfg=mcfg,
        with_stats=True)
    imgs = np.asarray(imgs)
    assert imgs.shape == (N_FRAMES, 64, 128, 3)

    # every stat rides the scan with a per-frame leading axis
    for k in ("drawn_tris", "bin_overflow", "draw_overflow",
              "active_overflow", "draws_phase0"):
        assert k in seq, f"missing per-frame stat {k}"
        assert np.asarray(seq[k]).shape[0] == N_FRAMES, k

    # the tiny scene fits its capacities on EVERY frame (worst-frame
    # audit, exactly how bench.py consumes this)
    for k in ("bin_overflow", "draw_overflow", "active_overflow"):
        worst = int(np.asarray(seq[k]).max())
        assert worst == 0, f"{k} worst-frame {worst}"
    assert int(np.asarray(seq["drawn_tris"]).min()) > 100

    # with_stats must not perturb the rendered sequence
    imgs2, _ = render_sequence_meshlet(
        pools, inst, views, history, config=config, mcfg=mcfg)
    np.testing.assert_array_equal(imgs, np.asarray(imgs2))
