#!/usr/bin/env python
"""Draw-count audit across the bench fly-through: prints per-frame
draws_phase0/1 + masked/blend draw counts and overflow so draw
capacities (the mesh-shader setup cost driver — capacity-proportional,
~9 ms at cap 6144) can be right-sized with evidence."""

from __future__ import annotations

import functools
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    from bench import _camera_path, _make_scene
    from chord_tpu.renderer.deferred import DeviceView, RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  render_frame_meshlet)
    from chord_tpu.rhi.framebuffer import FrameHistory
    from chord_tpu.utils.camera import Camera

    w, h = 1920, 1080
    b, pools, n_src = _make_scene("bistro", 3, 2_600_000)
    cam = Camera(width=w, height=h)
    views = _camera_path("bistro", cam, 8)
    inst = b.frame_instances(cam)
    config = RendererConfig(width=w, height=h, pair_capacity=16384,
                            big_capacity=64)
    history = FrameHistory.empty(h, w)
    mcfg = MeshletFrameConfig(draw_capacity=6144, occlusion=True,
                              alpha_masked=True, alpha_blend=True,
                              textured=True)
    fn = jax.jit(functools.partial(render_frame_meshlet, config=config,
                                   mcfg=mcfg))
    hist = history
    for i, u in enumerate(views):
        view = DeviceView.from_uniform(u)
        img, hist, stats = fn(pools, inst, view, hist)
        out = {k: int(np.asarray(v)) for k, v in stats.items()
               if "draw" in k or "overflow" in k or k == "drawn_tris"}
        out["frame"] = i
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
