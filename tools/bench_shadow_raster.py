#!/usr/bin/env python
"""Isolated device timing of the cascade shadow raster: jit ONE
render_shadow_cascade program per cascade index and sweep the knobs
that scale its cost (resolution, per-cascade LOD factor, masked-caster
cascade cutoff). The in-frame trace can only show the aggregate
lax.switch cost; this localizes which cascade/knob pays.

Usage: python tools/bench_shadow_raster.py [--cases a,b,...]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="base,res512,lod3,masked1,"
                                       "masked0,lod3_res512")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _camera_path, _make_scene
    from chord_tpu.ops.shadow import ShadowConfig
    from chord_tpu.renderer.deferred import DeviceView, RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  render_shadow_cascade)
    from chord_tpu.ops.raster import RasterConfig
    from chord_tpu.utils.camera import Camera

    b, pools, n_src = _make_scene("bistro", 3, 2_600_000)
    rw, rh = 1280, 712
    cam = Camera(width=rw, height=rh)
    views = _camera_path("bistro", cam, 8)
    view = DeviceView.from_uniform(views[4], shadow_cfg=ShadowConfig())
    inst = b.frame_instances(cam)
    rc_main = RasterConfig(width=rw, height=rh, pair_capacity=16384,
                           big_capacity=64)

    def cfg_for(case):
        scfg = ShadowConfig()
        kw = dict(draw_capacity=6144, occlusion=True, shadows=True,
                  textured=True, alpha_masked=True, alpha_blend=True,
                  shadow_masked=True, shadow_cfg=scfg)
        if case == "base":
            pass
        elif case == "res512":
            kw["shadow_cfg"] = scfg._replace(resolution=512)
        elif case == "lod3":
            kw["shadow_lod_cascade_factor"] = 3.0
        elif case == "masked1":
            kw["shadow_masked_cascades"] = 1
        elif case == "masked0":
            kw["shadow_masked_cascades"] = 0
        elif case == "lod3_res512":
            kw["shadow_cfg"] = scfg._replace(resolution=512)
            kw["shadow_lod_cascade_factor"] = 3.0
        else:
            raise SystemExit(f"unknown case {case}")
        return MeshletFrameConfig(**kw)

    for case in args.cases.split(","):
        mcfg = cfg_for(case)
        # per-cascade cost: separate jit per static k (the in-frame
        # switch dispatches one branch per frame anyway)
        times = []
        for k in range(mcfg.shadow_cfg.cascade_count):
            fn = jax.jit(functools.partial(
                render_shadow_cascade, rc_main=rc_main, mcfg=mcfg,
                k=jnp.int32(k)),
                static_argnames=())
            t0 = time.time()
            out = fn(pools, inst, view)
            out.block_until_ready()
            _ = jax.device_get(out[:1, :1])
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.frames):
                out = fn(pools, inst, view)
            _ = jax.device_get(out[:1, :1])
            ms = (time.time() - t0) / args.frames * 1000.0
            times.append(round(ms, 2))
        avg = round(float(np.mean(times)), 2)
        print(json.dumps({"case": case, "per_cascade_ms": times,
                          "avg_ms": avg,
                          "compile_s_last": round(compile_s, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
