#!/usr/bin/env python
"""Repro driver for the residual shadow_masked worker fault.

bench_features shadow_masked survived its warm pass (4 frames + split
PCSS evals, post=off) and crashed on the second, identical pass; with
post on (TSR+bloom) the first frame crashed — so the fault is sensitive
to BOTH program content and execution count. This driver runs one
parameterized config for --frames frames across --passes passes with a
controllable sync policy:

  --sync none    fire-and-forget dispatches, fetch once per pass
                 (bench behavior)
  --sync frame   device_get 1px after every frame (queue depth <= 2)
  --sync eval    device_get 1px after every split-eval dispatch only

Feature knobs: --post 0|1 (TSR+bloom), --textured, --masked, --shadows.
Prints a timestamped JSON line per frame so the crash point is visible
in the child's stdout even when the process dies.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sync", default="none",
                    choices=["none", "frame", "eval"])
    ap.add_argument("--detail", type=int, default=3)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--post", type=int, default=1)
    ap.add_argument("--textured", type=int, default=1)
    ap.add_argument("--masked", type=int, default=1)
    ap.add_argument("--shadows", type=int, default=1)
    ap.add_argument("--mode", default="both",
                    choices=["both", "frame_only", "service_only"],
                    help="both = frame + shadow service dispatches; "
                    "frame_only = frame program only (service skipped, "
                    "the split mask stays at its initial value); "
                    "service_only = ONE warmup frame to get real eval "
                    "inputs, then loop the shadow-service dispatch alone")
    args = ap.parse_args()

    import jax
    import numpy as np

    from bench import _make_scene, _camera_path
    from chord_tpu.ops.gi import GIConfig
    from chord_tpu.renderer.deferred import DeviceView, RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  _split_sequence_fns)
    from chord_tpu.rhi.framebuffer import FrameHistory

    from chord_tpu.utils.camera import Camera

    w, h = args.width, args.height
    b, pools, n_src = _make_scene("bistro", args.detail, 2_600_000)
    cam = Camera(width=w, height=h)
    config = RendererConfig(width=w, height=h, pair_capacity=16384,
                            big_capacity=64,
                            enable_bloom=bool(args.post),
                            enable_tsr=bool(args.post),
                            tsr_mode="global")
    mcfg = MeshletFrameConfig(draw_capacity=6144, occlusion=True,
                              shadows=bool(args.shadows),
                              textured=bool(args.textured),
                              alpha_masked=bool(args.masked))
    views_u = _camera_path("bistro", cam, args.frames)
    dviews = [DeviceView.from_uniform(
        u, shadow_cfg=mcfg.shadow_cfg if mcfg.shadows else None)
        for u in views_u]
    history0 = FrameHistory.empty(
        h, w,
        shadow_cascades=(mcfg.shadow_cfg.cascade_count
                         if mcfg.shadows else 0),
        shadow_res=(mcfg.shadow_cfg.resolution if mcfg.shadows else 1),
        shadow_div=mcfg.shadow_cfg.eval_res_div,
        shadow_phase=(mcfg.shadow_cfg.temporal_phase
                      if mcfg.shadow_cfg.temporal else 1))
    inst = b.frame_instances(cam)

    frame_fn, svc_fn = _split_sequence_fns(config, mcfg)

    if args.mode == "service_only":
        # one warmup frame for real eval inputs, then the service alone
        view = dviews[0]
        img, history, stats = frame_fn(pools, inst, view, history0, None)
        sp = stats["shadow_split"]
        _ = jax.device_get(img[:1, :1])
        print(json.dumps({"warmup": True}), flush=True)
        for p in range(args.passes):
            t0 = time.time()
            q = None
            for i in range(args.frames):
                view = dviews[i]
                sp_i = dict(sp, fc=sp["fc"] + i)
                maps, mats, q, mask = svc_fn(pools, inst, view, history,
                                             sp_i)
                history = history.replace(shadow_maps=maps,
                                          shadow_mats=mats,
                                          shadow_mask=mask)
                if args.sync in ("frame", "eval"):
                    _ = jax.device_get(q[:1, :1])
                print(json.dumps({"pass": p, "frame": i,
                                  "t": round(time.time() - t0, 2)}),
                      flush=True)
            _ = jax.device_get(q[:1, :1])
            dt = time.time() - t0
            print(json.dumps({"pass": p, "done": True,
                              "ms_per_frame": round(
                                  dt / args.frames * 1000, 1)}),
                  flush=True)
        return

    for p in range(args.passes):
        history = history0
        t0 = time.time()
        img = None
        for i in range(args.frames):
            view = dviews[i]
            img, history, stats = frame_fn(pools, inst, view, history,
                                           None)
            if args.sync == "frame":
                _ = jax.device_get(img[:1, :1])
            sp = stats.get("shadow_split")
            if sp is not None and args.mode == "both":
                maps, mats, q, mask = svc_fn(pools, inst, view, history,
                                             sp)
                history = history.replace(shadow_maps=maps,
                                          shadow_mats=mats,
                                          shadow_mask=mask)
                if args.sync in ("frame", "eval"):
                    _ = jax.device_get(q[:1, :1])
            print(json.dumps({"pass": p, "frame": i,
                              "t": round(time.time() - t0, 2)}),
                  flush=True)
        _ = jax.device_get(img[:1, :1])
        dt = time.time() - t0
        print(json.dumps({"pass": p, "done": True,
                          "ms_per_frame": round(dt / args.frames * 1000,
                                                1)}), flush=True)


if __name__ == "__main__":
    main()
