#!/usr/bin/env python
"""Benchmark harness: renders the BASELINE configs and prints ONE JSON line.

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric (BASELINE.md): full-pipeline ms/frame at 1080p on the
Bistro-scale procedural scene through the GPU-driven meshlet pipeline
(Nanite LOD cut + two-phase HZB occlusion + visbuffer raster + deferred
PBR + bloom/TAA/tonemap). Measured as an N-frame camera fly-through
rendered in ONE dispatch (lax.scan) — the honest device-throughput shape
(the axon tunnel adds ~26ms per dispatch that production serving would
not pay). `vs_baseline` is against the 16.6 ms/frame north star.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def bench_frame(width=1920, height=1080, detail=3, frames=16, scene="bistro",
                render_scale=1.0):
    import functools

    import jax

    from chord_tpu.asset.procedural import (build_bistro_like,
                                            build_nanite_stress,
                                            build_sponza_like)
    from chord_tpu.native import available as native_available
    from chord_tpu.renderer.deferred import DeviceView, RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  render_sequence_meshlet)
    from chord_tpu.rhi.framebuffer import FrameHistory
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.camera import Camera

    if scene == "bistro":
        b = build_bistro_like(detail=detail)
    elif scene == "nanite":
        b = build_nanite_stress(rings=16 * detail)
    else:
        b = build_sponza_like(detail=detail)
    pools = build_meshlet_pools(b, nanite=native_available())
    n_src_tris = sum(m.num_triangles for m, in
                     [(b.meshes[mi],) for mi, _, _ in b.instances])

    rw = int(width * render_scale) // 8 * 8
    rh = int(height * render_scale) // 8 * 8
    cam = Camera(width=rw, height=rh)
    config = RendererConfig(width=rw, height=rh,
                            post_width=width if render_scale != 1.0 else 0,
                            post_height=height if render_scale != 1.0 else 0,
                            pair_capacity=16384, big_capacity=64,
                            enable_bloom=True, enable_tsr=True,
                            tsr_mode="global")
    mcfg = MeshletFrameConfig(draw_capacity=4096, occlusion=True)

    views = []
    for i in range(frames):
        t = i / max(frames - 1, 1)
        if scene == "bistro":
            cam.position = np.array([-45.0 + 70.0 * t, 5.0, 4.0])
            cam.look_at(np.array([55.0, 3.0, -4.0]))
        elif scene == "nanite":
            ang = t * 1.5
            cam.position = np.array([50.0 * np.cos(ang), 9.0,
                                     50.0 * np.sin(ang)])
            cam.look_at(np.array([0.0, 2.0, 0.0]))
        else:
            cam.position = np.array([-16.0 + 6.0 * t, 4.5, 3.0])
            cam.look_at(np.array([12.0, 2.0, -2.0]))
        views.append(DeviceView.from_uniform(cam.view_uniform(i)))
    views_stacked = jax.tree.map(lambda *xs: jax.numpy.stack(xs), *views)
    history = FrameHistory.empty(
        rh, rw, post_h=height if render_scale != 1.0 else None,
        post_w=width if render_scale != 1.0 else None)
    inst = b.frame_instances(cam)

    fn = jax.jit(functools.partial(
        render_sequence_meshlet, config=config, mcfg=mcfg))

    # sync on a 1-pixel fetch: the scan output depends on every frame, so
    # this forces full completion without paying the axon tunnel's ~160 ms
    # full-frame readback inside the timed region
    t0 = time.time()
    images, hist = fn(pools, inst, views_stacked, history)
    _ = jax.device_get(images[-1, :1, :1])
    compile_s = time.time() - t0

    t0 = time.time()
    images, hist = fn(pools, inst, views_stacked, history)
    _ = jax.device_get(images[-1, :1, :1])
    dt = time.time() - t0
    ms = dt / frames * 1000.0

    # drawn triangle count from a single traced frame (for Mtris/s)
    from chord_tpu.renderer.meshlet_frame import render_frame_meshlet
    one = jax.jit(functools.partial(render_frame_meshlet, config=config,
                                    mcfg=mcfg))
    _img, _h, stats = one(pools, inst, views[frames // 2], history)
    drawn = int(np.asarray(stats["drawn_tris"]))

    return {
        "ms_per_frame": ms,
        "mtris_per_s": drawn / (ms / 1000.0) / 1e6,
        "scene_src_tris": int(n_src_tris),
        "drawn_tris": drawn,
        "compile_s": compile_s,
        "frames": frames,
        "width": width, "height": height,
        "render_scale": render_scale,
        "nanite": bool(native_available()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--detail", type=int, default=3)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--scene", default="bistro")
    ap.add_argument("--render-scale", type=float, default=1.0,
                    help="TSR upscale: render at scale*res, temporal-"
                         "upscale to full res (the reference's render-dim"
                         " -> post-dim DimensionConfig chain)")
    args = ap.parse_args()

    try:
        r = bench_frame(args.width, args.height, args.detail, args.frames,
                        scene=args.scene, render_scale=args.render_scale)
        ms = r["ms_per_frame"]
        north_star_ms = 16.6   # BASELINE.json north star
        print(json.dumps({
            "metric": "full_pipeline_1080p_ms_per_frame",
            "value": round(ms, 3),
            "unit": "ms",
            "vs_baseline": round(north_star_ms / ms, 3),
            "detail": {k: (round(v, 3) if isinstance(v, float) else v)
                       for k, v in r.items()},
        }))
    except Exception as e:  # noqa: BLE001 — bench must always emit a line
        print(json.dumps({
            "metric": "full_pipeline_1080p_ms_per_frame",
            "value": -1, "unit": "ms", "vs_baseline": 0,
            "error": f"{type(e).__name__}: {e}"}))
        sys.exit(1)


if __name__ == "__main__":
    main()
