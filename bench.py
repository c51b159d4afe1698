#!/usr/bin/env python
"""Benchmark harness: renders the BASELINE configs and prints ONE JSON line.

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric (BASELINE.md): full-pipeline ms/frame at 1080p on the
Bistro-scale scene, plus Mtris/s through the visibility-buffer raster.
`vs_baseline` is measured against the 16.6 ms/frame north star (>1 = faster
than target).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def bench_frame(width=1920, height=1080, detail=3, frames=20, warmup=3,
                scene="bistro"):
    import jax

    from chord_tpu.asset.procedural import build_bistro_like, build_sponza_like
    from chord_tpu.renderer.deferred import DeferredRenderer, RendererConfig
    from chord_tpu.utils.camera import Camera

    if scene == "bistro":
        b = build_bistro_like(detail=detail)
    else:
        b = build_sponza_like(detail=detail)
    pools = b.build_pools()
    n_tris = int(np.sum(np.asarray(pools.tri_valid)))

    cam = Camera(width=width, height=height)
    cam.position = np.array([-30.0, 6.0, 18.0])
    cam.look_at(np.array([20.0, 2.0, -5.0]))

    config = RendererConfig(width=width, height=height,
                            pair_capacity=32768, big_capacity=1024)
    r = DeferredRenderer(config)

    inst = b.frame_instances(cam)
    # compile + warmup
    t0 = time.time()
    for i in range(warmup):
        img, stats = r.render(pools, inst, cam.view_uniform(i))
    img.block_until_ready()
    compile_s = time.time() - t0

    # steady state: camera orbits slightly so culling isn't fully cached
    times = []
    drawn = 0
    for i in range(frames):
        cam.position = np.array([-30.0 + 0.05 * i, 6.0, 18.0])
        inst = b.frame_instances(cam)
        view = cam.view_uniform(warmup + i)
        t0 = time.time()
        img, stats = r.render(pools, inst, view)
        img.block_until_ready()
        times.append(time.time() - t0)
        drawn = int(np.asarray(stats["drawn_tris"]))

    ms = float(np.median(times) * 1000.0)
    mtris_s = drawn / (ms / 1000.0) / 1e6
    return {
        "ms_per_frame": ms,
        "mtris_per_s": mtris_s,
        "scene_tris": n_tris,
        "drawn_tris": drawn,
        "compile_s": compile_s,
        "width": width, "height": height,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--detail", type=int, default=3)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--scene", default="bistro")
    args = ap.parse_args()

    try:
        r = bench_frame(args.width, args.height, args.detail, args.frames,
                        scene=args.scene)
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
