#!/usr/bin/env python
"""Device profiler: trace one all-features frame sequence and print a
per-source-line / per-pass device-time table.

The TPU analog of the reference's per-pass GPU timestamp table
(reference: source/graphics/query.cpp:5-124 GPUTimestamps,
renderer/renderer.cpp:277-280 per-pass labels): captures a
jax.profiler trace of the jitted frame scan, then aggregates XLA
fusion device-time by (a) named_scope pass label and (b) python
source line — the second view localizes a regression to the exact
op that emitted it, which pass labels alone cannot.

Usage:
    python tools/profile_trace.py                # trace + report
    python tools/profile_trace.py --report DIR   # re-report old trace
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(trace_dir: str, frames: int = 8, width: int = 1920,
            height: int = 1080) -> None:
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp

    from bench import _make_scene, _camera_path
    from chord_tpu.ops.screen_probe import ScreenProbeConfig
    from chord_tpu.ops.shadow import ShadowConfig
    from chord_tpu.renderer.deferred import DeviceView, RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  render_sequence_meshlet)
    from chord_tpu.rhi.framebuffer import FrameHistory
    from chord_tpu.utils.camera import Camera
    from chord_tpu.ops.gi import GIConfig
    from chord_tpu.ops.rt import build_scene_bvh
    from chord_tpu.ops import atmosphere as atm

    rs = 0.6667
    rw, rh = int(width * rs) // 8 * 8, int(height * rs) // 8 * 8
    b, pools, _ = _make_scene("bistro", 3, 2_600_000)
    cam = Camera(width=rw, height=rh)
    config = RendererConfig(width=rw, height=rh, post_width=width,
                            post_height=height, pair_capacity=16384,
                            big_capacity=64, enable_bloom=True,
                            enable_tsr=True, tsr_mode="global")
    inst = b.frame_instances(cam)
    views_u = _camera_path("bistro", cam, frames)
    scfg = ShadowConfig()
    dviews = [DeviceView.from_uniform(u, shadow_cfg=scfg) for u in views_u]
    p_atm = atm.AtmosphereParams()
    t_lut = jax.jit(atm.build_transmittance_lut, static_argnums=1)(p_atm, 40)
    ms_lut = jax.jit(lambda tl: atm.build_multiscatter_lut(
        p_atm, tl, dir_samples=16, steps=12))(t_lut)
    sun_d = np.asarray([0.3, 0.8, 0.5], np.float32)
    sun_d /= np.linalg.norm(sun_d)
    sky_lut = jax.jit(lambda tl, msl: atm.build_sky_view_lut(
        p_atm, tl, msl, jnp.asarray(sun_d)))(t_lut, ms_lut)
    dviews = [v.replace(atmo_t_lut=t_lut, atmo_ms_lut=ms_lut,
                        atmo_sky_lut=sky_lut) for v in dviews]
    views = jax.tree.map(lambda *xs: jnp.stack(xs), *dviews)
    bvh = build_scene_bvh(pools, inst, granularity="object")
    mcfg = MeshletFrameConfig(
        draw_capacity=6144, occlusion=True, shadows=True, atmosphere=True,
        gi=True, gi_mode="probe", gi_rt=True, rt_rays=2, ssr=True,
        textured=True, alpha_masked=True, alpha_blend=True,
        shadow_masked=True, trilinear=True, shadow_cfg=scfg,
        probe_cfg=ScreenProbeConfig(rays=16, steps=6))
    hist = FrameHistory.empty(
        rh, rw, post_h=height, post_w=width, gi_cfg=GIConfig(),
        shadow_cascades=scfg.cascade_count, shadow_res=scfg.resolution,
        shadow_div=scfg.eval_res_div, shadow_phase=scfg.temporal_phase,
        probe_tile=8)
    import functools
    fn = jax.jit(functools.partial(render_sequence_meshlet, config=config,
                                   mcfg=mcfg, bvh=bvh))
    img, _ = fn(pools, inst, views, hist)
    _ = jax.device_get(img[-1, :1, :1])
    print("warm, tracing...", flush=True)
    with jax.profiler.trace(trace_dir):
        img, _ = fn(pools, inst, views, hist)
        _ = jax.device_get(img[-1, :1, :1])
    print("trace done", flush=True)


def aggregate(trace_dir: str):
    """Parse the newest trace under trace_dir -> (by_scope us Counter,
    by_line us Counter, per-key event counts, total us). Importable (the
    bench folds per-pass ms into its artifact through this)."""
    pats = glob.glob(os.path.join(trace_dir,
                                  "plugins/profile/*/*.trace.json.gz"))
    if not pats:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    path = max(pats, key=os.path.getmtime)
    with gzip.open(path) as f:
        t = json.load(f)
    by_line = collections.Counter()
    by_scope = collections.Counter()
    cnt = collections.Counter()
    total = 0
    for e in t["traceEvents"]:
        if e.get("ph") != "X":
            continue
        a = e.get("args") or {}
        if "device_duration_ps" not in a:
            continue
        # container ops (conditional/while wrappers) double-count bodies
        if a.get("hlo_category") in ("conditional",):
            continue
        src = a.get("source", "?").replace("/root/repo/", "")
        op = a.get("tf_op", "")
        scope = "/".join(p for p in op.split("/")
                         if not p.startswith(("jit", "while", "body",
                                              "closed_call")))
        key = (src, scope[:48])
        by_line[key] += e["dur"]
        # pass view: first named_scope component
        first = scope.split("/")[0] if scope else "?"
        by_scope[first] += e["dur"]
        cnt[key] += 1
        total += e["dur"]
    return by_scope, by_line, cnt, total


def report(trace_dir: str, frames: int = 8, top: int = 45) -> None:
    try:
        by_scope, by_line, cnt, total = aggregate(trace_dir)
    except FileNotFoundError as e:
        print(str(e), file=sys.stderr)
        sys.exit(1)
    div = frames * 1000.0
    print(f"== per-pass (named_scope) device ms/frame, total "
          f"{total / div:.2f} ==")
    for scope, us in by_scope.most_common(25):
        print(f"{us / div:8.3f}  {scope}")
    print(f"\n== per-source-line device ms/frame (top {top}) ==")
    shown = 0
    for (src, scope), us in by_line.most_common(top):
        print(f"{us / div:7.3f} x{cnt[(src, scope)]:4d}  {src:52s} {scope}")
        shown += us
    print(f"sum of shown: {shown / div:.2f} ms/frame")


def main():
    ap = argparse.ArgumentParser()
    # fresh dir per run: a silently-failing profiler otherwise leaves the
    # PREVIOUS trace in place and the report re-reads stale numbers
    import time as _time
    ap.add_argument("--trace-dir",
                    default=f"/tmp/jax_trace_{int(_time.time())}")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--report", metavar="DIR", default=None,
                    help="skip capture; report an existing trace dir")
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()
    if args.report:
        report(args.report, args.frames, args.top)
        return
    capture(args.trace_dir, args.frames, args.width, args.height)
    report(args.trace_dir, args.frames, args.top)


if __name__ == "__main__":
    main()
