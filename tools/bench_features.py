#!/usr/bin/env python
"""Feature-bisect bench: times the frame with features toggled one group
at a time, printing one line per config as it completes. Used to locate
perf regressions between bench.py runs (the full-pipeline number is the
sum of independent feature costs only approximately — interactions are
real, so we measure cumulative configs too)."""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def run_config(name, b, pools, n_src_tris, width, height, frames, **feat):
    import jax

    from chord_tpu.ops.screen_probe import ScreenProbeConfig
    from chord_tpu.renderer.deferred import DeviceView, RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  render_sequence_meshlet)
    from chord_tpu.rhi.framebuffer import FrameHistory
    from chord_tpu.utils.camera import Camera
    from bench import _camera_path

    cam = Camera(width=width, height=height)
    config = RendererConfig(width=width, height=height,
                            pair_capacity=16384, big_capacity=64,
                            enable_bloom=feat.get("post", False),
                            enable_tsr=feat.get("post", False),
                            tsr_mode="global")
    from chord_tpu.ops.gi import GIConfig
    gi_cfg = GIConfig(ao_res_div=feat.get("ao_div", 2))
    mcfg = MeshletFrameConfig(
        draw_capacity=feat.get("draw_capacity", 6144), occlusion=True,
        shadows=feat.get("shadows", False),
        atmosphere=feat.get("atmosphere", False),
        gi=feat.get("gi", False), gi_mode=feat.get("gi_mode", "probe"),
        gi_cfg=gi_cfg,
        gi_rt=feat.get("gi_rt", False), rt_rays=feat.get("rt_rays", 2),
        ssr=feat.get("ssr", False),
        textured=feat.get("textured", False),
        trilinear=feat.get("trilinear", False),
        alpha_masked=feat.get("alpha_masked", False),
        alpha_blend=feat.get("alpha_blend", False),
        shadow_masked=feat.get("shadow_masked", True),
        probe_cfg=ScreenProbeConfig(rays=16, steps=6))

    bvh = None
    if feat.get("gi_rt", False):
        from chord_tpu.ops.rt import build_scene_bvh
        bvh = build_scene_bvh(pools, b.frame_instances(cam),
                              granularity="object")

    views_u = _camera_path("bistro", cam, frames)
    shadow_cfg = mcfg.shadow_cfg if feat.get("shadows") else None
    dviews = [DeviceView.from_uniform(u, shadow_cfg=shadow_cfg)
              for u in views_u]
    if feat.get("atmosphere") or feat.get("gi") or feat.get("shadows"):
        from chord_tpu.ops import atmosphere as atm
        from chord_tpu.ops import brdf_lut as brdf
        p_atm = atm.AtmosphereParams()
        t_lut = jax.jit(atm.build_transmittance_lut, static_argnums=1)(
            p_atm, 40)
        ms_lut = jax.jit(lambda tl: atm.build_multiscatter_lut(
            p_atm, tl, dir_samples=16, steps=12))(t_lut)
        lut = jax.jit(brdf.build_env_brdf_lut, static_argnums=0)(64)
        sun_d = np.asarray([0.3, 0.8, 0.5], np.float32)
        sun_d /= np.linalg.norm(sun_d)
        sky_lut = jax.jit(lambda tl, msl: atm.build_sky_view_lut(
            p_atm, tl, msl, jax.numpy.asarray(sun_d)))(t_lut, ms_lut)
        dviews = [v.replace(atmo_t_lut=t_lut, atmo_ms_lut=ms_lut,
                            atmo_sky_lut=sky_lut, brdf_lut=lut)
                  for v in dviews]
    views_stacked = jax.tree.map(lambda *xs: jax.numpy.stack(xs), *dviews)
    history = FrameHistory.empty(
        height, width,
        gi_cfg=gi_cfg if feat.get("gi") else None,
        shadow_cascades=(mcfg.shadow_cfg.cascade_count
                         if feat.get("shadows") else 0),
        shadow_res=(mcfg.shadow_cfg.resolution
                    if feat.get("shadows") else 1),
        shadow_div=mcfg.shadow_cfg.eval_res_div,
        shadow_phase=(mcfg.shadow_cfg.temporal_phase
                      if mcfg.shadow_cfg.temporal else 1),
        probe_tile=8 if feat.get("gi") else 0)
    inst = b.frame_instances(cam)

    from chord_tpu.renderer.meshlet_frame import (render_sequence_split,
                                                  shadow_pipelined)
    if feat.get("shadows") and shadow_pipelined(mcfg.shadow_cfg):
        # pipelined shadows: host loop of two dispatches/frame; warm pass
        # doubles as the compile (no AOT split available)
        compiled = functools.partial(render_sequence_split, config=config,
                                     mcfg=mcfg, bvh=bvh)
        t0 = time.time()
        images, _ = compiled(pools, inst, views_stacked, history)
        _ = jax.device_get(images[-1, :1, :1])
        compile_s = time.time() - t0
    else:
        fn = jax.jit(functools.partial(
            render_sequence_meshlet, config=config, mcfg=mcfg, bvh=bvh))
        # AOT split so a compile-phase INTERNAL error is distinguishable
        # from a runtime kernel fault in the logs
        t0 = time.time()
        compiled = fn.lower(pools, inst, views_stacked, history).compile()
        compile_s = time.time() - t0
    print(json.dumps({"config": name, "phase": "compiled",
                      "compile_s": round(compile_s, 1)}), flush=True)
    t0 = time.time()
    images, hist = compiled(pools, inst, views_stacked, history)
    _ = jax.device_get(images[-1, :1, :1])
    first_ms = (time.time() - t0) / frames * 1000.0
    print(json.dumps({"config": name, "phase": "ran",
                      "first_ms": round(first_ms, 2)}), flush=True)
    t0 = time.time()
    images, hist = compiled(pools, inst, views_stacked, history)
    _ = jax.device_get(images[-1, :1, :1])
    ms = (time.time() - t0) / frames * 1000.0
    print(json.dumps({"config": name, "ms": round(ms, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--detail", type=int, default=3)
    ap.add_argument("--target-tris", type=int, default=2_600_000)
    ap.add_argument("--configs", default="")
    ap.add_argument("--cvar", action="append", default=[],
                    help="name=value cvar overrides (e.g. r.raster.bricks=1)")
    args = ap.parse_args()

    from chord_tpu.utils.cvar import cvars
    for kv in args.cvar:
        name, _, val = kv.partition("=")
        cur = cvars.get(name)
        cvars.set(name, type(cur)(int(val) if isinstance(cur, (bool, int))
                                  else val))
        print(json.dumps({"cvar": name, "value": cvars.get(name)}),
              flush=True)

    from bench import _make_scene
    b, pools, n_src = _make_scene("bistro", args.detail, args.target_tris)
    print(json.dumps({"scene_src_tris": int(n_src)}), flush=True)

    all_cfgs = {
        "off": {},
        "textured": dict(textured=True, alpha_masked=True,
                         alpha_blend=True),
        "tex_only": dict(textured=True),
        "masked_only": dict(alpha_masked=True),
        "blend_only": dict(alpha_blend=True),
        "shadows": dict(shadows=True),
        "atmosphere": dict(atmosphere=True),
        "gi_probe": dict(gi=True, gi_mode="probe"),
        "gi_probe_rt": dict(gi=True, gi_mode="probe", gi_rt=True),
        "ssr": dict(ssr=True),
        "post": dict(post=True),
        "tex_tril": dict(textured=True, trilinear=True),
        "all": dict(textured=True, alpha_masked=True, alpha_blend=True,
                    shadows=True, atmosphere=True, gi=True,
                    gi_mode="probe", gi_rt=True, ssr=True, post=True),
        "all_tril": dict(textured=True, trilinear=True, alpha_masked=True,
                         alpha_blend=True, shadows=True, atmosphere=True,
                         gi=True, gi_mode="probe", gi_rt=True, ssr=True,
                         post=True),
        # crash-bisect half: everything except the material/texture paths
        "rest": dict(shadows=True, atmosphere=True, gi=True,
                     gi_mode="probe", gi_rt=True, ssr=True, post=True),
        # crash-bisect pair: alpha-tested masked shadow casters only
        # compile when BOTH shadows and alpha_masked are on
        "shadow_masked": dict(shadows=True, textured=True,
                              alpha_masked=True),
        # same combo with the masked-CASTER path disabled (opaque shadow
        # raster only): isolates the with-attrs shadow raster + alpha
        # sampling from the rest of the shadows+masked interaction
        "shadow_masked_off": dict(shadows=True, textured=True,
                                  alpha_masked=True, shadow_masked=False),
        # shadows + plain textures, NO masked path at all
        "shadow_tex": dict(shadows=True, textured=True),
        "gi_tex": dict(gi=True, gi_mode="probe", gi_rt=True,
                       textured=True, alpha_masked=True, post=True),
        # perf-campaign A/Bs on the full config (bench.py ladder "all"):
        "all_ao4": dict(textured=True, trilinear=True, alpha_masked=True,
                        alpha_blend=True, shadows=True, atmosphere=True,
                        gi=True, gi_mode="probe", gi_rt=True, ssr=True,
                        post=True, ao_div=4),
        "all_rt1": dict(textured=True, trilinear=True, alpha_masked=True,
                        alpha_blend=True, shadows=True, atmosphere=True,
                        gi=True, gi_mode="probe", gi_rt=True, ssr=True,
                        post=True, rt_rays=1),
        "all_lean": dict(textured=True, trilinear=True, alpha_masked=True,
                         alpha_blend=True, shadows=True, atmosphere=True,
                         gi=True, gi_mode="probe", gi_rt=True, ssr=True,
                         post=True, ao_div=4, rt_rays=1,
                         draw_capacity=4096),
    }
    names = args.configs.split(",") if args.configs else list(all_cfgs)
    for name in names:
        try:
            run_config(name, b, pools, n_src, args.width, args.height,
                       args.frames, **all_cfgs[name])
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"config": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
