#!/usr/bin/env python
"""Per-stage device-synced timings on the real bench scene.

Reconstructs the frame stage-by-stage (same call pattern as
renderer/meshlet_frame.py), jits each stage separately on real
intermediate values, and prints one JSON line per stage. This is the
targeting tool for the perf campaign — the full-frame bench is the
truth, this tells you WHERE.

Usage: python tools/bench_stages.py [--stages cull,raster,gi,...]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timed(name, fn, *args, n=4, sync=None, **kw):
    import jax

    f = jax.jit(fn, **kw)
    t0 = time.time()
    r = f(*args)
    leaf = jax.tree.leaves(r)[0]
    jax.device_get(leaf.ravel()[:1])
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    jax.device_get(jax.tree.leaves(r)[0].ravel()[:1])
    ms = (time.time() - t0) / n * 1000
    print(json.dumps({"stage": name, "ms": round(ms, 2),
                      "compile_s": round(comp, 1)}), flush=True)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-idx", type=int, default=4)
    ap.add_argument("--stages", default="")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()
    want = set(args.stages.split(",")) if args.stages else None

    def on(s):
        return want is None or s in want

    import jax
    import jax.numpy as jnp

    from bench import _camera_path, _make_scene
    from chord_tpu.ops.screen_probe import ScreenProbeConfig
    from chord_tpu.renderer.deferred import DeviceView, RendererConfig
    from chord_tpu.renderer.meshlet_frame import MeshletFrameConfig
    from chord_tpu.renderer import meshlet_frame as mf
    from chord_tpu.rhi.framebuffer import FrameHistory
    from chord_tpu.utils.camera import Camera
    from chord_tpu.ops import gi as gi_ops, post, shading
    from chord_tpu.ops import screen_probe as sp
    from chord_tpu.ops.gi import GIConfig

    w, h = args.width, args.height
    b, pools, n_src = _make_scene("bistro", 3, 2_600_000)
    print(json.dumps({"scene_src_tris": int(n_src)}), flush=True)

    cam = Camera(width=w, height=h)
    views = _camera_path("bistro", cam, 8)
    u = views[args.frames_idx]
    mcfg = MeshletFrameConfig(draw_capacity=6144, occlusion=True)
    view = DeviceView.from_uniform(u, shadow_cfg=mcfg.shadow_cfg)
    config = RendererConfig(width=w, height=h, pair_capacity=16384,
                            big_capacity=64)
    rc = config.raster_config()
    rc_a = rc._replace(with_attrs=True)
    cap = min(mcfg.draw_capacity, -(-pools.num_pairs // 128) * 128)
    cap1 = max(256, -(-cap // 4 // 128) * 128)
    proj_scale = 0.5 * h * np.asarray(view.tw_to_clip_nj)[1, 1]
    inst = b.frame_instances(cam)
    gcfg = GIConfig()
    history = FrameHistory.empty(
        h, w, gi_cfg=gcfg, shadow_cascades=mcfg.shadow_cfg.cascade_count,
        shadow_res=mcfg.shadow_cfg.resolution,
        shadow_div=mcfg.shadow_cfg.eval_res_div,
        shadow_phase=(mcfg.shadow_cfg.temporal_phase
                      if mcfg.shadow_cfg.temporal else 1),
        probe_tile=8)

    ws, hs, offs = mf.hzb_layout(w, h)

    def make_hzb(flat):
        return mf.HZBPyramid(flat=flat, widths=ws, heights=hs,
                             offsets=offs, mip0_w=w, mip0_h=h)

    # ---- object precull + opaque phase 0 (no prev HZB history) ----
    acap = min(pools.num_pairs, max(4096, 4 * cap))
    active = timed("cull.object_precull",
                   lambda: mf.build_active_pairs(
                       pools, inst, view.frustum_planes, acap))
    prev_hzb = make_hzb(history.hzb_flat)
    res0 = timed("cull.phase0", lambda: mf.cull_pairs(
        pools, inst, view.frustum_planes, proj_scale, cap,
        hzb=prev_hzb, hzb_tw_to_clip=view.prev_tw_to_clip_nj,
        lod_threshold=mcfg.lod_threshold_px, masked=False, active=active))
    setup0 = timed("mesh_shader_setup", lambda: mf.mesh_shader_setup(
        res0.draws, pools, inst, view.tw_to_clip, cap, w, h))
    queue0 = timed("bin_windows", lambda: mf.bin_windows(setup0, rc_a))
    rt0 = timed("raster_queue", lambda: list(
        mf.raster_queue(queue0, setup0, rc_a)))
    depth0 = rt0[0]
    hzb_now = timed("hzb.build", lambda: mf.build_hzb(depth0))

    # phase 1
    res1 = timed("cull.phase1", lambda: mf.cull_pairs(
        pools, inst, view.frustum_planes, proj_scale, cap1,
        hzb=hzb_now, hzb_tw_to_clip=view.tw_to_clip_nj,
        lod_threshold=mcfg.lod_threshold_px,
        extra_mask=res0.occluded_mask, masked=False, active=active))
    setup1 = timed("p1.mesh_shader_setup", lambda: mf.mesh_shader_setup(
        res1.draws, pools, inst, view.tw_to_clip, cap1, w, h,
        payload_base=cap))
    queue1 = timed("p1.bin_windows", lambda: mf.bin_windows(setup1, rc_a))
    rt = timed("p1.raster_queue", lambda: list(
        mf.raster_queue(queue1, setup1, rc_a, seeds=tuple(rt0))))
    depth, vis = rt[0], rt[1]
    draw_object = jnp.concatenate([res0.draws.object_id,
                                   res1.draws.object_id])
    hzb_final = make_hzb(mf.build_hzb(depth0).flat)

    # ---- masked bucket ----
    if on("masked"):
        cap_m = min(mcfg.masked_draw_capacity,
                    -(-pools.num_pairs // 128) * 128)
        base_m = cap + cap1
        res_m = timed("masked.cull", lambda: mf.cull_pairs(
            pools, inst, view.frustum_planes, proj_scale, cap_m,
            hzb=hzb_final, hzb_tw_to_clip=view.tw_to_clip_nj,
            lod_threshold=mcfg.lod_threshold_px, masked=True,
            active=active))
        setup_m = timed("masked.setup", lambda: mf.mesh_shader_setup(
            res_m.draws, pools, inst, view.tw_to_clip, cap_m, w, h,
            payload_base=base_m))
        q_m = timed("masked.bin", lambda: mf.bin_windows(setup_m, rc_a))
        rt_m = timed("masked.raster", lambda: list(
            mf.raster_queue(q_m, setup_m, rc_a)))
        accept = timed("masked.accept", lambda: shading.alpha_mask_accept(
            rt_m[1], rt_m[0], depth, rt_m[5], rt_m[6],
            res_m.draws.object_id, base_m, pools, inst))
        print(json.dumps(
            {"masked_draws": int(np.asarray(res_m.draws.count))}),
            flush=True)

    # ---- gbuffer + lighting ----
    gbuf = timed("gbuffer_resolve_textured",
                 lambda: shading.resolve_gbuffer_raster_rt(
                     vis, depth, rt[2], rt[3], rt[4], rt[5], rt[6],
                     draw_object, pools, inst, view.clip_to_tw,
                     view.tw_to_clip_nj, view.prev_tw_to_clip_nj,
                     textured=True, normal_mapped=True, pbr_textures=True))
    motion_dilated = timed("tsr.prepare",
                           lambda: post.tsr_prepare(gbuf.motion, depth))
    disocc = jnp.zeros((h, w))

    # ---- blend bucket ----
    if on("blend"):
        cap_b = min(mcfg.blend_draw_capacity,
                    -(-pools.num_pairs // 128) * 128)
        res_b = timed("blend.cull", lambda: mf.cull_pairs(
            pools, inst, view.frustum_planes, proj_scale, cap_b,
            hzb=hzb_final, hzb_tw_to_clip=view.tw_to_clip_nj,
            lod_threshold=mcfg.lod_threshold_px, masked="blend",
            active=active))
        setup_b = timed("blend.setup", lambda: mf.mesh_shader_setup(
            res_b.draws, pools, inst, view.tw_to_clip, cap_b, w, h))
        q_b = timed("blend.bin", lambda: mf.bin_windows(setup_b, rc_a))
        rt_b = timed("blend.raster", lambda: list(
            mf.raster_queue(q_b, setup_b, rc_a)))
        sun_b = shading.SunLight(direction=view.sun_direction,
                                 radiance=view.sun_radiance,
                                 sky_ambient=view.sky_ambient)
        timed("blend.shade", lambda: shading.shade_blend_layer(
            rt_b[1], rt_b[0], depth, rt_b[2], rt_b[3], rt_b[4],
            rt_b[5], rt_b[6], res_b.draws.object_id, pools, inst,
            sun_b, sun_shadow=None, ambient=None))
        print(json.dumps(
            {"blend_draws": int(np.asarray(res_b.draws.count))}),
            flush=True)

    # ---- GI stages ----
    if on("gi"):
        spcfg = ScreenProbeConfig(rays=16, steps=6)
        ao_h = timed("gi.ssao", lambda: gi_ops.ssao(
            depth[::2, ::2], gbuf.position_tw[::2, ::2],
            gbuf.normal[::2, ::2], gcfg))
        timed("gi.ssao.upsample",
              lambda: post.upsample_nearest(ao_h, 2, h, w))
        probes = timed("gi.probe.spawn", lambda: sp.spawn_probes(
            gbuf, depth, history.frame_count, spcfg))
        sh_hist, n_hist = timed("gi.probe.sh_reproject",
                                lambda: sp.reproject_probe_sh(
                                    probes, history.probe_sh,
                                    history.probe_depth,
                                    view.prev_tw_to_clip_nj,
                                    history.valid, spcfg))
        ph_n, pw_n = probes.depth.shape
        tc = history.tsr_color
        sy = max(tc.shape[0] // ph_n, 1)
        sx = max(tc.shape[1] // pw_n, 1)
        scene_rad = tc[::sy, ::sx][:ph_n, :pw_n]
        rad, ray_dirs, sample_w = timed(
            "gi.probe.taps", lambda: sp.gather_probe_taps(
                probes, scene_rad, view.sky_ambient, spcfg))
        new_probe_sh = timed("gi.probe.project_sh",
                             lambda: sp.project_and_merge(
                                 rad, ray_dirs, probes, sh_hist, n_hist,
                                 spcfg, weights=sample_w))
        timed("gi.probe.world_inject", lambda: sp.inject_world_cache(
            history.gi_cache, new_probe_sh, probes, gcfg,
            frame_count=history.frame_count))
        depth_half = depth[::2, ::2]
        normal_half = gbuf.normal[::2, ::2]
        diff_half = timed("gi.probe.interpolate",
                          lambda: sp.interpolate_half(
                              new_probe_sh, probes, normal_half,
                              gbuf.valid[::2, ::2], spcfg))
        diff_half = timed("gi.probe.history_reproject",
                          lambda: sp.history_reproject_half(
                              diff_half, motion_dilated[::2, ::2],
                              history.gi_diffuse, history.valid, spcfg,
                              disocclusion=disocc[::2, ::2]))
        diff_half = timed("gi.probe.spatial_filter",
                          lambda: sp.spatial_filter_half(
                              diff_half, depth_half, normal_half, spcfg))
        timed("gi.probe.upsample", lambda: sp.bilateral_upsample(
            diff_half, depth_half, normal_half, depth, gbuf.normal))

        # specular chain
        def spec():
            from chord_tpu.ops import brdf_lut as brdf
            from chord_tpu.ops import ssr as ssr_ops
            k = gcfg.sample_res_div
            pos_q = gbuf.position_tw[::k, ::k]
            nrm_q = gbuf.normal[::k, ::k]
            v_q = -pos_q / jnp.maximum(
                jnp.linalg.norm(pos_q, axis=-1, keepdims=True), 1e-6)
            refl_q = 2.0 * jnp.sum(v_q * nrm_q, -1, keepdims=True) * \
                nrm_q - v_q
            spec_rad_q, spec_conf_q = gi_ops.sample_radiance(
                history.gi_cache, pos_q, refl_q, jnp.zeros(3), gcfg)
            ssr_col, ssr_conf = ssr_ops.trace(
                depth[::k, ::k], history.tsr_color, pos_q, nrm_q,
                view.tw_to_clip_nj, ssr_ops.SSRConfig(res_div=k))
            return spec_rad_q * (1 - ssr_conf[..., None]) + \
                ssr_col * ssr_conf[..., None]
        timed("gi.specular+ssr", spec)

    # ---- post ----
    if on("post"):
        timed("auto_exposure", lambda: post.luminance_histogram(
            gbuf.base_color, post.ExposureConfig()))


if __name__ == "__main__":
    main()
