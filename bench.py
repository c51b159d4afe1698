#!/usr/bin/env python
"""Benchmark harness: renders the BASELINE configs and prints ONE JSON line.

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric (BASELINE.md): FULL-pipeline ms/frame at 1080p — the
all-features frame (GPU-driven meshlet cull + Nanite LOD + two-phase HZB
occlusion + visbuffer raster + deferred PBR + cascaded shadows/PCSS +
atmosphere + screen-probe GI + SSAO + SSR + BVH ray fallback + bloom/TSR/
tonemap) on a >=2.5M source-triangle Bistro-scale procedural scene.
Measured as an N-frame camera fly-through in ONE dispatch (lax.scan) —
the honest device-throughput shape (the axon tunnel adds ~26ms per
dispatch that production serving would not pay). `vs_baseline` is against
the 16.6 ms/frame north star. The feature-off geometry-path number is
reported as a secondary line in `detail` when time permits.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

NORTH_STAR_MS = 16.6   # BASELINE.json

# Feature levels for the measurement ladder (see bench_frame). "pbr"
# turns on per-pixel normal-map + metallic-roughness-map sampling — the
# reference's lighting pass pays this for essentially every material
# (reference material.hlsli:93-117), so every textured rung does too
# (VERDICT r4 "make all mean all").
FEATURE_LEVELS = {
    "all": dict(shadows=True, atmosphere=True, gi=True, textured=True,
                shadow_masked=True, trilinear=True, pbr=True),
    "no_tril": dict(shadows=True, atmosphere=True, gi=True, textured=True,
                    shadow_masked=True, trilinear=False, pbr=True),
    "no_masked_shadow": dict(shadows=True, atmosphere=True, gi=True,
                             textured=True, shadow_masked=False,
                             trilinear=False, pbr=True),
    "geo_shadow_atmo": dict(shadows=True, atmosphere=True, gi=False,
                            textured=True, shadow_masked=True,
                            trilinear=False, pbr=True),
    "geo_tex": dict(shadows=False, atmosphere=False, gi=False,
                    textured=True, shadow_masked=False, trilinear=False,
                    pbr=True),
    "off": dict(shadows=False, atmosphere=False, gi=False, textured=False,
                shadow_masked=False, trilinear=False, pbr=False),
}
# Climb SAFEST FIRST (r3 postmortem: richest-first burned the whole driver
# window on crashing rungs and recorded nothing). A floor number lands
# within the first rung; every later success upgrades it.
CLIMB = ["off", "geo_tex", "geo_shadow_atmo", "all"]
# tried only if "all" fails — isolate which feature killed it
FALLBACKS = ["no_tril", "no_masked_shadow"]
LADDER = list(FEATURE_LEVELS)


_SCENE_CACHE_V = 3   # bump when builder/pool layout changes (v3: normal +
                     # metallic-roughness maps joined the bench pool)


def _make_scene(scene, detail, target_tris):
    import os
    import pickle

    import jax
    import jax.numpy as jnp

    cache = (f"/tmp/chord_scene_v{_SCENE_CACHE_V}_{scene}_{detail}_"
             f"{target_tris}.pkl")
    if os.path.exists(cache):
        try:
            with open(cache, "rb") as f:
                b, pools_np, n_src_tris = pickle.load(f)
            pools = jax.tree.map(jnp.asarray, pools_np)
            return b, pools, n_src_tris
        except Exception:   # noqa: BLE001 — stale cache: rebuild
            os.remove(cache)

    from chord_tpu.asset.procedural import (build_bistro_like,
                                            build_nanite_stress,
                                            build_sponza_like)
    from chord_tpu.native import available as native_available
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools

    if scene == "bistro":
        b = build_bistro_like(detail=detail, target_tris=target_tris,
                              textures=True)
    elif scene == "nanite":
        b = build_nanite_stress(rings=16 * detail)
    elif scene == "interior":   # BASELINE config #4: indoor diffuse GI
        from chord_tpu.asset.procedural import build_bistro_interior
        b = build_bistro_interior(detail=detail)
    else:
        b = build_sponza_like(detail=detail)
    pools = build_meshlet_pools(b, nanite=native_available(),
                                texture_pool=getattr(b, "texture_pool",
                                                     None))
    n_src_tris = sum(b.meshes[mi].num_triangles for mi, _, _ in b.instances)
    try:
        pools_np = jax.tree.map(np.asarray, pools)
        with open(cache + ".tmp", "wb") as f:
            pickle.dump((b, pools_np, n_src_tris), f)
        os.replace(cache + ".tmp", cache)
    except Exception:   # noqa: BLE001 — cache is best-effort
        pass
    return b, pools, n_src_tris


def _camera_path(scene, cam, frames):
    views = []
    for i in range(frames):
        t = i / max(frames - 1, 1)
        if scene == "bistro":
            cam.position = np.array([-45.0 + 70.0 * t, 5.0, 4.0])
            cam.look_at(np.array([55.0, 3.0, -4.0]))
        elif scene == "interior":
            cam.position = np.array([-6.0 + 3.0 * t, 2.2, 3.6 - 1.5 * t])
            cam.look_at(np.array([6.0, 1.2, -2.0]))
        elif scene == "nanite":
            ang = t * 1.5
            cam.position = np.array([50.0 * np.cos(ang), 9.0,
                                     50.0 * np.sin(ang)])
            cam.look_at(np.array([0.0, 2.0, 0.0]))
        else:
            cam.position = np.array([-16.0 + 6.0 * t, 4.5, 3.0])
            cam.look_at(np.array([12.0, 2.0, -2.0]))
        views.append(cam.view_uniform(i))
    return views


def _ssim_gray(a: np.ndarray, b: np.ndarray) -> float:
    """Global grayscale SSIM on display-scale [0,255] RGB frames (the
    bench-level quality gate; tests/test_golden.py has the windowed
    variant)."""
    ga = a.astype(np.float64).mean(-1) / 255.0
    gb = b.astype(np.float64).mean(-1) / 255.0
    mu_a, mu_b = ga.mean(), gb.mean()
    cov = ((ga - mu_a) * (gb - mu_b)).mean()
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    return float(((2 * mu_a * mu_b + c1) * (2 * cov + c2)) /
                 ((mu_a ** 2 + mu_b ** 2 + c1) *
                  (ga.var() + gb.var() + c2)))


def bench_frame(width=1920, height=1080, detail=3, frames=16, scene="bistro",
                render_scale=1.0, features="all",
                target_tris=2_600_000, draw_capacity=2048,
                quality=False, trace=False):
    # Capacities are right-sized to the measured fly-through maxima + ~2x
    # headroom (r5 device audit: draws_phase0 <= 1029, masked <= 53,
    # phase1 <= 36 across all 16 frames) — the mesh-shader setup, draw
    # expansion and bin scans are CAPACITY-proportional, so slack is pure
    # cost. Overflow stays a recorded hard failure (rung_log shows it).
    import functools

    import jax

    from chord_tpu.ops.screen_probe import ScreenProbeConfig
    from chord_tpu.renderer.deferred import DeviceView, RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  render_frame_meshlet,
                                                  render_sequence_meshlet)
    from chord_tpu.rhi.framebuffer import FrameHistory
    from chord_tpu.utils.camera import Camera

    b, pools, n_src_tris = _make_scene(scene, detail, target_tris)

    rw = int(width * render_scale) // 8 * 8
    rh = int(height * render_scale) // 8 * 8
    if rw > 1280:
        # 4K: the 1px-error Nanite cut draws ~2-4x the meshlets
        draw_capacity = max(draw_capacity, 4096)
    cam = Camera(width=rw, height=rh)
    config = RendererConfig(width=rw, height=rh,
                            post_width=width if render_scale != 1.0 else 0,
                            post_height=height if render_scale != 1.0 else 0,
                            pair_capacity=8192 if rw <= 1280 else 24576,
                            # 4K: window pixel footprints ~2x -> more
                            # tile-SPANNING windows; the r5 worst-frame
                            # audit caught 45 big-window pairs dropped at
                            # 64 that the single audit frame never saw
                            big_capacity=64 if rw <= 1280 else 128,
                            enable_bloom=True, enable_tsr=True,
                            # per-32x128-tile mean-motion reprojection
                            # (ops/tile_reproject.py): parallax-correct
                            # where r4's "global" mean shift was not, at
                            # +0.3 ms/frame (device-measured)
                            tsr_mode="tile")
    # Feature degradation ladder (richest first; the orchestrator walks
    # down on worker faults so ONE faulty feature can't erase the whole
    # record — VERDICT r2 item 3):
    #   all              everything incl. stochastic trilinear
    #   no_tril          everything minus trilinear
    #   no_masked_shadow everything minus the alpha-tested masked
    #                    shadow-caster path (shadows stay on)
    #   geo_shadow_atmo  geometry + textures + masked + shadows + atmo +
    #                    post (no GI/SSR/rt)
    #   geo_tex          geometry + textures + masked + post
    #   off              geometry + post only
    lvl = FEATURE_LEVELS[features]
    mcfg = MeshletFrameConfig(
        draw_capacity=draw_capacity, masked_draw_capacity=256,
        occlusion=True,
        shadows=lvl["shadows"], atmosphere=lvl["atmosphere"],
        gi=lvl["gi"], gi_mode="probe", gi_rt=lvl["gi"], rt_rays=2,
        ssr=lvl["gi"],
        textured=lvl["textured"], alpha_masked=lvl["textured"],
        alpha_blend=lvl["textured"],
        blend_textured=any(m.alpha_mode == "blend"
                           and m.base_color_texture >= 0
                           for m in b.materials),
        normal_mapped=lvl["pbr"], pbr_textures=lvl["pbr"],
        shadow_masked=lvl["shadow_masked"],
        trilinear=lvl["trilinear"],
        probe_cfg=ScreenProbeConfig(rays=16, steps=6,
                                    history_mode="tile"))

    bvh = None
    if lvl["gi"]:
        from chord_tpu.ops.rt import build_scene_bvh
        # GI ray fidelity, measured on device (r5, 16-frame scan, full
        # features): triangle-exact probe rays cost 3625 ms/frame (59x
        # the whole frame — software BVH traversal over 2.6M tris has no
        # RT cores to lean on) for an SSIM delta of 0.988 vs the object
        # proxies; rays=32/rt=4 costs +2.5 ms for SSIM 0.9993 vs 16/2.
        # The proxy + 16-ray default is the measured sweet spot
        # (reference traces a hardware TLAS, gi_raytracing.hlsli:41-45 —
        # that option does not exist here).
        bvh = build_scene_bvh(pools, b.frame_instances(cam),
                              granularity="object")

    views_u = _camera_path(scene, cam, frames)
    shadow_cfg = mcfg.shadow_cfg if lvl["shadows"] else None
    dviews = [DeviceView.from_uniform(u, shadow_cfg=shadow_cfg)
              for u in views_u]
    if lvl["atmosphere"] or lvl["gi"] or lvl["shadows"]:
        # sun-independent LUTs built once on the host driver
        from chord_tpu.ops import atmosphere as atm
        from chord_tpu.ops import brdf_lut as brdf
        p_atm = atm.AtmosphereParams()
        t_lut = jax.jit(atm.build_transmittance_lut,
                        static_argnums=1)(p_atm, 40)
        ms_lut = jax.jit(lambda tl: atm.build_multiscatter_lut(
            p_atm, tl, dir_samples=16, steps=12))(t_lut)
        lut = jax.jit(brdf.build_env_brdf_lut, static_argnums=0)(64)
        # static sun over the fly-through: the sky-view LUT caches too
        sun_d = np.asarray([0.3, 0.8, 0.5], np.float32)
        sun_d /= np.linalg.norm(sun_d)
        sky_lut = jax.jit(lambda tl, msl: atm.build_sky_view_lut(
            p_atm, tl, msl, jax.numpy.asarray(sun_d)))(t_lut, ms_lut)
        dviews = [v.replace(atmo_t_lut=t_lut, atmo_ms_lut=ms_lut,
                            atmo_sky_lut=sky_lut, brdf_lut=lut)
                  for v in dviews]
    views_stacked = jax.tree.map(lambda *xs: jax.numpy.stack(xs), *dviews)
    from chord_tpu.ops.gi import GIConfig
    history = FrameHistory.empty(
        rh, rw, post_h=height if render_scale != 1.0 else None,
        post_w=width if render_scale != 1.0 else None,
        gi_cfg=GIConfig() if lvl["gi"] else None,
        shadow_cascades=(mcfg.shadow_cfg.cascade_count
                         if lvl["shadows"] else 0),
        shadow_res=(mcfg.shadow_cfg.resolution if lvl["shadows"] else 1),
        shadow_div=mcfg.shadow_cfg.eval_res_div,
        shadow_phase=(mcfg.shadow_cfg.temporal_phase
                      if mcfg.shadow_cfg.temporal else 1),
        probe_tile=8 if lvl["gi"] else 0)
    inst = b.frame_instances(cam)

    # pipelined-shadow configs (the axon worker-fault workaround) run the
    # PCSS eval as its own dispatch per frame — a host loop of async
    # dispatches instead of one scanned program
    from chord_tpu.renderer.meshlet_frame import (render_sequence_split,
                                                  shadow_pipelined)
    pipelined = lvl["shadows"] and shadow_pipelined(mcfg.shadow_cfg)
    if pipelined:
        fn = functools.partial(render_sequence_split, config=config,
                               mcfg=mcfg, bvh=bvh)
    else:
        # with_stats: per-frame draw/overflow scalars ride the scan —
        # IN-SEQUENCE overflow (a mid-path HZB/history state pushing a
        # phase past capacity) is invisible to a fresh-history audit
        # frame (r5: the active-table overflow that erased the road
        # recorded 0 on the single audit frame)
        fn = jax.jit(functools.partial(
            render_sequence_meshlet, config=config, mcfg=mcfg, bvh=bvh,
            with_stats=True))

    # sync on a 1-pixel fetch: the scan output depends on every frame, so
    # this forces full completion without paying the axon tunnel's ~160 ms
    # full-frame readback inside the timed region
    def run(h0):
        out = fn(pools, inst, views_stacked, h0)
        return out if len(out) == 3 else (*out, None)

    t0 = time.time()
    images, hist, seq_stats = run(history)
    _ = jax.device_get(images[-1, :1, :1])
    compile_s = time.time() - t0

    t0 = time.time()
    images, hist, seq_stats = run(history)
    _ = jax.device_get(images[-1, :1, :1])
    dt = time.time() - t0
    ms = dt / frames * 1000.0

    # drawn tris + overflow audit: WORST frame across the whole timed
    # sequence (a fresh-history single frame hides in-sequence overflow)
    if seq_stats is not None:
        drawn = int(np.asarray(seq_stats["drawn_tris"]).max())
        overflow = {k: int(np.asarray(v).max())
                    for k, v in seq_stats.items() if "overflow" in k}
        overflow["max_draws_phase0"] = int(
            np.asarray(seq_stats["draws_phase0"]).max())
    else:   # pipelined path: single-frame audit fallback
        one = jax.jit(functools.partial(render_frame_meshlet,
                                        config=config, mcfg=mcfg, bvh=bvh))
        _img, _h, stats = one(pools, inst, dviews[frames // 2], history)
        drawn = int(np.asarray(stats["drawn_tris"]))
        overflow = {k: int(np.asarray(v)) for k, v in stats.items()
                    if "overflow" in k}

    extra = {}
    if quality:
        # Quality gate (VERDICT r4 next #3): re-render the SAME sequence
        # with every mid-path approximation off — per-pixel (gather) TSR
        # + GI-history reprojection, no scrolled cascades — and record
        # SSIM of the final frames + both mean luminances. A black,
        # ghosted or smeared frame can no longer record a great number
        # silently.
        config_x = config._replace(tsr_mode="gather")
        mcfg_x = mcfg._replace(
            shadow_cfg=mcfg.shadow_cfg._replace(scroll=False))
        if mcfg.probe_cfg is not None and lvl["gi"]:
            mcfg_x = mcfg_x._replace(
                probe_cfg=mcfg.probe_cfg._replace(history_mode="gather"))
        fn_x = jax.jit(functools.partial(
            render_sequence_meshlet, config=config_x, mcfg=mcfg_x,
            bvh=bvh))
        imgs_x, _ = fn_x(pools, inst, views_stacked, history)
        a = np.asarray(images[-1])
        bx = np.asarray(imgs_x[-1])
        extra["quality"] = {
            "ssim_vs_exact": round(_ssim_gray(a, bx), 4),
            "mean_luma": round(float(a.mean()), 4),
            "mean_luma_exact": round(float(bx.mean()), 4),
        }
    if trace:
        # per-pass device-time table (VERDICT r4 missing #1 / next #5):
        # the reference surfaces labeled per-pass GPU ms every frame
        # (graphics/query.cpp:5-124); here a jax.profiler trace of the
        # timed sequence aggregated by named_scope label lands in the
        # artifact so a pass-level regression is localizable from
        # BENCH_r*.json alone.
        import os
        import tempfile
        td = tempfile.mkdtemp(prefix="chord_trace_")
        try:
            with jax.profiler.trace(td):
                imgs_t = fn(pools, inst, views_stacked, history)[0]
                _ = jax.device_get(imgs_t[-1, :1, :1])
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "tools"))
            from profile_trace import aggregate
            by_scope, _bl, _c, _tot = aggregate(td)
            pass_ms = {k: round(v / frames / 1000.0, 3)
                       for k, v in by_scope.most_common(30)
                       if k not in ("?", "")}
            extra["pass_ms"] = pass_ms
            # coarse roofline: bytes-touched estimates for the screen-
            # space passes (planes x H x W x 4B at the res they run at),
            # achieved GB/s vs the chip's ~819 GB/s HBM peak -> is the
            # pass bandwidth-bound or leaving the memory system idle
            pw = width if render_scale != 1.0 else rw
            ph = height if render_scale != 1.0 else rh
            est_bytes = {
                # 7 raster RT planes read + written + pair DMA
                "raster.phase0": 14 * rw * rh * 4,
                "gbuffer_resolve": 17 * rw * rh * 4,
                "tsr": 10 * pw * ph * 4,
                "shadow.evaluate": 3 * rw * rh * 4,
                "hzb.final": 3 * rw * rh * 4,
            }
            roof = {}
            for k, nbytes in est_bytes.items():
                if k in pass_ms and pass_ms[k] > 0:
                    gbs = nbytes / (pass_ms[k] / 1e3) / 1e9
                    roof[k] = {"est_gb_per_s": round(gbs, 1),
                               "pct_hbm_peak": round(gbs / 819 * 100, 1)}
            extra["pass_roofline"] = roof
        except Exception as e:  # noqa: BLE001 — trace is best-effort
            extra["pass_ms_error"] = str(e)[:200]

    return {
        **extra,
        "ms_per_frame": ms,
        # drawn-tri rate through the raster (post-LOD: what the kernel
        # actually shaded) AND the source-geometry rate (what a fixed-
        # function pipeline would have had to process for this scene) —
        # one number alone is uninterpretable for a cluster-LOD engine
        # (VERDICT r2 weak #2): the LOD cut is the PRODUCT, not overhead
        "mtris_per_s": drawn / (ms / 1000.0) / 1e6,
        "src_mtris_per_s": float(n_src_tris) / (ms / 1000.0) / 1e6,
        "scene_src_tris": int(n_src_tris),
        "drawn_tris": drawn,
        "compile_s": compile_s,
        "frames": frames,
        "width": width, "height": height,
        "render_scale": render_scale,
        "features": features,
        "overflow": overflow,
    }


def _run_rung(args, feat, timeout_s, extra_flags=()):
    """Run one ladder rung in a fresh child process (a worker fault
    poisons the in-process jax client). -> (record dict or None, note)."""
    import subprocess

    cmd = [sys.executable, __file__, "--child",
           "--width", str(args.width), "--height", str(args.height),
           "--detail", str(args.detail), "--frames", str(args.frames),
           "--scene", args.scene, "--target-tris", str(args.target_tris),
           "--render-scale", str(args.render_scale),
           "--features", feat, "--skip-secondary", *extra_flags]
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None, "timeout"
    line = next((ln for ln in p.stdout.splitlines()
                 if ln.startswith('{"metric"')), None)
    if line is None:
        err_tail = (p.stderr.strip().splitlines()[-1][:200]
                    if p.stderr.strip() else "")
        return None, f"no JSON rc={p.returncode} {err_tail[:160]}"
    rec = json.loads(line)
    if rec.get("value", -1) <= 0:
        return None, str(rec.get("error", "value<=0"))[:200]
    return rec, "ok"


def _orchestrate(args) -> int:
    """Climb the feature ladder SAFEST FIRST, each rung a fresh child
    process, and print the best-so-far JSON line after EVERY successful
    rung (flushed) — if the driver kills us mid-climb, the floor number
    is already on stdout (r3 recorded nothing; never again). The final
    printed line is the richest rung that succeeded."""
    ladder = CLIMB if args.features == "all" else [args.features]
    rung_log = {}     # feature level -> "ok NN.Nms" | error note
    best = None       # record of the RICHEST successful rung
    t_start = time.time()

    def emit(rec):
        rec.setdefault("detail", {})["rung_log"] = dict(rung_log)
        print(json.dumps(rec), flush=True)

    def climb(feats):
        nonlocal best
        for feat in feats:
            left = args.budget_s - (time.time() - t_start)
            if best is not None and left < 120:
                rung_log[feat] = "skipped: budget"
                continue
            # quality gate on the floor + headline rungs; per-pass trace
            # on the headline (both budget-gated: they add a compile +
            # run each)
            flags = []
            if feat in ("off", "all") and left > 600:
                flags.append("--quality")
            if feat == "all" and left > 600:
                flags.append("--trace")
            rec, note = _run_rung(args, feat,
                                  min(args.child_timeout, max(left, 180)),
                                  extra_flags=flags)
            if rec is None and flags:
                # never lose a rung to the instrumentation: one retry bare
                rec, note = _run_rung(
                    args, feat,
                    min(args.child_timeout,
                        max(args.budget_s - (time.time() - t_start), 180)))
            if rec is None:
                rung_log[feat] = note
                print(f"[ladder] {feat}: {note}", file=sys.stderr)
                return False
            ms = rec.get("value")
            rung_log[feat] = (f"ok {ms}ms compile_s="
                              f"{rec.get('detail', {}).get('compile_s')}")
            print(f"[ladder] {feat}: {ms} ms", file=sys.stderr)
            best = rec   # later rungs are strictly richer
            emit(rec)
        return True

    complete = climb(ladder)
    if not complete and ladder == CLIMB and best is not None:
        # "all" (or a floor rung) failed: isolate which feature killed it
        climb([f for f in FALLBACKS if f not in rung_log])
    if best is not None:
        if best["detail"].get("features") != "all":
            best["detail"]["degraded_from"] = "all"
        # per-feature cost table from the ladder deltas (the bench-level
        # analog of the reference's per-pass GPU timer table,
        # renderer.cpp:277-280 — localizes a regression to a feature
        # group straight from the artifact)
        ms_of = {}
        for k, v in rung_log.items():
            if v.startswith("ok "):
                ms_of[k] = float(v.split("ms")[0][3:])
        cost = {}
        for hi, lo, label in (("geo_tex", "off", "textures_masked_blend"),
                              ("geo_shadow_atmo", "geo_tex",
                               "shadows_atmosphere"),
                              ("all", "geo_shadow_atmo",
                               "gi_ssr_rt_trilinear")):
            if hi in ms_of and lo in ms_of:
                cost[label] = round(ms_of[hi] - ms_of[lo], 3)
        if "off" in ms_of:
            cost["geometry_post_floor"] = round(ms_of["off"], 3)
        if cost:
            best["detail"]["feature_cost_ms"] = cost
        # 4K capture (BASELINE config #5 is "1080p AND 4K"): one extra
        # all-features rung at 2160p output if the budget allows
        left = args.budget_s - (time.time() - t_start)
        if (complete and args.features == "all"
                and best["detail"].get("features") == "all"
                and left > 300 and args.width == 1920):
            import copy
            a4 = copy.copy(args)
            a4.width, a4.height = 3840, 2160
            rec4, note4 = _run_rung(a4, "all",
                                    min(args.child_timeout, left - 60))
            rung_log["all_4k"] = (f"ok {rec4['value']}ms" if rec4
                                  else note4)
            if rec4:
                best["detail"]["ms_4k"] = rec4["value"]
                best["detail"]["mtris_per_s_4k"] = \
                    rec4["detail"].get("mtris_per_s")
        # raster CAPABILITY record (BASELINE asks for "Mtris/s through
        # visbuffer raster"; the frame's drawn rate is a workload
        # statement — this is the saturation number, VERDICT r4 next #7)
        left = args.budget_s - (time.time() - t_start)
        if left > 240:
            import os
            import subprocess
            try:
                p = subprocess.run(
                    [sys.executable,
                     os.path.join(os.path.dirname(os.path.abspath(
                         __file__)), "tools", "bench_raster_peak.py"),
                     "--width", "1280", "--height", "720"],
                    capture_output=True, text=True,
                    timeout=min(left - 60, 600),
                    cwd=os.path.dirname(os.path.abspath(__file__)))
                lines = [ln for ln in p.stdout.splitlines()
                         if ln.startswith('{"raster_peak"')]
                if lines:
                    best["detail"]["raster_peak"] = \
                        json.loads(lines[-1])["raster_peak"]
                else:
                    rung_log["raster_peak"] = "no output"
            except Exception as e:   # noqa: BLE001 — capability record
                rung_log["raster_peak"] = str(e)[:120]
        emit(best)
        return 0
    print(json.dumps({
        "metric": "full_pipeline_1080p_ms_per_frame",
        "value": -1, "unit": "ms", "vs_baseline": 0,
        "error": "; ".join(f"{k}: {v}" for k, v in rung_log.items())}),
        flush=True)
    return 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--detail", type=int, default=3)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--scene", default="bistro")
    ap.add_argument("--target-tris", type=int, default=2_600_000)
    ap.add_argument("--features", default="all", choices=LADDER)
    ap.add_argument("--child", action="store_true",
                    help="run one measurement in-process (no degradation "
                         "ladder); used by the orchestrator")
    ap.add_argument("--render-scale", type=float, default=0.6667,
                    help="TSR upscale: render at scale*res, temporal-"
                         "upscale to full res (the reference's render-dim"
                         " -> post-dim DimensionConfig chain, "
                         "renderer/renderer.h:55-89; the reference "
                         "headline runs upscaled too). 1.0 = native.")
    ap.add_argument("--skip-secondary", action="store_true",
                    help="skip the feature-off secondary measurement")
    ap.add_argument("--quality", action="store_true",
                    help="record SSIM vs the exact-path render (gather "
                         "TSR/GI reprojection, no scrolled cascades)")
    ap.add_argument("--trace", action="store_true",
                    help="record a per-pass device-time table via "
                         "jax.profiler (the reference's GPU timestamp "
                         "table, graphics/query.cpp)")
    ap.add_argument("--child-timeout", type=int, default=1000,
                    help="per-rung child process timeout (s)")
    ap.add_argument("--budget-s", type=int, default=3300,
                    help="total orchestrator budget: once a number is "
                         "recorded, no new rung starts with <120s left")
    args = ap.parse_args()

    if not args.child:
        sys.exit(_orchestrate(args))

    start = time.time()
    try:
        r = bench_frame(args.width, args.height, args.detail, args.frames,
                        scene=args.scene, render_scale=args.render_scale,
                        features=args.features,
                        target_tris=args.target_tris,
                        quality=args.quality, trace=args.trace)
        detail = {k: (round(v, 3) if isinstance(v, float) else v)
                  for k, v in r.items()}
        # secondary: feature-off geometry-path number (skipped if the
        # headline already consumed the time budget)
        if (args.features == "all" and not args.skip_secondary
                and time.time() - start < 1500):
            try:
                r_off = bench_frame(args.width, args.height, args.detail,
                                    args.frames, scene=args.scene,
                                    render_scale=args.render_scale,
                                    features="off",
                                    target_tris=args.target_tris)
                detail["feature_off_ms"] = round(r_off["ms_per_frame"], 3)
                detail["feature_off_mtris_per_s"] = round(
                    r_off["mtris_per_s"], 3)
            except Exception as e:  # noqa: BLE001
                detail["feature_off_error"] = str(e)
        ms = r["ms_per_frame"]
        print(json.dumps({
            "metric": "full_pipeline_1080p_ms_per_frame",
            "value": round(ms, 3),
            "unit": "ms",
            "vs_baseline": round(NORTH_STAR_MS / ms, 3),
            "detail": detail,
        }))
    except Exception as e:  # noqa: BLE001 — bench must always emit a line
        print(json.dumps({
            "metric": "full_pipeline_1080p_ms_per_frame",
            "value": -1, "unit": "ms", "vs_baseline": 0,
            "error": f"{type(e).__name__}: {e}"}))
        sys.exit(1)


if __name__ == "__main__":
    main()
