#!/usr/bin/env python
"""A/B full-frame timings: single-frame jit of render_frame_meshlet with
feature/cvar variations, device-synced. Isolates interaction costs the
per-stage tool can't see (fusion, memory pressure inside the big jit)."""

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
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--cases", default="off,bricks,masked,blend")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _camera_path, _make_scene
    from chord_tpu.renderer.deferred import DeviceView, RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  render_frame_meshlet)
    from chord_tpu.rhi.framebuffer import FrameHistory
    from chord_tpu.utils.camera import Camera
    from chord_tpu.utils.cvar import cvars

    w, h = args.width, args.height
    b, pools, n_src = _make_scene("bistro", 3, 2_600_000)
    cam = Camera(width=w, height=h)
    views = _camera_path("bistro", cam, 8)
    view = DeviceView.from_uniform(views[4])
    inst = b.frame_instances(cam)
    config = RendererConfig(width=w, height=h, pair_capacity=16384,
                            big_capacity=64)
    history = FrameHistory.empty(h, w)

    base = MeshletFrameConfig(draw_capacity=6144, occlusion=True)
    cases = {
        "off": (base, {}),
        "off_s8": (base, {"r.raster.subS": 8}),
        # subS=16 / bricks need tileH % (4*subS) == 0 — pin compatible
        # tile heights rather than inheriting the 216 default
        "off_s16": (base, {"r.raster.subS": 16, "r.raster.tileH": 192}),
        # dynamic-fori subwindow loop (r.raster.subLoop): the compile
        # workaround for subS=16 (unrolled Mosaic program crashes the
        # remote compile helper) — A/B loop overhead at s8 too
        "off_s8_loop": (base, {"r.raster.subLoop": True}),
        "off_s16_loop": (base, {"r.raster.subS": 16,
                                "r.raster.tileH": 192,
                                "r.raster.subLoop": True}),
        # shape variants hunting for one the remote compile helper
        # survives (s16 at tileH=192 ICEs it, loop or unrolled)
        "off_s16_t128": (base, {"r.raster.subS": 16,
                                "r.raster.tileH": 128,
                                "r.raster.subLoop": True}),
        "off_s16_t160": (base, {"r.raster.subS": 16,
                                "r.raster.tileH": 160,
                                "r.raster.subLoop": True}),
        "off_s16_t96": (base, {"r.raster.subS": 16,
                               "r.raster.tileH": 96,
                               "r.raster.subLoop": True}),
        # rp decoupled from subS: s16 bounds with the s8-surviving
        # (64,TW) pack shapes (kernel RP override)
        "off_s16_rp8": (base, {"r.raster.subS": 16,
                               "r.raster.tileH": 192,
                               "r.raster.rp": 8}),
        "off_s16_rp8_loop": (base, {"r.raster.subS": 16,
                                    "r.raster.tileH": 192,
                                    "r.raster.rp": 8,
                                    "r.raster.subLoop": True}),
        "off_s32_rp8_loop": (base, {"r.raster.subS": 32,
                                    "r.raster.tileH": 256,
                                    "r.raster.rp": 8,
                                    "r.raster.subLoop": True}),
        "off_s32_loop": (base, {"r.raster.subS": 32,
                                "r.raster.tileH": 256,
                                "r.raster.subLoop": True}),
        # 720p-compatible tile heights (the bench renders at 0.667 scale
        # = 1280x720; tile_h must divide the height and be a multiple of
        # sub_s): 144/240 for s16, 120/240 for s8
        "off_s16_t144_loop": (base, {"r.raster.subS": 16,
                                     "r.raster.tileH": 144,
                                     "r.raster.subLoop": True}),
        "off_s16_t240_loop": (base, {"r.raster.subS": 16,
                                     "r.raster.tileH": 240,
                                     "r.raster.subLoop": True}),
        "off_s16_t144_rp8_loop": (base, {"r.raster.subS": 16,
                                         "r.raster.tileH": 144,
                                         "r.raster.rp": 8,
                                         "r.raster.subLoop": True}),
        "off_s8_t240": (base, {"r.raster.subS": 8,
                               "r.raster.tileH": 240}),
        "off_t240": (base, {"r.raster.tileH": 240}),
        "off_rp8": (base, {"r.raster.rp": 8}),
        "off_s8_rp8": (base, {"r.raster.subS": 8, "r.raster.rp": 8}),
        "off_t192": (base, {"r.raster.tileH": 192}),
        "off_t712": (base, {"r.raster.tileH": 712}),
        "off_t360": (base, {"r.raster.tileH": 360}),
        "off_s16_bricks": (base, {"r.raster.subS": 16,
                                  "r.raster.tileH": 192,
                                  "r.raster.bricks": True}),
        "bricks": (base, {"r.raster.bricks": True,
                          "r.raster.tileH": 192}),
        "masked": (base._replace(alpha_masked=True), {}),
        "masked_bricks": (base._replace(alpha_masked=True),
                          {"r.raster.bricks": True}),
        "blend": (base._replace(alpha_blend=True), {}),
        "masked_tex": (base._replace(alpha_masked=True, textured=True), {}),
        "tex": (base._replace(textured=True), {}),
        "tex_comp": (base._replace(textured=True), {}),      # compressed pool
        "tex_tril": (base._replace(textured=True, trilinear=True), {}),
        "all_comp_tril": (base._replace(textured=True, trilinear=True,
                                        alpha_masked=True,
                                        alpha_blend=True), {}),
    }
    # block-compressed texture pages variant (r.texture.compress): repack
    # the cached scene's pool once and swap it in for *_comp cases
    pools_comp = None
    if any(n.endswith("_comp") or "_comp_" in n
           for n in args.cases.split(",")):
        from chord_tpu.ops.paged_texture import pack_paged_pool
        tpool = getattr(b, "texture_pool", None)
        if tpool is not None and tpool.textures:
            np_tex = np.clip(np.stack(tpool.textures) * 255.0 + 0.5,
                             0, 255).astype(np.uint8)
            pages_c, meta_c, _ = pack_paged_pool(
                np_tex, tpool.mip_sizes, tpool.mip_offsets, compress=True)
            pools_comp = pools.replace(tex_pages=pages_c, tex_meta=meta_c)
    # ablation monkeypatches: isolate which masked sub-step carries the
    # in-frame interaction cost
    from chord_tpu.ops import shading as shading_ops
    real_accept = shading_ops.alpha_mask_accept

    def accept_depth_only(vis_m, depth_m, depth_o, u_m, v_m,
                          draw_object_m, payload_base, pools, instances,
                          **kw):
        from chord_tpu.ops.shading import unpack_visibility
        slot_g, _ = unpack_visibility(vis_m)
        return (slot_g - payload_base >= 0) & (depth_m > depth_o)

    def accept_none(vis_m, depth_m, depth_o, u_m, v_m, draw_object_m,
                    payload_base, pools, instances, **kw):
        return jnp.zeros(vis_m.shape, bool)

    patches = {
        "masked_noalpha": accept_depth_only,   # raster+composite, no tex
        "masked_noaccept": accept_none,        # raster only, composite no-op
    }
    for k in ("masked_noalpha", "masked_noaccept", "masked_nosample",
              "masked_nogather"):
        cases[k] = (base._replace(alpha_masked=True), {})

    from chord_tpu.ops import texture as texture_ops
    real_sample = texture_ops.sample_material_maps
    real_keep = shading_ops.masked_alpha_keep

    def sample_ones(pools, layers, uv, mip, **kw):
        return jnp.ones(layers.shape + (4,), jnp.float32)

    def keep_nogather(vis_m, u_m, v_m, draw_object_m, payload_base,
                      pools, instances, **kw):
        # sampler with CONSTANT layer/factor — isolates the per-pixel
        # object->material->layer gather chain from the sampler itself
        from chord_tpu.ops.shading import unpack_visibility
        from chord_tpu.ops import texture as tex
        slot_g, _ = unpack_visibility(vis_m)
        hit = (slot_g - payload_base) >= 0
        uv = jnp.stack([u_m, v_m], axis=-1)
        mip = tex.mip_from_uv_density(uv, pools.tex_size)
        layer = jnp.full(u_m.shape, 3, jnp.int32)
        texel = tex.sample_material_maps(pools, layer[None], uv, mip)[0]
        return hit, texel[..., 3] >= 0.5

    for name in args.cases.split(","):
        mcfg, cv = cases[name]
        shading_ops.alpha_mask_accept = patches.get(name, real_accept)
        texture_ops.sample_material_maps = (
            sample_ones if name == "masked_nosample" else real_sample)
        shading_ops.masked_alpha_keep = (
            keep_nogather if name == "masked_nogather" else real_keep)
        saved = {k: cvars.get(k) for k in cv}
        for k, v in cv.items():
            cvars.set(k, v)
        case_pools = pools
        if ("_comp" in name) and pools_comp is not None:
            case_pools = pools_comp
        try:
            fn = jax.jit(functools.partial(
                render_frame_meshlet, config=config, mcfg=mcfg))
            t0 = time.time()
            img, hist, stats = fn(case_pools, inst, view, history)
            jax.device_get(img.ravel()[:1])
            comp = time.time() - t0
            t0 = time.time()
            n = 8
            for _ in range(n):
                img, hist, stats = fn(case_pools, inst, view, history)
            jax.device_get(img.ravel()[:1])
            ms = (time.time() - t0) / n * 1000
            print(json.dumps({"case": name, "ms": round(ms, 2),
                              "compile_s": round(comp, 1),
                              "bin_overflow": int(np.asarray(
                                  stats["bin_overflow"]))}), flush=True)
        except Exception as e:   # noqa: BLE001
            print(json.dumps({"case": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
        finally:
            for k, v in saved.items():
                cvars.set(k, v)


if __name__ == "__main__":
    main()
