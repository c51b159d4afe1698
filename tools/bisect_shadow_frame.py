#!/usr/bin/env python
"""In-frame bisect for the shadows-on TPU worker fault (round 3).

Device facts so far: render_shadow_cascade STANDALONE passes
(tools/repro_shadow_kernel.py full); the full frame with shadows=True
crashes even with textures/masked OFF (bench_features `shadows`), so the
fault lives in the shadow subgraph's interaction with the rest of the
frame. Variants kill one stage at a time on the bench scene at 1080p:

  full        — the `shadows` bench config as-is (expect crash)
  norender    — shadow maps forced to zeros (no cascade raster/cull in
                the program); evaluate/temporal still run
  noeval      — cascade raster runs; evaluate_shadow replaced by lit=1
  nofit       — depth_range_fit=False (host frustum fit; no device refit)
  noswitch    — cascade k fixed to 0 (no lax.switch over branches)
  oneframe    — frames=1 (single-step scan)
  notemporal  — ShadowConfig.temporal=False

Usage: python tools/bisect_shadow_frame.py <variant> [frames]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

VARIANTS = {"full", "norender", "noeval", "nofit", "noswitch", "oneframe",
            "notemporal", "nogather", "one_sample"}


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    if variant not in VARIANTS:
        sys.exit(f"unknown variant {variant!r}; expected {sorted(VARIANTS)}")
    if variant == "oneframe":
        frames = 1

    import jax.numpy as jnp

    from chord_tpu.ops import shadow as shadow_ops
    from chord_tpu.renderer import meshlet_frame as mf

    feat = dict(shadows=True)

    if variant == "norender":
        orig = mf.render_shadow_cascade

        def no_render(pools, instances, view, rc_main, mcfg, k,
                      mats=None, planes_all=None):
            r = mcfg.shadow_cfg.resolution
            return jnp.zeros((r, r), jnp.float32)
        mf.render_shadow_cascade = no_render
    elif variant == "nogather":
        # evaluate_shadow with ALL its math intact but the shadow-map
        # gathers replaced by a constant depth — if this passes, the
        # in-frame flat gathers are the faulting op
        real = shadow_ops.evaluate_shadow

        def patched(position_tw, normal, sun_dir, shadow_maps, mats, cfg,
                    noise=None):
            # same math, but every gather reads an (N,8,8) operand
            # instead of (N,1024,1024): if this passes, the gather's
            # OPERAND SIZE is what kills the worker
            n_ = shadow_maps.shape[0]
            tiny = jnp.broadcast_to(
                shadow_maps[:, :1, :1].mean() + jnp.zeros((n_, 8, 8)),
                (n_, 8, 8))
            return real(position_tw, normal, sun_dir, tiny, mats,
                        cfg._replace(resolution=8), noise=noise)
        shadow_ops.evaluate_shadow = patched
        mf.shadow_ops.evaluate_shadow = patched
    elif variant == "one_sample":
        # full evaluate but 1 blocker + 1 PCF sample (gather count 11->2)
        flds = mf.MeshletFrameConfig._fields
        dflts = list(mf.MeshletFrameConfig.__new__.__defaults__)
        off = len(flds) - len(dflts)
        i = flds.index("shadow_cfg") - off
        dflts[i] = dflts[i]._replace(pcss_blocker_samples=1,
                                     pcss_pcf_samples=1)
        mf.MeshletFrameConfig.__new__.__defaults__ = tuple(dflts)
    elif variant == "noeval":
        def lit_one(position_tw, normal, sun_dir, shadow_maps, mats, cfg,
                    noise=None):
            return jnp.ones(position_tw.shape[:2], jnp.float32)
        shadow_ops.evaluate_shadow = lit_one
        mf.shadow_ops.evaluate_shadow = lit_one
    elif variant in ("nofit", "notemporal"):
        # the default MeshletFrameConfig.shadow_cfg INSTANCE is baked
        # into the class defaults at definition time — replace it there
        field = {"nofit": "depth_range_fit",
                 "notemporal": "temporal"}[variant]
        flds = mf.MeshletFrameConfig._fields
        dflts = list(mf.MeshletFrameConfig.__new__.__defaults__)
        off = len(flds) - len(dflts)
        i = flds.index("shadow_cfg") - off
        dflts[i] = dflts[i]._replace(**{field: False})
        mf.MeshletFrameConfig.__new__.__defaults__ = tuple(dflts)
    elif variant == "noswitch":
        import jax

        def fixed(idx, branches, *ops):
            return branches[0](*ops)
        jax.lax.switch = fixed

    from tools.bench_features import run_config
    from bench import _make_scene

    b, pools, n_src = _make_scene("bistro", 3, 2_600_000)
    t0 = time.time()
    try:
        ms = run_config(f"bisect_{variant}", b, pools, n_src,
                        1920, 1080, frames, **feat)
        print(json.dumps({"variant": variant, "ms": round(ms, 2),
                          "total_s": round(time.time() - t0, 1)}),
              flush=True)
    except Exception as e:   # noqa: BLE001
        print(json.dumps({"variant": variant,
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)
        raise


if __name__ == "__main__":
    main()
