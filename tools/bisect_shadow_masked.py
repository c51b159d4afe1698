#!/usr/bin/env python
"""Crash bisect for the shadows+masked TPU worker fault.

Runs the shadow_masked feature combo with one of the suspect sub-steps
neutralized, one variant per process (a worker fault poisons the jax
client):

  noalpha  — masked shadow raster runs, but masked_alpha_keep is
             replaced with a depth-only accept (NO paged-texture
             sampling at shadow res). Crash here => the with-attrs
             raster/mesh-shader path at shadow resolution is the fault.
  noshadowmask — masked casters treated opaque in the shadow pass
             (cull masked=None), main-view masked path untouched.
             Crash here => fault is NOT in the masked shadow path.
  full     — unpatched repro (should crash).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "noalpha"
    if variant not in {"noalpha", "noshadowmask", "full"}:
        sys.exit(f"unknown variant {variant!r}; "
                 "expected noalpha|noshadowmask|full")

    import jax.numpy as jnp

    from chord_tpu.ops import shading as shading_ops

    if variant == "noalpha":
        # Gate on payload_base: the shadow path passes 0, the main view
        # passes base_m>0 — only the SHADOW-res alpha sampling is
        # neutralized (the main masked path keeps the real test).
        real_keep = shading_ops.masked_alpha_keep

        def keep_depth_only(vis_m, u_m, v_m, draw_object_m, payload_base,
                            pools, instances, **kw):
            if payload_base != 0:
                return real_keep(vis_m, u_m, v_m, draw_object_m,
                                 payload_base, pools, instances, **kw)
            from chord_tpu.ops.shading import unpack_visibility
            slot_g, _ = unpack_visibility(vis_m)
            hit = slot_g - payload_base >= 0
            return hit, jnp.ones(vis_m.shape, bool)
        shading_ops.masked_alpha_keep = keep_depth_only
    elif variant == "noshadowmask":
        from chord_tpu.renderer import meshlet_frame as mf

        orig = mf.render_shadow_cascade

        def patched(pools, instances, view, rc_main, mcfg, k):
            return orig(pools, instances, view, rc_main,
                        mcfg._replace(shadow_masked=False), k)
        mf.render_shadow_cascade = patched

    from tools.bench_features import run_config
    from bench import _make_scene

    b, pools, n_src = _make_scene("bistro", 3, 2_600_000)
    run_config(f"shadow_masked[{variant}]", b, pools, n_src, 1920, 1080, 2,
               shadows=True, textured=True, alpha_masked=True)


if __name__ == "__main__":
    main()
