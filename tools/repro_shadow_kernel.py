#!/usr/bin/env python
"""Minimal device repro for the masked-shadow raster TPU worker fault.

Jits ONLY render_shadow_cascade (no main view, no GI/post) on the bench
scene — much faster compiles than the full-frame bisect. Variants pin
the faulting dimension:

  full        — render_shadow_cascade as the frame calls it (switch over
                cascades, masked path on). Expect crash.
  noswitch    — same body but cascade 0 called directly (no lax.switch).
  opaque      — shadow_masked=False (16-row depth-only raster only).
  tile64/tile32 — override the shadow tile height.
  mainres     — with-attrs masked raster at the MAIN view (1920x1080,
                tile_h=120) driven by the same light matrix maths: was
                already device-proven inside the frame; sanity baseline.

Usage: python tools/repro_shadow_kernel.py <variant>
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

VARIANTS = {"full", "noswitch", "opaque", "tile64", "tile32", "mainres"}


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    if variant not in VARIANTS:
        sys.exit(f"unknown variant {variant!r}; expected {sorted(VARIANTS)}")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _make_scene, _camera_path
    from chord_tpu.renderer import meshlet_frame as mf
    from chord_tpu.renderer.deferred import DeviceView, RendererConfig
    from chord_tpu.utils.camera import Camera

    b, pools, n_src = _make_scene("bistro", 3, 2_600_000)
    w, h = (1920, 1080)
    cam = Camera(width=w, height=h)
    config = RendererConfig(width=w, height=h, pair_capacity=16384,
                            big_capacity=64)
    mcfg = mf.MeshletFrameConfig(draw_capacity=6144, shadows=True,
                                 textured=True, alpha_masked=True)
    if variant == "opaque":
        mcfg = mcfg._replace(shadow_masked=False)
    scfg = mcfg.shadow_cfg
    view_u = _camera_path("bistro", cam, 2)[1]
    view = DeviceView.from_uniform(view_u, shadow_cfg=scfg)
    inst = b.frame_instances(cam)
    rc = config.raster_config()

    if variant in ("tile64", "tile32"):
        mf._SHADOW_TILE_OVERRIDE = int(variant[4:])

    k = jnp.int32(1)

    if variant == "mainres":
        # with-attrs masked raster at main res with the light matrix
        from chord_tpu.ops.cull import cull_pairs
        from chord_tpu.ops.mesh_shader import mesh_shader_setup
        from chord_tpu.ops.raster import bin_windows, raster_queue

        rc_a = rc._replace(with_attrs=True)

        def run(pools, inst, view):
            m = view.shadow_tw_to_light[1]
            planes = view.shadow_frustum_planes[1]
            cap_m = 1024
            res_m = cull_pairs(pools, inst, planes,
                               jnp.float32(0.5 * h * m[1, 1]), cap_m,
                               lod_threshold=4.0, enable_cone=False,
                               masked=True)
            setup = mesh_shader_setup(res_m.draws, pools, inst, m, cap_m,
                                      w, h, backface_cull=False,
                                      sub_s=rc_a.sub_s)
            q = bin_windows(setup, rc_a)
            return raster_queue(q, setup, rc_a)[0]

        out = jax.jit(run)(pools, inst, view)
        print("mainres ok", float(jnp.sum(out)))
        return

    if variant == "noswitch":
        # call the cascade body for k=1 without lax.switch
        def run(pools, inst, view):
            return mf.render_shadow_cascade(
                pools, inst, view, rc, mcfg, jnp.int32(1))
        # monkeypatch switch to direct call
        orig_switch = jax.lax.switch
        import chord_tpu.renderer.meshlet_frame as _mf

        def fake_switch(idx, branches, *ops):
            return branches[1](*ops)
        _mf.jax.lax = type(jax.lax)("lax_fake") if False else jax.lax
        # cleanest: temporarily swap the module attr
        real = jax.lax.switch
        jax.lax.switch = fake_switch
        try:
            out = jax.jit(run)(pools, inst, view)
            print("noswitch ok", float(jnp.sum(out)))
        finally:
            jax.lax.switch = real
        return

    def run(pools, inst, view):
        return mf.render_shadow_cascade(pools, inst, view, rc, mcfg, k)

    out = jax.jit(run)(pools, inst, view)
    print(variant, "ok", float(jnp.sum(out)))


if __name__ == "__main__":
    main()
