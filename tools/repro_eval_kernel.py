#!/usr/bin/env python
"""Minimal device repro for the shadow-EVALUATE TPU worker fault.

Frame-level bisect (tools/bisect_shadow_frame.py) pinned the fault to the
PCSS evaluate + temporal-mask subgraph: `noeval` passes (73 ms/frame,
raster + cascade fit + temporal all live), everything that runs
evaluate_shadow crashes — even with the shadow maps forced to zeros
(data-independent). evaluate_shadow is pure XLA (gathers + rolls), so the
suspect is an op pattern the axon worker miscompiles/faults on. Variants
grow the subgraph until it faults:

  eval        — evaluate_shadow alone at bench shapes (phase-res grid,
                4x1024^2 maps), IGN noise on
  eval_noign  — same without the noise rotation
  phase       — + the frame's traced-shift rolls + 1/ph^2 subsample
  temporal    — + reprojection gather + residual blend + upsample+roll
  gather      — JUST the flat 4M-element gather with computed indices
  frame_gather— the same gather with indices from a matmul chain

Usage: python tools/repro_eval_kernel.py <variant>
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

VARIANTS = {"eval", "eval_noign", "phase", "temporal", "gather",
            "frame_gather",
            # temporal sub-ops (the `temporal` variant crashes standalone;
            # these isolate which op pattern kills the worker)
            "t_roll", "t_up", "t_uproll", "t_gather2d", "t_blend",
            "t_gatherflat",
            # evaluate embedded the way the FRAME embeds it: inside a
            # lax.scan whose carry holds the shadow maps (round-robin
            # dynamic_update_slice refresh) — none of the passing
            # standalone repros had a scan-carried gather operand
            "scan_eval", "scan_eval_nocarry",
            # eval COMPOSED with pieces of the temporal blend (eval alone
            # and blend alone pass; the composition crashes — isolate
            # which downstream op fused with eval kills the worker)
            "tm_up", "tm_gather", "tm_barrier", "tm_pallas", "tm_copy",
            # structural fixes: tm_dual returns q as an EXTRA jit output
            # alongside the blended mask (root materialization of the
            # gather fusion); tm_split runs eval and blend as TWO separate
            # jit dispatches (eval-as-root passed, blend-with-q-param
            # passed — this composes the two known-good configs)
            "tm_dual", "tm_split",
            # tm_hist: the PIPELINED composition — blend consumes LAST
            # frame's q (a jit parameter: known-good config 2) while this
            # frame's eval result is only a root output (known-good
            # config 1). One dispatch, one frame of latency.
            "tm_hist"}


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "eval"
    if variant not in VARIANTS:
        sys.exit(f"unknown variant {variant!r}; expected {sorted(VARIANTS)}")

    import os

    import jax

    if os.environ.get("REPRO_CPU"):
        # the axon site package overrides JAX_PLATFORMS — override back
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from chord_tpu.ops import shadow as shadow_ops
    from chord_tpu.ops.bluenoise import interleaved_gradient_noise

    scfg = shadow_ops.ShadowConfig()
    n, r = scfg.cascade_count, scfg.resolution
    h, w = 1080, 1920
    kdiv = scfg.eval_res_div            # 4
    ph = scfg.temporal_phase            # 2
    he, we = h // kdiv, w // kdiv       # 270x480
    hp, wp = he // ph, we // ph         # 135x240

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-20, 20, (hp, wp, 3)), jnp.float32)
    nrm_ = rng.normal(size=(hp, wp, 3))
    nrm = jnp.asarray(nrm_ / np.linalg.norm(nrm_, axis=-1, keepdims=True),
                      jnp.float32)
    maps = jnp.asarray(rng.uniform(0, 1, (n, r, r)), jnp.float32)
    sun = jnp.asarray([0.3, 0.8, 0.5], jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    mats, _ = shadow_ops.fit_cascades(
        np.array([0.0, 0.0, -1.0]), np.asarray(sun), np.radians(60.0),
        16 / 9, scfg)
    mats = jnp.asarray(mats)

    if variant in ("scan_eval", "scan_eval_nocarry"):
        def run(pos, nrm, maps, mats, fc):
            def step(carry, i):
                m = carry
                if variant == "scan_eval":
                    k = i % n
                    new = jnp.full((1, r, r), 0.25, jnp.float32) * \
                        (1.0 + i.astype(jnp.float32))
                    m = jax.lax.dynamic_update_slice(m, new, (k, 0, 0))
                noise = interleaved_gradient_noise(hp, wp, i)
                q = shadow_ops.evaluate_shadow(pos, nrm, sun, m, mats,
                                               scfg, noise=noise)
                return m, q.mean()
            _, qs = jax.lax.scan(step, maps, jnp.arange(2))
            return qs
    elif variant in ("eval", "eval_noign"):
        def run(pos, nrm, maps, mats, fc):
            noise = (interleaved_gradient_noise(hp, wp, fc)
                     if variant == "eval" else None)
            return shadow_ops.evaluate_shadow(pos, nrm, sun, maps, mats,
                                              scfg, noise=noise)
    elif variant == "phase":
        pos = jnp.asarray(rng.uniform(-20, 20, (he, we, 3)), jnp.float32)
        nrm = jnp.asarray(nrm_[:1, :1] * np.ones((he, we, 3)), jnp.float32)
        nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)

        def run(pos, nrm, maps, mats, fc):
            pidx = jnp.remainder(fc, ph * ph)
            py_, px_ = pidx // ph, pidx % ph
            shift = lambda a: jnp.roll(a, (-py_, -px_), axis=(0, 1))
            pos_e = shift(pos)[::ph, ::ph]
            nrm_e = shift(nrm)[::ph, ::ph]
            noise = interleaved_gradient_noise(hp, wp, fc)
            return shadow_ops.evaluate_shadow(pos_e, nrm_e, sun, maps,
                                              mats, scfg, noise=noise)
    elif variant in ("tm_up", "tm_gather", "tm_barrier", "tm_pallas",
                     "tm_copy"):
        pos = jnp.asarray(rng.uniform(-20, 20, (he, we, 3)), jnp.float32)
        nrm = jnp.asarray(nrm_[:1, :1] * np.ones((he, we, 3)), jnp.float32)
        nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        prev_mask = jnp.asarray(rng.uniform(0, 1, (he, we)), jnp.float32)
        pm = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)

        def run(pos, nrm, maps, mats, fc):
            from chord_tpu.ops import post
            pidx = jnp.remainder(fc, ph * ph)
            py_, px_ = pidx // ph, pidx % ph
            shift = lambda a: jnp.roll(a, (-py_, -px_), axis=(0, 1))
            pos_e = shift(pos)[::ph, ::ph]
            nrm_e = shift(nrm)[::ph, ::ph]
            noise = interleaved_gradient_noise(hp, wp, fc)
            q = shadow_ops.evaluate_shadow(pos_e, nrm_e, sun, maps, mats,
                                           scfg, noise=noise)
            if variant == "tm_barrier":
                q = jax.lax.optimization_barrier(q)
            elif variant == "tm_pallas":
                from chord_tpu.ops.fusion_barrier import fusion_barrier
                q = fusion_barrier(q)
            elif variant == "tm_copy":
                # copy_p: a cheap non-fusible(?) hint
                q = jax.lax.stop_gradient(jnp.asarray(q)).copy()
            if variant == "tm_gather":
                # blend with a reprojection gather at EVAL res (no
                # upsample/roll between eval and the gather-blend)
                c = (pos_e[..., 0:1] * pm[0] + pos_e[..., 1:2] * pm[1] +
                     pos_e[..., 2:3] * pm[2] + pm[3])
                wc = jnp.maximum(c[..., 3], 1e-6)
                px2 = (c[..., 0] / wc * 0.5 + 0.5) * we
                py2 = (0.5 - c[..., 1] / wc * 0.5) * he
                xi = jnp.clip(px2.astype(jnp.int32), 0, we - 1)
                yi = jnp.clip(py2.astype(jnp.int32), 0, he - 1)
                prev = prev_mask[yi, xi]
                return q + (prev - q) * 0.5
            sq = jnp.roll(post.upsample_nearest(q, ph, he, we),
                          (py_, px_), axis=(0, 1))
            if variant == "tm_up":
                return sq
            # tm_barrier: the FULL temporal blend behind the barrier
            c = (pos[..., 0:1] * pm[0] + pos[..., 1:2] * pm[1] +
                 pos[..., 2:3] * pm[2] + pm[3])
            wc = jnp.maximum(c[..., 3], 1e-6)
            px2 = (c[..., 0] / wc * 0.5 + 0.5) * we
            py2 = (0.5 - c[..., 1] / wc * 0.5) * he
            on = ((px2 >= 0) & (px2 < we) & (py2 >= 0) & (py2 < he) &
                  (c[..., 3] > 0))
            xi = jnp.clip(px2.astype(jnp.int32), 0, we - 1)
            yi = jnp.clip(py2.astype(jnp.int32), 0, he - 1)
            prev = prev_mask[yi, xi]
            resid = jnp.abs(prev - sq)
            alpha = 0.7 * on.astype(jnp.float32) * jnp.exp(-4.0 * resid)
            return sq + (prev - sq) * alpha
    elif variant in ("tm_dual", "tm_split", "tm_hist"):
        pos = jnp.asarray(rng.uniform(-20, 20, (he, we, 3)), jnp.float32)
        nrm = jnp.asarray(nrm_[:1, :1] * np.ones((he, we, 3)), jnp.float32)
        nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        prev_mask = jnp.asarray(rng.uniform(0, 1, (he, we)), jnp.float32)
        pm = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)

        def eval_part(pos, nrm, maps, mats, fc):
            pidx = jnp.remainder(fc, ph * ph)
            py_, px_ = pidx // ph, pidx % ph
            shift = lambda a: jnp.roll(a, (-py_, -px_), axis=(0, 1))
            pos_e = shift(pos)[::ph, ::ph]
            nrm_e = shift(nrm)[::ph, ::ph]
            noise = interleaved_gradient_noise(hp, wp, fc)
            return shadow_ops.evaluate_shadow(pos_e, nrm_e, sun, maps,
                                              mats, scfg, noise=noise)

        def blend_part(pos, q, fc):
            from chord_tpu.ops import post
            pidx = jnp.remainder(fc, ph * ph)
            py_, px_ = pidx // ph, pidx % ph
            sq = jnp.roll(post.upsample_nearest(q, ph, he, we),
                          (py_, px_), axis=(0, 1))
            c = (pos[..., 0:1] * pm[0] + pos[..., 1:2] * pm[1] +
                 pos[..., 2:3] * pm[2] + pm[3])
            wc = jnp.maximum(c[..., 3], 1e-6)
            px2 = (c[..., 0] / wc * 0.5 + 0.5) * we
            py2 = (0.5 - c[..., 1] / wc * 0.5) * he
            on = ((px2 >= 0) & (px2 < we) & (py2 >= 0) & (py2 < he) &
                  (c[..., 3] > 0))
            xi = jnp.clip(px2.astype(jnp.int32), 0, we - 1)
            yi = jnp.clip(py2.astype(jnp.int32), 0, he - 1)
            prev = prev_mask[yi, xi]
            resid = jnp.abs(prev - sq)
            alpha = 0.7 * on.astype(jnp.float32) * jnp.exp(-4.0 * resid)
            return sq + (prev - sq) * alpha

        if variant == "tm_dual":
            def run(pos, nrm, maps, mats, fc):
                q = eval_part(pos, nrm, maps, mats, fc)
                return blend_part(pos, q, fc), q
        elif variant == "tm_hist":
            # prev-frame q arrives as a PARAMETER, this frame's q leaves
            # only as a root output — neither good config is disturbed.
            def run(pos, nrm, maps, mats, fc, q_prev):
                q_new = eval_part(pos, nrm, maps, mats, fc)
                return blend_part(pos, q_prev, fc), q_new
        else:  # tm_split: two separate device dispatches
            f1 = jax.jit(eval_part)
            f2 = jax.jit(blend_part)

            def run(pos, nrm, maps, mats, fc):
                q = f1(pos, nrm, maps, mats, fc)
                return f2(pos, q, fc)
    elif variant == "temporal":
        pos = jnp.asarray(rng.uniform(-20, 20, (he, we, 3)), jnp.float32)
        nrm = jnp.asarray(nrm_[:1, :1] * np.ones((he, we, 3)), jnp.float32)
        nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        prev_mask = jnp.asarray(rng.uniform(0, 1, (he, we)), jnp.float32)
        pm = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)

        def run(pos, nrm, maps, mats, fc):
            from chord_tpu.ops import post
            pidx = jnp.remainder(fc, ph * ph)
            py_, px_ = pidx // ph, pidx % ph
            shift = lambda a: jnp.roll(a, (-py_, -px_), axis=(0, 1))
            pos_e = shift(pos)[::ph, ::ph]
            nrm_e = shift(nrm)[::ph, ::ph]
            noise = interleaved_gradient_noise(hp, wp, fc)
            q = shadow_ops.evaluate_shadow(pos_e, nrm_e, sun, maps, mats,
                                           scfg, noise=noise)
            sq = jnp.roll(post.upsample_nearest(q, ph, he, we),
                          (py_, px_), axis=(0, 1))
            c = (pos[..., 0:1] * pm[0] + pos[..., 1:2] * pm[1] +
                 pos[..., 2:3] * pm[2] + pm[3])
            wc = jnp.maximum(c[..., 3], 1e-6)
            px2 = (c[..., 0] / wc * 0.5 + 0.5) * we
            py2 = (0.5 - c[..., 1] / wc * 0.5) * he
            on = ((px2 >= 0) & (px2 < we) & (py2 >= 0) & (py2 < he) &
                  (c[..., 3] > 0))
            xi = jnp.clip(px2.astype(jnp.int32), 0, we - 1)
            yi = jnp.clip(py2.astype(jnp.int32), 0, he - 1)
            prev = prev_mask[yi, xi]
            resid = jnp.abs(prev - sq)
            alpha = 0.7 * on.astype(jnp.float32) * jnp.exp(-4.0 * resid)
            return sq + (prev - sq) * alpha
    elif variant.startswith("t_"):
        q0 = jnp.asarray(rng.uniform(0, 1, (hp, wp)), jnp.float32)
        prev_mask = jnp.asarray(rng.uniform(0, 1, (he, we)), jnp.float32)
        pm = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
        pos = jnp.asarray(rng.uniform(-20, 20, (he, we, 3)), jnp.float32)

        def run(pos, nrm, maps, mats, fc):
            from chord_tpu.ops import post
            pidx = jnp.remainder(fc, ph * ph)
            py_, px_ = pidx // ph, pidx % ph
            q = q0 * (1.0 + 0.1 * fc)
            if variant == "t_roll":
                return jnp.roll(prev_mask, (py_, px_), axis=(0, 1))
            if variant == "t_up":
                return post.upsample_nearest(q, ph, he, we)
            if variant == "t_uproll":
                return jnp.roll(post.upsample_nearest(q, ph, he, we),
                                (py_, px_), axis=(0, 1))
            if variant in ("t_gather2d", "t_gatherflat"):
                c = (pos[..., 0:1] * pm[0] + pos[..., 1:2] * pm[1] +
                     pos[..., 2:3] * pm[2] + pm[3])
                wc = jnp.maximum(c[..., 3], 1e-6)
                px2 = (c[..., 0] / wc * 0.5 + 0.5) * we
                py2 = (0.5 - c[..., 1] / wc * 0.5) * he
                xi = jnp.clip(px2.astype(jnp.int32), 0, we - 1)
                yi = jnp.clip(py2.astype(jnp.int32), 0, he - 1)
                if variant == "t_gatherflat":
                    return prev_mask.reshape(-1)[yi * we + xi]
                return prev_mask[yi, xi]
            # t_blend: everything except evaluate_shadow
            sq = jnp.roll(post.upsample_nearest(q, ph, he, we),
                          (py_, px_), axis=(0, 1))
            c = (pos[..., 0:1] * pm[0] + pos[..., 1:2] * pm[1] +
                 pos[..., 2:3] * pm[2] + pm[3])
            wc = jnp.maximum(c[..., 3], 1e-6)
            px2 = (c[..., 0] / wc * 0.5 + 0.5) * we
            py2 = (0.5 - c[..., 1] / wc * 0.5) * he
            on = ((px2 >= 0) & (px2 < we) & (py2 >= 0) & (py2 < he) &
                  (c[..., 3] > 0))
            xi = jnp.clip(px2.astype(jnp.int32), 0, we - 1)
            yi = jnp.clip(py2.astype(jnp.int32), 0, he - 1)
            prev = prev_mask[yi, xi]
            resid = jnp.abs(prev - sq)
            alpha = 0.7 * on.astype(jnp.float32) * jnp.exp(-4.0 * resid)
            return sq + (prev - sq) * alpha
    elif variant in ("gather", "frame_gather"):
        flat = maps.reshape(-1)

        def run(pos, nrm, maps, mats, fc):
            if variant == "frame_gather":
                m = mats[0]
                lp = (pos[..., 0:1] * m[0] + pos[..., 1:2] * m[1] +
                      pos[..., 2:3] * m[2] + m[3])
                u = (lp[..., 0] * 0.5 + 0.5) * r
                v = (0.5 - lp[..., 1] * 0.5) * r
            else:
                u = (pos[..., 0] * 13.7) % r
                v = (pos[..., 1] * 7.3) % r
            cascade = (fc + jnp.zeros((hp, wp), jnp.int32)) % 4
            acc = jnp.zeros((hp, wp))
            for s in range(6):
                x = jnp.clip((u + s).astype(jnp.int32), 0, r - 1)
                y = jnp.clip((v - s).astype(jnp.int32), 0, r - 1)
                acc += flat[cascade * (r * r) + y * r + x]
            return acc

    fn = run if variant == "tm_split" else jax.jit(run)

    def call(i, qp):
        if variant == "tm_hist":
            return fn(pos, nrm, maps, mats, jnp.int32(i), qp)
        return fn(pos, nrm, maps, mats, jnp.int32(i))

    q_prev = jnp.zeros((hp, wp), jnp.float32)
    t0 = time.time()
    out = jax.device_get(call(1, q_prev))
    tot = sum(float(np.sum(a)) for a in jax.tree_util.tree_leaves(out))
    print(f"{variant} compile+run ok in {time.time() - t0:.1f}s "
          f"sum={tot:.3f}")
    t0 = time.time()
    for i in range(3):
        res = call(i, q_prev)
        if variant == "tm_hist":
            q_prev = res[1]
        out = jax.device_get(res)
    print(f"{variant} steady ok {(time.time() - t0) / 3 * 1000:.1f} ms")


if __name__ == "__main__":
    main()
