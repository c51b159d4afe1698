#!/usr/bin/env python
"""Raster-kernel SATURATION microbench (VERDICT r4 missing #5 / next #7).

The frame's drawn-tri rate is a workload statement; this records the
kernel's capability so "is the raster fast or is the frame just small?"
is answerable from the artifact (BASELINE.md asks for "Mtris/s through
visbuffer raster"):

  small_tri  — a dense screen-tiling grid of ~8px triangles (the
               meshlet-bound shape: every window spatially tight, row
               loops near-minimal per triangle). Reports Mtris/s.
  big_tri    — 128 full-screen triangles stacked (the fill-bound shape:
               row loops dominate, one window). Reports Gpix/s of depth-
               tested coverage.

Prints one JSON line per case + a combined record the bench can embed.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def small_tri_case(w, h, jnp, np, tri_px=8.0):
    """Grid of right triangles, ~tri_px pixel edge, covering the screen."""
    nx = int(w / tri_px)
    ny = int(h / tri_px)
    xs = np.linspace(-1, 1, nx + 1)
    ys = np.linspace(-1, 1, ny + 1)
    gx, gy = np.meshgrid(xs, ys)
    v = np.stack([gx.ravel(), gy.ravel(),
                  np.full(gx.size, 0.5), np.ones(gx.size)], -1)
    idx = []
    for j in range(ny):
        for i in range(nx):
            a = j * (nx + 1) + i
            b = a + 1
            c = a + (nx + 1)
            d = c + 1
            idx.append([a, c, b])
            idx.append([b, c, d])
    idx = np.asarray(idx, np.int32)
    return jnp.asarray(v, jnp.float32), jnp.asarray(idx)


def big_tri_case(w, h, jnp, np, n=128):
    """n full-screen triangles at staggered depths (every one survives
    setup; depth test runs per pixel per triangle)."""
    v = []
    idx = []
    for t in range(n):
        z = 0.1 + 0.8 * t / n
        base = len(v)
        v += [[-3.0, -3.0, z, 1.0], [3.0, -3.0, z, 1.0], [0.0, 3.0, z, 1.0]]
        idx.append([base, base + 1, base + 2])
    return (jnp.asarray(np.asarray(v, np.float32)),
            jnp.asarray(np.asarray(idx, np.int32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from chord_tpu.ops.raster import RasterConfig, rasterize

    w, h = args.width, args.height
    out = {}

    for name, (clip, idx) in (
            ("small_tri", small_tri_case(w, h, jnp, np)),
            ("big_tri", big_tri_case(w, h, jnp, np))):
        t = idx.shape[0]
        cfg = RasterConfig(width=w, height=h, pair_capacity=16384,
                           big_capacity=256)
        valid = jnp.ones((t,), bool)
        payload = jnp.arange(1, t + 1, dtype=jnp.uint32)

        def run(clip=clip, idx=idx, valid=valid, payload=payload, cfg=cfg):
            r = rasterize(clip, idx, valid, payload, cfg,
                          backface_cull=False)
            return r[0].sum(), r[-1]["drawn_tris"], r[-1]["bin_overflow"]

        fn = jax.jit(run)
        s, drawn, ov = fn()
        jax.device_get(s)
        t0 = time.time()
        for _ in range(args.reps):
            s, drawn, ov = fn()
        jax.device_get(s)
        ms = (time.time() - t0) / args.reps * 1000.0
        drawn_i = int(np.asarray(drawn))
        rec = {"case": name, "ms": round(ms, 3), "tris": drawn_i,
               "overflow": int(np.asarray(ov)),
               "mtris_per_s": round(drawn_i / (ms / 1e3) / 1e6, 1)}
        if name == "big_tri":
            # every triangle covers ~half the screen after the edge test
            rec["gpix_per_s"] = round(
                drawn_i * (w * h * 0.5) / (ms / 1e3) / 1e9, 2)
        out[name] = rec
        print(json.dumps(rec), flush=True)
    print(json.dumps({"raster_peak": out}), flush=True)


if __name__ == "__main__":
    main()
