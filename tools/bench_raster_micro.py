#!/usr/bin/env python
"""Raster kernel cost decomposition on device.

raster_queue at the heavy camera costs ~37 ms (r2). Per-pair work =
FIXED (DMA 20KB + (40,128) transpose + 4x coefficient hoists) +
ROW-PROPORTIONAL (packed row loop). This tool separates the two by
re-timing the SAME queue with doctored inputs:

  real       — the real heavy-camera queue (baseline)
  rows1      — sub_bounds clamped to <=1 pack per subwindow: fixed
               per-pair cost + minimal row work
  rows0      — sub_bounds poisoned (y1 < y0): the pl.when gate skips
               every subwindow body -> DMA + transpose only
  pairs_half — first half of the pairs (counts halved): linearity check

time(real) - time(rows1) ~= row-proportional term;
time(rows1) - time(rows0) ~= hoist term; time(rows0) ~= DMA+transpose.
Prints one JSON line per case.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _make_scene, _camera_path
    from chord_tpu.ops.cull import cull_pairs
    from chord_tpu.ops.mesh_shader import mesh_shader_setup
    from chord_tpu.ops.raster import bin_windows, raster_queue
    from chord_tpu.renderer.deferred import DeviceView, RendererConfig
    from chord_tpu.utils.camera import Camera

    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()
    w, h = args.width, args.height
    b, pools, n_src = _make_scene("bistro", 3, 2_600_000)
    cam = Camera(width=w, height=h)
    view_u = _camera_path("bistro", cam, 16)[10]   # heavy camera
    view = DeviceView.from_uniform(view_u)
    inst = b.frame_instances(cam)
    config = RendererConfig(width=w, height=h, pair_capacity=16384,
                            big_capacity=64)
    rc = config.raster_config()._replace(with_attrs=True)
    cap = 6144

    def build_queue(pools, inst, view):
        res = cull_pairs(pools, inst, view.frustum_planes,
                         jnp.float32(0.5 * h * 1.0), cap,
                         lod_threshold=1.0)
        setup = mesh_shader_setup(res.draws, pools, inst, view.tw_to_clip,
                                  cap, w, h, sub_s=rc.sub_s)
        q = bin_windows(setup, rc)
        return q, setup

    q, setup = jax.jit(build_queue)(pools, inst, view)
    q = jax.tree.map(jnp.asarray, q)
    n_pairs = int(np.asarray(q.n_pairs))
    sb = np.asarray(setup.sub_bounds)
    rows = np.maximum(sb[1] - sb[0] + 1, 0)
    print(json.dumps({"n_pairs": n_pairs,
                      "overflow": int(np.asarray(q.overflow)),
                      "mean_sub_rows": float(rows[rows > 0].mean()),
                      "p90_sub_rows": float(np.percentile(rows[rows > 0],
                                                          90))}),
          flush=True)

    fn = jax.jit(lambda qq, ss: raster_queue(qq, ss, rc)[0].sum())

    def timeit(name, qq, ss, reps=5):
        _ = jax.device_get(fn(qq, ss))
        t0 = time.time()
        for _i in range(reps):
            out = jax.device_get(fn(qq, ss))
        ms = (time.time() - t0) / reps * 1000.0
        print(json.dumps({"case": name, "ms": round(ms, 2),
                          "checksum": float(out)}), flush=True)
        return ms

    timeit("real", q, setup)

    # rows1: clamp every subwindow's y-range to <=sub_s rows (1 pack)
    sb1 = sb.copy()
    sb1[1] = np.minimum(sb1[1], sb1[0] + rc.sub_s - 1)
    setup1 = setup.replace(sub_bounds=jnp.asarray(sb1))
    timeit("rows1", q, setup1)

    # rows0: poison every subwindow (y1 < y0) -> bodies fully skipped
    sb0 = sb.copy()
    sb0[0] = 1
    sb0[1] = -1
    setup0 = setup.replace(sub_bounds=jnp.asarray(sb0))
    timeit("rows0", q, setup0)

    # pairs_half: halve every tile's count (linearity in pair count)
    qh = q._replace(counts=jnp.asarray(np.asarray(q.counts) // 2))
    timeit("pairs_half", qh, setup)

    # noattr: the same queue through the 16-row depth-only layout —
    # isolates what the 5 attribute planes cost the inner loop
    rc16 = rc._replace(with_attrs=False)
    fn16 = jax.jit(lambda qq, ss: raster_queue(qq, ss, rc16)[0].sum())
    _ = jax.device_get(fn16(q, setup))
    t0 = time.time()
    for _i in range(5):
        out = jax.device_get(fn16(q, setup))
    ms = (time.time() - t0) / 5 * 1000.0
    print(json.dumps({"case": "noattr", "ms": round(ms, 2),
                      "checksum": float(out)}), flush=True)


if __name__ == "__main__":
    main()
