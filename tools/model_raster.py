#!/usr/bin/env python
"""Analytical raster-kernel workload model over the REAL work queue.

The raster kernel's cost is dominated by pack iterations — full-width
(128, tile_w) vector ops in the inner row loop (measured ~30 plane-ops
per iteration ≈ 30*16 vregs; 59972 iterations ≈ 30.6 ms on v5e at the
heavy bench camera). This tool rebuilds the bench frame's cull + setup +
bin stages, pulls the queue to the host, and counts, per candidate
kernel config:

  - live (tile, window, subwindow) bodies (fixed cost: ~45 column ops +
    10 full-width hoists each),
  - pack iterations for the FLAT kernel (rows/subS per live subwindow),
  - pack iterations for the BRICKS kernel (rows/(4*subS) per overlapped
    32-px brick, x-binned),
  - transpose+DMA pair count (per (tile, window) pair).

Use it to pick r.raster.{tileH,subS,bricks} defaults without burning a
50-160 s device compile per candidate; confirm the winner on-device via
tools/bench_ab.py.

Needs the setup stage, which is a Pallas kernel — run with the TPU
tunnel up (CPU interpret mode is too slow at bench scale), or pass
--load/--save to reuse a captured queue .npz.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np

WINDOW = 128
BRICK_W = 32
BRICK_H = 4


def capture_queue(width: int, height: int, frame_idx: int, tile_h: int,
                  tile_w: int, sub_s: int):
    """Run cull + mesh-shader setup + bin for both opaque phases at the
    bench camera; return host-side queue + per-subwindow bounds."""
    import jax.numpy as jnp  # noqa: F401  (device side)

    from bench import _camera_path, _make_scene
    from chord_tpu.renderer import meshlet_frame as mf
    from chord_tpu.renderer.deferred import DeviceView, RendererConfig
    from chord_tpu.renderer.meshlet_frame import MeshletFrameConfig
    from chord_tpu.utils.camera import Camera

    b, pools, n_src = _make_scene("bistro", 3, 2_600_000)
    cam = Camera(width=width, height=height)
    views = _camera_path("bistro", cam, 8)
    u = views[frame_idx]
    mcfg = MeshletFrameConfig(draw_capacity=6144, occlusion=False)
    view = DeviceView.from_uniform(u, shadow_cfg=None)
    config = RendererConfig(width=width, height=height,
                            pair_capacity=16384, big_capacity=64)
    rc = config.raster_config()._replace(
        tile_h=tile_h, tile_w=tile_w, sub_s=sub_s, with_attrs=True)
    cap = min(mcfg.draw_capacity, -(-pools.num_pairs // 128) * 128)
    proj_scale = 0.5 * height * np.asarray(view.tw_to_clip_nj)[1, 1]
    inst = b.frame_instances(cam)
    acap = min(pools.num_pairs, max(4096, 4 * cap))
    active = mf.build_active_pairs(pools, inst, view.frustum_planes, acap)
    res0 = mf.cull_pairs(pools, inst, view.frustum_planes, proj_scale, cap,
                         lod_threshold=mcfg.lod_threshold_px, masked=False,
                         active=active)
    setup = mf.mesh_shader_setup(res0.draws, pools, inst, view.tw_to_clip,
                                 cap, width, height)
    queue = mf.bin_windows(setup, rc)
    return {
        "pair_win": np.asarray(queue.pair_win),
        "starts": np.asarray(queue.starts),
        "counts": np.asarray(queue.counts),
        "sub_bounds": np.asarray(setup.sub_bounds),
        "n_pairs": int(queue.n_pairs),
        "scene_src_tris": int(n_src),
        "width": width, "height": height,
        "tile_h": tile_h, "tile_w": tile_w, "sub_s": sub_s,
    }


def model(q: dict, tile_h: int, tile_w: int, sub_s_kernel: int) -> dict:
    """Count kernel work over the captured queue.

    The queue's sub_bounds were computed at capture sub_s; the model can
    only evaluate kernel sub_s == capture sub_s (the triangle grouping
    changes with S), so pass matching values.
    """
    assert sub_s_kernel == q["sub_s"], \
        "re-capture the queue with --sub-s matching the kernel candidate"
    s_cnt = q["sub_s"]
    rp = s_cnt
    rows_it = rp * BRICK_H
    tiles_x = -(-q["width"] // tile_w)
    nb = tile_w // BRICK_W

    sy0, sy1, sx0, sx1 = (q["sub_bounds"][i] for i in range(4))
    counts = q["counts"]
    starts = q["starts"]
    pair_win = q["pair_win"]

    tot_pairs = 0
    live_sub = 0
    tot_sub = 0
    flat_iters = 0
    brick_iters = 0
    brick_bodies = 0
    rows_cov = 0
    for tile in range(counts.shape[0]):
        c = int(counts[tile])
        if c == 0:
            continue
        ty, tx = tile // tiles_x, tile % tiles_x
        py0, px0 = ty * tile_h, tx * tile_w
        wins = pair_win[starts[tile]:starts[tile] + c]
        tot_pairs += c
        for win in wins:
            base = int(win) * s_cnt
            for s in range(s_cnt):
                tot_sub += 1
                y0 = min(max(int(sy0[base + s]) - py0, 0), tile_h)
                y1 = min(max(int(sy1[base + s]) + 1 - py0, 0), tile_h)
                xok = (int(sx1[base + s]) >= px0 and
                       int(sx0[base + s]) < px0 + tile_w)
                if y1 <= y0 or not xok:
                    continue
                live_sub += 1
                rows_cov += y1 - y0
                flat_iters += (y1 + rp - 1) // rp - y0 // rp
                p0 = y0 // rows_it
                for bx in range(nb):
                    bx0 = px0 + bx * BRICK_W
                    if (int(sx1[base + s]) >= bx0 and
                            int(sx0[base + s]) < bx0 + BRICK_W):
                        p1 = (y1 + rows_it - 1) // rows_it
                        if p1 > p0:
                            brick_bodies += 1
                            brick_iters += p1 - p0

    # cost proxies (vreg-ops; both kernels' iterations are (128, TW) wide)
    iter_ops = 30 * (WINDOW // 8) * (tile_w // 128)
    fixed_sub = 45 + 10 * (WINDOW // 8)        # column ops + hoists
    fixed_brick = 10                           # ccb column ops per brick
    return {
        "tile_h": tile_h, "sub_s": s_cnt,
        "pairs": tot_pairs, "subwindows": tot_sub, "live_sub": live_sub,
        "rows_covered": rows_cov,
        "flat_iters": flat_iters,
        "brick_iters": brick_iters, "brick_bodies": brick_bodies,
        "flat_vregs": flat_iters * iter_ops + live_sub * fixed_sub,
        "brick_vregs": (brick_iters * iter_ops + live_sub * fixed_sub +
                        brick_bodies * fixed_brick),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frame-idx", type=int, default=4)
    ap.add_argument("--tile-h", type=int, default=216)
    ap.add_argument("--tile-w", type=int, default=128)
    ap.add_argument("--sub-s", type=int, default=8)
    ap.add_argument("--save", default="")
    ap.add_argument("--load", default="")
    args = ap.parse_args()

    if args.load:
        q = dict(np.load(args.load))
        for k in ("n_pairs", "scene_src_tris", "width", "height",
                  "tile_h", "tile_w", "sub_s"):
            q[k] = int(q[k])
    else:
        q = capture_queue(args.width, args.height, args.frame_idx,
                          args.tile_h, args.tile_w, args.sub_s)
        if args.save:
            np.savez(args.save, **q)

    r = model(q, args.tile_h, args.tile_w, args.sub_s)
    r["speedup_bricks_vs_flat"] = round(
        r["flat_vregs"] / max(r["brick_vregs"], 1), 3)
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
