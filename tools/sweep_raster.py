#!/usr/bin/env python
"""Raster-config sweep driver: capture the bench work queue on-device at
each (tile_h, sub_s), run the analytical workload model (model_raster)
for the flat AND bricks kernels, and print a ranked table — one command
to pick r.raster.{tileH,subS,bricks} with evidence instead of burning a
50-160 s jit compile per candidate on the full frame."""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from model_raster import capture_queue, model  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frame-idx", type=int, default=4)
    ap.add_argument("--tile-hs", default="120,216,360")
    ap.add_argument("--sub-ss", default="8,16,32")
    args = ap.parse_args()

    rows = []
    for s in (int(x) for x in args.sub_ss.split(",")):
        for th in (int(x) for x in args.tile_hs.split(",")):
            if th % 8 or th % s or th % (4 * s):
                continue    # kernel constraints (raster_queue checks)
            try:
                q = capture_queue(args.width, args.height, args.frame_idx,
                                  th, 128, s)
            except Exception as e:   # noqa: BLE001
                print(json.dumps({"tile_h": th, "sub_s": s,
                                  "error": str(e)[:200]}), flush=True)
                continue
            r = model(q, th, 128, s)
            rows.append(r)
            print(json.dumps(r), flush=True)

    # rank by the vreg-cost proxies
    print("\n=== ranked (lower is better) ===")
    for kind in ("flat_vregs", "brick_vregs"):
        best = sorted(rows, key=lambda r: r[kind])[:3]
        for r in best:
            print(f"{kind}: tile_h={r['tile_h']} sub_s={r['sub_s']} "
                  f"-> {r[kind]:,} (iters flat={r['flat_iters']:,} "
                  f"brick={r['brick_iters']:,})")


if __name__ == "__main__":
    main()
