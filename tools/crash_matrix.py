#!/usr/bin/env python
"""Systematic pass/crash matrix for the axon worker fault.

Runs repro_split_frames.py cells (feature/sync combinations) each in a
fresh child process (a worker fault poisons the jax client), with a
device health gate between cells so a recovering worker doesn't smear
one cell's crash into the next. Records each cell's verdict and crash
point to stdout and --out (JSON lines).
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

HEALTH = ("import jax, jax.numpy as jnp; "
          "print(float(jnp.ones((8,128)).sum()))")

CELLS = [
    # name, extra args for repro_split_frames.py
    ("post1_syncf", ["--post", "1", "--sync", "frame"]),
    ("post0_syncf", ["--post", "0", "--sync", "frame"]),
    ("post0_async", ["--post", "0", "--sync", "none"]),
    ("post1_async", ["--post", "1", "--sync", "none"]),
    ("nomask_syncf", ["--post", "1", "--masked", "0", "--sync", "frame"]),
    ("notex_syncf", ["--post", "1", "--textured", "0", "--masked", "0",
                     "--sync", "frame"]),
    # CONTROLS — configs that passed on device in r2 (tex 88.3 ms@2f,
    # off 57.9 ms). If these crash too, the worker/tunnel has degraded
    # and the feature cells are uninterpretable.
    ("ctl_texonly", ["--post", "1", "--shadows", "0", "--sync", "frame"]),
    ("ctl_off", ["--post", "1", "--shadows", "0", "--textured", "0",
                 "--masked", "0", "--sync", "frame"]),
    # Split-service bisection: which SIDE of the two-dispatch scheme
    # carries the fault — the frame program alone (shadow consumption:
    # temporal blend + upsample, no raster/eval), the shadow service
    # alone (cascade raster + masked alpha + PCSS eval), or only their
    # coexistence.
    ("frame_only", ["--post", "1", "--sync", "frame",
                    "--mode", "frame_only"]),
    ("svc_only", ["--post", "1", "--sync", "eval",
                  "--mode", "service_only"]),
    ("frame_only_p0", ["--post", "0", "--sync", "frame",
                       "--mode", "frame_only"]),
    ("nomask_syncf2", ["--post", "1", "--masked", "0", "--sync",
                       "frame"]),
    ("notex_syncf2", ["--post", "1", "--textured", "0", "--masked", "0",
                      "--sync", "frame"]),
]


def health_gate(max_tries=10, timeout=180):
    for i in range(max_tries):
        try:
            p = subprocess.run([sys.executable, "-c", HEALTH],
                               capture_output=True, text=True,
                               timeout=timeout)
            if p.returncode == 0 and "1024.0" in p.stdout:
                return i
        except subprocess.TimeoutExpired:
            pass
        time.sleep(30)
    return -1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--cells", default="",
                    help="comma-separated subset of cell names")
    ap.add_argument("--out", default="/tmp/crash_matrix.jsonl")
    ap.add_argument("--child-timeout", type=int, default=900)
    args = ap.parse_args()

    subset = set(args.cells.split(",")) if args.cells else None
    fo = open(args.out, "a")

    for name, extra in CELLS:
        if subset and name not in subset:
            continue
        tries = health_gate()
        if tries < 0:
            rec = {"cell": name, "verdict": "worker_unreachable"}
            print(json.dumps(rec), flush=True)
            fo.write(json.dumps(rec) + "\n")
            fo.flush()
            continue
        cmd = [sys.executable, "tools/repro_split_frames.py",
               "--frames", str(args.frames), "--passes",
               str(args.passes)] + extra
        t0 = time.time()
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=args.child_timeout)
            timed_out = False
        except subprocess.TimeoutExpired as e:
            p = e
            timed_out = True
        out = (p.stdout or b"")
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        lines = [ln for ln in out.splitlines() if ln.startswith("{")]
        last = json.loads(lines[-1]) if lines else {}
        done = [json.loads(ln) for ln in lines
                if '"done": true' in ln.replace("'", '"')
                or '"done": True' in ln]
        if timed_out:
            verdict = "timeout"
        elif p.returncode == 0 and len(done) == args.passes:
            verdict = "ok"
        else:
            verdict = "crash"
        err_tail = ""
        if verdict != "ok":
            se = p.stderr or ""
            if isinstance(se, bytes):
                se = se.decode(errors="replace")
            tail = [l for l in se.strip().splitlines() if l][-1:]
            err_tail = tail[0][:160] if tail else ""
        rec = {"cell": name, "verdict": verdict,
               "health_tries": tries,
               "last_progress": last, "wall_s": round(time.time() - t0, 1),
               "ms_per_frame": [d.get("ms_per_frame") for d in done],
               "err": err_tail}
        print(json.dumps(rec), flush=True)
        fo.write(json.dumps(rec) + "\n")
        fo.flush()
    fo.close()


if __name__ == "__main__":
    main()
