#!/usr/bin/env python
"""Device micro-bench of k-fold downsample strategies for (H,W[,C])
planes — the frame decimates position/normal/depth/valid for every
reduced-res pass, and the trace shows the reshape+slice variant still
costs ~2 ms/frame in aggregate. Candidates:

  slice    x[::k, ::k]                      (axon: index-array gather?)
  reshape  reshape->unit-index (ops/post.decimate today)
  dot      one-hot selection matmuls       (MXU relayout, exact for f32)
  pair     two cascaded k=2 reshape steps  (for k=4)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from chord_tpu.ops.post import decimate

    h, w = 712, 1280
    reps = 64

    def timeit(fn, *xs):
        f = jax.jit(fn)
        o = f(*xs)
        jax.device_get(jax.tree.leaves(o)[0].ravel()[:1])
        t0 = time.time()
        for _ in range(reps):
            o = f(*xs)
        jax.device_get(jax.tree.leaves(o)[0].ravel()[:1])
        return (time.time() - t0) / reps * 1000.0

    def dot_dec(x, k):
        hh, ww = x.shape[0] // k, x.shape[1] // k
        sh = jnp.zeros((hh, x.shape[0]), jnp.float32).at[
            jnp.arange(hh), jnp.arange(hh) * k].set(1.0)
        sw = jnp.zeros((x.shape[1], ww), jnp.float32).at[
            jnp.arange(ww) * k, jnp.arange(ww)].set(1.0)
        if x.ndim == 2:
            y = sh @ x @ sw
            return y
        c = x.shape[2]
        y = jnp.einsum("Hh,hwc->Hwc", sh, x,
                       precision=jax.lax.Precision.HIGHEST)
        y = jnp.einsum("Hwc,wW->HWc", y, sw,
                       precision=jax.lax.Precision.HIGHEST)
        return y

    rng = np.random.default_rng(0)
    for shape in ((h, w), (h, w, 3)):
        x = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
        for k in (2, 4):
            r = {}
            r["slice"] = timeit(
                lambda a: tuple(jax.lax.slice(
                    a, (0,) * a.ndim,
                    a.shape, (k, k) + (1,) * (a.ndim - 2)) for _ in (0,)), x)
            r["reshape"] = timeit(lambda a: decimate(a, k), x)
            r["dot"] = timeit(lambda a: dot_dec(a, k), x)
            if k == 4:
                r["pair"] = timeit(
                    lambda a: decimate(decimate(a, 2), 2), x)
            # correctness spot check
            ref = np.asarray(x)[::k, ::k]
            got = np.asarray(jax.jit(lambda a: dot_dec(a, k))(x))
            err = np.abs(ref[:got.shape[0], :got.shape[1]] - got).max()
            print(f"shape={shape} k={k}  " +
                  "  ".join(f"{n}={v:.3f}ms" for n, v in r.items()) +
                  f"  dot_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
