#!/usr/bin/env python
"""Device micro-bench: channel-last (H,W,3) vs channel-first (3,H,W)
elementwise math, plus the stack/relayout cost itself. If the TPU keeps
C=3 as the minormost (lane) dim, every (H,W,3) op runs at 3/128 lane
occupancy — the whole frame is built on (H,W,3) vectors, so a positive
result here motivates a channel-planes refactor of the hot passes."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    h, w = 712, 1280
    reps = 64
    rng = np.random.default_rng(0)

    def timeit(fn, *xs):
        f = jax.jit(fn)
        o = f(*xs)
        jax.device_get(jax.tree.leaves(o)[0].ravel()[:1])
        t0 = time.time()
        for _ in range(reps):
            o = f(*xs)
        jax.device_get(jax.tree.leaves(o)[0].ravel()[:1])
        return (time.time() - t0) / reps * 1000.0

    a_l = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    b_l = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    a_f = jnp.moveaxis(a_l, -1, 0).copy()
    b_f = jnp.moveaxis(b_l, -1, 0).copy()
    planes = [a_l[..., i].copy() for i in range(3)]

    # fused elementwise chain ~ shading math (normalize + dot + blend)
    def chain_last(x, y):
        n = x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-6)
        d = jnp.sum(n * y, -1, keepdims=True)
        return n * d + y * (1.0 - d)

    def chain_first(x, y):
        n = x * jax.lax.rsqrt(jnp.sum(x * x, 0, keepdims=True) + 1e-6)
        d = jnp.sum(n * y, 0, keepdims=True)
        return n * d + y * (1.0 - d)

    def chain_planes(x0, x1, x2, y):
        il = jax.lax.rsqrt(x0 * x0 + x1 * x1 + x2 * x2 + 1e-6)
        n0, n1, n2 = x0 * il, x1 * il, x2 * il
        d = n0 * y[..., 0] + n1 * y[..., 1] + n2 * y[..., 2]
        return n0 * d + y[..., 0] * (1 - d), n1 * d, n2 * d

    print(f"chain (H,W,3): {timeit(chain_last, a_l, b_l):.3f} ms")
    print(f"chain (3,H,W): {timeit(chain_first, a_f, b_f):.3f} ms")
    print(f"chain planes:  {timeit(chain_planes, *planes, b_l):.3f} ms")
    print(f"stack 3x(H,W)->(H,W,3): "
          f"{timeit(lambda x0, x1, x2: jnp.stack([x0, x1, x2], -1), *planes):.3f} ms")
    print(f"unstack (H,W,3)->3 planes: "
          f"{timeit(lambda x: tuple(x[..., i] for i in range(3)), a_l):.3f} ms")
    print(f"copy (H,W,3):  {timeit(lambda x: x + 1.0, a_l):.3f} ms")
    print(f"copy (3,H,W):  {timeit(lambda x: x + 1.0, a_f):.3f} ms")
    print(f"copy (H,W):    {timeit(lambda x: x + 1.0, planes[0]):.3f} ms")


if __name__ == "__main__":
    main()
