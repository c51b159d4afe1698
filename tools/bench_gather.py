#!/usr/bin/env python
"""Microbench: texture-pool gather strategies at 1080p on TPU.

The feature bisect showed one full-res bilinear sample_pool costs ~60 ms
(4 advanced-indexing gathers). This measures the alternatives before the
pool redesign: row widths 4/16/64 u8 vs f32, take vs advanced indexing,
one gather vs four, and int32-packed channel words.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
TOTAL = 350_000   # pool texels (256^2 + mips, a few layers)


def timed(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.device_get(jax.tree.leaves(r)[0].ravel()[:1])
    t0 = time.time()
    for _ in range(4):
        r = f(*args)
    jax.device_get(jax.tree.leaves(r)[0].ravel()[:1])
    ms = (time.time() - t0) / 4 * 1000
    print(f"{name:44s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, TOTAL, (H, W)), jnp.int32)
    pool4_u8 = jnp.asarray(rng.integers(0, 255, (TOTAL, 4)), jnp.uint8)
    pool16_u8 = jnp.asarray(rng.integers(0, 255, (TOTAL, 16)), jnp.uint8)
    pool64_u8 = jnp.asarray(rng.integers(0, 255, (TOTAL, 64)), jnp.uint8)
    pool4_f32 = pool4_u8.astype(jnp.float32)
    pool16_f32 = pool16_u8.astype(jnp.float32)
    # channel-packed: one int32 word = RGBA8
    pool1_i32 = jnp.asarray(
        rng.integers(0, 2**31, (TOTAL,), dtype=np.int64), jnp.int32)
    pool4_i32 = jnp.asarray(
        rng.integers(0, 2**31, (TOTAL, 4), dtype=np.int64), jnp.int32)

    timed("adv-index (T,4) u8 x1", lambda p, i: p[i].sum(),
          pool4_u8, idx)
    timed("adv-index (T,4) u8 x4 (bilinear)",
          lambda p, i: (p[i] + p[i + 1] + p[i + 2] + p[i + 3]).sum(),
          pool4_u8, idx)
    timed("take (T,4) u8 x1", lambda p, i: jnp.take(
        p, i, axis=0).sum(), pool4_u8, idx)
    timed("take (T,16) u8 x1 (quad row)", lambda p, i: jnp.take(
        p, i, axis=0).sum(), pool16_u8, idx)
    timed("take (T,64) u8 x1 (bundle row)", lambda p, i: jnp.take(
        p, i, axis=0).sum(), pool64_u8, idx)
    timed("take (T,4) f32 x1", lambda p, i: jnp.take(
        p, i, axis=0).sum(), pool4_f32, idx)
    timed("take (T,16) f32 x1", lambda p, i: jnp.take(
        p, i, axis=0).sum(), pool16_f32, idx)
    timed("take (T,) i32-packed x1", lambda p, i: jnp.take(
        p, i, axis=0).sum(), pool1_i32, idx)
    timed("take (T,) i32-packed x4", lambda p, i: (
        jnp.take(p, i, axis=0) + jnp.take(p, i + 1, axis=0) +
        jnp.take(p, i + 2, axis=0) + jnp.take(p, i + 3, axis=0)).sum(),
        pool1_i32, idx)
    timed("take (T,4) i32 quad-packed x1", lambda p, i: jnp.take(
        p, i, axis=0).sum(), pool4_i32, idx)
    # flattened 1-D f32 with 4 scalar takes (channel-major planes)
    poolp = pool4_f32.T.reshape(-1)   # (4*TOTAL,) plane-major
    timed("take flat f32 plane x4", lambda p, i: (
        jnp.take(p, i) + jnp.take(p, i + TOTAL) +
        jnp.take(p, i + 2 * TOTAL) + jnp.take(p, i + 3 * TOTAL)).sum(),
        poolp, idx)
    # half-res gather + nearest upsample
    idx_h = idx[::2, ::2]
    timed("take (T,) i32-packed half-res x1", lambda p, i: jnp.take(
        p, i, axis=0).sum(), pool1_i32, idx_h)


if __name__ == "__main__":
    main()
