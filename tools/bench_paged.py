#!/usr/bin/env python
"""Microbench: ops/paged_texture.paged_sample on TPU at 1080p.

Coherent uv/layer fields shaped like a real frame (screen-space uv
gradients, region-constant layers, density-driven mips). Compares the
paged Pallas sampler (C fused channels) against C per-channel
sample_pool gathers.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from chord_tpu.ops import texture as tex_ops
from chord_tpu.ops.paged_texture import (pack_paged_pool, paged_pool_bytes,
                                         paged_sample)

H, W = 1080, 1920
SIZE = 256
LAYERS = 4


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
    mip_sizes, mip_offsets = [], []
    off, s = 0, SIZE
    while s >= 1:
        mip_sizes.append(s)
        mip_offsets.append(off)
        off += s * s
        s //= 2
    total = off
    pool_u8 = rng.integers(0, 255, (LAYERS, total, 4)).astype(np.uint8)
    pages, meta, n_mips = pack_paged_pool(pool_u8, mip_sizes, mip_offsets)
    print(f"pages: {pages.shape} = {pages.nbytes/2**20:.2f} MiB "
          f"(paged_pool_bytes={paged_pool_bytes(pool_u8.shape, mip_sizes)/2**20:.2f})")

    # coherent frame-like fields
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    u = (xx / W * 5.3)
    v = (yy / H * 3.1)
    layer = ((xx // 480) % LAYERS).astype(np.int32)
    mip = np.clip(((yy / H) * 5).astype(np.int32), 0, n_mips - 1)
    lm1 = jnp.asarray(layer)[None]
    lm4 = jnp.stack([jnp.asarray((layer + k) % LAYERS) for k in range(4)])
    uvj = jnp.stack([jnp.asarray(u), jnp.asarray(v)], -1)
    mipj = jnp.asarray(mip)

    for C, lms in ((1, lm1), (4, lm4)):
        for K in (6, 8, 10, 12, 16):
            timed(f"paged C={C} K={K} bh=16",
                  lambda l, uu, mm, K=K: paged_sample(
                      pages, meta, n_mips, mip_sizes, l, uu, mm,
                      block_h=16, k_pages=K), lms, uvj, mipj)
        for bh in (8, 32):
            timed(f"paged C={C} K=10 bh={bh}",
                  lambda l, uu, mm, bh=bh: paged_sample(
                      pages, meta, n_mips, mip_sizes, l, uu, mm,
                      block_h=bh, k_pages=10), lms, uvj, mipj)

    pool_j = jnp.asarray(pool_u8)
    timed("sample_pool x1 (gather path)",
          lambda l, uu, mm: tex_ops.sample_pool(
              pool_j, tuple(mip_sizes), tuple(mip_offsets),
              l[0], uu, mm), lm1, uvj, mipj)


if __name__ == "__main__" and "--coverage" not in sys.argv:
    main()


def coverage_check():
    """Coverage at realistic ~1 texel/px density, 4 distinct layers."""
    rng = np.random.default_rng(0)
    mip_sizes, mip_offsets = [], []
    off, s = 0, SIZE
    while s >= 1:
        mip_sizes.append(s)
        mip_offsets.append(off)
        off += s * s
        s //= 2
    total = off
    pool_u8 = rng.integers(0, 255, (LAYERS, total, 4)).astype(np.uint8)
    pages, meta, n_mips = pack_paged_pool(pool_u8, mip_sizes, mip_offsets)

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for density in (0.5, 1.0, 2.0):
        # mip 0 at `density` texels/px in both axes
        u = xx * density / SIZE
        v = yy * density / SIZE
        layer = ((xx // 480) % LAYERS).astype(np.int32)
        mip = np.zeros((H, W), np.int32)
        lm4 = jnp.stack([jnp.asarray((layer + k) % LAYERS)
                         for k in range(4)])
        uvj = jnp.stack([jnp.asarray(u), jnp.asarray(v)], -1)
        mipj = jnp.asarray(mip)
        for K in (8, 16, 24, 32):
            _, cov = jax.jit(lambda l, uu, mm, K=K: paged_sample(
                pages, meta, n_mips, mip_sizes, l, uu, mm,
                block_h=16, k_pages=K, with_coverage=True))(lm4, uvj, mipj)
            c = np.asarray(cov).mean()
            print(f"density={density} K={K}: coverage {c*100:.2f}%",
                  flush=True)


if __name__ == "__main__" and "--coverage" in sys.argv:
    coverage_check()
    sys.exit(0)
