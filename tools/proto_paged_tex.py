#!/usr/bin/env python
"""Prototype: paged texture sampling kernel (dim-1 dynamic_gather).

Pool layout: every (layer, mip) image is cut into 32x32 texel tiles;
each tile is 1024 texels stored as an (8,128) i32-packed-RGBA vreg
(slot = (y%32)*32 + x%32 -> sublane slot//128, lane slot%128). The whole
pool rides in VMEM (constant index map). Per (8,128) pixel block the
kernel finds the K distinct tiles the block needs (mins over the tile-id
vreg), loads each via a dynamic sublane slice, and resolves texels with
per-row dim-1 lane gathers + selects. Pixels beyond the K tiles fall
back to the per-(layer,mip) average color.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 32           # texel tile edge
K = 6               # distinct tiles per pixel block


def build_tiled_pool(images):
    """images: list of (s, s, 4) u8 (one per (layer,mip) entry, any sizes).
    -> pool (n_tiles*8, 128) i32, and per-entry meta arrays:
       base_tile, tiles_x, size, avg_color (i32 packed)."""
    tiles = []
    base_tile, tiles_x, sizes, avgs = [], [], [], []
    for img in images:
        s = img.shape[0]
        base_tile.append(len(tiles))
        tx = max((s + TILE - 1) // TILE, 1)
        tiles_x.append(tx)
        sizes.append(s)
        packed = (img[..., 0].astype(np.uint32) |
                  (img[..., 1].astype(np.uint32) << 8) |
                  (img[..., 2].astype(np.uint32) << 16) |
                  (img[..., 3].astype(np.uint32) << 24))
        avg = img.reshape(-1, 4).mean(0).astype(np.uint32)
        avgs.append(int(avg[0] | (avg[1] << 8) | (avg[2] << 16) |
                        (avg[3] << 24)))
        ty = max((s + TILE - 1) // TILE, 1)
        pad = np.zeros((ty * TILE, tx * TILE), np.uint32)
        pad[:s, :s] = packed
        for iy in range(ty):
            for ix in range(tx):
                t = pad[iy * TILE:(iy + 1) * TILE,
                        ix * TILE:(ix + 1) * TILE]    # (32,32)
                tiles.append(t.reshape(8, 128))       # slot-major
    pool = np.concatenate(tiles, 0).astype(np.uint32).view(np.int32)
    meta = np.zeros((4, 128), np.int32)
    n = len(base_tile)
    assert n <= 128
    meta[0, :n] = base_tile
    meta[1, :n] = tiles_x
    meta[2, :n] = sizes
    meta[3, :n] = np.asarray(avgs, np.uint32).view(np.int32)
    return jnp.asarray(pool), jnp.asarray(meta)


BH = 32             # pixel rows per block: distinct-tile scope


def paged_sample_kernel(meta_ref, pool_ref, u_ref, v_ref, lm_ref,
                        out_ref, cov_ref, pal_ref):
    meta = meta_ref[...]                       # (4,128) i32
    gat = lambda row, ii: jnp.take_along_axis(
        jnp.broadcast_to(row.reshape(1, 128), ii.shape), ii, axis=1)
    BIG = jnp.int32(1 << 30)
    n_tiles = pool_ref.shape[0] // 8
    SB = BH // 8

    # ---- whole-block index math (BH,128) ----
    u = u_ref[...]
    v = v_ref[...]
    lm = lm_ref[...]
    lmc = jnp.clip(lm, 0, 127)
    base = gat(meta[0], lmc)
    tx_cnt = gat(meta[1], lmc)
    size = gat(meta[2], lmc)
    avg = gat(meta[3], lmc)
    sf = size.astype(jnp.float32)
    xt = jnp.clip((u % 1.0 * sf).astype(jnp.int32), 0, size - 1)
    yt = jnp.clip((v % 1.0 * sf).astype(jnp.int32), 0, size - 1)
    tile = base + (yt // TILE) * tx_cnt + (xt // TILE)
    slot = (yt % TILE) * TILE + (xt % TILE)
    srow = slot // 128
    scol = slot % 128
    tile = jnp.where(lm < 0, BIG, tile)

    # ---- K distinct tiles -> palette scratch (K*8, 128) ----
    remaining = tile
    page_ids = []
    for k in range(K):
        cur = jnp.min(remaining)               # scalar sync point
        curc = jnp.minimum(cur, n_tiles - 1)
        pal_ref[pl.ds(k * 8, 8), :] = pool_ref[pl.ds(curc * 8, 8), :]
        page_ids.append(cur)
        remaining = jnp.where(remaining == cur, BIG, remaining)

    # ---- resolve: static palette rows, vector selects ----
    pal = pal_ref[...]                         # (K*8, 128)
    out = jnp.zeros((BH, 128), jnp.int32)
    covered = jnp.zeros((BH, 128), jnp.bool_)
    for k in range(K):
        hit = tile == page_ids[k]
        texel = jnp.zeros((BH, 128), jnp.int32)
        for r in range(8):
            row = pal[k * 8 + r]
            t = gat(row, scol)
            texel = jnp.where(srow == r, t, texel)
        out = jnp.where(hit, texel, out)
        covered = covered | hit
    covered = covered & (tile < BIG)

    out = jnp.where(covered, out, avg)
    out_ref[...] = jnp.where(lm < 0, jnp.int32(-1), out)
    cov_ref[...] = (covered | (lm < 0)).astype(jnp.int32)


def paged_sample(pool, meta, u, v, lm):
    h, w = u.shape
    assert h % BH == 0
    grid = (w // 128, h // BH)   # pool/meta constant across the whole grid
    blk = lambda j, i: (i, j)
    full = lambda j, i: (0, 0)
    out, cov = pl.pallas_call(
        paged_sample_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, 128), full, memory_space=pltpu.VMEM),
            pl.BlockSpec(pool.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec((BH, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((BH, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((BH, 128), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((BH, 128), blk, memory_space=pltpu.VMEM),
                   pl.BlockSpec((BH, 128), blk, memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.int32),
                   jax.ShapeDtypeStruct((h, w), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((K * 8, 128), jnp.int32)],
    )(meta, pool, u, v, lm)
    return out, cov


def main():
    rng = np.random.default_rng(0)
    # build a pool: 4 layers x mips 256..1
    images = []
    entries = []
    for layer in range(4):
        s = 256
        mips = []
        while s >= 1:
            mips.append(rng.integers(0, 255, (s, s, 4)).astype(np.uint8))
            s //= 2
        entries.append(mips)
    MIPS = len(entries[0])
    flat = [m for ms in entries for m in ms]
    pool, meta = build_tiled_pool(flat)
    print(f"pool: {pool.shape} = {pool.nbytes/2**20:.2f} MiB")

    H, W = 1080 // BH * BH, 1920
    # synthetic uv field: smooth gradient + per-region layers (coherent,
    # like a real frame); mip from density
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    u = (xx / W * 3.1) % 1.0
    v = (yy / H * 1.7) % 1.0
    layer = ((xx // 480) % 4).astype(np.int32)
    mip = np.full((H, W), 2, np.int32)   # 256/4=64 texels across ~crisp
    lm = layer * MIPS + mip
    lm[:, :64] = -1                      # untextured strip

    uj = jnp.asarray(u); vj = jnp.asarray(v); lmj = jnp.asarray(lm)
    f = jax.jit(lambda uu, vv, ll: paged_sample(pool, meta, uu, vv, ll))
    out, cov = f(uj, vj, lmj)
    out_np = np.asarray(out); cov_np = np.asarray(cov)

    # NumPy oracle (nearest)
    sizes = np.asarray([max(256 >> m, 1) for m in range(MIPS)])
    ref = np.zeros((H, W), np.uint32)
    for l in range(4):
        for m in range(MIPS):
            mask = (layer == l) & (mip == m) & (lm >= 0)
            if not mask.any():
                continue
            s = sizes[m]
            img = entries[l][m]
            xt = np.clip((u[mask] % 1.0 * s).astype(np.int64), 0, s - 1)
            yt = np.clip((v[mask] % 1.0 * s).astype(np.int64), 0, s - 1)
            px = img[yt, xt].astype(np.uint32)
            ref[mask] = (px[:, 0] | (px[:, 1] << 8) |
                         (px[:, 2] << 16) | (px[:, 3] << 24))
    refi = ref.view(np.int32)
    tex_px = lm >= 0
    good = cov_np[tex_px] > 0
    match = out_np[tex_px][good] == refi[tex_px][good]
    print(f"covered: {good.mean()*100:.2f}%  "
          f"exact-match among covered: {match.mean()*100:.3f}%")
    assert (out_np[~tex_px] == -1).all()

    # timing
    t0 = time.time()
    for _ in range(8):
        out, cov = f(uj, vj, lmj)
    jax.device_get(out[:1, :1])
    ms = (time.time() - t0) / 8 * 1000
    print(f"paged sample 1080p: {ms:.2f} ms")


if __name__ == "__main__":
    main()
