"""Slot-indexed row-table fetch (Pallas, lane-shuffle bank sweep).

The frame's per-pixel material lookups all share one shape: a (H,W)
int32 visibility SLOT indexes a tiny per-draw row table of 16 f32/i32
channels — material constants, texture ids, alpha cutoffs (shading.py
mat_table / masked_alpha_keep / shade_blend_layer). As XLA gathers
these cost ~2.3 ms/frame EACH at render res on the axon TPU (the
"16-wide fast path" — chained scalar gathers are 10x worse still);
three of them ran per all-features frame.

Kernel design (a refinement of the ops/paged_texture.py distinct-page
sweep — that kernel's per-iteration `jnp.min` vector->scalar reduction
measured ~0.25 ms per sweep step here, so the sweep is replaced by a
bank presence BITMAP):

- The whole table rides in VMEM as (nb*16, 128) int32: bank b holds
  rows [b*128, (b+1)*128), sublane = channel, lane = row-in-bank.
- Per (BH, 128) pixel block, slots split hi=slot>>7 (bank) /
  lo=slot&127 (lane). TWO or-reductions build a 64-bank presence
  bitmap (the only vector->scalar syncs in the block), then a dynamic
  fori over banks executes, pl.when-gated on a scalar bit test, 16
  channel row-shuffles (take_along_axis on a broadcast row lowers to
  tpu.dynamic_gather, ~10 cycles/vreg) + hit selects for PRESENT banks
  only. Screen blocks are draw-coherent (~1-4 banks), absent banks
  cost a scalar shift+test.
- EXACT for every slot (all present banks are visited — no palette
  cap, no fallback); negative slots clamp to row 0, matching the
  callers' jnp.maximum(slot, 0).

Values move as int32 bit patterns end to end (no f32 math), so any
32-bit dtype round-trips bit-exact. Tables arrive CHANNEL-MAJOR
(16, N): building them that way is free for the callers (stack of
per-channel columns instead of concat of rows) and avoids a measured
2.6 ms (nb,128,16)->(nb,16,128) lane transpose per call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 16          # pixel block height (two f32 vregs of slots)
CH = 16          # table row width
MAX_BANKS = 256  # 8 i32 presence words -> tables up to 32768 rows


def _gat_row(row: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[..., j] = row[idx[..., j]] (128-lane tpu.dynamic_gather)."""
    return jnp.take_along_axis(
        jnp.broadcast_to(row.reshape(1, 128), idx.shape), idx, axis=1)


def _or_reduce(x: jnp.ndarray) -> jnp.ndarray:
    """Bitwise-or reduce (BH,128) i32 -> scalar via log2 folds
    (sublane halving + lane rotates; one scalar read at the end)."""
    r = x
    while r.shape[0] > 1:
        half = r.shape[0] // 2
        r = r[:half] | r[half:]
    k = 1
    while k < 128:
        r = r | jnp.roll(r, k, axis=1)
        k *= 2
    return r[0, 0]


def _kernel(table_ref, slot_ref, out_ref, *, nb):
    s = jnp.maximum(slot_ref[...], 0)             # (BH,128) i32
    hi = s >> 7
    lo = s & 127
    # bank presence bitmap, one 32-bank word per or-reduce: the block's
    # only vector->scalar syncs (ceil(nb/32) of them)
    one = jnp.int32(1)
    words = []
    for wd in range((nb + 31) // 32):
        in_w = (hi >= wd * 32) & (hi < (wd + 1) * 32)
        words.append(_or_reduce(
            jnp.where(in_w, one << jnp.clip(hi - wd * 32, 0, 31), 0)))

    for c in range(CH):
        out_ref[c, :, :] = jnp.zeros((BH, 128), jnp.int32)

    def body(b, _):
        sh = jnp.maximum(b - (len(words) - 1) * 32, 0) if len(words) \
            else b
        bit = (words[-1] >> sh) & 1
        for wd in range(len(words) - 2, -1, -1):
            bit = jnp.where(b < (wd + 1) * 32,
                            (words[wd] >> jnp.maximum(b - wd * 32, 0)) & 1,
                            bit)

        @pl.when(bit == 1)
        def _bank():
            bank = table_ref[pl.ds(b * CH, CH), :]   # (16,128)
            hit = hi == b
            for c in range(CH):
                out_ref[c, :, :] = jnp.where(
                    hit, _gat_row(bank[c], lo), out_ref[c, :, :])
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


def pack_table(columns) -> jnp.ndarray:
    """Stack 16 per-row columns ((N,) arrays, f32 or i32; missing ->
    zero-filled) into the (16, N) channel-major table gather_rows
    takes. Shorter lists pad with zero channels."""
    n = columns[0].shape[0]

    def to32(c):
        # bit-exact contract (ADVICE r4): integer columns convert to
        # int32 directly — routing an int64/int16 id column through
        # f32 would silently lose integer exactness above 2^24
        if c.dtype in (jnp.int32, jnp.uint32, jnp.float32):
            return jax.lax.bitcast_convert_type(c, jnp.int32)
        if jnp.issubdtype(c.dtype, jnp.integer):
            return c.astype(jnp.int32)
        return jax.lax.bitcast_convert_type(c.astype(jnp.float32),
                                            jnp.int32)

    cols = [to32(c) for c in columns]
    cols += [jnp.zeros((n,), jnp.int32)] * (CH - len(cols))
    return jnp.stack(cols, 0)


def gather_rows(table_cm: jnp.ndarray, slot: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """table_cm (16, N) i32 bit patterns (see pack_table) x slot (H, W)
    i32 (negatives clamp to row 0) -> (16, H, W) i32 planes, exact.

    Callers bitcast individual planes back to their dtypes
    (jax.lax.bitcast_convert_type(out[c], jnp.float32))."""
    ch, n = table_cm.shape
    assert ch == CH, table_cm.shape
    h, w = slot.shape
    nb = max(-(-n // 128), 1)
    assert nb <= MAX_BANKS, (n, "table too large for the bank bitmap")
    tp = jnp.zeros((CH, nb * 128), jnp.int32).at[:, :n].set(table_cm)
    # bank-major: (CH, nb, 128) -> (nb*CH, 128); lane dim stays intact
    tp = tp.reshape(CH, nb, 128).transpose(1, 0, 2).reshape(nb * CH, 128)
    hp = -(-h // BH) * BH
    wp = -(-w // 128) * 128
    sp = jnp.pad(slot, ((0, hp - h), (0, wp - w)))
    grid = (wp // 128, hp // BH)
    out = pl.pallas_call(
        functools.partial(_kernel, nb=nb),
        grid=grid,
        in_specs=[
            pl.BlockSpec(tp.shape, lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BH, 128), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CH, BH, 128), lambda j, i: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CH, hp, wp), jnp.int32),
        interpret=interpret,
    )(tp, sp)
    return out[:, :h, :w]
