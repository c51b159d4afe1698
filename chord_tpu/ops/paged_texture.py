"""Paged virtual-texture sampler (Pallas, lane-shuffle gathers).

The TPU-native replacement for bindless texture sampling at full
resolution (reference: lighting.hlsl samples material textures through
descriptor-indexed Bindless(...) arrays; the TPU has no texture units and
XLA's per-pixel gather costs ~12 ms per 1080p index set — measured, see
tools/bench_gather.py). Design:

- Every (layer, mip) image is cut into 32x32-texel PAGES with a one-texel
  apron (31 usable texels per axis, row/col 31 duplicates the neighbor's
  first texel), so a bilinear 2x2 footprint NEVER crosses a page.
- A page is one (8,128) int32 vreg of RGBA8-packed texels
  (slot = sy*32+sx -> sublane slot//128, lane slot%128); the whole pool
  rides in VMEM as a constant-indexed Pallas operand.
- Per (BH,128) pixel block the kernel extracts the K distinct pages the
  block touches (iterated scalar min over the per-pixel page ids), stages
  each into a palette scratch, and resolves all four bilinear taps with
  per-sublane-row 128-lane shuffles (`jnp.take_along_axis` on a
  broadcast row lowers to tpu.dynamic_gather — ~10 cycles/vreg, measured)
  plus vector selects.
- All material channels (base/normal/metal-rough/emissive) share uv, mip
  and image size (the pool normalizes sizes, asset/texture.py), so slot
  math and tap gathers are computed ONCE per page and only the cheap
  page-id compare + select runs per channel.
- Pixels whose page missed the K-palette fall back to a GUARANTEED
  single-page coarse mip (the first mip level that fits one page,
  size <= 16): a palette miss degrades to a blurrier texture sample —
  the same failure direction as trilinear's coarse end — never to a
  flat color. Native-mip coverage is observable via the optional
  coverage output; the per-(layer,mip) average color remains only as
  the final guard for pathological mixed-mip blocks.

Exact-match semantics with ops/texture.py sample_pool (u wraps, taps
clamp, same mip selection) up to the u8 quantization of the filtered
result; tests/test_paged_texture.py gates this against the gather path.
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 32          # stored page edge (texels)
USABLE = 31        # usable texels per axis (1-texel apron)
_BIG = 1 << 30


def _pca_axis(d: np.ndarray) -> np.ndarray:
    """Dominant axis of centered block texels via power iteration.
    d: (B, 16, 4) -> (B, 4) unit axes (zero blocks -> arbitrary unit)."""
    cov = np.einsum("bti,btj->bij", d, d)
    v = np.ones((d.shape[0], 4), np.float64)
    for _ in range(8):
        v = np.einsum("bij,bj->bi", cov, v)
        n = np.linalg.norm(v, axis=1, keepdims=True)
        v = np.where(n > 1e-12, v / np.maximum(n, 1e-12), 1.0)
    return v


def _decode_palette(e0: np.ndarray, e1: np.ndarray) -> np.ndarray:
    """The kernel's exact 4-point decode ramp (pure f32 math so the host
    oracle is bit-identical to the Pallas decode).
    e0/e1: (B, 4) u8-valued -> (B, 4 levels, 4 ch) u8-valued f32."""
    a = e0.astype(np.float32)[:, None, :]
    b = e1.astype(np.float32)[:, None, :]
    k = np.arange(4, dtype=np.float32)[None, :, None]
    ramp = (a * (np.float32(3.0) - k) + b * k).astype(np.float32)
    return np.floor(ramp * np.float32(1.0 / 3.0) + np.float32(0.5))


def compress_page(img32: np.ndarray) -> np.ndarray:
    """(32,32,4) u8 apron page -> (2,128) u32 block-compressed page.

    BC-style 4x4 blocks (reference: the CPU BC1/BC3 texture compressor,
    asset/texture/asset_texture_helper.cpp:24-216): per block, two full
    RGBA8 endpoints on the block's principal color axis + 16 2-bit
    selectors into the 4-point ramp. 12 bytes/block here vs BC3's 16 —
    stored as 3 u32/block padded into 2 (1,128)-vreg rows, an exact 4x
    footprint cut vs the raw (8,128) RGBA8 page. Selectors are chosen
    nearest-of-4 against the QUANTIZED ramp (the same f32 decode math the
    kernel applies), so the encoder is optimal given its endpoints.

    Layout: row0 lanes [0..63] = endpoint0 RGBA8 per block, lanes
    [64..127] = endpoint1; row1 lanes [0..63] = 16x2-bit selectors
    (texel t = (sy%4)*4 + sx%4 at bits 2t), lanes [64..127] = 0."""
    blocks = (img32.reshape(8, 4, 8, 4, 4).transpose(0, 2, 1, 3, 4)
              .reshape(64, 16, 4).astype(np.float64))
    mean = blocks.mean(1, keepdims=True)
    d = blocks - mean
    axis = _pca_axis(d)
    proj = np.einsum("bti,bi->bt", d, axis)
    pmin = proj.min(1)
    pmax = proj.max(1)
    e0 = np.clip(np.round(mean[:, 0] + axis * pmin[:, None]), 0, 255)
    e1 = np.clip(np.round(mean[:, 0] + axis * pmax[:, None]), 0, 255)
    pal = _decode_palette(e0, e1)                        # (64,4,4)
    err = ((blocks[:, :, None, :] - pal[:, None, :, :]) ** 2).sum(-1)
    sel = err.argmin(-1).astype(np.uint32)               # (64,16)
    e0u = e0.astype(np.uint32)
    e1u = e1.astype(np.uint32)
    pack = lambda e: (e[:, 0] | (e[:, 1] << 8) | (e[:, 2] << 16) |
                      (e[:, 3] << 24))
    selw = (sel << (2 * np.arange(16, dtype=np.uint32))[None]).sum(
        1, dtype=np.uint32)
    out = np.zeros((2, 128), np.uint32)
    out[0, :64] = pack(e0u)
    out[0, 64:] = pack(e1u)
    out[1, :64] = selw
    return out


def decompress_page(comp: np.ndarray) -> np.ndarray:
    """NumPy oracle for the kernel's page decode: (2,128) u32 ->
    (32,32,4) u8."""
    e0w = comp[0, :64]
    e1w = comp[0, 64:]
    selw = comp[1, :64]
    unpack = lambda w: np.stack([(w >> s) & 255 for s in (0, 8, 16, 24)],
                                -1).astype(np.float64)
    pal = _decode_palette(unpack(e0w), unpack(e1w))      # (64,4,4)
    t = np.arange(16, dtype=np.uint32)
    sel = (selw[:, None] >> (2 * t)[None]) & 3           # (64,16)
    tex = pal[np.arange(64)[:, None], sel]               # (64,16,4)
    return (tex.reshape(8, 8, 4, 4, 4).transpose(0, 2, 1, 3, 4)
            .reshape(32, 32, 4).astype(np.uint8))


def pack_paged_pool(pool_u8: np.ndarray, mip_sizes: Sequence[int],
                    mip_offsets: Sequence[int], compress: bool = False):
    """(L, total, 4) u8 flat-mip stack -> (pages (N*8,128) i32,
    meta (2, E_pad) i32 [page base | avg RGBA8], n_mips).

    With compress=True, pages are block-compressed (2,128)-u32 units
    (compress_page) — 4x smaller — and meta grows a third (zero) row:
    the kernel detects the format from meta.shape[0].

    Entry id = layer * n_mips + mip; pages are stored entry-major."""
    n_layers = pool_u8.shape[0]
    n_mips = len(mip_sizes)
    entries = n_layers * n_mips
    e_pad = max((entries + 127) // 128 * 128, 128)
    base = np.zeros(e_pad, np.int32)
    avg = np.zeros(e_pad, np.uint32)
    pages: List[np.ndarray] = []
    for layer in range(n_layers):
        for m, (s, off) in enumerate(zip(mip_sizes, mip_offsets)):
            img = pool_u8[layer, off:off + s * s].reshape(s, s, 4)
            packed = (img[..., 0].astype(np.uint32) |
                      (img[..., 1].astype(np.uint32) << 8) |
                      (img[..., 2].astype(np.uint32) << 16) |
                      (img[..., 3].astype(np.uint32) << 24))
            e = layer * n_mips + m
            base[e] = len(pages)
            a = img.reshape(-1, 4).mean(0).astype(np.uint32)
            avg[e] = a[0] | (a[1] << 8) | (a[2] << 16) | (a[3] << 24)
            tcnt = _tiles(s)
            # clamped apron sampling (taps clamp to s-1, sample_pool parity)
            idx = np.minimum(np.arange(TILE), s - 1)
            for ty in range(tcnt):
                gy = np.minimum(ty * USABLE + idx, s - 1)
                for tx in range(tcnt):
                    gx = np.minimum(tx * USABLE + idx, s - 1)
                    page = packed[np.ix_(gy, gx)]
                    if compress:
                        rgba = np.stack(
                            [(page >> sh) & 255 for sh in (0, 8, 16, 24)],
                            -1).astype(np.uint8)
                        pages.append(compress_page(rgba))
                    else:
                        pages.append(page.reshape(8, 128))
    rows = 2 if compress else 8
    if not pages:
        pages.append(np.zeros((rows, 128), np.uint32))
    pages_np = np.concatenate(pages, 0).astype(np.uint32).view(np.int32)
    meta_rows = [base, avg.view(np.int32)]
    if compress:
        meta_rows.append(np.zeros(e_pad, np.int32))   # format marker row
    meta = np.stack(meta_rows)
    return jnp.asarray(pages_np), jnp.asarray(meta), n_mips


def _tiles(s: int) -> int:
    return 1 if s <= USABLE else -(-s // USABLE)


def paged_pool_bytes(tex_pool_shape, mip_sizes, compress=False) -> int:
    """Pages footprint for a (L, total, 4) pool (VMEM budget check)."""
    per_layer = sum(_tiles(s) ** 2 for s in mip_sizes)
    page_bytes = 2 * 128 * 4 if compress else TILE * TILE * 4
    return tex_pool_shape[0] * per_layer * page_bytes


def _gat_row(row: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """128-lane shuffle: out[..., j] = row[idx[..., j]] (dim-1
    tpu.dynamic_gather on a broadcast row)."""
    return jnp.take_along_axis(
        jnp.broadcast_to(row.reshape(1, 128), idx.shape), idx, axis=1)


def _meta_gather(meta_row: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Chunked entry-table lookup: (E_pad,) table x (BH,128) i32 ids."""
    e_pad = meta_row.shape[0]
    out = jnp.zeros(ids.shape, jnp.int32)
    idx_in = jnp.clip(ids, 0, e_pad - 1)
    chunk = idx_in // 128
    lane = idx_in % 128
    for c in range(e_pad // 128):
        g = _gat_row(meta_row[c * 128:(c + 1) * 128], lane)
        out = jnp.where(chunk == c, g, out)
    return out


def _stage_page(pages_ref, pal_ref, curc, compressed):
    """Copy (raw) or decode (block-compressed) page `curc` of the pool
    into the (8,128) RGBA8 palette scratch. The compressed decode runs
    ONCE per staged page — the per-tap gather path below never changes —
    so compression costs ~3 lane-shuffles + ~40 (8,128) vector ops per
    page against a 4x cut in pool footprint and stage DMA bytes."""
    if not compressed:
        pal_ref[...] = pages_ref[pl.ds(curc * 8, 8), :]
        return
    comp = pages_ref[pl.ds(curc * 2, 2), :]
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    # output slot (row, lane) holds texel (sy = row*4 + lane//32,
    # sx = lane%32) -> block bi = (sy//4)*8 + sx//4 = row*8 + (lane%32)//4
    bi = row * 8 + (lane % 32) // 4
    e0 = _gat_row(comp[0], bi)
    e1 = _gat_row(comp[0], bi + 64)
    sw = _gat_row(comp[1], bi)
    t = (lane // 32) * 4 + (lane % 4)
    sel = ((sw >> (2 * t)) & 3).astype(jnp.float32)
    out = jnp.zeros((8, 128), jnp.int32)
    for sh in (0, 8, 16, 24):
        a = ((e0 >> sh) & 255).astype(jnp.float32)
        b = ((e1 >> sh) & 255).astype(jnp.float32)
        val = jnp.floor((a * (3.0 - sel) + b * sel) * (1.0 / 3.0)
                        + 0.5).astype(jnp.int32)
        out = out | (val << sh)
    pal_ref[...] = out


def _paged_kernel(meta_ref, pages_ref, u_ref, v_ref, mip_ref, lm_ref,
                  *refs, n_mips, mip_sizes, K, C, bilinear, want_cov,
                  compressed=False):
    out_ref = refs[0]
    cov_ref = refs[1] if want_cov else None
    pal_ref = refs[-1]
    bh = u_ref.shape[0]
    n_pages = pages_ref.shape[0] // (2 if compressed else 8)

    # --- static per-mip size / tile-count via select chain (no gather) ---
    mip = jnp.clip(mip_ref[...], 0, n_mips - 1)
    size = jnp.full((bh, 128), mip_sizes[0], jnp.int32)
    tx_cnt = jnp.full((bh, 128), _tiles(mip_sizes[0]), jnp.int32)
    for m in range(1, n_mips):
        size = jnp.where(mip == m, mip_sizes[m], size)
        tx_cnt = jnp.where(mip == m, _tiles(mip_sizes[m]), tx_cnt)
    sf = size.astype(jnp.float32)

    # --- shared tap coordinates (u wraps, taps clamp: sample_pool parity)
    u = u_ref[...]
    v = v_ref[...]
    x = (u - jnp.floor(u)) * sf
    y = (v - jnp.floor(v)) * sf
    if bilinear:
        x0f = jnp.floor(x - 0.5)
        y0f = jnp.floor(y - 0.5)
        fx = x - 0.5 - x0f
        fy = y - 0.5 - y0f
    else:
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        fx = fy = None
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    bx0 = jnp.clip(x0, 0, size - 1)
    by0 = jnp.clip(y0, 0, size - 1)
    # tile index: floor((b + .5)/USABLE) == b // USABLE exactly (b < 2^10)
    tx = ((bx0.astype(jnp.float32) + 0.5) *
          (1.0 / USABLE)).astype(jnp.int32)
    ty = ((by0.astype(jnp.float32) + 0.5) *
          (1.0 / USABLE)).astype(jnp.int32)
    sx0 = bx0 - tx * USABLE
    sy0 = by0 - ty * USABLE
    tile_in = ty * tx_cnt + tx
    if bilinear:
        sx1 = jnp.clip(x0 + 1, 0, size - 1) - tx * USABLE
        sy1 = jnp.clip(y0 + 1, 0, size - 1) - ty * USABLE
        slots = (sy0 * TILE + sx0, sy0 * TILE + sx1,
                 sy1 * TILE + sx0, sy1 * TILE + sx1)
    else:
        slots = (sy0 * TILE + sx0,)
    srows = [s >> 7 for s in slots]
    scols = [s & 127 for s in slots]

    # --- per-channel page ids ---
    meta_base = meta_ref[0]
    meta_avg = meta_ref[1]
    lms = [lm_ref[c] for c in range(C)]
    tiles = []
    for c in range(C):
        page = _meta_gather(meta_base, lms[c]) + tile_in
        tiles.append(jnp.where(lms[c] < 0, _BIG, page))
    remaining = jnp.stack(tiles)             # (C, bh, 128)

    # --- guaranteed fallback: first mip that fits ONE page (size<=16,
    # never finer than the requested mip) — palette misses sample this
    # instead of flat average color ---
    fb_idx = next((m for m, s in enumerate(mip_sizes) if s <= 16),
                  n_mips - 1)
    fb_mip = jnp.maximum(mip, fb_idx)
    fb_size = jnp.full((bh, 128), mip_sizes[fb_idx], jnp.int32)
    for m in range(fb_idx + 1, n_mips):
        fb_size = jnp.where(fb_mip == m, mip_sizes[m], fb_size)
    fsf = fb_size.astype(jnp.float32)
    fxr = (u - jnp.floor(u)) * fsf
    fyr = (v - jnp.floor(v)) * fsf
    if bilinear:
        fx0f = jnp.floor(fxr - 0.5)
        fy0f = jnp.floor(fyr - 0.5)
        ffx = fxr - 0.5 - fx0f
        ffy = fyr - 0.5 - fy0f
    else:
        fx0f = jnp.floor(fxr)
        fy0f = jnp.floor(fyr)
        ffx = ffy = None
    fx0 = fx0f.astype(jnp.int32)
    fy0 = fy0f.astype(jnp.int32)
    fbx0 = jnp.clip(fx0, 0, fb_size - 1)
    fby0 = jnp.clip(fy0, 0, fb_size - 1)
    if bilinear:
        fbx1 = jnp.clip(fx0 + 1, 0, fb_size - 1)
        fby1 = jnp.clip(fy0 + 1, 0, fb_size - 1)
        fb_slots = (fby0 * TILE + fbx0, fby0 * TILE + fbx1,
                    fby1 * TILE + fbx0, fby1 * TILE + fbx1)
    else:
        fb_slots = (fby0 * TILE + fbx0,)
    fb_srows = [s >> 7 for s in fb_slots]
    fb_scols = [s & 127 for s in fb_slots]

    # --- K distinct pages: stage + resolve (unrolled) ---
    n_taps = len(slots)
    acc = [[jnp.zeros((bh, 128), jnp.int32) for _ in range(n_taps)]
           for _ in range(C)]
    covered = [jnp.zeros((bh, 128), jnp.bool_) for _ in range(C)]
    for k in range(K):
        cur = jnp.min(remaining)
        curc = jnp.minimum(cur, n_pages - 1)
        _stage_page(pages_ref, pal_ref, curc, compressed)
        pal = pal_ref[...]
        # shared tap gathers for page k (8 sublane rows x taps)
        taps = []
        for t in range(n_taps):
            tex = jnp.zeros((bh, 128), jnp.int32)
            for r in range(8):
                g = _gat_row(pal[r], scols[t])
                tex = jnp.where(srows[t] == r, g, tex)
            taps.append(tex)
        live = cur < _BIG
        for c in range(C):
            hit = (tiles[c] == cur) & live
            covered[c] = covered[c] | hit
            for t in range(n_taps):
                acc[c][t] = jnp.where(hit, taps[t], acc[c][t])
        remaining = jnp.where(remaining == cur, _BIG, remaining)

    # --- fallback pages: <=C distinct single-page coarse mips ---
    fb_tiles = []
    for c in range(C):
        fbe = lms[c] - mip + fb_mip
        page = _meta_gather(meta_base, fbe)
        fb_tiles.append(jnp.where((lms[c] < 0) | covered[c], _BIG, page))
    fb_remaining = jnp.stack(fb_tiles)
    fb_acc = [[jnp.zeros((bh, 128), jnp.int32) for _ in range(n_taps)]
              for _ in range(C)]
    fb_covered = [jnp.zeros((bh, 128), jnp.bool_) for _ in range(C)]
    # distinct fallback pages are bounded by distinct LAYERS in the
    # block (not channels); C+4 covers realistic material density, the
    # average color remains the guard beyond that
    for k in range(C + 4):
        cur = jnp.min(fb_remaining)
        curc = jnp.minimum(cur, n_pages - 1)
        _stage_page(pages_ref, pal_ref, curc, compressed)
        pal = pal_ref[...]
        taps = []
        for t in range(n_taps):
            tex = jnp.zeros((bh, 128), jnp.int32)
            for r in range(8):
                g = _gat_row(pal[r], fb_scols[t])
                tex = jnp.where(fb_srows[t] == r, g, tex)
            taps.append(tex)
        live = cur < _BIG
        for c in range(C):
            hit = (fb_tiles[c] == cur) & live
            fb_covered[c] = fb_covered[c] | hit
            for t in range(n_taps):
                fb_acc[c][t] = jnp.where(hit, taps[t], fb_acc[c][t])
        fb_remaining = jnp.where(fb_remaining == cur, _BIG, fb_remaining)

    # --- unpack, filter, repack ---
    def unpack(p):
        return ((p & 255).astype(jnp.float32),
                ((p >> 8) & 255).astype(jnp.float32),
                ((p >> 16) & 255).astype(jnp.float32),
                ((p >> 24) & 255).astype(jnp.float32))

    def bilerp_pack(t4, wx, wy):
        chans = []
        t00, t01, t10, t11 = (unpack(t) for t in t4)
        for i in range(4):
            val = (t00[i] * (1 - wx) * (1 - wy) + t01[i] * wx * (1 - wy)
                   + t10[i] * (1 - wx) * wy + t11[i] * wx * wy)
            chans.append(jnp.clip(val + 0.5, 0, 255).astype(jnp.int32))
        return (chans[0] | (chans[1] << 8) | (chans[2] << 16) |
                (chans[3] << 24))

    for c in range(C):
        if bilinear:
            out = bilerp_pack(acc[c], fx, fy)
            fb_out = bilerp_pack(fb_acc[c], ffx, ffy)
        else:
            out = acc[c][0]
            fb_out = fb_acc[c][0]
        avg_c = _meta_gather(meta_avg, lms[c])
        out = jnp.where(covered[c], out,
                        jnp.where(fb_covered[c], fb_out, avg_c))
        out = jnp.where(lms[c] < 0, jnp.int32(-1), out)
        out_ref[c, :, :] = out
        if want_cov:
            cov_ref[c, :, :] = (covered[c] | (lms[c] < 0)).astype(jnp.int32)


def paged_sample(pages: jnp.ndarray, meta: jnp.ndarray, n_mips: int,
                 mip_sizes: Sequence[int],
                 layers: jnp.ndarray,       # (C,H,W) i32, -1 = untextured
                 uv: jnp.ndarray,           # (H,W,2) f32
                 mip: jnp.ndarray,          # (H,W) i32
                 bilinear: bool = True,
                 block_h: int = 32, k_pages: int = 8,
                 with_coverage: bool = False):
    """-> (C,H,W,4) f32 RGBA in [0,1]; untextured returns 1.0
    (multiplicative identity, sample_pool parity). With with_coverage,
    also returns (C,H,W) bool palette-coverage.

    The pool format is self-describing: a 3-row meta table marks
    block-compressed (2,128) pages (pack_paged_pool compress=True),
    decoded per staged page inside the kernel."""
    C, H, W = layers.shape
    compressed = meta.shape[0] == 3
    hp = -(-H // block_h) * block_h
    wp = -(-W // 128) * 128
    pad2 = ((0, hp - H), (0, wp - W))

    u = jnp.pad(uv[..., 0], pad2)
    v = jnp.pad(uv[..., 1], pad2)
    mipp = jnp.pad(mip, pad2)
    lm = jnp.where(layers >= 0,
                   layers * n_mips + jnp.clip(mip, 0, n_mips - 1)[None],
                   -1)
    lm = jnp.pad(lm, ((0, 0),) + pad2, constant_values=-1)

    grid = (wp // 128, hp // block_h)
    blk = lambda j, i: (i, j)
    blk_c = lambda j, i: (0, i, j)
    full = lambda j, i: (0, 0)
    kern = functools.partial(
        _paged_kernel, n_mips=n_mips, mip_sizes=tuple(mip_sizes),
        K=k_pages, C=C, bilinear=bilinear, want_cov=with_coverage,
        compressed=compressed)
    out_shapes = [jax.ShapeDtypeStruct((C, hp, wp), jnp.int32)]
    out_specs = [pl.BlockSpec((C, block_h, 128), blk_c,
                              memory_space=pltpu.VMEM)]
    if with_coverage:
        out_shapes.append(jax.ShapeDtypeStruct((C, hp, wp), jnp.int32))
        out_specs.append(pl.BlockSpec((C, block_h, 128), blk_c,
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(meta.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(pages.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, block_h, 128), blk_c,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if with_coverage else out_specs[0],
        out_shape=out_shapes if with_coverage else out_shapes[0],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
        # CPU has no Mosaic backend — interpret there (tests/dry runs)
        interpret=jax.default_backend() == "cpu",
    )(meta, pages, u, v, mipp, lm)
    packed = res[0] if with_coverage else res
    packed = packed[:, :H, :W]
    rgba = jnp.stack(
        [(packed & 255), ((packed >> 8) & 255),
         ((packed >> 16) & 255), ((packed >> 24) & 255)],
        axis=-1).astype(jnp.float32) * (1.0 / 255.0)
    if with_coverage:
        return rgba, res[1][:, :H, :W] > 0
    return rgba
