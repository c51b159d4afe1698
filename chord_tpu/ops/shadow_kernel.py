"""PCSS shadow evaluation as a Pallas TPU kernel.

TPU-native replacement for `ops/shadow.py:evaluate_shadow`'s XLA gather
chain (reference: install/resource/shader/pcss.hlsl:33-92 — blocker
search + penumbra estimation + variable-radius PCF). The pure-XLA eval
expresses its 11 taps as per-pixel gathers into the flat (N*R*R) cascade
stack; on the tunneled TPU those gathers both fuse pathologically (the
round-2/3 "TPU worker crashed" kernel faults) and run on the slow scalar
path. This kernel removes the gather primitive entirely:

- The eval-res screen is cut into 32x32-pixel TILES (one (8,128) vreg
  block per tile). Screen-adjacent receivers are light-space-adjacent,
  so a whole tile's taps land in a small shadow-map window.
- A prepass (plain vector XLA, no gathers) picks ONE cascade per tile —
  the finest cascade containing every lit receiver in the tile (the
  reference selects per pixel; per tile costs a slightly coarser
  penumbra across cascade seams and nothing else, since any containing
  cascade is geometrically exact) — plus a decimation LEVEL from the
  tile's light-space bbox so even horizon tiles with huge depth spread
  fit a fixed window.
- Per tile the kernel DMAs a (128, 256)-texel window of the selected
  cascade level into VMEM and resolves every tap with ONE-HOT MATMULS:
  row select = (128,128) one-hot @ window on the MXU, column select =
  one-hot multiply + lane reduce on the VPU. Zero gathers, zero
  scatters, fully dense — nothing for XLA to mis-fuse and nothing on
  the scalar path.

Level pyramid: levels are stride-2/4/8 decimations of the map (nearest,
i.e. exact original depth samples, sparser) — a tile only degrades to a
coarser level when its own footprint is so large that PCSS taps are
sparse relative to it anyway.

Exactness: for a tile whose pixels all select the same cascade and fit
level 0, the kernel computes bit-identical taps to evaluate_shadow
(same truncation, same clamping, same compare); tests/test_shadow.py
gates this. Tiles that span cascades or decimate differ only in tap
*placement*, never in the shadow geometry; the ray-cast oracle gate
(tests slow tier) covers those.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .shadow import _POISSON, ShadowConfig

TH = 32            # tile edge (eval-res pixels); 32*32 = one (8,128) block
WIN_H = 128        # window rows (v, level texels)
WIN_W = 384        # window cols (u, level texels)
# DMA origins must stay (8,128)-tile-aligned, so only part of the window
# is GUARANTEED coverage (origin may sit up to one alignment quantum
# below the requested start):
COV_H = WIN_H - 8
COV_W = WIN_W - 128
_PCF_RMAX = 16.0   # matches evaluate_shadow's jnp.clip(pcf_r, 1, 16)


def n_levels_for(r: int) -> int:
    """Level count such that the COARSEST level provably fits the
    (WIN_H, WIN_W) window for any tile bbox (ADVICE r4: the fixed
    4-level pyramid could clamp taps at R >= 1024 horizon tiles):
    need (COV_H - 2) * 2^(levels-1) >= r."""
    import math
    lmax = max(3, math.ceil(math.log2(max(r / (COV_H - 2), 1.0))))
    return lmax + 1


def _tap_margin(cfg: ShadowConfig) -> float:
    """Max |tap offset| in full-res texels (blocker search radius vs the
    clamped PCF radius times the widest disk ring)."""
    return max(cfg.pcf_radius_px * 3.0, 2.0 * _PCF_RMAX) + 2.0


def build_levels(shadow_maps: jnp.ndarray, n_levels: int = 4):
    """(N,R,R) -> stride pyramid [s=1, 2, 4, ...]; small levels are
    edge-padded to >= (WIN_H, WIN_W) so a DMA window always exists.
    Nearest decimation keeps exact depth values (no filtering across
    occluder edges)."""
    n_c, r, _ = shadow_maps.shape
    lvls = []
    for s in [1 << l for l in range(n_levels)]:
        # one-hot dot decimation (exact: single unit weight per row/col;
        # the reshape+unit-index form measured ~2.3 ms/frame across the
        # pyramid, [::s] strided-slice gathers 2-4x worse still)
        if s == 1:
            lv = shadow_maps
        else:
            rs = r // s
            sel_h = jnp.zeros((rs, r), jnp.float32).at[
                jnp.arange(rs), jnp.arange(rs) * s].set(1.0)
            hi = jax.lax.Precision.HIGHEST
            lv = jnp.einsum("Hh,nhw,wW->nHW", sel_h, shadow_maps,
                            sel_h.T, precision=hi)
        if lv.shape[2] < WIN_W:
            lv = jnp.pad(lv, ((0, 0), (0, 0), (0, WIN_W - lv.shape[2])),
                         mode="edge")
        if lv.shape[1] < WIN_H:
            lv = jnp.pad(lv, ((0, 0), (0, WIN_H - lv.shape[1]), (0, 0)),
                         mode="edge")
        lvls.append(lv)
    return lvls


def _tileify(x: jnp.ndarray, hp: int, wp: int) -> jnp.ndarray:
    """(h,w) -> (nT*8, 128): pad to (hp,wp), cut into 32x32 tiles, each
    tile row-major flattened into one (8,128) block."""
    h, w = x.shape
    x = jnp.pad(x, ((0, hp - h), (0, wp - w)))
    ht, wt = hp // TH, wp // TH
    x = x.reshape(ht, TH, wt, TH).transpose(0, 2, 1, 3)   # (ht,wt,32,32)
    return x.reshape(ht * wt * 8, 128)


def _untileify(x: jnp.ndarray, hp: int, wp: int, h: int, w: int):
    ht, wt = hp // TH, wp // TH
    x = x.reshape(ht, wt, TH, TH).transpose(0, 2, 1, 3).reshape(hp, wp)
    return x[:h, :w]


def _tile_reduce(x: jnp.ndarray, op, hp: int, wp: int) -> jnp.ndarray:
    """padded (hp,wp) plane -> per-tile reduction (ht*wt,)."""
    ht, wt = hp // TH, wp // TH
    x = x.reshape(ht, TH, wt, TH)
    return op(op(x, 3), 1).reshape(ht * wt)


def _rot_offsets(cfg: ShadowConfig):
    """Static Poisson offsets (pre-scaled), matching evaluate_shadow."""
    search_r = cfg.pcf_radius_px * 3.0
    blk = [(_POISSON[s % len(_POISSON)] * search_r).astype(np.float32)
           for s in range(cfg.pcss_blocker_samples)]
    pcf = [(_POISSON[s % len(_POISSON)] *
            (1.0 + s / cfg.pcss_pcf_samples)).astype(np.float32)
           for s in range(cfg.pcss_pcf_samples)]
    return blk, pcf


def _pcss_kernel(tab_ref, u_ref, v_ref, zc_ref, zr_ref, ca_ref, sa_ref,
                 fp_ref, *refs, cfg: ShadowConfig, r: int,
                 n_levels: int):
    """One grid step = one 32x32 tile.

    tab_ref (SMEM, prefetched): per-tile i32 [cascade, level, oy, ox]
    (origins in level texels). u/v: full-res texel coords; zc: biased
    receiver depth (compare value); zr: receiver depth; ca/sa: per-pixel
    Poisson rotation; fp: per-tile f32 params on lane 0.. [k_pen].
    refs: n_levels pyramid level arrays (compiler-placed, DMA'd per
    tile) followed by out_ref and the scratch (win_ref, sem).
    """
    lrefs = refs[:n_levels]
    out_ref, win_ref, sem = refs[n_levels:]
    t = pl.program_id(0)
    casc = tab_ref[t, 0]
    li = tab_ref[t, 1]
    # origins are (8,128)-aligned by the prepass; tell Mosaic so the
    # window DMA slice provably starts on a tile boundary
    oy = pl.multiple_of(tab_ref[t, 2], 8)
    ox = pl.multiple_of(tab_ref[t, 3], 128)

    # --- stage the cascade window (one predicated DMA per level) ---
    for l_s, lref in enumerate(lrefs):
        @pl.when(li == l_s)
        def _(lref=lref):
            cp = pltpu.make_async_copy(
                lref.at[casc, pl.ds(oy, WIN_H), pl.ds(ox, WIN_W)],
                win_ref, sem)
            cp.start()
            cp.wait()
    win = win_ref[...]

    # per-level constants via select chains (f32 for exact compares);
    # xcl/ycl = the TRUE level edge in level texels (levels smaller than
    # the window are edge-padded for the DMA, never tapped past here)
    inv_s = jnp.float32(1.0)
    xcl = jnp.float32(0.0)
    ycl = jnp.float32(0.0)
    for l_s in range(n_levels):
        sel = li == l_s
        edge = jnp.float32((r >> l_s) - 1)
        inv_s = jnp.where(sel, jnp.float32(1.0 / (1 << l_s)), inv_s)
        xcl = jnp.where(sel, edge, xcl)
        ycl = jnp.where(sel, edge, ycl)
    oxf = ox.astype(jnp.float32)
    oyf = oy.astype(jnp.float32)
    xhi = jnp.minimum(jnp.float32(WIN_W - 1), xcl - oxf)
    yhi = jnp.minimum(jnp.float32(WIN_H - 1), ycl - oyf)

    u = u_ref[...]
    v = v_ref[...]
    z_cmp = zc_ref[...]
    ca = ca_ref[...]
    sa = sa_ref[...]

    lane_h = jax.lax.broadcasted_iota(
        jnp.int32, (128, WIN_H), 1).astype(jnp.float32)
    lane_w = jax.lax.broadcasted_iota(
        jnp.int32, (128, WIN_W), 1).astype(jnp.float32)

    def tap(du, dv):
        """Sample the window at full-res texel (u+du, v+dv) for every
        pixel: row one-hot matmul (MXU) + column one-hot reduce (VPU).
        floor(floor(a)/s) == floor(a/s) for integer s, so decimated
        levels tap the exact texel the stride kept."""
        xw = jnp.clip(jnp.floor((u + du) * inv_s) - oxf, 0.0, xhi)
        yw = jnp.clip(jnp.floor((v + dv) * inv_s) - oyf, 0.0, yhi)
        xit = xw.T                                        # (128,8) f32
        yit = yw.T
        cols = []
        for i in range(8):
            p = (yit[:, i:i + 1] == lane_h).astype(jnp.float32)
            g = jnp.dot(p, win, preferred_element_type=jnp.float32)
            q = (xit[:, i:i + 1] == lane_w).astype(jnp.float32)
            cols.append(jnp.sum(g * q, axis=1, keepdims=True))  # (128,1)
        return jnp.concatenate(cols, axis=1).T            # (8,128)

    blk_off, pcf_off = _rot_offsets(cfg)

    # --- blocker search (pcss.hlsl blocker loop) ---
    blocker_sum = jnp.zeros((8, 128), jnp.float32)
    blocker_cnt = jnp.zeros((8, 128), jnp.float32)
    for o in blk_off:
        du = o[0] * ca - o[1] * sa
        dv = o[0] * sa + o[1] * ca
        zs = tap(du, dv)
        is_b = zs > z_cmp                  # reverse-Z: nearer to light
        blocker_sum += jnp.where(is_b, zs, 0.0)
        blocker_cnt += is_b.astype(jnp.float32)
    avg_blocker = blocker_sum / jnp.maximum(blocker_cnt, 1.0)

    # --- penumbra (similar triangles, directional light) ---
    k_pen = fp_ref[0, 0]
    z_recv = zr_ref[...]
    pen = jnp.maximum(avg_blocker - z_recv, 0.0) * k_pen
    pen = jnp.where(blocker_cnt > 0.0, pen, 0.0)
    pcf_r = jnp.clip(cfg.pcf_radius_px + pen, 1.0, _PCF_RMAX)

    # --- variable-radius PCF ---
    lit = jnp.zeros((8, 128), jnp.float32)
    for o in pcf_off:
        du = (o[0] * ca - o[1] * sa) * pcf_r
        dv = (o[0] * sa + o[1] * ca) * pcf_r
        zs = tap(du, dv)
        lit += (z_cmp >= zs).astype(jnp.float32)
    out_ref[...] = lit * jnp.float32(1.0 / cfg.pcss_pcf_samples)


def evaluate_shadow_pallas(
    position_tw: jnp.ndarray,     # (H,W,3) receiver positions
    normal: jnp.ndarray,          # (H,W,3)
    sun_dir: jnp.ndarray,         # (3,)
    shadow_maps: jnp.ndarray,     # (N,R,R) f32 reverse-Z depth
    tw_to_light: jnp.ndarray,     # (N,4,4)
    cfg: ShadowConfig,
    noise: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for evaluate_shadow (same contract: (H,W) visibility in
    [0,1], 1.0 outside every cascade) built on the Pallas tile kernel."""
    n, r, _ = shadow_maps.shape
    h, w = position_tw.shape[:2]
    p = position_tw.astype(jnp.float32)

    # --- per-cascade projection + containment (vector, unrolled) ---
    us, vs, zs_, conts = [], [], [], []
    for i in range(n):
        m = tw_to_light[i]
        lp = (p[..., 0:1] * m[0] + p[..., 1:2] * m[1] +
              p[..., 2:3] * m[2] + m[3])
        ui = (lp[..., 0] * 0.5 + 0.5) * r
        vi = (0.5 - lp[..., 1] * 0.5) * r
        zi = lp[..., 2]
        cont = (ui >= 1) & (ui < r - 1) & (vi >= 1) & (vi < r - 1) & \
            (zi > 0.0) & (zi <= 1.0)
        us.append(ui)
        vs.append(vi)
        zs_.append(zi)
        conts.append(cont)
    in_map = functools.reduce(jnp.logical_or, conts)

    hp = -(-h // TH) * TH
    wp = -(-w // TH) * TH
    ht, wt = hp // TH, wp // TH
    nt = ht * wt
    pad2 = ((0, hp - h), (0, wp - w))
    in_map_p = jnp.pad(in_map, pad2)

    # --- tile cascade: finest cascade containing every in-map pixel ---
    tile_c = jnp.full((nt,), n - 1, jnp.int32)
    for i in reversed(range(n)):
        cov = (jnp.pad(conts[i], pad2) | ~in_map_p).astype(jnp.int32)
        ok_i = _tile_reduce(cov, jnp.min, hp, wp)
        tile_c = jnp.where(ok_i > 0, i, tile_c)
    tc_plane = jnp.repeat(jnp.repeat(tile_c.reshape(ht, wt), TH, 0),
                          TH, 1)[:h, :w]

    # per-pixel u/v/z + metric constants at the TILE cascade
    u, v, z = us[0], vs[0], zs_[0]
    pix_ok = conts[0]   # pixel contained in ITS TILE's cascade (ADVICE
                        # r4: when no cascade covers the whole tile, the
                        # uncovered pixels would tap edge-clamped coords
                        # of a non-containing map — they fall back to
                        # lit=1 below instead, like out-of-map pixels)
    m00 = jnp.abs(tw_to_light[:, 0, 0])
    m22 = jnp.abs(tw_to_light[:, 2, 2])
    dr_n = 1.0 / jnp.maximum(m22, 1e-9)       # world z across [0,1]
    tx_n = 2.0 / jnp.maximum(m00, 1e-9) / r   # world per texel
    dr = jnp.full((h, w), dr_n[0])
    tx = jnp.full((h, w), tx_n[0])
    k_pen_t = jnp.full((nt,), (dr_n[0] * cfg.light_size_world /
                               jnp.maximum(tx_n[0], 1e-6)))
    for i in range(1, n):
        sel = tc_plane == i
        u = jnp.where(sel, us[i], u)
        v = jnp.where(sel, vs[i], v)
        z = jnp.where(sel, zs_[i], z)
        dr = jnp.where(sel, dr_n[i], dr)
        tx = jnp.where(sel, tx_n[i], tx)
        pix_ok = jnp.where(sel, conts[i], pix_ok)
        k_pen_t = jnp.where(tile_c == i,
                            dr_n[i] * cfg.light_size_world /
                            jnp.maximum(tx_n[i], 1e-6), k_pen_t)

    # slope-scaled bias (identical to evaluate_shadow)
    nol = jnp.clip(jnp.sum(normal * sun_dir, axis=-1), 0.05, 1.0)
    tan_t = jnp.sqrt(jnp.maximum(1.0 - nol * nol, 0.0)) / nol
    bias = cfg.depth_bias + \
        cfg.slope_bias * jnp.minimum(tan_t, 4.0) * tx / jnp.maximum(dr, 1e-6)
    z_cmp = z + bias

    # --- per-tile bbox over in-map pixels -> level + window origin ---
    big = jnp.float32(1e9)
    umin = _tile_reduce(jnp.pad(jnp.where(in_map, u, big), pad2,
                                constant_values=big), jnp.min, hp, wp)
    umax = _tile_reduce(jnp.pad(jnp.where(in_map, u, -big), pad2,
                                constant_values=-big), jnp.max, hp, wp)
    vmin = _tile_reduce(jnp.pad(jnp.where(in_map, v, big), pad2,
                                constant_values=big), jnp.min, hp, wp)
    vmax = _tile_reduce(jnp.pad(jnp.where(in_map, v, -big), pad2,
                                constant_values=-big), jnp.max, hp, wp)
    empty = umin > umax
    umin = jnp.where(empty, 0.0, umin)
    umax = jnp.where(empty, 1.0, umax)
    vmin = jnp.where(empty, 0.0, vmin)
    vmax = jnp.where(empty, 1.0, vmax)

    mg = _tap_margin(cfg)
    n_levels = n_levels_for(r)
    lvl = jnp.full((nt,), n_levels - 1, jnp.int32)
    for l_s in reversed(range(n_levels - 1)):
        s = float(1 << l_s)
        fits = ((umax - umin + 2 * mg) <= (COV_W - 2) * s) & \
               ((vmax - vmin + 2 * mg) <= (COV_H - 2) * s)
        lvl = jnp.where(fits, l_s, lvl)

    # window origin in level texels, (8,128)-aligned (DMA slices of a
    # tiled HBM memref must start on tile boundaries), clamped inside
    s_f = jnp.exp2(lvl.astype(jnp.float32))
    lw_v = jnp.zeros((nt,), jnp.int32)   # padded level extents
    lh_v = jnp.zeros((nt,), jnp.int32)
    for l_s in range(n_levels):
        lw_v = jnp.where(lvl == l_s, max(r >> l_s, WIN_W), lw_v)
        lh_v = jnp.where(lvl == l_s, max(r >> l_s, WIN_H), lh_v)
    ox = ((jnp.floor((umin - mg) / s_f).astype(jnp.int32) // 128) * 128)
    oy = ((jnp.floor((vmin - mg) / s_f).astype(jnp.int32) // 8) * 8)
    ox = jnp.clip(ox, 0, lw_v - WIN_W)
    oy = jnp.clip(oy, 0, lh_v - WIN_H)
    tab = jnp.stack([tile_c, lvl, oy, ox], 1).astype(jnp.int32)  # (nT,4)

    # per-tile f32 params as an (8,128) block per tile (Mosaic requires
    # sublane-divisible blocks): row 0 lane 0 = k_pen
    fp = jnp.zeros((nt * 8, 128), jnp.float32)
    fp = fp.at[::8, 0].set(k_pen_t)

    if noise is not None:
        theta = noise * (2.0 * np.pi)
        ca = jnp.cos(theta)
        sa = jnp.sin(theta)
    else:
        ca = jnp.ones((h, w), jnp.float32)
        sa = jnp.zeros((h, w), jnp.float32)

    lvls = build_levels(shadow_maps, n_levels)
    blocks = [_tileify(x, hp, wp) for x in (u, v, z_cmp, z, ca, sa)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            *[pl.BlockSpec((8, 128), lambda i, tab: (i, 0))
              for _ in range(6)],
            pl.BlockSpec((8, 128), lambda i, tab: (i, 0)),  # fp
            *[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
              for _ in range(n_levels)],                    # pyramid
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, tab: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((WIN_H, WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kern = functools.partial(_pcss_kernel, cfg=cfg, r=r,
                             n_levels=n_levels)
    lit = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * 8, 128), jnp.float32),
        interpret=interpret,
    )(tab, *blocks, fp, *lvls)

    lit = _untileify(lit, hp, wp, h, w)
    return jnp.where(in_map & pix_ok, lit, 1.0)
