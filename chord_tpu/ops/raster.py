"""Tiled software visibility-buffer rasterizer.

The TPU replacement for the reference's hardware mesh-shader raster pass
(reference: install/resource/shader/mesh_raster.hlsl:51-209 — vertex
transform, per-triangle culls, SV_CullPrimitive, PS writes packed
`(instanceId+1):25|triangleId:7` into an R32_UINT visibility target +
depth). TPUs have no ROPs and no atomics usable from XLA, so depth-correct
raster is restructured as three data-parallel stages with static shapes:

1. **setup**: per-triangle homogeneous edge equations + depth plane
   (Olano-Greer clipless rasterization — see TriangleSetup). Triangles are
   grouped into **windows of 128** — one window == one meshlet on the
   meshlet path == one dense (16,128) coefficient block, the kernel's unit
   of work.
2. **bin**: windows -> screen tiles (8x128 px). The output is a *work
   queue*: the sorted list of (tile, window) pairs, NOT a dense per-tile
   matrix. Small windows expand to static candidate slots; rare
   tile-spanning windows take a big path. Overflow is counted, not silent.
3. **raster** (Pallas kernel): grid = the work queue. Scalar-prefetched
   pair arrays drive the BlockSpec index maps, so each grid step DMAs
   exactly one window's coefficient block and the depth/visibility tile it
   touches — work is proportional to binned pairs, with zero empty-tile or
   empty-chunk steps. Depth/vis are carried via input/output aliasing, so
   the pass can be seeded from a previous phase (two-phase HZB occlusion
   re-raster, reference mesh_raster.cpp:269-330).

Reverse-Z: larger depth wins; exact ties resolve to the larger payload —
the output is deterministic (the Vulkan reference's depth-test races are
not).

Coordinate conventions are documented in chord_tpu.utils.math.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW = 128   # triangles per window == meshlet max tris == kernel block
BRICK_W = 32   # brick-layout x extent (lanes per brick)
BRICK_H = 4    # brick-layout y extent (y-rows folded into lanes)
COEF_LANES = 128   # stored coefficient-lane width of a triangle-major
                   # block: the HBM layout pads the minor dim to the
                   # 128 tile anyway, and Mosaic only DMAs full-width
                   # lane slices — so the pad is explicit (lanes
                   # coef_rows..127 are never read)


class RasterConfig(NamedTuple):
    """Static raster parameters (fold into jit static args)."""

    width: int
    height: int
    tile_h: int = 120             # taller tiles amortize per-pair overhead;
                                  # the kernel's dynamic row/pack bounds
                                  # keep uncovered rows free. Must be a
                                  # multiple of 8 (f32 sublane) and of
                                  # sub_s (row packing). Swept on-device
                                  # with the packed kernel at 1080p:
                                  # 40≈32.0, 56≈30.8, 120≈30.4, 216≈29.8
                                  # ms — 120 divides 1080 evenly
    tile_w: int = 128
    pair_capacity: int = 8192     # work-queue length: max (tile,window) pairs
    small_ky: int = 4             # small-path tile rows (window bbox height)
    small_kx: int = 2             # small-path tile cols
    big_capacity: int = 256       # max tile-spanning windows
    subtiles: bool = False        # 4 windows share a tile's 128 lanes
                                  # (32px sub-tile binning; narrow windows
                                  # stop paying for unused lanes)
    bricks: bool = False          # brick accumulator layout: one vreg row
                                  # covers a 4-row x 32-px brick instead of
                                  # 1 row x 128 px, so a subwindow only
                                  # pays for the 32-px x-bricks its bbox
                                  # overlaps (the fused x-binning design;
                                  # the separate `subtiles` mode measured
                                  # slower because it multiplied per-pair
                                  # DMA/transpose overhead — this keeps
                                  # pairs identical and re-shapes only the
                                  # inner loop)
    with_attrs: bool = False      # interpolate normal+uv planes in-kernel
    sub_s: int = 4                # subwindows per window: the kernel loops
                                  # S groups of 128/S triangles, each with
                                  # its own y-bounds + x-skip, so row work
                                  # scales with each GROUP's bbox, not the
                                  # whole window's (Morton-ordered meshlet
                                  # triangles make groups spatially tight).
                                  # Measured on-device (bench scene, 1080p):
                                  # S=4 ≈ 0.52x the S=1 vreg work.
    z_clip: bool = False          # take a per-pixel max-depth plane and
                                  # reject fragments at or beyond it —
                                  # depth peeling for the 2nd masked
                                  # layer (reference gets layering free
                                  # from per-pixel raster order). Static:
                                  # costs one compare per row-group only
                                  # in specializations that use it.
    rp: int = 0                   # rows packed per inner iteration
                                  # (0 = auto: sub_s, keeping packs at
                                  # full (128, TW) width). Decoupling rp
                                  # from sub_s lets sub_s=16 run with
                                  # the rp=8 vreg shapes the compiler
                                  # already survives (the cs=8 full-pack
                                  # program ICEs the remote helper at
                                  # every tile height tried) at the cost
                                  # of half-width (64, TW) packs.
    sub_loop: bool = False        # iterate subwindows with a dynamic
                                  # fori_loop instead of Python-unrolling
                                  # S gated bodies: at sub_s=16 the
                                  # unrolled kernel's Mosaic program is
                                  # large enough to kill the remote
                                  # compile helper (HTTP 500) — one
                                  # dynamic body compiles in O(1) code
                                  # size at any S
    interpret: bool = False       # pallas interpreter (CPU tests)

    @property
    def coef_rows(self) -> int:
        # coefficient lanes per triangle, shared with the mesh-shader
        # kernel (ops/mesh_shader.py): 15 raster planes + payload + 15
        # attr planes + pad (valid/bbox metadata rides a separate meta
        # array — the raster kernel never read it, so since r5 it is not
        # DMA'd per pair either)
        return 32 if self.with_attrs else 16

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_h)

    @property
    def n_tiles(self) -> int:
        return self.tiles_x * self.tiles_y


@chex.dataclass(frozen=True)
class TriangleSetup:
    """Per-triangle raster state (SoA, static shape).

    **Homogeneous (clipless) rasterization** (Olano & Greer, "Triangle scan
    conversion using 2D homogeneous coordinates"): the three coverage
    functions λ_i(p) are the cofactor rows of the 3x3 clip-space vertex
    matrix M = [[X0,Y0,w0],[X1,Y1,w1],[X2,Y2,w2]] (viewport folded in),
    so triangles crossing the eye plane (w<=0 vertices) rasterize
    correctly — there is NO near clipping stage anywhere. Depth is the
    per-pixel ratio z_ndc(p) = N(p)/D(p) of two more linear functions.
    Coverage: λ0>=0 & λ1>=0 & λ2>=0 & D>0 & 0<N<=D (the near plane becomes
    a pixel test).

    coef16 lane layout (one row per triangle, coefficients on lanes):
    [λ0a,λ1a,λ2a,Na,Da, λ0b,λ1b,λ2b,Nb,Db, λ0c,λ1c,λ2c,Nc,Dc, payload]
    where each linear function evaluates as f(p) = fa*px + fb*py + fc.
    Entries are uint32 (f32 bit patterns + raw payload bits — payload bits
    would be denormal-flushed if they ever existed as f32). One window =
    the contiguous (128, R) row slice [w*128:(w+1)*128, :] — exactly the
    triangles-on-sublanes shape the raster kernel's inner loop consumes,
    so the per-pair DMA is contiguous and transpose-free.

    Windows: triangle i belongs to window i // 128. window_bbox is the
    union pixel bbox of the window's valid triangles.
    """

    coefT: jnp.ndarray         # ((D+1)*128, R) u32 triangle-major
    window_bbox: jnp.ndarray   # (4, D) i32 [x0,y0,x1,y1] inclusive
    window_valid: jnp.ndarray  # (D,) bool — any valid triangle
    valid: jnp.ndarray         # (T,) bool per-triangle
    # per-subwindow bounds [y0, y1, x0, x1] over groups of 128/S
    # consecutive triangles, poison window included: (4, (D+1)*S) i32.
    # None -> the raster kernel falls back to whole-window bounds.
    sub_bounds: Optional[jnp.ndarray] = None

    @property
    def num_windows(self) -> int:   # D (static, from shape)
        return self.window_valid.shape[0]


def setup_triangles(
    clip: jnp.ndarray,        # (V,4) f32 clip positions (row-vector)
    indices: jnp.ndarray,     # (T,3) i32, T % 128 == 0
    tri_valid: jnp.ndarray,   # (T,) bool
    payload: jnp.ndarray,     # (T,) uint32
    config: RasterConfig,
    backface_cull: bool = True,
    attrs: 'Optional[jnp.ndarray]' = None,   # (V,A) per-vertex attributes
) -> TriangleSetup:
    """Stage 1: clip positions -> homogeneous coverage/depth functions.

    No near clipping: triangles with w<=0 vertices get full-screen bboxes
    (routed to the big-window path) and rasterize correctly through the
    cofactor formulation. (The reference relies on hardware clipping;
    mesh_raster.hlsl culls only fully-behind triangles.)
    """
    w, h = config.width, config.height
    t = indices.shape[0]
    assert t % WINDOW == 0, f"triangle count {t} not a multiple of {WINDOW}"
    d = t // WINDOW
    eps_w = 1e-6

    def fold_viewport(v):
        # Homogeneous screen coords: (X, Y, w) with X/w = pixel x.
        X = (v[:, 0] * 0.5 + v[:, 3] * 0.5) * w
        Y = (v[:, 3] * 0.5 - v[:, 1] * 0.5) * h   # y down
        return X, Y, v[:, 3], v[:, 2]

    v0 = clip[indices[:, 0]]
    v1 = clip[indices[:, 1]]
    v2 = clip[indices[:, 2]]
    X0, Y0, w0, z0 = fold_viewport(v0)
    X1, Y1, w1, z1 = fold_viewport(v1)
    X2, Y2, w2, z2 = fold_viewport(v2)

    # Per-vertex scale keeps cofactors in a sane f32 range.
    def vscale(X, Y, ww):
        m = jnp.maximum(jnp.maximum(jnp.abs(X), jnp.abs(Y)),
                        jnp.maximum(jnp.abs(ww), eps_w))
        return 1.0 / m

    s0, s1, s2 = vscale(X0, Y0, w0), vscale(X1, Y1, w1), vscale(X2, Y2, w2)
    X0, Y0, w0, z0 = X0 * s0, Y0 * s0, w0 * s0, z0 * s0
    X1, Y1, w1, z1 = X1 * s1, Y1 * s1, w1 * s1, z1 * s1
    X2, Y2, w2, z2 = X2 * s2, Y2 * s2, w2 * s2, z2 * s2

    def cross3(ax, ay, aw, bx, by, bw):
        return ay * bw - aw * by, aw * bx - ax * bw, ax * by - ay * bx

    l0 = cross3(X1, Y1, w1, X2, Y2, w2)   # λ0: weight of v0
    l1 = cross3(X2, Y2, w2, X0, Y0, w0)   # λ1: weight of v1
    l2 = cross3(X0, Y0, w0, X1, Y1, w1)   # λ2: weight of v2

    det = X0 * l0[0] + Y0 * l0[1] + w0 * l0[2]
    # Screen-space CCW glTF front faces come out with det < 0 in our y-down
    # fold; normalize so inside ⇒ all λ >= 0.
    flip = jnp.where(det < 0.0, -1.0, 1.0)
    front = (det < 0.0) if backface_cull else (det != 0.0)
    degenerate = det == 0.0
    l0 = tuple(flip * x for x in l0)
    l1 = tuple(flip * x for x in l1)
    l2 = tuple(flip * x for x in l2)

    # Depth numerator/denominator planes: z_ndc(p) = N(p)/D(p).
    N = tuple(l0[i] * z0 + l1[i] * z1 + l2[i] * z2 for i in range(3))
    D = tuple(l0[i] * w0 + l1[i] * w1 + l2[i] * w2 for i in range(3))

    # Sample at pixel centers: fold the +0.5 offsets into c.
    def center(f):
        return (f[0], f[1], f[2] + 0.5 * f[0] + 0.5 * f[1])

    l0, l1, l2, N, D = center(l0), center(l1), center(l2), center(N), center(D)

    # Pixel bbox. Fully-in-front triangles get their projected bbox;
    # eye-plane-crossing triangles are unbounded -> full screen (big path).
    all_front = (w0 > eps_w) & (w1 > eps_w) & (w2 > eps_w)
    iw0 = 1.0 / jnp.where(all_front, w0, 1.0)
    iw1 = 1.0 / jnp.where(all_front, w1, 1.0)
    iw2 = 1.0 / jnp.where(all_front, w2, 1.0)
    xs = jnp.stack([X0 * iw0, X1 * iw1, X2 * iw2], 0)
    ys = jnp.stack([Y0 * iw0, Y1 * iw1, Y2 * iw2], 0)
    xmin = jnp.where(all_front, xs.min(0), 0.0)
    xmax = jnp.where(all_front, xs.max(0), float(w))
    ymin = jnp.where(all_front, ys.min(0), 0.0)
    ymax = jnp.where(all_front, ys.max(0), float(h))
    ix0 = jnp.clip(jnp.floor(xmin).astype(jnp.int32), 0, w - 1)
    ix1 = jnp.clip(jnp.ceil(xmax).astype(jnp.int32), 0, w - 1)
    iy0 = jnp.clip(jnp.floor(ymin).astype(jnp.int32), 0, h - 1)
    iy1 = jnp.clip(jnp.ceil(ymax).astype(jnp.int32), 0, h - 1)

    onscreen = (xmax >= 0) & (xmin < w) & (ymax >= 0) & (ymin < h)
    # Small-primitive cull: bbox encloses no pixel center (centers at i+0.5)
    # (reference mesh_raster.hlsl small-primitive `round(min)==round(max)`).
    covers_center = jnp.where(
        all_front,
        (jnp.ceil(xmin - 0.5) <= jnp.floor(xmax - 0.5)) &
        (jnp.ceil(ymin - 0.5) <= jnp.floor(ymax - 0.5)),
        True)
    # A triangle entirely behind the eye never covers (D(p) <= 0).
    any_front = (w0 > eps_w) | (w1 > eps_w) | (w2 > eps_w)

    valid = (tri_valid & front & (~degenerate) & onscreen & covers_center &
             any_front)

    payload = jnp.where(valid, payload, jnp.uint32(0))
    bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.uint32)
    # Triangle-major (T, R): one row per triangle, coefficients on lanes —
    # a window is the contiguous (128, R) row slice [w*128:(w+1)*128, :],
    # which the raster kernel DMAs straight into the (tris-on-sublanes)
    # shape its inner loop consumes. (r4 layout was coefficient-major
    # (R, T) + a per-PAIR in-kernel transpose; the r5 device decomposition
    # put that DMA+transpose at ~2.6us/pair — moving the transpose to the
    # producer makes it per-WINDOW and the DMA contiguous.)
    rows = [bc(l0[0]), bc(l1[0]), bc(l2[0]), bc(N[0]), bc(D[0]),
            bc(l0[1]), bc(l1[1]), bc(l2[1]), bc(N[1]), bc(D[1]),
            bc(l0[2]), bc(l1[2]), bc(l2[2]), bc(N[2]), bc(D[2]),
            payload]
    n_rows = config.coef_rows
    if config.with_attrs:
        assert attrs is not None and attrs.shape[1] == 5, \
            "with_attrs needs (V,5) attributes (nx,ny,nz,u,v)"
    if n_rows > 16:
        # Attribute numerator planes: attr(p) = (Σ λ_i a_i)(p) / Σ λ_i(p);
        # each plane = a0*l0 + a1*l1 + a2*l2, componentwise over (a,b,c)
        # (the in-rasterizer analog of the reference's attribute
        # interpolation in lighting.hlsl:310-360).
        if attrs is not None:
            a0 = attrs[indices[:, 0]]
            a1 = attrs[indices[:, 1]]
            a2 = attrs[indices[:, 2]]
            for k in range(5):
                for comp in range(3):
                    plane = (a0[:, k] * (l0[comp]) + a1[:, k] * (l1[comp]) +
                             a2[:, k] * (l2[comp]))
                    rows.append(bc(plane))
        else:
            rows.extend([jnp.zeros_like(payload)] * 15)
        while len(rows) < n_rows:
            rows.append(jnp.zeros_like(payload))   # pad to coef_rows
    coefT = jnp.stack(rows, axis=-1)                             # (T,R) u32
    # Invalid triangles: poison coverage (λ c = -1, a = b = 0 -> λ < 0).
    neg1 = np.float32(-1.0).view(np.uint32)
    poison_np = np.zeros(n_rows, np.uint32)
    poison_np[10:13] = neg1
    poison = jnp.asarray(poison_np)
    coefT = jnp.where(valid[:, None], coefT, poison[None, :])
    # Poison window D appended; slack raster pairs point at it.
    coefT = jnp.concatenate(
        [coefT, jnp.broadcast_to(poison[None, :], (WINDOW, n_rows))], axis=0)
    # Pad lanes to the 128 tile width: Mosaic rejects partial-lane HBM
    # DMA slices, and the HBM layout pads to 128 lanes regardless
    if coefT.shape[1] < COEF_LANES:
        coefT = jnp.pad(coefT, ((0, 0), (0, COEF_LANES - coefT.shape[1])))
    # Window bbox = union over valid triangles (invalid -> empty bbox).
    big_i = jnp.int32(1 << 29)
    wx0 = jnp.where(valid, ix0, big_i).reshape(d, WINDOW).min(1)
    wy0 = jnp.where(valid, iy0, big_i).reshape(d, WINDOW).min(1)
    wx1 = jnp.where(valid, ix1, -1).reshape(d, WINDOW).max(1)
    wy1 = jnp.where(valid, iy1, -1).reshape(d, WINDOW).max(1)
    window_valid = valid.reshape(d, WINDOW).any(1)
    window_bbox = jnp.stack([wx0, wy0, wx1, wy1], axis=0)
    sub_bounds = _sub_bounds(
        jnp.where(valid, iy0, big_i), jnp.where(valid, iy1, -1),
        jnp.where(valid, ix0, big_i), jnp.where(valid, ix1, -1),
        d, config.sub_s)
    return TriangleSetup(coefT=coefT, window_bbox=window_bbox,
                         window_valid=window_valid, valid=valid,
                         sub_bounds=sub_bounds)


def _sub_bounds(iy0, iy1, ix0, ix1, d: int, s: int) -> jnp.ndarray:
    """Per-subwindow [y0,y1,x0,x1] over groups of 128/s consecutive
    triangles (+ s poison entries for the slack window): (4, (d+1)*s)."""
    cs = WINDOW // s
    y0 = iy0.reshape(d, s, cs).min(2).reshape(-1)
    y1 = iy1.reshape(d, s, cs).max(2).reshape(-1)
    x0 = ix0.reshape(d, s, cs).min(2).reshape(-1)
    x1 = ix1.reshape(d, s, cs).max(2).reshape(-1)
    pois_lo = jnp.full((s,), 1 << 29, jnp.int32)
    pois_hi = jnp.full((s,), -1, jnp.int32)
    return jnp.stack([
        jnp.concatenate([y0.astype(jnp.int32), pois_lo]),
        jnp.concatenate([y1.astype(jnp.int32), pois_hi]),
        jnp.concatenate([x0.astype(jnp.int32), pois_lo]),
        jnp.concatenate([x1.astype(jnp.int32), pois_hi])], axis=0)


class WorkQueue(NamedTuple):
    """Tile-grouped window lists: sorted pair array + per-tile segments."""

    pair_win: jnp.ndarray     # (P,) i32 window ids sorted by tile; slack -> D
    starts: jnp.ndarray       # (n_tiles,) i32 segment start per tile
    counts: jnp.ndarray       # (n_tiles,) i32 windows per tile (capped)
    n_pairs: jnp.ndarray      # () i32 actual pair count
    overflow: jnp.ndarray     # () i32 dropped pairs (capacity exceeded)


def bin_windows(setup: TriangleSetup, config: RasterConfig,
                tile_keep: Optional[jnp.ndarray] = None) -> WorkQueue:
    """Stage 2: windows -> sorted (tile, window) work queue.

    `tile_keep` ((n_tiles,) bool, optional) drops every pair whose tile
    is masked off — partial re-raster of a seeded target (the scrolled
    shadow-cascade cache rasters only the newly exposed edge tile
    strips). The raster kernel's cost is proportional to queued pairs,
    so the filter converts a region restriction directly into time."""
    c = config
    d = setup.num_windows
    bx0, by0, bx1, by1 = (setup.window_bbox[i] for i in range(4))
    tx0 = bx0 // c.tile_w
    ty0 = by0 // c.tile_h
    tx1 = bx1 // c.tile_w
    ty1 = by1 // c.tile_h
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    ok = setup.window_valid & (bx1 >= bx0)
    small = ok & (span_x <= c.small_kx) & (span_y <= c.small_ky)
    big = ok & ~small

    invalid_key = jnp.int32(c.n_tiles)  # sorts to the end

    win_ids = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)[:, 0]
    keys_l, vals_l = [], []
    for ky in range(c.small_ky):
        for kx in range(c.small_kx):
            tyk = ty0 + ky
            txk = tx0 + kx
            hit = small & (tyk <= ty1) & (txk <= tx1)
            keys_l.append(jnp.where(hit, tyk * c.tiles_x + txk, invalid_key))
            vals_l.append(win_ids)

    # Big path: compact big windows to a fixed list, expand vs all tiles.
    # (sort-compaction — element scatters lower serially on TPU)
    big_i = big.astype(jnp.int32)
    n_big = jnp.sum(big_i)
    # Exact dropped-pair count for big windows beyond capacity: each
    # dropped window would have expanded into its span_x*span_y tile
    # pairs. Sort the per-window tile counts with the same key as the
    # id compaction; everything past the first big_capacity slots is
    # dropped (non-big entries carry 0, so the tail sum is exact).
    nt_big = jnp.where(big, span_x * span_y, 0).astype(jnp.int32)
    _, nt_sorted = jax.lax.sort((1 - big_i, nt_big), num_keys=1,
                                is_stable=True)
    big_overflow_pairs = (jnp.sum(nt_sorted)
                          - jnp.sum(nt_sorted[:c.big_capacity]))
    _, big_sorted = jax.lax.sort((1 - big_i, win_ids), num_keys=1,
                                 is_stable=True)
    if big_sorted.shape[0] < c.big_capacity:
        big_sorted = jnp.concatenate(
            [big_sorted, jnp.zeros((c.big_capacity - big_sorted.shape[0],),
                                   jnp.int32)])
    big_list = big_sorted[:c.big_capacity]
    have = jax.lax.broadcasted_iota(
        jnp.int32, (c.big_capacity, 1), 0)[:, 0] < jnp.minimum(
            n_big, c.big_capacity)
    bl = jnp.where(have, big_list, 0)
    btx0 = jnp.where(have, tx0[bl], c.tiles_x + 1)
    bty0 = jnp.where(have, ty0[bl], c.tiles_y + 1)
    btx1 = jnp.where(have, tx1[bl], -1)
    bty1 = jnp.where(have, ty1[bl], -1)
    tile_ix = jax.lax.broadcasted_iota(jnp.int32,
                                       (c.big_capacity, c.n_tiles), 1)
    ttx = tile_ix % c.tiles_x
    tty = tile_ix // c.tiles_x
    overlap = ((ttx >= btx0[:, None]) & (ttx <= btx1[:, None]) &
               (tty >= bty0[:, None]) & (tty <= bty1[:, None]))
    keys_l.append(jnp.where(overlap, tile_ix, invalid_key).reshape(-1))
    vals_l.append(jnp.broadcast_to(
        bl[:, None], (c.big_capacity, c.n_tiles)).reshape(-1))

    keys = jnp.concatenate(keys_l)
    vals = jnp.concatenate(vals_l)
    if tile_keep is not None:
        keep = tile_keep[jnp.minimum(keys, c.n_tiles - 1)]
        keys = jnp.where(keep, keys, invalid_key)
    keys_s, vals_s = jax.lax.sort_key_val(keys, vals)

    total = jnp.sum((keys_s < c.n_tiles).astype(jnp.int32))
    cap = c.pair_capacity
    if keys_s.shape[0] < cap:   # fewer candidate slots than capacity
        pad = cap - keys_s.shape[0]
        keys_s = jnp.concatenate([keys_s, jnp.full((pad,), invalid_key)])
        vals_s = jnp.concatenate([vals_s, jnp.full((pad,), d, jnp.int32)])
    n_pairs = jnp.minimum(total, cap)
    overflow = jnp.maximum(total - cap, 0) + big_overflow_pairs

    pk = keys_s[:cap]
    pv = vals_s[:cap]
    idx = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
    live = idx < n_pairs
    pair_win = jnp.where(live, pv, d)          # poison window
    # Per-tile segments over the sorted keys (clipped to capacity).
    tile_ids = jax.lax.broadcasted_iota(jnp.int32, (c.n_tiles, 1), 0)[:, 0]
    starts = jnp.minimum(
        jnp.searchsorted(pk, tile_ids, side="left").astype(jnp.int32), cap)
    ends = jnp.minimum(
        jnp.searchsorted(pk, tile_ids, side="right").astype(jnp.int32),
        n_pairs)
    counts = jnp.maximum(ends - starts, 0)
    return WorkQueue(pair_win=pair_win, starts=starts, counts=counts,
                     n_pairs=n_pairs, overflow=overflow)


def _raster_tile_kernel(win_ref, start_ref, count_ref,
                        sy0_ref, sy1_ref, sx0_ref, sx1_ref,  # (D+1)*S bounds
                        coef_hbm,                 # ((D+1)*128, R) ANY
                        *refs,                    # seeds, outs, scratch
                        config: RasterConfig):
    """One grid step = one screen tile: loop over the tile's binned windows
    with double-buffered HBM->VMEM coefficient DMA; per window, process its
    S subwindows (groups of 128/S consecutive triangles), each through an
    inner dynamic row loop over only the tile rows inside THAT GROUP's
    y-bbox, with a scalar x-overlap skip. Meshlet triangles are Morton-
    ordered at build time, so consecutive groups are spatially tight —
    row work tracks each group's real coverage instead of the window
    union's (measured ~0.5x the vreg work at S=4 on the bench scene).
    Accumulators live in VMEM scratch, written back once per tile.

    Without attrs (R=16): (depth, payload); with attrs (R=40) also
    interpolates 5 attribute planes (nx,ny,nz,u,v) for the winner — the
    in-rasterizer replacement for per-pixel attribute gathers (the
    reference re-fetches vertex data per pixel in lighting.hlsl:270-360;
    on TPU random gathers cost more than recomputing planes here — a
    (H,W)x16 payload-indexed gather measures ~100 ms at 1080p).

    Design notes from rejected alternatives (measured on v5e): a
    triangle-sequential scalar kernel (per-triangle SMEM scalars + brick
    loop) costs ~200+ cycles per triangle VISIT in Mosaic scalar code —
    slower than the dense vector math it avoids; MXU edge evaluation
    wastes 42x on the K=3 contraction. Full-lane vector math with
    data-dependent LOOP BOUNDS (this kernel) is the shape that fits.

    coef window (128, R): sublanes = triangles, lanes = coefficients
    [λ0a,λ1a,λ2a,Na,Da | *b | *c | payload@15 | 15 attr-plane coeffs...]
    — already the shape the inner loop consumes (the producer transposes
    once per WINDOW; r4 transposed here once per PAIR, ~2.6us/pair with
    its strided DMA). All f32 VPU math — edge functions cannot survive
    the MXU's bf16 decomposition. Pixels are processed one tile row
    (tile_w lanes) at a time.
    """
    c = config
    n_attr = 5 if c.with_attrs else 0
    n_rt = 2 + n_attr
    n_in = n_rt + (1 if c.z_clip else 0)
    seeds = refs[:n_rt]
    zclip_ref = refs[n_rt] if c.z_clip else None
    outs = refs[n_in:n_in + n_rt]
    coef_scr, blk_scr, acc, acc_v_scr, sems = refs[n_in + n_rt:]

    s_cnt = c.sub_s
    cs = WINDOW // s_cnt

    tile = pl.program_id(0)
    start = start_ref[tile]
    count = count_ref[tile]
    tile_ty = tile // c.tiles_x
    tile_tx = tile % c.tiles_x
    tile_py0 = tile_ty * c.tile_h
    tile_px0 = tile_tx * c.tile_w

    # init accumulators from the seed tiles (payload stays int32: its bit
    # patterns are denormal as floats and would be flushed by f32 math)
    acc[0, :, :] = seeds[0][:]
    acc_v_scr[:, :] = jax.lax.bitcast_convert_type(seeds[1][:], jnp.int32)
    for k in range(n_attr):
        acc[1 + k, :, :] = seeds[2 + k][:]

    def dma(j, slot):
        win = win_ref[start + j]
        # full-lane-width DMA (Mosaic rejects partial-lane HBM slices);
        # depth-only configs simply never read lanes >= 16
        return pltpu.make_async_copy(
            coef_hbm.at[pl.ds(win * WINDOW, WINDOW), :],
            coef_scr.at[slot], sems.at[slot])

    @pl.when(count > 0)
    def _warmup():
        dma(0, 0).start()

    px = jax.lax.broadcasted_iota(jnp.int32, (1, c.tile_w), 1).astype(
        jnp.float32) + jnp.float32(tile_px0)                      # (1, TW)

    # rows packed per inner iteration: RP*cs == WINDOW keeps packed ops
    # at full (128, TW) width (see RasterConfig.rp for the override)
    RP = c.rp or s_cnt
    # sublane-group row offset column: group g handles row base+g
    yoff_col = (jax.lax.broadcasted_iota(
        jnp.int32, (RP * cs, 1), 0) // cs).astype(jnp.float32)

    f32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
    NEG = jnp.float32(-3e38)

    def body(j, carry):
        slot = j % 2
        win = win_ref[start + j]

        @pl.when(j + 1 < count)
        def _prefetch():
            dma(j + 1, (j + 1) % 2).start()

        dma(j, slot).wait()
        # stage the live slot's used lanes into a STATICALLY-indexed
        # working buffer once per pair: the subwindow bodies then slice a
        # static ref (a dynamic leading-index slice per subwindow made
        # Mosaic materialize predicated copies). This is a plain (128,R)
        # VMEM copy — the r4 layout paid a (R,128)->(128,R) RELAYOUT here.
        blk_scr[:, :] = coef_scr[slot, :, pl.ds(0, c.coef_rows)]

        def visit(s, y0, y1):
            # the WHOLE subwindow body (column slicing + the a*px hoist +
            # the row loop) is gated: a subwindow whose bbox misses this
            # tile costs one scalar compare, not ~15 full-width hoists
            # (x-skipped subwindows previously still paid the hoist)
            @pl.when(y1 > y0)
            def _subwindow():
                _raster_subwindow_body(s, y0, y1, blk_scr, acc,
                                       acc_v_scr, px, yoff_col, tile_py0,
                                       cs, RP, n_attr, f32, NEG, zclip_ref)

        def bounds(s):
            base = win * s_cnt + s
            y0 = jnp.clip(sy0_ref[base] - tile_py0, 0, c.tile_h)
            y1 = jnp.clip(sy1_ref[base] + 1 - tile_py0, 0, c.tile_h)
            # x-overlap skip folds into the row bounds (no scalar branch)
            xok = (sx1_ref[base] >= tile_px0) & \
                  (sx0_ref[base] < tile_px0 + c.tile_w)
            return y0, jnp.where(xok, y1, 0)

        if c.sub_loop:
            def sub_body(s, _):
                y0, y1 = bounds(s)
                visit(s, y0, y1)
                return 0
            jax.lax.fori_loop(0, s_cnt, sub_body, 0)
        else:
            for s in range(s_cnt):
                y0, y1 = bounds(s)
                visit(s, y0, y1)
        return carry

    jax.lax.fori_loop(0, count, body, 0)
    outs[0][:] = acc[0, :, :]
    outs[1][:] = jax.lax.bitcast_convert_type(acc_v_scr[:, :], jnp.uint32)
    for k in range(n_attr):
        outs[2 + k][:] = acc[1 + k, :, :]


def _raster_subwindow_body(s, y0, y1, blk_scr, acc, acc_v_scr, px,
                           yoff_col, tile_py0, cs, RP, n_attr, f32, NEG,
                           zclip_ref=None):
    """One subwindow of the flat kernel: coefficient column setup + the
    packed dynamic row loop (split out so the caller can pl.when-gate
    the entire body)."""
    # pl.ds: s may be a traced loop index (config.sub_loop); offsets are
    # s*cs with cs a multiple of 8, so the sublane slice stays aligned
    sub = blk_scr[pl.ds(s * cs, cs), :]           # (cs, R)
    # tile the group's coefficient columns RP times along sublanes:
    # one inner iteration evaluates RP consecutive rows x cs
    # triangles as full (RP*cs, TW) ops — a single per-row chain is
    # LATENCY-bound (~350 cycles however few vregs it touches), so
    # packing rows restores throughput-bound shapes while keeping
    # the small per-group bounds.
    rp = RP
    col4 = lambda k: f32(jnp.concatenate(
        [sub[:, k:k + 1]] * rp, axis=0))          # (rp*cs, 1)
    a = [col4(k) for k in range(5)]
    b = [col4(5 + k) for k in range(5)]
    cc = [col4(10 + k) for k in range(5)]
    pay = jax.lax.bitcast_convert_type(sub[:, 15:16], jnp.int32)
    if n_attr:
        aa = [col4(16 + 3 * k) for k in range(n_attr)]
        ab = [col4(17 + 3 * k) for k in range(n_attr)]
        ac = [col4(18 + 3 * k) for k in range(n_attr)]

    ex = [a[k] * px for k in range(5)]            # (rp*cs, TW)
    if n_attr:
        exa = [aa[k] * px for k in range(n_attr)]
    attrs3 = (exa, ab, ac) if n_attr else None

    def make_pack_body(b, cc, ex, pay, attrs3):
        def pack_body(p, _):
            # rows p*rp .. p*rp+rp-1; group g of the sublane dim
            # evaluates row p*rp+g for all cs triangles
            yf = yoff_col + (tile_py0 + p * rp).astype(jnp.float32)
            l0 = ex[0] + (b[0] * yf + cc[0])
            l1 = ex[1] + (b[1] * yf + cc[1])
            l2 = ex[2] + (b[2] * yf + cc[2])
            zn = ex[3] + (b[3] * yf + cc[3])
            zd = ex[4] + (b[4] * yf + cc[4])
            covered = (l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0) & \
                      (zd > 0.0) & (zn > 0.0) & (zn <= zd)
            z = zn / jnp.where(covered, zd, 1.0)
            cand = jnp.where(covered, z, 0.0)     # (rp*cs, TW)
            if attrs3 is not None:
                exa_, ab_, ac_ = attrs3
                ssum = l0 + l1 + l2
                inv_s = 1.0 / jnp.where(covered, ssum, 1.0)
                vals = [(exa_[k] + (ab_[k] * yf + ac_[k])) * inv_s
                        for k in range(n_attr)]
            # RP independent per-row winner/merge chains
            for g in range(rp):
                rs = pl.ds(p * rp + g, 1)
                cg = cand[g * cs:(g + 1) * cs, :]
                if zclip_ref is not None:
                    # depth peel: drop fragments AT or NEARER than the
                    # per-pixel clip plane (reverse-Z: larger = nearer)
                    # BEFORE the winner max, so a farther fragment in
                    # the same group can still win
                    cg = jnp.where(cg < zclip_ref[rs, :], cg, 0.0)
                best = jnp.max(cg, axis=0, keepdims=True)  # (1,TW)
                winner = (cg == best) & (cg > 0.0)
                pay_sel = jnp.max(jnp.where(winner, pay, 0),
                                  axis=0, keepdims=True)
                acc_d = acc[0, rs, :]
                acc_v = acc_v_scr[rs, :]
                take = (best > acc_d) | \
                       ((best == acc_d) & (pay_sel > acc_v))
                acc[0, rs, :] = jnp.where(take, best, acc_d)
                acc_v_scr[rs, :] = jnp.where(take, pay_sel, acc_v)
                if attrs3 is not None:
                    for k in range(n_attr):
                        sel = jnp.max(
                            jnp.where(winner,
                                      vals[k][g * cs:(g + 1) * cs, :], NEG),
                            axis=0, keepdims=True)
                        acc[1 + k, rs, :] = jnp.where(
                            take, sel, acc[1 + k, rs, :])
            return 0
        return pack_body

    jax.lax.fori_loop(y0 // rp, (y1 + rp - 1) // rp,
                      make_pack_body(b, cc, ex, pay, attrs3), 0)


def bricks_pack(x: jnp.ndarray, c: RasterConfig) -> jnp.ndarray:
    """Linear (h_pad, w_pad) -> brick layout (same shape): within each
    (tile_h, tile_w) tile, row r' = b*(tile_h/4) + y//4 and lane
    l = (y%4)*32 + x%32, where b = x//32 is the 32-px x-brick. One vreg
    row then covers a 4x32 pixel brick instead of a 1x128 strip."""
    th4 = c.tile_h // BRICK_H
    nb = c.tile_w // BRICK_W
    t = x.reshape(c.tiles_y, th4, BRICK_H, c.tiles_x, nb, BRICK_W)
    t = t.transpose(0, 4, 1, 3, 2, 5)
    return t.reshape(c.tiles_y * c.tile_h, c.tiles_x * c.tile_w)


def bricks_unpack(x: jnp.ndarray, c: RasterConfig) -> jnp.ndarray:
    """Inverse of bricks_pack."""
    th4 = c.tile_h // BRICK_H
    nb = c.tile_w // BRICK_W
    t = x.reshape(c.tiles_y, nb, th4, c.tiles_x, BRICK_H, BRICK_W)
    t = t.transpose(0, 2, 4, 3, 1, 5)
    return t.reshape(c.tiles_y * c.tile_h, c.tiles_x * c.tile_w)


def _raster_tile_kernel_bricks(win_ref, start_ref, count_ref,
                               sy0_ref, sy1_ref, sx0_ref, sx1_ref,
                               coef_hbm, *refs, config: RasterConfig):
    """Brick-layout variant of _raster_tile_kernel (the fused x-binning).

    Same (tile, window) pairs, same DMA/transpose/coefficient slicing —
    only the accumulator layout and row loop change: acc row
    r' = b*(tile_h/4) + y//4 holds the 4x32-px brick (y%4, x%32) in its
    lanes. A pack iteration evaluates RP acc rows = RP*4 y-rows x 32 x —
    so a subwindow pays ceil(h/16) iterations per overlapped 32-px brick
    instead of ceil(h/4) full-width iterations. The brick x-offset folds
    into the per-coefficient COLUMN constant (cc + a*32b), so per-brick
    overhead is ~10 column vectors guarded by pl.when; x-binning costs
    nothing when a brick doesn't overlap.

    Seeds and outputs are in brick layout (driver converts via
    bricks_pack/bricks_unpack)."""
    c = config
    n_attr = 5 if c.with_attrs else 0
    n_rt = 2 + n_attr
    n_in = n_rt + (1 if c.z_clip else 0)
    seeds = refs[:n_rt]
    zclip_ref = refs[n_rt] if c.z_clip else None
    outs = refs[n_in:n_in + n_rt]
    coef_scr, blk_scr, acc, acc_v_scr, sems = refs[n_in + n_rt:]

    s_cnt = c.sub_s
    cs = WINDOW // s_cnt
    nb = c.tile_w // BRICK_W
    th4 = c.tile_h // BRICK_H

    tile = pl.program_id(0)
    start = start_ref[tile]
    count = count_ref[tile]
    tile_ty = tile // c.tiles_x
    tile_tx = tile % c.tiles_x
    tile_py0 = tile_ty * c.tile_h
    tile_px0 = tile_tx * c.tile_w

    acc[0, :, :] = seeds[0][:]
    acc_v_scr[:, :] = jax.lax.bitcast_convert_type(seeds[1][:], jnp.int32)
    for k in range(n_attr):
        acc[1 + k, :, :] = seeds[2 + k][:]

    def dma(j, slot):
        win = win_ref[start + j]
        return pltpu.make_async_copy(
            coef_hbm.at[pl.ds(win * WINDOW, WINDOW), :],
            coef_scr.at[slot], sems.at[slot])

    @pl.when(count > 0)
    def _warmup():
        dma(0, 0).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, c.tile_w), 1)
    pxl = (lane % BRICK_W).astype(jnp.float32) + jnp.float32(tile_px0)
    ylane = (lane // BRICK_W).astype(jnp.float32)          # 0..3  (1, TW)

    RP = s_cnt
    rows_it = RP * BRICK_H      # y-rows covered per pack iteration
    # sublane-group acc-row offset column, pre-scaled to pixels
    yoff4_col = ((jax.lax.broadcasted_iota(
        jnp.int32, (RP * cs, 1), 0) // cs) * BRICK_H).astype(jnp.float32)

    f32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
    NEG = jnp.float32(-3e38)

    def _bricks_subwindow(s, y0, y1, sx0, sx1):
        sub = blk_scr[pl.ds(s * cs, cs), :]           # (cs, R)
        rp = RP
        col4 = lambda k: f32(jnp.concatenate(
            [sub[:, k:k + 1]] * rp, axis=0))          # (rp*cs, 1)
        a = [col4(k) for k in range(5)]
        b = [col4(5 + k) for k in range(5)]
        cc = [col4(10 + k) for k in range(5)]
        pay = jax.lax.bitcast_convert_type(sub[:, 15:16], jnp.int32)
        if n_attr:
            aa = [col4(16 + 3 * k) for k in range(n_attr)]
            ab = [col4(17 + 3 * k) for k in range(n_attr)]
            ac = [col4(18 + 3 * k) for k in range(n_attr)]

        # loop-invariant lane part: a*x_local + b*y_sub
        ex = [a[k] * pxl + b[k] * ylane for k in range(5)]
        if n_attr:
            exa = [aa[k] * pxl + ab[k] * ylane for k in range(n_attr)]

        p0 = y0 // rows_it
        for bx in range(nb):
            bx0 = tile_px0 + bx * BRICK_W
            xok = (sx1 >= bx0) & (sx0 < bx0 + BRICK_W)
            y1b = jnp.where(xok, y1, 0)
            p1 = (y1b + rows_it - 1) // rows_it

            @pl.when(p1 > p0)
            def _run_brick(bx=bx, p1=p1):
                xoff = jnp.float32(bx * BRICK_W)
                ccb = [cc[k] + a[k] * xoff for k in range(5)]
                if n_attr:
                    acb = [ac[k] + aa[k] * xoff for k in range(n_attr)]
                    attrs3 = (exa, ab, acb)
                else:
                    attrs3 = None
                row_base = bx * th4

                def pack_body(p, _):
                    yf = yoff4_col + jnp.float32(tile_py0) + \
                        (p * rows_it).astype(jnp.float32)
                    l0 = ex[0] + (b[0] * yf + ccb[0])
                    l1 = ex[1] + (b[1] * yf + ccb[1])
                    l2 = ex[2] + (b[2] * yf + ccb[2])
                    zn = ex[3] + (b[3] * yf + ccb[3])
                    zd = ex[4] + (b[4] * yf + ccb[4])
                    covered = (l0 >= 0.0) & (l1 >= 0.0) & \
                        (l2 >= 0.0) & (zd > 0.0) & (zn > 0.0) & \
                        (zn <= zd)
                    z = zn / jnp.where(covered, zd, 1.0)
                    cand = jnp.where(covered, z, 0.0)
                    if attrs3 is not None:
                        exa_, ab_, ac_ = attrs3
                        ssum = l0 + l1 + l2
                        inv_s = 1.0 / jnp.where(covered, ssum, 1.0)
                        vals = [(exa_[k] + (ab_[k] * yf + ac_[k]))
                                * inv_s for k in range(n_attr)]
                    for g in range(rp):
                        rs = pl.ds(row_base + p * rp + g, 1)
                        cg = cand[g * cs:(g + 1) * cs, :]
                        if zclip_ref is not None:
                            # depth peel (see flat kernel): per-fragment
                            # clip before the winner max
                            cg = jnp.where(cg < zclip_ref[rs, :], cg,
                                           0.0)
                        best = jnp.max(cg, axis=0, keepdims=True)
                        winner = (cg == best) & (cg > 0.0)
                        pay_sel = jnp.max(jnp.where(winner, pay, 0),
                                          axis=0, keepdims=True)
                        acc_d = acc[0, rs, :]
                        acc_v = acc_v_scr[rs, :]
                        take = (best > acc_d) | \
                               ((best == acc_d) & (pay_sel > acc_v))
                        acc[0, rs, :] = jnp.where(take, best, acc_d)
                        acc_v_scr[rs, :] = jnp.where(take, pay_sel,
                                                     acc_v)
                        if attrs3 is not None:
                            for k in range(n_attr):
                                sel = jnp.max(
                                    jnp.where(
                                        winner,
                                        vals[k][g * cs:(g + 1) * cs,
                                                :], NEG),
                                    axis=0, keepdims=True)
                                acc[1 + k, rs, :] = jnp.where(
                                    take, sel, acc[1 + k, rs, :])
                    return 0

                jax.lax.fori_loop(p0, p1, pack_body, 0)

    def body(j, carry):
        slot = j % 2
        win = win_ref[start + j]

        @pl.when(j + 1 < count)
        def _prefetch():
            dma(j + 1, (j + 1) % 2).start()

        dma(j, slot).wait()
        # stage the live slot once per pair (see flat kernel)
        blk_scr[:, :] = coef_scr[slot, :, pl.ds(0, c.coef_rows)]

        for s in range(s_cnt):
            base = win * s_cnt + s
            y0 = jnp.clip(sy0_ref[base] - tile_py0, 0, c.tile_h)
            y1 = jnp.clip(sy1_ref[base] + 1 - tile_py0, 0, c.tile_h)
            sx0 = sx0_ref[base]
            sx1 = sx1_ref[base]
            # gate the whole subwindow (slices + hoists + brick loop):
            # empty subwindows cost one scalar compare (see flat kernel)
            xok_any = (sx1 >= tile_px0) & (sx0 < tile_px0 + c.tile_w)

            @pl.when((y1 > y0) & xok_any)
            def _subwindow(s=s, y0=y0, y1=y1, sx0=sx0, sx1=sx1):
                _bricks_subwindow(s, y0, y1, sx0, sx1)
        return carry

    jax.lax.fori_loop(0, count, body, 0)
    outs[0][:] = acc[0, :, :]
    outs[1][:] = jax.lax.bitcast_convert_type(acc_v_scr[:, :], jnp.uint32)
    for k in range(n_attr):
        outs[2 + k][:] = acc[1 + k, :, :]


def raster_queue(
    queue: WorkQueue,
    setup: TriangleSetup,
    config: RasterConfig,
    seeds: Optional[Tuple[jnp.ndarray, ...]] = None,
    zclip: Optional[jnp.ndarray] = None,
):
    """Stage 3 -> tuple of render targets (cropped to (H,W)):
    (depth f32 reverse-Z, visibility u32[, nx, ny, nz, u, v f32]).

    `seeds` (same tuple layout) carries a previous phase's targets through
    a re-raster (two-phase HZB occlusion, reference mesh_raster.cpp:269).
    `zclip` (needs config.z_clip) is a per-pixel (H,W) reverse-Z plane:
    fragments at or nearer than it are rejected — depth peeling for the
    second masked layer."""
    c = config
    # the packed row loop writes accumulator rows in sub_s groups; a
    # tile_h that is not a multiple of sub_s (or of the f32 sublane) would
    # index past the VMEM scratch — reject bad cvar combinations early
    if c.tile_h % 8 != 0 or c.tile_h % c.sub_s != 0:
        raise ValueError(
            f"tile_h={c.tile_h} must be a multiple of 8 and of "
            f"sub_s={c.sub_s} (set via r.raster.tileH)")
    if c.rp and (c.tile_h % c.rp != 0 or c.rp % 8 != 0):
        raise ValueError(
            f"rp={c.rp} must divide tile_h={c.tile_h} and be a "
            f"multiple of 8 (set via r.raster.rp)")
    if c.bricks and (c.tile_w % BRICK_W != 0 or
                     c.tile_h % (BRICK_H * c.sub_s) != 0):
        raise ValueError(
            f"bricks mode needs tile_w % {BRICK_W} == 0 and tile_h % "
            f"{BRICK_H * c.sub_s} == 0 (got {c.tile_w}x{c.tile_h})")
    h_pad = c.tiles_y * c.tile_h
    w_pad = c.tiles_x * c.tile_w
    n_attr = 5 if c.with_attrs else 0
    n_rt = 2 + n_attr

    def padded(x, fill, dtype):
        if x is None:
            return jnp.full((h_pad, w_pad), fill, dtype)
        return jnp.pad(x.astype(dtype),
                       ((0, h_pad - x.shape[0]), (0, w_pad - x.shape[1])))

    if seeds is None:
        seeds = (None,) * n_rt
    elif len(seeds) < n_rt:
        seeds = tuple(seeds) + (None,) * (n_rt - len(seeds))
    seed_arrays = [padded(seeds[0], 0.0, jnp.float32),
                   padded(seeds[1], 0, jnp.uint32)]
    for k in range(n_attr):
        seed_arrays.append(padded(seeds[2 + k], 0.0, jnp.float32))
    if c.z_clip:
        # default +inf = clip nothing (every fragment is nearer)
        zq = (jnp.full((h_pad, w_pad), 3e38, jnp.float32) if zclip is None
              else jnp.pad(zclip.astype(jnp.float32),
                           ((0, h_pad - zclip.shape[0]),
                            (0, w_pad - zclip.shape[1])),
                           constant_values=3e38))
        seed_arrays.append(zq)
    if c.bricks:
        with jax.named_scope("raster.bricks_pack"):
            seed_arrays = [bricks_pack(sa, c) for sa in seed_arrays]

    def tile_block(i, pw, st, ct, sy0, sy1, sx0, sx1):
        return (i // c.tiles_x, i % c.tiles_x)

    vmem_tile = pl.BlockSpec((c.tile_h, c.tile_w), tile_block,
                             memory_space=pltpu.VMEM)
    out_shapes = ([jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
                   jax.ShapeDtypeStruct((h_pad, w_pad), jnp.uint32)] +
                  [jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32)] * n_attr)
    # per-subwindow pixel bboxes for the dynamic row loops (poison entries
    # have y1 < y0 so slack windows cover no rows)
    if setup.sub_bounds is not None and \
            setup.sub_bounds.shape[1] == (setup.num_windows + 1) * c.sub_s:
        sb = setup.sub_bounds
    else:   # fall back to whole-window bounds replicated per subwindow
        rep = lambda v, pois: jnp.concatenate(
            [jnp.repeat(v, c.sub_s), jnp.full((c.sub_s,), pois, jnp.int32)])
        sb = jnp.stack([rep(setup.window_bbox[1], 1),
                        rep(setup.window_bbox[3], -1),
                        rep(setup.window_bbox[0], 1),
                        rep(setup.window_bbox[2], -1)], 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,   # pair_win, starts, counts, sy0/sy1/sx0/sx1
        grid=(c.n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] +     # coefT in HBM
                 [vmem_tile] * (n_rt + (1 if c.z_clip else 0)),
        out_specs=[vmem_tile] * n_rt,
        scratch_shapes=[
            pltpu.VMEM((2, WINDOW, COEF_LANES), jnp.uint32),
            pltpu.VMEM((WINDOW, c.coef_rows), jnp.uint32),
            pltpu.VMEM((1 + n_attr, c.tile_h, c.tile_w), jnp.float32),
            pltpu.VMEM((c.tile_h, c.tile_w), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = _raster_tile_kernel_bricks if c.bricks else _raster_tile_kernel
    rts = pl.pallas_call(
        functools.partial(kern, config=c),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        # CPU has no Mosaic backend — interpret there (tests/dry runs).
        interpret=c.interpret or jax.default_backend() == "cpu",
    )(queue.pair_win, queue.starts, queue.counts,
      sb[0], sb[1], sb[2], sb[3], setup.coefT, *seed_arrays)
    if c.bricks:
        with jax.named_scope("raster.bricks_unpack"):
            rts = [bricks_unpack(rt, c) for rt in rts]
    return tuple(rt[:c.height, :c.width] for rt in rts)
def rasterize(
    clip: jnp.ndarray,
    indices: jnp.ndarray,
    tri_valid: jnp.ndarray,
    payload: jnp.ndarray,
    config: RasterConfig,
    backface_cull: bool = True,
    seeds: Optional[Tuple[jnp.ndarray, ...]] = None,
    attrs: Optional[jnp.ndarray] = None,
    init_depth: Optional[jnp.ndarray] = None,   # legacy 2-target seeding
    init_vis: Optional[jnp.ndarray] = None,
    zclip: Optional[jnp.ndarray] = None,        # depth-peel plane
):
    """Full visibility raster: clip positions -> (render targets..., stats).

    Returns (depth, vis[, nx, ny, nz, u, v], stats). Triangle count is
    padded up to a multiple of 128 (window size).
    """
    t = indices.shape[0]
    pad = (-t) % WINDOW
    if pad:
        indices = jnp.concatenate(
            [indices, jnp.zeros((pad, 3), indices.dtype)], axis=0)
        tri_valid = jnp.concatenate(
            [tri_valid, jnp.zeros((pad,), tri_valid.dtype)], axis=0)
        payload = jnp.concatenate(
            [payload, jnp.zeros((pad,), payload.dtype)], axis=0)
    if seeds is None and init_depth is not None:
        seeds = (init_depth, init_vis)
    with jax.named_scope("raster.setup"):
        setup = setup_triangles(clip, indices, tri_valid, payload, config,
                                backface_cull=backface_cull, attrs=attrs)
    if config.subtiles:
        with jax.named_scope("raster.bin"):
            queue = bin_windows_subtile(setup, config)
        with jax.named_scope("raster.tiles"):
            rts = raster_queue_subtile(queue, setup, config, seeds=seeds)
    else:
        with jax.named_scope("raster.bin"):
            queue = bin_windows(setup, config)
        with jax.named_scope("raster.tiles"):
            rts = raster_queue(queue, setup, config, seeds=seeds,
                               zclip=zclip)
    stats = {"bin_overflow": queue.overflow,
             "drawn_tris": jnp.sum(setup.valid.astype(jnp.int32)),
             "binned_pairs": queue.n_pairs}
    return (*rts, stats)


class SubtileQueue(NamedTuple):
    """Grouped sub-tile work queue: rounds of 4 windows per screen tile."""

    gwin: jnp.ndarray         # (R_cap*4,) i32 grouped window ids (poison D)
    starts: jnp.ndarray       # (n_tiles,) i32 first round per tile
    counts: jnp.ndarray       # (n_tiles,) i32 rounds per tile
    y0r: jnp.ndarray          # (R_cap,) i32 per-round union y bbox
    y1r: jnp.ndarray
    n_pairs: jnp.ndarray      # () i32 binned pair count
    overflow: jnp.ndarray     # () i32 dropped pairs


def bin_windows_subtile(setup: TriangleSetup, config: RasterConfig
                        ) -> SubtileQueue:
    """Bin windows at 32px sub-tile granularity and group each tile's
    pairs into rounds of 4 (one slot per sub-tile lane group). The raster
    kernel then serves 4 windows per inner step, so narrow windows stop
    paying for the full 128-lane tile width."""
    c = config
    d = setup.num_windows
    st = 4                                  # sub-tiles per tile
    sub_w = c.tile_w // st
    n_sub = c.n_tiles * st
    bx0, by0, bx1, by1 = (setup.window_bbox[i] for i in range(4))
    gx0 = bx0 // sub_w
    gx1 = bx1 // sub_w
    ty0 = by0 // c.tile_h
    ty1 = by1 // c.tile_h
    span_x = gx1 - gx0 + 1
    span_y = ty1 - ty0 + 1
    ok = setup.window_valid & (bx1 >= bx0)
    k_sub = c.small_kx * st
    small = ok & (span_x <= k_sub) & (span_y <= c.small_ky)
    big = ok & ~small

    gxw = c.tiles_x * st
    invalid_key = jnp.int32(n_sub)
    win_ids = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)[:, 0]
    keys_l, vals_l = [], []
    for ky in range(c.small_ky):
        for kx in range(k_sub):
            tyk = ty0 + ky
            gxk = gx0 + kx
            hit = small & (tyk <= ty1) & (gxk <= gx1)
            keys_l.append(jnp.where(hit, tyk * gxw + gxk, invalid_key))
            vals_l.append(win_ids)

    big_cap = min(c.big_capacity, 128)
    big_rank = jnp.cumsum(big.astype(jnp.int32)) - 1
    n_big = jnp.sum(big.astype(jnp.int32))
    # exact dropped-pair count (see bin_windows): subwindow span of each
    # big window past capacity
    nt_big = jnp.where(big & (big_rank >= big_cap),
                       (gx1 - gx0 + 1) * (ty1 - ty0 + 1), 0)
    big_overflow_pairs = jnp.sum(nt_big).astype(jnp.int32)
    slot = jnp.where(big & (big_rank < big_cap), big_rank, big_cap)
    big_list = jnp.zeros((big_cap + 1,), jnp.int32).at[slot].set(
        win_ids, mode="drop")[:big_cap]
    have = jax.lax.broadcasted_iota(jnp.int32, (big_cap, 1), 0)[:, 0] < \
        jnp.minimum(n_big, big_cap)
    bl = jnp.where(have, big_list, 0)
    bgx0 = jnp.where(have, gx0[bl], gxw + 1)
    bty0 = jnp.where(have, ty0[bl], c.tiles_y + 1)
    bgx1 = jnp.where(have, gx1[bl], -1)
    bty1 = jnp.where(have, ty1[bl], -1)
    sub_ix = jax.lax.broadcasted_iota(jnp.int32, (big_cap, n_sub), 1)
    sgx = sub_ix % gxw
    sty = sub_ix // gxw
    overlap = ((sgx >= bgx0[:, None]) & (sgx <= bgx1[:, None]) &
               (sty >= bty0[:, None]) & (sty <= bty1[:, None]))
    keys_l.append(jnp.where(overlap, sub_ix, invalid_key).reshape(-1))
    vals_l.append(jnp.broadcast_to(bl[:, None],
                                   (big_cap, n_sub)).reshape(-1))

    keys = jnp.concatenate(keys_l)
    vals = jnp.concatenate(vals_l)
    keys_s, vals_s = jax.lax.sort_key_val(keys, vals)

    total = jnp.sum((keys_s < n_sub).astype(jnp.int32))
    cap = c.pair_capacity
    if keys_s.shape[0] < cap:
        pad = cap - keys_s.shape[0]
        keys_s = jnp.concatenate([keys_s, jnp.full((pad,), invalid_key)])
        vals_s = jnp.concatenate([vals_s, jnp.full((pad,), d, jnp.int32)])
    n_pairs = jnp.minimum(total, cap)
    overflow = jnp.maximum(total - cap, 0) + big_overflow_pairs
    pk = keys_s[:cap]
    pv = vals_s[:cap]

    # per-sub-tile segments
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (n_sub, 1), 0)[:, 0]
    sub_start = jnp.minimum(
        jnp.searchsorted(pk, sub_ids, side="left").astype(jnp.int32), cap)
    sub_end = jnp.minimum(
        jnp.searchsorted(pk, sub_ids, side="right").astype(jnp.int32),
        n_pairs)
    sub_cnt = jnp.maximum(sub_end - sub_start, 0)

    # rounds per tile = max over its 4 sub-tiles; note sub keys are
    # ty*gxw+gx: the 4 sub-tiles of screen tile (ty,tx) are gx=tx*4..+3,
    # contiguous in the key space
    cnt_t = sub_cnt.reshape(c.n_tiles, st)
    rounds_t = cnt_t.max(1)                            # (n_tiles,)
    r_cap = max(cap // st, 1)
    round_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(rounds_t)[:-1]])
    total_rounds = jnp.sum(rounds_t)
    overflow = overflow + jnp.maximum(total_rounds - r_cap, 0) * st

    g = jax.lax.broadcasted_iota(jnp.int32, (r_cap, 1), 0)[:, 0]
    t_of_g = jnp.clip(
        jnp.searchsorted(round_start, g, side="right").astype(jnp.int32) - 1,
        0, c.n_tiles - 1)
    r_loc = g - round_start[t_of_g]
    live = (g < jnp.minimum(total_rounds, r_cap)) & (r_loc < rounds_t[t_of_g])

    gwin_cols = []
    y0_all = jnp.concatenate([setup.window_bbox[1],
                              jnp.full((1,), 1 << 29, jnp.int32)])
    y1_all = jnp.concatenate([setup.window_bbox[3],
                              jnp.full((1,), -(1 << 29), jnp.int32)])
    y0r = jnp.full((r_cap,), 1 << 29, jnp.int32)
    y1r = jnp.full((r_cap,), -(1 << 29), jnp.int32)
    for sidx in range(st):
        sub = t_of_g * st + sidx
        src = jnp.clip(sub_start[sub] + r_loc, 0, cap - 1)
        has = live & (r_loc < sub_cnt[sub])
        win_s = jnp.where(has, pv[src], d)
        gwin_cols.append(win_s)
        y0r = jnp.minimum(y0r, jnp.where(has, y0_all[win_s], 1 << 29))
        y1r = jnp.maximum(y1r, jnp.where(has, y1_all[win_s], -(1 << 29)))
    gwin = jnp.stack(gwin_cols, axis=1).reshape(-1)    # (r_cap*4,)
    # empty rounds: y1 < y0 -> inner loop covers nothing
    y0r = jnp.clip(y0r, -1, 1 << 20)
    y1r = jnp.clip(y1r, -2, 1 << 20)

    counts_clamped = jnp.minimum(rounds_t,
                                 jnp.maximum(r_cap - round_start, 0))
    return SubtileQueue(gwin=gwin, starts=jnp.minimum(round_start, r_cap),
                        counts=jnp.maximum(counts_clamped, 0),
                        y0r=y0r, y1r=y1r, n_pairs=n_pairs,
                        overflow=overflow)


def _raster_tile_kernel_st(gwin_ref, start_ref, count_ref,
                           y0_ref, y1_ref,          # scalar prefetch
                           coef_hbm,                # (R,(D+1)*128) ANY
                           *refs,                   # seeds, outs, scratch
                           config: RasterConfig):
    """Sub-tile variant: each inner round rasterizes FOUR windows, one per
    32-lane group of the tile, by building lane-grouped coefficient planes
    (pltpu.repeat broadcast of a (C,4) column pack). Everything else —
    row bounds, accumulators, winner reduction — matches the base kernel;
    the winner max over sublanes never mixes windows because each lane
    group only ever holds its own window's coefficients."""
    c = config
    n_attr = 5 if c.with_attrs else 0
    n_rt = 2 + n_attr
    seeds = refs[:n_rt]
    outs = refs[n_rt:2 * n_rt]
    coef_scr, blk_scr, acc, acc_v_scr, sems = refs[2 * n_rt:]

    tile = pl.program_id(0)
    start = start_ref[tile]
    count = count_ref[tile]
    tile_ty = tile // c.tiles_x
    tile_tx = tile % c.tiles_x
    tile_py0 = tile_ty * c.tile_h

    acc[0, :, :] = seeds[0][:]
    acc_v_scr[:, :] = jax.lax.bitcast_convert_type(seeds[1][:], jnp.int32)
    for k in range(n_attr):
        acc[1 + k, :, :] = seeds[2 + k][:]

    def dma(j, sub, slot):
        win = gwin_ref[(start + j) * 4 + sub]
        return pltpu.make_async_copy(
            coef_hbm.at[pl.ds(win * WINDOW, WINDOW), :],
            coef_scr.at[slot, sub], sems.at[slot, sub])

    @pl.when(count > 0)
    def _warmup():
        for sub in range(4):
            dma(0, sub, 0).start()

    px = jax.lax.broadcasted_iota(jnp.int32, (1, c.tile_w), 1).astype(
        jnp.float32) + (tile_tx * c.tile_w).astype(jnp.float32)

    f32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
    NEG = jnp.float32(-3e38)

    def body(j, carry):
        slot = j % 2
        rid = start + j
        y0 = jnp.clip(y0_ref[rid] - tile_py0, 0, c.tile_h)
        y1 = jnp.clip(y1_ref[rid] + 1 - tile_py0, 0, c.tile_h)

        @pl.when(j + 1 < count)
        def _prefetch():
            for sub in range(4):
                dma(j + 1, sub, (j + 1) % 2).start()

        for sub in range(4):
            dma(j, sub, slot).wait()
            blk_scr[sub] = coef_scr[slot, sub, :, pl.ds(0, c.coef_rows)]
        blks = [blk_scr[sub] for sub in range(4)]          # (128, R) each

        li = jax.lax.broadcasted_iota(jnp.int32, (1, c.tile_w), 1)
        q = c.tile_w // 4
        g0, g1, g2 = li < q, li < 2 * q, li < 3 * q

        def lane_grouped(k):
            # element-repeat of the 4 windows' coefficient columns onto
            # their 32-lane groups ((C,1) lane-broadcasts + selects;
            # pltpu.repeat has tile semantics, not element-repeat)
            b0, b1 = blks[0][:, k:k + 1], blks[1][:, k:k + 1]
            b2, b3 = blks[2][:, k:k + 1], blks[3][:, k:k + 1]
            return jnp.where(g0, b0, jnp.where(g1, b1,
                             jnp.where(g2, b2, b3)))   # (C, TW)

        a = [f32(lane_grouped(k)) for k in range(5)]
        b_ = [f32(lane_grouped(5 + k)) for k in range(5)]
        cc = [f32(lane_grouped(10 + k)) for k in range(5)]
        pay = jax.lax.bitcast_convert_type(lane_grouped(15), jnp.int32)
        if n_attr:
            aa = [f32(lane_grouped(16 + 3 * k)) for k in range(n_attr)]
            ab = [f32(lane_grouped(17 + 3 * k)) for k in range(n_attr)]
            ac = [f32(lane_grouped(18 + 3 * k)) for k in range(n_attr)]

        ex = [a[k] * px for k in range(5)]
        if n_attr:
            exa = [aa[k] * px for k in range(n_attr)]

        def row_body(row, _):
            yf = (tile_py0 + row).astype(jnp.float32)
            l0 = ex[0] + (b_[0] * yf + cc[0])
            l1 = ex[1] + (b_[1] * yf + cc[1])
            l2 = ex[2] + (b_[2] * yf + cc[2])
            zn = ex[3] + (b_[3] * yf + cc[3])
            zd = ex[4] + (b_[4] * yf + cc[4])
            covered = (l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0) & \
                      (zd > 0.0) & (zn > 0.0) & (zn <= zd)
            z = zn / jnp.where(covered, zd, 1.0)
            cand = jnp.where(covered, z, 0.0)
            best = jnp.max(cand, axis=0, keepdims=True)
            winner = (cand == best) & (cand > 0.0)
            pay_sel = jnp.max(jnp.where(winner, pay, 0), axis=0,
                              keepdims=True)
            rs = pl.ds(row, 1)
            acc_d = acc[0, rs, :]
            acc_v = acc_v_scr[rs, :]
            better = best > acc_d
            tie = (best == acc_d) & (pay_sel > acc_v)
            take = better | tie
            acc[0, rs, :] = jnp.where(take, best, acc_d)
            acc_v_scr[rs, :] = jnp.where(take, pay_sel, acc_v)
            if n_attr:
                ssum = l0 + l1 + l2
                inv_s = 1.0 / jnp.where(covered, ssum, 1.0)
                for k in range(n_attr):
                    val = (exa[k] + (ab[k] * yf + ac[k])) * inv_s
                    sel = jnp.max(jnp.where(winner, val, NEG), axis=0,
                                  keepdims=True)
                    acc[1 + k, rs, :] = jnp.where(take, sel,
                                                  acc[1 + k, rs, :])
            return 0

        jax.lax.fori_loop(y0, y1, row_body, 0)
        return carry

    jax.lax.fori_loop(0, count, body, 0)
    outs[0][:] = acc[0, :, :]
    outs[1][:] = jax.lax.bitcast_convert_type(acc_v_scr[:, :], jnp.uint32)
    for k in range(n_attr):
        outs[2 + k][:] = acc[1 + k, :, :]


def raster_queue_subtile(
    queue: SubtileQueue,
    setup: TriangleSetup,
    config: RasterConfig,
    seeds=None,
):
    """Sub-tile raster driver (see bin_windows_subtile)."""
    c = config
    h_pad = c.tiles_y * c.tile_h
    w_pad = c.tiles_x * c.tile_w
    n_attr = 5 if c.with_attrs else 0
    n_rt = 2 + n_attr

    def padded(x, fill, dtype):
        if x is None:
            return jnp.full((h_pad, w_pad), fill, dtype)
        return jnp.pad(x.astype(dtype),
                       ((0, h_pad - x.shape[0]), (0, w_pad - x.shape[1])))

    if seeds is None:
        seeds = (None,) * n_rt
    elif len(seeds) < n_rt:
        seeds = tuple(seeds) + (None,) * (n_rt - len(seeds))
    seed_arrays = [padded(seeds[0], 0.0, jnp.float32),
                   padded(seeds[1], 0, jnp.uint32)]
    for k in range(n_attr):
        seed_arrays.append(padded(seeds[2 + k], 0.0, jnp.float32))

    def tile_block(i, gw, st_, ct, y0, y1):
        return (i // c.tiles_x, i % c.tiles_x)

    vmem_tile = pl.BlockSpec((c.tile_h, c.tile_w), tile_block,
                             memory_space=pltpu.VMEM)
    out_shapes = ([jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
                   jax.ShapeDtypeStruct((h_pad, w_pad), jnp.uint32)] +
                  [jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32)] * n_attr)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(c.n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] +
                 [vmem_tile] * n_rt,
        out_specs=[vmem_tile] * n_rt,
        scratch_shapes=[
            pltpu.VMEM((2, 4, WINDOW, COEF_LANES), jnp.uint32),
            pltpu.VMEM((4, WINDOW, c.coef_rows), jnp.uint32),
            pltpu.VMEM((1 + n_attr, c.tile_h, c.tile_w), jnp.float32),
            pltpu.VMEM((c.tile_h, c.tile_w), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    rts = pl.pallas_call(
        functools.partial(_raster_tile_kernel_st, config=c),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=c.interpret or jax.default_backend() == "cpu",
    )(queue.gwin, queue.starts, queue.counts, queue.y0r, queue.y1r,
      setup.coefT, *seed_arrays)
    return tuple(rt[:c.height, :c.width] for rt in rts)


# ---------------------------------------------------------------------------
# NumPy oracle (tests only): same math, scalar loops.
# ---------------------------------------------------------------------------

def rasterize_oracle(clip: np.ndarray, indices: np.ndarray, tri_valid: np.ndarray,
                     payload: np.ndarray, width: int, height: int,
                     backface_cull: bool = True):
    """Matches the kernel's homogeneous-rasterization math (same f32
    coefficient construction evaluated at integer pixel coords), so only
    instruction-level rounding differs."""
    depth = np.zeros((height, width), np.float32)
    vis = np.zeros((height, width), np.uint32)
    clip = clip.astype(np.float32)
    f32 = np.float32
    eps_w = 1e-6
    for t in range(len(indices)):
        if not tri_valid[t]:
            continue
        v = clip[indices[t]]
        X = (v[:, 0] * f32(0.5) + v[:, 3] * f32(0.5)) * f32(width)
        Y = (v[:, 3] * f32(0.5) - v[:, 1] * f32(0.5)) * f32(height)
        W = v[:, 3].copy()
        Z = v[:, 2].copy()
        if not np.any(W > eps_w):
            continue
        for k in range(3):
            s = f32(1.0) / max(abs(X[k]), abs(Y[k]), abs(W[k]), eps_w)
            X[k], Y[k], W[k], Z[k] = X[k] * s, Y[k] * s, W[k] * s, Z[k] * s
        rows = np.stack([X, Y, W], axis=1)  # (3 verts, 3)
        l = np.empty((3, 3), f32)
        l[0] = np.cross(rows[1], rows[2])
        l[1] = np.cross(rows[2], rows[0])
        l[2] = np.cross(rows[0], rows[1])
        det = float(np.dot(rows[0], l[0]))
        if det == 0.0:
            continue
        if backface_cull and det >= 0:
            continue
        if det < 0:
            l = -l
        Nc = (l[0] * Z[0] + l[1] * Z[1] + l[2] * Z[2]).astype(f32)
        Dc = (l[0] * W[0] + l[1] * W[1] + l[2] * W[2]).astype(f32)
        l[:, 2] += f32(0.5) * l[:, 0] + f32(0.5) * l[:, 1]
        Nc[2] += f32(0.5) * Nc[0] + f32(0.5) * Nc[1]
        Dc[2] += f32(0.5) * Dc[0] + f32(0.5) * Dc[1]
        if np.all(W > eps_w):
            sx = X / W
            sy = Y / W
            x0 = max(int(np.floor(sx.min())), 0)
            x1 = min(int(np.ceil(sx.max())), width - 1)
            y0 = max(int(np.floor(sy.min())), 0)
            y1 = min(int(np.ceil(sy.max())), height - 1)
        else:
            x0, x1, y0, y1 = 0, width - 1, 0, height - 1
        for pyi in range(y0, y1 + 1):
            for pxi in range(x0, x1 + 1):
                px, py = f32(pxi), f32(pyi)
                lam = l[:, 0] * px + l[:, 1] * py + l[:, 2]
                if np.all(lam >= 0):
                    zn = Nc[0] * px + Nc[1] * py + Nc[2]
                    zd = Dc[0] * px + Dc[1] * py + Dc[2]
                    if zd > 0 and zn > 0 and zn <= zd:
                        z = zn / zd
                        if (z > depth[pyi, pxi] or
                                (z == depth[pyi, pxi] and payload[t] > vis[pyi, pxi])):
                            depth[pyi, pxi] = z
                            vis[pyi, pxi] = payload[t]
    return depth, vis
