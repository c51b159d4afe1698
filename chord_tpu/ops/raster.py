"""Tiled software visibility-buffer rasterizer.

The TPU replacement for the reference's hardware mesh-shader raster pass
(reference: install/resource/shader/mesh_raster.hlsl:51-209 — vertex
transform, per-triangle culls, SV_CullPrimitive, PS writes packed
`(instanceId+1):25|triangleId:7` into an R32_UINT visibility target + depth).

TPUs have no ROPs and no atomics usable from XLA, so depth-correct raster is
restructured as three data-parallel stages with static shapes:

1. **setup**: per-triangle screen-space edge equations + affine depth plane,
   normalized by twice the signed area so `edge >= 0` means inside for
   front faces. Backface/near-plane/degenerate/zero-area culls happen here
   (the same trivial rejections mesh_raster.hlsl does per-primitive).
2. **bin**: triangles → screen tiles (TH×TW pixels). Small triangles expand
   to at most KY×KX tile slots; rare tile-spanning "big" triangles are
   compacted into a separate list and expanded against the whole tile grid.
   All (tile, tri) pairs are sorted by tile id (lax.sort_key_val) and
   gathered into a dense (n_tiles, capacity) bin matrix. Overflow is
   *counted and reported*, never silent.
3. **tile raster** (Pallas kernel): grid over (tiles, capacity chunks); each
   step evaluates edges+depth for a chunk of C triangles over all TH*TW
   pixels with ONE MXU matmul `pix(P,3) @ coef(3,4C)`, resolves cover/depth,
   and folds a running (max-depth, payload) pair into the output block.
   Reverse-Z: larger depth wins; exact depth ties resolve to the larger
   payload, which makes the output deterministic (the Vulkan reference's
   depth-test races are *not* deterministic — we beat it there).

Coordinate conventions are documented in chord_tpu.utils.math.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import chex
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class RasterConfig(NamedTuple):
    """Static raster parameters (fold into jit static args)."""

    width: int
    height: int
    tile_h: int = 8
    tile_w: int = 128
    bin_capacity: int = 1024      # max triangles per tile
    chunk: int = 128              # triangles per kernel step
    small_ky: int = 4             # small-path tile rows
    small_kx: int = 2             # small-path tile cols
    big_capacity: int = 256      # max tile-spanning triangles
    interpret: bool = False       # pallas interpreter (CPU tests)

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_h)

    @property
    def n_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def chunk_eff(self) -> int:
        """Triangles per kernel step, clamped to the bin capacity (a chunk
        larger than the bin would make the per-tile block index collapse to
        0 and alias every tile onto tile 0's bin)."""
        c = min(self.chunk, self.bin_capacity)
        assert self.bin_capacity % c == 0, \
            f"bin_capacity {self.bin_capacity} not a multiple of chunk {c}"
        return c

    @property
    def n_chunks(self) -> int:
        return self.bin_capacity // self.chunk_eff


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
    Coverage: λ0>=0 & λ1>=0 & λ2>=0 & D>0 & N<=D (the near plane becomes a
    pixel test).

    coef16 row layout (one row per triangle, poison row at index T):
    [λ0a,λ1a,λ2a,Na,Da, λ0b,λ1b,λ2b,Nb,Db, λ0c,λ1c,λ2c,Nc,Dc, payload]
    where each linear function evaluates as f(p) = fa*px + fb*py + fc.
    Rows are uint32 (f32 bit patterns + raw payload bits — payload would
    be denormal-flushed if it ever existed as f32). Row gathers of (N,16)
    are the fast gather path on TPU (element gathers are ~50x slower).
    """

    coef16: jnp.ndarray    # (T+1,16) uint32 (f32 bit patterns + raw payload)
    payload: jnp.ndarray   # (T,) uint32, 0 = never written
    bbox: jnp.ndarray      # (4,T) i32 pixel bbox [x0,y0,x1,y1] inclusive, clamped
    valid: jnp.ndarray     # (T,) bool


def setup_triangles(
    clip: jnp.ndarray,        # (V,4) f32 clip positions (row-vector convention)
    indices: jnp.ndarray,     # (T,3) i32
    tri_valid: jnp.ndarray,   # (T,) bool
    payload: jnp.ndarray,     # (T,) uint32
    config: RasterConfig,
    backface_cull: bool = True,
) -> TriangleSetup:
    """Stage 1: clip positions → homogeneous coverage/depth functions.

    No near clipping: triangles with w<=0 vertices get full-screen bboxes
    (routed to the big-triangle bin path) and rasterize correctly through
    the cofactor formulation. (The reference relies on hardware clipping,
    mesh_raster.hlsl culls only fully-behind triangles.)
    """
    w, h = config.width, config.height
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
        # cross((ax,ay,aw),(bx,by,bw)) → coefficients (ca, cb, cc) of the
        # linear function ca*px + cb*py + cc.
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

    # Sample at pixel centers: fold the +0.5 offsets into the c coefficient.
    def center(f):
        return (f[0], f[1], f[2] + 0.5 * f[0] + 0.5 * f[1])

    l0, l1, l2, N, D = center(l0), center(l1), center(l2), center(N), center(D)

    # Pixel bbox. Fully-in-front triangles get their projected bbox;
    # eye-plane-crossing triangles are unbounded → full screen (big path).
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
    # Only safe when the bbox is exact (all vertices in front).
    covers_center = jnp.where(
        all_front,
        (jnp.ceil(xmin - 0.5) <= jnp.floor(xmax - 0.5)) &
        (jnp.ceil(ymin - 0.5) <= jnp.floor(ymax - 0.5)),
        True)
    # A triangle entirely behind the eye never covers (D(p) <= 0 everywhere);
    # cull it here to keep it out of the bins.
    any_front = (w0 > eps_w) | (w1 > eps_w) | (w2 > eps_w)

    valid = (tri_valid & front & (~degenerate) & onscreen & covers_center &
             any_front)

    payload = jnp.where(valid, payload, jnp.uint32(0))
    # The packed row is uint32: f32 coefficient bits + raw payload bits.
    # Payload bit patterns are usually denormal as floats and TPU f32
    # data movement can flush denormals — so the row NEVER exists as f32.
    bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.uint32)
    coef16 = jnp.stack(
        [bc(l0[0]), bc(l1[0]), bc(l2[0]), bc(N[0]), bc(D[0]),
         bc(l0[1]), bc(l1[1]), bc(l2[1]), bc(N[1]), bc(D[1]),
         bc(l0[2]), bc(l1[2]), bc(l2[2]), bc(N[2]), bc(D[2]),
         payload], axis=1)                                      # (T,16) u32
    # Invalid triangles: poison coverage (λ c = -1, a = b = 0 → λ < 0).
    neg1 = np.float32(-1.0).view(np.uint32)
    poison = jnp.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                        neg1, neg1, neg1, 0, 0, 0], jnp.uint32)
    coef16 = jnp.where(valid[:, None], coef16, poison[None, :])
    coef16 = jnp.concatenate([coef16, poison[None, :]], axis=0)  # (T+1,16)
    bbox = jnp.stack([ix0, iy0, ix1, iy1], axis=0)
    return TriangleSetup(coef16=coef16, payload=payload, bbox=bbox, valid=valid)


def bin_triangles(
    setup: TriangleSetup, config: RasterConfig
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stage 2: → (bins (n_tiles, cap) i32 tri ids (T = empty/poison),
    counts (n_tiles,) i32, overflow () i32 dropped pair count)."""
    c = config
    t = setup.bbox.shape[1]
    tx0 = setup.bbox[0] // c.tile_w
    ty0 = setup.bbox[1] // c.tile_h
    tx1 = setup.bbox[2] // c.tile_w
    ty1 = setup.bbox[3] // c.tile_h
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    small = setup.valid & (span_x <= c.small_kx) & (span_y <= c.small_ky)
    big = setup.valid & ~small

    invalid_key = jnp.int32(c.n_tiles)  # sorts to the end

    # Small path: static KY×KX slot expansion.
    keys_small = []
    vals_small = []
    tri_ids = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)[:, 0]
    for ky in range(c.small_ky):
        for kx in range(c.small_kx):
            tyk = ty0 + ky
            txk = tx0 + kx
            ok = small & (tyk <= ty1) & (txk <= tx1)
            key = jnp.where(ok, tyk * c.tiles_x + txk, invalid_key)
            keys_small.append(key)
            vals_small.append(tri_ids)

    # Big path: compact big triangles to a fixed-capacity list, then expand
    # against every tile (bbox overlap test). Big triangles are rare (floors,
    # walls); overflow beyond big_capacity is counted and dropped.
    big_rank = jnp.cumsum(big.astype(jnp.int32)) - 1
    n_big = jnp.sum(big.astype(jnp.int32))
    big_overflow_tris = jnp.maximum(n_big - c.big_capacity, 0)
    big_slot = jnp.where(big & (big_rank < c.big_capacity), big_rank, -1)
    big_list = jnp.full((c.big_capacity,), -1, jnp.int32)
    scatter_idx = jnp.where(big_slot >= 0, big_slot, c.big_capacity)
    big_list = jnp.zeros((c.big_capacity + 1,), jnp.int32).at[scatter_idx].set(
        tri_ids, mode="drop")[:c.big_capacity]
    big_count_mask = jax.lax.broadcasted_iota(
        jnp.int32, (c.big_capacity, 1), 0)[:, 0] < jnp.minimum(n_big, c.big_capacity)

    bl = jnp.where(big_count_mask, big_list, 0)
    btx0 = jnp.where(big_count_mask, tx0[bl], c.tiles_x + 1)
    bty0 = jnp.where(big_count_mask, ty0[bl], c.tiles_y + 1)
    btx1 = jnp.where(big_count_mask, tx1[bl], -1)
    bty1 = jnp.where(big_count_mask, ty1[bl], -1)
    tile_ix = jax.lax.broadcasted_iota(jnp.int32, (c.big_capacity, c.n_tiles), 1)
    tile_tx = tile_ix % c.tiles_x
    tile_ty = tile_ix // c.tiles_x
    overlap = (tile_tx >= btx0[:, None]) & (tile_tx <= btx1[:, None]) & \
              (tile_ty >= bty0[:, None]) & (tile_ty <= bty1[:, None])
    keys_big = jnp.where(overlap, tile_ix, invalid_key).reshape(-1)
    vals_big = jnp.broadcast_to(bl[:, None],
                                (c.big_capacity, c.n_tiles)).reshape(-1)

    # 1D concat (pair order is irrelevant — the sort normalizes it).
    keys = jnp.concatenate(keys_small + [keys_big])
    vals = jnp.concatenate(vals_small + [vals_big])

    keys_sorted, vals_sorted = jax.lax.sort_key_val(keys, vals)

    # Per-tile segment boundaries.
    tile_ids = jax.lax.broadcasted_iota(jnp.int32, (c.n_tiles, 1), 0)[:, 0]
    starts = jnp.searchsorted(keys_sorted, tile_ids, side="left")
    ends = jnp.searchsorted(keys_sorted, tile_ids, side="right")
    counts = ends - starts
    overflow = jnp.sum(jnp.maximum(counts - c.bin_capacity, 0)) + \
        big_overflow_tris * 8  # big tris can shade many tiles; weight it
    counts_c = jnp.minimum(counts, c.bin_capacity)

    slot = jax.lax.broadcasted_iota(jnp.int32, (c.n_tiles, c.bin_capacity), 1)
    pos = starts[:, None] + slot
    in_range = slot < counts_c[:, None]
    pos = jnp.clip(pos, 0, keys.shape[0] - 1)
    bins = jnp.where(in_range, vals_sorted[pos], t)   # t = poison slot
    return bins, counts_c, overflow


def _raster_kernel(counts_ref, coef_ref, depth_ref, vis_ref,
                   *, config: RasterConfig):
    """Pallas kernel: one (tile, chunk) grid step.

    coef block (C, 16): per-triangle rows; lanes 0-3 = a-coeffs
    [e0,e1,e2,z], 4-7 = b-coeffs, 8-11 = c-coeffs, 12 = payload bits
    (int32 bitcast to f32). Triangles live on sublanes; pixels are
    processed one tile row (TW lanes) at a time — no cross-layout
    reshapes anywhere.
    """
    c = config
    tile = pl.program_id(0)
    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _init():
        depth_ref[:] = jnp.zeros_like(depth_ref)
        vis_ref[:] = jnp.zeros_like(vis_ref)

    count = counts_ref[tile]

    @pl.when(chunk * c.chunk_eff < count)
    def _work():
        tile_ty = tile // c.tiles_x
        tile_tx = tile % c.tiles_x

        blk = jnp.transpose(coef_ref[:])         # (16, C) → (C, 16) u32
        f32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        a = [f32(blk[:, j:j + 1]) for j in range(5)]     # (C,1) each
        b = [f32(blk[:, 5 + j:6 + j]) for j in range(5)]
        cc = [f32(blk[:, 10 + j:11 + j]) for j in range(5)]
        pay = jax.lax.bitcast_convert_type(blk[:, 15:16], jnp.int32)  # (C,1)

        # Pixel x coordinates for this tile: one row of TW lanes.
        px = jax.lax.broadcasted_iota(jnp.int32, (1, c.tile_w), 1).astype(
            jnp.float32) + (tile_tx * c.tile_w).astype(jnp.float32)  # (1, TW)

        # All f32 VPU math — edge functions cannot survive the MXU's bf16
        # input decomposition.
        ex = [a[j] * px for j in range(5)]   # (C, TW) x terms, reused per row

        cur_d = depth_ref[:]
        cur_v = vis_ref[:]
        rows_d = []
        rows_v = []
        for row in range(c.tile_h):
            y = (tile_ty * c.tile_h + row)
            yf = jnp.float32(y)
            l0 = ex[0] + (b[0] * yf + cc[0])
            l1 = ex[1] + (b[1] * yf + cc[1])
            l2 = ex[2] + (b[2] * yf + cc[2])
            zn = ex[3] + (b[3] * yf + cc[3])
            zd = ex[4] + (b[4] * yf + cc[4])
            covered = (l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0) & \
                      (zd > 0.0) & (zn > 0.0) & (zn <= zd)
            z = zn / jnp.where(covered, zd, 1.0)
            cand = jnp.where(covered, z, 0.0)               # (C, TW)
            best = jnp.max(cand, axis=0, keepdims=True)     # (1, TW)
            winner = (cand == best) & (cand > 0.0)
            pay_sel = jnp.max(jnp.where(winner, pay, 0), axis=0,
                              keepdims=True)                # (1, TW)
            rows_d.append(best)
            rows_v.append(pay_sel)

        best2 = jnp.concatenate(rows_d, axis=0)             # (TH, TW)
        pay2 = jnp.concatenate(rows_v, axis=0).astype(jnp.uint32)
        better = best2 > cur_d
        tie = (best2 == cur_d) & (pay2 > cur_v)
        take = better | tie
        depth_ref[:] = jnp.where(take, best2, cur_d)
        vis_ref[:] = jnp.where(take, pay2, cur_v)


def raster_tiles(
    bins: jnp.ndarray,       # (n_tiles, cap) i32
    counts: jnp.ndarray,     # (n_tiles,) i32
    setup: TriangleSetup,
    config: RasterConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stage 3: → (depth (H,W) f32 reverse-Z, visibility (H,W) u32)."""
    c = config
    flat = bins.reshape(-1)     # (n_tiles*cap,), poison index = T
    # One row-gather (the fast TPU gather path) + fused transpose →
    # kernel layout (16, n_tiles*cap) with (16, chunk) blocks.
    coef_k = setup.coef16[flat].T

    h_pad = c.tiles_y * c.tile_h
    w_pad = c.tiles_x * c.tile_w

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,   # counts (n_tiles,) in SMEM
        grid=(c.n_tiles, c.n_chunks),
        in_specs=[
            pl.BlockSpec((16, c.chunk_eff),
                         lambda t, k, counts: (0, t * c.n_chunks + k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (c.tile_h, c.tile_w),
                lambda t, k, counts: (t // c.tiles_x, t % c.tiles_x),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (c.tile_h, c.tile_w),
                lambda t, k, counts: (t // c.tiles_x, t % c.tiles_x),
                memory_space=pltpu.VMEM),
        ],
    )
    depth, vis = pl.pallas_call(
        functools.partial(_raster_kernel, config=c),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.uint32),
        ],
        # CPU has no Mosaic backend — fall back to the interpreter so the
        # same code runs under tests / virtual-device dry runs.
        interpret=c.interpret or jax.default_backend() == "cpu",
    )(counts, coef_k)
    return depth[:c.height, :c.width], vis[:c.height, :c.width]


def rasterize(
    clip: jnp.ndarray,
    indices: jnp.ndarray,
    tri_valid: jnp.ndarray,
    payload: jnp.ndarray,
    config: RasterConfig,
    backface_cull: bool = True,
):
    """Full visibility raster: clip positions → (depth, visibility, stats)."""
    with jax.named_scope("raster.setup"):
        setup = setup_triangles(clip, indices, tri_valid, payload, config,
                                backface_cull=backface_cull)
    with jax.named_scope("raster.bin"):
        bins, counts, overflow = bin_triangles(setup, config)
    with jax.named_scope("raster.tiles"):
        depth, vis = raster_tiles(bins, counts, setup, config)
    stats = {"bin_overflow": overflow,
             "drawn_tris": jnp.sum(setup.valid.astype(jnp.int32)),
             "binned_pairs": jnp.sum(counts)}
    return depth, vis, stats


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
        # fold pixel-center offset
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
