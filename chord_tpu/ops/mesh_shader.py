"""Mesh-shader kernel: fused draw expansion + triangle setup in Pallas.

The TPU equivalent of the reference's mesh-shader vertex/primitive phase
(reference: install/resource/shader/mesh_raster.hlsl:51-120 — per visible
meshlet: transform vertices, compute per-triangle culls, emit primitives).
One grid step = one visible draw (instance, meshlet):

- DMA the meshlet's corner-major geometry block (zero gathers — corners
  were laid out lane-aligned with triangles at build time,
  rhi/meshlet_scene.py mv_posT/mv_attrT),
- transform corners local -> clip with the draw's matrix (scalar-prefetch),
- run the full homogeneous triangle setup (Olano-Greer cofactors, culls,
  depth planes, attribute planes, pixel bbox — the same math as
  ops/raster.py setup_triangles) on (1,128) lanes,
- write one (128, 32) triangle-major coefficient block consumed directly
  by the raster kernel (transposed ONCE here, per window — the r4 layout
  made the raster kernel transpose per PAIR at ~2.6us each) plus an
  (8, 128) metadata block (valid + pixel bbox) for the host-side
  window-bbox / sub-bounds reductions.

Work is proportional to the ACTUAL draw count: slack grid steps skip the
math and emit poison blocks. This replaces the XLA expand_draws +
setup_triangles pair whose cost scaled with draw CAPACITY (gathers +
full-size elementwise chains).

Coefficient lane layout (R = 32, one row per triangle):
    0-4    λ0a λ1a λ2a Na Da        (x coefficients of the 5 raster planes)
    5-9    *b                        (y coefficients)
    10-14  *c                        (constants, pixel-center folded)
    15     payload u32 (slot+1):25 | tri:7
    16-30  attribute numerator planes: 5 attrs x (a,b,c)
    31     pad
Meta row layout (8 rows, lanes = triangles):
    0      valid flag (f32 0/1)
    1-4    pixel bbox ix0, iy0, ix1, iy1 (f32, clamped to screen)
    5-7    pad
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import COEF_LANES, TriangleSetup, WINDOW, _sub_bounds

COEF_ROWS = 32
META_ROWS = 8

_POISON_COEF = np.zeros(COEF_LANES, np.uint32)
_POISON_COEF[10:13] = np.float32(-1.0).view(np.uint32)


def _mesh_shader_kernel(dm_ref, tcnt_ref, count_ref,
                        mat_ref, pos_ref, attr_ref, coef_ref, meta_ref,
                        *, width: int, height: int, payload_base: int,
                        backface_cull: bool, sort_tris: bool):
    i = pl.program_id(0)
    count = count_ref[0]
    eps_w = 1e-6
    f32 = jnp.float32
    bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.uint32)

    @pl.when(i >= count)
    def _poison():
        # poison block without a captured array constant (Mosaic kernels
        # cannot close over device arrays): λc lanes 10..12 = -1.0f
        neg1 = np.float32(-1.0).view(np.uint32).item()
        lane_c = jax.lax.broadcasted_iota(jnp.int32,
                                          (WINDOW, COEF_LANES), 1)
        coef_ref[:] = jnp.where((lane_c >= 10) & (lane_c < 13),
                                jnp.uint32(neg1), jnp.uint32(0))
        meta_ref[:] = jnp.zeros((META_ROWS, WINDOW), jnp.uint32)

    @pl.when(i < count)
    def _work():
        # per-draw matrices ride an (8,128) VMEM block (8 draws per
        # block): 16 floats of local_to_clip + 9 of the normal matrix,
        # read as (1,1) broadcasts from this draw's row
        mrow = pl.ds(i % 8, 1)
        m = [[mat_ref[mrow, r * 4 + c:r * 4 + c + 1] for c in range(4)]
             for r in range(4)]
        nm = [[mat_ref[mrow, 16 + r * 3 + c:17 + r * 3 + c]
               for c in range(3)] for r in range(3)]

        def corner(k):
            x = pos_ref[4 * k, :][None, :]
            y = pos_ref[4 * k + 1, :][None, :]
            z = pos_ref[4 * k + 2, :][None, :]
            # row-vector homogeneous transform (w_local = 1)
            cx = x * m[0][0] + y * m[1][0] + z * m[2][0] + m[3][0]
            cy = x * m[0][1] + y * m[1][1] + z * m[2][1] + m[3][1]
            cz = x * m[0][2] + y * m[1][2] + z * m[2][2] + m[3][2]
            cw = x * m[0][3] + y * m[1][3] + z * m[2][3] + m[3][3]
            # fold viewport: homogeneous screen coords
            X = (cx * 0.5 + cw * 0.5) * width
            Y = (cw * 0.5 - cy * 0.5) * height
            s = 1.0 / jnp.maximum(
                jnp.maximum(jnp.abs(X), jnp.abs(Y)),
                jnp.maximum(jnp.abs(cw), eps_w))
            return X * s, Y * s, cw * s, cz * s, cw

        X0, Y0, w0, z0, rw0 = corner(0)
        X1, Y1, w1, z1, rw1 = corner(1)
        X2, Y2, w2, z2, rw2 = corner(2)

        def cross3(ax, ay, aw, bx, by, bw):
            return (ay * bw - aw * by, aw * bx - ax * bw,
                    ax * by - ay * bx)

        l0 = cross3(X1, Y1, w1, X2, Y2, w2)
        l1 = cross3(X2, Y2, w2, X0, Y0, w0)
        l2 = cross3(X0, Y0, w0, X1, Y1, w1)
        det = X0 * l0[0] + Y0 * l0[1] + w0 * l0[2]
        flip = jnp.where(det < 0.0, -1.0, 1.0)
        if backface_cull:
            # two-sided materials (mat row slot 25) keep back faces —
            # the reference's TwoSided raster permutation
            # (mesh_raster.cpp:54-56)
            two_sided = mat_ref[mrow, 25:26] > 0.5
            front = (det < 0.0) | (two_sided & (det != 0.0))
        else:
            front = det != 0.0
        l0 = tuple(flip * v for v in l0)
        l1 = tuple(flip * v for v in l1)
        l2 = tuple(flip * v for v in l2)
        N = tuple(l0[k] * z0 + l1[k] * z1 + l2[k] * z2 for k in range(3))
        D = tuple(l0[k] * w0 + l1[k] * w1 + l2[k] * w2 for k in range(3))

        def center(f):
            return (f[0], f[1], f[2] + 0.5 * f[0] + 0.5 * f[1])

        l0, l1, l2 = center(l0), center(l1), center(l2)
        N, D = center(N), center(D)

        # pixel bbox (full screen when a corner crosses the eye plane)
        all_front = (rw0 > eps_w) & (rw1 > eps_w) & (rw2 > eps_w)
        iw0 = 1.0 / jnp.where(rw0 > eps_w, w0, 1.0)
        iw1 = 1.0 / jnp.where(rw1 > eps_w, w1, 1.0)
        iw2 = 1.0 / jnp.where(rw2 > eps_w, w2, 1.0)
        sx0, sx1, sx2 = X0 * iw0, X1 * iw1, X2 * iw2
        sy0, sy1, sy2 = Y0 * iw0, Y1 * iw1, Y2 * iw2
        xmin = jnp.minimum(jnp.minimum(sx0, sx1), sx2)
        xmax = jnp.maximum(jnp.maximum(sx0, sx1), sx2)
        ymin = jnp.minimum(jnp.minimum(sy0, sy1), sy2)
        ymax = jnp.maximum(jnp.maximum(sy0, sy1), sy2)
        xmin = jnp.where(all_front, xmin, 0.0)
        xmax = jnp.where(all_front, xmax, f32(width))
        ymin = jnp.where(all_front, ymin, 0.0)
        ymax = jnp.where(all_front, ymax, f32(height))
        ix0 = jnp.clip(jnp.floor(xmin), 0.0, f32(width - 1))
        ix1 = jnp.clip(jnp.ceil(xmax), 0.0, f32(width - 1))
        iy0 = jnp.clip(jnp.floor(ymin), 0.0, f32(height - 1))
        iy1 = jnp.clip(jnp.ceil(ymax), 0.0, f32(height - 1))

        onscreen = (xmax >= 0.0) & (xmin < f32(width)) & \
                   (ymax >= 0.0) & (ymin < f32(height))
        covers_center = (~all_front) | (
            (jnp.ceil(xmin - 0.5) <= jnp.floor(xmax - 0.5)) &
            (jnp.ceil(ymin - 0.5) <= jnp.floor(ymax - 0.5)))
        any_front = (rw0 > eps_w) | (rw1 > eps_w) | (rw2 > eps_w)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, WINDOW), 1)
        tri_ok = lane < tcnt_ref[i]
        valid = (tri_ok & front & (det != 0.0) & onscreen &
                 covers_center & any_front)

        pay_i = jnp.where(valid,
                          ((i + payload_base + 1) * 128) + lane, 0)
        payload = jax.lax.bitcast_convert_type(pay_i, jnp.uint32)

        # attribute numerator planes: attrs are per-corner rows
        # [n0x n0y n0z u0 v0 | n1... | n2...]; normals go through the
        # draw's normal matrix (row-vector n' = n @ NM)
        def attr_corner(base_row):
            nx = attr_ref[base_row, :][None, :]
            ny = attr_ref[base_row + 1, :][None, :]
            nz = attr_ref[base_row + 2, :][None, :]
            u = attr_ref[base_row + 3, :][None, :]
            v = attr_ref[base_row + 4, :][None, :]
            tx = nx * nm[0][0] + ny * nm[1][0] + nz * nm[2][0]
            ty = nx * nm[0][1] + ny * nm[1][1] + nz * nm[2][1]
            tz = nx * nm[0][2] + ny * nm[1][2] + nz * nm[2][2]
            return (tx, ty, tz, u, v)

        a0 = attr_corner(0)
        a1 = attr_corner(5)
        a2 = attr_corner(10)

        validf = valid.astype(jnp.float32)
        poison_c = jnp.where(valid, 0.0, -1.0)
        raster_rows = [l0[0], l1[0], l2[0], N[0], D[0],
                       l0[1], l1[1], l2[1], N[1], D[1],
                       l0[2], l1[2], l2[2], N[2], D[2]]
        out_rows = []
        for r in range(COEF_ROWS):
            if r < 10:
                out_rows.append(bc(raster_rows[r] * validf))
            elif r < 15:
                # poison the constant rows of invalid lanes (λc = -1)
                out_rows.append(bc(
                    jnp.where(valid, raster_rows[r], poison_c)))
            elif r == 15:
                out_rows.append(payload)
            elif r < 31:
                k = (r - 16) // 3
                comp = (r - 16) % 3
                attr_k = (a0[k], a1[k], a2[k])
                plane = (attr_k[0] * l0[comp] + attr_k[1] * l1[comp] +
                         attr_k[2] * l2[comp])
                out_rows.append(bc(plane * validf))
            else:
                out_rows.append(jnp.zeros((1, WINDOW), jnp.uint32))
        blk = jnp.concatenate(out_rows, axis=0)            # (R, 128) u32
        meta = jnp.concatenate(
            [bc(validf),
             bc(jnp.where(valid, ix0, 1e9)),
             bc(jnp.where(valid, iy0, 1e9)),
             bc(jnp.where(valid, ix1, -1.0)),
             bc(jnp.where(valid, iy1, -1.0)),
             jnp.zeros((META_ROWS - 5, WINDOW), jnp.uint32)],
            axis=0)                                        # (8, 128) u32

        if sort_tris:
            # In-window counting sort by (invalid, y-bucket, x-bucket):
            # invalid triangles compact to the TAIL (their subwindows end
            # up empty -> the raster kernel's per-subwindow bounds skip
            # them entirely), and each surviving 128/S-triangle group
            # becomes spatially tight, shrinking its row loop. The
            # permutation is applied with one-hot MXU matmuls on exact
            # 16-bit halves (bit patterns can't ride f32 matmuls whole:
            # 24-bit bf16x3 mantissa; two u16 halves are exact).
            # y multiplier = number of 32px x-buckets across the render
            # width (constant 64 would alias x-buckets into the next y
            # row at widths over 2048, e.g. 4K)
            x_buckets = float(-(-width // 32))
            # invalid lanes take one bucket PAST the last valid one; the
            # combined key*256+lane stays an exact f32 integer (< 2^24),
            # so every lane's key is DISTINCT. (A fractional iota
            # tiebreak fell below the f32 ulp at the invalid-key
            # magnitude: equal-rank lanes made the one-hot matmul SUM
            # two columns — two poison -1.0 halves summed into a
            # huge-exponent plane constant that rastered full-tile
            # phantom coverage at depth 1.0.)
            inv_bucket = (float(-(-height // 8)) + 1.0) * x_buckets
            key = jnp.where(valid,
                            jnp.floor(iy0 * 0.125) * x_buckets +
                            jnp.floor(ix0 * 0.03125),
                            jnp.float32(inv_bucket))           # (1,128)
            keyj = key * 256.0 + jax.lax.broadcasted_iota(
                jnp.int32, (1, WINDOW), 1).astype(jnp.float32)  # exact ints
            a_m = jnp.broadcast_to(keyj, (WINDOW, WINDOW))   # A[i,j]=key_j
            b_m = jnp.transpose(a_m)                         # B[i,j]=key_i
            rank = jnp.sum((a_m < b_m).astype(jnp.float32), axis=1,
                           keepdims=True)                    # (128,1)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (1, WINDOW), 1).astype(jnp.float32)
            perm = (rank == lane).astype(jnp.float32)        # P[i,r]
            # coef + meta ride the same permutation (meta rows must stay
            # aligned with their triangles)
            both_i = jax.lax.bitcast_convert_type(
                jnp.concatenate([blk, meta], axis=0), jnp.int32)
            hi = jax.lax.shift_right_logical(both_i, 16).astype(jnp.float32)
            lo = (both_i & 0xFFFF).astype(jnp.float32)
            ph = jax.lax.dot(hi, perm,
                             precision=jax.lax.Precision.HIGHEST)
            plo = jax.lax.dot(lo, perm,
                              precision=jax.lax.Precision.HIGHEST)
            both = jax.lax.bitcast_convert_type(
                jax.lax.shift_left(ph.astype(jnp.int32), 16) |
                plo.astype(jnp.int32), jnp.uint32)
            blk = both[:COEF_ROWS]
            meta = both[COEF_ROWS:]
        # transposed triangle-major block; lanes COEF_ROWS..127 exist only
        # for DMA alignment and are never read — left unwritten
        coef_ref[:, 0:COEF_ROWS] = jnp.transpose(blk)      # (128, R)
        meta_ref[:, :] = meta


def mesh_shader_setup(
    draws,                       # cull.DrawList
    pools,                       # MeshletScenePools
    instances,
    tw_to_clip: jnp.ndarray,     # (4,4)
    capacity: int,
    width: int, height: int,
    payload_base: int = 0,
    backface_cull: bool = True,
    sort_tris: bool = True,
    sub_s: int = 4,
    interpret: bool = False,
) -> TriangleSetup:
    """Run the mesh-shader kernel -> TriangleSetup for bin_windows/raster.

    The returned coefT is triangle-major ((cap+1)*128, 32) and already
    contains attribute planes; a depth-only RasterConfig (with_attrs=
    False) simply DMAs the first 16 lanes of each block. sort_tris
    compacts + spatially sorts each window in-kernel
    (see _mesh_shader_kernel)."""
    cap = capacity
    n_meshlets = pools.meshlet_sphere.shape[0]
    slot = jnp.arange(cap, dtype=jnp.int32)
    active = slot < draws.count
    dm = jnp.where(active, draws.meshlet_id, n_meshlets)   # poison window
    obj = jnp.where(active, draws.object_id, 0)

    l2c = jnp.einsum("dij,jk->dik", instances.object_to_tw[obj], tw_to_clip,
                     precision=jax.lax.Precision.HIGHEST)   # (cap,4,4)
    nm = instances.object_normal_mat[obj]                   # (cap,3,3)
    tcnt = jnp.where(active, pools.meshlet_tri_count[
        jnp.minimum(dm, n_meshlets - 1)], 0)

    two_sided = instances.object_two_sided[obj]             # (cap,)
    mats = jnp.concatenate(
        [l2c.reshape(cap, 16), nm.reshape(cap, 9),
         two_sided[:, None],
         jnp.zeros((cap, 102), jnp.float32)], axis=1)        # (cap,128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # dm, tcnt, count
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, dm, tc, ct: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, WINDOW), lambda i, dm, tc, ct:
                         (0, dm[i]), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, WINDOW), lambda i, dm, tc, ct:
                         (0, dm[i]), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((WINDOW, COEF_LANES),
                         lambda i, dm, tc, ct: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((META_ROWS, WINDOW),
                         lambda i, dm, tc, ct: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    coefT, metaT = pl.pallas_call(
        functools.partial(_mesh_shader_kernel, width=width, height=height,
                          payload_base=payload_base,
                          backface_cull=backface_cull, sort_tris=sort_tris),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((cap * WINDOW, COEF_LANES),
                                        jnp.uint32),
                   jax.ShapeDtypeStruct((META_ROWS, cap * WINDOW),
                                        jnp.uint32)],
        interpret=interpret or jax.default_backend() == "cpu",
    )(dm, tcnt, jnp.asarray([draws.count], jnp.int32).reshape(1),
      mats, pools.mv_posT, pools.mv_attrT)

    # window bbox / validity from the kernel's meta rows (+ poison window
    # appended so slack raster pairs have a block to point at)
    f = lambda r: jax.lax.bitcast_convert_type(
        metaT[r].reshape(cap, WINDOW), jnp.float32)
    valid = f(0) > 0.5
    wx0 = jnp.where(valid, f(1), 1e9).min(1).astype(jnp.int32)
    wy0 = jnp.where(valid, f(2), 1e9).min(1).astype(jnp.int32)
    wx1 = jnp.where(valid, f(3), -1.0).max(1).astype(jnp.int32)
    wy1 = jnp.where(valid, f(4), -1.0).max(1).astype(jnp.int32)
    window_valid = valid.any(1)
    window_bbox = jnp.stack([wx0, wy0, wx1, wy1], 0)
    big_i = jnp.int32(1 << 29)
    vflat = valid.reshape(-1)
    iv = lambda r, pois: jnp.where(
        vflat, f(r).reshape(-1).astype(jnp.int32), pois)
    sub_bounds = _sub_bounds(iv(2, big_i), iv(4, -1),
                             iv(1, big_i), iv(3, -1), cap, sub_s)

    coefT = jnp.concatenate(
        [coefT, jnp.broadcast_to(jnp.asarray(_POISON_COEF)[None, :],
                                 (WINDOW, COEF_LANES))], axis=0)
    return TriangleSetup(coefT=coefT, window_bbox=window_bbox,
                         window_valid=window_valid,
                         valid=valid.reshape(-1), sub_bounds=sub_bounds)
