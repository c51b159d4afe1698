"""Device texture sampling from the stacked flat-mip pool.

TPU-native equivalent of bindless texture sampling with explicit gradients
(reference: lighting.hlsl samples material textures via Bindless(...)
descriptor indices with analytic ddx/ddy from base.hlsli barycentrics).
Layer id + uv -> texel fetches from the (layers, total_texels, 4) pool
(asset/texture.py layout). Mip level comes from a caller-supplied density
estimate (screen-space uv derivative approximation).

Per-pixel texture fetches are random gathers — the most expensive op on
this device (see ops/raster.py notes) — so sampling is bilinear from ONE
mip (no trilinear blend), and materials without textures skip the pass
entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sample_pool(
    pool: jnp.ndarray,        # (L, total, 4) u8 unorm
    mip_sizes,                # static tuple of edge sizes per mip
    mip_offsets,              # static tuple of flat offsets
    layer: jnp.ndarray,       # (...,) i32, -1 = untextured
    uv: jnp.ndarray,          # (...,2) f32 (wrapped)
    mip: jnp.ndarray,         # (...,) i32 mip level (clamped)
    bilinear: bool = True,
) -> jnp.ndarray:
    """-> (...,4) f32 RGBA; untextured (-1) returns 1 (multiplicative id)."""
    n_mips = len(mip_sizes)
    sizes = jnp.asarray(mip_sizes, jnp.int32)
    offsets = jnp.asarray(mip_offsets, jnp.int32)
    m = jnp.clip(mip, 0, n_mips - 1)
    s = sizes[m]
    off = offsets[m]
    l_safe = jnp.maximum(layer, 0)

    u = (uv[..., 0] % 1.0) * s.astype(jnp.float32)
    v = (uv[..., 1] % 1.0) * s.astype(jnp.float32)

    scale = (1.0 / 255.0) if pool.dtype == jnp.uint8 else 1.0

    def tex(xi, yi):
        xi = jnp.clip(xi, 0, s - 1)
        yi = jnp.clip(yi, 0, s - 1)
        return pool[l_safe, off + yi * s + xi].astype(jnp.float32) * scale

    if not bilinear:
        out = tex(u.astype(jnp.int32), v.astype(jnp.int32))
    else:
        x0 = jnp.floor(u - 0.5)
        y0 = jnp.floor(v - 0.5)
        fx = (u - 0.5 - x0)[..., None]
        fy = (v - 0.5 - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        out = (tex(x0i, y0i) * (1 - fx) * (1 - fy) +
               tex(x0i + 1, y0i) * fx * (1 - fy) +
               tex(x0i, y0i + 1) * (1 - fx) * fy +
               tex(x0i + 1, y0i + 1) * fx * fy)
    return jnp.where((layer >= 0)[..., None], out, 1.0)


def sample_material_maps(
    pools,                    # rhi.MeshletScenePools (tex_pages/tex_meta)
    layers: jnp.ndarray,      # (C,H,W) i32 texture layer per channel
    uv: jnp.ndarray,          # (H,W,2) f32
    mip: jnp.ndarray,         # (H,W) i32
    paged: bool = True,
    bilinear: bool = True,
) -> jnp.ndarray:
    """Fused multi-channel material-texture fetch -> (C,H,W,4) f32.

    Routes to the paged virtual-texture Pallas sampler (the full-res fast
    path, ~50x cheaper than XLA per-pixel gathers at 1080p — see
    ops/paged_texture.py) or falls back to per-channel sample_pool
    gathers (paged=False, and the oracle for tests)."""
    size = pools.tex_size
    mip_sizes, mip_offsets = [], []
    off, s = 0, size
    while s >= 1:
        mip_sizes.append(s)
        mip_offsets.append(off)
        off += s * s
        s //= 2
    if paged:
        from . import paged_texture as pt

        C = layers.shape[0]
        return pt.paged_sample(
            pools.tex_pages, pools.tex_meta, len(mip_sizes), mip_sizes,
            layers, uv, mip, bilinear=bilinear,
            block_h=16, k_pages=(10 if C == 1 else 16))
    return jnp.stack([
        sample_pool(pools.tex_pool, tuple(mip_sizes), tuple(mip_offsets),
                    layers[c], uv, mip, bilinear=bilinear)
        for c in range(layers.shape[0])])


def mip_level_from_uv_density(uv: jnp.ndarray, base_size: int) -> jnp.ndarray:
    """Fractional mip level from screen-space uv derivatives via shifted
    differences (the TPU stand-in for the reference's analytic ddx/ddy,
    base.hlsli:457-497): level = log2(max texel footprint), f32."""
    du = jnp.abs(uv - jnp.roll(uv, 1, axis=1))
    dv = jnp.abs(uv - jnp.roll(uv, 1, axis=0))
    d = jnp.maximum(du.max(-1), dv.max(-1)) * base_size
    return jnp.clip(jnp.log2(jnp.maximum(d, 1.0)), 0.0, 31.0)


def mip_from_uv_density(uv: jnp.ndarray, base_size: int) -> jnp.ndarray:
    """Integer (floor) mip level — the single-mip bilinear default."""
    return mip_level_from_uv_density(uv, base_size).astype(jnp.int32)


def mip_dithered(uv: jnp.ndarray, base_size: int,
                 frame) -> jnp.ndarray:
    """Stochastic trilinear: per pixel pick floor(level) or floor+1 with
    probability = frac(level), thresholded by interleaved gradient noise.
    Expectation equals the true trilinear blend at ZERO extra taps; the
    IGN dither is blue-ish over 3x3 neighborhoods so TSR's temporal
    accumulation converges it to smooth trilinear (the same stochastic
    split the reference leans on for its soft-shadow/GI noise, resolved
    by the TAA chain). frame may be a traced i32 scalar."""
    from .bluenoise import interleaved_gradient_noise

    lvl = mip_level_from_uv_density(uv, base_size)
    base = jnp.floor(lvl)
    frac = lvl - base
    noise = interleaved_gradient_noise(uv.shape[0], uv.shape[1], frame)
    return (base + (noise < frac)).astype(jnp.int32)
