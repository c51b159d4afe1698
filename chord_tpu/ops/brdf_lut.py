"""Split-sum environment BRDF LUT.

TPU-native equivalent of the reference's BRDF LUT compute pass
(reference: renderer/lut/brdf_lut.cpp + shader/brdf_lut.hlsl — split-sum
env BRDF (A, B) over (NoV, roughness), id published in
GPUBasicData.brdfLut). Built once with jnp Monte-Carlo GGX importance
sampling; consumed by ambient/GI specular: F = f0 * A + B.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LUT_SIZE = 32


def _hammersley(n: int) -> np.ndarray:
    """(n,2) low-discrepancy set (van der Corput base 2)."""
    i = np.arange(n)
    bits = i.copy()
    r = np.zeros(n)
    f = 0.5
    for _ in range(16):
        r += (bits & 1) * f
        bits >>= 1
        f *= 0.5
    return np.stack([i / n, r], -1)


def build_env_brdf_lut(samples: int = 256) -> jnp.ndarray:
    """-> (LUT_SIZE, LUT_SIZE, 2) f32: (A, B) indexed by (NoV, roughness)."""
    xi = jnp.asarray(_hammersley(samples), jnp.float32)
    nov = (jnp.arange(LUT_SIZE) + 0.5) / LUT_SIZE          # (S,)
    rough = (jnp.arange(LUT_SIZE) + 0.5) / LUT_SIZE

    nov_g, r_g = jnp.meshgrid(nov, rough, indexing="ij")   # (S,S)
    a = jnp.maximum(r_g * r_g, 1e-3)

    v = jnp.stack([jnp.sqrt(1 - nov_g ** 2), jnp.zeros_like(nov_g), nov_g],
                  -1)                                       # (S,S,3)

    def accum(carry, x):
        A, B = carry
        e1, e2 = x[0], x[1]
        # GGX importance sample around +Z
        phi = 2 * np.pi * e1
        ct = jnp.sqrt((1 - e2) / (1 + (a ** 2 - 1) * e2))
        st = jnp.sqrt(jnp.maximum(1 - ct * ct, 0.0))
        h = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], -1)
        voh = jnp.sum(v * h, -1)
        l = 2 * voh[..., None] * h - v
        nol = jnp.clip(l[..., 2], 0.0, 1.0)
        noh = jnp.clip(ct, 0.0, 1.0)
        vohc = jnp.clip(voh, 0.0, 1.0)
        # Schlick-GGX Smith visibility with the IBL k = alpha/2
        # convention (Karis split-sum; the r4 round fixed k = alpha^2/2,
        # which under-shadowed rough rows and drifted from both the
        # analytic Lazarov fit and the reference's brdf_lut.hlsl)
        k = a / 2.0
        g_v = nov_g / (nov_g * (1 - k) + k)
        g_l = nol / (nol * (1 - k) + k)
        g = g_v * g_l
        g_vis = jnp.where(nol > 0,
                          g * vohc / jnp.maximum(noh * nov_g, 1e-6), 0.0)
        fc = (1 - vohc) ** 5
        return (A + (1 - fc) * g_vis, B + fc * g_vis), None

    (A, B), _ = jax.lax.scan(accum,
                             (jnp.zeros_like(nov_g), jnp.zeros_like(nov_g)),
                             xi)
    A = A / samples
    B = B / samples
    # Energy conservation: the Smith visibility term blows up at grazing
    # NoV (first texel rows), where F = f0*A + B would exceed 1. Clamp the
    # pair's sum to 1 (the integrand itself never exceeds it; the excess
    # is 1/NoV estimator noise).
    s = A + B
    scale = jnp.minimum(1.0, 1.0 / jnp.maximum(s, 1e-6))
    return jnp.stack([A * scale, B * scale], -1)


def env_specular(lut: jnp.ndarray, f0: jnp.ndarray, roughness: jnp.ndarray,
                 nov: jnp.ndarray) -> jnp.ndarray:
    """Split-sum env term: f0 * A + B (broadcast over (...,3) f0)."""
    xi = jnp.clip((nov * LUT_SIZE).astype(jnp.int32), 0, LUT_SIZE - 1)
    yi = jnp.clip((roughness * LUT_SIZE).astype(jnp.int32), 0, LUT_SIZE - 1)
    ab = lut[xi, yi]
    return f0 * ab[..., 0:1] + ab[..., 1:2]


def env_specular_analytic(f0: jnp.ndarray, roughness: jnp.ndarray,
                          nov: jnp.ndarray) -> jnp.ndarray:
    """Gather-free split-sum env term: Lazarov's analytic fit of the
    GGX+Smith environment BRDF (the standard mobile/console substitute
    for the reference's LUT, brdf_lut.cpp). The per-pixel LUT gather
    cost 5.9 ms/frame at 1080p on the axon TPU (trace r4); this is pure
    VPU math and matches the MC-integrated LUT to ~2e-2 (test-gated).
    A = a004 * 1.04 applied to f0, B = -1.04 * a004 + r.w-ish bias."""
    c0 = jnp.asarray([-1.0, -0.0275, -0.572, 0.022], jnp.float32)
    c1 = jnp.asarray([1.0, 0.0425, 1.04, -0.04], jnp.float32)
    r = roughness[..., None] * c0 + c1                       # (...,4)
    a004 = (jnp.minimum(r[..., 0] * r[..., 0],
                        jnp.exp2(-9.28 * nov)) * r[..., 0] + r[..., 1])
    a_ = (-1.04 * a004 + r[..., 2])[..., None]
    b_ = (1.04 * a004 + r[..., 3])[..., None]
    return f0 * a_ + b_
