"""Real spherical harmonics, 3 bands (9 coefficients) — the radiance
representation of the reference's screen-probe GI.

TPU-native equivalent of the reference's SH3_gi struct and sh.hlsli math
(reference: install/resource/shader/gi.h:21-29 — SH3 = 9 float3 coeffs +
numSample, packed to 14 uints; projection in gi_screen_probe_project_sh.hlsl,
irradiance eval in gi_screen_probe_interpolate.hlsl). Here a probe's SH is
a plain (..., 9, 3) array (+ a separate sample-count channel when packed);
everything is dense vectorized math — no packing tricks needed in HBM.

Convention (standard real SH, y-up-agnostic — pure direction math):
  Y0  = 0.282095
  Y1  = 0.488603 * (y, z, x)
  Y2  = 1.092548*(xy, yz, xz), 0.315392*(3z^2-1), 0.546274*(x^2-y^2)
Cosine-lobe convolution for irradiance: A = (pi, 2pi/3, pi/4) per band.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

NUM_COEFFS = 9

# band constants
_C0 = 0.28209479177387814          # 1/(2 sqrt(pi))
_C1 = 0.4886025119029199           # sqrt(3)/(2 sqrt(pi))
_C2a = 1.0925484305920792          # sqrt(15)/(2 sqrt(pi))   (xy, yz, xz)
_C2b = 0.31539156525252005         # sqrt(5)/(4 sqrt(pi))    (3z^2 - 1)
_C2c = 0.5462742152960396          # sqrt(15)/(4 sqrt(pi))   (x^2 - y^2)

# cosine-lobe (clamped-cosine) convolution per band: irradiance E(n) =
# sum_i A_l(i) * L_i * Y_i(n)
A_BAND = np.array([np.pi,
                   2.0 * np.pi / 3.0, 2.0 * np.pi / 3.0, 2.0 * np.pi / 3.0,
                   np.pi / 4.0, np.pi / 4.0, np.pi / 4.0, np.pi / 4.0,
                   np.pi / 4.0], np.float32)


def sh_basis(d: jnp.ndarray) -> jnp.ndarray:
    """Unit directions (..., 3) -> SH basis values (..., 9)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack([
        jnp.full(x.shape, _C0, d.dtype),
        _C1 * y,
        _C1 * z,
        _C1 * x,
        _C2a * x * y,
        _C2a * y * z,
        _C2b * (3.0 * z * z - 1.0),
        _C2a * x * z,
        _C2c * (x * x - y * y),
    ], axis=-1)


def project(radiance: jnp.ndarray, dirs: jnp.ndarray,
            weights: jnp.ndarray = None) -> jnp.ndarray:
    """Monte-Carlo project radiance samples onto SH3.

    radiance: (..., N, 3) per-direction radiance
    dirs:     broadcastable (..., N, 3) unit sample directions
    weights:  optional (..., N) per-sample weights (e.g. validity)
    -> (..., 9, 3) SH coefficients. Uniform-sphere estimator:
       L_i ≈ (4π / N_eff) Σ_k w_k · radiance_k · Y_i(d_k)
    """
    y = sh_basis(dirs)                                    # (..., N, 9)
    if weights is not None:
        y = y * weights[..., None]
        n_eff = jnp.maximum(jnp.sum(weights, axis=-1), 1e-6)[..., None, None]
    else:
        n_eff = float(dirs.shape[-2])
    coeffs = jnp.einsum("...nc,...nk->...kc", radiance, y)  # (..., 9, 3)
    return coeffs * (4.0 * np.pi) / n_eff


def eval_radiance(sh: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """SH (..., 9, 3) radiance evaluated along unit directions (..., 3)."""
    y = sh_basis(d)                                       # (..., 9)
    return jnp.einsum("...kc,...k->...c", sh, y)


def eval_irradiance(sh: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Cosine-convolved irradiance (..., 3) for surface normals (..., 3):
    E(n) = Σ_i A_l(i) · L_i · Y_i(n). Divide by π for Lambertian exit
    radiance at the caller."""
    y = sh_basis(n) * jnp.asarray(A_BAND, sh.dtype)       # (..., 9)
    return jnp.einsum("...kc,...k->...c", sh, y)


def pack(sh: jnp.ndarray, num_sample: jnp.ndarray) -> jnp.ndarray:
    """(..., 9, 3) + (...,) -> flat (..., 28) [27 coeffs + numSample]
    (the reference packs SH3_gi to 14 uints for HBM; dense f32 planes are
    the TPU-friendly layout)."""
    flat = sh.reshape(sh.shape[:-2] + (27,))
    return jnp.concatenate([flat, num_sample[..., None]], axis=-1)


def unpack(packed: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., 28) -> ((..., 9, 3), (...,))."""
    sh = packed[..., :27].reshape(packed.shape[:-1] + (9, 3))
    return sh, packed[..., 27]
