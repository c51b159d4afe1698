"""SH3 (9-coeff) math vs NumPy Monte-Carlo oracles.

The reference stores screen-probe radiance as SH3 (gi.h:21-29) and
evaluates cosine-convolved irradiance; these tests verify our projection
and evaluation against brute-force integration."""

import numpy as np
import jax.numpy as jnp

from chord_tpu.ops import sh


def _fib_sphere(n):
    """Deterministic near-uniform sphere directions."""
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return np.stack([np.sin(phi) * np.cos(theta),
                     np.sin(phi) * np.sin(theta),
                     np.cos(phi)], -1).astype(np.float32)


def test_basis_orthonormal():
    """∫ Y_i Y_j dΩ = δ_ij (MC over uniform sphere)."""
    d = _fib_sphere(20000)
    y = np.asarray(sh.sh_basis(jnp.asarray(d)))          # (N,9)
    gram = y.T @ y * (4 * np.pi / len(d))
    np.testing.assert_allclose(gram, np.eye(9), atol=0.03)


def test_project_eval_roundtrip_constant():
    """A constant environment projects to pure DC and evaluates back."""
    d = _fib_sphere(4096)
    rad = np.ones((4096, 3), np.float32) * np.array([0.5, 1.0, 2.0])
    coeffs = sh.project(jnp.asarray(rad), jnp.asarray(d))
    back = sh.eval_radiance(coeffs, jnp.asarray(d[:8]))
    np.testing.assert_allclose(np.asarray(back),
                               np.broadcast_to(rad[:8], (8, 3)), rtol=0.05)
    # DC coefficient = 4π·C0·L · C0... eval already checked; higher bands ~0
    c = np.asarray(coeffs)
    assert np.abs(c[1:]).max() < 0.05 * np.abs(c[0]).max()


def test_irradiance_vs_mc_oracle():
    """E(n) from SH matches brute-force ∫ L(d) max(0, n·d) dΩ for a smooth
    (low-frequency) environment within SH3's representable error."""
    d = _fib_sphere(8192)
    # smooth environment: gradient + broad lobe (band-limited-ish)
    L = (0.5 + 0.5 * d[:, 2:3] + 0.3 * np.maximum(d[:, 0:1], 0) ** 2) * \
        np.array([1.0, 0.8, 0.6], np.float32)
    coeffs = sh.project(jnp.asarray(L.astype(np.float32)), jnp.asarray(d))

    rng = np.random.default_rng(0)
    for n in [np.array([0, 0, 1.0]), np.array([1.0, 0, 0]),
              np.array([0.6, -0.64, 0.48])]:
        n = (n / np.linalg.norm(n)).astype(np.float32)
        cos = np.maximum(d @ n, 0.0)
        e_ref = (L * cos[:, None]).sum(0) * (4 * np.pi / len(d))
        e_sh = np.asarray(sh.eval_irradiance(coeffs, jnp.asarray(n)))
        np.testing.assert_allclose(e_sh, e_ref, rtol=0.08, atol=0.02)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    c = rng.normal(size=(4, 5, 9, 3)).astype(np.float32)
    n = rng.uniform(0, 64, size=(4, 5)).astype(np.float32)
    packed = sh.pack(jnp.asarray(c), jnp.asarray(n))
    assert packed.shape == (4, 5, 28)
    c2, n2 = sh.unpack(packed)
    np.testing.assert_array_equal(np.asarray(c2), c)
    np.testing.assert_array_equal(np.asarray(n2), n)
