"""Colorspace invariants (reference: shader/colorspace.h matrices)."""

import jax.numpy as jnp
import numpy as np

from chord_tpu.ops import colorspace as cs


def test_srgb_ap1_roundtrip():
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(0, 10, (64, 3)).astype(np.float32))
    back = cs.acescg_to_srgb(cs.srgb_to_acescg(c))
    np.testing.assert_allclose(np.asarray(back), np.asarray(c),
                               rtol=2e-3, atol=2e-3)


def test_ap0_ap1_roundtrip():
    m = cs.AP0_TO_AP1 @ cs.AP1_TO_AP0
    np.testing.assert_allclose(m, np.eye(3), atol=2e-3)


def test_white_preservation():
    # Equal-energy white in sRGB must stay (approximately) achromatic in AP1.
    white = cs.srgb_to_acescg(jnp.ones((1, 3)))
    w = np.asarray(white)[0]
    assert abs(w.max() - w.min()) < 0.01
    np.testing.assert_allclose(w.sum(), 3.0, rtol=2e-3)


def test_luminance_weights_sum_to_one():
    np.testing.assert_allclose(cs.AP1_LUMA.sum(), 1.0, atol=1e-4)


def test_srgb_eotf_roundtrip():
    c = jnp.linspace(0.0, 1.0, 256)[:, None].repeat(3, 1)
    back = cs.srgb_eotf(cs.srgb_eotf_inv(c))
    np.testing.assert_allclose(np.asarray(back), np.asarray(c), atol=1e-4)


def test_tonemap_monotonic_and_bounded():
    x = jnp.linspace(0.0, 100.0, 512)[:, None].repeat(3, 1)
    y = np.asarray(cs.aces_film_ap1(x))
    assert y.min() >= 0.0 and y.max() <= 1.0
    assert np.all(np.diff(y[:, 0]) >= -1e-6)    # monotonic

    enc = np.asarray(cs.tonemap_display(x, jnp.float32(1.0), "srgb8"))
    assert enc.min() >= 0.0 and enc.max() <= 1.0
    hdr10 = np.asarray(cs.tonemap_display(x, jnp.float32(1.0), "hdr10"))
    assert hdr10.min() >= 0.0 and hdr10.max() <= 1.0
