"""Atmosphere LUT physics sanity (reference: manager_atmosphere.cpp
LUT chain; here Hillaire-2020 formulation — see ops/atmosphere.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from chord_tpu.ops import atmosphere as atm


@pytest.fixture(scope="module")
def luts():
    p = atm.AtmosphereParams()
    t = atm.build_transmittance_lut(p, steps=20)
    ms = atm.build_multiscatter_lut(p, t, dir_samples=8, steps=8)
    return p, t, ms


def test_transmittance_properties(luts):
    p, t, _ = luts
    t = np.asarray(t)
    assert t.shape == (64, 256, 3)
    assert (t >= 0).all() and (t <= 1.0 + 1e-5).all()
    # Straight up from the top of the atmosphere: ~no air -> T ~ 1
    assert t[-1, -1].min() > 0.99
    # Horizontal at ground level: maximum air mass -> heavy extinction,
    # red surviving best (this is why sunsets are red)
    assert t[0, 128, 2] < 0.01 and t[0, 128, 1] < 0.1
    assert t[0, 128, 0] > t[0, 128, 2]
    # Blue extinguishes faster than red for a zenith-ish ray at ground
    assert t[0, 220, 2] < t[0, 220, 0]


def test_sky_view_blue_sky(luts):
    p, t, ms = luts
    sun = jnp.asarray([0.0, 0.7, 0.7])
    sun = sun / jnp.linalg.norm(sun)
    sky = np.asarray(atm.build_sky_view_lut(p, t, ms, sun))
    assert (sky >= 0).all()
    upper = sky[atm.SKYVIEW_H // 2:]
    # daytime zenith sky is blue-dominant
    mean = upper.mean((0, 1))
    assert mean[2] > mean[0], f"sky not blue: {mean}"
    # horizon brighter than zenith
    assert sky[atm.SKYVIEW_H // 2 + 3].mean() > sky[-1].mean()


def test_sample_sky_roundtrip(luts):
    p, t, ms = luts
    sun = jnp.asarray([0.0, 1.0, 0.0])
    sky = atm.build_sky_view_lut(p, t, ms, sun)
    # sampling the zenith direction ~ top row of the LUT
    d = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.02, 0.0]])
    s = np.asarray(atm.sample_sky(sky, d))
    assert s.shape == (2, 3)
    lut = np.asarray(sky)
    assert np.allclose(s[0], lut[-1].mean(0), rtol=0.5)
    # horizon sample brighter than zenith sample
    assert s[1].mean() > s[0].mean()


def test_sun_disk(luts):
    p, t, _ = luts
    sun = jnp.asarray([0.0, 0.7, 0.7])
    sun = sun / jnp.linalg.norm(sun)
    d = jnp.stack([sun, jnp.asarray([0.0, 1.0, 0.0])])
    disk = np.asarray(atm.sun_disk_radiance(p, t, d, sun))
    assert disk[0].max() > 0.0, "looking at the sun must hit the disk"
    assert disk[1].max() == 0.0, "zenith is not the sun"
