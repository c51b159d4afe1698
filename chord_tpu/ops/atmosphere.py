"""Physically-based sky / atmosphere with precomputed LUTs.

TPU-native equivalent of the reference's atmosphere stack (reference:
scene/manager/manager_atmosphere.cpp:607-641 — Bruneton-style precomputed
LUT set: transmittance, direct irradiance, single scattering, scattering
density, indirect irradiance, multiple scattering, evaluated with
camera-altitude-aware km-unit math manager_atmosphere.h:13-16; sky draw +
aerial perspective consumed by the lighting pass, shader/atmosphere.hlsl).

The TPU build uses the Hillaire-2020 formulation ("A Scalable and
Production Ready Sky and Atmosphere Rendering Technique") — the same
physics (Rayleigh + Mie + ozone, multiple scattering) with two small LUTs
plus a per-frame sky-view LUT. This matches the reference's visual feature
set (sun disk transmittance, aerial perspective, ground/sky radiance for
GI) while mapping onto dense jnp ray-marches that XLA vectorizes trivially
— a Bruneton 4D scattering table would be pure gather pressure on TPU.

All distances in kilometers (like the reference); radiance returned in
linear sRGB primaries, converted to AP1 by callers (ops/colorspace.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class AtmosphereParams(NamedTuple):
    """Earth-like defaults (reference manager_atmosphere defaults)."""

    ground_radius_km: float = 6360.0
    top_radius_km: float = 6460.0
    # Rayleigh scattering (per km, sRGB-ish spectral fit)
    rayleigh_scatter: Tuple[float, float, float] = (5.802e-3, 13.558e-3,
                                                    33.1e-3)
    rayleigh_scale_h: float = 8.0
    # Mie
    mie_scatter: float = 3.996e-3
    mie_absorb: float = 4.4e-3
    mie_scale_h: float = 1.2
    mie_g: float = 0.8
    # Ozone absorption (tent profile centered at 25km)
    ozone_absorb: Tuple[float, float, float] = (0.650e-3, 1.881e-3, 0.085e-3)
    ozone_center_km: float = 25.0
    ozone_width_km: float = 30.0
    ground_albedo: float = 0.3
    sun_illuminance: float = 20.0       # arbitrary HDR scale
    # world-unit -> km scale for aerial perspective (scene units are
    # meters-ish; the reference does its aerial math in km with double
    # camera positions, manager_atmosphere.h:13-16)
    km_per_unit: float = 0.05


def _densities(p: AtmosphereParams, h: jnp.ndarray):
    """h = altitude above ground (km) -> (rayleigh, mie, ozone) densities."""
    ray = jnp.exp(-h / p.rayleigh_scale_h)
    mie = jnp.exp(-h / p.mie_scale_h)
    ozo = jnp.clip(1.0 - jnp.abs(h - p.ozone_center_km) /
                   (p.ozone_width_km * 0.5), 0.0, 1.0)
    return ray, mie, ozo


def _extinction(p: AtmosphereParams, h: jnp.ndarray) -> jnp.ndarray:
    """(...,) altitude -> (...,3) extinction coefficient."""
    ray, mie, ozo = _densities(p, h)
    rs = jnp.asarray(p.rayleigh_scatter)
    oz = jnp.asarray(p.ozone_absorb)
    return (ray[..., None] * rs +
            (mie * (p.mie_scatter + p.mie_absorb))[..., None] +
            ozo[..., None] * oz)


def _ray_sphere(r0: jnp.ndarray, mu: jnp.ndarray, radius: float
                ) -> jnp.ndarray:
    """Distance along a ray from radius r0 with cos-zenith mu to the sphere
    `radius`; -1 if no hit (in front)."""
    b = 2.0 * r0 * mu
    c = r0 * r0 - radius * radius
    disc = b * b - 4.0 * c
    no_hit = disc < 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) * 0.5
    t1 = (-b + sq) * 0.5
    t = jnp.where(t0 >= 0.0, t0, t1)
    return jnp.where(no_hit | (t < 0.0), -1.0, t)


def _atmo_distance(p: AtmosphereParams, r: jnp.ndarray, mu: jnp.ndarray
                   ) -> jnp.ndarray:
    """Ray length through the atmosphere (stops at the ground)."""
    t_top = _ray_sphere(r, mu, p.top_radius_km)
    t_gnd = _ray_sphere(r, mu, p.ground_radius_km)
    return jnp.where(t_gnd > 0.0, t_gnd, jnp.maximum(t_top, 0.0))


# --- Transmittance LUT -----------------------------------------------------
# Parameterization: u = mu in [-1,1] (sun/view cos zenith), v = altitude.

TRANSMITTANCE_W, TRANSMITTANCE_H = 256, 64


def build_transmittance_lut(p: AtmosphereParams, steps: int = 40
                            ) -> jnp.ndarray:
    """(H,W,3) transmittance from a point at altitude v toward direction
    with cos-zenith u, to the top of the atmosphere (reference pass 1)."""
    h_atm = p.top_radius_km - p.ground_radius_km
    v = (jnp.arange(TRANSMITTANCE_H) + 0.5) / TRANSMITTANCE_H
    u = (jnp.arange(TRANSMITTANCE_W) + 0.5) / TRANSMITTANCE_W
    alt = v * h_atm                                   # (H,)
    mu = u * 2.0 - 1.0                                # (W,)
    r = alt[:, None] + p.ground_radius_km             # (H,1)
    mu2 = mu[None, :]                                 # (1,W)

    t_max = _atmo_distance(p, r, mu2)                 # (H,W)
    dt = t_max / steps

    # lax loop, not Python: the LUT builders also trace INLINE in the
    # frame jit when no host LUTs are passed (tests/dryrun/viewer); the
    # unrolled version alone was ~39k jaxpr eqns of a 47k-eqn frame
    def body(i, od):
        t = (i + 0.5) * dt
        # altitude at distance t along the ray
        rt = jnp.sqrt(r * r + t * t + 2.0 * r * t * mu2)
        h = jnp.clip(rt - p.ground_radius_km, 0.0, h_atm)
        return od + _extinction(p, h) * dt[..., None]

    od = jax.lax.fori_loop(
        0, steps, body, jnp.zeros((TRANSMITTANCE_H, TRANSMITTANCE_W, 3)))
    return jnp.exp(-od)


def sample_transmittance(lut: jnp.ndarray, p: AtmosphereParams,
                         r: jnp.ndarray, mu: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of the transmittance LUT at (radius r, cos mu)."""
    h_atm = p.top_radius_km - p.ground_radius_km
    v = jnp.clip((r - p.ground_radius_km) / h_atm, 0.0, 1.0)
    u = jnp.clip(mu * 0.5 + 0.5, 0.0, 1.0)
    x = u * (TRANSMITTANCE_W - 1)
    y = v * (TRANSMITTANCE_H - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, TRANSMITTANCE_W - 1)
    y1 = jnp.minimum(y0 + 1, TRANSMITTANCE_H - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    return (lut[y0, x0] * (1 - fx) * (1 - fy) + lut[y0, x1] * fx * (1 - fy) +
            lut[y1, x0] * (1 - fx) * fy + lut[y1, x1] * fx * fy)


# --- Multiple scattering LUT ----------------------------------------------

MS_SIZE = 32


def build_multiscatter_lut(p: AtmosphereParams, t_lut: jnp.ndarray,
                           dir_samples: int = 64, steps: int = 20
                           ) -> jnp.ndarray:
    """(S,S,3) Psi_ms: isotropic multiple-scattering transfer (Hillaire eq.
    5-7; plays the role of the reference's scattering-density + indirect
    irradiance iterations, manager_atmosphere.cpp passes 4-6)."""
    h_atm = p.top_radius_km - p.ground_radius_km
    v = (jnp.arange(MS_SIZE) + 0.5) / MS_SIZE
    u = (jnp.arange(MS_SIZE) + 0.5) / MS_SIZE
    sun_mu = u * 2.0 - 1.0                      # (S,)
    alt = v * h_atm                             # (S,)
    r = alt[:, None] + p.ground_radius_km       # (S,1) broadcast over sun
    rs = jnp.asarray(p.rayleigh_scatter)

    # Fibonacci sphere directions
    k = np.arange(dir_samples) + 0.5
    phi = np.pi * (1 + 5 ** 0.5) * k
    cz = 1 - 2 * k / dir_samples
    sz = np.sqrt(1 - cz ** 2)
    dirs = np.stack([sz * np.cos(phi), sz * np.sin(phi), cz], -1)  # (D,3)
    dirs = jnp.asarray(dirs, jnp.float32)

    # scan over directions (inner march = fori_loop): keeps the inline
    # trace compact — see build_transmittance_lut note
    def one_dir(carry, d):
        l_2nd, f_ms = carry
        mu = d[2]                                   # view cos zenith
        t_max = _atmo_distance(p, r, mu)            # (S,1)
        dt = t_max / steps

        def step(i, st):
            l2, fm, throughput = st
            t = (i + 0.5) * dt
            rt = jnp.sqrt(r * r + t * t + 2.0 * r * t * mu)
            h = jnp.clip(rt - p.ground_radius_km, 0.0, h_atm)
            ray, mie, _ = _densities(p, h)
            scat = ray[..., None] * rs + (mie * p.mie_scatter)[..., None]
            ext = _extinction(p, h)
            step_t = jnp.exp(-ext * dt[..., None])
            # sun transmittance at the sample; sun cos-zenith at the
            # sample ~ sun_mu (flat-sun approximation inside the LUT)
            t_sun = sample_transmittance(t_lut, p, rt, sun_mu[None, :])
            # isotropic phase 1/4pi both for in-scatter and transfer
            integ = scat * (1.0 - step_t) / jnp.maximum(ext, 1e-9)
            l2 = l2 + throughput * integ * t_sun / (4.0 * np.pi)
            fm = fm + throughput * integ / (4.0 * np.pi)
            return (l2, fm, throughput * step_t)

        zero = jnp.zeros((MS_SIZE, MS_SIZE, 3))
        l2_d, fm_d, throughput = jax.lax.fori_loop(
            0, steps, step, (zero, zero, jnp.ones((MS_SIZE, 1, 3))))
        # ground bounce for downward rays
        hits_gnd = _ray_sphere(r, mu, p.ground_radius_km) > 0.0
        t_sun_g = sample_transmittance(
            t_lut, p, jnp.full_like(r, p.ground_radius_km),
            sun_mu[None, :])
        nol = jnp.maximum(sun_mu[None, :, None], 0.0)
        l2_d = l2_d + jnp.where(
            hits_gnd[..., None], throughput * t_sun_g * nol *
            p.ground_albedo / np.pi, 0.0)
        return (l_2nd + l2_d, f_ms + fm_d), None

    zero = jnp.zeros((MS_SIZE, MS_SIZE, 3))
    (l_2nd, f_ms), _ = jax.lax.scan(one_dir, (zero, zero), dirs)
    l_2nd = l_2nd / dir_samples
    f_ms = f_ms / dir_samples
    return l_2nd / jnp.maximum(1.0 - f_ms, 1e-4)


# --- Sky-view LUT (per frame) ---------------------------------------------

SKYVIEW_W, SKYVIEW_H = 200, 104


class SkyLUTs(NamedTuple):
    transmittance: jnp.ndarray   # (64,256,3) static
    multiscatter: jnp.ndarray    # (32,32,3) static
    sky_view: jnp.ndarray        # (104,200,3) per sun position


def _phase_rayleigh(c):
    return 3.0 / (16.0 * np.pi) * (1.0 + c * c)


def _phase_mie(c, g):
    g2 = g * g
    num = 3.0 * (1.0 - g2) * (1.0 + c * c)
    den = 8.0 * np.pi * (2.0 + g2) * jnp.power(1.0 + g2 - 2.0 * g * c, 1.5)
    return num / jnp.maximum(den, 1e-9)


def raymarch_scattering(
    p: AtmosphereParams, t_lut: jnp.ndarray, ms_lut: jnp.ndarray,
    r0: jnp.ndarray, view_mu: jnp.ndarray, sun_mu: jnp.ndarray,
    cos_sun_view: jnp.ndarray, steps: int = 24,
    t_max_override: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-scattering ray march + MS contribution.
    -> (radiance (...,3), transmittance (...,3)). Broadcast over inputs."""
    h_atm = p.top_radius_km - p.ground_radius_km
    rs = jnp.asarray(p.rayleigh_scatter)
    t_max = _atmo_distance(p, r0, view_mu)
    if t_max_override is not None:
        t_max = jnp.minimum(t_max, t_max_override)
    dt = t_max / steps

    ph_r = _phase_rayleigh(cos_sun_view)
    ph_m = _phase_mie(cos_sun_view, p.mie_g)

    def step(i, st):
        lum, throughput = st
        t = (i + 0.5) * dt
        rt = jnp.sqrt(r0 * r0 + t * t + 2.0 * r0 * t * view_mu)
        h = jnp.clip(rt - p.ground_radius_km, 0.0, h_atm)
        ray, mie, _ = _densities(p, h)
        scat_r = ray[..., None] * rs
        scat_m = (mie * p.mie_scatter)[..., None]
        ext = _extinction(p, h)
        step_t = jnp.exp(-ext * dt[..., None])
        # sun cos-zenith at sample (curved-earth correction): the angle
        # between zenith at the sample and the sun changes slowly; use the
        # flat approximation sun_mu (standard in the sky-view LUT).
        t_sun = sample_transmittance(t_lut, p, rt, sun_mu)
        # multiple scattering lookup
        msv = jnp.clip(h / h_atm, 0.0, 1.0)
        msu = jnp.clip(sun_mu * 0.5 + 0.5, 0.0, 1.0)
        mx = jnp.clip((msu * (MS_SIZE - 1)).astype(jnp.int32), 0, MS_SIZE - 1)
        my = jnp.clip((msv * (MS_SIZE - 1)).astype(jnp.int32), 0, MS_SIZE - 1)
        psi = ms_lut[my, mx]
        in_scatter = (scat_r * ph_r[..., None] + scat_m * ph_m[..., None]) * \
            t_sun + (scat_r + scat_m) * psi
        integ = in_scatter * (1.0 - step_t) / jnp.maximum(ext, 1e-9)
        return (lum + throughput * integ, throughput * step_t)

    lum0 = jnp.zeros(jnp.broadcast_shapes(r0.shape, view_mu.shape,
                                          sun_mu.shape) + (3,))
    lum, throughput = jax.lax.fori_loop(
        0, steps, step, (lum0, jnp.ones_like(lum0)))
    return lum * p.sun_illuminance, throughput


def build_sky_view_lut(p: AtmosphereParams, t_lut: jnp.ndarray,
                       ms_lut: jnp.ndarray, sun_dir: jnp.ndarray,
                       cam_alt_km: float = 0.2) -> jnp.ndarray:
    """(H,W,3) sky radiance LUT: longitude x (non-linear) latitude
    (reference: sky rendering consumed in lighting.hlsl:75-135)."""
    r0 = jnp.asarray(cam_alt_km + p.ground_radius_km)
    sun_mu = sun_dir[1]
    v = (jnp.arange(SKYVIEW_H) + 0.5) / SKYVIEW_H
    u = (jnp.arange(SKYVIEW_W) + 0.5) / SKYVIEW_W
    # non-linear latitude (more resolution at horizon): Hillaire mapping
    lat = jnp.where(v < 0.5,
                    -(0.5 - v) ** 2 * 2.0 * np.pi * 0.5,
                    (v - 0.5) ** 2 * 2.0 * np.pi * 0.5)  # [-pi/2, pi/2]
    lon = u * 2.0 * np.pi                                 # [0, 2pi)

    mu = jnp.sin(lat)[:, None] * jnp.ones((1, SKYVIEW_W))     # (H,W)
    cl = jnp.cos(lat)[:, None]
    view = jnp.stack([cl * jnp.cos(lon)[None, :],
                      jnp.broadcast_to(jnp.sin(lat)[:, None],
                                       (SKYVIEW_H, SKYVIEW_W)),
                      cl * jnp.sin(lon)[None, :]], axis=-1)   # (H,W,3)
    cos_sv = jnp.einsum("hwc,c->hw", view, sun_dir)
    lum, _ = raymarch_scattering(p, t_lut, ms_lut,
                                 jnp.broadcast_to(r0, mu.shape), mu,
                                 jnp.broadcast_to(sun_mu, mu.shape), cos_sv)
    return lum


def sample_sky(lut: jnp.ndarray, view_dir: jnp.ndarray) -> jnp.ndarray:
    """Sample the sky-view LUT with (...,3) world directions -> (...,3)."""
    d = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-8)
    lat = jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0))
    lon = jnp.arctan2(d[..., 2], d[..., 0]) % (2.0 * np.pi)
    v = jnp.where(lat < 0.0,
                  0.5 - jnp.sqrt(-lat / np.pi),
                  0.5 + jnp.sqrt(lat / np.pi))
    u = lon / (2.0 * np.pi)
    x = jnp.clip(u * SKYVIEW_W - 0.5, 0.0, SKYVIEW_W - 1)
    y = jnp.clip(v * SKYVIEW_H - 0.5, 0.0, SKYVIEW_H - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, SKYVIEW_W - 1)
    y1 = jnp.minimum(y0 + 1, SKYVIEW_H - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    return (lut[y0, x0] * (1 - fx) * (1 - fy) + lut[y0, x1] * fx * (1 - fy) +
            lut[y1, x0] * (1 - fx) * fy + lut[y1, x1] * fx * fy)


def sun_disk_radiance(p: AtmosphereParams, t_lut: jnp.ndarray,
                      view_dir: jnp.ndarray, sun_dir: jnp.ndarray,
                      cam_alt_km: float = 0.2,
                      sun_angular_radius: float = 0.00465) -> jnp.ndarray:
    """Sun disk with limb transmittance, added to sky pixels."""
    r0 = cam_alt_km + p.ground_radius_km
    c = jnp.einsum("...c,c->...", view_dir, sun_dir)
    cos_rad = np.cos(sun_angular_radius)
    in_disk = (c >= cos_rad)[..., None]
    # within the ~0.27deg disk view ~= sun_dir: ONE transmittance sample
    # at the sun elevation replaces a per-pixel LUT gather
    t_sun = sample_transmittance(t_lut, p, jnp.asarray(r0), sun_dir[1])
    return jnp.where(in_disk, t_sun * p.sun_illuminance * 50.0, 0.0)


def sky_ambient_irradiance(lut: jnp.ndarray) -> jnp.ndarray:
    """Cheap hemispheric average of the sky-view LUT -> (3,) ambient term
    (the reference feeds its GI sky sampling instead; used until GI)."""
    upper = lut[SKYVIEW_H // 2:]
    return jnp.mean(upper, axis=(0, 1))


def aerial_perspective(p: AtmosphereParams, dist_units: jnp.ndarray,
                       sky_along_view: jnp.ndarray,
                       cam_alt_km=0.2,
                       view_dir_y: jnp.ndarray = None):
    """Per-pixel aerial perspective on GEOMETRY (reference:
    lighting.hlsl:75-135 evaluates the Bruneton LUTs per pixel with
    camera-altitude km math for distant-surface in-scattering).

    TPU form: CLOSED-FORM slant-path optical depth. For an exponential
    density exp(-h/H) along a ray with unit-slope dy starting at h0,
      tau = sigma * H/dy * exp(-h0/H) * (1 - exp(-d*dy/H))
    (limit sigma*exp(-h0/H)*d as dy -> 0) — exact for the flat-earth
    exponential profiles (Rayleigh + Mie); the ozone tent is evaluated
    at the path's mean altitude. This is altitude-AWARE: a flight-sim
    camera at 10 km sees thin air, a ray slanting down into the haze
    picks up the full boundary-layer extinction. In-scatter remains
    skyview(dir) * (1 - T): exact at d=0 and d=inf, smooth in between.

    dist_units (...,) camera distance in world units;
    sky_along_view (...,3) sky-view radiance along each pixel's dir;
    cam_alt_km: scalar or traced () camera altitude in km;
    view_dir_y (...,) unit view-direction y (None = constant-altitude).
    -> (transmittance (...,3), in_scatter (...,3))."""
    d_km = dist_units * p.km_per_unit
    h0 = jnp.clip(jnp.asarray(cam_alt_km, jnp.float32), 0.0,
                  p.top_radius_km - p.ground_radius_km)
    if view_dir_y is None:
        ext = _extinction(p, h0)                  # (3,)
        t = jnp.exp(-ext * d_km[..., None])
        return t, sky_along_view * (1.0 - t)

    dy = view_dir_y
    h_end = jnp.clip(h0 + d_km * dy, 0.0,
                     p.top_radius_km - p.ground_radius_km)

    def tau_exp(sigma, H):
        """Closed-form optical depth for density exp(-h/H)."""
        flatish = jnp.abs(dy) < 1e-3
        safe_dy = jnp.where(flatish, 1.0, dy)
        slant = (H / safe_dy) * jnp.exp(-h0 / H) * \
            (1.0 - jnp.exp(-d_km * dy / H))
        level = d_km * jnp.exp(-h0 / H)
        return sigma * jnp.where(flatish, level, slant)[..., None]

    rs = jnp.asarray(p.rayleigh_scatter)
    tau = tau_exp(rs, p.rayleigh_scale_h)
    tau = tau + tau_exp(jnp.asarray(p.mie_scatter + p.mie_absorb),
                        p.mie_scale_h)
    # ozone tent: mean-altitude evaluation (slowly varying at 25 km)
    h_mid = 0.5 * (h0 + h_end)
    ozo = jnp.clip(1.0 - jnp.abs(h_mid - p.ozone_center_km) /
                   (p.ozone_width_km * 0.5), 0.0, 1.0)
    tau = tau + (ozo * d_km)[..., None] * jnp.asarray(p.ozone_absorb)
    t = jnp.exp(-tau)
    return t, sky_along_view * (1.0 - t)
