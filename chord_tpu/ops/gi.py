"""Global illumination: world radiance cache (SH clipmap cascades) +
screen-space AO, with temporal accumulation.

TPU-native equivalent of the reference's Lumen-style GI
(reference: renderer/gi/screen_probe_gather.cpp:182 giUpdate — an
8-cascade clipmap of SH probe volumes (32^3 default, voxel size x2 per
cascade, camera-anchored scrolling, :221-260) updated and propagated each
frame, screen probes traced with inline ray queries, SH projected,
injected into the world cache, temporally filtered and upsampled;
shader/gi.h:21-381 structs).

TPU adaptation (no RT cores, gathers are expensive):
- The world cache is the SAME data structure (cascaded SH volumes with
  toroidal world-anchored addressing, so camera motion needs no copy).
- Injection feeds the cache from the CURRENT frame's lit surfaces
  (subsampled gbuffer splat -> scatter-add), the TPU stand-in for the
  reference's screen-probe -> cache injection (gi_world_probe_inject);
  sky radiance seeds empty space. Multi-bounce emerges over frames
  exactly like the reference's cache (feedback through shading).
- Diffuse indirect = cosine-convolved SH irradiance sampled from the
  cache at QUARTER resolution (8 probe lookups per sample) + bilateral
  upsample — mirroring the reference's half-res GI + upsample chain.
- AO: horizon-style screen-space AO from the depth buffer (the
  reference's SSAO default, screen_probe_gather.cpp:97-120).
- Specular GI: SH-based ambient specular (dominant-direction approx);
  mirror-trace SSR is a later stage.

SH convention: SH3 (3 bands, 9 coeffs) per RGB channel — 27 floats/probe
+ a weight channel — matching the reference's world-probe radiance
(shader/gi.h:21-29 SH3_gi, 9 float3 coeffs; the repo's world cache was
L1-only until round 4, which lost the directionality the screen probes
carry). Basis order/constants are ops/sh.py's (shared with the screen
probes, so injection is a 1:1 coefficient copy).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class GIConfig(NamedTuple):
    """reference: r.gi.worldcache.* cvars (screen_probe_gather.cpp:83)."""

    cascades: int = 4           # reference default 8; 4 covers test scenes
    probe_dim: int = 32         # probes per axis per cascade
    base_voxel: float = 0.5     # finest cascade voxel size (world units)
    inject_stride: int = 8      # gbuffer subsampling for injection
    inject_round_robin: bool = True   # one cascade per frame (amortized)
    inject_jitter: bool = True  # cycle the subsample phase per frame so
                                # every pixel becomes a surfel over
                                # stride^2 cascade cycles (the reference
                                # jitters screen-probe spawn positions,
                                # screen_probe_gather.cpp spawn pass)
    temporal_alpha: float = 0.06   # cache update rate per frame
    intensity: float = 1.0
    sample_res_div: int = 8     # irradiance sampled at 1/8 res (probe-ish
                                # granularity, like the reference's 8x8
                                # screen-probe tiles) + upsample
    trilinear: bool = False     # False = nearest probe (1 gather/cascade;
                                # gathers are the scarce resource here)
    ao_radius: float = 1.0
    ao_samples: int = 8
    ao_strength: float = 1.0
    ao_res_div: int = 2         # SSAO at 1/div res + upsample (AO is
                                # low-frequency; the roll taps are
                                # memory-bound so cost ~ 1/div^2)
    ao_mode: str = "ssao"       # "ssao" | "rtao" — RTAO traces real AO
                                # rays against the scene BVH (reference
                                # gi_rt_ao.hlsl, cvar-selected vs SSAO in
                                # screen_probe_gather.cpp:97-120); sees
                                # offscreen occluders SSAO cannot
    rtao_rays: int = 4          # hemisphere rays per pixel (rtao)


SH0 = 0.2820948
SH1 = 0.4886025
NSH = 9            # SH3 coeffs per channel (reference shader/gi.h:21-29)
NFL = NSH * 3      # SH floats per probe (rgb-major blocks of 9)
ROW = NFL + 1      # + weight channel
_ROW_PAD = 32 - ROW   # pad rows to 32 so row gathers stay on the
                      # aligned fast path (minor dims pad to lanes)


def sh_size(cfg: GIConfig) -> Tuple[int, ...]:
    """Cache shape: (cascades, D^3, 28) = 27 SH3 coeffs (rgb x 9) +
    weight."""
    return (cfg.cascades, cfg.probe_dim ** 3, ROW)


def _probe_coords(pos_w: jnp.ndarray, cascade: int, cfg: GIConfig,
                  anchor_w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World position -> (grid coords f32, in-bounds mask) for a cascade.

    Toroidal world-anchored addressing: probe (i,j,k) of cascade c stores
    the probe at world cell `floor(pos/voxel) mod D` — camera motion needs
    no scrolling copies (the reference scrolls + invalidates instead,
    screen_probe_gather.cpp:221-260)."""
    voxel = cfg.base_voxel * (2.0 ** cascade)
    g = pos_w / voxel                                 # continuous cell
    rel = g - anchor_w / voxel
    half = cfg.probe_dim * 0.5
    inb = jnp.all(jnp.abs(rel) < (half - 1.5), axis=-1)
    return g, inb


def _wrap_index(cell: jnp.ndarray, cfg: GIConfig) -> jnp.ndarray:
    """Integer cell coords -> flat toroidal probe index."""
    d = cfg.probe_dim
    w = jnp.remainder(cell, d)
    return (w[..., 0] * d + w[..., 1]) * d + w[..., 2]


def inject_surfels(
    cache: jnp.ndarray,          # (C, D^3, 28)
    pos_w: jnp.ndarray,          # (N,3) lit surface points (world/TW)
    radiance: jnp.ndarray,       # (N,3) outgoing radiance (AP1)
    normal: jnp.ndarray,         # (N,3)
    valid: jnp.ndarray,          # (N,)
    cam_pos: jnp.ndarray,        # (3,) cascade anchor (camera)
    cfg: GIConfig,
    only_cascade=None,   # int or traced scalar: round-robin amortization
) -> jnp.ndarray:
    """Splat lit surfels into every cascade (scatter-add + temporal blend).

    The radiance a probe receives from a surfel arrives from direction
    (surfel - probe); we approximate it with the surfel normal's opposite
    (cheap, avoids per-corner direction math) which is exact for probes in
    front of the surface — the dominant visibility case."""
    from . import sh as sh_ops

    out = cache
    d = -normal                   # direction radiance travels (into scene)
    y = sh_ops.sh_basis(d)                            # (N,9)
    contrib = radiance[:, None, :] * y[:, :, None]    # (N,9,3)
    flat = jnp.transpose(contrib, (0, 2, 1)).reshape(-1, NFL)  # rgb-major
    if only_cascade is not None and not isinstance(only_cascade, int):
        # traced cascade index: one scatter via lax.switch
        def branch(c):
            return lambda cc: inject_surfels(cc, pos_w, radiance, normal,
                                             valid, cam_pos, cfg,
                                             only_cascade=c)
        return jax.lax.switch(only_cascade,
                              [branch(c) for c in range(cfg.cascades)],
                              cache)
    cascades = (range(cfg.cascades) if only_cascade is None
                else [only_cascade])
    for c in cascades:
        g, inb = _probe_coords(pos_w, c, cfg, cam_pos)
        ok = valid & inb
        cell = jnp.floor(g + 0.5).astype(jnp.int32)   # nearest probe
        idx = jnp.where(ok, _wrap_index(cell, cfg), cfg.probe_dim ** 3)
        w = ok.astype(jnp.float32)
        payload = jnp.concatenate(
            [jnp.where(ok[:, None], flat, 0.0), w[:, None]], axis=1)
        upd = jnp.zeros((cfg.probe_dim ** 3 + 1, ROW)).at[idx].add(
            payload, mode="drop")[:-1]
        # normalized mean of this frame's surfels, blended temporally
        cnt = jnp.maximum(upd[:, NFL:ROW], 1e-6)
        mean = upd[:, :NFL] / cnt
        has = (upd[:, NFL:ROW] > 0.0).astype(jnp.float32)
        a = cfg.temporal_alpha * has
        new_sh = out[c, :, :NFL] * (1.0 - a) + mean * a
        new_w = jnp.minimum(out[c, :, NFL:ROW] + has, 64.0)
        out = out.at[c].set(jnp.concatenate([new_sh, new_w], axis=1))
    return out


def propagate(cache: jnp.ndarray, cfg: GIConfig) -> jnp.ndarray:
    """One Jacobi diffusion step: blend each probe toward the average of
    its 6 neighbors (the reference's SHPropagate world-cache pass)."""
    d = cfg.probe_dim
    vol = cache[:, :, :NFL].reshape(cfg.cascades, d, d, d, NFL)
    wgt = cache[:, :, NFL:].reshape(cfg.cascades, d, d, d, 1)
    acc = jnp.zeros_like(vol)
    wacc = jnp.zeros_like(wgt)
    for axis in (1, 2, 3):
        for shift in (-1, 1):
            acc = acc + jnp.roll(vol * (wgt > 0), shift, axis) * \
                jnp.roll((wgt > 0).astype(jnp.float32), shift, axis)
            wacc = wacc + jnp.roll((wgt > 0).astype(jnp.float32), shift,
                                   axis)
    neighbor_mean = acc / jnp.maximum(wacc, 1e-6)
    # unlit probes adopt neighbors; lit probes blend 10%
    blend = jnp.where(wgt > 0, 0.1, jnp.where(wacc > 0, 0.5, 0.0))
    vol = vol * (1 - blend) + neighbor_mean * blend
    new_w = jnp.maximum(wgt, jnp.where(wacc > 0, 0.5, 0.0))
    return jnp.concatenate([vol.reshape(cfg.cascades, d ** 3, NFL),
                            new_w.reshape(cfg.cascades, d ** 3, 1)], axis=2)


def sample_irradiance(
    cache: jnp.ndarray,          # (C, D^3, 28)
    pos_w: jnp.ndarray,          # (...,3) surface points
    normal: jnp.ndarray,         # (...,3)
    cam_pos: jnp.ndarray,        # (3,)
    cfg: GIConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (irradiance (...,3) AP1, confidence (...,)). Picks the finest
    in-bounds cascade; trilinear over 8 probes; cosine-lobe SH3 eval."""
    from . import sh as sh_ops

    n = normal
    # cosine-convolved irradiance basis: Y(n) * A_band (A2 = pi/4)
    basis = sh_ops.sh_basis(n) * jnp.asarray(sh_ops.A_BAND)   # (...,9)

    irr = jnp.zeros(n.shape[:-1] + (3,))
    conf = jnp.zeros(n.shape[:-1])
    done = jnp.zeros(n.shape[:-1], bool)
    # 32-wide rows: see sample_radiance
    cache = jnp.pad(cache, ((0, 0), (0, 0), (0, _ROW_PAD)))
    for c in range(cfg.cascades):
        g, inb = _probe_coords(pos_w, c, cfg, cam_pos)
        if cfg.trilinear:
            base = jnp.floor(g)      # probes sit at integer grid coords
            frac = g - base
            acc = jnp.zeros(n.shape[:-1] + (NFL,))
            wacc = jnp.zeros(n.shape[:-1])
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        cell = base.astype(jnp.int32) + \
                            jnp.asarray([dx, dy, dz], jnp.int32)
                        idx = _wrap_index(cell, cfg)
                        probe = cache[c, idx]               # (...,32)
                        tw = (jnp.where(dx, frac[..., 0], 1 - frac[..., 0]) *
                              jnp.where(dy, frac[..., 1], 1 - frac[..., 1]) *
                              jnp.where(dz, frac[..., 2], 1 - frac[..., 2]))
                        has = (probe[..., NFL] > 0.5).astype(jnp.float32)
                        acc = acc + probe[..., :NFL] * (tw * has)[..., None]
                        wacc = wacc + tw * has
        else:
            # nearest probe: one gather per cascade (the upsample blur
            # smooths the blockiness, like the reference's probe-res GI)
            cell = jnp.floor(g + 0.5).astype(jnp.int32)
            probe = cache[c, _wrap_index(cell, cfg)]
            has = (probe[..., NFL] > 0.5).astype(jnp.float32)
            acc = probe[..., :NFL] * has[..., None]
            wacc = has
        sh = acc / jnp.maximum(wacc[..., None], 1e-6)
        e = jnp.stack([
            jnp.sum(sh[..., 0:NSH] * basis, -1),
            jnp.sum(sh[..., NSH:2 * NSH] * basis, -1),
            jnp.sum(sh[..., 2 * NSH:NFL] * basis, -1)], axis=-1)
        use = inb & ~done & (wacc > 0.1)
        irr = jnp.where(use[..., None], jnp.maximum(e, 0.0), irr)
        conf = jnp.where(use, jnp.clip(wacc, 0.0, 1.0), conf)
        done = done | use
    return irr * cfg.intensity, conf


def sample_radiance(
    cache: jnp.ndarray,          # (C, D^3, 28)
    pos_w: jnp.ndarray,          # (...,3)
    direction: jnp.ndarray,      # (...,3) lookup direction (e.g. reflection)
    cam_pos: jnp.ndarray,
    cfg: GIConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (radiance (...,3), confidence). SH3 radiance evaluated along a
    direction — feeds ambient SPECULAR (the rough-lobe fallback under the
    GGX-sampled SSR/BVH traces)."""
    from . import sh as sh_ops

    d = direction
    basis = sh_ops.sh_basis(d)                                # (...,9)
    rad = jnp.zeros(d.shape[:-1] + (3,))
    conf = jnp.zeros(d.shape[:-1])
    done = jnp.zeros(d.shape[:-1], bool)
    # 32-wide rows: (N,28) row gathers fall off the TPU fast path (minor
    # dims pad to 128 lanes); pad once, gather aligned rows
    cache32 = jnp.pad(cache, ((0, 0), (0, 0), (0, _ROW_PAD)))
    for c in range(cfg.cascades):
        g, inb = _probe_coords(pos_w, c, cfg, cam_pos)
        cell = jnp.floor(g + 0.5).astype(jnp.int32)
        probe = cache32[c, _wrap_index(cell, cfg)]
        sh = probe[..., :NFL]
        e = jnp.stack([jnp.sum(sh[..., 0:NSH] * basis, -1),
                       jnp.sum(sh[..., NSH:2 * NSH] * basis, -1),
                       jnp.sum(sh[..., 2 * NSH:NFL] * basis, -1)], -1)
        has = probe[..., NFL] > 0.5
        use = inb & ~done & has
        rad = jnp.where(use[..., None], jnp.maximum(e, 0.0) * np.pi, rad)
        conf = jnp.where(use, 1.0, conf)
        done = done | use
    return rad * cfg.intensity, conf


def ssao(depth: jnp.ndarray,      # (H,W) reverse-Z
         pos_tw: jnp.ndarray,     # (H,W,3)
         normal: jnp.ndarray,     # (H,W,3)
         cfg: GIConfig,
         frame_index: jnp.ndarray = None) -> jnp.ndarray:
    """Screen-space AO at full res via fixed-offset neighbor taps
    (horizon-style; reference default AO is SSAO,
    screen_probe_gather.cpp:97). Shifted-array taps instead of random
    gathers — rolls are cheap on TPU, gathers are not."""
    h, w = depth.shape
    occ = jnp.zeros((h, w))
    cnt = 0
    taps = [(1, 3), (3, -1), (-2, 2), (-3, -3), (2, 6), (6, -2), (-5, 4),
            (-6, -6)][:cfg.ao_samples]
    for dy, dx in taps:
        p2 = jnp.roll(jnp.roll(pos_tw, dy, 0), dx, 1)
        d = p2 - pos_tw
        dist = jnp.linalg.norm(d, axis=-1)
        dirn = d / jnp.maximum(dist[..., None], 1e-6)
        # horizon: neighbor above the tangent plane occludes
        s = jnp.sum(dirn * normal, -1)
        a = jnp.clip(s - 0.1, 0.0, 1.0) * \
            jnp.clip(1.0 - dist / cfg.ao_radius, 0.0, 1.0)
        occ = occ + a
        cnt += 1
    ao = 1.0 - cfg.ao_strength * occ / cnt
    return jnp.clip(ao, 0.0, 1.0)


def rtao(pos_tw: jnp.ndarray,     # (H,W,3)
         normal: jnp.ndarray,     # (H,W,3)
         bvh,                     # ops.rt.SceneBVH
         cfg: GIConfig,
         frame_index: jnp.ndarray = None) -> jnp.ndarray:
    """Ray-traced AO (reference gi_rt_ao.hlsl: short ray-query rays vs
    the TLAS, cvar-selected instead of SSAO): rtao_rays hemisphere rays
    per pixel against the scene BVH with a radius falloff. Unlike SSAO
    it sees occluders outside the screen. Ray directions are a fixed
    cosine-ish fan oriented per pixel (branchless tangent basis) with an
    IGN azimuth rotation per frame — TSR/temporal passes resolve the
    sample rotation like they do the reference's blue-noise rays.

    BVH granularity matters (ADVICE r3): proxy-sphere BVHs
    (build_scene_bvh granularity="meshlet"/"object") bound flat
    neighboring geometry with spheres that poke ABOVE the surface, so
    short AO rays from a flat floor graze neighboring proxies at
    near-zero t and read as occlusion. Rays starting INSIDE a proxy are
    already skipped (trace discards t_entry<=1e-4), but grazing
    neighbors are real sphere hits. Use granularity="triangle" for
    rtao; proxy BVHs remain fine for GI radiance rays (which want
    coarse any-geometry hits) and for scenes whose leaves ARE spheres."""
    from . import rt as rt_ops
    from .bluenoise import interleaved_gradient_noise

    h, w = normal.shape[:2]
    n = normal
    # branchless orthonormal basis (Duff et al. pattern)
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t1 = jnp.stack([1.0 + s * n[..., 0] ** 2 * a, s * b,
                    -s * n[..., 0]], -1)
    t2 = jnp.stack([b, s + n[..., 1] ** 2 * a, -n[..., 1]], -1)

    rot = (interleaved_gradient_noise(h, w, frame_index) * 2.0 * np.pi
           if frame_index is not None else jnp.zeros((h, w)))
    occ = jnp.zeros((h, w))
    k = max(cfg.rtao_rays, 1)
    org = pos_tw + n * 0.05
    for i in range(k):
        # golden-angle fan, ~60 deg elevation (cosine-ish mass)
        phi = rot + (i + 0.5) * (np.pi * (3.0 - np.sqrt(5.0)))
        ct = np.float32(np.sqrt((i + 0.5) / k))        # cos(elevation)
        st = np.float32(np.sqrt(1.0 - ct * ct))
        d = (t1 * (jnp.cos(phi) * st)[..., None] +
             t2 * (jnp.sin(phi) * st)[..., None] + n * ct)
        t_hit, leaf = rt_ops.trace(org, d, bvh, t_max=cfg.ao_radius)
        hit = leaf >= 0
        occ = occ + jnp.where(
            hit, jnp.clip(1.0 - t_hit / cfg.ao_radius, 0.0, 1.0), 0.0)
    ao = 1.0 - cfg.ao_strength * occ / k
    return jnp.clip(ao, 0.0, 1.0)


def _down(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return x[..., ::k, ::k] if x.ndim == 2 else x[::k, ::k]


def diffuse_gi(
    cache: jnp.ndarray,
    gbuf,                        # shading.GBuffer
    cam_pos_w: jnp.ndarray,      # (3,) anchor (TW origin = camera)
    cfg: GIConfig,
) -> jnp.ndarray:
    """-> (H,W,3) indirect diffuse irradiance (before albedo), sampled at
    1/sample_res_div resolution and bilinearly upsampled (the reference
    samples GI at half res + bilateral upsample)."""
    k = cfg.sample_res_div
    pos_q = gbuf.position_tw[::k, ::k]
    nrm_q = gbuf.normal[::k, ::k]
    irr_q, conf_q = sample_irradiance(cache, pos_q, nrm_q, cam_pos_w, cfg)
    irr_q = irr_q * conf_q[..., None]
    # nearest/bilinear upsample back to full res
    h, w = gbuf.valid.shape
    from .post import upsample_nearest
    irr = upsample_nearest(irr_q, k, h, w)
    return jnp.where(gbuf.valid[..., None], irr, 0.0)


def update_cache(
    cache: jnp.ndarray,
    gbuf,                        # shading.GBuffer (current frame)
    lit_color: jnp.ndarray,      # (H,W,3) this frame's outgoing radiance
    cam_pos_w: jnp.ndarray,
    cfg: GIConfig,
    frame_count=None,            # traced counter for round-robin
) -> jnp.ndarray:
    """Inject the current frame's shaded surfaces + one propagation step
    (the per-frame world-cache update, screen_probe_gather.cpp:221-260).
    With inject_round_robin one cascade updates per call (amortized like
    the reference's cascade scrolling updates)."""
    s = cfg.inject_stride
    if cfg.inject_jitter and frame_count is not None:
        # advance the phase once per full cascade round; ×5 scrambles the
        # visit order (gcd(5, s^2) = 1 for power-of-two strides)
        j = jnp.remainder((frame_count // max(cfg.cascades, 1)) * 5, s * s)
        oy, ox = j // s, j % s

        def sub(a):
            return jnp.roll(a, (-oy, -ox), axis=(0, 1))[::s, ::s]
    else:
        def sub(a):
            return a[::s, ::s]
    pos = sub(gbuf.position_tw).reshape(-1, 3)
    rad = sub(lit_color).reshape(-1, 3)
    nrm = sub(gbuf.normal).reshape(-1, 3)
    val = sub(gbuf.valid).reshape(-1)
    only = None
    if cfg.inject_round_robin and frame_count is not None:
        only = jnp.remainder(frame_count, cfg.cascades)
    cache = inject_surfels(cache, pos, rad, nrm, val, cam_pos_w, cfg,
                           only_cascade=only)
    if cfg.inject_round_robin and frame_count is not None:
        # propagate only the cascade injected this frame (diffusion of the
        # others advances on their turn — same steady state, 1/C the work)
        d3 = cfg.probe_dim ** 3
        one = jax.lax.dynamic_slice(cache, (only, 0, 0), (1, d3, ROW))
        prop1 = propagate(one, cfg._replace(cascades=1))
        return jax.lax.dynamic_update_slice(cache, prop1, (only, 0, 0))
    return propagate(cache, cfg)
