"""Screen-probe GI: the Lumen-style two-level gather on TPU.

TPU-native equivalent of the reference's screen-probe stage
(reference: renderer/gi/screen_probe_gather.cpp:164-182 pass list —
ScreenProbeSpawn -> ScreenProbeSHReproject -> ScreenProbeTrace ->
ScreenProbeSH project -> WorldProbeInject -> HistoryReproject ->
Interpolate -> diffuse SpatialFilter X/Y -> bilateral SpatialUpsample;
structs shader/gi.h:21-29 (SH3 = 9 coeffs + numSample) and :381-406
(spawn info = normal, depth, jittered pixelPosition per 8x8 tile)).

TPU adaptation (no ray-query hardware; gathers are the scarce resource):
- One probe per 8x8 pixel tile, spawned at a per-frame-jittered pixel of
  the tile (strided slicing after a roll — zero gathers; the reference
  jitters spawn positions the same way, gi_screen_probe_spawn.hlsl).
- Probe radiance is SH3 per probe (ops/sh.py), temporally accumulated
  with numSample weighting exactly like SH3_gi.numSample (gi.h:28,
  kGIMaxSampleCount=64).
- The trace is a screen-space march against a quarter-res depth pyramid
  level; hits shade from the previous frame's lit color (the reference
  samples its world cache + TLAS hit shading; the screen march is the
  TPU stand-in, with the world SH cache + sky as the miss fallback).
  A software-BVH traced fallback (ops/rt.py) can replace the miss path.
- Interpolate runs as a weight-aware dense RESIZE of the probe SH planes
  to half resolution (no per-pixel probe gathers), then cosine-lobe SH
  irradiance eval with half-res normals.
- History reprojection + separable depth/normal-weighted spatial filter
  at half res, then a parity-correct bilateral 2x upsample to full res
  (gi_upsample.hlsl's 4-tap depth/normal weighting, via shifted planes).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import sh


class ScreenProbeConfig(NamedTuple):
    tile: int = 8                # probe spacing in pixels (8x8 tiles)
    trace_mode: str = "taps"     # "taps" = gather-free neighbor-surface
                                 # sampling (rolls; production path) or
                                 # "march" = per-ray depth-buffer march
    rays: int = 16               # rays traced per probe per frame (march)
    steps: int = 8               # march steps per ray
    max_distance: float = 40.0   # world-units march length
    thickness: float = 0.08      # NDC-depth hit thickness (reverse-Z)
    depth_div: int = 4           # march against 1/depth_div-res depth
    max_samples: float = 64.0    # SH numSample cap (gi.h kGIMaxSampleCount)
    temporal_depth_tol: float = 0.06   # probe reprojection depth gate
    history_alpha: float = 0.9   # per-pixel half-res history weight
    history_mode: str = "global"   # "global" = mean-motion roll;
                                   # "tile" = per-32x32-tile mean motion
                                   # (ops/tile_reproject.py, parallax-
                                   # correct); "gather" = exact per-pixel
                                   # reprojection (zero gathers; see
                                   # history_reproject_half) | "gather"
                                   # = exact per-pixel resample
    sky_leak: float = 0.25       # r.gi.skylightleaking default 0.25
    filter_taps: int = 2         # spatial filter radius (half-res pixels)
    intensity: float = 1.0


def _octahedral_dirs(n_side: int) -> np.ndarray:
    """(n_side^2, 3) unit dirs: octahedral map cell centers (full sphere,
    equal-ish solid angle — the reference's probe ray parameterization)."""
    u = (np.arange(n_side) + 0.5) / n_side * 2.0 - 1.0
    uu, vv = np.meshgrid(u, u, indexing="ij")
    x = uu
    y = vv
    az = 1.0 - np.abs(x) - np.abs(y)
    xo = np.where(az >= 0, x, (1 - np.abs(y)) * np.sign(x + 1e-12))
    yo = np.where(az >= 0, y, (1 - np.abs(x)) * np.sign(y + 1e-12))
    d = np.stack([xo, yo, az], -1).reshape(-1, 3)
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def _jitter_rotation(frame_count: jnp.ndarray) -> jnp.ndarray:
    """Per-frame 3x3 rotation (golden-angle azimuth + alternating tilt) so
    the fixed ray set covers new directions every frame (the reference
    jitters per-ray via blue noise; one rotation per frame is the dense
    equivalent)."""
    f = frame_count.astype(jnp.float32)
    a = f * 2.3999632297286533          # golden angle
    b = f * 1.1
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    zero = jnp.zeros(())
    one = jnp.ones(())
    rz = jnp.stack([jnp.stack([ca, -sa, zero]),
                    jnp.stack([sa, ca, zero]),
                    jnp.stack([zero, zero, one])])
    rx = jnp.stack([jnp.stack([one, zero, zero]),
                    jnp.stack([zero, cb, -sb]),
                    jnp.stack([zero, sb, cb])])
    return rz @ rx


def probe_ray_dirs(probes: "ProbeState", frame_count: jnp.ndarray,
                   cfg: ScreenProbeConfig) -> jnp.ndarray:
    """The frame's per-probe ray set (Ph,Pw,R,3): jitter-rotated
    octahedral directions flipped into each probe's hemisphere."""
    ph, pw = probes.depth.shape
    r = cfg.rays
    base = jnp.asarray(_octahedral_dirs(int(np.sqrt(r))))     # (R,3)
    rot = _jitter_rotation(frame_count)
    dirs = (base @ rot.T)[None, None]                         # (1,1,R,3)
    dirs = jnp.broadcast_to(dirs, (ph, pw, r, 3))
    ndot = jnp.sum(dirs * probes.normal[..., None, :], -1, keepdims=True)
    return jnp.where(ndot < 0.0, -dirs, dirs)


class ProbeState(NamedTuple):
    """Per-frame spawned probe attributes (GIScreenProbeSpawnInfo)."""

    pos_tw: jnp.ndarray     # (Ph,Pw,3) probe surface position
    normal: jnp.ndarray     # (Ph,Pw,3)
    depth: jnp.ndarray      # (Ph,Pw) reverse-Z ndc depth
    valid: jnp.ndarray      # (Ph,Pw) bool — tile had geometry


def spawn_probes(gbuf, depth: jnp.ndarray, frame_count: jnp.ndarray,
                 cfg: ScreenProbeConfig) -> ProbeState:
    """One probe per tile at a per-frame-jittered in-tile pixel
    (gi_screen_probe_spawn.hlsl). Strided slice after a roll — the jitter
    phase cycles through all tile pixels over tile^2 frames."""
    t = cfg.tile
    j = jnp.remainder(frame_count * 5, t * t)
    oy, ox = j // t, j % t

    def sub(a):
        return jnp.roll(a, (-oy, -ox), axis=(0, 1))[::t, ::t]

    return ProbeState(pos_tw=sub(gbuf.position_tw), normal=sub(gbuf.normal),
                      depth=sub(depth), valid=sub(gbuf.valid))


def reproject_probe_sh(
    probes: ProbeState,
    prev_probe_sh: jnp.ndarray,      # (Ph,Pw,28) packed SH + numSample
    prev_probe_depth: jnp.ndarray,   # (Ph,Pw) prev probes' ndc depth
    prev_tw_to_clip: jnp.ndarray,    # (4,4) current TW -> prev clip
    history_valid: jnp.ndarray,      # () f32
    cfg: ScreenProbeConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Temporal SH reprojection (gi_screen_probe_sh_reproject.hlsl):
    project each probe's surface point into the previous frame's probe
    grid, fetch that probe's SH, gate on depth consistency.
    -> (sh (Ph,Pw,9,3), num_sample (Ph,Pw))."""
    ph, pw = probes.depth.shape
    p = probes.pos_tw
    c = (p[..., 0:1] * prev_tw_to_clip[0] + p[..., 1:2] * prev_tw_to_clip[1] +
         p[..., 2:3] * prev_tw_to_clip[2] + prev_tw_to_clip[3])
    wc = jnp.maximum(c[..., 3], 1e-6)
    # prev probe grid coords (probes tile the screen every `tile` px)
    px = (c[..., 0] / wc * 0.5 + 0.5) * pw
    py = (0.5 - c[..., 1] / wc * 0.5) * ph
    z = c[..., 2] / wc
    on = ((px >= 0) & (px < pw) & (py >= 0) & (py < ph) & (c[..., 3] > 0) &
          probes.valid)
    xi = jnp.clip(px.astype(jnp.int32), 0, pw - 1)
    yi = jnp.clip(py.astype(jnp.int32), 0, ph - 1)
    prev = prev_probe_sh[yi, xi]                     # (Ph,Pw,28)
    prev_z = prev_probe_depth[yi, xi]
    # reverse-Z consistency: the reprojected point must land at roughly
    # the depth the previous probe saw (disocclusion gate)
    ok = on & (jnp.abs(z - prev_z) < cfg.temporal_depth_tol) & \
        (history_valid > 0.5)
    sh_prev, n_prev = sh.unpack(prev)
    n_prev = jnp.where(ok, n_prev, 0.0)
    return jnp.where(ok[..., None, None], sh_prev, 0.0), n_prev


def trace_probes(
    probes: ProbeState,
    depth_lo: jnp.ndarray,       # (H/d, W/d) reverse-Z depth (march target)
    prev_color: jnp.ndarray,     # (H,W,3) previous frame lit color (AP1)
    tw_to_clip: jnp.ndarray,     # (4,4) current nojitter
    frame_count: jnp.ndarray,
    cfg: ScreenProbeConfig,
    world_cache=None,            # optional (C,D^3,28) SH3 cache
    gi_cfg=None,                 # ops.gi.GIConfig for the cache
    sky_ambient: Optional[jnp.ndarray] = None,   # (3,) AP1 miss radiance
    traced_miss: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    dirs: Optional[jnp.ndarray] = None,          # precomputed ray set
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-probe hemisphere-ish radiance sampling (gi_screen_probe_trace):
    R rays per probe march the low-res depth; hits shade from last frame's
    lit color; misses fall back to the world SH cache then sky.
    `traced_miss` optionally supplies ((Ph,Pw,R,3) radiance, (Ph,Pw,R)
    confidence) from a software-BVH trace to upgrade the miss path.
    -> (radiance (Ph,Pw,R,3), ray dirs (Ph,Pw,R,3) — ready for SH
    projection; back-facing rays carry zero weight via the cosine clamp
    at projection time)."""
    ph, pw = probes.depth.shape
    hq, wq = depth_lo.shape
    fh, fw = prev_color.shape[:2]
    r = cfg.rays

    if dirs is None:
        dirs = probe_ray_dirs(probes, frame_count, cfg)

    org = probes.pos_tw[..., None, :] + \
        probes.normal[..., None, :] * 0.02                    # bias off surface

    def project(p3):
        c = (p3[..., 0:1] * tw_to_clip[0] + p3[..., 1:2] * tw_to_clip[1] +
             p3[..., 2:3] * tw_to_clip[2] + tw_to_clip[3])
        wc = jnp.maximum(c[..., 3], 1e-6)
        x = (c[..., 0] / wc * 0.5 + 0.5)
        y = (0.5 - c[..., 1] / wc * 0.5)
        z = c[..., 2] / wc
        return x, y, z, c[..., 3]

    rad = jnp.zeros((ph, pw, r, 3))
    found = jnp.zeros((ph, pw, r), bool)

    ts = np.cumsum(np.geomspace(0.06, 1.0, cfg.steps))
    ts = ts / ts[-1] * cfg.max_distance
    for t in ts:
        p = org + dirs * t
        x, y, z, cw = project(p)
        on = (x >= 0) & (x < 1) & (y >= 0) & (y < 1) & (cw > 0) & \
             (z > 0) & (z <= 1.0)
        xi = jnp.clip((x * wq).astype(jnp.int32), 0, wq - 1)
        yi = jnp.clip((y * hq).astype(jnp.int32), 0, hq - 1)
        scene_z = depth_lo[yi, xi]
        behind = (z < scene_z) & (z > scene_z - cfg.thickness) & \
            (scene_z > 0.0)
        hit = on & behind & ~found
        fx = jnp.clip((x * fw).astype(jnp.int32), 0, fw - 1)
        fy = jnp.clip((y * fh).astype(jnp.int32), 0, fh - 1)
        col = prev_color[fy, fx]
        rad = jnp.where(hit[..., None], col, rad)
        found = found | hit

    # miss fallback chain: BVH-traced radiance -> world SH cache -> sky
    miss = ~found
    if traced_miss is not None:
        rt_rad, rt_conf = traced_miss
        use = miss & (rt_conf > 0.5)
        rad = jnp.where(use[..., None], rt_rad, rad)
        miss = miss & ~use
    if world_cache is not None and gi_cfg is not None:
        from . import gi as gi_ops
        wc_rad, wc_conf = gi_ops.sample_radiance(
            world_cache, org, dirs, jnp.zeros(3), gi_cfg)
        use = miss & (wc_conf > 0.5)
        rad = jnp.where(use[..., None], wc_rad, rad)
        miss = miss & ~use
    if sky_ambient is not None:
        # sky leaking for rays that exit the known world (upper-hemisphere
        # weighted — downward escaping rays see darkness, not sky)
        up = jnp.clip(dirs[..., 1], 0.0, 1.0) * 0.8 + 0.2
        sky = sky_ambient[None, None, None, :] * up[..., None] * cfg.sky_leak
        rad = jnp.where(miss[..., None], sky, rad)
    return rad, dirs


TAP_OFFSETS = [(-2, 0), (2, 0), (0, -2), (0, 2),
               (-1, -1), (-1, 1), (1, -1), (1, 1),
               (-5, -2), (-5, 2), (5, -2), (5, 2),
               (-2, -6), (2, -6), (-2, 6), (2, 6)]

# fixed sky sample directions (upper hemisphere) for the miss term
_SKY_DIRS = np.array([[0, 1, 0],
                      [0.8, 0.6, 0], [-0.8, 0.6, 0],
                      [0, 0.6, 0.8], [0, 0.6, -0.8],
                      [0.55, 0.62, 0.55], [-0.55, 0.62, -0.55]],
                     np.float32)
_SKY_DIRS /= np.linalg.norm(_SKY_DIRS, axis=1, keepdims=True)


def gather_probe_taps(
    probes: ProbeState,
    scene_rad: jnp.ndarray,      # (Ph,Pw,3) prev-frame lit color at the
                                 # probe pixels (radiance leaving those
                                 # surfaces — invariant along the ray)
    sky_ambient: jnp.ndarray,    # (3,) AP1
    cfg: ScreenProbeConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather-free probe radiance sampling: each probe reads its
    neighbors' spawned surface points via SHIFTED PLANES (rolls — no
    gathers) and treats them as diffuse emitters along the real
    probe->surface directions; outgoing radiance is invariant along the
    ray so the neighbor's lit color IS the incident radiance. Sky
    directions are appended as fixed virtual taps. The spawn jitter
    rotates the tap geometry every frame, so the SH accumulation
    integrates over the neighborhood like the reference's traced rays
    (gi_screen_probe_trace.hlsl role, re-designed for a machine where a
    depth-march gather costs ~100 ns and a roll is free).
    -> (radiance (Ph,Pw,S,3), dirs (Ph,Pw,S,3), weights (Ph,Pw,S))."""
    ph, pw = probes.depth.shape
    rads, dirs, ws = [], [], []
    for dy, dx in TAP_OFFSETS:
        tp = jnp.roll(probes.pos_tw, (dy, dx), (0, 1))
        tr = jnp.roll(scene_rad, (dy, dx), (0, 1))
        tv = jnp.roll(probes.valid, (dy, dx), (0, 1))
        d = tp - probes.pos_tw
        dist = jnp.linalg.norm(d, axis=-1)
        dirn = d / jnp.maximum(dist[..., None], 1e-6)
        # taps below the tangent plane see the probe's own surface from
        # behind — reject; distant taps lose weight (their surface is
        # unlikely to actually subtend this direction)
        cosn = jnp.sum(dirn * probes.normal, -1)
        w = (tv & probes.valid & (dist > 1e-3) & (cosn > 0.05)
             ).astype(jnp.float32) * jnp.exp(-dist * 0.02)
        rads.append(tr)
        dirs.append(dirn)
        ws.append(w)
    # sky taps: sun-independent ambient along fixed upper directions
    for k in range(_SKY_DIRS.shape[0]):
        d = jnp.broadcast_to(jnp.asarray(_SKY_DIRS[k]), (ph, pw, 3))
        rads.append(jnp.broadcast_to(sky_ambient * cfg.sky_leak * 2.0,
                                     (ph, pw, 3)))
        dirs.append(d)
        ws.append(jnp.full((ph, pw), 0.6))
    rad = jnp.stack(rads, axis=2)
    dr = jnp.stack(dirs, axis=2)
    w = jnp.stack(ws, axis=2)
    return rad, dr, w


def project_and_merge(
    radiance: jnp.ndarray,       # (Ph,Pw,R,3)
    dirs: jnp.ndarray,           # (Ph,Pw,R,3)
    probes: ProbeState,
    sh_hist: jnp.ndarray,        # (Ph,Pw,9,3) reprojected history SH
    n_hist: jnp.ndarray,         # (Ph,Pw) history numSample
    cfg: ScreenProbeConfig,
    weights: Optional[jnp.ndarray] = None,   # (Ph,Pw,S) per-sample
) -> jnp.ndarray:
    """SH-project this frame's rays (gi_screen_probe_project_sh.hlsl) and
    merge with the reprojected history, numSample-weighted (SH3_gi.add).
    -> packed (Ph,Pw,28)."""
    r = radiance.shape[-2]
    sh_new = sh.project(radiance, dirs, weights)         # (Ph,Pw,9,3)
    if weights is not None:
        n_new = jnp.where(probes.valid,
                          jnp.minimum(jnp.sum(weights, -1), float(r)), 0.0)
    else:
        n_new = jnp.where(probes.valid, float(r), 0.0)
    n_tot = n_hist + n_new
    w_h = jnp.where(n_tot > 0, n_hist / jnp.maximum(n_tot, 1e-6), 0.0)
    merged = sh_hist * w_h[..., None, None] + \
        sh_new * (1.0 - w_h)[..., None, None]
    n_keep = jnp.minimum(n_tot, cfg.max_samples)
    return sh.pack(merged, n_keep)


def inject_world_cache(cache: jnp.ndarray, probe_sh: jnp.ndarray,
                       probes: ProbeState, gi_cfg,
                       frame_count=None) -> jnp.ndarray:
    """Feed converged screen probes into the world SH cache
    (gi_world_probe_sh_inject.hlsl): the probe's FULL SH3 radiance —
    the cache is SH3 since round 4 (reference shader/gi.h:21-29), so
    all 9 coefficients copy 1:1 (same ops/sh.py basis order) and the
    cache keeps the directionality the screen probes resolved."""
    from . import gi as gi_ops

    shc, n = sh.unpack(probe_sh)                        # (Ph,Pw,9,3), (Ph,Pw)
    flat = shc.reshape(-1, 9, 3)
    flat = jnp.transpose(flat, (0, 2, 1)).reshape(-1, gi_ops.NFL)  # rgb-major
    pos = probes.pos_tw.reshape(-1, 3)
    ok = (probes.valid & (n > 8.0)).reshape(-1)
    out = cache
    only = None
    if frame_count is not None:
        only = jnp.remainder(frame_count, gi_cfg.cascades)

        def branch(c):
            return lambda cc: _inject_cascade(cc, c, pos, flat, ok, gi_cfg)
        return jax.lax.switch(only,
                              [branch(c) for c in range(gi_cfg.cascades)],
                              cache)
    for c in range(gi_cfg.cascades):
        out = _inject_cascade(out, c, pos, flat, ok, gi_cfg)
    return out


def _inject_cascade(cache, c, pos, flat, ok, gi_cfg):
    from . import gi as gi_ops

    g, inb = gi_ops._probe_coords(pos, c, gi_cfg, jnp.zeros(3))
    use = ok & inb
    cell = jnp.floor(g + 0.5).astype(jnp.int32)
    idx = jnp.where(use, gi_ops._wrap_index(cell, gi_cfg),
                    gi_cfg.probe_dim ** 3)
    w = use.astype(jnp.float32)
    payload = jnp.concatenate(
        [jnp.where(use[:, None], flat, 0.0), w[:, None]], axis=1)
    nfl, row = gi_ops.NFL, gi_ops.ROW
    upd = jnp.zeros((gi_cfg.probe_dim ** 3 + 1, row)).at[idx].add(
        payload, mode="drop")[:-1]
    cnt = jnp.maximum(upd[:, nfl:row], 1e-6)
    mean = upd[:, :nfl] / cnt
    has = (upd[:, nfl:row] > 0.0).astype(jnp.float32)
    a = gi_cfg.temporal_alpha * 2.0 * has      # probes converge faster
    new_sh = cache[c, :, :nfl] * (1.0 - a) + mean * a
    new_w = jnp.minimum(cache[c, :, nfl:row] + has, 64.0)
    return cache.at[c].set(jnp.concatenate([new_sh, new_w], axis=1))


def _weighted_resize(planes: jnp.ndarray, weight: jnp.ndarray,
                     out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Weight-aware bilinear resize: invalid probes don't bleed into the
    interpolation (resize(planes*w)/resize(w)). Power-of-two upscales
    take the cascaded shift+lerp path (ops/post.py upsample_linear —
    the resize lowering gathers); anything else falls back to
    jax.image.resize."""
    h, w = out_hw
    ph, pw = weight.shape
    ky, kx = h / ph, w / pw
    if ky == kx and ky >= 1 and float(ky).is_integer() and \
            (int(ky) & (int(ky) - 1)) == 0:
        from .post import upsample_linear
        num = upsample_linear(planes * weight[..., None], int(ky), h, w)
        den = upsample_linear(weight, int(ky), h, w)
    else:
        import jax.image as jimage
        num = jimage.resize(planes * weight[..., None],
                            (h, w, planes.shape[-1]), "linear")
        den = jimage.resize(weight, (h, w), "linear")
    return num / jnp.maximum(den[..., None], 1e-4)


def interpolate_half(probe_sh: jnp.ndarray, probes: ProbeState,
                     normal_half: jnp.ndarray, valid_half: jnp.ndarray,
                     cfg: ScreenProbeConfig) -> jnp.ndarray:
    """Probe SH -> half-res diffuse irradiance
    (gi_screen_probe_interpolate.hlsl). The probe SH planes are resized
    (weight-aware, dense — no gathers) to half res, then cosine-lobe
    evaluated with each pixel's normal. -> (Hh,Wh,3)."""
    hh, wh = normal_half.shape[:2]
    shc, n = sh.unpack(probe_sh)
    w = jnp.where(probes.valid, jnp.minimum(n, cfg.max_samples), 0.0)
    planes = shc.reshape(shc.shape[:-2] + (27,))
    up = _weighted_resize(planes, w, (hh, wh))
    sh_half = up.reshape(hh, wh, 9, 3)
    e = sh.eval_irradiance(sh_half, normal_half) / np.pi
    return jnp.where(valid_half[..., None],
                     jnp.maximum(e, 0.0) * cfg.intensity, 0.0)


def history_reproject_half(
    diffuse: jnp.ndarray,        # (Hh,Wh,3) fresh irradiance
    motion_half: jnp.ndarray,    # (Hh,Wh,2) NDC motion (curr - prev)
    prev_diffuse: jnp.ndarray,   # (Hh,Wh,3)
    history_valid: jnp.ndarray,
    cfg: ScreenProbeConfig,
    disocclusion: Optional[jnp.ndarray] = None,   # (Hh,Wh) 1 = invalid
) -> jnp.ndarray:
    """Per-pixel temporal accumulation at half res
    (gi_history_reprojection.hlsl): motion-reprojected history blended
    with a 3x3 neighborhood clamp (suppresses ghosting on disocclusion,
    same rectify idea as TSR).

    cfg.history_mode "global" (default) reprojects by the MEAN screen
    motion via static rolls — zero gathers, the same compromise as
    tsr_mode="global" (ops/post.py temporal_resolve_global): camera
    motion is screen-coherent, and pixels whose own motion deviates get
    a residual-raised fresh weight so they re-converge instead of
    ghosting. Indirect diffuse is low-frequency + spatially filtered
    right after, which hides the residual error far better than on the
    final color. "gather" keeps the exact per-pixel resample — this was
    the largest GI gather left in the frame (half res = 4x9 the probe
    passes' element count)."""
    hh, wh = diffuse.shape[:2]
    if cfg.history_mode == "tile":
        # per-32x32-tile mean-motion reprojection (ops/tile_reproject.py)
        # — parallax-correct to within a tile, still gather-free
        from .tile_reproject import tile_reproject
        mot_px = jnp.stack([motion_half[..., 0] * (wh * 0.5),
                            -motion_half[..., 1] * (hh * 0.5)], -1)
        hist, resid = tile_reproject(prev_diffuse, mot_px)
        on = jnp.clip(1.0 - resid * 0.25, 0.0, 1.0)
    elif cfg.history_mode == "global":
        mx = jnp.mean(motion_half[..., 0]) * (wh * 0.5)
        my = -jnp.mean(motion_half[..., 1]) * (hh * 0.5)
        ix = jnp.floor(mx).astype(jnp.int32)
        iy = jnp.floor(my).astype(jnp.int32)
        fx = mx - ix.astype(jnp.float32)
        fy = my - iy.astype(jnp.float32)

        def sh(dy, dx):
            return jnp.roll(jnp.roll(prev_diffuse, dy, 0), dx, 1)

        hist = (sh(-iy, -ix) * (1 - fx) * (1 - fy) +
                sh(-iy, -ix - 1) * fx * (1 - fy) +
                sh(-iy - 1, -ix) * (1 - fx) * fy +
                sh(-iy - 1, -ix - 1) * fx * fy)
        rx = motion_half[..., 0] * (wh * 0.5) - mx
        ry = -motion_half[..., 1] * (hh * 0.5) - my
        resid = jnp.sqrt(rx * rx + ry * ry)
        on = jnp.clip(1.0 - resid * 0.25, 0.0, 1.0)
    else:
        xs = jnp.arange(wh, dtype=jnp.float32)[None, :] + 0.5
        ys = jnp.arange(hh, dtype=jnp.float32)[:, None] + 0.5
        px = xs - motion_half[..., 0] * wh * 0.5
        py = ys + motion_half[..., 1] * hh * 0.5
        on = ((px >= 0) & (px < wh) & (py >= 0) &
              (py < hh)).astype(jnp.float32)
        xi = jnp.clip(px.astype(jnp.int32), 0, wh - 1)
        yi = jnp.clip(py.astype(jnp.int32), 0, hh - 1)
        hist = prev_diffuse[yi, xi]

    lo = diffuse
    hi = diffuse
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        nb = jnp.roll(diffuse, (dy, dx), (0, 1))
        lo = jnp.minimum(lo, nb)
        hi = jnp.maximum(hi, nb)
    pad = (hi - lo) * 0.5 + 1e-3
    hist = jnp.clip(hist, lo - pad, hi + pad)

    a = cfg.history_alpha * history_valid * on
    if disocclusion is not None:
        a = a * (1.0 - disocclusion)
    return diffuse + (hist - diffuse) * a[..., None]


def spatial_filter_half(diffuse: jnp.ndarray, depth_half: jnp.ndarray,
                        normal_half: jnp.ndarray,
                        cfg: ScreenProbeConfig) -> jnp.ndarray:
    """Separable depth/normal-weighted blur at half res
    (gi_spatial_filter_diffuse.hlsl X/Y passes) — shifted-plane taps."""
    out = diffuse
    for axis in (1, 0):
        acc = out
        wacc = jnp.ones(depth_half.shape)
        for s in range(1, cfg.filter_taps + 1):
            for sign in (-1, 1):
                d2 = jnp.roll(depth_half, s * sign, axis)
                n2 = jnp.roll(normal_half, s * sign, axis)
                c2 = jnp.roll(out, s * sign, axis)
                wd = jnp.exp(-jnp.abs(d2 - depth_half) * 64.0)
                wn = jnp.clip(jnp.sum(n2 * normal_half, -1), 0.0, 1.0) ** 4
                w = wd * wn * (0.7 ** s)
                acc = acc + c2 * w[..., None]
                wacc = wacc + w
        out = acc / wacc[..., None]
    return out


def bilateral_upsample(
    diffuse_half: jnp.ndarray,   # (Hh,Wh,3)
    depth_half: jnp.ndarray,     # (Hh,Wh)
    normal_half: jnp.ndarray,    # (Hh,Wh,3)
    depth_full: jnp.ndarray,     # (H,W)
    normal_full: jnp.ndarray,    # (H,W,3)
) -> jnp.ndarray:
    """Parity-correct 4-tap bilateral 2x upsample (gi_upsample.hlsl):
    each full-res pixel blends its 4 surrounding half-res taps with
    bilinear x depth x normal weights — built from shifted planes (no
    gathers). -> (H,W,3)."""
    from .post import upsample_nearest

    h, w = depth_full.shape

    ys = jnp.arange(h, dtype=jnp.int32)[:, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    even_y = (ys % 2 == 0)
    even_x = (xs % 2 == 0)
    # full pixel y maps to half coord v = (y+0.5)/2 - 0.5: even rows pull
    # taps (j-1, j) with weights (0.25, 0.75); odd rows (j, j+1) with
    # (0.75, 0.25) — same in x
    wy0 = jnp.where(even_y, 0.25, 0.75).astype(jnp.float32)
    wx0 = jnp.where(even_x, 0.25, 0.75).astype(jnp.float32)

    # the 4 taps per pixel draw from half rows {k-1,k,k+1} x cols
    # {j-1,j,j+1}: 9 shifted planes per field (was 16) + parity selects
    fields = jnp.concatenate(
        [diffuse_half, depth_half[..., None], normal_half], axis=-1)

    def shifted(ry, rx):
        u = upsample_nearest(jnp.roll(fields, (ry, rx), (0, 1)), 2, h, w)
        return u

    U = {(ry, rx): shifted(ry, rx)
         for ry in (1, 0, -1) for rx in (1, 0, -1)}

    def tap(ty, tx):
        # y-shift: even rows 1-ty, odd rows -ty (same in x)
        ee = U[(1 - ty, 1 - tx)]
        eo = U[(1 - ty, -tx)]
        oe = U[(-ty, 1 - tx)]
        oo = U[(-ty, -tx)]
        eyb = even_y[..., None]
        exb = even_x[..., None]
        return jnp.where(eyb & exb, ee,
                         jnp.where(eyb & ~exb, eo,
                                   jnp.where(~eyb & exb, oe, oo)))

    acc = jnp.zeros((h, w, 3))
    wacc = jnp.zeros((h, w))
    for ty in (0, 1):
        for tx in (0, 1):
            t = tap(ty, tx)
            col = t[..., 0:3]
            dep = t[..., 3]
            nrm = t[..., 4:7]
            wb = (jnp.where(ty == 0, wy0, 1.0 - wy0) *
                  jnp.where(tx == 0, wx0, 1.0 - wx0))
            wd = jnp.exp(-jnp.abs(dep - depth_full) * 64.0)
            wn = jnp.clip(jnp.sum(nrm * normal_full, -1), 0.0, 1.0) ** 4
            wt = wb * (wd * wn + 1e-3)
            acc = acc + col * wt[..., None]
            wacc = wacc + wt
    return acc / jnp.maximum(wacc[..., None], 1e-6)


# ---------------------------------------------------------------------------
# Specular GI filtering chain (reference:
# gi_spatial_specular_remove_fireflare.hlsl + gi_spatial_filter_specular.hlsl
# + the shared history reprojection). Runs at the specular sample res
# (1/sample_res_div): edge-aware weights from the same-res depth/normal
# planes, shifted-plane taps (no gathers).
# ---------------------------------------------------------------------------

def _edge_weight(pos_c, nrm_c, pos_s, nrm_s, sharp: float = 8.0):
    """Reference weight = pow(normalFactor * distanceFactor, 16) with
    normalFactor = pow(saturate(n.n'), 16) — a gentler exponent here
    because the low-res planes already average geometry."""
    nf = jnp.clip(jnp.sum(nrm_c * nrm_s, -1), 0.0, 1.0) ** 8
    scale = jnp.maximum(jnp.linalg.norm(pos_c, axis=-1), 1e-3)
    df = jnp.clip(1.0 - jnp.linalg.norm(pos_s - pos_c, axis=-1) / scale,
                  0.0, 1.0)
    return (nf * df) ** sharp


def ggx_sample_normal(
    nrm: jnp.ndarray,         # (...,3) shading normal
    view: jnp.ndarray,        # (...,3) unit dir surface -> eye
    rough: jnp.ndarray,       # (...)
    u1: jnp.ndarray,          # (...) uniform [0,1)
    u2: jnp.ndarray,          # (...) uniform [0,1)
) -> jnp.ndarray:
    """GGX-importance-sampled microfacet normal (half-vector) for the
    specular trace (reference: the specular GI trace importance-samples
    rays by material roughness, renderer/gi/screen_probe_gather.cpp:
    164-179 + gi_specular_trace.hlsl — vs the repo's previous
    mirror-only rays).

    Samples the GGX NDF: theta_h = atan(a*sqrt(u1/(1-u1))), a = rough^2
    (Walter07). Reflecting the view dir about the returned normal gives
    one lobe sample per frame; the per-frame IGN rotation + the existing
    temporal_specular accumulation integrate the lobe over time exactly
    like the reference's stochastic trace + temporal chain. roughness=0
    returns the shading normal (mirror) unchanged.

    The returned vector doubles as a "virtual normal": passing it to
    SSR (which reflects about whatever normal it is given) makes the
    screen march GGX-aware with zero changes to the march itself."""
    a = jnp.maximum(rough * rough, 1e-4)[..., None]
    u1c = jnp.clip(u1, 0.0, 0.999)[..., None]
    u2e = u2[..., None]
    # tan^2(theta) = a^2 u / (1-u)
    t2 = (a * a) * u1c / (1.0 - u1c)
    cos_t = 1.0 / jnp.sqrt(1.0 + t2)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = (2.0 * np.pi) * u2e
    # branchless orthonormal basis (Duff et al.)
    s = jnp.where(nrm[..., 2:3] >= 0.0, 1.0, -1.0)
    c_ = -1.0 / (s + nrm[..., 2:3])
    b_ = nrm[..., 0:1] * nrm[..., 1:2] * c_
    t1v = jnp.concatenate([1.0 + s * nrm[..., 0:1] ** 2 * c_, s * b_,
                           -s * nrm[..., 0:1]], -1)
    t2v = jnp.concatenate([b_, s + nrm[..., 1:2] ** 2 * c_,
                           -nrm[..., 1:2]], -1)
    h = (t1v * (jnp.cos(phi) * sin_t) + t2v * (jnp.sin(phi) * sin_t) +
         nrm * cos_t)
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-8)
    # keep the reflected ray above the surface: if reflect(view, h)
    # dives below the shading plane, fall back to the shading normal
    d = 2.0 * jnp.sum(view * h, -1, keepdims=True) * h - view
    ok = jnp.sum(d * nrm, -1, keepdims=True) > 1e-3
    return jnp.where(ok, h, nrm)


def specular_firefly_clamp(
    spec: jnp.ndarray,        # (Hq,Wq,3) raw specular radiance
    pos_q: jnp.ndarray,       # (Hq,Wq,3) translated-world position
    nrm_q: jnp.ndarray,       # (Hq,Wq,3)
    rough_q: jnp.ndarray,     # (Hq,Wq)
) -> jnp.ndarray:
    """Firefly removal (gi_spatial_specular_remove_fireflare.hlsl): an
    edge-aware scattered-neighborhood mean (the reference's 16 Halton
    taps at ~4px stride -> 8 shifted planes at strides 1 and 2), then an
    AABB clip of the result toward the local tile mean with a
    roughness-lerped range. Mirror surfaces (roughness == 0) pass
    through untouched, matching the reference's early-out."""
    # center-free scattered mean: the reference's taps are offset Halton
    # samples, so a firefly does not vote for itself — weight-sum ~0
    # (e.g. a lone unconnected surface) falls back to the raw center
    acc = jnp.zeros_like(spec)
    wacc = jnp.zeros(spec.shape[:2])
    for s in (1, 2):
        for dy, dx in ((0, s), (0, -s), (s, 0), (-s, 0)):
            p2 = jnp.roll(pos_q, (dy, dx), (0, 1))
            n2 = jnp.roll(nrm_q, (dy, dx), (0, 1))
            c2 = jnp.roll(spec, (dy, dx), (0, 1))
            w = _edge_weight(pos_q, nrm_q, p2, n2)
            acc = acc + c2 * w[..., None]
            wacc = wacc + w
    nb_mean = jnp.where((wacc > 1e-5)[..., None],
                        acc / jnp.maximum(wacc, 1e-5)[..., None], spec)

    # downward-only luminance clamp vs the neighborhood mean: a pixel
    # may not exceed its (firefly-free) surroundings by more than 4x —
    # this removes the outlier BEFORE it can pollute the blur/stat below
    lum = jnp.max(spec, -1)
    nb_lum = jnp.max(nb_mean, -1)
    factor = jnp.minimum(1.0, (nb_lum * 4.0 + 0.25) /
                         jnp.maximum(lum, 1e-5))
    cleaned = spec * factor[..., None]

    # gentle blur of the cleaned signal (center keeps weight 1)
    acc = cleaned
    wacc2 = jnp.ones(spec.shape[:2])
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        p2 = jnp.roll(pos_q, (dy, dx), (0, 1))
        n2 = jnp.roll(nrm_q, (dy, dx), (0, 1))
        c2 = jnp.roll(cleaned, (dy, dx), (0, 1))
        w = _edge_weight(pos_q, nrm_q, p2, n2)
        acc = acc + c2 * w[..., None]
        wacc2 = wacc2 + w
    blurred = acc / wacc2[..., None]

    # tile-mean statistic (the reference's 8x8 statSRV): 4x4 avg-pool at
    # the already-reduced specular res
    hq, wq = spec.shape[:2]
    t = 4
    ph, pw = -(-hq // t) * t, -(-wq // t) * t
    padded = jnp.pad(blurred, ((0, ph - hq), (0, pw - wq), (0, 0)))
    cnt = jnp.pad(jnp.ones((hq, wq, 1)), ((0, ph - hq), (0, pw - wq),
                                          (0, 0)))
    stat = (padded.reshape(ph // t, t, pw // t, t, 3).sum((1, 3)) /
            jnp.maximum(cnt.reshape(ph // t, t, pw // t, t, 1)
                        .sum((1, 3)), 1.0))
    stat_full = jnp.repeat(jnp.repeat(stat, t, 0), t, 1)[:hq, :wq]

    # clip range lerp(0.3, 0.5, roughness-remap), scaled by the stat
    # magnitude so the clamp is scene-scale invariant
    lf = jnp.clip(rough_q / 0.25, 0.0, 1.0)
    rng = (0.3 + 0.2 * lf)[..., None] * (
        jnp.max(jnp.abs(stat_full), -1, keepdims=True) + 0.25)
    clipped = jnp.clip(blurred, stat_full - rng, stat_full + rng)
    return jnp.where(rough_q[..., None] <= 1e-4, spec, clipped)


def spatial_filter_specular(
    spec: jnp.ndarray, pos_q: jnp.ndarray, nrm_q: jnp.ndarray,
    rough_q: jnp.ndarray, taps: int = 3,
) -> jnp.ndarray:
    """Separable edge-aware specular blur (gi_spatial_filter_specular.hlsl
    X/Y direction passes): filter radius grows with roughness (the
    reference lerps 8..16px at full res; at 1/8 sample res that is 1..2
    planes), zero radius (mirror) keeps the raw trace."""
    rad_w = jnp.clip(rough_q / 0.25, 0.0, 1.0)   # 0 = mirror, 1 = glossy
    out = spec
    for axis in (1, 0):
        acc = out
        wacc = jnp.ones(rough_q.shape)
        for s in range(1, taps + 1):
            for sign in (-1, 1):
                p2 = jnp.roll(pos_q, s * sign, axis)
                n2 = jnp.roll(nrm_q, s * sign, axis)
                c2 = jnp.roll(out, s * sign, axis)
                w = (_edge_weight(pos_q, nrm_q, p2, n2) * rad_w *
                     0.7 ** (s - 1))
                acc = acc + c2 * w[..., None]
                wacc = wacc + w
        out = acc / wacc[..., None]
    return out


def temporal_specular(
    spec: jnp.ndarray,           # (Hq,Wq,3) filtered fresh specular
    motion_q: jnp.ndarray,       # (Hq,Wq,2) NDC motion
    prev_spec: jnp.ndarray,      # (Hq,Wq,3) history
    history_valid: jnp.ndarray,
    rough_q: jnp.ndarray,
    disocclusion: Optional[jnp.ndarray] = None,
    alpha: float = 0.85,
) -> jnp.ndarray:
    """Temporal accumulation on the specular composite: reprojected
    history with a neighborhood clamp; mirror surfaces get a shorter
    history (reflections swim under TSR otherwise)."""
    hq, wq = spec.shape[:2]
    xs = jnp.arange(wq, dtype=jnp.float32)[None, :] + 0.5
    ys = jnp.arange(hq, dtype=jnp.float32)[:, None] + 0.5
    px = xs - motion_q[..., 0] * wq * 0.5
    py = ys + motion_q[..., 1] * hq * 0.5
    on = (px >= 0) & (px < wq) & (py >= 0) & (py < hq)
    xi = jnp.clip(px.astype(jnp.int32), 0, wq - 1)
    yi = jnp.clip(py.astype(jnp.int32), 0, hq - 1)
    hist = prev_spec[yi, xi]

    lo = spec
    hi = spec
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        nb = jnp.roll(spec, (dy, dx), (0, 1))
        lo = jnp.minimum(lo, nb)
        hi = jnp.maximum(hi, nb)
    pad = (hi - lo) * 0.5 + 1e-3
    hist = jnp.clip(hist, lo - pad, hi + pad)

    a_r = alpha * (0.5 + 0.5 * jnp.clip(rough_q / 0.25, 0.0, 1.0))
    a = a_r * history_valid * on.astype(jnp.float32)
    if disocclusion is not None:
        a = a * (1.0 - disocclusion)
    return spec + (hist - spec) * a[..., None]
