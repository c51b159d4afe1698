"""Cascaded shadow maps with PCSS soft shadows.

TPU-native equivalent of the reference shadow stack (reference:
renderer/renderer.cpp:347-381 renderShadow + cascadeShadowEvaluate;
cascade fitting CS install/resource/shader/cascade_setup.hlsl; config
CascadeShadowMapConfig renderer/render_helper.h:463-510 — cascade count,
PCSS sample counts, biases; PCSS blocker-search + penumbra estimation
install/resource/shader/pcss.hlsl:33-92).

Design: cascades are depth-only raster passes through the SAME software
rasterizer as the main view (the reference reuses its meshlet raster with
DIM_PASS_TYPE=PASS_TYPE_DEPTH, mesh_raster.hlsl) — one (R, R) reverse-Z
depth map per cascade, stacked (N, R, R). Cascade fitting runs in numpy on
the host (it is 4 tiny matrices; the reference does it in a 1-thread CS
only to avoid a GPU->CPU roundtrip, which does not exist under jit).
Evaluation is fully vectorized PCSS: Poisson-disk blocker search ->
penumbra width -> variable-radius PCF, per screen pixel.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import math as cmath


class ShadowConfig(NamedTuple):
    """reference: render_helper.h:463-510 CascadeShadowMapConfig."""

    cascade_count: int = 4
    resolution: int = 1024
    max_distance: float = 80.0       # view-space shadow range
    split_lambda: float = 0.8        # log/uniform split blend
    depth_bias: float = 2.0e-4       # constant receiver bias (reverse-Z)
    slope_bias: float = 3.0
    pcf_radius_px: float = 2.0       # base PCF radius (texels)
    pcss_blocker_samples: int = 5
    pcss_pcf_samples: int = 6
    light_size_world: float = 0.5    # virtual sun disk size for penumbra
    eval_res_div: int = 4            # PCSS evaluated at 1/4 res + upsample;
                                     # with the 2x2 temporal phase the
                                     # per-frame evaluated density is 1/8 —
                                     # matching the reference's cached
                                     # soft-shadow mask res (lighting.h:23)
    temporal: bool = True            # temporal mask accumulation (reference:
                                     # shadow_mask temporal blend pass)
    temporal_alpha: float = 0.7      # history weight at zero residual
    temporal_phase: int = 2          # PCSS evaluates 1/phase^2 of the
                                     # eval-res pixels per frame (rotating
                                     # 2x2 phase); the temporal cache
                                     # carries the rest — quarters the
                                     # shadow-map gather cost
    jitter: bool = True              # per-pixel/per-frame Poisson rotation
                                     # (IGN, the STBN-texture replacement)
    pipelined: bool | None = None    # run the WHOLE shadow pipeline
                                     # (cascade fit + round-robin raster
                                     # + PCSS eval) as its own dispatch
                                     # after the frame, consumed one
                                     # frame LATE through history.
                                     # Works around axon TPU worker
                                     # faults when the shadow raster /
                                     # eval subgraphs share a program
                                     # with the textured raster / the
                                     # temporal blend (device bisects:
                                     # tools/repro_eval_kernel.py,
                                     # tools/bisect_shadow_masked.py).
                                     # None = auto: on for the axon
                                     # backend, off elsewhere.
    depth_range_fit: bool = True     # fit cascades on device to LAST
                                     # frame's valid-depth min/max range
                                     # (reference cascade_setup.hlsl) so
                                     # shadow texels track occupied depth;
                                     # off = host frustum-only fit
    eval_kernel: bool | None = None  # PCSS eval via the Pallas tile
                                     # kernel (ops/shadow_kernel.py:
                                     # windowed one-hot-matmul taps, no
                                     # XLA gathers — the root fix for
                                     # the r2/r3 TPU worker faults).
                                     # None = auto: on for any non-CPU
                                     # backend, gather path on CPU
                                     # (tests/oracle parity).
    scroll: bool = True              # scrolled cascade cache: when a
                                     # refresh's fit differs from the
                                     # cached map's ONLY by an integer-
                                     # texel light-space translation
                                     # (static sun + stable fit), seed
                                     # the raster with the cached map
                                     # ROLLED by that translation and
                                     # raster only the newly-exposed
                                     # edge tile strips (the work queue
                                     # is tile-filtered). The software
                                     # raster is iteration-bound, so
                                     # this cuts the steady-state
                                     # cascade cost to the exposed
                                     # fraction. Requires the stable
                                     # (non-depth-range) fit: splits
                                     # use the static [near, max]
                                     # range and the light eye z is
                                     # quantized at radius/2 so the
                                     # depth mapping survives rotation
                                     # (a z step forces one full
                                     # re-raster of that cascade).
                                     # Auto-disabled when the frame is
                                     # declared dynamic
                                     # (MeshletFrameConfig.rt_dynamic):
                                     # scrolled strips assume static
                                     # casters between refreshes.
    scroll_refresh_n: int = 4        # every Nth round-robin refresh of a
                                     # cascade is a FULL re-raster even
                                     # when scroll qualifies (staggered
                                     # per cascade), so moving casters
                                     # and any accumulated strip error
                                     # converge within N*cascade_count
                                     # frames — without this a static
                                     # camera re-rasters NOTHING and
                                     # dynamic casters freeze forever
                                     # (ADVICE r4 medium). 0 = never.


# Poisson disk (unit radius) — fixed pattern like the reference's
# (pcss.hlsl uses a fixed spiral/poisson set).
_POISSON = np.array([
    [-0.94201624, -0.39906216], [0.94558609, -0.76890725],
    [-0.09418410, -0.92938870], [0.34495938, 0.29387760],
    [-0.91588581, 0.45771432], [-0.81544232, -0.87912464],
    [-0.38277543, 0.27676845], [0.97484398, 0.75648379],
    [0.44323325, -0.97511554], [0.53742981, -0.47373420],
    [-0.26496911, -0.41893023], [0.79197514, 0.19090188],
    [-0.24188840, 0.99706507], [-0.81409955, 0.91437590],
    [0.19984126, 0.78641367], [0.14383161, -0.14100790],
], np.float32)


def fit_cascades(view_forward: np.ndarray, sun_dir: np.ndarray,
                 cam_fovy: float, aspect: float, cfg: ShadowConfig
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side cascade fitting (translated-world space, camera at origin).

    -> (tw_to_light (N,4,4) f32 row-vector matrices mapping translated
    world to each cascade's clip space, splits (N+1,) f32 view distances).
    Practical split scheme (log/uniform blend, reference cascade_setup).
    """
    n = cfg.cascade_count
    near, far = 0.1, cfg.max_distance
    splits = [near]
    for i in range(1, n + 1):
        f = i / n
        log_d = near * (far / near) ** f
        uni_d = near + (far - near) * f
        splits.append(cfg.split_lambda * log_d +
                      (1 - cfg.split_lambda) * uni_d)
    splits = np.asarray(splits, np.float64)

    sun = cmath.normalize(np.asarray(sun_dir, np.float64))
    up = np.array([0.0, 1.0, 0.0])
    if abs(np.dot(sun, up)) > 0.95:
        up = np.array([1.0, 0.0, 0.0])

    fwd = cmath.normalize(np.asarray(view_forward, np.float64))
    tan_y = np.tan(cam_fovy * 0.5)
    tan_x = tan_y * aspect

    mats = np.zeros((n, 4, 4), np.float32)
    for i in range(n):
        d0, d1 = splits[i], splits[i + 1]
        # frustum-slice bounding sphere (camera at origin, forward fwd)
        # 8 corner directions
        corners = []
        for d in (d0, d1):
            for sx in (-1, 1):
                for sy in (-1, 1):
                    right = cmath.normalize(np.cross(fwd, up))
                    upv = np.cross(right, fwd)
                    corners.append(
                        fwd * d + right * (sx * tan_x * d) +
                        upv * (sy * tan_y * d))
        corners = np.asarray(corners)
        center = corners.mean(0)
        radius = float(np.linalg.norm(corners - center, axis=1).max())
        # texel snapping keeps cascades stable under camera motion
        # (reference: cascade history caching relies on this)
        texel = 2.0 * radius / cfg.resolution
        # sun_dir points surface->sun; the light eye sits toward the sun
        light_view = cmath.look_at(center + sun * radius * 2.0,
                                   center, up)
        snapped = light_view.copy()
        snapped[3, 0] = np.floor(snapped[3, 0] / texel) * texel
        snapped[3, 1] = np.floor(snapped[3, 1] / texel) * texel
        proj = cmath.ortho_reverse_z(-radius, radius, -radius, radius,
                                     0.0, 4.0 * radius)
        mats[i] = np.float32(snapped @ proj)
    return mats, splits.astype(np.float32)


def evaluate_shadow(
    position_tw: jnp.ndarray,     # (H,W,3) receiver positions
    normal: jnp.ndarray,          # (H,W,3)
    sun_dir: jnp.ndarray,         # (3,)
    shadow_maps: jnp.ndarray,     # (N,R,R) f32 reverse-Z depth
    tw_to_light: jnp.ndarray,     # (N,4,4) the fit of EACH CACHED map
    cfg: ShadowConfig,
    noise: Optional[jnp.ndarray] = None,   # (H,W) in [0,1): per-pixel
                                           # Poisson-disk rotation angle
) -> jnp.ndarray:
    """-> (H,W) sun visibility in [0,1] (PCSS: blocker search -> penumbra
    -> variable-radius PCF; reference pcss.hlsl:33-92, which rotates its
    disk by a per-pixel STBN angle — here the caller passes in-register
    interleaved gradient noise, ops/bluenoise.py).

    Cascade selection is by CONTAINMENT (finest cascade whose light-space
    footprint holds the receiver), not by distance splits: cached cascades
    (round-robin refresh, reference cascade history caching) carry their
    own fit matrices, which may be several frames stale — containment
    against each map's own matrix stays exact regardless."""
    n, r, _ = shadow_maps.shape
    h, w = position_tw.shape[:2]
    p = position_tw

    # project into every cascade; finest containing cascade wins
    u = jnp.zeros((h, w))
    v = jnp.zeros((h, w))
    z_recv = jnp.zeros((h, w))
    cascade = jnp.zeros((h, w), jnp.int32)
    in_map = jnp.zeros((h, w), bool)
    for i in reversed(range(n)):          # coarse -> fine; fine overwrites
        m = tw_to_light[i]
        lp = (p[..., 0:1] * m[0] + p[..., 1:2] * m[1] +
              p[..., 2:3] * m[2] + m[3])                      # ortho w == 1
        ui = (lp[..., 0] * 0.5 + 0.5) * r
        vi = (0.5 - lp[..., 1] * 0.5) * r
        zi = lp[..., 2]
        cont = (ui >= 1) & (ui < r - 1) & (vi >= 1) & (vi < r - 1) & \
            (zi > 0.0) & (zi <= 1.0)
        u = jnp.where(cont, ui, u)
        v = jnp.where(cont, vi, v)
        z_recv = jnp.where(cont, zi, z_recv)
        cascade = jnp.where(cont, i, cascade)
        in_map = in_map | cont

    # per-cascade metric constants from each cached fit matrix: the ortho
    # projection encodes world-units-per-NDC directly (m00 = 1/radius,
    # m22 = -1/depth_range) — so bias and penumbra can be computed in
    # WORLD units and converted exactly (reference pcss.hlsl:33-92 works
    # in light-view units the same way)
    m00 = jnp.abs(tw_to_light[:, 0, 0])              # (N,)
    m22 = jnp.abs(tw_to_light[:, 2, 2])
    depth_range_n = 1.0 / jnp.maximum(m22, 1e-9)     # world z across [0,1]
    texel_w_n = 2.0 / jnp.maximum(m00, 1e-9) / r     # world per texel
    dr = depth_range_n[cascade]                      # (H,W)
    tx = texel_w_n[cascade]

    # slope-scaled receiver bias, scaled by the CASCADE's texel footprint
    # (one texel of depth error at slope tan(theta)), converted to NDC
    nol = jnp.clip(jnp.sum(normal * sun_dir, axis=-1), 0.05, 1.0)
    tan_t = jnp.sqrt(jnp.maximum(1.0 - nol * nol, 0.0)) / nol
    bias = cfg.depth_bias + \
        cfg.slope_bias * jnp.minimum(tan_t, 4.0) * tx / jnp.maximum(dr, 1e-6)
    z_cmp = z_recv + bias

    flat = shadow_maps.reshape(n * r * r)
    base = cascade * (r * r)

    def sample_depth(du, dv):
        x = jnp.clip((u + du).astype(jnp.int32), 0, r - 1)
        y = jnp.clip((v + dv).astype(jnp.int32), 0, r - 1)
        return flat[base + y * r + x]

    disk = jnp.asarray(_POISSON)
    if noise is not None:
        theta = noise * (2.0 * np.pi)
        ca, sa = jnp.cos(theta), jnp.sin(theta)   # (H,W)
    else:
        ca, sa = 1.0, 0.0

    def rot(o):
        """Rotate a fixed disk offset by the per-pixel angle."""
        return o[0] * ca - o[1] * sa, o[0] * sa + o[1] * ca

    # --- blocker search (pcss.hlsl blocker loop) ---
    search_r = cfg.pcf_radius_px * 3.0
    blocker_sum = jnp.zeros((h, w))
    blocker_cnt = jnp.zeros((h, w))
    for s in range(cfg.pcss_blocker_samples):
        ox, oy = rot(disk[s % len(_POISSON)] * search_r)
        zs = sample_depth(ox, oy)
        is_blocker = zs > z_cmp          # reverse-Z: nearer to light
        blocker_sum = blocker_sum + jnp.where(is_blocker, zs, 0.0)
        blocker_cnt = blocker_cnt + is_blocker.astype(jnp.float32)
    has_blocker = blocker_cnt > 0.0
    avg_blocker = blocker_sum / jnp.maximum(blocker_cnt, 1.0)

    # PCSS similar-triangles penumbra for a directional light
    # (pcss.hlsl:33-92): the sun's angular size w projects a blocker at
    # world-depth distance d into a penumbra of width d*w on the
    # receiver. delta_ndc * depth_range = world distance; / texel size
    # = radius in texels. light_size_world acts as tan(sun half-angle).
    delta_world = jnp.maximum(avg_blocker - z_recv, 0.0) * dr
    penumbra_texels = delta_world * cfg.light_size_world / \
        jnp.maximum(tx, 1e-6)
    penumbra = jnp.where(has_blocker, penumbra_texels, 0.0)
    pcf_r = jnp.clip(cfg.pcf_radius_px + penumbra, 1.0, 16.0)

    # --- variable-radius PCF ---
    lit = jnp.zeros((h, w))
    for s in range(cfg.pcss_pcf_samples):
        ox, oy = rot(disk[s % len(_POISSON)] *
                     (1.0 + s / cfg.pcss_pcf_samples))
        zs = sample_depth(ox * pcf_r, oy * pcf_r)
        lit = lit + (z_cmp >= zs).astype(jnp.float32)
    lit = lit / cfg.pcss_pcf_samples

    return jnp.where(in_map, lit, 1.0)


def evaluate_shadow_auto(
    position_tw: jnp.ndarray,
    normal: jnp.ndarray,
    sun_dir: jnp.ndarray,
    shadow_maps: jnp.ndarray,
    tw_to_light: jnp.ndarray,
    cfg: ShadowConfig,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """PCSS eval dispatcher: the Pallas tile kernel on accelerators
    (ShadowConfig.eval_kernel, see ops/shadow_kernel.py), the reference
    XLA gather path on CPU / when forced off."""
    use_kernel = cfg.eval_kernel
    if use_kernel is None:
        use_kernel = jax.default_backend() != "cpu"
    if use_kernel:
        from .shadow_kernel import evaluate_shadow_pallas
        return evaluate_shadow_pallas(
            position_tw, normal, sun_dir, shadow_maps, tw_to_light, cfg,
            noise=noise, interpret=jax.default_backend() == "cpu")
    return evaluate_shadow(position_tw, normal, sun_dir, shadow_maps,
                           tw_to_light, cfg, noise=noise)


def fit_cascades_device(
    view_forward: jnp.ndarray,   # (3,) f32 camera forward (translated world)
    sun_dir: jnp.ndarray,        # (3,)
    tan_x: jnp.ndarray,          # () tan(fovx/2)
    tan_y: jnp.ndarray,          # () tan(fovy/2)
    z_range: jnp.ndarray,        # (2,) valid-depth view range (near, far)
    cfg: ShadowConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side depth-range-driven cascade fit (the reference's
    cascade_setup.hlsl: a 1-thread CS that reads the frame's valid-depth
    min/max reduction and fits N cascades to the OCCUPIED range instead
    of the whole frustum — shadow texels stop being wasted on empty
    depth). Same split scheme / bounding-sphere / texel-snap maths as the
    host `fit_cascades`, expressed in jnp so last frame's reduced range
    (carried in FrameHistory) can feed it under jit.

    -> (tw_to_light (N,4,4) f32, frustum planes (N,6,4) f32)."""
    n = cfg.cascade_count
    near = jnp.clip(z_range[0], 0.1, cfg.max_distance * 0.5)
    far = jnp.clip(z_range[1], near * 1.5 + 0.5, cfg.max_distance)

    f = jnp.arange(1, n + 1, dtype=jnp.float32) / n
    log_d = near * (far / near) ** f
    uni_d = near + (far - near) * f
    splits = jnp.concatenate([near[None],
                              cfg.split_lambda * log_d +
                              (1 - cfg.split_lambda) * uni_d])   # (N+1,)

    sun = sun_dir / jnp.maximum(jnp.linalg.norm(sun_dir), 1e-8)
    up_y = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    up_x = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    up = jnp.where(jnp.abs(jnp.dot(sun, up_y)) > 0.95, up_x, up_y)

    fwd = view_forward / jnp.maximum(jnp.linalg.norm(view_forward), 1e-8)
    right = jnp.cross(fwd, up)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-8)
    upv = jnp.cross(right, fwd)

    # frustum-slice corners for every cascade at once: (N,2,2,2,3)
    d = jnp.stack([splits[:-1], splits[1:]], 1)                  # (N,2)
    sx = jnp.asarray([-1.0, 1.0])
    sy = jnp.asarray([-1.0, 1.0])
    corners = (fwd[None, None, None, None] * d[:, :, None, None, None] +
               right[None, None, None, None] *
               (sx[None, None, :, None, None] * tan_x *
                d[:, :, None, None, None]) +
               upv[None, None, None, None] *
               (sy[None, None, None, :, None] * tan_y *
                d[:, :, None, None, None]))                      # (N,2,2,2,3)
    corners = corners.reshape(n, 8, 3)
    center = corners.mean(1)                                     # (N,3)
    radius = jnp.linalg.norm(corners - center[:, None], axis=-1).max(1)

    texel = 2.0 * radius / cfg.resolution                        # (N,)

    # look_at(center + sun*2r, center, up), row-vector convention
    eye = center + sun[None] * (radius * 2.0)[:, None]           # (N,3)
    fl = -sun[None] * jnp.ones((n, 1))                           # light fwd
    s = jnp.cross(fl, jnp.broadcast_to(up, (n, 3)))
    s = s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-8)
    u = jnp.cross(s, fl)
    tx_ = -jnp.sum(eye * s, -1)
    ty_ = -jnp.sum(eye * u, -1)
    tz_ = jnp.sum(eye * fl, -1)
    # texel snapping in light space keeps maps stable under motion
    tx_ = jnp.floor(tx_ / texel) * texel
    ty_ = jnp.floor(ty_ / texel) * texel
    if cfg.scroll:
        # scrolled-cache mode: the cached map's depths stay valid only
        # while the z mapping is BIT-stable, so quantize the light eye
        # z coarsely (radius/2 steps — the extended z range below
        # absorbs the slack); between steps a refresh differs from the
        # cache by a pure texel translation and can scroll
        tz_ = jnp.floor(tz_ / (0.5 * radius)) * (0.5 * radius)
    zero = jnp.zeros((n,))
    one = jnp.ones((n,))
    view = jnp.stack([
        jnp.stack([s[:, 0], u[:, 0], -fl[:, 0], zero], -1),
        jnp.stack([s[:, 1], u[:, 1], -fl[:, 1], zero], -1),
        jnp.stack([s[:, 2], u[:, 2], -fl[:, 2], zero], -1),
        jnp.stack([tx_, ty_, tz_, one], -1)], 1)                 # (N,4,4)

    # ortho_reverse_z(-r, r, -r, r, 0, 4r) rows (6r under scroll: the
    # quantized eye z sits up to r/2 further out)
    inv_r = 1.0 / jnp.maximum(radius, 1e-6)
    zr = 1.0 / ((6.0 if cfg.scroll else 4.0) * radius)
    proj = jnp.zeros((n, 4, 4))
    proj = proj.at[:, 0, 0].set(inv_r)
    proj = proj.at[:, 1, 1].set(inv_r)
    proj = proj.at[:, 2, 2].set(zr)
    proj = proj.at[:, 3, 2].set((6.0 if cfg.scroll else 4.0)
                                * radius * zr)       # = 1.0
    proj = proj.at[:, 3, 3].set(1.0)
    mats = jnp.einsum("nij,njk->nik", view, proj).astype(jnp.float32)

    # Gribb-Hartmann planes (row-vector): columns combinations, normalized
    c0, c1, c2, c3 = (mats[:, :, i] for i in range(4))
    planes = jnp.stack([c3 + c0, c3 - c0, c3 + c1, c3 - c1,
                        c2, c3 - c2], 1)                         # (N,6,4)
    pn = jnp.maximum(jnp.linalg.norm(planes[..., :3], axis=-1,
                                     keepdims=True), 1e-12)
    return mats, (planes / pn).astype(jnp.float32)
