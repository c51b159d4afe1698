"""The deferred renderer: one frame as one jitted XLA computation.

TPU-native equivalent of the reference DeferredRenderer::render()
(reference: source/renderer/renderer.cpp:142-499 — per-frame uniform fill,
GPU-driven culling, visbuffer raster, HZB, shadows, lighting, GI, post
chain, history save). The Vulkan command-list/timeline-semaphore machinery
disappears: pass ordering and overlap are data dependencies inside a single
`jax.jit` program; the pooled render targets become plain arrays; history is
an explicit pytree threaded frame -> frame.

    frame(pools, instances, view, history) -> (image_u8, new_history, stats)

Two geometry paths (grown in stages, SURVEY.md §7):
- "flat": object-level frustum cull -> all triangles of visible objects ->
  raster (BASELINE config #1, Sponza-class).
- "meshlet": GPU-driven meshlet cull (frustum + cone + HZB occlusion two-
  phase) + Nanite LOD DAG cut -> raster (configs #2/#3), ops/cull.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import colorspace, post, shading
from ..ops.raster import RasterConfig, rasterize
from ..ops.transform import frustum_cull_spheres, transform_to_clip
from ..rhi.framebuffer import FrameHistory
from ..utils.camera import Camera, ViewUniform
from ..utils.cvar import cvars
from ..utils.log import get_logger

log = get_logger("renderer")

# Renderer feature cvars (reference registers ~60 AutoCVarRef tunables,
# e.g. renderer/gi/screen_probe_gather.cpp:83; same naming scheme).
cvars.register("r.exposure.fix", -1.0,
               "fixed exposure; <=0 enables auto exposure")
cvars.register("r.render.width", 1920, "render width", vtype=int)
cvars.register("r.render.height", 1080, "render height", vtype=int)
cvars.register("r.render.pairCapacity", 8192,
               "raster work-queue capacity", vtype=int)
cvars.register("r.render.drawCapacity", 4096,
               "visible meshlet draw capacity", vtype=int)
cvars.register("r.render.output", "srgb8", "srgb8 | hdr10", vtype=str)


@chex.dataclass(frozen=True)
class DeviceView:
    """Device-side per-frame camera view (the PerframeCameraView upload,
    reference: shader/base.h:292, renderer.cpp:175-211)."""

    tw_to_clip: jnp.ndarray            # (4,4) jittered
    tw_to_clip_nj: jnp.ndarray         # (4,4) no jitter
    prev_tw_to_clip_nj: jnp.ndarray    # (4,4)
    frustum_planes: jnp.ndarray        # (6,4)
    sun_direction: jnp.ndarray         # (3,)
    sun_radiance: jnp.ndarray          # (3,) AP1
    sky_ambient: jnp.ndarray           # (3,) AP1
    dt: jnp.ndarray                    # () seconds
    jitter_px: Optional[jnp.ndarray] = None    # (2,) subpixel jitter
    clip_to_tw: Optional[jnp.ndarray] = None   # (4,4) inverse view-proj
    # sun-independent atmosphere LUTs (built once, reference builds its
    # LUT set per frame only because Vulkan lacks cross-frame caching of
    # compute results; ours are plain arrays)
    atmo_t_lut: Optional[jnp.ndarray] = None   # (64,256,3)
    atmo_ms_lut: Optional[jnp.ndarray] = None  # (32,32,3)
    # sun-DEPENDENT sky-view LUT: cacheable while the sun is static
    # (rebuilt by the host driver on sun change; the frame falls back to
    # building it inline when absent)
    atmo_sky_lut: Optional[jnp.ndarray] = None  # (SKYVIEW_H,SKYVIEW_W,3)
    # split-sum env BRDF LUT (built once by the host driver; the frame
    # falls back to building it inline when absent)
    brdf_lut: Optional[jnp.ndarray] = None     # (S,S,2)
    # Shadow cascades (None when shadows are off): host frustum-only fit
    # (the fallback) — when ShadowConfig.depth_range_fit is on, the frame
    # refits on DEVICE from last frame's valid-depth range instead
    # (reference cascade_setup.hlsl), using the view fields below.
    shadow_tw_to_light: Optional[jnp.ndarray] = None   # (N,4,4)
    shadow_frustum_planes: Optional[jnp.ndarray] = None  # (N,6,4)
    shadow_splits: Optional[jnp.ndarray] = None        # (N+1,)
    # camera geometry for the device-side cascade fit
    view_forward: Optional[jnp.ndarray] = None         # (3,)
    tan_half_fov: Optional[jnp.ndarray] = None         # (2,) tan_x, tan_y
    z_near: Optional[jnp.ndarray] = None               # ()
    # camera world altitude (world units, f32 of the f64 host position) —
    # drives the altitude-aware aerial perspective (lighting.hlsl:75-135)
    cam_world_y: Optional[jnp.ndarray] = None          # ()

    @classmethod
    def from_uniform(cls, u: ViewUniform, sun_direction=(0.3, 0.8, 0.5),
                     sun_radiance=(8.0, 7.6, 7.0), sky_ambient=(0.3, 0.4, 0.6),
                     dt: float = 1.0 / 60.0,
                     shadow_cfg=None) -> "DeviceView":
        d = np.asarray(sun_direction, np.float32)
        d = d / np.linalg.norm(d)
        sun_ap1 = np.asarray(sun_radiance, np.float32) @ colorspace.SRGB_TO_AP1
        sky_ap1 = np.asarray(sky_ambient, np.float32) @ colorspace.SRGB_TO_AP1

        shadow_mats = shadow_planes = shadow_splits = None
        view_forward = tan_half_fov = z_near = None
        if shadow_cfg is not None:
            from ..ops.shadow import fit_cascades
            from ..utils import math as cmath

            # view forward from the view matrix's third rotation column
            view = u.translated_world_to_view.astype(np.float64)
            fwd = -view[:3, 2]
            aspect = u.render_size[0] / u.render_size[1]
            mats, splits = fit_cascades(fwd, d.astype(np.float64), u.fovy,
                                        aspect, shadow_cfg)
            planes = np.stack([cmath.frustum_planes(m.astype(np.float64))
                               for m in mats]).astype(np.float32)
            shadow_mats = jnp.asarray(mats)
            shadow_planes = jnp.asarray(planes)
            shadow_splits = jnp.asarray(splits)
            tan_y = np.tan(u.fovy * 0.5)
            view_forward = jnp.asarray(fwd.astype(np.float32))
            tan_half_fov = jnp.asarray([tan_y * aspect, tan_y], jnp.float32)
            z_near = jnp.asarray(u.z_near, jnp.float32)

        return cls(
            tw_to_clip=jnp.asarray(u.translated_world_to_clip),
            tw_to_clip_nj=jnp.asarray(u.translated_world_to_clip_nojitter),
            prev_tw_to_clip_nj=jnp.asarray(
                u.prev_translated_world_to_clip_nojitter),
            frustum_planes=jnp.asarray(u.frustum_planes),
            sun_direction=jnp.asarray(d),
            sun_radiance=jnp.asarray(sun_ap1),
            sky_ambient=jnp.asarray(sky_ap1),
            dt=jnp.asarray(dt, jnp.float32),
            jitter_px=jnp.asarray(u.jitter, jnp.float32),
            clip_to_tw=jnp.asarray(np.float32(np.linalg.inv(
                u.translated_world_to_clip_nojitter.astype(np.float64)))),
            shadow_tw_to_light=shadow_mats,
            shadow_frustum_planes=shadow_planes,
            shadow_splits=shadow_splits,
            view_forward=view_forward,
            tan_half_fov=tan_half_fov,
            z_near=z_near,
            cam_world_y=jnp.asarray(np.float32(u.camera_world_pos[1])),
        )


class RendererConfig(NamedTuple):
    """Static frame-shape configuration (jit static arg)."""

    width: int = 1920
    height: int = 1080
    post_width: int = 0          # 0 = same as render (TSR upscale target)
    post_height: int = 0
    pair_capacity: int = 8192
    big_capacity: int = 128
    enable_bloom: bool = True
    enable_tsr: bool = True
    tsr_mode: str = "gather"         # "gather" (exact, gather-heavy) |
                                     # "global" (mean-motion, fast) |
                                     # "tile" (per-32x32-tile motion,
                                     # parallax-correct + gather-free)
    subtiles: bool = False           # sub-tile raster lane packing
    output: str = "srgb8"            # or "hdr10"
    interpret: bool = False          # pallas interpreter (CPU tests)

    def raster_config(self) -> RasterConfig:
        import math

        bricks = bool(cvars.get("r.raster.bricks"))
        tile_h = int(cvars.get("r.raster.tileH"))
        sub_s = int(cvars.get("r.raster.subS"))
        # tile_h must divide by 8 (f32 sublane), sub_s (row packing) and,
        # in bricks mode, 4*sub_s (brick rows per pack iteration)
        mult = math.lcm(8, sub_s, 4 * sub_s if bricks else 1)
        if tile_h % mult != 0:
            tile_h = max(mult, tile_h // mult * mult)
        return RasterConfig(
            width=self.width, height=self.height,
            tile_h=tile_h, sub_s=sub_s,
            pair_capacity=self.pair_capacity,
            big_capacity=self.big_capacity, subtiles=self.subtiles,
            bricks=bricks,
            rp=int(cvars.get("r.raster.rp")),
            sub_loop=bool(cvars.get("r.raster.subLoop")),
            interpret=self.interpret)

    @classmethod
    def from_cvars(cls, **overrides) -> "RendererConfig":
        """Build from the cvar registry (the reference's single flag
        mechanism — every tunable a cvar, utils/cvar.h; settable from
        code / ini text / CLI before renderer creation)."""
        base = dict(
            width=int(cvars.get("r.render.width")),
            height=int(cvars.get("r.render.height")),
            pair_capacity=int(cvars.get("r.render.pairCapacity")),
            enable_bloom=bool(cvars.get("r.bloom.enable")),
            enable_tsr=bool(cvars.get("r.tsr.enable")),
            output=str(cvars.get("r.render.output")),
        )
        base.update(overrides)
        return cls(**base)


def render_frame_flat(
    pools, instances, view: DeviceView, history: FrameHistory,
    config: RendererConfig, axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, FrameHistory, dict]:
    """The flat-geometry frame pipeline (BASELINE config #1).

    Mirrors the reference frame order (renderer.cpp:142-499) minus the
    passes not yet built at this stage; each named scope is the analog of
    one reference pass and shows up under that label in jax.profiler traces
    (the GPUTimestamps replacement, SURVEY.md §5).
    """
    rc = config.raster_config()

    with jax.named_scope("instance_culling"):
        obj_visible = frustum_cull_spheres(
            instances.object_sphere_tw, view.frustum_planes)
        obj_visible = obj_visible & instances.object_valid

    with jax.named_scope("vertex_transform"):
        clip = transform_to_clip(
            pools.positions, pools.vertex_object,
            instances.object_to_tw, view.tw_to_clip)

    with jax.named_scope("visbuffer_raster"):
        tri_valid = pools.tri_valid & obj_visible[pools.tri_object]
        n_tris = pools.indices.shape[0]
        payload = (jnp.arange(n_tris, dtype=jnp.uint32) + 1)
        depth, vis, raster_stats = rasterize(
            clip, pools.indices, tri_valid, payload, rc)

    with jax.named_scope("gbuffer_resolve"):
        gbuf = shading.resolve_gbuffer(
            vis, pools, instances, view.tw_to_clip_nj,
            view.prev_tw_to_clip_nj)

    with jax.named_scope("lighting"):
        sun = shading.SunLight(direction=view.sun_direction,
                               radiance=view.sun_radiance,
                               sky_ambient=view.sky_ambient)
        hdr = shading.shade_pixels(gbuf, sun)

    with jax.named_scope("auto_exposure"):
        ecfg = post.ExposureConfig(
            fix_exposure=float(cvars.get("r.exposure.fix")))
        hist_lum = post.luminance_histogram(hdr, ecfg)
        if axis_name is not None:
            # Multi-chip: exposure adapts to the WHOLE frame, not the local
            # strip — one psum over the tiny 128-bin histogram rides ICI.
            hist_lum = jax.lax.psum(hist_lum, axis_name) / \
                jax.lax.psum(jnp.float32(1.0), axis_name)
        exposure = post.adapt_exposure(hist_lum, history.exposure, 1.0 / 60.0,
                                       ecfg)

    if config.enable_tsr:
        with jax.named_scope("tsr"):
            hdr = post.temporal_resolve(
                hdr, gbuf.motion, history.tsr_color, history.valid,
                post.TSRConfig())
    tsr_color = hdr

    if config.enable_bloom:
        with jax.named_scope("bloom"):
            hdr = hdr + post.compute_bloom(hdr, post.BloomConfig())

    with jax.named_scope("tonemap"):
        encoded = colorspace.tonemap_display(hdr, exposure, config.output)
        image = colorspace.to_u8(encoded)

    new_history = FrameHistory(
        valid=jnp.ones((), jnp.float32),
        frame_count=history.frame_count + 1,
        hzb_flat=history.hzb_flat,      # filled by the HZB pass (meshlet path)
        depth=depth,
        exposure=exposure,
        tsr_color=tsr_color,
        gi_cache=history.gi_cache,
        shadow_mask=history.shadow_mask,
        shadow_maps=history.shadow_maps,
        shadow_mats=history.shadow_mats,
        probe_sh=history.probe_sh,
        probe_depth=history.probe_depth,
        gi_diffuse=history.gi_diffuse,
        gi_specular=history.gi_specular,
        depth_range=history.depth_range,
        ddgi=history.ddgi,
    )
    stats = dict(raster_stats)
    stats["visible_objects"] = jnp.sum(obj_visible.astype(jnp.int32))
    return image, new_history, stats


class DeferredRenderer:
    """Host-side driver: owns the jitted frame fn + history, feeds it views.

    The analog of the reference DeferredRenderer object held by a viewport
    widget (reference: renderer/renderer.h:38); `render()` here returns the
    final u8 image instead of presenting to a swapchain (SURVEY.md §8.11).
    """

    def __init__(self, config: RendererConfig):
        self.config = config
        self.history: Optional[FrameHistory] = None
        self._frame_fn = jax.jit(
            functools.partial(render_frame_flat, config=config))

    def reset_history(self) -> None:
        """Camera cut (reference clearHistory, renderer.cpp:95-105)."""
        self.history = None

    def render(self, pools, instances, view_uniform: ViewUniform,
               **light_kwargs):
        c = self.config
        if self.history is None:
            self.history = FrameHistory.empty(c.height, c.width)
        view = DeviceView.from_uniform(view_uniform, **light_kwargs)
        image, self.history, stats = self._frame_fn(
            pools, instances, view, self.history)
        return image, stats
