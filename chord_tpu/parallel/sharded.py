"""Multi-chip rendering: sort-first screen-strip parallelism over an ICI mesh.

The reference is strictly single-GPU (SURVEY.md §2.10 — its only
"communication fabric" is Vulkan queue timeline semaphores). The TPU build
scales past one chip the TPU way: `shard_map` over a `jax.sharding.Mesh`,
with the frame decomposed **sort-first** — each device owns a horizontal
strip of the screen and runs the complete pipeline (cull -> raster ->
shade -> post) for its strip:

- Scene pools + instance tables are **replicated** (they are read-only
  per frame and gathered randomly — sharding them would turn every gather
  into an all-to-all).
- Each device gets a *strip view*: the full-frame projection composed with
  an off-center crop that maps its strip's NDC y-range onto [-1, 1]. Strip
  frustum culling then automatically discards geometry outside the strip,
  so per-device raster work scales down with 1/n (sort-first load balance).
- Cross-strip communication is tiny and rides ICI: one psum of the 128-bin
  exposure histogram (auto-exposure must see the whole frame); the final
  image is just the sharded (H, W) array (device_get concatenates).

This is the honest analog of multi-queue GPU parallelism for a renderer —
embarrassingly parallel over screen space with one global reduction.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..renderer.deferred import DeviceView, RendererConfig, render_frame_flat
from ..renderer.meshlet_frame import MeshletFrameConfig, render_frame_meshlet
from ..rhi.framebuffer import FrameHistory
from ..utils.camera import ViewUniform
from ..utils import math as cmath

AXIS = "strips"


def _strip_matrix(k: int, n: int) -> np.ndarray:
    """Row-vector postmultiply matrix A with clip' = clip @ A mapping strip
    k's NDC y-range [1-2k/n, 1-2(k+1)/n] to [-1, 1]. (NDC y is up; strip 0
    is the TOP of the image.)"""
    s = float(n)
    c = 1.0 - (2.0 * k + 1.0) / n     # strip center in full-frame NDC
    a = np.eye(4, dtype=np.float64)
    a[1, 1] = s
    a[3, 1] = -c * s
    return a


def strip_device_views(u: ViewUniform, n: int, **light_kwargs):
    """Full-frame ViewUniform -> stacked per-strip DeviceView (leaf arrays
    gain a leading (n,) axis, sharded over the mesh)."""
    views = []
    for k in range(n):
        a = _strip_matrix(k, n)
        su = ViewUniform(
            translated_world_to_view=u.translated_world_to_view,
            view_to_clip=np.float32(u.view_to_clip.astype(np.float64) @ a),
            translated_world_to_clip=np.float32(
                u.translated_world_to_clip.astype(np.float64) @ a),
            translated_world_to_clip_nojitter=np.float32(
                u.translated_world_to_clip_nojitter.astype(np.float64) @ a),
            prev_translated_world_to_clip_nojitter=np.float32(
                u.prev_translated_world_to_clip_nojitter.astype(np.float64) @ a),
            frustum_planes=np.float32(cmath.frustum_planes(
                u.translated_world_to_clip_nojitter.astype(np.float64) @ a)),
            camera_world_pos=u.camera_world_pos,
            render_size=(u.render_size[0], u.render_size[1] // n),
            z_near=u.z_near, fovy=u.fovy, jitter=u.jitter,
            frame_index=u.frame_index,
        )
        views.append(DeviceView.from_uniform(su, **light_kwargs))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *views)


class ShardedRenderer:
    """Drives the strip-parallel frame over a 1-D device mesh.

    path="meshlet" runs the full GPU-driven pipeline per strip (each
    device culls against its strip frustum — sort-first load balance);
    path="flat" is the simple object-cull pipeline."""

    def __init__(self, config: RendererConfig, mesh: Optional[Mesh] = None,
                 path: str = "flat",
                 mcfg: Optional[MeshletFrameConfig] = None):
        devices = mesh.devices.reshape(-1) if mesh else np.array(jax.devices())
        self.n = len(devices)
        assert config.height % self.n == 0, \
            f"height {config.height} not divisible by {self.n} devices"
        self.mesh = mesh or Mesh(devices, (AXIS,))
        self.config = config
        self.strip_config = config._replace(height=config.height // self.n)
        self.history = None
        self.path = path
        self.mcfg = mcfg or MeshletFrameConfig()

        if path == "meshlet":
            strip_fn = functools.partial(render_frame_meshlet,
                                         config=self.strip_config,
                                         mcfg=self.mcfg,
                                         axis_name=AXIS)
        else:
            strip_fn = functools.partial(render_frame_flat,
                                         config=self.strip_config,
                                         axis_name=AXIS)

        n = self.n
        merge_cache = path == "meshlet" and self.mcfg.gi

        def sharded_step(pools, instances, views, history, bvh):
            def body(pools, instances, view, hist, bvh):
                view = jax.tree.map(lambda x: x[0], view)
                hist = jax.tree.map(lambda x: x[0], hist)
                bvh_arg = None if isinstance(bvh, tuple) and not bvh \
                    else bvh
                image, new_hist, stats = strip_fn(pools, instances, view,
                                                  hist, bvh=bvh_arg) \
                    if path == "meshlet" else \
                    strip_fn(pools, instances, view, hist)
                if merge_cache:
                    # the world SH cache is WORLD-anchored state: each
                    # strip injects only its own screen probes, so the
                    # per-strip caches are all-reduced (ICI psum) into
                    # one consistent cache — the multi-chip analog of
                    # the reference's single world cache
                    new_hist = new_hist.replace(
                        gi_cache=jax.lax.psum(new_hist.gi_cache, AXIS) /
                        float(n))
                stats = {k: jax.lax.psum(v, AXIS) for k, v in stats.items()}
                return (image, jax.tree.map(lambda x: x[None], new_hist),
                        stats)

            # check_vma=False: the body mixes replicated pools with
            # per-strip views/history (jax.shard_map's renamed check_rep)
            return shard_map(
                body, mesh=self.mesh,
                in_specs=(P(), P(), P(AXIS), P(AXIS), P()),
                out_specs=(P(AXIS), P(AXIS), P()),
                check_vma=False,
            )(pools, instances, views, history, bvh)

        self._step = jax.jit(sharded_step)

    def reset_history(self):
        self.history = None

    def render(self, pools, instances, view_uniform: ViewUniform,
               bvh=None, luts=None, **light_kwargs):
        """One sharded frame. `luts` optionally carries replicated
        precomputed tables {atmo_t_lut, atmo_ms_lut, atmo_sky_lut,
        brdf_lut} (stacked per strip)."""
        if self.history is None:
            from ..ops.gi import GIConfig
            m = self.mcfg
            one = FrameHistory.empty(
                self.strip_config.height, self.config.width,
                gi_cfg=(m.gi_cfg or GIConfig()) if m.gi else None,
                shadow_cascades=(m.shadow_cfg.cascade_count
                                 if m.shadows else 0),
                shadow_res=(m.shadow_cfg.resolution if m.shadows else 1),
                shadow_div=m.shadow_cfg.eval_res_div,
                shadow_phase=(m.shadow_cfg.temporal_phase
                              if m.shadow_cfg.temporal else 1),
                probe_tile=8 if m.gi else 0)
            self.history = jax.tree.map(
                lambda x: jnp.stack([x] * self.n), one)
        views = strip_device_views(view_uniform, self.n, **light_kwargs)
        if luts:
            views = views.replace(**{
                k: jnp.stack([v] * self.n) for k, v in luts.items()})
        image, self.history, stats = self._step(
            pools, instances, views, self.history,
            bvh if bvh is not None else ())
        return image, stats


def dryrun(n_devices: int) -> None:
    """Driver hook: build an n-device mesh and jit the FULL sharded frame
    — every feature the headline bench runs (GPU-driven cull + Nanite
    LOD + two-phase occlusion + visbuffer raster + textures + masked +
    blend + cascaded shadows + atmosphere + screen-probe GI + BVH rays +
    SSR + bloom/TSR/tonemap) per screen strip, with the exposure
    histogram and the world SH cache all-reduced over ICI. One step on
    tiny shapes (called with xla_force_host_platform_device_count
    virtual CPU devices)."""
    devices = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devices), (AXIS,))

    from ..asset.procedural import build_bistro_like
    from ..ops import atmosphere as atm
    from ..ops import brdf_lut as brdf
    from ..ops.rt import build_scene_bvh
    from ..ops.screen_probe import ScreenProbeConfig
    from ..ops.shadow import ShadowConfig
    from ..rhi.meshlet_scene import build_meshlet_pools
    from ..utils.camera import Camera

    b = build_bistro_like(detail=1, target_tris=12_000, textures=True)
    pools = build_meshlet_pools(b, texture_pool=getattr(b, "texture_pool",
                                                        None))
    h = 16 * n_devices
    cam = Camera(width=128, height=h)
    cam.position = np.array([-20.0, 5.0, 4.0])
    cam.look_at(np.array([25.0, 3.0, -4.0]))

    scfg = ShadowConfig(cascade_count=2, resolution=64, temporal=False,
                        jitter=False)
    mcfg = MeshletFrameConfig(
        draw_capacity=128, occlusion=True, shadows=True, shadow_cfg=scfg,
        atmosphere=True, gi=True, gi_mode="probe", gi_rt=True, rt_rays=2,
        ssr=True, textured=True, alpha_masked=True, alpha_blend=True,
        probe_cfg=ScreenProbeConfig(rays=16, steps=4))
    config = RendererConfig(width=128, height=h, pair_capacity=2048,
                            big_capacity=128, enable_bloom=True,
                            enable_tsr=True, tsr_mode="global",
                            interpret=True)
    r = ShardedRenderer(config, mesh, path="meshlet", mcfg=mcfg)
    inst = b.frame_instances(cam)
    bvh = build_scene_bvh(pools, inst, granularity="object")

    p_atm = atm.AtmosphereParams()
    t_lut = atm.build_transmittance_lut(p_atm, 16)
    ms_lut = atm.build_multiscatter_lut(p_atm, t_lut, dir_samples=4,
                                        steps=4)
    sun_d = np.asarray([0.3, 0.8, 0.5], np.float32)
    sun_d /= np.linalg.norm(sun_d)
    sky_lut = atm.build_sky_view_lut(p_atm, t_lut, ms_lut,
                                     jnp.asarray(sun_d))
    luts = dict(atmo_t_lut=t_lut, atmo_ms_lut=ms_lut,
                atmo_sky_lut=sky_lut, brdf_lut=brdf.build_env_brdf_lut(16))

    image, stats = r.render(pools, inst, cam.view_uniform(0), bvh=bvh,
                            luts=luts, shadow_cfg=scfg)
    image.block_until_ready()
    print(f"dryrun_multichip({n_devices}): image {image.shape}, "
          f"stats {jax.tree.map(lambda x: np.asarray(x).item(), stats)}")
