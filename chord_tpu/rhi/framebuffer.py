"""Render targets and frame history.

TPU-native equivalent of the reference's pooled render textures
(reference: source/renderer/render_textures.h:10-62 — visibility R32_UINT,
color RGBA16F, depth D32, thin gbuffer, half-res set) and the renderer
history (reference: renderer/renderer.h DeferredRendererHistory — HZB,
TSR color, exposure, shadow masks, with clearHistory/bCameraCut
invalidation, renderer.cpp:95-105).

On TPU a "render target" is just an array in the frame function; this module
defines the canonical dtypes/packing and the History pytree threaded through
frames (`frame(scene, view, history) -> (image, history)`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import chex
import jax.numpy as jnp


# Visibility packing (reference: shader/base.h:410-413 — triangleId:7 |
# instanceId+1:25; 0 = empty sky pixel).
TRI_BITS = 7
TRI_MASK = (1 << TRI_BITS) - 1


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def pack_visibility(instance_id: jnp.ndarray, tri_id: jnp.ndarray) -> jnp.ndarray:
    """(instanceId+1):25 | triangleId:7 → uint32; instance_id==-1 → 0."""
    packed = ((instance_id + 1).astype(jnp.uint32) << TRI_BITS) | (
        tri_id.astype(jnp.uint32) & TRI_MASK)
    return jnp.where(instance_id >= 0, packed, jnp.uint32(0))


def unpack_visibility(vis: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (instance_id with -1 = empty, tri_id)."""
    inst = (vis >> TRI_BITS).astype(jnp.int32) - 1
    tri = (vis & TRI_MASK).astype(jnp.int32)
    return inst, tri


@chex.dataclass(frozen=True)
class RenderTargets:
    """The thin gbuffer written by raster + lighting."""

    visibility: jnp.ndarray      # (H,W) uint32 packed
    depth: jnp.ndarray           # (H,W) f32 reverse-Z (0 = far/empty)
    color: jnp.ndarray           # (H,W,3) f32 HDR ACEScg
    normal: jnp.ndarray          # (H,W,3) f32 pixel normal (translated world)
    motion: jnp.ndarray          # (H,W,2) f32 NDC motion vector
    ao_rough_metal: jnp.ndarray  # (H,W,3) f32

    @classmethod
    def empty(cls, h: int, w: int) -> "RenderTargets":
        return cls(
            visibility=jnp.zeros((h, w), jnp.uint32),
            depth=jnp.zeros((h, w), jnp.float32),
            color=jnp.zeros((h, w, 3), jnp.float32),
            normal=jnp.zeros((h, w, 3), jnp.float32),
            motion=jnp.zeros((h, w, 2), jnp.float32),
            ao_rough_metal=jnp.zeros((h, w, 3), jnp.float32),
        )


@chex.dataclass(frozen=True)
class FrameHistory:
    """State carried frame→frame (temporal passes). `valid` gates all
    history reads; a camera cut sets valid=0 (reference clearHistory)."""

    valid: jnp.ndarray           # () f32 0/1
    frame_count: jnp.ndarray     # () i32 frames since history reset
    hzb_flat: jnp.ndarray        # (total,) f32 flattened min-depth pyramid
    depth: jnp.ndarray           # (H,W) f32 previous depth
    exposure: jnp.ndarray        # () f32 adapted exposure
    tsr_color: jnp.ndarray       # (Hp,Wp,3) f32 accumulated TSR color
    gi_cache: jnp.ndarray        # (C,D^3,13) f32 world radiance SH cache
    shadow_mask: jnp.ndarray     # (Hs,Ws) f32 temporal PCSS mask (1 = lit)
    # cached cascaded shadow maps (reference: cascade history caching,
    # cascade_setup.hlsl): one cascade re-renders per frame round-robin;
    # each map's OWN fit matrix rides along so stale cascades stay valid
    shadow_maps: jnp.ndarray     # (N,R,R) f32 reverse-Z (or (1,1,1) off)
    shadow_mats: jnp.ndarray     # (N,4,4) f32 tw->light of each cached map
    # Screen-probe GI state (reference: GIContext — screen probe SH
    # buffer, probe spawn info, half-res diffuse history): (1,1,*) when
    # the screen-probe stage is off.
    probe_sh: jnp.ndarray        # (Ph,Pw,28) f32 packed SH3 + numSample
    probe_depth: jnp.ndarray     # (Ph,Pw) f32 probe ndc depth (reverse-Z)
    gi_diffuse: jnp.ndarray      # (Hh,Wh,3) f32 half-res diffuse history
    gi_specular: jnp.ndarray     # (Hq,Wq,3) f32 reduced-res specular
                                 # history (the reference's specular
                                 # temporal buffer; Hq = H/spec_div)
    depth_range: jnp.ndarray     # (2,) f32 view-space (near, far) of the
                                 # frame's valid depth (hzb.hlsl min/max
                                 # reduce); feeds next frame's device-side
                                 # cascade fit (cascade_setup.hlsl)
    # DDGI alternative GI path (reference DDGIContext, renderer/lighting.h;
    # selected by r.gi.method): tiny placeholder shapes when off.
    ddgi: "object"               # ops.ddgi.DDGIState pytree

    @classmethod
    def empty(cls, h: int, w: int, post_h: Optional[int] = None,
              post_w: Optional[int] = None,
              gi_cfg=None, shadow_div: int = 2,
              shadow_cascades: int = 0,
              shadow_res: int = 1,
              shadow_phase: int = 1,    # unused (kept so older callers
                                        # keep working; the raw phase-res
                                        # eval no longer rides in history)
              probe_tile: int = 0,
              ddgi_cfg=None) -> "FrameHistory":
        from ..ops.hzb import hzb_layout
        from ..ops.gi import GIConfig, sh_size
        from ..ops.ddgi import DDGIState

        ph, pw = post_h or h, post_w or w
        ws, hs, offs = hzb_layout(w, h)
        total = offs[-1] + ws[-1] * hs[-1]
        gi_shape = sh_size(gi_cfg or GIConfig(cascades=1, probe_dim=2))
        spec_div = (gi_cfg or GIConfig()).sample_res_div
        if probe_tile:
            pr_h, pr_w = -(-h // probe_tile), -(-w // probe_tile)
            gh, gw = -(-h // 2), -(-w // 2)
        else:
            pr_h = pr_w = gh = gw = 1
        # the specular temporal history is written for EVERY gi mode
        # (the filter chain runs on the composite SSR/BVH/cache trace),
        # not just the probe path — size it off GI being enabled, or the
        # ddgi/cache modes scan-carry a mismatched (1,1,3) (ADVICE r3)
        if gi_cfg is not None:
            sh_, sw_ = -(-h // spec_div), -(-w // spec_div)
        else:
            sh_ = sw_ = 1
        return cls(
            valid=jnp.zeros((), jnp.float32),
            frame_count=jnp.zeros((), jnp.int32),
            hzb_flat=jnp.zeros((total,), jnp.float32),
            depth=jnp.zeros((h, w), jnp.float32),
            exposure=jnp.ones((), jnp.float32),
            tsr_color=jnp.zeros((ph, pw, 3), jnp.float32),
            gi_cache=jnp.zeros(gi_shape, jnp.float32),
            shadow_mask=jnp.ones((-(-h // shadow_div), -(-w // shadow_div)),
                                 jnp.float32),
            shadow_maps=jnp.zeros((max(shadow_cascades, 1),
                                   shadow_res, shadow_res), jnp.float32),
            shadow_mats=jnp.zeros((max(shadow_cascades, 1), 4, 4),
                                  jnp.float32),
            probe_sh=jnp.zeros((pr_h, pr_w, 28), jnp.float32),
            probe_depth=jnp.zeros((pr_h, pr_w), jnp.float32),
            gi_diffuse=jnp.zeros((gh, gw, 3), jnp.float32),
            gi_specular=jnp.zeros((sh_, sw_, 3), jnp.float32),
            depth_range=jnp.zeros((2,), jnp.float32),
            ddgi=DDGIState.empty(ddgi_cfg),
        )
