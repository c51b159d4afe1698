"""Hierarchical Z-buffer build + occlusion sampling.

TPU-native equivalent of the reference HZB passes
(reference: renderer/postprocessing/hzb.cpp:38 + shader/hzb.hlsl /
hzb_one.hlsl — one-pass SPD-style downsample producing min AND max depth
pyramids with a globallycoherent mip relay; sampling in
shader/hzb_mainview_culling.hlsl:36-140 — mip pick via firstbithigh of the
screen footprint, 4-texel test).

On TPU the "one-pass amortized pyramid" trick is unnecessary: the chain of
2x2 reductions is a handful of tiny fused XLA ops. The pyramid is stored
FLATTENED into one 1-D array with static per-level offsets so occlusion
tests can gather from a runtime-computed mip level with plain integer
arithmetic (no dynamic mip indexing problem).

Convention: reverse-Z (1 = near, 0 = far/empty). The *far* pyramid keeps
the MIN depth of each footprint: a sphere whose nearest depth is <= the far
value of every covering texel is occluded (everything in that footprint is
closer).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class HZBPyramid(NamedTuple):
    """Flattened min-depth pyramid + static layout metadata."""

    flat: jnp.ndarray            # (total,) f32 all levels concatenated
    # static (python) layout — folded into the jit as constants
    widths: Tuple[int, ...]      # texel width per level
    heights: Tuple[int, ...]
    offsets: Tuple[int, ...]     # start of each level in `flat`
    mip0_w: int                  # pixel size the pyramid was built from
    mip0_h: int
    # optional MAX (nearest-depth) pyramid, same layout as `flat`
    # (reference hzb.hlsl:11-19 builds min AND max mips; the max side
    # bounds the NEAREST occluder of a footprint — screen traces step
    # past a whole footprint when the ray stays nearer than this)
    flat_max: jnp.ndarray = None

    @property
    def levels(self) -> int:
        return len(self.widths)


def _reduce2(x: jnp.ndarray, op) -> jnp.ndarray:
    """2x2 min reduction (odd dims zero-padded: depth 0 = far infinity,
    absorbing for the conservative min). reduce_window lowers ~35% faster
    than reshape-min chains on TPU."""
    h, w = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, h % 2), (0, w % 2)))
    return jax.lax.reduce_window(x, jnp.inf, jax.lax.min, (2, 2), (2, 2),
                                 "VALID")


def hzb_layout(width: int, height: int, max_levels: int = 12
               ) -> Tuple[Tuple[int, ...], Tuple[int, ...], Tuple[int, ...]]:
    """Static pyramid layout for a (height, width) depth buffer: level 0 is
    the half-res first reduction (like the reference's HZB starting mip)."""
    ws, hs, offs = [], [], []
    w, h = (width + 1) // 2, (height + 1) // 2
    off = 0
    for _ in range(max_levels):
        ws.append(w)
        hs.append(h)
        offs.append(off)
        off += w * h
        if w == 1 and h == 1:
            break
        w, h = max(1, (w + 1) // 2), max(1, (h + 1) // 2)
    return tuple(ws), tuple(hs), tuple(offs)


def _reduce2_max(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 max reduction (pad value 0 = far infinity is absorbing down)."""
    h, w = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, h % 2), (0, w % 2)))
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (2, 2), (2, 2),
                                 "VALID")


def build_hzb(depth: jnp.ndarray, with_max: bool = False) -> HZBPyramid:
    """(H,W) reverse-Z depth -> min-depth (far) pyramid [+ max pyramid].

    Empty pixels are depth 0 (far infinity) which is absorbing for min —
    exactly what a conservative occlusion test needs. `with_max` also
    builds the nearest-depth pyramid (reference hzb.hlsl builds both).
    """
    h, w = depth.shape
    ws, hs, offs = hzb_layout(w, h)
    mips: List[jnp.ndarray] = []
    maxs: List[jnp.ndarray] = []
    cur = _reduce2(depth, jnp.minimum)
    cur_max = _reduce2_max(depth) if with_max else None
    for lw, lh in zip(ws, hs):
        # shapes are static; _reduce2 halves each time
        assert cur.shape == (lh, lw), (cur.shape, lh, lw)
        mips.append(cur.reshape(-1))
        if with_max:
            maxs.append(cur_max.reshape(-1))
        if lw == 1 and lh == 1:
            break
        cur = _reduce2(cur, jnp.minimum)
        if with_max:
            cur_max = _reduce2_max(cur_max)
    flat = jnp.concatenate(mips)
    flat_max = jnp.concatenate(maxs) if with_max else None
    return HZBPyramid(flat=flat, widths=ws, heights=hs, offsets=offs,
                      mip0_w=w, mip0_h=h, flat_max=flat_max)


def valid_depth_range(depth: jnp.ndarray, z_near: jnp.ndarray
                      ) -> jnp.ndarray:
    """Valid-depth min/max reduce -> (2,) VIEW-space (near, far) distances
    of the frame's occupied depth range (reference hzb.hlsl:11-19 writes
    the same reduction next to the pyramid; cascade_setup.hlsl consumes
    it to fit shadow cascades to geometry instead of the whole frustum).

    reverse-Z infinite-far: ndc = z_near / view_z. Empty pixels (ndc 0)
    are excluded; an all-empty frame returns (big, 0) — callers clip, and
    near > far reads as "no valid range"."""
    valid = depth > 0.0
    near_ndc = jnp.max(depth)                         # nearest pixel
    far_ndc = jnp.min(jnp.where(valid, depth, jnp.inf))
    near_v = z_near / jnp.maximum(near_ndc, 1e-12)
    far_v = z_near / jnp.maximum(far_ndc, 1e-12)      # inf ndc -> ~0
    return jnp.stack([near_v, far_v]).astype(jnp.float32)


def occlusion_test_spheres(
    hzb: HZBPyramid,
    center_tw: jnp.ndarray,     # (N,3) sphere centers, translated world
    radius: jnp.ndarray,        # (N,)
    tw_to_clip: jnp.ndarray,    # (4,4) of the frame the HZB was built from
) -> jnp.ndarray:
    """-> (N,) bool VISIBLE (False = definitely occluded).

    Projects each sphere to a conservative screen AABB + nearest depth and
    tests 4 texels of the mip whose texel covers the AABB (reference:
    hzb_mainview_culling.hlsl footprint mip pick). Conservative on every
    edge case: behind-camera, eye-inside-sphere, offscreen -> visible.
    """
    c = center_tw
    r = radius
    # Project the 8 corners of the sphere's AABB (conservative bound).
    n = c.shape[0]
    corners = jnp.asarray(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        jnp.float32)                                          # (8,3)
    pts = c[:, None, :] + corners[None, :, :] * r[:, None, None]  # (N,8,3)
    clip = (pts[..., 0:1] * tw_to_clip[0] + pts[..., 1:2] * tw_to_clip[1] +
            pts[..., 2:3] * tw_to_clip[2] + tw_to_clip[3])        # (N,8,4)
    w_ = clip[..., 3]
    any_near = jnp.any(w_ <= 1e-5, axis=1)   # crosses eye plane -> visible
    w_safe = jnp.maximum(w_, 1e-5)
    ndc = clip[..., :3] / w_safe[..., None]
    # pixel coords in mip0 (half-res) space
    u = (ndc[..., 0] * 0.5 + 0.5) * hzb.mip0_w * 0.5
    v = (0.5 - ndc[..., 1] * 0.5) * hzb.mip0_h * 0.5
    z_near_pt = jnp.max(ndc[..., 2], axis=1)   # reverse-Z: max = nearest

    u0 = jnp.min(u, axis=1)
    u1 = jnp.max(u, axis=1)
    v0 = jnp.min(v, axis=1)
    v1 = jnp.max(v, axis=1)

    # mip pick: texel at level L covers 2^L mip0-texels; choose L so the
    # 2x2 footprint covers the AABB (firstbithigh of the larger extent).
    ext = jnp.maximum(u1 - u0, v1 - v0)
    level = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(ext, 1.0))).astype(jnp.int32),
        0, hzb.levels - 1)

    widths = jnp.asarray(hzb.widths, jnp.int32)
    heights = jnp.asarray(hzb.heights, jnp.int32)
    offsets = jnp.asarray(hzb.offsets, jnp.int32)
    lw = widths[level]
    lh = heights[level]
    loff = offsets[level]
    scale = (2.0 ** level.astype(jnp.float32))

    x0 = jnp.clip((u0 / scale).astype(jnp.int32), 0, lw - 1)
    x1 = jnp.clip((u1 / scale).astype(jnp.int32), 0, lw - 1)
    y0 = jnp.clip((v0 / scale).astype(jnp.int32), 0, lh - 1)
    y1 = jnp.clip((v1 / scale).astype(jnp.int32), 0, lh - 1)

    def tex(x, y):
        return hzb.flat[loff + y * lw + x]

    far4 = jnp.minimum(jnp.minimum(tex(x0, y0), tex(x1, y0)),
                       jnp.minimum(tex(x0, y1), tex(x1, y1)))
    # occluded iff the sphere's nearest point is farther than (<) the
    # farthest occluder depth in the footprint
    occluded = z_near_pt < far4
    return any_near | ~occluded
