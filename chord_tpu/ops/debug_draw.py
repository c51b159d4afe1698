"""Debug line rendering (wireframe overlays).

TPU-native equivalent of the reference's GPU debug-line pass (reference:
renderer/debugline.cpp — a GPU-written line vertex buffer drawn as a
line-list pipeline over the scene color; used for Nanite/AS bounds
visualization). There is no line primitive on a TPU, so lines are
rasterized DENSELY: a lax.scan over segment chunks computes per-pixel
distance-to-segment and keeps the nearest hit — branchless, fused, no
gathers. Segments are built host-side (or from device arrays) with the
shape helpers below (AABB edges, sphere great circles, frusta).

Cost: O(H*W*chunk) VPU flops per scan step — at debug resolutions and a
few hundred segments this is a handful of ms; it is a debug path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 32   # segments per scan step (keeps the (H,W,CHUNK) tile small)


# ---------------------------------------------------------------------------
# shape -> segment helpers (host-side, numpy)

def aabb_segments(mn, mx) -> np.ndarray:
    """(12, 2, 3) edges of an axis-aligned box."""
    mn = np.asarray(mn, np.float32)
    mx = np.asarray(mx, np.float32)
    c = np.array([[mn[0], mn[1], mn[2]], [mx[0], mn[1], mn[2]],
                  [mx[0], mx[1], mn[2]], [mn[0], mx[1], mn[2]],
                  [mn[0], mn[1], mx[2]], [mx[0], mn[1], mx[2]],
                  [mx[0], mx[1], mx[2]], [mn[0], mx[1], mx[2]]], np.float32)
    e = [(0, 1), (1, 2), (2, 3), (3, 0),
         (4, 5), (5, 6), (6, 7), (7, 4),
         (0, 4), (1, 5), (2, 6), (3, 7)]
    return np.stack([np.stack([c[a], c[b]]) for a, b in e])


def sphere_segments(center, radius: float, segs: int = 24) -> np.ndarray:
    """(3*segs, 2, 3): three axis-aligned great circles."""
    center = np.asarray(center, np.float32)
    t = np.linspace(0.0, 2.0 * np.pi, segs + 1, dtype=np.float32)
    ca, sa = np.cos(t) * radius, np.sin(t) * radius
    zero = np.zeros_like(ca)
    rings = [np.stack([ca, sa, zero], -1),    # xy
             np.stack([ca, zero, sa], -1),    # xz
             np.stack([zero, ca, sa], -1)]    # yz
    out = []
    for ring in rings:
        pts = ring + center
        out.append(np.stack([pts[:-1], pts[1:]], 1))
    return np.concatenate(out)


def project_segments(segs_world: jnp.ndarray,     # (N,2,3) translated world
                     tw_to_clip: jnp.ndarray,     # (4,4) row-vector
                     width: int, height: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> ((N,2,2) pixel endpoints, (N,) valid). Segments with an endpoint
    behind the camera are dropped (no clipping — debug path)."""
    p = segs_world
    c = (p[..., 0:1] * tw_to_clip[0] + p[..., 1:2] * tw_to_clip[1] +
         p[..., 2:3] * tw_to_clip[2] + tw_to_clip[3])        # (N,2,4)
    ok = jnp.all(c[..., 3] > 1e-4, axis=-1)
    wc = jnp.maximum(c[..., 3:4], 1e-4)
    x = (c[..., 0:1] / wc * 0.5 + 0.5) * width
    y = (0.5 - c[..., 1:2] / wc * 0.5) * height
    return jnp.concatenate([x, y], -1), ok


def overlay_lines(
    image: jnp.ndarray,            # (H,W,3) f32 (any linear/display space)
    segments_px: jnp.ndarray,      # (N,2,2) pixel-space endpoints
    valid: Optional[jnp.ndarray] = None,   # (N,) bool
    color=(0.1, 1.0, 0.2),
    width_px: float = 1.0,
) -> jnp.ndarray:
    """Composite anti-aliased line segments over an image."""
    h, w = image.shape[:2]
    n = segments_px.shape[0]
    pad = (-n) % CHUNK
    segs = jnp.concatenate(
        [segments_px, jnp.full((pad, 2, 2), -1e6, segments_px.dtype)])
    if valid is None:
        valid = jnp.ones((n,), bool)
    val = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    segs = segs.reshape(-1, CHUNK, 2, 2)
    val = val.reshape(-1, CHUNK)

    px = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    py = jnp.arange(h, dtype=jnp.float32)[:, None, None]

    def step(best, chunk):
        s, ok = chunk                       # (C,2,2), (C,)
        ax, ay = s[:, 0, 0], s[:, 0, 1]     # (C,)
        bx, by = s[:, 1, 0], s[:, 1, 1]
        dx, dy = bx - ax, by - ay
        len2 = jnp.maximum(dx * dx + dy * dy, 1e-6)
        # t of the closest point on each segment, per pixel: (H,W,C)
        t = jnp.clip(((px - ax) * dx + (py - ay) * dy) / len2, 0.0, 1.0)
        qx = ax + t * dx - px
        qy = ay + t * dy - py
        d2 = qx * qx + qy * qy
        d2 = jnp.where(ok, d2, 1e12)
        best = jnp.minimum(best, jnp.min(d2, axis=-1))
        return best, None

    best0 = jnp.full((h, w), 1e12, jnp.float32)
    best, _ = jax.lax.scan(step, best0, (segs, val))
    # smooth 1px-feather coverage from squared distance
    d = jnp.sqrt(best)
    cov = jnp.clip(1.0 - (d - width_px * 0.5), 0.0, 1.0)
    col = jnp.asarray(color, image.dtype)
    return image * (1.0 - cov[..., None]) + col * cov[..., None]
