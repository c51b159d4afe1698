"""Vertex transform + object-level frustum culling kernels.

The TPU equivalent of the vertex-transform half of the mesh shader
(reference: install/resource/shader/mesh_raster.hlsl:51-120) and the
object-level instance culling pass (reference:
install/resource/shader/instance_culling.hlsl:48-131 — OBB frustum cull per
object, perspective + ortho paths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transform_to_clip(
    positions: jnp.ndarray,      # (V,3) f32 object-local
    vertex_object: jnp.ndarray,  # (V,) i32
    object_to_tw: jnp.ndarray,   # (O,4,4) f32 row-vector local→translated world
    tw_to_clip: jnp.ndarray,     # (4,4) f32
) -> jnp.ndarray:
    """→ (V,4) clip positions. Combines per-object matrices with the view
    projection on-device (tiny O×4×4 matmul), then one gather + einsum."""
    local_to_clip = jnp.einsum("oij,jk->oik", object_to_tw, tw_to_clip)
    m = local_to_clip[vertex_object]            # (V,4,4)
    p = positions
    # homogeneous row-vector transform without materializing (V,4) ones
    clip = (p[:, 0, None] * m[:, 0] + p[:, 1, None] * m[:, 1] +
            p[:, 2, None] * m[:, 2] + m[:, 3])
    return clip


def frustum_cull_spheres(
    spheres: jnp.ndarray,        # (O,4) center.xyz + radius (translated world)
    frustum_planes: jnp.ndarray, # (6,4) dot(p,xyz)+w >= 0 inside
) -> jnp.ndarray:
    """Object-level sphere-vs-frustum cull → (O,) bool visible.

    The reference tests OBBs (instance_culling.hlsl:48-131); spheres are the
    round-1 conservative stand-in (never over-culls for sphere bounds that
    enclose the OBB). The meshlet path adds cone + tighter sphere culls.
    """
    c = spheres[:, :3]
    r = spheres[:, 3:4]
    # (O,6) signed distances
    d = jnp.einsum("oc,pc->op", c, frustum_planes[:, :3]) + frustum_planes[None, :, 3]
    return jnp.all(d + r >= 0.0, axis=1)
