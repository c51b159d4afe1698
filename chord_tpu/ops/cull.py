"""GPU-driven culling: instance/meshlet frustum + cone + Nanite LOD cut +
two-phase HZB occlusion, with prefix-sum compaction into a draw list.

TPU-native equivalent of the reference's culling compute passes:
- instance culling CS (reference: install/resource/shader/
  instance_culling.hlsl:48-131 — OBB frustum cull per object, then append
  all cluster groups of survivors),
- cluster-group / meshlet culling with the Nanite DAG-cut error rule
  (reference: shader/nanite_shared.hlsli:15-49 `projectedParentError > 1px
  AND projectedError <= 1px`, cone + frustum per meshlet :51-91),
- two-phase HZB occlusion (reference: renderer/mesh/mesh_raster.cpp:269-330,
  shader/hzb_mainview_culling.hlsl) — phase 0 tests against the PREVIOUS
  frame's HZB, the remainder is retested against the freshly built HZB.

Wave-aggregated compaction (`WavePrefixSum` patterns,
instance_culling.hlsl:191-200) becomes `jnp.cumsum` + bounded scatter: the
visible (instance, meshlet) pairs are compacted into a static-capacity draw
list; overflow is counted and reported, never silent.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .hzb import HZBPyramid, occlusion_test_spheres


class DrawList(NamedTuple):
    """Compacted visible draws (static capacity)."""

    object_id: jnp.ndarray    # (cap,) i32, slack entries = 0
    meshlet_id: jnp.ndarray   # (cap,) i32, slack entries = 0
    count: jnp.ndarray        # () i32
    overflow: jnp.ndarray     # () i32 visible pairs dropped


def pair_spheres_tw(pools, instances) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pair bounding spheres in translated world.

    -> (centers (P,3), radii (P,)). Conservative radius scaling by the max
    row norm of the object's linear block (handles non-uniform scale)."""
    obj = pools.pair_object
    mesh = pools.pair_meshlet
    m = instances.object_to_tw[obj]                       # (P,4,4)
    s = pools.meshlet_sphere[mesh]                        # (P,4) local
    c = (s[:, 0:1] * m[:, 0, :3] + s[:, 1:2] * m[:, 1, :3] +
         s[:, 2:3] * m[:, 2, :3] + m[:, 3, :3])           # (P,3)
    scale = jnp.sqrt(jnp.max(jnp.sum(m[:, :3, :3] ** 2, axis=2), axis=1))
    return c, s[:, 3] * scale


def frustum_visible(centers: jnp.ndarray, radii: jnp.ndarray,
                    planes: jnp.ndarray) -> jnp.ndarray:
    """Sphere-vs-frustum: (P,) bool."""
    d = jnp.einsum("pc,kc->pk", centers, planes[:, :3]) + planes[None, :, 3]
    return jnp.all(d + radii[:, None] >= 0.0, axis=1)


def cone_visible(pools, instances, centers_tw: jnp.ndarray) -> jnp.ndarray:
    """Meshlet normal-cone backface cull (meshopt-style test; reference:
    nanite_shared.hlsli:51-91 cone cull). Camera at the TW origin.

    Cull when every triangle in the meshlet faces away:
        dot(normalize(center - eye), axis) >= cutoff  (eye = origin)
    """
    mesh = pools.pair_meshlet
    obj = pools.pair_object
    cone = pools.meshlet_cone[mesh]                       # (P,4)
    nm = instances.object_normal_mat[obj]                 # (P,3,3)
    axis = (cone[:, 0:1] * nm[:, 0] + cone[:, 1:2] * nm[:, 1] +
            cone[:, 2:3] * nm[:, 2])
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=1, keepdims=True),
                              1e-8)
    dist = jnp.maximum(jnp.linalg.norm(centers_tw, axis=1), 1e-8)
    view = centers_tw / dist[:, None]
    cutoff = cone[:, 3]
    # cutoff >= 1 disables the cone (degenerate meshlets); two-sided
    # materials are never cone-culled (their back faces draw)
    two_sided = instances.object_two_sided[obj] > 0.5
    return ((jnp.sum(view * axis, axis=1) < cutoff) | (cutoff >= 0.999) |
            two_sided)


def project_error_px(center_tw: jnp.ndarray, radius_err: jnp.ndarray,
                     proj_scale: jnp.ndarray) -> jnp.ndarray:
    """Screen-space size (pixels) of an error sphere (reference:
    nanite_shared.hlsli:22-47 projectError — bounding-sphere projection
    with eye-inside => forced large)."""
    d2 = jnp.sum(center_tw * center_tw, axis=1)
    r2 = radius_err * radius_err
    inside = d2 <= r2 * 1.0001
    dist = jnp.sqrt(jnp.maximum(d2 - r2, 1e-12))
    px = radius_err * proj_scale / dist
    return jnp.where(inside, jnp.float32(1e9), px)


def lod_cut_visible(pools, instances, view_proj_scale: jnp.ndarray,
                    error_px_threshold: float = 1.0) -> jnp.ndarray:
    """Nanite DAG-cut rule: visible iff
        projected(parent_error) > threshold AND projected(error) <= threshold
    (reference: nanite_shared.hlsli:15-49; builder guarantees monotonic
    errors so exactly one cut level passes per DAG path)."""
    obj = pools.pair_object
    mesh = pools.pair_meshlet
    m = instances.object_to_tw[obj]
    ls = pools.meshlet_lod_sphere[mesh]
    ps = pools.meshlet_parent_sphere[mesh]

    def to_tw(s4):
        return (s4[:, 0:1] * m[:, 0, :3] + s4[:, 1:2] * m[:, 1, :3] +
                s4[:, 2:3] * m[:, 2, :3] + m[:, 3, :3])

    c = to_tw(ls)
    cp = to_tw(ps)
    scale = jnp.sqrt(jnp.max(jnp.sum(m[:, :3, :3] ** 2, axis=2), axis=1))
    err = pools.meshlet_error[mesh] * scale
    perr = pools.meshlet_parent_error[mesh] * scale
    e_px = project_error_px(c, jnp.maximum(err, 1e-12), view_proj_scale)
    # parent error projects through the PARENT group's sphere so parents
    # and children evaluate the identical quantity (crack-free cut,
    # reference nanite_shared.hlsli:15-49)
    p_px = jnp.where(pools.meshlet_parent_error[mesh] >= 1e37,
                     jnp.float32(1e9),
                     project_error_px(cp, jnp.maximum(perr, 1e-12),
                                      view_proj_scale))
    zero_err = pools.meshlet_error[mesh] <= 0.0
    e_ok = zero_err | (e_px <= error_px_threshold)
    return (p_px > error_px_threshold) & e_ok


def compact_draws(visible: jnp.ndarray, pools, capacity: int) -> DrawList:
    """(P,) bool -> bounded draw list via cumsum ranks (the TPU version of
    wave-aggregated compaction, instance_culling.hlsl:191-208)."""
    vis_i = visible.astype(jnp.int32)
    rank = jnp.cumsum(vis_i) - 1
    total = jnp.sum(vis_i)
    slot = jnp.where(visible & (rank < capacity), rank, capacity)
    obj = jnp.zeros((capacity + 1,), jnp.int32).at[slot].set(
        pools.pair_object, mode="drop")[:capacity]
    mesh = jnp.zeros((capacity + 1,), jnp.int32).at[slot].set(
        pools.pair_meshlet, mode="drop")[:capacity]
    count = jnp.minimum(total, capacity)
    return DrawList(object_id=obj, meshlet_id=mesh, count=count,
                    overflow=jnp.maximum(total - capacity, 0))


class CullResult(NamedTuple):
    draws: DrawList              # pairs to raster this phase
    occluded_mask: jnp.ndarray   # (P,) pairs deferred to phase 2
    stats: dict


def cull_pairs(
    pools, instances,
    frustum_planes: jnp.ndarray,         # (6,4)
    proj_scale: jnp.ndarray,             # () ~ 0.5*h*P[1,1] for error proj
    capacity: int,
    hzb: Optional[HZBPyramid] = None,     # previous-phase pyramid
    hzb_tw_to_clip: Optional[jnp.ndarray] = None,
    lod_threshold: float = 1.0,
    enable_cone: bool = True,
    extra_mask: Optional[jnp.ndarray] = None,  # restrict to these pairs
) -> CullResult:
    """Full meshlet cull -> compacted draw list + occlusion remainder."""
    with jax.named_scope("cull.spheres"):
        c, r = pair_spheres_tw(pools, instances)
    with jax.named_scope("cull.frustum"):
        vis = pools.pair_valid & frustum_visible(c, r, frustum_planes)
        vis = vis & instances.object_valid[pools.pair_object]
    if extra_mask is not None:
        vis = vis & extra_mask
    with jax.named_scope("cull.lod"):
        vis = vis & lod_cut_visible(pools, instances, proj_scale,
                                    lod_threshold)
    if enable_cone:
        with jax.named_scope("cull.cone"):
            vis = vis & cone_visible(pools, instances, c)
    occluded = jnp.zeros_like(vis)
    if hzb is not None:
        with jax.named_scope("cull.hzb"):
            unoccluded = occlusion_test_spheres(hzb, c, r, hzb_tw_to_clip)
            occluded = vis & ~unoccluded
            vis = vis & unoccluded
    with jax.named_scope("cull.compact"):
        draws = compact_draws(vis, pools, capacity)
    stats = {"culled_visible": jnp.sum(vis.astype(jnp.int32)),
             "culled_occluded": jnp.sum(occluded.astype(jnp.int32)),
             "draw_overflow": draws.overflow}
    return CullResult(draws=draws, occluded_mask=occluded, stats=stats)
