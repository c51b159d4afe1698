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


class PairObjectData(NamedTuple):
    """Per-pair object data from ONE fused gather (XLA lowers many small
    per-frame gathers poorly on TPU; one (P,28) row gather is the fast
    path — see rhi/meshlet_scene.py pair_cull for the static half)."""

    m: jnp.ndarray            # (P,4,4) object_to_tw
    nm: jnp.ndarray           # (P,3,3) normal matrix
    two_sided: jnp.ndarray    # (P,)
    valid: jnp.ndarray        # (P,) bool
    masked: jnp.ndarray       # (P,) bool (alpha-mask material bucket)
    blend: jnp.ndarray        # (P,) bool (translucent bucket)
    scale: jnp.ndarray        # (P,) max row norm of the linear block


def gather_pair_objects(pools, instances) -> PairObjectData:
    n = instances.object_to_tw.shape[0]
    table = jnp.concatenate(
        [instances.object_to_tw.reshape(n, 16),
         instances.object_normal_mat.reshape(n, 9),
         instances.object_two_sided.reshape(n, 1).astype(jnp.float32),
         instances.object_valid.reshape(n, 1).astype(jnp.float32),
         instances.object_masked.reshape(n, 1).astype(jnp.float32),
         instances.object_blend.reshape(n, 1).astype(jnp.float32)], axis=1)
    t = table[pools.pair_object]                          # (P,29) one gather
    p = t.shape[0]
    m = t[:, :16].reshape(p, 4, 4)
    return PairObjectData(
        m=m,
        nm=t[:, 16:25].reshape(p, 3, 3),
        two_sided=t[:, 25],
        valid=t[:, 26] > 0.5,
        masked=t[:, 27] > 0.5,
        blend=t[:, 28] > 0.5,
        scale=jnp.sqrt(jnp.max(jnp.sum(m[:, :3, :3] ** 2, axis=2), axis=1)))


def pair_spheres_tw(pools, instances,
                    od: Optional[PairObjectData] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pair bounding spheres in translated world.

    -> (centers (P,3), radii (P,)). Conservative radius scaling by the max
    row norm of the object's linear block (handles non-uniform scale)."""
    if od is None:
        od = gather_pair_objects(pools, instances)
    m = od.m
    s = pools.pair_cull[:, 0:4]                           # local sphere
    c = (s[:, 0:1] * m[:, 0, :3] + s[:, 1:2] * m[:, 1, :3] +
         s[:, 2:3] * m[:, 2, :3] + m[:, 3, :3])           # (P,3)
    return c, s[:, 3] * od.scale


def frustum_visible(centers: jnp.ndarray, radii: jnp.ndarray,
                    planes: jnp.ndarray) -> jnp.ndarray:
    """Sphere-vs-frustum: (P,) bool."""
    d = jnp.einsum("pc,kc->pk", centers, planes[:, :3]) + planes[None, :, 3]
    return jnp.all(d + radii[:, None] >= 0.0, axis=1)


def cone_visible(pools, instances, centers_tw: jnp.ndarray,
                 od: Optional[PairObjectData] = None) -> jnp.ndarray:
    """Meshlet normal-cone backface cull (meshopt-style test; reference:
    nanite_shared.hlsli:51-91 cone cull). Camera at the TW origin.

    Cull when every triangle in the meshlet faces away:
        dot(normalize(center - eye), axis) >= cutoff  (eye = origin)
    """
    if od is None:
        od = gather_pair_objects(pools, instances)
    cone = pools.pair_cull[:, 4:8]                        # (P,4)
    nm = od.nm
    axis = (cone[:, 0:1] * nm[:, 0] + cone[:, 1:2] * nm[:, 1] +
            cone[:, 2:3] * nm[:, 2])
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=1, keepdims=True),
                              1e-8)
    dist = jnp.maximum(jnp.linalg.norm(centers_tw, axis=1), 1e-8)
    view = centers_tw / dist[:, None]
    cutoff = cone[:, 3]
    # cutoff >= 1 disables the cone (degenerate meshlets); two-sided
    # materials are never cone-culled (their back faces draw)
    return ((jnp.sum(view * axis, axis=1) < cutoff) | (cutoff >= 0.999) |
            (od.two_sided > 0.5))


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
                    error_px_threshold: float = 1.0,
                    od: Optional[PairObjectData] = None) -> jnp.ndarray:
    """Nanite DAG-cut rule: visible iff
        projected(parent_error) > threshold AND projected(error) <= threshold
    (reference: nanite_shared.hlsli:15-49; builder guarantees monotonic
    errors so exactly one cut level passes per DAG path)."""
    if od is None:
        od = gather_pair_objects(pools, instances)
    m = od.m
    ls = pools.pair_cull[:, 8:12]
    ps = pools.pair_cull[:, 12:16]

    def to_tw(s4):
        return (s4[:, 0:1] * m[:, 0, :3] + s4[:, 1:2] * m[:, 1, :3] +
                s4[:, 2:3] * m[:, 2, :3] + m[:, 3, :3])

    c = to_tw(ls)
    cp = to_tw(ps)
    err0 = pools.pair_cull[:, 16]
    perr0 = pools.pair_cull[:, 17]
    err = err0 * od.scale
    perr = perr0 * od.scale
    e_px = project_error_px(c, jnp.maximum(err, 1e-12), view_proj_scale)
    # parent error projects through the PARENT group's sphere so parents
    # and children evaluate the identical quantity (crack-free cut,
    # reference nanite_shared.hlsli:15-49)
    p_px = jnp.where(perr0 >= 1e37, jnp.float32(1e9),
                     project_error_px(cp, jnp.maximum(perr, 1e-12),
                                      view_proj_scale))
    zero_err = err0 <= 0.0
    e_ok = zero_err | (e_px <= error_px_threshold)
    return (p_px > error_px_threshold) & e_ok


def compact_draws(visible: jnp.ndarray, pools, capacity: int) -> DrawList:
    """(P,) bool -> bounded draw list (the TPU version of wave-aggregated
    compaction, instance_culling.hlsl:191-208).

    Stable multi-operand sort on the visibility key, NOT a rank scatter:
    XLA lowers element scatters serially on TPU (~0.4 µs/element — the
    scatter version measured ~1.9 ms at 2.2k pairs); sort is ~50x faster
    and needs no follow-up gather since the payloads ride along."""
    vis_i = visible.astype(jnp.int32)
    total = jnp.sum(vis_i)
    _, obj_s, mesh_s = jax.lax.sort(
        (1 - vis_i, pools.pair_object, pools.pair_meshlet),
        num_keys=1, is_stable=True)
    p = vis_i.shape[0]
    if p < capacity:
        pad = capacity - p
        obj_s = jnp.concatenate([obj_s, jnp.zeros((pad,), jnp.int32)])
        mesh_s = jnp.concatenate([mesh_s, jnp.zeros((pad,), jnp.int32)])
    count = jnp.minimum(total, capacity)
    live = jnp.arange(capacity, dtype=jnp.int32) < count
    obj = jnp.where(live, obj_s[:capacity], 0)
    mesh = jnp.where(live, mesh_s[:capacity], 0)
    return DrawList(object_id=obj, meshlet_id=mesh, count=count,
                    overflow=jnp.maximum(total - capacity, 0))


class ActivePairs(NamedTuple):
    """Frame-level object pre-cull result: the bounded set of
    (instance, meshlet) pairs whose OBJECT passed the frustum test.

    TPU-native equivalent of the reference's object-level instance
    culling (instance_culling.hlsl:48-131: per-object OBB frustum cull
    FIRST, then append only survivors' cluster groups) — per-phase cull
    cost scales with visible objects, not the total static pair table.
    Object-level culling is frustum-only (matching the reference; HZB
    occlusion stays at meshlet level so phase 1 can recover)."""

    pair_object: jnp.ndarray    # (A,) i32
    pair_meshlet: jnp.ndarray   # (A,) i32
    pair_valid: jnp.ndarray     # (A,) bool (slack rows invalid)
    pair_cull: jnp.ndarray      # (A,18) f32 gathered static cull rows
    count: jnp.ndarray          # () i32
    overflow: jnp.ndarray       # () i32 active pairs dropped

    # duck-typed `pools` stand-in for the pair-level helpers
    @property
    def num_pairs(self) -> int:
        return self.pair_object.shape[0]


def build_active_pairs(pools, instances, frustum_planes: jnp.ndarray,
                       capacity: int) -> ActivePairs:
    """Object frustum cull -> compact the surviving pairs (one sort +
    one (A,·) row gather; all later per-pair math runs at A, not P)."""
    with jax.named_scope("cull.objects"):
        # per-object OBB vs frustum (the reference's instance-level test,
        # instance_culling.hlsl:48-131): projected radius onto each plane
        # normal = sum of |axis . n| over the three world half-axes —
        # tighter than the bounding sphere for long/thin/scaled objects
        obb = instances.object_obb_tw
        c = obb[:, 0:3]
        axes = obb[:, 3:12].reshape(-1, 3, 3)
        d = jnp.einsum("oc,kc->ok", c, frustum_planes[:, :3]) + \
            frustum_planes[None, :, 3]
        r = jnp.sum(jnp.abs(jnp.einsum("oac,kc->oak", axes,
                                       frustum_planes[:, :3])), axis=1)
        obj_ok = jnp.all(d + r >= 0.0, axis=1) & instances.object_valid
    with jax.named_scope("cull.active_compact"):
        ok = pools.pair_valid & obj_ok[pools.pair_object]
        ok_i = ok.astype(jnp.int32)
        total = jnp.sum(ok_i)
        p = ok_i.shape[0]
        idx = jnp.arange(p, dtype=jnp.int32)
        _, idx_s = jax.lax.sort((1 - ok_i, idx), num_keys=1,
                                is_stable=True)
        a = min(capacity, p)
        idx_a = idx_s[:a]
        count = jnp.minimum(total, a)
        live = jnp.arange(a, dtype=jnp.int32) < count
        return ActivePairs(
            pair_object=jnp.where(live, pools.pair_object[idx_a], 0),
            pair_meshlet=jnp.where(live, pools.pair_meshlet[idx_a], 0),
            pair_valid=live,
            pair_cull=pools.pair_cull[idx_a],
            count=count,
            overflow=jnp.maximum(total - a, 0))


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
    masked: Optional[bool] = None,   # material-bucket filter: None = all,
                                     # False = opaque only, True = alpha-
                                     # masked only (the reference's
                                     # pipeline_filter bucketing)
    active: Optional[ActivePairs] = None,   # object-preculled pair set
) -> CullResult:
    """Full meshlet cull -> compacted draw list + occlusion remainder.

    With `active` (build_active_pairs), every per-pair test below runs on
    the bounded object-visible subset instead of the full static table —
    the reference's object-level pre-cull (instance_culling.hlsl:48-131).
    """
    pv = active if active is not None else pools
    od = gather_pair_objects(pv, instances)
    with jax.named_scope("cull.spheres"):
        c, r = pair_spheres_tw(pv, instances, od)
    with jax.named_scope("cull.frustum"):
        vis = pv.pair_valid & frustum_visible(c, r, frustum_planes)
        vis = vis & od.valid
    if extra_mask is not None:
        vis = vis & extra_mask
    # bucket filter (reference pipeline_filter.hlsl): None = opaque+masked
    # (blend NEVER rasters into the visibility buffer — it has its own
    # forward pass, or is skipped like the reference's raster loops do),
    # False = opaque only, True = alpha-masked only, "blend" = blend only
    if masked is None:
        vis = vis & ~od.blend
    elif masked == "blend":
        vis = vis & od.blend
    elif masked:
        vis = vis & od.masked & ~od.blend
    else:
        vis = vis & ~od.masked & ~od.blend
    with jax.named_scope("cull.lod"):
        vis = vis & lod_cut_visible(pv, instances, proj_scale,
                                    lod_threshold, od)
    if enable_cone:
        with jax.named_scope("cull.cone"):
            vis = vis & cone_visible(pv, instances, c, od)
    occluded = jnp.zeros_like(vis)
    if hzb is not None:
        with jax.named_scope("cull.hzb"):
            unoccluded = occlusion_test_spheres(hzb, c, r, hzb_tw_to_clip)
            occluded = vis & ~unoccluded
            vis = vis & unoccluded
    with jax.named_scope("cull.compact"):
        draws = compact_draws(vis, pv, capacity)
    stats = {"culled_visible": jnp.sum(vis.astype(jnp.int32)),
             "culled_occluded": jnp.sum(occluded.astype(jnp.int32)),
             "draw_overflow": draws.overflow}
    return CullResult(draws=draws, occluded_mask=occluded, stats=stats)
