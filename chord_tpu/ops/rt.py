"""Software ray traversal over the flattened 8-wide BVH.

TPU-native replacement for the reference's ray-query infrastructure
(reference: graphics/helper.h:554-661 TLAS/BLAS builders + per-frame
async TLAS rebuild renderer.cpp:292-304; rays traced inline via
RayQuery in gi_raytracing.hlsli:41-45). TPUs have no RT cores, so:

- The BVH is built OFFLINE by the native builder over world-space
  coarse-LOD (instance, meshlet) bounding spheres (native/nanite.cpp
  chord_bvh_build — the same 8-wide/level-capped shape as the
  reference's cluster BVH, nanite_builder.cpp:77-313), flattened DFS
  pre-order so the subtree count is a skip pointer.
- Traversal is a branch-free linear scan vectorized over rays: every
  ray keeps a cursor i; a missed node skips its whole subtree
  (i += count[i]), a hit internal node descends (i += 1), a hit leaf
  updates the closest-hit record. No per-ray stack, no divergence —
  each lax.while_loop step is dense vector math + small gathers.
- Hits shade from a per-leaf mean albedo + sun/ambient approximation
  (the Lumen-style "surface cache" stand-in for full hit shading) —
  enough for GI probe rays and specular-miss fallback to SEE offscreen
  geometry, which the screen-space march alone cannot.

Rays are intersected against the leaf bounding spheres themselves
(coarse-LOD geometry proxy). This trades silhouette accuracy for
throughput — the consumers (SH3 probes, rough specular) are low
frequency by construction.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SceneBVH(NamedTuple):
    """Flattened BVH + leaf shading table (device arrays)."""

    node_sphere: jnp.ndarray    # (M,4) xyzr
    node_count: jnp.ndarray     # (M,) subtree size (skip pointer)
    node_leaf: jnp.ndarray      # (M,) leaf element id or -1
    leaf_albedo: jnp.ndarray    # (N,3) AP1 mean albedo per leaf
    leaf_emissive: jnp.ndarray  # (N,3) AP1
    leaf_sphere: jnp.ndarray = None   # (N,4) raw leaf spheres (dense path)
    # triangle-exact mode (granularity="triangle"): Baldwin-Weber
    # precomputed intersection planes per leaf triangle. Rows are
    # [n | dn | n1 | d1 | n2 | d2] so t = -(o.n + dn)/(d.n) and the
    # barycentrics are affine in the hit point — every per-ray term is a
    # (R,3)@(3,T) contraction (MXU) or a gathered row (BVH scan).
    tri_planes: jnp.ndarray = None    # (N,12) f32
    leaf_normal: jnp.ndarray = None   # (N,3) f32 unit geometric normal


def build_bvh_numpy(spheres: np.ndarray):
    """Pure-NumPy reference of native chord_bvh_build (same DFS pre-order
    flatten + skip counts) — test oracle and no-toolchain fallback."""
    spheres = np.asarray(spheres, np.float32).reshape(-1, 4)

    out_sphere, out_count, out_leaf = [], [], []

    def bound(ids):
        c = spheres[ids, :3].mean(0)
        r = (np.linalg.norm(spheres[ids, :3] - c, axis=1) +
             spheres[ids, 3]).max()
        return np.array([c[0], c[1], c[2], r], np.float32)

    def rec(ids):
        idx = len(out_sphere)
        out_sphere.append(bound(ids))
        out_count.append(1)
        out_leaf.append(int(ids[0]) if len(ids) == 1 else -1)
        if len(ids) == 1:
            return 1
        def split(a, axis):
            o = a[np.argsort(spheres[a, axis], kind="stable")]
            m = len(o) // 2
            return o[:m], o[m:]
        total = 1
        hx = split(np.asarray(ids), 0)
        for h in hx:
            if len(h) == 0:
                continue
            qx = split(h, 1)
            for q in qx:
                if len(q) == 0:
                    continue
                ox = split(q, 2)
                for o in ox:
                    if len(o) == 0:
                        continue
                    total += rec(list(o))
        out_count[idx] = total
        return total

    rec(list(range(len(spheres))))
    return {"sphere": np.stack(out_sphere),
            "count": np.asarray(out_count, np.int32),
            "leaf": np.asarray(out_leaf, np.int32)}


def _tri_planes_np(v0, e1, e2):
    """Baldwin-Weber precomputed planes (N,12) from triangle soup.
    [n | dn | n1 | d1 | n2 | d2]: t = -(o.n + dn)/(d.n); u = p.n1 + d1;
    v = p.n2 + d2; hit iff u>=0 & v>=0 & u+v<=1 (two-sided)."""
    import numpy as onp

    n = onp.cross(e1, e2)
    denom = onp.maximum((n * n).sum(-1, keepdims=True), 1e-30)
    n1 = onp.cross(e2, n) / denom
    n2 = onp.cross(n, e1) / denom
    dn = -(n * v0).sum(-1, keepdims=True)
    d1 = -(n1 * v0).sum(-1, keepdims=True)
    d2 = -(n2 * v0).sum(-1, keepdims=True)
    return onp.concatenate([n, dn, n1, d1, n2, d2], -1).astype(onp.float32)


def build_scene_bvh(pools, instances, coarse_only: bool = True,
                    granularity: str = "meshlet") -> SceneBVH:
    """World-space BVH over coarse proxy bounding spheres.

    granularity="meshlet": LOD-root meshlet spheres per instance
    (parentError = +inf, nanite_shared.hlsli:11 kErrorRadiusRoot).
    granularity="object": ONE sphere per instance — ~7x fewer leaves,
    which on the dense MXU path is a direct speedup; GI/specular rays are
    low-frequency enough that object-sized proxies suffice (the frame's
    default). Built host-side at scene load (static scenes; the
    reference rebuilds its TLAS per frame on an async GPU queue — a host
    rebuild hook serves dynamic scenes here).
    granularity="triangle": TRIANGLE-EXACT leaves over the root-cut
    meshlets' real geometry (the reference traces real triangles via
    ray query, gi_raytracing.hlsli:41-45) — the fidelity mode; rays hit
    actual silhouettes and return true geometric normals."""
    import numpy as onp

    if granularity == "triangle":
        pair_m = onp.asarray(pools.pair_meshlet)
        pair_o = onp.asarray(pools.pair_object)
        valid = onp.asarray(pools.pair_valid)
        perr = onp.asarray(pools.meshlet_parent_error)[pair_m]
        keep = valid & (perr > 1e30 if coarse_only
                        else onp.ones_like(valid))
        ids = onp.nonzero(keep)[0]
        if len(ids) == 0:
            ids = onp.nonzero(valid)[0]
        m = pair_m[ids]
        oi = pair_o[ids]
        tri = onp.asarray(pools.tri_indices).reshape(-1, 128, 3)[m]
        cnt = onp.asarray(pools.meshlet_tri_count)[m]
        tmask = onp.arange(128)[None, :] < cnt[:, None]      # (K,128)
        pos = onp.asarray(pools.positions)
        v = pos[tri]                                         # (K,128,3,3)
        o2w = onp.asarray(instances.object_to_tw)[oi]        # (K,4,4)
        vh = onp.concatenate([v, onp.ones(v.shape[:3] + (1,))], -1)
        vw = onp.einsum("ktcj,kjl->ktcl", vh, o2w)[..., :3]  # world
        tri_inst = onp.broadcast_to(oi[:, None], tmask.shape)
        v0 = vw[:, :, 0][tmask]
        e1 = (vw[:, :, 1] - vw[:, :, 0])[tmask]
        e2 = (vw[:, :, 2] - vw[:, :, 0])[tmask]
        inst_id = tri_inst[tmask]
        # drop degenerates (zero-area / padded repeats)
        nrm = onp.cross(e1, e2)
        area2 = onp.linalg.norm(nrm, axis=1)
        ok = area2 > 1e-12
        v0, e1, e2, nrm, inst_id, area2 = (v0[ok], e1[ok], e2[ok],
                                           nrm[ok], inst_id[ok], area2[ok])
        center = v0 + (e1 + e2) / 3.0
        rad = onp.maximum(
            onp.linalg.norm(v0 - center, axis=1),
            onp.maximum(onp.linalg.norm(v0 + e1 - center, axis=1),
                        onp.linalg.norm(v0 + e2 - center, axis=1)))
        world = onp.concatenate([center, rad[:, None]],
                                1).astype(onp.float32)
        planes = _tri_planes_np(v0, e1, e2)

        from ..native import available, bvh_build
        bvh = bvh_build(world) if available() else build_bvh_numpy(world)
        mat = onp.asarray(instances.object_material)[inst_id]
        from . import colorspace
        albedo = onp.asarray(pools.mat_base_color)[mat][:, :3]
        albedo = onp.asarray(
            colorspace.srgb_to_acescg(jnp.asarray(albedo)))
        emissive = onp.asarray(pools.mat_emissive)[mat][:, :3]
        unit_n = (nrm / area2[:, None]).astype(onp.float32)
        return SceneBVH(
            node_sphere=jnp.asarray(bvh["sphere"]),
            node_count=jnp.asarray(bvh["count"]),
            node_leaf=jnp.asarray(bvh["leaf"]),
            leaf_albedo=jnp.asarray(albedo),
            leaf_emissive=jnp.asarray(emissive),
            leaf_sphere=jnp.asarray(world),
            tri_planes=jnp.asarray(planes),
            leaf_normal=jnp.asarray(unit_n),
        )

    if granularity == "object":
        sph_o = onp.asarray(instances.object_sphere_tw)
        ok = onp.asarray(instances.object_valid)
        ids = onp.nonzero(ok)[0]
        world = sph_o[ids].astype(onp.float32)
        o = ids
    else:
        pair_m = onp.asarray(pools.pair_meshlet)
        pair_o = onp.asarray(pools.pair_object)
        valid = onp.asarray(pools.pair_valid)
        perr = onp.asarray(pools.meshlet_parent_error)[pair_m]
        keep = valid & (perr > 1e30 if coarse_only
                        else onp.ones_like(valid))
        ids = onp.nonzero(keep)[0]
        if len(ids) == 0:
            ids = onp.nonzero(valid)[0]
        m = pair_m[ids]
        o = pair_o[ids]
        sph = onp.asarray(pools.meshlet_sphere)[m]              # (N,4)
        o2w = onp.asarray(instances.object_to_tw)[o]            # (N,4,4)
        c = onp.concatenate([sph[:, :3], onp.ones((len(ids), 1))], 1)
        cw = onp.einsum("nj,njk->nk", c, o2w)[:, :3]
        scale = onp.linalg.norm(o2w[:, :3, :3], axis=2).max(1)
        world = onp.concatenate([cw, (sph[:, 3] * scale)[:, None]],
                                1).astype(onp.float32)

    from ..native import available, bvh_build
    if available():
        bvh = bvh_build(world)
    else:
        bvh = build_bvh_numpy(world)

    mat = onp.asarray(instances.object_material)[o]
    from . import colorspace
    albedo = onp.asarray(pools.mat_base_color)[mat][:, :3]
    albedo = onp.asarray(colorspace.srgb_to_acescg(jnp.asarray(albedo)))
    emissive = onp.asarray(pools.mat_emissive)[mat][:, :3]
    leaf = bvh["leaf"]
    # re-map leaf element ids to leaf-table rows (identity here)
    return SceneBVH(
        node_sphere=jnp.asarray(bvh["sphere"]),
        node_count=jnp.asarray(bvh["count"]),
        node_leaf=jnp.asarray(leaf),
        leaf_albedo=jnp.asarray(albedo),
        leaf_emissive=jnp.asarray(emissive),
        leaf_sphere=jnp.asarray(world),
    )


def _ray_sphere(o, d, sph):
    """Entry distance of ray o+t*d into sphere (...,4). -> (hit, t_entry);
    origin inside => t_entry = 0."""
    oc = o - sph[..., :3]
    b = jnp.sum(oc * d, -1)
    c2 = jnp.sum(oc * oc, -1) - sph[..., 3] * sph[..., 3]
    disc = b * b - c2
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t_entry = jnp.where(c2 < 0.0, 0.0, t0)
    hit = ok & (t1 > 0.0)
    return hit, t_entry


# Below this leaf count the dense all-leaves path wins: gathers cost
# ~0.4 Gelem/s on this device while the MXU streams dense (R, N) sphere
# tests at TFLOP rates — measured crossover is far above any coarse-proxy
# scene size we build (6k leaves: dense ~3 ms vs traversal ~370 ms for
# 65k rays).
DENSE_LEAF_LIMIT = 16384

# Dense triangle-exact path limit: 6 K=3 matmuls per chunk instead of 2,
# so the crossover sits lower than the sphere path's.
DENSE_TRI_LIMIT = 8192


def trace(origins: jnp.ndarray, dirs: jnp.ndarray, bvh: SceneBVH,
          t_max: float = 1e9,
          max_steps: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest-hit trace. origins/dirs (...,3) -> (t (...,), leaf (...,)
    with -1 = miss). Dispatches to the dense MXU path for small leaf
    sets; falls back to the stackless skip-pointer BVH scan. Triangle
    BVHs (granularity="triangle") test exact triangles at the leaves."""
    if bvh.tri_planes is not None:
        if (bvh.tri_planes.shape[0] <= DENSE_TRI_LIMIT and
                max_steps is None):
            return trace_dense_tri(origins, dirs, bvh.tri_planes, t_max)
        return trace_bvh(origins, dirs, bvh, t_max, max_steps)
    if (bvh.leaf_sphere is not None and
            bvh.leaf_sphere.shape[0] <= DENSE_LEAF_LIMIT and
            max_steps is None):
        return trace_dense(origins, dirs, bvh.leaf_sphere, t_max)
    return trace_bvh(origins, dirs, bvh, t_max, max_steps)


def trace_dense_tri(origins: jnp.ndarray, dirs: jnp.ndarray,
                    planes: jnp.ndarray, t_max: float = 1e9,
                    chunk: int = 512) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense triangle-exact closest hit: every per-ray quantity of the
    Baldwin-Weber test is a (R,3)@(3,chunk) contraction — zero gathers,
    branch-free (the TPU shape for ray-triangle, like trace_dense for
    spheres). Two-sided, watertight within f32."""
    shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    r = o.shape[0]
    n_t = planes.shape[0]
    pad = (-n_t) % chunk
    if pad:
        planes = jnp.concatenate(
            [planes, jnp.zeros((pad, 12), planes.dtype)], 0)  # den=0: miss
    pls = planes.reshape(-1, chunk, 12)

    def body(carry, pc):
        t_best, leaf_best, base = carry
        nN = pc[:, 0:3]
        dn = pc[:, 3][None, :]
        n1 = pc[:, 4:7]
        d1 = pc[:, 7][None, :]
        n2 = pc[:, 8:11]
        d2 = pc[:, 11][None, :]
        den = d @ nN.T                                    # (R,chunk) MXU
        num = -(o @ nN.T + dn)
        safe = jnp.abs(den) > 1e-12
        t = num / jnp.where(safe, den, 1.0)
        u = (o @ n1.T) + t * (d @ n1.T) + d1
        v = (o @ n2.T) + t * (d @ n2.T) + d2
        hit = safe & (t > 1e-4) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        t_hit = jnp.where(hit, t, jnp.inf)
        j = jnp.argmin(t_hit, axis=1)
        t_c = jnp.take_along_axis(t_hit, j[:, None], axis=1)[:, 0]
        take = t_c < t_best
        t_best = jnp.where(take, t_c, t_best)
        leaf_best = jnp.where(take, base + j.astype(jnp.int32), leaf_best)
        return (t_best, leaf_best, base + chunk), None

    t0v = jnp.full((r,), t_max, jnp.float32)
    l0 = jnp.full((r,), -1, jnp.int32)
    (t, leaf, _), _ = jax.lax.scan(body, (t0v, l0, jnp.int32(0)), pls)
    return t.reshape(shape), leaf.reshape(shape)


def trace_dense(origins: jnp.ndarray, dirs: jnp.ndarray,
                spheres: jnp.ndarray, t_max: float = 1e9,
                chunk: int = 512) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense closest-hit: test every ray against every leaf sphere with
    MXU matmuls — zero gathers, branch-free, the idiomatic TPU answer for
    coarse-proxy scenes (thousands of leaves).

    b = (o-c)·d and |o-c|^2 decompose into o·d / |o|^2 ray terms plus
    d@cT / o@cT matmuls; the scan accumulates the running closest hit
    over sphere chunks so the (R, chunk) intermediate stays small."""
    shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    r = o.shape[0]
    n = spheres.shape[0]
    pad = (-n) % chunk
    if pad:
        poison = jnp.zeros((pad, 4)).at[:, 3].set(-1.0)   # r<0: never hits
        spheres = jnp.concatenate([spheres, poison], axis=0)
    sph = spheres.reshape(-1, chunk, 4)                   # (K,chunk,4)

    od = jnp.sum(o * d, axis=1, keepdims=True)            # (R,1)
    oo = jnp.sum(o * o, axis=1, keepdims=True)            # (R,1)

    def body(carry, sc):
        t_best, leaf_best, base = carry
        c = sc[:, :3]                                     # (chunk,3)
        rad = sc[:, 3]
        dc = d @ c.T                                      # (R,chunk) MXU
        oc = o @ c.T                                      # (R,chunk) MXU
        cc = jnp.sum(c * c, axis=1)[None, :]              # (1,chunk)
        b = od - dc                                       # (o-c)·d
        c2 = oo - 2.0 * oc + cc - (rad * rad)[None, :]
        disc = b * b - c2
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t_entry = jnp.where(c2 < 0.0, 0.0, t0)
        hit = (disc >= 0.0) & ((-b + sq) > 0.0) & (t_entry > 1e-4) &             (rad[None, :] > 0.0)
        t_hit = jnp.where(hit, t_entry, jnp.inf)
        j = jnp.argmin(t_hit, axis=1)                     # (R,)
        t_c = jnp.take_along_axis(t_hit, j[:, None], axis=1)[:, 0]
        take = t_c < t_best
        t_best = jnp.where(take, t_c, t_best)
        leaf_best = jnp.where(take, base + j.astype(jnp.int32), leaf_best)
        return (t_best, leaf_best, base + chunk), None

    t0v = jnp.full((r,), t_max, jnp.float32)
    l0 = jnp.full((r,), -1, jnp.int32)
    (t, leaf, _), _ = jax.lax.scan(body, (t0v, l0, jnp.int32(0)), sph)
    return t.reshape(shape), leaf.reshape(shape)


def trace_bvh(origins: jnp.ndarray, dirs: jnp.ndarray, bvh: SceneBVH,
              t_max: float = 1e9,
              max_steps: Optional[int] = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stackless skip-pointer BVH scan, vectorized over rays (used above
    the dense-path leaf limit; also the oracle-tested reference)."""
    shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    r = o.shape[0]
    m = int(bvh.node_sphere.shape[0])
    if max_steps is None:
        # the loop is lock-step across rays: its trip count is the MAX
        # visited-node count over all rays. Cap it — rays that run out of
        # budget conservatively miss (fall through to the sky/cache
        # fallback), which for fat coarse-proxy BVHs costs far less than
        # letting one worst-case ray serialize the whole wavefront.
        # Triangle BVHs are much deeper — give them a bigger budget.
        max_steps = min(m, 1536 if bvh.tri_planes is not None else 384)

    def cond(state):
        i, _t, _l, steps = state
        return (steps < max_steps) & jnp.any(i < m)

    def body(state):
        i, t_best, leaf_best, steps = state
        ii = jnp.minimum(i, m - 1)
        sph = bvh.node_sphere[ii]                       # (R,4)
        cnt = bvh.node_count[ii]
        lf = bvh.node_leaf[ii]
        active = i < m
        hit, t_in = _ray_sphere(o, d, sph)
        useful = hit & (t_in < t_best) & active
        is_leaf = lf >= 0
        if bvh.tri_planes is not None:
            # triangle-exact leaf test (the node sphere only prunes)
            pc = bvh.tri_planes[jnp.maximum(lf, 0)]     # (R,12)
            den = jnp.sum(d * pc[:, 0:3], -1)
            safe = jnp.abs(den) > 1e-12
            t_tri = -(jnp.sum(o * pc[:, 0:3], -1) + pc[:, 3]) / \
                jnp.where(safe, den, 1.0)
            p = o + t_tri[:, None] * d
            u = jnp.sum(p * pc[:, 4:7], -1) + pc[:, 7]
            v = jnp.sum(p * pc[:, 8:11], -1) + pc[:, 11]
            tri_hit = safe & (t_tri > 1e-4) & (u >= 0.0) & (v >= 0.0) & \
                (u + v <= 1.0)
            take = useful & is_leaf & tri_hit & (t_tri < t_best)
            t_leaf = t_tri
        else:
            take = useful & is_leaf & (t_in > 1e-4)
            t_leaf = t_in
        t_best = jnp.where(take, t_leaf, t_best)
        leaf_best = jnp.where(take, lf, leaf_best)
        step = jnp.where(useful & ~is_leaf, 1, cnt)
        i = jnp.where(active, i + step, i)
        return i, t_best, leaf_best, steps + 1

    i0 = jnp.zeros((r,), jnp.int32)
    t0 = jnp.full((r,), t_max, jnp.float32)
    l0 = jnp.full((r,), -1, jnp.int32)
    _, t, leaf, _ = jax.lax.while_loop(cond, body, (i0, t0, l0,
                                                    jnp.zeros((), jnp.int32)))
    return t.reshape(shape), leaf.reshape(shape)


def trace_brute_numpy(origins: np.ndarray, dirs: np.ndarray,
                      spheres: np.ndarray):
    """O(R*N) closest-hit oracle over the raw leaf spheres."""
    o = origins.reshape(-1, 1, 3)
    d = dirs.reshape(-1, 1, 3)
    s = spheres.reshape(1, -1, 4)
    oc = o - s[..., :3]
    b = (oc * d).sum(-1)
    c2 = (oc * oc).sum(-1) - s[..., 3] ** 2
    disc = b * b - c2
    sq = np.sqrt(np.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t_entry = np.where(c2 < 0.0, 0.0, t0)
    hit = (disc >= 0.0) & (t1 > 0.0) & (t_entry > 1e-4)
    t = np.where(hit, t_entry, 1e9)
    best = t.argmin(1)
    tb = t[np.arange(len(best)), best]
    leaf = np.where(tb < 1e9, best, -1)
    return tb, leaf.astype(np.int32)


def trace_brute_tri_numpy(origins: np.ndarray, dirs: np.ndarray,
                          v0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
    """O(R*N) Moller-Trumbore closest-hit oracle over raw triangles
    (two-sided), independent of the Baldwin-Weber formulation."""
    o = origins.reshape(-1, 1, 3)
    d = dirs.reshape(-1, 1, 3)
    v0 = v0.reshape(1, -1, 3)
    e1 = e1.reshape(1, -1, 3)
    e2 = e2.reshape(1, -1, 3)
    p = np.cross(d, e2)
    det = (e1 * p).sum(-1)
    safe = np.abs(det) > 1e-12
    inv = 1.0 / np.where(safe, det, 1.0)
    s = o - v0
    u = (s * p).sum(-1) * inv
    q = np.cross(s, e1)
    v = (d * q).sum(-1) * inv
    t = (e2 * q).sum(-1) * inv
    hit = safe & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
    t = np.where(hit, t, 1e9)
    best = t.argmin(1)
    tb = t[np.arange(len(best)), best]
    leaf = np.where(tb < 1e9, best, -1)
    return tb, leaf.astype(np.int32)


def shade_hits(
    t: jnp.ndarray, leaf: jnp.ndarray,       # from trace()
    origins: jnp.ndarray, dirs: jnp.ndarray,
    bvh: SceneBVH,
    sun_direction: jnp.ndarray, sun_radiance: jnp.ndarray,
    ambient: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate hit radiance (the reference shades RT hits with the
    full material+sun path, raytrace_shared.hlsli:39; here: per-leaf mean
    albedo x (sun NdotL / pi + ambient), normal = proxy-sphere normal at
    the hit point). -> (radiance (...,3), confidence (...,))."""
    ok = leaf >= 0
    lf = jnp.maximum(leaf, 0)
    alb = bvh.leaf_albedo[lf]
    emis = bvh.leaf_emissive[lf]
    # leaf sphere lookup via the node table is avoided: reconstruct the
    # normal from the hit point against the leaf sphere center requires a
    # (N,4) leaf-sphere gather — store it in albedo-sized table instead?
    # The proxy normal: oppose the ray (grazing-robust, exact for a
    # sphere hit seen head-on; adequate for cosine-weighted GI).
    # Triangle-exact BVHs carry true geometric normals — use them,
    # flipped toward the ray origin (two-sided shading).
    if bvh.leaf_normal is not None:
        gn = bvh.leaf_normal[lf]
        n = gn * -jnp.sign(jnp.sum(gn * dirs, -1, keepdims=True) + 1e-12)
    else:
        n = -dirs
    ndl = jnp.clip(jnp.sum(n * sun_direction, -1), 0.0, 1.0)
    rad = alb * (sun_radiance * ndl[..., None] / np.pi +
                 ambient) + emis
    return jnp.where(ok[..., None], rad, 0.0), ok.astype(jnp.float32)
